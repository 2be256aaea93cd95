#!/bin/bash
# After validate_kernels_tpu.py: stage budget + chunk sweep + golden regen
# with exactly the kernels whose per-section PASS markers are on record
# (v2 markers; "VALIDATION PASS" = all core sections green).
# ONE TPU process at a time — run alone.
set -x
cd /root/repo
LOG=/tmp/validate_kernels.log
# The library defaults every validated family ON (ops/fast.py kernel_gate),
# so the protective direction here is export =0 for any family WITHOUT its
# PASS marker on record — a partial validation (e.g. "EXTRACT FAILED") must
# not run golden regen / the chunk sweep with a hardware-failed kernel
# active. PASS markers are v2 per-section lines; EXTRACT_T3 (not the
# retired vacuous EXTRACT_T marker), and T_BRIEF requires the dataset-level
# CSV A/B (see bench.py _FAIL_MARKER_GATES).
gate_from_marker() { # $1 = PASS-marker regex, $2 = env gate
  if grep -q "$1" "$LOG" 2>/dev/null; then export "$2=1"; else export "$2=0"; fi
}
gate_from_marker "^5PT PASS" RPE_PALLAS_5PT
gate_from_marker "^EXTRACT PASS" RPE_PALLAS_EXTRACT
gate_from_marker "^MOMENTS PASS" RPE_EXTRACT_MOMENTS
gate_from_marker "^EXTRACT_T3 PASS" RPE_EXTRACT_T
gate_from_marker "^MATCH PASS" RPE_PALLAS_MATCH
gate_from_marker "^T_BRIEF3 CSV-AB PASS" RPE_EXTRACT_T_BRIEF
# multi-band extraction (library default nbody=4, validated 08-19):
# protective direction — force the single-band fallback unless NB4's own
# PASS marker is on record
if grep -q "^T_BRIEF3_NB4 PASS" "$LOG" 2>/dev/null; then
  export RPE_EXTRACT_T_NBODY=4
elif grep -q "^T_BRIEF3_NB2 PASS" "$LOG" 2>/dev/null; then
  export RPE_EXTRACT_T_NBODY=2
else
  export RPE_EXTRACT_T_NBODY=1
fi
# v4 slot diet: REJECTED (interleaved A/B measured ~7% slower than v3,
# docs/PERF_LOG.md round 4) — never adopt, PASS markers notwithstanding
export RPE_EXTRACT_T_BRIEF_V4=0
# v5 occupancy-predicated brief kernel: REJECTED (interleaved A/B measured
# ~2-3% slower than v3, docs/PERF_LOG.md round 4) — never adopt on PASS
# (a PASS marker proves correctness, never speed)
export RPE_EXTRACT_T_SPARSE=0
# v6 quad kernel: ADOPTED round 5 as the band=32 production default
# (interleaved A/B 08-20: b32c72 quad 3.459 vs b8c24 v3 3.607 ms/image;
# library default-on via _VALIDATED_KERNEL_GATES). Protective direction
# only: force off when ITS band-32 section failed on this host. NOTE
# that at the band=32/cap=72 default the v3 fallback does not compile
# (scoped-VMEM) — bench.py then falls back to RPE_NO_PALLAS.
if grep -qE "^T_QUAD(_B32)? FAILED" "$LOG" 2>/dev/null; then
  export RPE_EXTRACT_T_QUAD=0
fi
# v7 binned kernel: REJECTED (interleaved A/B 08-20: 5.918 vs quad's
# 3.459 ms/image at b32c72 — the per-slot scalar->table-slice dependency
# chain serializes); never adopt
export RPE_EXTRACT_T_V7=0
# device-resident VP voting: REJECTED for default (round 4 measured: gate
# max-statistics mismatch + 3.4x slower through the tunnel) — only ever
# enabled by its own hardware PASS
gate_from_marker "^VP_DEVICE PASS" RPE_VP_DEVICE
env | grep RPE_

timeout 5400 python .scratch/tpu_stage_probe.py > /tmp/stage_r3.log 2>&1
echo "stage rc=$?"
timeout 5400 python .scratch/tpu_chunk_sweep.py > /tmp/sweep_r3.log 2>&1
echo "sweep rc=$?"
# XLA-path one-hot bf16 A/B (only matters when the Pallas extraction is
# off; answers whether RPE_ONEHOT_BF16 should default on for that path)
RPE_NO_PALLAS=1 timeout 5400 python .scratch/tpu_onehot_ab.py \
  > /tmp/onehot_ab.log 2>&1
echo "onehot_ab rc=$?"
# regenerate accuracy goldens on TPU (IC umax mask fix nudged descriptors):
# simulator + salah, then copy into results/ if the summary improves/holds
timeout 5400 python -m rpe_tpu.cli.run_simulator_data --step 15 --no-video --no-plot \
  --results-dir /tmp/regen_sim > /tmp/regen_sim.log 2>&1
echo "sim rc=$?"; tail -5 /tmp/regen_sim.log
timeout 5400 python -m rpe_tpu.cli.run_vo_database_salah --no-video --no-plot \
  --results-dir /tmp/regen_salah > /tmp/regen_salah.log 2>&1
echo "salah rc=$?"; tail -5 /tmp/regen_salah.log
timeout 2700 python -m rpe_tpu.cli.run_phone_data --no-video --no-plot \
  --results-dir /tmp/regen_phone > /tmp/regen_phone.log 2>&1
echo "phone rc=$?"; tail -5 /tmp/regen_phone.log
# adopt regenerated CSVs into results/ iff accuracy holds/improves (the
# driver commits the working tree at round end, so an unattended recovery
# still lands refreshed goldens)
python .scratch/adopt_goldens.py /tmp
