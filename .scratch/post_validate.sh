#!/bin/bash
# After validate_kernels_tpu.py: stage budget + chunk sweep + golden regen
# with exactly the kernels whose per-section PASS markers are on record
# (v2 markers; "VALIDATION PASS" = all core sections green).
# ONE TPU process at a time — run alone.
set -x
cd /root/repo
LOG=/tmp/validate_kernels.log
grep -q "^5PT PASS" "$LOG" 2>/dev/null && export RPE_PALLAS_5PT=1
grep -q "^EXTRACT PASS" "$LOG" 2>/dev/null && export RPE_PALLAS_EXTRACT=1
# EXTRACT_T3 (not the retired EXTRACT_T marker — that one was recorded by
# a run where the dispatch no-op'd the gate, validating XLA against itself)
grep -q "^EXTRACT_T3 PASS" "$LOG" 2>/dev/null && export RPE_EXTRACT_T=1
grep -q "^MATCH PASS" "$LOG" 2>/dev/null && export RPE_PALLAS_MATCH=1
# T_BRIEF: adopted only after the dataset-level A/B (the sim drift once
# blamed on its ULP flips was actually the evaluator's bf16 metric bug —
# docs/PERF_LOG.md round-3 postmortem). See bench.py _MARKER_GATES.
grep -q "^T_BRIEF3 CSV-AB PASS" "$LOG" 2>/dev/null && export RPE_EXTRACT_T_BRIEF=1
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
