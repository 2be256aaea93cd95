#!/bin/bash
# Probe every 15 min; on recovery: validate kernels (per-section PASS
# markers, v2) -> post_validate.sh (self-gates on the markers) ->
# bench.py (adopts validated gates itself). ONE TPU process at a time;
# never timeout-kill a first compile mid-flight (timeouts are generous
# multiples of worst-case remote compiles).
#
# v5 vs v4: post_validate + bench run even on a PARTIAL validation —
# whatever kernels got their markers are adopted, and a bench number is
# ALWAYS captured once the tunnel answers (an XLA-path number beats no
# number; late-recovery lesson).
#
# Holds /tmp/rpe_chain_running while it owns the TPU so a driver-run
# bench.py idles (without probing — a concurrent jax.devices() can wedge
# this session, hazard #3) instead of colliding; removed on exit.
LOCK=/tmp/rpe_chain_running
trap 'rm -f "$LOCK"' EXIT
for i in $(seq 1 96); do
  echo "$(date -u +%H:%M:%S) c5-attempt $i" >> /tmp/tpu_probe.log
  if timeout 240 python -c "import jax; print(len(jax.devices()))" > /tmp/tpu_probe_out.txt 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU ALIVE" >> /tmp/tpu_probe.log
    echo ALIVE > /tmp/tpu_status.txt
    cd /root/repo
    touch "$LOCK"
    timeout 14400 python .scratch/validate_kernels_tpu.py \
      > /tmp/validate_kernels.log 2>&1
    rc=$?
    echo "$(date -u +%H:%M:%S) validation rc=$rc" >> /tmp/tpu_probe.log
    touch "$LOCK"
    bash .scratch/post_validate.sh > /tmp/post_validate.log 2>&1
    echo "$(date -u +%H:%M:%S) post_validate done" >> /tmp/tpu_probe.log
    rm -f "$LOCK"   # bench is the chain's last TPU user; let it probe
    timeout 7200 python bench.py > /tmp/bench_auto.json 2>/tmp/bench_auto.err
    echo "$(date -u +%H:%M:%S) bench rc=$? -> /tmp/bench_auto.json" >> /tmp/tpu_probe.log
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) no answer" >> /tmp/tpu_probe.log
  sleep 900
done
echo DEAD > /tmp/tpu_status.txt
