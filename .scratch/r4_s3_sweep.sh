#!/bin/bash
# Session-3 TPU chain part A: finish the round-4 seed sweep (salah
# 200000/300000/400000 + phone all 5 seeds), then regenerate the spread
# table. ONE TPU process at a time — run this alone.
set -x
cd /root/repo
OUT=/tmp/seed_sweep
mkdir -p "$OUT/phone"
for s in 200000 300000 400000; do
  timeout 5400 python -m rpe_tpu.cli.run_vo_database_salah \
    --no-video --no-plot --seed "$s" --results-dir "$OUT/salah/$s" \
    > "$OUT/salah_$s.log" 2>&1
  echo "salah seed=$s rc=$?"
done
for s in 0 100000 200000 300000 400000; do
  timeout 2700 python -m rpe_tpu.cli.run_phone_data \
    --no-video --no-plot --seed "$s" --results-dir "$OUT/phone/$s" \
    > "$OUT/phone_$s.log" 2>&1
  echo "phone seed=$s rc=$?"
done
python .scratch/spread_table.py "$OUT" > /tmp/spread_table_s3.log 2>&1
echo "SWEEP CHAIN DONE"
