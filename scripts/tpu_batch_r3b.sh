#!/bin/bash
# Round-3 batch B (chained after the qm batch exits):
#   1. rerun the textured CP modes the compile-helper 500 killed, plus
#      the TV A/Bs — the off-orbit generalisation fixes,
#   2. Mosaic gather/scatter re-probe (VERDICT r2 item 6),
#   3. kernel block-split tune + full bench + fused-serving measurement.
# Run: nohup bash scripts/tpu_batch_r3b.sh <pid-to-wait-for> > /tmp/r3b.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured2.json --modes \
cp_r32_guided_k32_mass,cp_r32_guided_k48_mass,cp_r48_guided_k48_mass,cp_r48_guided_k48_sl1e3,cp_r48_guided_k48_sl1e4,cp_r48_guided_k48_thr1,cp_r32_guided_k32_sl1e4,cp_r32_guided_k48_tv1e2,cp_r32_guided_k48_tv1e3

python scripts/tpu_pallas_probe.py

python scripts/tpu_pallas_ab.py   # reruns with the 256/512 block split

python bench.py > BENCH_local_r3.json 2>/tmp/bench_r3.err

echo BATCH B DONE
