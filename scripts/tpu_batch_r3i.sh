#!/bin/bash
# Round-3 batch I (waits for batch H): stratified combinations after
# strat alone measured +1.5 dB AND +10% rate at the r32/TV point.
#   1. textured: strat x r21 (fast flagship candidate), strat x
#      K48+sigma-L1 (record attempt), strat x TV-warmup (the full
#      candidate default)
#   2. humanoid: the full candidate default (scene-safety gate)
# Run: nohup bash scripts/tpu_batch_r3i.sh <pid-to-wait-for> > /tmp/r3i.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured6.json --modes \
cp_r21_guided_k32_tv1e2_strat,cp_r32_guided_k48_tv1e2_sl1e4_strat,cp_r32_guided_k32_tv1e2_w320_strat

python scripts/quality_matrix.py --budget 240 --scene humanoid \
  --out qm_r3_humanoid5.json --modes cp_r32_guided_k32_tv1e2_w320_strat

echo BATCH I DONE
