#!/bin/bash
# Round-3 batch G (waits for batch F):
#   1. pad-free rank bumps (r21 = r16's FLOPs, r42 = r32's FLOPs) and
#      the stratified-u A/B at the flagship operating point
#   2. serving rerun with the sample-sort skip + a g64 point (the
#      <=0.1 dB serving bar)
# Run: nohup bash scripts/tpu_batch_r3g.sh <pid-to-wait-for> > /tmp/r3g.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured4.json --modes \
cp_r21_guided_k32_tv1e2,cp_r42_guided_k48_tv1e2,cp_r32_guided_k32_tv1e2_strat

SERVING_OUT=serving_r3b.json python scripts/tpu_serving_r3.py

echo BATCH G DONE
