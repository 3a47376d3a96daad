#!/bin/bash
# Round-3 batch H (waits for batch G): the r48 modes batch F lost to
# the forward-kernel VMEM overflow, now compilable with the per-axis
# forward split.
# Run: nohup bash scripts/tpu_batch_r3h.sh <pid-to-wait-for> > /tmp/r3h.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured5.json --modes \
cp_r48_guided_k48_tv1e2,cp_r48_guided_k48_mass,cp_r48_guided_k48_sl1e4,cp_r32_guided_k32_tv1e2,cp_r32_guided_k48_tv1e2_sl1e4

echo BATCH H DONE
