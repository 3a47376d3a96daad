#!/bin/bash
# Round-3 batch E: the r48 modes the old (pre-chunk-cap) module lost,
# the bench-headline operating points with TV, TV+sigma-L1 combo, and
# a humanoid-scene TV validation.
# Run: nohup bash scripts/tpu_batch_r3e.sh <pid-to-wait-for> > /tmp/r3e.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured3.json --modes \
cp_r16_guided_k32_tv1e2,cp_r32_guided_k32_tv1e2,cp_r32_guided_k48_tv1e2_sl1e4,cp_r48_guided_k48_mass,cp_r48_guided_k48_sl1e4,cp_r48_guided_k48_thr1

python scripts/quality_matrix.py --budget 240 --scene humanoid \
  --out qm_r3_humanoid3.json --modes cp_r32_guided_k32_tv1e2

echo BATCH E DONE
