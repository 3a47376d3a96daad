#!/bin/bash
# Round-3 batch C: rerun the quality modes the compile-helper outage
# killed (now with retry/backoff), then fused-serving steady state.
# Run: nohup bash scripts/tpu_batch_r3c.sh <pid-to-wait-for> > /tmp/r3c.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured2.json --modes \
cp_r32_guided_k32_mass,cp_r32_guided_k48_mass,cp_r48_guided_k48_mass,cp_r48_guided_k48_sl1e3,cp_r48_guided_k48_sl1e4,cp_r48_guided_k48_thr1,cp_r32_guided_k32_sl1e4,cp_r32_guided_k48_tv1e2,cp_r32_guided_k48_tv1e3

python scripts/quality_matrix.py --budget 240 --scene humanoid \
  --out qm_r3_humanoid2.json --modes \
cp_r32_guided_k48_mass,cp_r48_guided_k48_sl1e4

echo BATCH C DONE
