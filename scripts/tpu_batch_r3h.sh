#!/bin/bash
# Round-3 batch H (waits for batch G), rewritten after the humanoid
# TV collapse (qm_r3_humanoid3.json: TV 1e-2 under-fits to 19.5 dB
# TRAIN on the scene family the reference is named for):
#   1. humanoid: TV-warmup candidate (tv1e2_w320), TV-scale ladder,
#      sigma-L1-only — pick a scene-safe flagship regulariser
#   2. textured: the warmup candidate + tv1e4 + the r48 modes batch F
#      lost to the fwd-kernel VMEM overflow
# Run: nohup bash scripts/tpu_batch_r3h.sh <pid-to-wait-for> > /tmp/r3h.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/quality_matrix.py --budget 240 --scene humanoid \
  --out qm_r3_humanoid4.json --modes \
cp_r32_guided_k32_tv1e2_w320,cp_r32_guided_k32_tv1e3,cp_r32_guided_k32_tv1e4,cp_r32_guided_k32_sl1e4

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured5.json --modes \
cp_r32_guided_k32_tv1e2_w320,cp_r42_guided_k48_tv1e2,cp_r48_guided_k48_tv1e2,cp_r48_guided_k48_mass

echo BATCH H DONE
