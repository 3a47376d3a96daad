#!/bin/bash
# Round-3 batch D: serving steady-state (fused + bf16 vs round-2's
# 38.6k rays/s) and an MLP sub-profile (37 ms at N=1.05M is ~10x its
# traffic floor).
# Run: nohup bash scripts/tpu_batch_r3d.sh <pid-to-wait-for> > /tmp/r3d.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

python scripts/tpu_serving_r3.py

python scripts/tpu_mlp_profile.py

echo BATCH D DONE
