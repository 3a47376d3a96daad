#!/bin/bash
# Round-3 batch F: the detached D+E chain restarted after the verify
# window, plus the final bench rerun that publishes the CP MFU figures.
#   1. serving steady-state (fused + bf16 vs round-2's 38.6k rays/s)
#   2. MLP sub-profile (37 ms at N=1.05M is ~10x its traffic floor)
#   3. textured3: r48 reruns (chunk-cap fix) + bench operating points
#      with TV + TV+sigma-L1 combo
#   4. humanoid3: TV validation on the second scene family
#   5. bench.py CP modes -> BENCH_local_r3b.json (now carries
#      cp_roofline MFU accounting)
# Run: nohup bash scripts/tpu_batch_r3f.sh > /tmp/r3f.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

python scripts/tpu_serving_r3.py

python scripts/tpu_mlp_profile.py

python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured3.json --modes \
cp_r16_guided_k32_tv1e2,cp_r32_guided_k32_tv1e2,cp_r32_guided_k48_tv1e2_sl1e4,cp_r48_guided_k48_tv1e2,cp_r48_guided_k48_mass,cp_r48_guided_k48_sl1e4

python scripts/quality_matrix.py --budget 240 --scene humanoid \
  --out qm_r3_humanoid3.json --modes cp_r32_guided_k32_tv1e2

python bench.py --modes \
int8_dense_guided_k32_scan8,cp_guided_k32_scan8,cp_r32_guided_k32_scan8 \
  > BENCH_local_r3b.json

echo BATCH F DONE
