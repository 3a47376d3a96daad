#!/bin/bash
# Round-3 quality batch: 4-pose holdout protocol on both scene families,
# occupancy-convergence calibration for CP (sigma_l1 / threshold A/Bs),
# with the Pallas CP kernel active (cp_impl=auto).
# Run: nohup bash scripts/tpu_batch_r3_qm.sh > /tmp/r3_qm.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

# 1. textured scene: flagships + occupancy calibration (240 s budget)
python scripts/quality_matrix.py --budget 240 --scene textured \
  --out qm_r3_textured.json --modes \
int8_dense_guided_k32_mass,cp_r16_guided_k32_mass,cp_r32_guided_k32_mass,cp_r32_guided_k48_mass,cp_r48_guided_k48_mass,cp_r48_guided_k48_sl1e3,cp_r48_guided_k48_sl1e4,cp_r48_guided_k48_thr1,cp_r32_guided_k32_sl1e4

# 2. humanoid scene: the human-body subject family (subset of modes)
python scripts/quality_matrix.py --budget 240 --scene humanoid \
  --out qm_r3_humanoid.json --modes \
int8_dense_guided_k32_mass,cp_r32_guided_k48_mass,cp_r48_guided_k48_sl1e4

echo BATCH DONE
