#!/bin/bash
# Round-4c chip batch — corrected after the r4b lesson: a Pallas
# compile-helper crash takes the helper down for minutes, so an
# immediately-following fallback mode hits the SAME dead helper
# (qm_r4_sdf2.json: xla mode failed 23 s after the pallas crash).
# Here every unit is XLA-impl-only (no helper-killing module in the
# list) and keeps the default 3 attempts x 180 s backoff, and we lead
# with a 120 s settle in case the previous batch left the helper down.
#  1. SDF quality evidence via the XLA-impl mode (VERDICT r3 missing
#     #1) + params for the mesh export
#  2. SDF -> marching-tetrahedra mesh artifact
#  3. held-back tangle scene seed 100 (GT render now chunked)
#  4. hierarchical via the XLA-impl mode (VERDICT r3 missing #2)
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

sleep 120

timeout 1800 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_sdf3.json --save_params \
  --modes cp_r21_sdf_guided_xla 2>&1 | tail -10

timeout 900 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_xla --resolution 192 2>&1 | tail -8

timeout 1500 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_heldback.json --scene tangle --scene_seed 100 \
  --modes cp_r21_guided_k32_tv1e2_strat 2>&1 | tail -8

timeout 1500 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_hier2.json --modes cp_r21_hier_xla 2>&1 | tail -8

echo BATCH_R4C_DONE
