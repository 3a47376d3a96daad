#!/bin/bash
# Round-4d chip batch: subsampled-eikonal SDF quality evidence.
# Ordering per the r4b/r4c helper-crash lesson: safe XLA-impl units
# FIRST, the possibly-helper-killing pallas unit LAST among SDF runs,
# each in its own process with the full 3x180 s retry.
#  1. SDF xla+es16k on textured (the safe shot at VERDICT r3 missing
#     #1) + params for the mesh export
#  2. SDF xla+es16k on humanoid (second scene family)
#  3. SDF pallas+es16k on textured — the REAL flagship composition;
#     if the es16k module still kills the helper this is last-in-line
#     so nothing downstream gets poisoned except serving (which uses
#     cached-shape renders and retries)
#  4. SDF -> marching-tetrahedra mesh artifacts from whatever params
#     landed (pallas preferred, xla fallback)
#  5. serving steady-state on the final flagship preset (item 9)
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

timeout 1800 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_sdf_es16k_xla.json --save_params \
  --modes cp_r21_sdf_guided_xla_es16k 2>&1 | tail -8

timeout 1800 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_sdf_es16k_xla_humanoid.json --scene humanoid \
  --modes cp_r21_sdf_guided_xla_es16k 2>&1 | tail -8

timeout 1800 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_sdf_es16k_pallas.json --save_params \
  --modes cp_r21_sdf_guided_es16k 2>&1 | tail -8

timeout 900 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_es16k --resolution 192 2>&1 | tail -6
timeout 900 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_xla_es16k --resolution 192 2>&1 | tail -6

timeout 1500 python scripts/tpu_serving_r4.py 2>&1 | tail -20

echo BATCH_R4D_DONE
