#!/bin/bash
# Round-4b chip batch (this session's one serial chip process; CLAUDE.md
# measurement discipline — no concurrent CPU work).  Order = value x
# success probability:
#  1. held-back tangle scene, seed 100, flagship mode (VERDICT r3 #6
#     done-bar; known-good HLO shape — the kprobe batch compiled fine)
#  2. SDF on-chip quality (VERDICT r3 missing #1): 1 attempt at the
#     Pallas mode (reproducible helper-crash, qm_r4_sdf_*.json), then
#     the new XLA-impl fallback in the same list; params saved for the
#     mesh export that follows
#  3. SDF -> marching-tetrahedra mesh export from the saved params
#  4. hierarchical on-chip (VERDICT r3 missing #2): same 1-attempt
#     pallas + xla-fallback ladder
#  5. serving steady-state on the final flagship preset (item 9)
#  6. SDF compile-crash isolation ladder (diagnostic, if time remains)
# Each unit hard-capped with `timeout` so one hung compile RPC (the
# round-4a anatomy post-mortem) cannot eat the session.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

timeout 1500 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_heldback.json --scene tangle --scene_seed 100 \
  --modes cp_r21_guided_k32_tv1e2_strat 2>&1 | tail -8

timeout 2100 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_sdf2.json --save_params --attempts 1 \
  --modes cp_r21_sdf_guided_k32_tv1e2_strat,cp_r21_sdf_guided_xla \
  2>&1 | tail -12

timeout 900 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_xla --resolution 192 2>&1 | tail -8

timeout 2100 python scripts/quality_matrix.py --budget 240 \
  --out qm_r4_hier2.json --attempts 1 \
  --modes cp_r21_hier_64f64_tv1e2,cp_r21_hier_xla 2>&1 | tail -12

timeout 1500 python scripts/tpu_serving_r4.py 2>&1 | tail -20

timeout 1800 python scripts/tpu_sdf_isolate.py 2>&1 | tail -12

echo BATCH_R4B_DONE
