#!/bin/bash
# Round-5 chip batch B:
#   1. CP kernel anatomy probe (the 80 ms width-independence question)
#      — per-variant subprocesses with deadlines, incremental writes
#   2. SDF mesh re-export with auto iso (the phi-ratio-trained field
#      carries a constant offset; iso=0 extracted nothing in batch A)
#   3. bench with the round-5 mode set -> BENCH_local_r5.json
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

timeout 10800 python scripts/tpu_cp_anatomy_r5.py \
  --out cp_anatomy_r5.json --unit_timeout 1200 2>&1 | tail -20

timeout 1200 python scripts/tpu_sdf_mesh_r4.py \
  --mode cp_r21_sdf_guided_xla_es16k --resolution 192 \
  --out sdf_mesh_textured_r5.ply 2>&1 | tail -4

timeout 3600 python bench.py --out BENCH_local_r5.json --modes \
int8_dense_guided_k32_scan8,cp_guided_k32_scan8,cp_r21_guided_k32_p32_scan8_strat,cp_n1024_r25_guided_k32_p32_scan8_strat,cp_n1024_r50_guided_k32_p32_scan8_strat \
  2>&1 | tail -6

echo BATCH_R5B_DONE
