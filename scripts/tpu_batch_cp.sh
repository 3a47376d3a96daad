#!/bin/bash
# CP-encoder validation batch (round-2 continuation).
#
# One background process per rule "batch TPU experiments"; run with the
# host otherwise IDLE (CPU contention cuts tunnel-fed TPU step rates
# 3-4x, CLAUDE.md).
#
#   bash scripts/tpu_batch_cp.sh > /tmp/tpu_cp.log 2>&1
#
# Stages (time-adjacent within one session so rate A/Bs are valid):
#   1. bench.py restricted to the int8 control + CP modes at headline
#      shapes (32k x 128, guided K=32, scan8) -> step-rate A/B.
#   2. quality_matrix at the 240 s budget: int8 mass control vs CP
#      rank 16/32 (+ unculled cp_r16) -> holdout-PSNR A/B.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== stage 1: bench step-rate A/B (int8 control vs cp) ==="
timeout 3600 python bench.py \
    --modes int8_dense_guided_k32_scan8,cp_guided_k32_scan8 \
    2>&1 | tee /tmp/bench_cp_ab.json

echo "=== stage 2: quality matrix (240s/mode) ==="
timeout 7200 python scripts/quality_matrix.py --budget 240 \
    --modes int8_dense_guided_k32_mass,cp_r16_guided_k32_mass,cp_r32_guided_k32_mass \
    --out qm_cp.json

echo "=== done ==="
