#!/bin/bash
# CP-encoder batch 2: speedrun record attempt + convergence + profile.
# Run with the host otherwise idle (CLAUDE.md contention rule).
#
#   bash scripts/tpu_batch_cp2.sh > /tmp/tpu_cp2.log 2>&1
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== stage 1: cold speedrun to 30 dB, cp_r32 flagship ==="
timeout 3600 python scripts/speedrun_30db.py --encoder cp --cp_rank 32 \
    --steps_per_call 25 --eval_every 125 --eval_guided 48 \
    --out speedrun_30db_cp.json

echo "=== stage 2: convergence budget (900s) cp_r32 ==="
timeout 4800 python scripts/quality_matrix.py --budget 900 \
    --modes cp_r32_guided_k32_mass --out qm_cp_long.json

echo "=== stage 3: rank/probe/K sweep at 240s ==="
timeout 7200 python scripts/quality_matrix.py --budget 240 \
    --modes cp_r48_guided_k32_mass,cp_r32_guided_k32_mass_p128,cp_r32_guided_k48_mass,cp_r16 \
    --out qm_cp_sweep.json

echo "=== stage 4: cp step profile ==="
timeout 2400 python scripts/tpu_probe_cp.py

echo "=== done ==="
