#!/bin/bash
# CP factor-line TV regulariser A/B at the flagship operating point:
# anchor (no TV) vs two TV weights, time-adjacent, 240s budget each.
# Decides whether cp_tv_weight gets a non-zero default.
#
# Usage: bash scripts/tpu_batch_cp_tv.sh > /tmp/tpu_cp_tv.log 2>&1
# Run with the host otherwise idle (CLAUDE.md contention rule).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

timeout 3600 python scripts/quality_matrix.py --budget 240 \
    --modes cp_r32_guided_k48_mass,cp_r32_guided_k48_tv1e3,cp_r32_guided_k48_tv1e2 \
    --out qm_cp_tv.json
echo "=== tv probes rc=$?"
echo "=== done ==="
