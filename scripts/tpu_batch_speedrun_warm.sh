#!/bin/bash
# Warm-cache speedrun: chase the "<10 min wall to 30 dB" north-star.
#
# Run A populates the AOT executable cache with every HLO the speedrun
# needs (train step, post-install culled step, occupancy refresh, eval
# render) in a short run; run B is the timed full speedrun in a FRESH
# process that reloads all executables from disk (the tunnel supports
# serialization: reload is ~0.05 s vs minutes of remote compile).
# Fused dispatch (25 steps/call) amortizes the ~35 ms tunnel sync.
#
# Usage: bash scripts/tpu_batch_speedrun_warm.sh >> /tmp/tpu_speedwarm.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
CACHE=/tmp/hbr_aot_speedrun

# A: populate (600 steps crosses warmup=256 -> culled-step HLO, a 64-
#    crossing refresh, the exact render HLO at step 250 (occ not yet
#    installed -> guided falls back to exact) and the guided render
#    HLO at step 500; eval gate at 0 dB so every render HLO compiles
#    here and not in the timed run)
timeout 3000 python scripts/speedrun_30db.py --steps_per_call 25 \
    --aot_cache "$CACHE" --max_steps 600 --eval_after_train_db 0 \
    --eval_guided 48 --out /tmp/speedrun_warmup.json
echo "=== speedrun_A rc=$?"

# B: the timed warm run.  Gating evals use the guided48 render (~2.5x
#    cheaper, serving A/B); the crossing itself is exact-confirmed.
#    Gate at 28.5 train dB: guided evals are cheap enough to watch the
#    approach, and the exact confirm only fires near the target.
timeout 3000 python scripts/speedrun_30db.py --steps_per_call 25 \
    --aot_cache "$CACHE" --eval_after_train_db 28.5 \
    --eval_guided 48 --out speedrun_30db_warm.json
echo "=== speedrun_B rc=$?"
