#!/bin/bash
# Round-2 continuation batch #3: the tail of r2cont2 that was cut off
# (stage 1 lpair A/B completed -> qm_lpair_ab.json; speedrun run A
# populated /tmp/hbr_aot_speedrun; run B + serve session rerun here).
#
# Usage: bash scripts/tpu_batch_r2cont3.sh >> /tmp/tpu_r2cont3.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
CACHE=/tmp/hbr_aot_speedrun

# B: the timed warm speedrun with guided-gated evals (cache populated
#    by the earlier run A in this chip session).
timeout 3000 python scripts/speedrun_30db.py --steps_per_call 25 \
    --aot_cache "$CACHE" --eval_after_train_db 28.5 \
    --eval_guided 48 --out speedrun_30db_warm2.json
echo "=== speedrun_B rc=$?"

# Persistent-server session on the flagship checkpoint: restore once,
# serve repeatedly (guided48, 400x400x128).  "warm" pays the
# executable load; r1/r2/r3 show steady-state serving latency.
timeout 2400 python -m human_body_reconstruction_tpu.cli.serve \
    --ckpt_dir results/r2c_flagship --model_name flagship \
    --bound_pth results/r2c_flagship/bounds_model.npy \
    --use_occ --eval_guided 48 --num_samples 128 --chunk 32768 \
    --aot_cache /tmp/hbr_aot_flag <<'EOF' | tee serve_tpu_session.jsonl
{"cmd": "health"}
{"orbit": {"index": 0, "count": 8}, "no_image": true, "id": "warm"}
{"orbit": {"index": 1, "count": 8}, "no_image": true, "id": "r1"}
{"orbit": {"index": 2, "count": 8}, "no_image": true, "id": "r2"}
{"orbit": {"index": 3, "count": 8}, "out_path": "results/r2c_flagship/serve_view3.png", "id": "r3"}
{"cmd": "health"}
{"cmd": "quit"}
EOF
echo "=== serve_session rc=$?"
