#!/bin/bash
# Round-2 continuation batch #2.  Serial, one process per experiment
# (CLAUDE.md host-contention rule); stages independent.
#
#   1. grad_level_pair A/B: equal-budget quality matrix at the flagship
#      operating point, mass-dt, with and without 1-of-2 level-pair
#      gradient routing.  Time-adjacent in ONE process (chip rate
#      drifts across hours) -> fair rays/s + holdout PSNR comparison.
#   2. guided-gated warm speedrun: holdout evals use the deterministic
#      guided48 render (2.5x cheaper, serving A/B), crossing is
#      exact-confirmed.  Prior warm run spent ~400 s of its 551 s
#      post-load wall on exact eval renders; this should land well
#      under 7 min excl. loads.
#
# Usage: bash scripts/tpu_batch_r2cont2.sh >> /tmp/tpu_r2cont2.log 2>&1
set -x
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo

# 1. lpair A/B (time-adjacent, one process)
timeout 4000 python scripts/quality_matrix.py --budget 300 \
    --modes int8_dense_guided_k32_mass,int8_dense_guided_k32_mass_lpair \
    --out qm_lpair_ab.json
echo "=== lpair_ab rc=$?"

# 2. guided-gated warm speedrun (A populate + B timed)
bash scripts/tpu_batch_speedrun_warm.sh
echo "=== speedrun_warm rc=$?"

# 3. persistent-server session on the flagship checkpoint: restore
#    once, serve repeatedly (guided48, 400x400x128 probes).  Request
#    "warm" pays the executable load; r1/r2/r3 show the steady-state
#    serving latency the one-process architecture buys.
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
