#!/bin/bash
# CP batch 3b: remainder of tpu_batch_cp3.sh, reordered for a ~1h
# window on a slow tunnel (first dispatch measured 102s today):
#   stage A: CP serving e2e (CLI train -> orbit render -> mesh export)
#   stage B: rank/ladder probes at 240s (anchor r32_k48, r48, l12)
#   stage C: convergence record attempt (r48 K=48, 900s)
# Stage 1 (bench A/B) already done -> bench_cp_scan_ab.json.
# Run with the host otherwise idle (CLAUDE.md contention rule).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== stage A: CP serving e2e (train -> render -> mesh) ==="
timeout 2400 python -m human_body_reconstruction_tpu.cli.train_hash \
    --synthetic --synthetic_subject textured \
    --num_batch 16384 --num_samples 128 \
    --encoder_variant cp --cp_rank 32 --num_levels 8 --dense_levels -1 \
    --occupancy --occ_guided --compact 32 --occ_probes 64 \
    --steps 2500 --steps_per_call 25 --log_every 250 --eval_every 2500 \
    --eval_guided 48 --write --model_name cpflag \
    --out_dir results/cp_flagship
echo "=== cp_train rc=$?"

timeout 1500 python -m human_body_reconstruction_tpu.cli.render \
    --ckpt_dir results/cp_flagship --model_name cpflag \
    --bound_pth results/cp_flagship/bounds_model.npy \
    --orbit 6 --height 400 --width 400 --num_samples 128 \
    --use_occ --eval_guided 48 --chunk 32768 \
    --out_dir results/cp_flagship/renders --gif
echo "=== cp_render rc=$?"

timeout 1500 python -m human_body_reconstruction_tpu.cli.nerf2mesh \
    --ckpt_dir results/cp_flagship --model_name cpflag \
    --bound_pth bounds_model.npy --resolution 256 --iso 5.0 \
    --encoder_variant cp \
    --out results/cp_flagship/mesh_cp.ply \
    --cache results/cp_flagship/density_grid_cp.npy
echo "=== cp_mesh rc=$?"

echo "=== stage B: CP rank/ladder probes at 240s (anchor: r32_k48) ==="
timeout 3600 python scripts/quality_matrix.py --budget 240 \
    --modes cp_r32_guided_k48_mass,cp_r48_guided_k48_mass,cp_l12_r32_guided_k48_mass \
    --out qm_cp_rank2.json
echo "=== rank probes rc=$?"

echo "=== stage C: convergence 900s record attempt (r48 K=48) ==="
timeout 2400 python scripts/quality_matrix.py --budget 900 \
    --modes cp_r48_guided_k48_mass --out qm_cp_conv48.json
echo "=== convergence rc=$?"

echo "=== done ==="
