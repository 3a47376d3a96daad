#!/bin/bash
# Resume of tpu_batch_cp3.sh from stage 2 (stage 1 bench A/B already
# completed -> bench_cp_scan_ab.json). See tpu_batch_cp3.sh for docs.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== stage 2: CP rank/ladder probes at 240s (anchor: r32_k48) ==="
timeout 7200 python scripts/quality_matrix.py --budget 240 \
    --modes cp_r32_guided_k48_mass,cp_r48_guided_k48_mass,cp_r64_guided_k48_mass,cp_l12_r32_guided_k48_mass \
    --out qm_cp_rank2.json
echo "=== rank probes rc=$?"

echo "=== stage 3: convergence 900s record attempt (r48 K=48) ==="
timeout 4800 python scripts/quality_matrix.py --budget 900 \
    --modes cp_r48_guided_k48_mass --out qm_cp_conv48.json
echo "=== convergence rc=$?"

echo "=== stage 4: CP serving e2e (train -> render -> mesh) ==="
timeout 2400 python -m human_body_reconstruction_tpu.cli.train_hash \
    --synthetic --synthetic_subject textured \
    --num_batch 16384 --num_samples 128 \
    --encoder_variant cp --cp_rank 32 --num_levels 8 --dense_levels -1 \
    --occupancy --occ_guided --compact 32 --occ_probes 64 \
    --steps 2500 --steps_per_call 25 --log_every 250 --eval_every 2500 \
    --eval_guided 48 --write --model_name cpflag \
    --out_dir results/cp_flagship
echo "=== cp_train rc=$?"

timeout 1800 python -m human_body_reconstruction_tpu.cli.render \
    --ckpt_dir results/cp_flagship --model_name cpflag \
    --bound_pth results/cp_flagship/bounds_model.npy \
    --orbit 6 --height 400 --width 400 --num_samples 128 \
    --use_occ --eval_guided 48 --chunk 32768 \
    --out_dir results/cp_flagship/renders --gif
echo "=== cp_render rc=$?"

timeout 1800 python -m human_body_reconstruction_tpu.cli.nerf2mesh \
    --ckpt_dir results/cp_flagship --model_name cpflag \
    --bound_pth bounds_model.npy --resolution 256 --iso 5.0 \
    --out results/cp_flagship/mesh_cp.ply \
    --cache results/cp_flagship/density_grid_cp.npy
echo "=== cp_mesh rc=$?"

echo "=== done ==="
