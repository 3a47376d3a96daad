"""Vanilla positional-encoding NeRF trainer — the repaired, working
equivalent of reference ``train.py`` (which is stale as checked in: it
calls a removed free ``vol_render`` and mis-unpacks ``get_od``,
train.py:57, 65 — see SURVEY.md "known defects").

Model: classic 8x256 NeRF with skip connection and view-dir branch
(reference vol_renderer.py:12-86), PositionalEncoder(d_model=3,
num_freq=10) on both positions and dirs (train.py:16-19), Adam(1e-2) +
cosine to 5e-4 (train.py:36-38), per-image random ray batches.

Data: ``tiny_nerf_data.npz`` (images, poses, focal) if present
(train.py:23), else ``--synthetic`` procedural scene.

Run: python -m human_body_reconstruction_tpu.cli.train_vanilla \
         --synthetic --num_iters 300
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Train vanilla NeRF")
    p.add_argument("--data", type=str, default="tiny_nerf_data.npz")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num_iters", type=int, default=1000)
    p.add_argument("--num_freq", type=int, default=10)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=6.0)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr_final", type=float, default=5e-4)
    p.add_argument("--out_dir", type=str, default="results")
    p.add_argument("--model_name", type=str, default="Nerf")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--write", action="store_true")
    p.add_argument("--pe_mode", type=str, default="linear",
                   choices=["linear", "nerf"],
                   help="'linear' matches the reference encoder exactly")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import compositing, positional
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.ops import sampling
    from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib
    from human_body_reconstruction_tpu.train.state import cosine_to_floor
    from human_body_reconstruction_tpu.utils.config import ClassicNeRFConfig

    if not args.synthetic and os.path.exists(args.data):
        data = np.load(args.data)
        images = jnp.asarray(data["images"][..., :3], jnp.float32)
        c2ws = jnp.asarray(data["poses"], jnp.float32)
        focal = float(data["focal"])
        H, W = images.shape[1:3]
        K = jnp.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    else:
        ds = synthetic.make_dataset(n_views=10, H=64, W=64,
                                    near=args.near, far=args.far)
        images, c2ws, K = ds["images"], ds["c2ws"], ds["K"]
        H, W = ds["H"], ds["W"]

    d_enc = 3 * args.num_freq * 2
    cfg = ClassicNeRFConfig(d_input=d_enc, d_viewdirs=d_enc)
    params = mlp_lib.init_classic_nerf(jax.random.PRNGKey(0), cfg)
    sched = cosine_to_floor(args.lr, args.lr_final, args.num_iters)
    tx = optax.adam(learning_rate=sched)
    opt_state = tx.init(params)

    def render(params, rays_o, rays_d, dir_norm, key, jitter=True):
        t = sampling.stratified_ts(key, (rays_o.shape[0],), args.near,
                                   args.far, args.num_samples, jitter=jitter)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        B, S = t.shape
        x = positional.positional_encode(pts.reshape(-1, 3), args.num_freq,
                                         args.pe_mode)
        v = positional.positional_encode(rays_d, args.num_freq, args.pe_mode)
        v = jnp.broadcast_to(v[:, None, :], (B, S, d_enc)).reshape(-1, d_enc)
        rgb, alpha = mlp_lib.apply_classic_nerf(params, x, cfg, viewdirs=v)
        C, _, _ = compositing.composite(t, rgb.reshape(B, S, 3),
                                        alpha.reshape(B, S), dir_norm)
        return C

    @jax.jit
    def train_step(params, opt_state, key, img_idx):
        k1, k2 = jax.random.split(key)
        pix = jax.random.randint(k1, (args.batch,), 0, H * W)
        i = (pix % W).astype(jnp.float32)
        j = (pix // W).astype(jnp.float32)
        o, d, n = rays_lib.rays_for_pixels(i, j, K, c2ws[img_idx])
        gt = images[img_idx, pix // W, pix % W]

        def loss_fn(p):
            C = render(p, o, d, n, k2)
            return jnp.mean((C - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(0)
    n_train = images.shape[0] - 1
    for it in range(args.num_iters):
        key, k = jax.random.split(key)
        img_idx = jax.random.randint(k, (), 0, n_train)
        params, opt_state, loss = train_step(params, opt_state, k, img_idx)
        if args.log_every and (it + 1) % args.log_every == 0:
            psnr = -10 * np.log10(max(float(loss), 1e-12))
            print(f"iter {it+1:5d}  loss {float(loss):.5f}  psnr {psnr:.2f}")

    ckpt_lib.save_pytree(os.path.join(args.out_dir,
                                      f"{args.model_name}.npz"), params)
    if args.write:
        from PIL import Image

        test_idx = images.shape[0] - 1
        o, d, n = rays_lib.full_image_rays(H, W, K, c2ws[test_idx])
        outs = []
        for s in range(0, H * W, 4096):
            outs.append(np.asarray(render(
                params, o[s:s + 4096], d[s:s + 4096], n[s:s + 4096],
                jax.random.PRNGKey(0), jitter=False)))
        img = np.concatenate(outs).reshape(H, W, 3)
        gt = np.asarray(images[test_idx])
        psnr = 10 * np.log10(1.0 / max(float(np.mean((img - gt) ** 2)), 1e-12))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, f"{args.model_name}_test.png"))
        print(f"test view PSNR {psnr:.2f} dB")
    print(f"saved {args.out_dir}/{args.model_name}.npz")


if __name__ == "__main__":
    main()
