"""2-D image-fitting testbed for the hash encoder — the working
equivalent of reference ``test_hash.py:108-205``: overfit a single image
with a 2-D hash encoding + MLP_2D and report PSNR (the reference judges
correctness visually in a live cv2 window; headless environments get
periodic PNG dumps + PSNR instead).

Defaults mirror the reference: L=16, F=2, T=2^18, N_min=16, N_max=2^16,
sigma = image size (test_hash.py:180-185), 200k-pixel batches (:201).

Run: python -m human_body_reconstruction_tpu.cli.image_fit \
         --image mountain.png --steps 300
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="2D hash-encoding image fit")
    p.add_argument("--image", type=str, default="mountain.png")
    p.add_argument("--synthetic", action="store_true",
                   help="procedural target if no image on disk")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=200000)
    p.add_argument("--hash_size", type=int, default=18)
    p.add_argument("--levels", type=int, default=16)
    p.add_argument("--n_max", type=int, default=2 ** 16)
    p.add_argument("--lr_embed", type=float, default=0.01)
    p.add_argument("--lr_mlp", type=float, default=0.01)
    p.add_argument("--out_dir", type=str, default="results")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--write_every", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.utils.config import HashConfig

    if not args.synthetic and os.path.exists(args.image):
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"),
                         np.float32) / 255.0
    else:
        # procedural target: smooth color gradients + rings
        h = w = 256
        y, x = np.mgrid[0:h, 0:w] / h
        img = np.stack([
            0.5 + 0.5 * np.sin(12 * x) * np.cos(9 * y),
            (x + y) / 2,
            0.5 + 0.5 * np.cos(20 * np.sqrt((x - .5) ** 2 + (y - .5) ** 2)),
        ], axis=-1).astype(np.float32)
    H, W = img.shape[:2]

    cfg = HashConfig(num_levels=args.levels, features_per_level=2,
                     log2_table_size=args.hash_size, n_min=16,
                     n_max=args.n_max, dim=2)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"table": he.init_table(k1, cfg),
              "mlp": mlp_lib.init_mlp2d(k2, cfg.out_dim)}
    target = jnp.asarray(img)

    tx = optax.multi_transform(
        {"table": optax.adam(args.lr_embed, eps=1e-15),
         "mlp": optax.adamw(args.lr_mlp)},
        {"table": "table", "mlp": "mlp"})
    opt_state = tx.init(params)

    # pixel coords scaled by sigma=(W,H) like the reference
    # (test_hash.py:185: sigma = image size)
    sigma = jnp.asarray([W, H], jnp.float32)
    batch = min(args.batch, H * W)

    @jax.jit
    def step(params, opt_state, k):
        pix = jax.random.randint(k, (batch,), 0, H * W)
        ij = jnp.stack([(pix % W).astype(jnp.float32),
                        (pix // W).astype(jnp.float32)], -1)
        gt = target[pix // W, pix % W]

        def loss_fn(p):
            feats = he.hash_encode(p["table"], ij, 0.0, sigma, cfg)
            pred = mlp_lib.apply_mlp2d(p["mlp"], feats)
            return jnp.mean((pred - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def full_pred(params):
        pix = jnp.arange(H * W)
        ij = jnp.stack([(pix % W).astype(jnp.float32),
                        (pix // W).astype(jnp.float32)], -1)
        feats = he.hash_encode(params["table"], ij, 0.0, sigma, cfg)
        return mlp_lib.apply_mlp2d(params["mlp"], feats).reshape(H, W, 3)

    os.makedirs(args.out_dir, exist_ok=True)
    for it in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if args.log_every and (it + 1) % args.log_every == 0:
            psnr = -10 * np.log10(max(float(loss), 1e-12))
            print(f"step {it+1:5d}  loss {float(loss):.6f}  psnr {psnr:.2f}")
        if args.write_every and (it + 1) % args.write_every == 0:
            from PIL import Image

            pred = np.asarray(full_pred(params))
            Image.fromarray((np.clip(pred, 0, 1) * 255).astype(np.uint8)
                            ).save(os.path.join(args.out_dir,
                                                f"imagefit_{it+1}.png"))
    pred = np.asarray(full_pred(params))
    mse = float(np.mean((pred - img) ** 2))
    print(f"final full-image PSNR: {10*np.log10(1.0/max(mse,1e-12)):.2f} dB")
    from PIL import Image

    Image.fromarray((np.clip(pred, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(args.out_dir, "imagefit_final.png"))


if __name__ == "__main__":
    main()
