"""PSNR evaluation / plotting CLI (reference plot_psnr.py parity).

Same surface: --pred_dirs <dirs...> --gt_dirs <dirs...>; computes PSNR of
every PNG in each prediction directory against the first ground-truth
image and plots curves to psnr.png (reference plot_psnr.py:22-51).
Extensions: --out, --x_scale (the reference hard-codes x = idx*40,
plot_psnr.py:49), --per_frame_gt (match each pred to its own GT frame
instead of the reference's single-frame comparison).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, normalize: bool = True) -> float:
    pred = pred.astype(np.float32)
    gt = gt.astype(np.float32)
    if normalize:
        pred, gt = pred / 255.0, gt / 255.0
    mse = np.mean((pred - gt) ** 2)
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))


def _imread(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def psnr_dir(pred_dir: str, gt_dir: str, normalize: bool = True,
             per_frame_gt: bool = False) -> np.ndarray:
    preds = sorted(glob.glob(os.path.join(pred_dir, "*.png")))
    gts = sorted(glob.glob(os.path.join(gt_dir, "*.png")))
    if not preds or not gts:
        return np.zeros(0)
    out = []
    for i, p in enumerate(preds):
        g = gts[min(i, len(gts) - 1)] if per_frame_gt else gts[0]
        out.append(psnr(_imread(p), _imread(g), normalize))
    return np.asarray(out)


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--pred_dirs", type=str, nargs="+",
                   help="Give list of pred directories")
    p.add_argument("--gt_dirs", type=str, nargs="+",
                   help="Give list of gt directories")
    p.add_argument("--out", type=str, default="psnr.png")
    p.add_argument("--x_scale", type=int, default=40,
                   help="epochs per written frame (reference uses 40)")
    p.add_argument("--per_frame_gt", action="store_true")
    return p


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    args = build_parser().parse_args(argv)
    gt_dir = args.gt_dirs[0]
    curves = {d: psnr_dir(d, gt_dir, per_frame_gt=args.per_frame_gt)
              for d in args.pred_dirs}
    min_len = min((len(c) for c in curves.values() if len(c)), default=0)
    plt.figure(figsize=(8, 5))
    for d, c in curves.items():
        if not len(c):
            print(f"warning: no PNGs for {d}")
            continue
        x = np.arange(min_len) * args.x_scale
        plt.plot(x, c[:min_len], "-o", label=d)
        print(f"MEAN_PSNR for {d}: {c[-1]:.3f} (final), {c.mean():.3f} (mean)")
    plt.title("PSNR vs Epochs")
    plt.xlabel("Epochs")
    plt.ylabel("PSNR")
    plt.legend()
    plt.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
