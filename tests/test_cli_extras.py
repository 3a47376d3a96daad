"""Smoke tests for the vanilla-NeRF and 2D image-fit CLIs + psnr tool."""

import os

import numpy as np


def test_train_vanilla_synthetic(tmp_path):
    from human_body_reconstruction_tpu.cli import train_vanilla

    out = str(tmp_path)
    train_vanilla.main(["--synthetic", "--num_iters", "30", "--batch", "256",
                        "--num_samples", "16", "--log_every", "10",
                        "--out_dir", out, "--model_name", "v"])
    assert os.path.exists(os.path.join(out, "v.npz"))


def test_image_fit_synthetic(tmp_path, capsys):
    from human_body_reconstruction_tpu.cli import image_fit

    out = str(tmp_path)
    image_fit.main(["--synthetic", "--steps", "60", "--batch", "8192",
                    "--hash_size", "12", "--n_max", "128", "--levels", "6",
                    "--out_dir", out, "--log_every", "30"])
    assert os.path.exists(os.path.join(out, "imagefit_final.png"))
    text = capsys.readouterr().out
    # overfitting a smooth target for 60 steps should pass 20 dB
    final = float(text.strip().splitlines()[-1].split(":")[1].split("dB")[0])
    assert final > 20.0, text


def test_plot_psnr_cli(tmp_path):
    from PIL import Image

    from human_body_reconstruction_tpu.cli import plot_psnr

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir()
    gt.mkdir()
    rng = np.random.RandomState(0)
    base = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    Image.fromarray(base).save(gt / "gt.png")
    for k, noise in enumerate([40, 20, 5]):
        img = np.clip(base.astype(int)
                      + rng.randint(-noise, noise, base.shape), 0,
                      255).astype(np.uint8)
        Image.fromarray(img).save(pred / f"e{k}.png")
    out = str(tmp_path / "psnr.png")
    plot_psnr.main(["--pred_dirs", str(pred), "--gt_dirs", str(gt),
                    "--out", out])
    assert os.path.exists(out)
    # monotonic: later (less noisy) frames have higher PSNR
    curve = plot_psnr.psnr_dir(str(pred), str(gt))
    assert curve[-1] > curve[0]
