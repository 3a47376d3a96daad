"""End-to-end reconstruct CLI: masked frames -> training -> mesh,
using a synthetic capture on disk (COLMAP/ffmpeg stages skipped — no
external binaries in the test environment)."""

import json
import os

import numpy as np


def _write_capture(workdir, n=5, H=40, W=40):
    from PIL import Image

    from human_body_reconstruction_tpu.data import synthetic

    ds = synthetic.make_dataset(n_views=n, H=H, W=W)
    img_dir = os.path.join(workdir, "images")
    os.makedirs(img_dir, exist_ok=True)
    frames = []
    for k in range(n):
        name = f"{k:04d}.png"
        Image.fromarray(
            (np.asarray(ds["images"][k]) * 255).astype(np.uint8)).save(
                os.path.join(img_dir, name))
        frames.append({"file_path": f"./images/{name}",
                       "transform_matrix": np.asarray(ds["c2ws"][k]).tolist(),
                       "sharpness": 10.0})
    K = np.asarray(ds["K"])
    meta = {"camera_angle_x": float(2 * np.arctan(W / (2 * K[0, 0]))),
            "fl_x": float(K[0, 0]), "fl_y": float(K[1, 1]),
            "cx": float(K[0, 2]), "cy": float(K[1, 2]),
            "w": W, "h": H, "frames": frames}
    with open(os.path.join(workdir, "transforms.json"), "w") as f:
        json.dump(meta, f)


def test_reconstruct_segment_train_mesh(tmp_path):
    from human_body_reconstruction_tpu.cli import reconstruct

    work = str(tmp_path / "run")
    os.makedirs(work)
    _write_capture(work)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        reconstruct.main([
            "--workdir", "run", "--skip_poses",
            "--segment_backend", "threshold",
            "--steps", "120", "--num_batch", "512", "--num_samples", "16",
            "--near", "2.0", "--far", "6.0",
            "--iso", "0.5", "--resolution", "40"])
    finally:
        os.chdir(cwd)

    assert os.path.exists(os.path.join(work, "SegmentedImages",
                                       "THRESHOLD", "0000.png"))
    assert os.path.exists(os.path.join(work, "transforms_masked.json"))
    assert os.path.exists(os.path.join(work, "results", "recon_ckpt.npz"))
    mesh = os.path.join(work, "mesh.ply")
    assert os.path.exists(mesh)
    assert os.path.getsize(mesh) > 100
