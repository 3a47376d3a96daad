"""Day-1 real-data readiness (VERDICT r2 item 7).

No ffmpeg/COLMAP binaries, SAM weights or lego dataset exist in this
environment, so real-capture execution is rehearsed three ways:

  1. a CHECKED-IN golden COLMAP TXT model diffed against a checked-in
     golden transforms.json — freezes the pose conventions (axis flips,
     normalisation, intrinsics passthrough) against regressions,
  2. a generated tiny_nerf-format .npz driven through the full
     cli/train_vanilla path (reference train.py:23-33 data contract),
  3. cli/reconstruct run end-to-end with STUBBED ffmpeg/colmap
     executables on PATH — every stage boundary (video->frames->
     SfM->transforms->masks->training->mesh) executes through the real
     subprocess plumbing (reference colmap2nerf.py:57-140, 390-392).
"""

import json
import os
import stat
import sys

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# ------------------------------------------------- 1. golden COLMAP diff


def test_golden_colmap_text_to_transforms():
    from human_body_reconstruction_tpu.pipeline import capture

    out = capture.build_transforms(
        os.path.join(FIXTURES, "colmap_text"), "images",
        compute_sharpness=False)
    with open(os.path.join(FIXTURES, "golden_transforms.json")) as f:
        golden = json.load(f)

    assert len(out["frames"]) == len(golden["frames"]) == 6
    for key in ("fl_x", "fl_y", "cx", "cy", "k1", "k2", "p1", "p2",
                "camera_angle_x", "camera_angle_y", "w", "h",
                "aabb_scale"):
        assert key in out, key
        np.testing.assert_allclose(out[key], golden[key], rtol=1e-12,
                                   err_msg=key)
    for fr_out, fr_gold in zip(out["frames"], golden["frames"]):
        assert fr_out["file_path"] == fr_gold["file_path"]
        np.testing.assert_allclose(fr_out["transform_matrix"],
                                   fr_gold["transform_matrix"],
                                   atol=1e-10)


# --------------------------------------------- 2. tiny_nerf npz contract


@pytest.mark.slow
def test_train_vanilla_on_tiny_nerf_npz(tmp_path):
    """The reference's tiny_nerf_data.npz layout (images, poses, focal)
    drives cli/train_vanilla end to end."""
    from human_body_reconstruction_tpu.cli import train_vanilla
    from human_body_reconstruction_tpu.data import synthetic

    ds = synthetic.make_dataset(n_views=6, H=40, W=40)
    npz = tmp_path / "tiny_nerf_data.npz"
    K = np.asarray(ds["K"])
    np.savez(npz, images=np.asarray(ds["images"], np.float32),
             poses=np.asarray(ds["c2ws"], np.float32),
             focal=np.float32(K[0, 0]))

    out_dir = tmp_path / "results"
    train_vanilla.main([
        "--data", str(npz), "--num_iters", "40", "--batch", "256",
        "--num_samples", "16", "--num_freq", "4",
        "--out_dir", str(out_dir), "--model_name", "tiny", "--write",
        "--log_every", "0"])
    assert (out_dir / "tiny.npz").exists()
    assert (out_dir / "tiny_test.png").exists()


# ------------------------------------- 3. stubbed-binary reconstruct run


def _write_stub(path, body):
    with open(path, "w") as f:
        f.write(f"#!{sys.executable}\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


FFMPEG_STUB = """\
import os, shutil, sys
# last argv is the output pattern '<dir>/%04d.jpg'
pattern = sys.argv[-1]
src = os.environ["STUB_FRAMES_DIR"]
frames = sorted(os.listdir(src))
for i, name in enumerate(frames):
    shutil.copyfile(os.path.join(src, name), pattern % (i + 1))
"""

COLMAP_STUB = """\
import os, shutil, sys
sub = sys.argv[1]
def arg(flag):
    return sys.argv[sys.argv.index(flag) + 1]
if sub == "feature_extractor":
    open(arg("--database_path"), "wb").close()
elif sub == "mapper":
    os.makedirs(os.path.join(arg("--output_path"), "0"), exist_ok=True)
elif sub == "model_converter":
    dst = arg("--output_path")
    for name in os.listdir(os.environ["STUB_COLMAP_TXT"]):
        shutil.copyfile(os.path.join(os.environ["STUB_COLMAP_TXT"], name),
                        os.path.join(dst, name))
# sequential_matcher / bundle_adjuster: no-op
"""


def _rotmat_to_qvec(R):
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w < 1e-8:  # not hit by the orbit poses below
        raise ValueError("degenerate rotation")
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


@pytest.mark.slow
def test_reconstruct_video_to_mesh_with_stubbed_binaries(
        tmp_path, monkeypatch):
    """video -> poses -> masks -> training -> mesh with ffmpeg/colmap
    replaced by stubs: the real subprocess surface, stage handoffs and
    file contracts all execute."""
    from PIL import Image

    from human_body_reconstruction_tpu.cli import reconstruct
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.pipeline import poses as poses_lib

    n, H, W = 5, 40, 40
    ds = synthetic.make_dataset(n_views=n, H=H, W=W)

    # frames the ffmpeg stub will "extract"
    frames_dir = tmp_path / "stub_frames"
    frames_dir.mkdir()
    for k in range(n):
        Image.fromarray((np.asarray(ds["images"][k]) * 255).astype(
            np.uint8)).save(frames_dir / f"src_{k:04d}.png")

    # COLMAP TXT model CONSISTENT with the rendered views: invert the
    # synthetic ngp-convention c2ws back through the axis maps
    # (poses.colmap_axes_to_nerf) into COLMAP (q, t) world-to-camera.
    txt_dir = tmp_path / "stub_model"
    txt_dir.mkdir()
    K = np.asarray(ds["K"])
    (txt_dir / "cameras.txt").write_text(
        f"1 PINHOLE {W} {H} {K[0,0]} {K[1,1]} {K[0,2]} {K[1,2]}\n")
    lines = ["# stub model"]
    perm_inv = poses_lib._WORLD_PERM.T
    flip = poses_lib._CAM_FLIP
    for k in range(n):
        c2w_colmap = perm_inv @ np.asarray(ds["c2ws"][k], np.float64) @ flip
        w2c = np.linalg.inv(c2w_colmap)
        q = _rotmat_to_qvec(w2c[:3, :3])
        t = w2c[:3, 3]
        vals = " ".join(f"{v:.12f}" for v in np.concatenate([q, t]))
        # ffmpeg pattern names frames %04d.jpg starting at 1
        lines.append(f"{k+1} {vals} 1 {k+1:04d}.jpg")
        lines.append("0 0 1")
    (txt_dir / "images.txt").write_text("\n".join(lines) + "\n")

    # stub binaries on PATH
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    _write_stub(bin_dir / "ffmpeg", FFMPEG_STUB)
    _write_stub(bin_dir / "colmap", COLMAP_STUB)
    monkeypatch.setenv("PATH", f"{bin_dir}{os.pathsep}"
                               f"{os.environ.get('PATH', '')}")
    monkeypatch.setenv("STUB_FRAMES_DIR", str(frames_dir))
    monkeypatch.setenv("STUB_COLMAP_TXT", str(txt_dir))

    video = tmp_path / "capture.mp4"
    video.write_bytes(b"not a real video")
    work = tmp_path / "run"
    monkeypatch.chdir(tmp_path)
    reconstruct.main([
        "--video_in", str(video), "--workdir", str(work),
        "--segment_backend", "threshold",
        "--steps", "120", "--num_batch", "512", "--num_samples", "16",
        "--near", "2.0", "--far", "6.0",
        "--iso", "0.5", "--resolution", "40"])

    # every stage boundary produced its artifact
    assert (work / "images" / "0001.jpg").exists()          # ffmpeg stub
    with open(work / "transforms.json") as f:               # SfM -> poses
        meta = json.load(f)
    assert len(meta["frames"]) == n
    assert (work / "transforms_masked.json").exists()       # segmentation
    assert (work / "results" / "recon_ckpt.npz").exists()   # training
    mesh = work / "mesh.ply"                                # export
    assert mesh.exists() and mesh.stat().st_size > 0
