"""Pose math + COLMAP parsing + transforms writer tests (host-side)."""

import json
import os

import numpy as np
import pytest

from human_body_reconstruction_tpu.pipeline import capture, poses


# ---------------------------------------------------------------------------
# quaternions / pose conversion
# ---------------------------------------------------------------------------

def test_qvec2rotmat_identity_and_axes():
    np.testing.assert_allclose(poses.qvec2rotmat([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # 90 deg about z: (cos45, 0, 0, sin45)
    c = np.cos(np.pi / 4)
    R = poses.qvec2rotmat([c, 0, 0, c])
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_qvec2rotmat_orthonormal_batch():
    rng = np.random.RandomState(0)
    q = rng.randn(10, 4)
    R = poses.qvec2rotmat(q)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)),
                               atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


def test_colmap_to_c2w_roundtrip():
    rng = np.random.RandomState(1)
    q = rng.randn(5, 4)
    t = rng.randn(5, 3)
    c2w = poses.colmap_to_c2w(q, t)
    # w2c @ c2w == I
    R = poses.qvec2rotmat(q)
    for k in range(5):
        w2c = np.eye(4)
        w2c[:3, :3] = R[k]
        w2c[:3, 3] = t[k]
        np.testing.assert_allclose(w2c @ c2w[k], np.eye(4), atol=1e-10)


def test_rotation_between():
    R = poses.rotation_between([1, 0, 0], [0, 1, 0])
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-10)
    # opposite directions
    R = poses.rotation_between([0, 0, 1], [0, 0, -1])
    np.testing.assert_allclose(R @ [0, 0, 1], [0, 0, -1], atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-8)


def _orbit_c2ws(n=12, radius=3.0, center=(1.0, -2.0, 0.5), up_tilt=0.3):
    """Cameras on a tilted orbit looking at a non-origin centre."""
    from human_body_reconstruction_tpu.data.synthetic import look_at_pose

    c = np.asarray(center)
    ups = np.array([np.sin(up_tilt), 0, np.cos(up_tilt)])
    out = []
    for k in range(n):
        th = 2 * np.pi * k / n
        eye = c + radius * np.array([np.cos(th), np.sin(th), 0.4])
        out.append(look_at_pose(eye, target=c, up=ups))
    return np.stack(out).astype(np.float64)


def test_center_of_attention_exact():
    c2ws = _orbit_c2ws()
    p = poses.center_of_attention(c2ws)
    np.testing.assert_allclose(p, [1.0, -2.0, 0.5], atol=1e-5)


def test_normalize_poses_properties():
    c2ws = _orbit_c2ws()
    out = poses.normalize_poses(c2ws, target_dist=4.0)
    # recentred: look-at point ~ origin
    p = poses.center_of_attention(out)
    np.testing.assert_allclose(p, [0, 0, 0], atol=1e-5)
    # rescaled: mean distance 4
    d = np.linalg.norm(out[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d.mean(), 4.0, rtol=1e-6)
    # reoriented: mean camera-up along +z
    up = out[:, :3, 1].sum(axis=0)
    up /= np.linalg.norm(up)
    assert up[2] > 0.99


# ---------------------------------------------------------------------------
# COLMAP text parsing
# ---------------------------------------------------------------------------

CAMERAS_OPENCV = ("# Camera list\n"
                  "1 OPENCV 1920 1080 1400.0 1410.0 960.0 540.0 "
                  "0.01 -0.02 0.001 0.002\n")
CAMERAS_SIMPLE = "1 SIMPLE_PINHOLE 640 480 500.0 320.0 240.0\n"
CAMERAS_FISH = ("1 OPENCV_FISHEYE 1000 800 600.0 610.0 500.0 400.0 "
                "0.1 0.2 0.3 0.4\n")


def test_parse_cameras_opencv(tmp_path):
    p = tmp_path / "cameras.txt"
    p.write_text(CAMERAS_OPENCV)
    intr = capture.parse_cameras_txt(str(p))
    assert intr["fl_x"] == 1400.0 and intr["fl_y"] == 1410.0
    assert intr["k1"] == 0.01 and intr["p2"] == 0.002
    assert not intr["is_fisheye"]
    assert abs(intr["camera_angle_x"]
               - 2 * np.arctan(1920 / (2 * 1400))) < 1e-9


def test_parse_cameras_simple_pinhole(tmp_path):
    p = tmp_path / "cameras.txt"
    p.write_text(CAMERAS_SIMPLE)
    intr = capture.parse_cameras_txt(str(p))
    assert intr["fl_x"] == intr["fl_y"] == 500.0
    assert intr["cx"] == 320.0 and intr["cy"] == 240.0


def test_parse_cameras_fisheye(tmp_path):
    p = tmp_path / "cameras.txt"
    p.write_text(CAMERAS_FISH)
    intr = capture.parse_cameras_txt(str(p))
    assert intr["is_fisheye"] and intr["k4"] == 0.4


def test_parse_images_txt(tmp_path):
    txt = ("# image list, two lines per image\n"
           "1 0.9 0.1 0.2 0.3 1.0 2.0 3.0 1 img one.jpg\n"
           "100 200 1\n"
           "2 1.0 0.0 0.0 0.0 -1.0 0.5 2.5 1 b.jpg\n"
           "300 400 2\n")
    p = tmp_path / "images.txt"
    p.write_text(txt)
    entries = capture.parse_images_txt(str(p))
    assert len(entries) == 2
    name, q, t = entries[0]
    assert name == "img_one.jpg"   # spaces in names joined with _
    np.testing.assert_allclose(q, [0.9, 0.1, 0.2, 0.3])
    np.testing.assert_allclose(t, [1.0, 2.0, 3.0])


def test_build_transforms_end_to_end(tmp_path):
    """COLMAP text model -> transforms.json readable by our dataset loader."""
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    (tmp_path / "text").mkdir()
    (tmp_path / "text" / "cameras.txt").write_text(
        "1 PINHOLE 32 24 40.0 41.0 16.0 12.0\n")
    lines = ["# hdr"]
    rng = np.random.RandomState(0)
    for k in range(4):
        th = 2 * np.pi * k / 4
        # somewhat arbitrary valid poses
        q = np.array([np.cos(th / 2), 0.1, np.sin(th / 2), 0.0])
        q /= np.linalg.norm(q)
        t = np.array([np.cos(th), np.sin(th), 0.2]) * 2
        lines.append(f"{k+1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 f{k}.jpg")
        lines.append("0 0 1")
        Image.fromarray(
            (rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(
                img_dir / f"f{k}.jpg")
    (tmp_path / "text" / "images.txt").write_text("\n".join(lines) + "\n")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        out = capture.build_transforms("text", "images")
        capture.write_transforms(out, "transforms.json")
        assert len(out["frames"]) == 4
        assert out["fl_x"] == 40.0
        # mean camera distance normalised to 4
        c2ws = np.asarray([f["transform_matrix"] for f in out["frames"]])
        d = np.linalg.norm(c2ws[:, :3, 3], axis=-1)
        np.testing.assert_allclose(d.mean(), 4.0, rtol=1e-6)
        assert all(f["sharpness"] >= 0 for f in out["frames"])

        # loadable by the dataset reader (instant-ngp format branch)
        from human_body_reconstruction_tpu.data import datasets
        ds = datasets.load_nerf_json("transforms.json")
        assert ds["images"].shape == (4, 24, 32, 3)
        np.testing.assert_allclose(ds["K"][0, 0], 40.0)
    finally:
        os.chdir(cwd)


def test_keep_colmap_coords(tmp_path):
    (tmp_path / "text").mkdir()
    (tmp_path / "text" / "cameras.txt").write_text(
        "1 PINHOLE 32 24 40.0 41.0 16.0 12.0\n")
    (tmp_path / "text" / "images.txt").write_text(
        "1 1 0 0 0 0 0 5 1 a.jpg\n0 0 1\n")
    out = capture.build_transforms(str(tmp_path / "text"), "images",
                                   keep_colmap_coords=True,
                                   compute_sharpness=False)
    m = np.asarray(out["frames"][0]["transform_matrix"])
    # identity rotation with t=(0,0,5): centre at -t, then y/z flipped
    np.testing.assert_allclose(m[:3, 3], [0, 0, -5], atol=1e-12)
    np.testing.assert_allclose(np.diag(m[:3, :3]), [1, -1, -1], atol=1e-12)


def test_colmap2nerf_cli_flag_surface():
    from human_body_reconstruction_tpu.cli import colmap2nerf

    p = colmap2nerf.build_parser()
    args = p.parse_args(["--video_in", "v.mp4", "--video_fps", "3",
                         "--run_colmap", "--colmap_matcher", "exhaustive",
                         "--aabb_scale", "16", "--keep_colmap_coords",
                         "--out", "t.json", "--skip_early", "2"])
    assert args.colmap_matcher == "exhaustive"
    assert args.video_fps == 3
