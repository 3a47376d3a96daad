"""Persistent render server (cli/serve.py).

PERF_NOTES "AOT executable cache": fresh-process serving pays a ~2-min
checkpoint/executable upload floor through the remote tunnel, so
production serving keeps one long-lived process.  These tests pin the
server's contract: restore-once, render-many, per-request overrides,
bad requests answered (not fatal), and the JSON-lines transport.
"""

import base64
import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _train_tiny(tmp_path, name, extra=()):
    from human_body_reconstruction_tpu.cli import train_hash

    out = str(tmp_path / "run")
    train_hash.main([
        "--synthetic", "--steps", "150", "--num_batch", "1024",
        "--num_samples", "16", "--hash_size", "12", "--max_res", "128",
        "--num_levels", "4", "--features_per_level", "2",
        "--out_dir", out, "--log_every", "0", "--model_name", name,
        *extra])
    return out


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from human_body_reconstruction_tpu.cli import serve

    tmp_path = tmp_path_factory.mktemp("srv")
    out = _train_tiny(tmp_path, "s", extra=[
        "--occupancy", "--occ_warmup", "0", "--update_rate", "50"])
    args = serve.build_parser().parse_args([
        "--ckpt_dir", out, "--model_name", "s",
        "--bound_pth", os.path.join(out, "bounds_model.npy"),
        "--use_occ", "--height", "24", "--width", "24",
        "--num_samples", "16", "--chunk", "288"])
    return serve.RenderServer(args)


def test_serve_health_and_render_b64(server):
    h = server.handle({"cmd": "health"})
    assert h["ok"] and h["use_occ"] and h["served"] == 0

    r = server.handle({"orbit": {"index": 0, "count": 4}, "id": "v0"})
    assert r["ok"], r
    assert r["id"] == "v0" and r["H"] == 24 and r["rays_per_sec"] > 0
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(r["image_b64"])))
    assert img.size == (24, 24)
    assert server.handle({"cmd": "health"})["served"] == 1


def test_serve_c2w_out_path_and_overrides(server, tmp_path):
    from human_body_reconstruction_tpu.data import synthetic

    c2w = np.asarray(synthetic.orbit_poses(4)[1])
    path = str(tmp_path / "view.png")
    r = server.handle({"c2w": c2w.tolist(), "out_path": path,
                       "height": 16, "width": 16, "num_samples": 8})
    assert r["ok"], r
    assert r["path"] == path and os.path.getsize(path) > 100
    assert r["H"] == 16 and "image_b64" not in r

    # guided override serves close to the exact ladder (trained occ grid)
    rg = server.handle({"c2w": c2w.tolist(), "eval_guided": 8,
                        "no_image": True})
    assert rg["ok"] and rg["eval_guided"] == 8


def test_serve_bad_requests_do_not_kill(server):
    r = server.handle({"c2w": [[1, 2], [3, 4]]})
    assert r["ok"] is False and "4x4" in r["error"]
    r = server.handle({})
    assert r["ok"] is False and "c2w" in r["error"]
    # server still alive
    assert server.handle({"cmd": "health"})["ok"]


def test_serve_rejects_guided_without_occ(tmp_path):
    from human_body_reconstruction_tpu.cli import serve

    out = _train_tiny(tmp_path, "n")            # no occupancy grid
    args = serve.build_parser().parse_args([
        "--ckpt_dir", out, "--model_name", "n",
        "--bound_pth", os.path.join(out, "bounds_model.npy"),
        "--eval_guided", "8"])
    with pytest.raises(SystemExit):
        serve.RenderServer(args)
    # per-request guided on an occ-less server: answered, not fatal
    args2 = serve.build_parser().parse_args([
        "--ckpt_dir", out, "--model_name", "n",
        "--bound_pth", os.path.join(out, "bounds_model.npy"),
        "--height", "16", "--width", "16", "--num_samples", "8"])
    srv = serve.RenderServer(args2)
    r = srv.handle({"orbit": {"index": 0}, "eval_guided": 8})
    assert r["ok"] is False and "occupancy" in r["error"]


def test_serve_stdio_subprocess(tmp_path):
    """End-to-end JSON-lines transport in a real subprocess."""
    out = _train_tiny(tmp_path, "p")
    reqs = "\n".join([
        json.dumps({"cmd": "health"}),
        json.dumps({"orbit": {"index": 1, "count": 4}, "id": "a",
                    "out_path": str(tmp_path / "a.png")}),
        "not json at all",
        json.dumps({"cmd": "quit"}),
    ]) + "\n"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=os.pathsep.join(sys.path))
    proc = subprocess.run(
        [sys.executable, "-m", "human_body_reconstruction_tpu.cli.serve",
         "--ckpt_dir", out, "--model_name", "p",
         "--bound_pth", os.path.join(out, "bounds_model.npy"),
         "--height", "16", "--width", "16", "--num_samples", "8",
         "--chunk", "256"],
        input=reqs, capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 4, proc.stdout
    health, render, bad, bye = lines
    assert health["ok"] and health["served"] == 0
    assert render["ok"] and render["id"] == "a"
    assert os.path.getsize(tmp_path / "a.png") > 100
    assert bad["ok"] is False and "bad json" in bad["error"]
    assert bye["ok"] and bye["bye"]


def test_serve_batch_orbit_prerender(server, tmp_path):
    """'batch' prerenders every orbit pose in ONE fused dispatch
    (render_poses_fused) and writes/returns all frames."""
    out_dir = str(tmp_path / "frames")
    r = server.handle({"batch": True, "orbit": {"count": 3},
                       "height": 16, "width": 16, "num_samples": 8,
                       "out_dir": out_dir, "id": "orb"})
    assert r["ok"], r
    assert r["frames"] == 3 and r["id"] == "orb"
    assert len(r["paths"]) == 3
    for p in r["paths"]:
        assert os.path.getsize(p) > 100
    # frames must differ (different poses actually rendered)
    from PIL import Image

    a = np.asarray(Image.open(r["paths"][0]), np.float32)
    b = np.asarray(Image.open(r["paths"][1]), np.float32)
    assert np.abs(a - b).max() > 0

    # explicit pose-stack form, b64 payload, matches single-pose render
    from human_body_reconstruction_tpu.data import synthetic

    poses = np.asarray(synthetic.orbit_poses(3))
    rb = server.handle({"batch": True, "c2ws": poses.tolist(),
                        "height": 16, "width": 16, "num_samples": 8})
    assert rb["ok"] and len(rb["images_b64"]) == 3
    import base64 as b64mod
    import io as iomod

    one = server.handle({"c2w": poses[1].tolist(), "height": 16,
                         "width": 16, "num_samples": 8})
    img_batch = np.asarray(Image.open(iomod.BytesIO(
        b64mod.b64decode(rb["images_b64"][1]))), np.float32)
    img_one = np.asarray(Image.open(iomod.BytesIO(
        b64mod.b64decode(one["image_b64"]))), np.float32)
    # same field, same pose, both fused paths -> pixel-identical u8
    np.testing.assert_allclose(img_batch, img_one, atol=1)


def test_serve_batch_bad_request(server):
    r = server.handle({"batch": True})
    assert not r["ok"] and "c2ws" in r["error"]
