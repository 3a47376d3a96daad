"""Iso-surface extraction + mesh export tests (native C++ extension)."""

import os
import struct

import numpy as np
import pytest

from human_body_reconstruction_tpu.ops import marching_cubes as mc


def sphere_grid(n=48, r=0.35):
    ax = np.linspace(0, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    d = np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2)
    # density high inside the sphere
    return (r - d).astype(np.float32)


def test_native_extension_builds_and_extracts_sphere():
    g = sphere_grid(48, 0.35)
    verts, faces = mc.marching_cubes(g, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    assert faces.max() < len(verts)
    # vertices lie near the analytic sphere of radius 0.35*(n-1)
    n = 48
    c = (n - 1) / 2
    rad = np.linalg.norm(verts - c, axis=1) / (n - 1)
    assert abs(np.mean(rad) - 0.35) < 0.01
    assert np.std(rad) < 0.01


def test_marching_iso_level_shifts_radius():
    g = sphere_grid(40, 0.4)
    v1, _ = mc.marching_cubes(g, 0.0)     # radius 0.4
    v2, _ = mc.marching_cubes(g, 0.15)    # radius 0.25
    n = 40
    c = (n - 1) / 2
    r1 = np.mean(np.linalg.norm(v1 - c, axis=1)) / (n - 1)
    r2 = np.mean(np.linalg.norm(v2 - c, axis=1)) / (n - 1)
    assert abs(r1 - 0.4) < 0.01 and abs(r2 - 0.25) < 0.01


def test_empty_grid_gives_empty_mesh():
    g = np.zeros((8, 8, 8), np.float32)
    verts, faces = mc.marching_cubes(g, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_weld_reduces_duplicates():
    g = sphere_grid(24, 0.3)
    verts, faces = mc.marching_cubes(g, 0.0)
    wverts, wfaces = mc.weld_vertices(verts, faces)
    assert len(wverts) < len(verts)
    assert wfaces.shape == faces.shape
    assert wfaces.max() < len(wverts)


def test_key_weld_matches_positional_weld():
    """Edge-key welding (1-D int64 unique) must produce the same mesh as
    the positional row-unique it replaces — same welded vertex set and
    the same triangles as coordinate triples."""
    g = sphere_grid(32, 0.35)
    verts, faces, keys = mc.marching_cubes(g, 0.0, return_keys=True)
    assert keys.shape == (len(verts),)
    kv, kf = mc.weld_vertices(verts, faces, keys=keys)
    pv, pf = mc.weld_vertices(verts, faces)
    assert len(kv) == len(pv)
    assert np.allclose(np.sort(kv.ravel()), np.sort(pv.ravel()), atol=1e-5)
    # triangle multisets: compare sorted centroid coordinate lists
    ck = np.sort(kv[kf].mean(axis=1).round(5).ravel())
    cp = np.sort(pv[pf].mean(axis=1).round(5).ravel())
    assert np.allclose(ck, cp, atol=1e-4)
    # equal key <=> bit-identical position (exact-weld invariant)
    order = np.argsort(keys, kind="stable")
    sk, sv = keys[order], verts[order]
    same = sk[1:] == sk[:-1]
    assert np.array_equal(sv[1:][same], sv[:-1][same])


def test_grid_interp_matches_manual_trilerp():
    rng = np.random.RandomState(0)
    g = rng.rand(5, 6, 7, 3).astype(np.float32)
    # exact grid points
    v = np.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], np.float32)
    out = mc.grid_interp(g, v)
    np.testing.assert_allclose(out[0], g[1, 2, 3], rtol=1e-5)
    np.testing.assert_allclose(out[1], g[0, 0, 0], rtol=1e-5)
    # midpoint
    v = np.asarray([[0.5, 0.0, 0.0]], np.float32)
    out = mc.grid_interp(g, v)
    np.testing.assert_allclose(out[0], 0.5 * (g[0, 0, 0] + g[1, 0, 0]),
                               rtol=1e-5)


def test_verts_to_world():
    verts = np.asarray([[0.0, 0.0, 0.0], [9.0, 9.0, 9.0]], np.float32)
    w = mc.verts_to_world(verts, [-1, -2, -3], [1, 2, 3], 10)
    np.testing.assert_allclose(w[0], [-1, -2, -3])
    np.testing.assert_allclose(w[1], [1, 2, 3])


def test_ply_writer_roundtrip(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    colors = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    p = str(tmp_path / "m.ply")
    mc.write_ply(p, verts, faces, colors)
    raw = open(p, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"element vertex 3" in header
    assert b"element face 1" in header
    # vertex record: 3 float32 + 3 uchar = 15 bytes
    x, y, z = struct.unpack("<fff", body[:12])
    assert (x, y, z) == (0, 0, 0)
    assert body[12:15] == bytes([255, 0, 0])


def test_obj_writer(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.obj")
    mc.write_obj(p, verts, faces)
    lines = open(p).read().strip().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"


def test_mesh_export_pipeline_from_trained_model(tmp_path):
    """Density sweep + extraction from an actual trained synthetic model."""
    import jax
    import jax.numpy as jnp

    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.pipeline import mesh_export
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=6, log2_table_size=12, n_min=4,
                          n_max=128),
        render=C.RenderConfig(num_samples=32),
        train=C.TrainConfig(ray_batch=1024),
    )
    ds = synthetic.make_dataset(n_views=6, H=32, W=32)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, 200)
    for _ in range(200):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 1024)

    cache = str(tmp_path / "density_grid_w_rgb.npy")
    out = str(tmp_path / "blobs.ply")
    stats = mesh_export.export_mesh(
        state.params, scene, cfg, resolution=48, iso=1.0, chunk=32768,
        cache_path=cache, out_path=out, verbose=False)
    assert stats["num_faces"] > 50, stats
    assert os.path.exists(out) and os.path.exists(cache)
    # cache layout parity: (R, R, R, 4)
    assert np.load(cache).shape == (48, 48, 48, 4)
    # cache reuse path
    stats2 = mesh_export.export_mesh(
        state.params, scene, cfg, resolution=48, iso=1.0, chunk=32768,
        cache_path=cache, out_path=out, verbose=False)
    assert stats2["num_faces"] == stats["num_faces"]


def test_nerf2mesh_cli_normalization_roundtrip(tmp_path):
    """Mesh export must honour the trainer's normalization mode — a
    mismatch silently evaluates the field at wrong coordinates."""
    from human_body_reconstruction_tpu.cli import nerf2mesh, train_hash

    out = str(tmp_path / "run")
    train_hash.main([
        "--synthetic", "--steps", "150", "--num_batch", "1024",
        "--num_samples", "16", "--hash_size", "12", "--max_res", "128",
        "--normalization", "unit_box",
        "--out_dir", out, "--log_every", "0", "--model_name", "nb"])
    mesh_out = str(tmp_path / "m.ply")
    nerf2mesh.main([
        "--ckpt_dir", out, "--model_name", "nb",
        "--bound_pth", os.path.join(out, "bounds_model.npy"),
        "--resolution", "40", "--iso", "1.0", "--cache", "",
        "--hash_size", "12", "--max_res", "128",
        "--normalization", "unit_box", "--out", mesh_out])
    assert os.path.getsize(mesh_out) > 500


def test_nerf2mesh_cli_int8_dense_checkpoint(tmp_path):
    """Checkpoints trained with the round-2 encoder formats (int8 packed
    table + dense coarse levels) must export: the CLI restores the full
    config (incl. dense_levels/pack_format) from <model>_config.json and
    the params template must match the saved tree."""
    from human_body_reconstruction_tpu.cli import nerf2mesh, train_hash

    out = str(tmp_path / "run")
    train_hash.main([
        "--synthetic", "--steps", "150", "--num_batch", "1024",
        "--num_samples", "16", "--hash_size", "12", "--max_res", "128",
        "--num_levels", "8", "--features_per_level", "4",
        "--stochastic", "--packed", "--pack_format", "int8",
        "--dense_levels", "-1",
        "--out_dir", out, "--log_every", "0", "--model_name", "i8"])
    mesh_out = str(tmp_path / "i8.ply")
    nerf2mesh.main([
        "--ckpt_dir", out, "--model_name", "i8",
        "--bound_pth", os.path.join(out, "bounds_model.npy"),
        "--resolution", "40", "--iso", "1.0", "--cache", "",
        "--out", mesh_out])
    assert os.path.getsize(mesh_out) > 500


def test_sdf_mesh_export(tmp_path):
    """SDF-mode checkpoints export a zero-level-set mesh (iso 0)."""
    import jax

    from human_body_reconstruction_tpu.cli import nerf2mesh, train_hash

    out = str(tmp_path / "run")
    train_hash.main([
        "--synthetic", "--steps", "120", "--num_batch", "512",
        "--num_samples", "16", "--hash_size", "12", "--max_res", "128",
        "--use_sdf", "--out_dir", out, "--log_every", "0",
        "--model_name", "sdf"])
    mesh_out = str(tmp_path / "sdf.ply")
    nerf2mesh.main([
        "--ckpt_dir", out, "--model_name", "sdf",
        "--bound_pth", os.path.join(out, "bounds_model.npy"),
        "--resolution", "32", "--iso", "0.0", "--cache", "",
        "--hash_size", "12", "--max_res", "128", "--use_sdf",
        "--out", mesh_out])
    assert os.path.exists(mesh_out)


def test_resolve_iso_auto_offset_sdf():
    """auto iso finds the surface band of a phi-ratio-trained pseudo-SDF
    whose values never cross zero (round-5 chip finding: the compositor
    only constrains phi DROPS, so the field carries a constant offset)."""
    from human_body_reconstruction_tpu.pipeline import mesh_export

    rng = np.random.default_rng(0)
    # bulk empty space at ~-0.55, a small interior blob at ~-0.93
    field = -0.55 + 0.01 * rng.standard_normal((32, 32, 32))
    field[12:20, 12:20, 12:20] = -0.93
    level = mesh_export.resolve_iso(field, "auto")
    assert -0.93 < level < -0.55
    # numbers pass through; junk strings raise
    assert mesh_export.resolve_iso(field, 30.0) == 30.0
    with pytest.raises(ValueError):
        mesh_export.resolve_iso(field, "otsu")
