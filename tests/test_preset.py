"""--preset resolution (VERDICT r2 item 4): the zero-flag train_hash
run is the quality-matrix flagship (CP r32 guided), reference-style
invocations keep reference semantics, explicit flags always win."""

from human_body_reconstruction_tpu.cli import train_hash


def _cfg(argv):
    return train_hash.make_config(train_hash.build_parser().parse_args(argv))


def test_bare_run_is_cp_flagship():
    cfg = _cfg([])
    assert cfg.hash.variant == "cp"
    # round-5 flagship: 7-level n_max=1448 sum-G-cut ladder at rank 25
    # (C=125 pad-free) — 251.5k rays/s bench at the 33.84 dB textured /
    # 42.10 dB humanoid holdout records (qm_r5_n1448*.json)
    assert cfg.hash.cp_rank == 25
    assert cfg.hash.num_levels == 7
    assert cfg.hash.n_max == 1448
    assert cfg.hash.dense_levels > 0          # auto-selected
    assert cfg.render.num_samples == 128
    assert cfg.render.occupancy and cfg.render.occ_guided
    assert cfg.render.compact_samples == 48
    # p32 = p64 quality (33.58 vs 33.43 dB textured holdout,
    # qm_r4_kprobe.json) at -7 ms/step of probe gathers
    assert cfg.render.occ_probes == 32
    assert cfg.render.occ_dt == "mass"
    # stratified placement: +1.5 dB and +10% rate (qm_r3_textured4.json)
    assert cfg.render.occ_stratified
    # factor-line TV: the off-orbit generalisation fix (+6.9 dB on the
    # 4-pose holdout mean, qm_r3_textured2.json)
    assert cfg.train.cp_tv_weight == 1e-2
    # ... gated until culling locks on (qm_r3_humanoid3/4.json)
    assert cfg.train.cp_tv_warmup > 0
    # subsampled eikonal: full-points SDF HLOs crash the TPU remote
    # compile helper (qm_r4_sdf3.json); 16k points are plenty for a
    # regulariser
    assert cfg.train.eikonal_subsample == 16384


def test_reference_preset_keeps_full_eikonal():
    cfg = _cfg(["--preset", "reference", "--use_sdf"])
    assert cfg.train.eikonal_subsample == 0


def test_hash_flag_flagship_keeps_full_eikonal():
    """ADVICE r4: a reference-leaning config (hash flags flip the
    variant to 'corner', so every other flagship default reverts) must
    ALSO revert eikonal_subsample to reference all-points semantics."""
    cfg = _cfg(["--preset", "flagship", "--stochastic", "--use_sdf"])
    assert cfg.train.eikonal_subsample == 0


def test_no_occ_stratified_override():
    cfg = _cfg(["--no_occ_stratified"])
    assert not cfg.render.occ_stratified
    cfg = _cfg(["--preset", "reference", "--occ_stratified"])
    assert cfg.render.occ_stratified


def test_cp_tv_explicit_zero_disables():
    cfg = _cfg(["--cp_tv", "0"])
    assert cfg.hash.variant == "cp"
    assert cfg.train.cp_tv_weight == 0.0


def test_hash_path_flags_imply_reference_hash_encoder():
    cfg = _cfg(["--stochastic", "--packed", "--hw_rng"])
    assert cfg.hash.variant == "corner"
    assert cfg.hash.num_levels == 16
    assert cfg.render.num_samples == 64
    assert not cfg.render.occupancy


def test_reference_preset_matches_reference_defaults():
    cfg = _cfg(["--preset", "reference"])
    assert cfg.hash.variant == "corner"
    assert cfg.hash.num_levels == 16
    assert cfg.hash.dense_levels == 0
    assert cfg.render.num_samples == 64
    assert not cfg.render.occupancy


def test_explicit_flags_override_preset():
    cfg = _cfg(["--cp_rank", "16", "--compact", "32", "--num_samples",
                "96"])
    assert cfg.hash.cp_rank == 16
    assert cfg.render.compact_samples == 32
    assert cfg.render.num_samples == 96


def test_int8_invocation_unchanged():
    cfg = _cfg(["--stochastic", "--packed", "--pack_format", "int8",
                "--grad_subsample", "--num_levels", "8",
                "--features_per_level", "4", "--dense_levels", "-1",
                "--occupancy", "--compact", "32", "--occ_guided"])
    assert cfg.hash.variant == "corner"
    assert cfg.hash.pack_format == "int8"
    assert cfg.hash.dense_levels > 0
    assert cfg.render.compact_samples == 32


def test_no_occupancy_disables_flagship_culling():
    cfg = _cfg(["--no_occupancy"])
    assert cfg.hash.variant == "cp"
    assert not cfg.render.occupancy
    assert not cfg.render.occ_guided
    assert cfg.render.compact_samples == 0
