"""Config sanity for the quality-matrix TPU experiment modes.

Each mode in scripts/quality_matrix.py costs minutes of remote-TPU
time; a typo'd mode config (bad dataclass field, inconsistent
variant/flag combination) should fail HERE on CPU, not there.
"""

import dataclasses
import importlib.util
import os

import pytest


def _load_quality_matrix():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                        "quality_matrix.py")
    spec = importlib.util.spec_from_file_location("quality_matrix", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def modes():
    from human_body_reconstruction_tpu.ops import dense_grid
    from human_body_reconstruction_tpu.utils import config as C

    qm = _load_quality_matrix()
    return qm.make_modes(C, dense_grid)


def test_all_modes_construct_and_are_consistent(modes):
    assert len(modes) >= 10
    for name, cfg in modes.items():
        # dataclass __post_init__ already validated variant/flag combos;
        # check the derived dims are sane and the guided modes carry the
        # occupancy machinery they rely on
        assert cfg.hash.out_dim > 0, name
        if cfg.render.occ_guided:
            assert cfg.render.occupancy, name
            assert cfg.render.occ_probes > 0, name
        if "cp" in name.split("_"):
            assert cfg.hash.variant == "cp", name


def test_mode_train_overrides_survive_ray_batch_replace(modes):
    """main() overrides only ray_batch; per-mode train fields (e.g. the
    TV weight) must survive — regression for the TrainConfig wipe."""
    tv_modes = {n: c for n, c in modes.items() if "tv" in n}
    assert tv_modes, "expected TV A/B modes"
    for name, cfg in tv_modes.items():
        assert cfg.train.cp_tv_weight > 0, name
        replaced = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ray_batch=1234))
        assert replaced.train.cp_tv_weight == cfg.train.cp_tv_weight
        assert replaced.train.ray_batch == 1234
