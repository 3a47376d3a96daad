"""Driver contract: entry() compiles and dryrun_multichip runs on the
virtual 8-device mesh."""

import sys

import numpy as np
import jax


def _load_entry_module():
    sys.path.insert(0, "/root/repo")
    import importlib

    return importlib.import_module("__graft_entry__")


def test_entry_compiles_and_runs():
    mod = _load_entry_module()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4096, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    mod = _load_entry_module()
    mod.dryrun_multichip(8)


def test_dryrun_multichip_2():
    mod = _load_entry_module()
    mod.dryrun_multichip(2)
