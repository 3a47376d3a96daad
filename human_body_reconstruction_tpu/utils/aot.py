"""Disk-backed AOT executable cache for the remote-TPU tunnel.

JAX's persistent compilation cache does not engage through the remote
PJRT tunnel this environment uses (every fresh process pays minutes of
remote compile for HLOs it already compiled yesterday), so this module
reimplements the cache one level up: hash the lowered StableHLO plus
the backend identity, serialize the compiled executable with
``jax.experimental.serialize_executable``, and reload it next run.

The reference has no analog (its torch trainers eagerly re-JIT nothing
— CUDA kernels come precompiled); this is TPU-runtime infrastructure
in the sense of SURVEY.md §5 (checkpoint/resume for *executables*).

Usage::

    cache = AOTCache("~/.cache/hbr_aot")
    step = CachedJit(step_lib.train_step, cache,
                     static_argnames=("cfg", "tx", "batch_size"))
    state, m = step(state, scene, imgs, c2ws, K, key,
                    cfg=cfg, tx=tx, batch_size=16384)

Contract: **static arguments must be passed by keyword**; dynamic
arguments keep whatever convention the first call used (the compiled
executable is invoked with the statics stripped and everything else
unchanged — JAX requires the call-time (args, kwargs) pytree to match
the lowering exactly).

Not every PJRT plugin implements executable serialization; on the
first failure the cache degrades to compile-only (one warning, then
silent).  Cache entries are keyed on SHA-256 of the StableHLO text +
jax version + platform + device kind + device count, so stale entries
are never *wrong*, only unused.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import warnings

import jax


def _backend_fingerprint() -> str:
    d = jax.devices()[0]
    return "|".join([jax.__version__, d.platform, str(d.device_kind),
                     str(len(jax.devices()))])


class AOTCache:
    """Content-addressed store of serialized compiled executables."""

    def __init__(self, cache_dir: str):
        self.dir = os.path.expanduser(cache_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.hits = 0
        self.misses = 0
        self.load_s = 0.0      # cumulative deserialize+load time (hits)
        self.compile_s = 0.0   # cumulative compile time (misses)
        self._write_broken = False

    def stats(self) -> str:
        """One-line summary for logs: separates reload cost from compile
        cost so a slow cross-process rerun can be attributed (executable
        deserialization through the remote tunnel vs recompilation vs
        plain chip-rate drift)."""
        return (f"{self.hits} hits ({self.load_s:.1f}s load), "
                f"{self.misses} misses ({self.compile_s:.1f}s compile)")

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key + ".jaxexec")

    def compile(self, lowered):
        """``lowered.compile()`` with a disk round-trip.

        Returns a ``jax.stages.Compiled``-like executable; falls back to
        a plain compile whenever serialization is unsupported or a
        cached entry fails to load.
        """
        import time

        from jax.experimental import serialize_executable as se

        text = lowered.as_text()
        key = hashlib.sha256(
            (_backend_fingerprint() + text).encode()).hexdigest()[:32]
        path = self._path(key)
        if os.path.exists(path):
            try:
                t0 = time.perf_counter()
                with open(path, "rb") as f:
                    payload, in_tree, out_tree, device_ids = pickle.load(f)
                # deserialize_and_load defaults to ALL backend devices; a
                # 1-device executable loaded on an 8-device host then
                # demands 8 input shards — restore the original assignment
                by_id = {d.id: d for d in jax.devices()}
                devices = [by_id[i] for i in device_ids]
                ex = se.deserialize_and_load(payload, in_tree, out_tree,
                                             execution_devices=devices)
                self.hits += 1
                self.load_s += time.perf_counter() - t0
                return ex
            except Exception as e:  # corrupt / backend changed: recompile
                warnings.warn(f"aot cache: load of {path} failed ({e!r}); "
                              "recompiling")
        t0 = time.perf_counter()
        compiled = lowered.compile()
        self.compile_s += time.perf_counter() - t0
        self.misses += 1
        if not self._write_broken:
            try:
                device_ids = [d.id for d in
                              compiled._executable.xla_executable
                              .local_devices()]
                blob = pickle.dumps((*se.serialize(compiled), device_ids))
                fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
                with os.fdopen(fd, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            except Exception as e:
                self._write_broken = True
                warnings.warn("aot cache: backend cannot serialize "
                              f"executables ({e!r}); caching disabled "
                              "for this process")
        return compiled


class CachedJit:
    """Call-compatible wrapper over a jitted function whose executables
    come from an :class:`AOTCache`.

    Per-signature lowering happens once (an in-memory memo mirrors
    jit's own tracing cache); the compiled executable is then invoked
    directly, so steady-state overhead is one dict lookup.
    """

    def __init__(self, jitted, cache: AOTCache, static_argnames=()):
        self.jitted = jitted
        self.cache = cache
        self.static_argnames = frozenset(static_argnames)
        self._memo = {}

    def _sig(self, args, kwargs):
        def leaf_sig(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return ("arr", tuple(x.shape), str(x.dtype))
            return x  # static-ish leaf: must be hashable
        dyn_kwargs = {k: v for k, v in kwargs.items()
                      if k not in self.static_argnames}
        statics = tuple(sorted(
            (k, kwargs[k]) for k in kwargs if k in self.static_argnames))
        leaves, treedef = jax.tree_util.tree_flatten((args, dyn_kwargs))
        return (treedef, tuple(leaf_sig(x) for x in leaves), statics)

    def __call__(self, *args, **kwargs):
        try:
            sig = self._sig(args, kwargs)
            ex = self._memo.get(sig)
        except TypeError:  # unhashable leaf: skip the cache entirely
            return self.jitted(*args, **kwargs)
        if ex is None:
            lowered = self.jitted.lower(*args, **kwargs)
            ex = self.cache.compile(lowered)
            self._memo[sig] = ex
        dyn_kwargs = {k: v for k, v in kwargs.items()
                      if k not in self.static_argnames}
        return ex(*args, **dyn_kwargs)
