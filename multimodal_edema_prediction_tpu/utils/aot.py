"""Persistent ahead-of-time (AOT) executable cache.

The JAX compilation cache (``JAX_COMPILATION_CACHE_DIR``) does not persist
large executables through every backend (the tunneled TPU relay in this
environment serializes only small programs), and a serving process must not
pay a multi-minute XLA compile per shape bucket on every restart. This module
pins the *compiled executable itself* to disk via
``jax.experimental.serialize_executable`` keyed by everything that makes it
valid to reuse:

    sha256(jax version, device kind, device count, StableHLO of the lowering)

Lowering is host-side and cheap, so callers always lower and only the backend
compile is skipped on a hit. Any failure (backend without serialization
support, topology mismatch, corrupt file) degrades to a fresh compile — the
cache is an optimization, never a correctness dependency.

Used by the serving warmup (``serve/predictor.py`` ``aot_dir``) and available
to benchmarks (``bench.py`` carries an equivalent opt-in path).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional, Tuple


def cache_key(lowered) -> str:
    """Topology+program digest for one lowering."""
    import jax
    devs = jax.devices()
    key_src = "\x00".join([jax.__version__, devs[0].device_kind,
                           str(len(devs)), lowered.as_text()])
    return hashlib.sha256(key_src.encode()).hexdigest()[:32]


def load_or_compile(lowered, cache_dir: Optional[str],
                    force: bool = False) -> Tuple[object, bool]:
    """``lowered`` → (compiled executable, loaded_from_cache).

    With ``cache_dir=None`` this is exactly ``lowered.compile()``.
    ``force=True`` skips the load and overwrites the cache entry — used
    when a previously-loaded executable FAILED at execution time (e.g.
    XLA:CPU AOT machine-feature mismatch on a migrated host), so the stale
    file is replaced by a fresh compile instead of being re-loaded forever.
    """
    if not cache_dir:
        return lowered.compile(), False
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, cache_key(lowered) + ".aotx")
    if os.path.exists(path) and not force:
        try:
            import jax
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            with open(path, "rb") as f:
                payload, in_tree, out_tree, dev_ids = pickle.load(f)
            # deserialize_and_load defaults execution_devices to EVERY
            # backend device — an executable compiled for 1 device then
            # demands n-way-sharded args at call time. Re-pin it to the
            # device set it was compiled for.
            by_id = {d.id: d for d in jax.devices()}
            devs = [by_id[i] for i in dev_ids]
            return deserialize_and_load(payload, in_tree, out_tree,
                                        execution_devices=devs), True
        except Exception:
            pass    # stale/corrupt/unsupported → recompile below
    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize
        dev_ids = [d.id for d in
                   compiled._executable.xla_executable.local_devices()]
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((*serialize(compiled), dev_ids), f)
        os.replace(tmp, path)   # atomic: concurrent warmups never see a torn file
    except Exception:
        pass        # serialization unsupported on this backend — still compiled
    return compiled, False
