"""bench.compile_once: compile-the-timing-loop-executable-once semantics.

The helper exists because the tunneled TPU backend cannot serialize large
executables into the persistent JAX compilation cache, so the cost-analysis
compile and the first jitted call would each pay a full remote compile
(ROADMAP r4-4). These tests pin the contract on the CPU mesh:

- the returned callable is the pre-compiled executable (not the jit
  wrapper) and is iterable bench-style with a donated state argument and
  sharded inputs;
- with ``BENCH_AOT_CACHE=1`` the executable round-trips through the pickle
  file (serialize on miss, ``deserialize_and_load`` on hit) with identical
  numerics;
- any failure degrades to the plain jitted call, never an exception.
"""
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import bench


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


@partial(jax.jit, donate_argnums=0)
def _step(s, x, k):
    noise = jax.random.normal(k, x.shape, x.dtype)
    s = s + jnp.sum(x * x) + 0.0 * jnp.sum(noise)
    return s, {"total": jnp.mean(x) + s}


def _args(mesh):
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    s = jax.device_put(jnp.zeros(()), rep)
    x = jax.device_put(np.arange(16.0, dtype=np.float32).reshape(8, 2), sh)
    return s, x, jax.random.key(1)


def _drive(run, s, x, key, n=3):
    for _ in range(n):
        key, sub = jax.random.split(key)
        s, out = run(s, x, sub)
    return float(s), float(out["total"])


def test_compile_once_returns_executable_and_matches_jit():
    mesh = _mesh()
    with mesh:
        s, x, key = _args(mesh)
        run, flops = bench.compile_once(_step, s, x, key)
        assert run is not _step          # the pre-compiled executable
        assert isinstance(flops, float)  # nan allowed (backend-dependent)
        got = _drive(run, s, x, key)
        s2, x2, key2 = _args(mesh)
        want = _drive(_step, s2, x2, key2)
    assert got == pytest.approx(want, rel=1e-6)


def test_compile_once_aot_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_AOT_CACHE", "1")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    mesh = _mesh()
    with mesh:
        s, x, key = _args(mesh)
        run, _ = bench.compile_once(_step, s, x, key)
        want = _drive(run, s, x, key)

        cached = list((tmp_path / "aot").glob("*.aotx"))
        assert len(cached) == 1 and cached[0].stat().st_size > 0

        # second call: same HLO → hits the .aotx and goes through
        # deserialize_and_load; numerics must be identical. Poison the
        # backend compile so a silent fallback (which would also pass the
        # numeric check) cannot masquerade as a cache hit.
        def _no_compile(self, *a, **kw):
            raise AssertionError("cache hit must not re-compile")

        monkeypatch.setattr(type(jax.jit(lambda: 0).lower()), "compile",
                            _no_compile)
        s2, x2, key2 = _args(mesh)
        run2, _ = bench.compile_once(_step, s2, x2, key2)
        assert run2 is not _step         # deserialized executable, not jit
        got = _drive(run2, s2, x2, key2)
        assert list((tmp_path / "aot").glob("*.aotx")) == cached
    assert got == want


def test_compile_once_degrades_to_jit_on_lower_failure():
    # a "step" without .lower cannot be pre-compiled → helper must hand
    # back the callable unchanged instead of raising
    def plain(s, x, k):
        return s, {"total": jnp.mean(x)}

    run, flops = bench.compile_once(plain, 1.0, jnp.ones(3),
                                    jax.random.key(0))
    assert run is plain and np.isnan(flops)
