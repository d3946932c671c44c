"""Pallas row-gather kernel (ops/pallas_gather.py) + the NaN-sentinel
feature-bank gather built on it (data/features.py::CXRFeatureBank).

The kernel's TPU path is exercised via Pallas interpret mode here (CPU
host); on-device numerics were verified against XLA's gather on v5e
(see the kernel docstring for the measured win).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_edema_prediction_tpu.ops.pallas_gather import gather_rows


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_gather_rows_3d_interpret(dtype):
    import ml_dtypes
    dt = ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype
    rng = np.random.default_rng(0)
    bank = rng.normal(size=(37, 16, 128)).astype(np.float32).astype(dt)
    rows = rng.integers(0, 37, size=9).astype(np.int32)
    out = gather_rows(jnp.asarray(bank), jnp.asarray(rows), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), bank[rows])


def test_gather_rows_2d_interpret():
    rng = np.random.default_rng(1)
    bank = rng.normal(size=(21, 128)).astype(np.float32)
    rows = rng.integers(0, 21, size=5).astype(np.int32)
    out = gather_rows(jnp.asarray(bank), jnp.asarray(rows), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), bank[rows])


def test_gather_rows_repeated_rows():
    # Duplicate indices must read the same bank row independently.
    bank = np.arange(6 * 8 * 128, dtype=np.float32).reshape(6, 8, 128)
    rows = np.array([3, 3, 0, 5, 3], np.int32)
    out = gather_rows(jnp.asarray(bank), jnp.asarray(rows), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), bank[rows])


def test_gather_grad_flows_through_consumers():
    # The bank is frozen (no VJP defined for the kernel) but gradients w.r.t.
    # weights CONSUMING the gathered rows must be unaffected.
    rng = np.random.default_rng(2)
    bank = jnp.asarray(rng.normal(size=(11, 4, 128)).astype(np.float32))
    rows = jnp.asarray(np.array([1, 4, 9], np.int32))
    w = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))

    def loss(w, gather):
        feats = gather(bank, rows)
        return jnp.sum(feats @ w)

    g_pallas = jax.grad(loss)(w, lambda b, r: gather_rows(b, r, interpret=True))
    g_xla = jax.grad(loss)(w, lambda b, r: b[r])
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-6)


def test_feature_bank_sentinel_poisons_invalid_rows():
    from multimodal_edema_prediction_tpu.data import features as F
    rng = np.random.default_rng(3)
    n, p, d = 7, 5, 16
    ids = np.arange(100, 100 + n, dtype=np.int64)
    cls = rng.normal(size=(n, d)).astype(np.float32)
    patches = rng.normal(size=(n, p, d)).astype(np.float32)
    bank = F.CXRFeatureBank(ids, cls, patches)

    # keyed_by_row: out-of-range rows gather the NaN sentinel row.
    src = bank.feature_source(keyed_by_row=True)
    got_cls, got_p = src({"image_ids": jnp.asarray([0, n - 1, n, -1])})
    np.testing.assert_allclose(np.asarray(got_cls[0]), cls[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p[1]), patches[n - 1], rtol=1e-6)
    assert np.isnan(np.asarray(got_cls[2])).all()
    assert np.isnan(np.asarray(got_p[2])).all()
    assert np.isnan(np.asarray(got_cls[3])).all()

    # raw-id path: unknown ids poison, known ids resolve.
    src2 = bank.feature_source(keyed_by_row=False)
    got_cls2, got_p2 = src2({"image_ids": jnp.asarray([103, 55555])})
    np.testing.assert_allclose(np.asarray(got_cls2[0]), cls[3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p2[0]), patches[3], rtol=1e-6)
    assert np.isnan(np.asarray(got_cls2[1])).all()
    assert np.isnan(np.asarray(got_p2[1])).all()


def test_feature_bank_nbytes_counts_sentinel():
    from multimodal_edema_prediction_tpu.data import features as F
    assert F.CXRFeatureBank.nbytes(0, n_patches=1369, d=768) == 1370 * 768 * 2


def test_gather_rows_shard_map_interpret_on_cpu_mesh():
    # The multi-chip path: bank replicated, rows sharded on the data axis,
    # the kernel running per-shard under shard_map. Exercised in interpret
    # mode on the 8-device CPU mesh (real-TPU numerics are covered by the
    # single-device kernel, identical per shard).
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    mesh = meshlib.create_mesh(0, 1)
    n_data = mesh.shape["data"]
    assert n_data > 1, "conftest should provide a multi-device CPU mesh"
    rng = np.random.default_rng(4)
    bank = rng.normal(size=(19, 8, 128)).astype(np.float32)
    rows = rng.integers(0, 19, size=2 * n_data).astype(np.int32)
    with mesh:
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        by_data = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        bank_dev = jax.device_put(jnp.asarray(bank), rep)
        rows_dev = jax.device_put(jnp.asarray(rows), by_data)
        out = jax.jit(lambda b, r: gather_rows(b, r, interpret=True,
                                               mesh=mesh))(bank_dev, rows_dev)
    np.testing.assert_array_equal(np.asarray(out), bank[rows])
