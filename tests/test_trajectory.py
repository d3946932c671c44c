"""LocalTrajectoryEncoder: shapes, REP validity, masking, grads, and the
time-since-observation recurrence (reference smoke test idioms,
analysis/smoke_test_trajectory_encoder.py:20-53)."""
import jax
import jax.numpy as jnp
import numpy as np

from jitu import jit_grad, jit_init
from multimodal_edema_prediction_tpu.models.trajectory import (
    LocalTrajectoryEncoder, time_since_last_observation)


def test_time_since_last_observation():
    obs = np.zeros((1, 6, 2), bool)
    obs[0, 1, 0] = True
    obs[0, 4, 0] = True
    out = np.asarray(time_since_last_observation(jnp.array(obs)))
    # var 0: t0 no obs → 1; t1 obs → 2 then reset; t2 → 1; t3 → 2; t4 obs → 3
    np.testing.assert_allclose(out[0, :, 0], [1, 2, 1, 2, 3, 1])
    # var 1 never observed: accumulates
    np.testing.assert_allclose(out[0, :, 1], [1, 2, 3, 4, 5, 6])


def _make_sparse(rng, B=3, T=24, V=5):
    counts = (rng.random((B, T, V)) < 0.2) * rng.integers(1, 4, (B, T, V))
    values = rng.normal(size=(B, T, V)) * (counts > 0)
    return jnp.array(np.concatenate([values, counts], axis=-1)
                     .astype(np.float32))


def test_shapes_mask_and_grads(rng):
    x = _make_sparse(rng)
    m = LocalTrajectoryEncoder(n_vars=5, n_timesteps=24, d_model=16)
    vars_ = jit_init(m, jax.random.key(0), x)
    tokens, pad = m.apply(vars_, x, return_padding_mask=True)
    W = 3
    assert tokens.shape == (3, 5 * W + 1, 16)
    assert pad.shape == (3, 5 * W + 1)
    assert np.isfinite(np.asarray(tokens)).all()
    # REP token never masked
    assert (~np.asarray(pad)[:, -1]).all()
    # windows with no observations are masked
    counts = np.asarray(x[..., 5:])
    obs = (counts > 0).transpose(0, 2, 1)   # [B,V,T]
    boundaries = [(24 - 6, 24), (24 - 12, 24 - 6), (0, 24 - 12)]
    pad_np = np.asarray(pad)
    for b in range(3):
        for v in range(5):
            for wi, (s, e) in enumerate(boundaries):
                assert pad_np[b, v * W + wi] == (not obs[b, v, s:e].any())

    def loss(p):
        t = m.apply({**vars_, "params": p}, x, train=True,
                    rngs={"dropout": jax.random.key(1)})
        return (t ** 2).mean()

    g = jit_grad(loss, vars_["params"])
    gnorm = sum(float(jnp.abs(a).sum()) for a in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
