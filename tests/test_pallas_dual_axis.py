"""Fused dual-axis encoder block: kernel (interpret mode on CPU) must match
the pure-jax reference, including token padding and the custom-vjp backward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.ops.pallas_dual_axis import (
    encoder_block_reference, fused_encoder_block)


def _params(rng, D, inner, F):
    r = lambda *s: jnp.array(  # noqa: E731
        rng.normal(size=s).astype(np.float32) * 0.1)
    return {"g1": jnp.ones(1), "g2": jnp.ones(1), "gf": jnp.ones(1),
            "wq": r(D, inner), "wk": r(D, inner), "wv": r(D, inner),
            "wo": r(inner, D), "bo": r(D),
            "w1": r(D, F), "b1": r(F), "w2": r(F, D), "b2": r(D)}


@pytest.mark.parametrize("B,L,D", [(8, 35, 600), (4, 25, 840), (6, 7, 96)])
def test_fused_matches_reference(rng, B, L, D):
    inner, F = 24, 512
    params = _params(rng, D, inner, F)
    x = jnp.array(rng.normal(size=(B, L, D)).astype(np.float32))
    ref = encoder_block_reference(x, params, n_heads=2, d_head=12)
    out = fused_encoder_block(x, params, 2, 12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_backward_matches_reference(rng):
    B, L, D, inner, F = 4, 25, 96, 24, 64
    params = _params(rng, D, inner, F)
    x = jnp.array(rng.normal(size=(B, L, D)).astype(np.float32))

    def loss_fused(x, p):
        return (fused_encoder_block(x, p, 2, 12) ** 2).mean()

    def loss_ref(x, p):
        return (encoder_block_reference(x, p, 2, 12) ** 2).mean()

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-3, atol=1e-5)
    for k in gr[1]:
        np.testing.assert_allclose(np.asarray(gf[1][k]), np.asarray(gr[1][k]),
                                   rtol=2e-3, atol=1e-5, err_msg=k)
