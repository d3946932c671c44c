"""Fused LN→QKV kernel: interpret-mode parity (fwd + custom-vjp bwd)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.ops.pallas_ln_qkv import (
    fused_ln_qkv, ln_qkv_reference)


def _params(rng, D, H, dh):
    r = lambda *s: jnp.array(  # noqa: E731
        rng.normal(size=s).astype(np.float32) * 0.05)
    return {"ln_scale": jnp.ones(D), "ln_bias": jnp.zeros(D) + 0.1,
            "wq": r(D, H * dh), "wk": r(D, H * dh), "wv": r(D, H * dh),
            "bq": r(H * dh), "bk": r(H * dh), "bv": r(H * dh)}


@pytest.mark.parametrize("B,N,D,H,dh", [(2, 512, 256, 4, 64),
                                        (3, 1024, 128, 2, 64),
                                        (2, 128, 256, 4, 64)])
def test_fused_ln_qkv_matches_reference(rng, B, N, D, H, dh):
    params = _params(rng, D, H, dh)
    x = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    q, k, v = fused_ln_qkv(x, params, H, dh)
    qr, kr, vr = ln_qkv_reference(x, params, H, dh)
    for a, b, name in ((q, qr, "q"), (k, kr, "k"), (v, vr, "v")):
        assert a.shape == (B, H, N, dh)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_ln_qkv_backward(rng):
    B, N, D, H, dh = 2, 256, 128, 2, 64
    params = _params(rng, D, H, dh)
    x = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))

    def loss_fused(x, p):
        q, k, v = fused_ln_qkv(x, p, H, dh)
        return (q ** 2).mean() + (k * v).mean()

    def loss_ref(x, p):
        q, k, v = ln_qkv_reference(x, p, H, dh)
        return (q ** 2).mean() + (k * v).mean()

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-3, atol=1e-6)
    for key in gr[1]:
        np.testing.assert_allclose(np.asarray(gf[1][key]),
                                   np.asarray(gr[1][key]),
                                   rtol=2e-3, atol=1e-6, err_msg=key)
