"""Unit tests for flax building blocks, incl. torch-parity for BatchNorm."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_edema_prediction_tpu.models import layers as L


def test_scalenorm_matches_formula(rng):
    x = jnp.array(rng.normal(size=(4, 10, 32)).astype(np.float32))
    m = L.ScaleNorm()
    vars_ = m.init(jax.random.key(0), x)
    out = m.apply(vars_, x)
    d = 32
    norm = np.linalg.norm(np.asarray(x), axis=-1, keepdims=True) * d ** -0.5
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x) / np.maximum(norm, 1e-5),
                               rtol=1e-5)


def test_batchnorm_lastdim_matches_torch_train_and_eval(rng):
    x = rng.normal(size=(16, 7, 12)).astype(np.float32) * 2 + 1
    m = L.BatchNormLastDim()
    vars_ = m.init(jax.random.key(0), jnp.array(x), use_running_average=False)

    tbn = torch.nn.BatchNorm1d(12)
    tbn.train()
    tx = torch.tensor(x)
    t_out = tbn(tx.transpose(1, 2)).transpose(1, 2).detach().numpy()

    out, mutated = m.apply(vars_, jnp.array(x), use_running_average=False,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), t_out, rtol=1e-4, atol=1e-5)

    # running stats after one step must match torch (momentum 0.1)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["BatchNorm_0"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    # running variance updates with the UNBIASED batch variance — exact torch
    # BatchNorm1d semantics (normalization itself stays biased)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["BatchNorm_0"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_simple_mlp_structure_and_grads(rng):
    x = jnp.array(rng.normal(size=(8, 10)).astype(np.float32))
    m = L.SimpleMLP(d_out=3, n_hidden=2, d_hidden=16, hidden_batch_norm=True,
                    dropout=0.1)
    vars_ = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.shape == (8, 3)

    def loss(p):
        o, _ = m.apply({**vars_, "params": p}, x, train=True,
                       rngs={"dropout": jax.random.key(1)},
                       mutable=["batch_stats"])
        return (o ** 2).mean()

    g = jax.grad(loss)(vars_["params"])
    norms = jax.tree.map(lambda a: float(jnp.abs(a).sum()), g)
    total = sum(jax.tree.leaves(norms))
    assert np.isfinite(total) and total > 0


def test_per_variable_mlp_equals_independent_mlps(rng):
    """The einsum stack must equal V independent Linear-ReLU-BN-Linear nets."""
    B, T, V, dh, do = 4, 5, 3, 8, 6
    x = rng.normal(size=(B, T, V, 2)).astype(np.float32)
    m = L.PerVariableMLP(n_variables=V, d_out=do, d_hidden=dh)
    vars_ = m.init(jax.random.key(0), jnp.array(x), train=False)
    p = vars_["params"]
    out = np.asarray(m.apply(vars_, jnp.array(x), train=False))

    for v in range(V):
        h = x[:, :, v, :] @ np.asarray(p["w1"][v]) + np.asarray(p["b1"][v])
        h = np.maximum(h, 0)
        # eval-mode BN with init stats: (h - 0)/sqrt(1+eps) * scale + bias
        h = h / np.sqrt(1 + 1e-5)
        expected = h @ np.asarray(p["w2"][v]) + np.asarray(p["b2"][v])
        np.testing.assert_allclose(out[:, :, v, :], expected, rtol=1e-4,
                                   atol=1e-5)


def test_mha_matches_manual_attention(rng):
    B, Q, K, D, H, dh = 2, 3, 5, 16, 2, 4
    q = jnp.array(rng.normal(size=(B, Q, D)).astype(np.float32))
    kv = jnp.array(rng.normal(size=(B, K, D)).astype(np.float32))
    m = L.MultiHeadAttention(n_heads=H, d_head=dh)
    vars_ = m.init(jax.random.key(0), q, kv)
    out, w = m.apply(vars_, q, kv, return_weights=True)
    assert out.shape == (B, Q, D)
    assert w.shape == (B, Q, K)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones((B, Q)),
                               rtol=1e-5)


def test_transformer_encoder_shapes_and_finite(rng):
    x = jnp.array(rng.normal(size=(2, 35, 600)).astype(np.float32))
    m = L.TransformerEncoder(n_layers=1, n_heads=2, d_head=12,
                             d_feedforward=512)
    vars_ = m.init(jax.random.key(0), x)
    out = m.apply(vars_, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
