"""Golden wiring test: DuettEncoder (eval mode) vs an independent numpy
forward reimplementation using the same parameters.

Catches regressions in the grid assembly, masking precedence, axis
factorization (transpose/reshape order), ScaleNorm/BN eval semantics, and
the decoupled-head-dim attention — the parts SURVEY §7.2 flags as the hard
numerics of the port.
"""
import jax
import jax.numpy as jnp
import numpy as np

from jitu import jit_apply, jit_init

from multimodal_edema_prediction_tpu.config import DuettConfig
from multimodal_edema_prediction_tpu.models import duett as D

CFG = DuettConfig(n_variables=5, n_timesteps=6, d_static=4, d_embedding=8,
                  n_layers=2, n_heads=2, d_feedforward=32,
                  d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16)


def np_scalenorm(x, g, eps=1e-5):
    n = np.linalg.norm(x, axis=-1, keepdims=True) * x.shape[-1] ** -0.5
    return x / np.maximum(n, eps) * g


def np_mha(x, p, n_heads, d_head):
    q = x @ p["q"]["kernel"]
    k = x @ p["k"]["kernel"]
    v = x @ p["v"]["kernel"]

    def split(a):
        return a.reshape(a.shape[:-1] + (n_heads, d_head))

    q, k, v = split(q), split(k), split(v)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * d_head ** -0.5
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bkhd->bqhd", w, v)
    o = o.reshape(o.shape[:-2] + (n_heads * d_head,))
    return o @ p["out"]["kernel"] + p["out"]["bias"]


def np_encoder_block(x, p, n_heads, d_head):
    h = np_scalenorm(x, p["layer_0"]["norm_attn"]["g"])
    x = x + np_mha(h, p["layer_0"]["attn"], n_heads, d_head)
    h = np_scalenorm(x, p["layer_0"]["norm_ff"]["g"])
    h = h @ p["layer_0"]["ff_in"]["kernel"] + p["layer_0"]["ff_in"]["bias"]
    # exact (erf) GELU — matches torch nn.GELU / x_transformers FF
    from scipy.special import erf
    h = 0.5 * h * (1 + erf(h / np.sqrt(2.0)))
    x = x + h @ p["layer_0"]["ff_out"]["kernel"] + p["layer_0"]["ff_out"]["bias"]
    return np_scalenorm(x, p["final_norm"]["g"])


def np_mlp_bn(x, p, train=False):
    """SimpleMLP(n_hidden=1, hidden_batch_norm) in eval mode (init BN stats)."""
    h = x @ p["in"]["kernel"] + p["in"]["bias"]
    h = np.maximum(h, 0)
    bn = p["bn_out"]["BatchNorm_0"]
    h = h / np.sqrt(1 + 1e-5) * bn["scale"] + bn["bias"]
    return h @ p["out"]["kernel"] + p["out"]["bias"]


def np_cve(x, p):
    h = x @ p["in"]["kernel"] + p["in"]["bias"]
    h = np.tanh(h)
    bn = p["bn"]["BatchNorm_0"]
    h = h / np.sqrt(1 + 1e-5) * bn["scale"] + bn["bias"]
    return h @ p["out"]["kernel"] + p["out"]["bias"]


def test_encoder_matches_numpy_reimplementation(rng):
    B, T, V, d = 3, CFG.n_timesteps, CFG.n_variables, CFG.d_embedding
    values = rng.normal(size=(B, T, V)).astype(np.float32)
    counts = rng.integers(0, 5, (B, T, V)).astype(np.float32)
    values *= counts > 0
    mask_col = np.zeros((B, T, 1), np.float32)
    mask_col[0, 2, 0] = 1.0                       # one masked row
    x_in = np.concatenate([values * (mask_col == 0),
                           counts * (mask_col == 0), mask_col], -1
                          ).astype(np.float32)
    # one event-masked variable on sample 1
    x_in[1, :, 3] = 0.0
    x_in[1, :, V + 3] = -1.0
    x_static = rng.normal(size=(B, CFG.d_static)).astype(np.float32)
    times = np.broadcast_to(np.arange(1, T + 1, dtype=np.float32) / 24.0,
                            (B, T)).copy()

    enc = D.DuettEncoder(CFG)
    variables = jit_init(enc, jax.random.key(0), jnp.asarray(x_in),
                         jnp.asarray(x_static), jnp.asarray(times))
    tokens, psi = jit_apply(enc, variables, jnp.asarray(x_in),
                            jnp.asarray(x_static), jnp.asarray(times))
    p = jax.tree.map(np.asarray, variables["params"])

    # ---- numpy forward ----
    vals, cnts = x_in[..., :V], x_in[..., V:2 * V]
    event_mask = cnts == -1.0
    event_mask = np.concatenate([event_mask, np.zeros((B, T, 1), bool)], 2)
    event_mask = np.concatenate([event_mask, event_mask[:, :1]], 1)
    n_obs = p["n_obs_embedding"]["embedding"][
        np.clip(cnts.astype(int), 0, CFG.n_obs_bins - 1)][..., 0]
    cell = np.stack([vals, n_obs], -1)

    pv = p["embedding_layers"]
    h = np.einsum("btvc,vcd->btvd", cell, pv["w1"]) + pv["b1"]
    h = np.maximum(h, 0)
    h = h / np.sqrt(1 + 1e-5) * pv["bn_scale"] + pv["bn_bias"]
    emb = np.einsum("btvd,vdo->btvo", h, pv["w2"]) + pv["b2"]

    static_emb = np_mlp_bn(x_static, p["tab_encoder"])
    psi_np = np.concatenate(
        [emb, np.broadcast_to(static_emb[:, None, None, :], (B, T, 1, d))], 2)
    special = p["special_embeddings"]
    psi_np = np.concatenate(
        [psi_np, np.broadcast_to(special[1], (B, 1, V + 1, d))], 1)
    row_mask = np.concatenate([x_in[..., -1] == 1, np.zeros((B, 1), bool)], 1)
    psi_np = np.where(row_mask[:, :, None, None], special[0], psi_np)
    psi_np = np.where(event_mask[..., None], special[0], psi_np)

    time_emb = np_cve(times[..., None], p["full_time_embedding"])
    time_emb = np.concatenate(
        [time_emb, np.broadcast_to(p["full_rep_embedding"],
                                   (B, 1, CFG.tt_dim))], 1)
    d_head = d // CFG.n_heads
    for i in range(CFG.n_layers):
        ev = psi_np.transpose(0, 2, 1, 3).reshape(B, V + 1, CFG.et_dim)
        ev = ev + p["full_event_embedding"]
        ev = np_encoder_block(ev, p[f"event_transformer_{i}"], CFG.n_heads,
                              d_head)
        psi_np = ev.reshape(B, V + 1, T + 1, d).transpose(0, 2, 1, 3)
        tt = psi_np.reshape(B, T + 1, CFG.tt_dim) + time_emb
        tt = np_encoder_block(tt, p[f"time_transformer_{i}"], CFG.n_heads,
                              d_head)
        psi_np = tt.reshape(B, T + 1, V + 1, d)

    np.testing.assert_allclose(np.asarray(tokens),
                               psi_np.reshape(B, T + 1, CFG.tt_dim),
                               rtol=2e-4, atol=2e-5)
