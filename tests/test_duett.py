"""DuETT encoder / SSL / classifier tests: shapes, masking semantics, grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import DuettConfig
from jitu import jit_apply, jit_grad, jit_init
from multimodal_edema_prediction_tpu.models import duett as D

CFG = DuettConfig(n_variables=6, n_timesteps=8, d_static=5, d_embedding=8,
                  n_layers=2, d_feedforward=32, d_hidden_mlp_embedding=16,
                  d_hidden_tab_encoder=16)


def _batch(rng, B=4, cfg=CFG):
    T, V = cfg.n_timesteps, cfg.n_variables
    values = rng.normal(size=(B, T, V)).astype(np.float32)
    counts = rng.integers(0, 4, size=(B, T, V)).astype(np.float32)
    values = values * (counts > 0)
    x_ts = np.concatenate([values, counts], axis=-1)
    x_static = rng.normal(size=(B, cfg.d_static)).astype(np.float32)
    times = np.broadcast_to(
        (np.arange(1, T + 1) / 24.0).astype(np.float32), (B, T)).copy()
    return jnp.array(x_ts), jnp.array(x_static), jnp.array(times)


def test_feats_to_input_appends_zero_mask_col(rng):
    x_ts, x_static, _ = _batch(rng)
    x_in, _ = D.feats_to_input(None, x_ts, x_static)
    assert x_in.shape == (4, 8, 13)
    assert np.asarray(x_in[..., -1]).sum() == 0


def test_feats_to_input_aug_mask_rows(rng):
    x_ts, x_static, _ = _batch(rng)
    x_in, _ = D.feats_to_input(jax.random.key(0), x_ts, x_static,
                               aug_mask=0.99, train=True)
    m = np.asarray(x_in[..., -1]) == 1
    assert m.mean() > 0.5
    assert np.abs(np.asarray(x_in[..., :-1])[m]).sum() == 0


def test_encoder_shapes_and_rep_row(rng):
    x_ts, x_static, times = _batch(rng)
    x_in, _ = D.feats_to_input(None, x_ts, x_static)
    enc = D.DuettEncoder(CFG)
    vars_ = jit_init(enc, jax.random.key(0), x_in, x_static, times)
    tokens, psi = enc.apply(vars_, x_in, x_static, times)
    assert tokens.shape == (4, 9, CFG.d_representation)
    assert psi.shape == (4, 9, 7, 8)
    assert np.isfinite(np.asarray(tokens)).all()


def test_masked_row_replaces_psi_with_mask_embedding(rng):
    """A fully masked timestep must not depend on its input values."""
    x_ts, x_static, times = _batch(rng)
    x_in, _ = D.feats_to_input(None, x_ts, x_static)
    x_in = x_in.at[:, 3, :].set(0.0).at[:, 3, -1].set(1.0)
    enc = D.DuettEncoder(CFG)
    vars_ = jit_init(enc, jax.random.key(0), x_in, x_static, times)
    t1, _ = enc.apply(vars_, x_in, x_static, times)
    # perturb the original values at the masked row → output must not change
    x_in2 = x_in.at[:, 3, :CFG.n_variables].set(99.0)
    x_in2 = x_in2.at[:, 3, -1].set(1.0)
    t2, _ = enc.apply(vars_, x_in2, x_static, times)
    # the mask col==1 row is replaced before attention, but values leak through
    # unless the row was zeroed: the reference zeroes values when masking —
    # verify masking at the psi level by comparing full outputs.
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-4)


def test_pretrain_prep_masks_rows_and_event_var(rng):
    x_ts, _, _ = _batch(rng)
    pb = D.pretrain_prep_batch(jax.random.key(0), x_ts, masked_steps=2,
                               pretrain_dropout=0.0)
    B, T, V = 4, 8, 6
    assert pb.mask_idx.shape == (B, 2)
    assert pb.y_value.shape == (B, 2, V)
    x_in = np.asarray(pb.x_in)
    mi = np.asarray(pb.mask_idx)
    ev = np.asarray(pb.event_var)
    for b in range(B):
        for s in range(2):
            assert x_in[b, mi[b, s], -1] == 1.0
            assert np.abs(x_in[b, mi[b, s], :V]).sum() == 0.0
        # event variable: value col zeroed, count col == -1 at all t
        assert np.abs(x_in[b, :, ev[b]]).sum() == 0.0
        assert (x_in[b, :, V + ev[b]] == -1.0).all()
    # targets gathered from the original tensor
    orig = np.asarray(x_ts)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(pb.y_events)[b],
                                   orig[b, :, ev[b]])


def test_pretrain_dropout_preserves_event_marker(rng):
    x_ts, _, _ = _batch(rng)
    pb = D.pretrain_prep_batch(jax.random.key(1), x_ts, masked_steps=1,
                               pretrain_dropout=0.95)
    x_in = np.asarray(pb.x_in)
    ev = np.asarray(pb.event_var)
    for b in range(4):
        assert (x_in[b, :, 6 + ev[b]] == -1.0).all()


def test_pretrain_model_output_shapes(rng):
    x_ts, x_static, times = _batch(rng)
    pb = D.pretrain_prep_batch(jax.random.key(0), x_ts, masked_steps=1)
    m = D.DuettPretrainModel(CFG)
    vars_ = jit_init(m, jax.random.key(0), pb, x_static, times)
    out = m.apply(vars_, pb, x_static, times)
    assert out["y_hat_value"].shape == (4, 1, 6)
    assert out["y_hat_presence"].shape == (4, 1, 6)
    assert out["y_hat_events"].shape == (4, 8)
    assert out["y_hat_events_presence"].shape == (4, 8)


@pytest.mark.parametrize("fusion", ["rep_token", "averaging"])
def test_classifier_forward_and_nonzero_grads(rng, fusion):
    x_ts, x_static, times = _batch(rng)
    x_in, _ = D.feats_to_input(None, x_ts, x_static)
    m = D.DuettClassifier(CFG, fusion_method=fusion)
    vars_ = jit_init(m, jax.random.key(0), x_in, x_static, times)
    logits = jit_apply(m, vars_, x_in, x_static, times)
    assert logits.shape == (4,)

    def loss(p):
        out, _ = m.apply({**vars_, "params": p}, x_in, x_static, times,
                         train=True, rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"])
        return (out ** 2).mean()

    g = jit_grad(loss, vars_["params"])
    gnorm = sum(jax.tree.leaves(
        jax.tree.map(lambda a: float(jnp.abs(a).sum()), g)))
    assert np.isfinite(gnorm) and gnorm > 0
