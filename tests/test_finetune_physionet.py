"""Finetune loop (multi-seed + top-k averaging) and PhysioNet path."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DuettConfig, OptimConfig,
                                                    TrainConfig)
from multimodal_edema_prediction_tpu.data.physionet import (
    N_STATIC, N_TS_VARS, make_synthetic_physionet)
from multimodal_edema_prediction_tpu.data.sliding import \
    build_stay_label_dataset
from multimodal_edema_prediction_tpu.ops import lupi_losses as LL
from multimodal_edema_prediction_tpu.train.finetune_loop import finetune_duett

import jax.numpy as jnp


@pytest.mark.slow
def test_physionet_finetune_multiseed(tmp_path):
    ds, meta = make_synthetic_physionet(n_patients=250, obs_rate=0.4)
    duett = DuettConfig(n_variables=N_TS_VARS, n_timesteps=24,
                        d_static=N_STATIC, d_embedding=8, n_layers=1,
                        d_feedforward=32, d_hidden_mlp_embedding=16,
                        d_hidden_tab_encoder=16)
    ft_ds = build_stay_label_dataset(ds, meta, 24)
    assert ft_ds.split_size("train") > 0
    cfg = TrainConfig(batch_size=32, epochs=3, patience=3, dtype="float32",
                      optim=OptimConfig(lr=2e-3, warmup_steps=10,
                                        weight_decay=1e-5))
    summary = finetune_duett(ft_ds, duett, cfg, str(tmp_path), seeds=(0, 1),
                             top_k=3)
    assert len(summary["per_seed"]) == 2
    assert np.isfinite(summary["test_auroc_mean"])
    assert summary["test_auroc_mean"] > 0.5  # severity drives mortality


def test_lupi_losses(rng):
    B, D = 32, 16
    lp = jnp.array(rng.normal(size=B).astype(np.float32))
    ld = jnp.array(rng.normal(size=B).astype(np.float32))
    y = rng.random(B).astype(np.float32)
    y[::5] = np.nan
    fused_p = jnp.array(rng.normal(size=(B, 4, D)).astype(np.float32))
    fused_d = jnp.array(rng.normal(size=(B, 4, D)).astype(np.float32))
    out = LL.dual_stream_distillation_loss(
        lp, ld, jnp.array(y), fused_priv=fused_p, fused_deploy=fused_d,
        readout_priv=fused_p.mean(1), readout_deploy=fused_d.mean(1),
        cov_weight=0.1)
    for k in ("total", "bce_priv", "bce_deploy", "fd", "rd", "kd", "cov"):
        assert np.isfinite(float(out[k])), k
    # identical streams → zero feature-distillation; KD equals the sigmoid
    # entropy at T=2 (BCE of a distribution against itself), not zero.
    same = LL.dual_stream_distillation_loss(
        lp, lp, jnp.array(y), fused_priv=fused_p, fused_deploy=fused_p)
    assert float(same["fd"]) < 1e-6
    p_t = 1 / (1 + np.exp(-np.asarray(lp) / 2.0))
    entropy = -(p_t * np.log(p_t) + (1 - p_t) * np.log(1 - p_t))
    valid = ~np.isnan(y)
    expected = 4.0 * entropy[valid].mean()
    assert abs(float(same["kd"]) - expected) < 1e-4


def test_masked_soft_ce_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    logits = rng.normal(size=(16, 3)).astype(np.float32)
    probs = rng.random((16, 3)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    mask = (rng.random(16) < 0.7).astype(np.float32)
    ours, count = LL.masked_soft_cross_entropy(
        jnp.array(logits), jnp.array(probs), jnp.array(mask))
    lp = F.log_softmax(torch.tensor(logits), dim=-1)
    ce = -(torch.tensor(probs) * lp).sum(-1)
    theirs = (ce * torch.tensor(mask)).sum() / torch.tensor(mask).sum()
    assert abs(float(ours) - float(theirs)) < 1e-5
    assert int(count) == int(mask.sum())
