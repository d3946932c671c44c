"""Legacy teacher mode: adaptive 7x7 pooling, TemporalPerceiver fusion,
main+aux heads, and one training step."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multimodal_edema_prediction_tpu.config import (DuettConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.models.perceiver import \
    adaptive_avg_pool_tokens
from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
from multimodal_edema_prediction_tpu.train import engine
from multimodal_edema_prediction_tpu.train.optim import make_optimizer
from multimodal_edema_prediction_tpu.train.state import TrainState
from multimodal_edema_prediction_tpu.train.teacher_loop import (
    make_synthetic_image_source, teacher_frozen_prefixes)

import pytest

CFG = TeacherConfig(
    duett=DuettConfig(n_variables=6, n_timesteps=8, d_static=5,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=56, patch_size=14, d_model=16, n_layers=1,
                  n_heads=2, d_feedforward=32),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=16, n_heads=2,
                              head_hidden=8),
    perceiver_type="legacy")


def test_adaptive_pool_matches_torch(rng):
    x = rng.normal(size=(2, 37 * 37, 5)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool_tokens(jnp.array(x), 7))
    t = torch.tensor(x).transpose(1, 2).reshape(2, 5, 37, 37)
    theirs = F.adaptive_avg_pool2d(t, (7, 7)).flatten(2).transpose(1, 2)
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_legacy_forward_and_train_step(rng):
    model = TeacherModel(CFG)
    B, T, V = 4, 8, 6
    args = (jnp.array(rng.normal(size=(B, T, 2 * V + 1)).astype(np.float32)),
            jnp.array(rng.normal(size=(B, 5)).astype(np.float32)),
            jnp.zeros((B, T)),
            jnp.array(rng.random((B, 56, 56, 3)).astype(np.float32)))
    vars_ = model.init(jax.random.key(0), *args)
    out = model.apply(vars_, *args)
    assert out["main_logit"].shape == (B,)
    assert out["aux_logit"].shape == (B,)

    tcfg = TrainConfig(batch_size=B, dtype="float32")
    tx = make_optimizer(tcfg.optim, 10,
                        frozen_prefixes=teacher_frozen_prefixes(CFG))
    state = TrainState.create(vars_["params"], vars_["batch_stats"], tx)
    step = engine.make_teacher_legacy_step(
        model, tcfg, CFG.duett, T, jnp.float32, aux_alpha=0.3,
        image_source=make_synthetic_image_source(56))
    grid = jnp.array(rng.normal(size=(6, 16, 2 * V)).astype(np.float32))
    static = jnp.array(rng.normal(size=(6, 5)).astype(np.float32))
    batch = {"stay_rows": jnp.arange(B, dtype=jnp.int32),
             "slot_idx": jnp.full((B,), T, jnp.int32),
             "image_ids": jnp.arange(B, dtype=jnp.int32),
             "y": jnp.array([0., 1., 0., 1.]),
             "y_multi": jnp.zeros((B, 7)),
             "bin_ends": jnp.zeros((B, T))}
    state2, out = step(state, grid, static, batch, jax.random.key(1))
    assert np.isfinite(float(out["loss"]))
    assert float(out["aux_loss"]) > 0
    assert int(state2.step) == 1
