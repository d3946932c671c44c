"""Golden test: aux residual Bernoulli-KL vs the reference torch formula
(training_duett/engine.py:149-165)."""
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_edema_prediction_tpu.ops.losses import aux_residual_kl


def test_aux_residual_kl_matches_reference(rng):
    B, K = 32, 7
    img = rng.normal(size=(B, K)).astype(np.float32) * 2
    corr = rng.normal(size=(B, K)).astype(np.float32)
    y = (rng.random((B, K)) < 0.4).astype(np.float32)
    mask = (rng.random((B, K)) < 0.8).astype(np.float32)

    ours = float(aux_residual_kl(jnp.array(img), jnp.array(corr),
                                 jnp.array(y), jnp.array(mask)))

    eps = 0.05
    yt = torch.tensor(y)
    y_smooth = yt * (1 - eps) + (1 - yt) * eps
    anchor = torch.tensor(img)
    p = torch.sigmoid(anchor + torch.tensor(corr)).clamp(1e-6, 1 - 1e-6)
    kl = (y_smooth * (y_smooth.log() - p.log())
          + (1 - y_smooth) * ((1 - y_smooth).log() - (1 - p).log()))
    m = torch.tensor(mask)
    theirs = float((kl * m).sum() / m.sum().clamp(min=1.0))
    assert abs(ours - theirs) < 1e-5
