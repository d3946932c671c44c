"""ViT ↔ HF Dinov2 numerical parity via the weight converter.

Constructs a randomly-initialized HF ``Dinov2Model`` (no download), converts
its state dict with ``convert_hf_dinov2``, and checks our flax DinoViT
reproduces its CLS/patch outputs — the guarantee needed before loading real
microsoft/rad-dino weights (SURVEY §7.2 "RAD-DINO conversion ... numerics
must match to ~1e-5").
"""
import numpy as np
import pytest
import torch

from multimodal_edema_prediction_tpu.config import ViTConfig
from multimodal_edema_prediction_tpu.models.vit import (DinoViT,
                                                        convert_hf_dinov2)


@pytest.mark.slow
def test_dinov2_conversion_parity():
    from transformers import Dinov2Config, Dinov2Model
    import jax

    # Dinov2 sizes its MLP by mlp_ratio (default 4), not intermediate_size
    hf_cfg = Dinov2Config(hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, mlp_ratio=4,
                          image_size=56, patch_size=14, layerscale_value=1.0,
                          hidden_act="gelu")
    tm = Dinov2Model(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    cfg = ViTConfig(image_size=56, patch_size=14, d_model=64, n_layers=2,
                    n_heads=4, d_feedforward=256, layerscale_init=1.0,
                    use_flash_attention=False)
    params = convert_hf_dinov2(sd, cfg)

    rng = np.random.default_rng(0)
    px = rng.random((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(pixel_values=torch.tensor(
            px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    cls, patches = DinoViT(cfg).apply({"params": params},
                                      px, train=False)
    ours = np.concatenate([np.asarray(cls)[:, None, :],
                           np.asarray(patches)], axis=1)
    np.testing.assert_allclose(ours, t_out, rtol=1e-3, atol=2e-4)
