"""Int8 post-training quantization for the frozen ViT branch: numerical
error bounds of the quantized matmul and end-to-end logit drift of the
quantized encoder vs the f32/bf16 path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.ops.int8 import (int8_dense,
                                                      int8_matmul,
                                                      quantize_rows)


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    q, s = quantize_rows(x, axis=-1)
    assert q.dtype == jnp.int8
    recon = q.astype(jnp.float32) * s
    # absmax/127 symmetric quant: error ≤ scale/2 per element
    assert float(jnp.abs(recon - x).max()) <= float(s.max()) / 2 + 1e-7


def test_int8_matmul_relative_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(256, 768)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(768, 512)).astype(np.float32) * 0.02)
    exact = x @ w
    quant = int8_matmul(x, w)
    rel = float(jnp.abs(quant - exact).max() / jnp.abs(exact).max())
    assert rel < 0.02, rel


def test_int8_dense_bias_and_dtype():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    y = int8_dense(x, w, b)
    assert y.dtype == jnp.bfloat16
    ref = x.astype(jnp.float32) @ w + b
    assert float(jnp.abs(y.astype(jnp.float32) - ref).max()) < 0.35


def test_vit_int8_logit_drift():
    """Quantized frozen ViT ≈ full-precision ViT at the CLS/patch level —
    the bound that makes int8 safe for the img_logit anchor of residual
    fusion (models/main_architecture_duett.py:637-639)."""
    from multimodal_edema_prediction_tpu.config import ViTConfig
    from multimodal_edema_prediction_tpu.models.vit import DinoViT

    cfg32 = ViTConfig(image_size=56, patch_size=14, d_model=64, n_layers=2,
                      n_heads=2, d_feedforward=128, use_flash_attention=False)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.random((2, 56, 56, 3)).astype(np.float32))
    model = DinoViT(cfg32)
    v = model.init(jax.random.key(0), px)
    cls_f, patch_f = model.apply(v, px)

    cfg_q = ViTConfig(image_size=56, patch_size=14, d_model=64, n_layers=2,
                      n_heads=2, d_feedforward=128,
                      use_flash_attention=False, quant="int8")
    cls_q, patch_q = DinoViT(cfg_q).apply(v, px)   # same params, quant apply
    denom = float(jnp.abs(cls_f).max())
    assert float(jnp.abs(cls_q - cls_f).max()) / denom < 0.05
    cos = float(jnp.sum(cls_q * cls_f)
                / (jnp.linalg.norm(cls_q) * jnp.linalg.norm(cls_f)))
    assert cos > 0.999
    assert patch_q.shape == patch_f.shape
