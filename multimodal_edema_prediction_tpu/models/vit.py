"""RAD-DINO-style DINOv2 ViT-B/14 CXR encoder — flax, NHWC, TPU-friendly.

Reference wraps HF ``microsoft/rad-dino`` (models/main_architecture_duett.py:
129-158): frozen backbone, returns CLS [B,768] and patch tokens [B,1369,768]
for 518×518 inputs. This is a from-scratch DINOv2 architecture implementation
(patch conv → CLS + learned position embeddings → pre-LN blocks with
LayerScale → final LN) plus a converter for HF Dinov2 checkpoints.

TPU notes: NHWC conv layout; the large matmuls (QKV 768×768, MLP 768×3072)
carry optional tensor-parallel shardings (see ``parallel/mesh.py``); the
whole backbone runs in bf16 with f32 params.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import ViTConfig
from .layers import MultiHeadAttention, _ProjParams, gelu_exact

# Image normalization applied by the HF AutoImageProcessor for rad-dino.
# Override via checkpoint-conversion metadata when converting real weights.
IMAGE_MEAN = (0.5307, 0.5307, 0.5307)
IMAGE_STD = (0.2583, 0.2583, 0.2583)


def normalize_image(pixels: jnp.ndarray, mean=IMAGE_MEAN, std=IMAGE_STD
                    ) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] → normalized."""
    m = jnp.asarray(mean, pixels.dtype)
    s = jnp.asarray(std, pixels.dtype)
    return (pixels - m) / s


class DinoBlock(nn.Module):
    cfg: ViTConfig
    valid_len: Optional[int] = None   # true token count when pre-padded

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        ls_init = nn.initializers.constant(cfg.layerscale_init)
        # LN statistics are computed in f32 internally (flax promotes); the
        # OUTPUT stays in compute dtype — an f32 output doubles HBM traffic
        # and forces convert fusions before every matmul (profiled).
        h = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm1")(x)
        h = MultiHeadAttention(cfg.n_heads, cfg.d_model // cfg.n_heads,
                               cfg.dropout, qkv_bias=True,
                               use_flash=cfg.use_flash_attention,
                               flash_block_b=cfg.flash_block_b,
                               quant=cfg.quant,
                               name="attn")(h, h, train=train,
                                            valid_len=self.valid_len
                                            ).astype(x.dtype)
        ls1 = self.param("layerscale1", ls_init, (cfg.d_model,), jnp.float32)
        x = x + h * ls1.astype(x.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm2")(x)
        if cfg.quant == "int8":
            # same {kernel,bias} param tree as nn.Dense — checkpoints and
            # the HF converter are quantization-agnostic; weights quantize
            # inside the step (constant-folded for the frozen branch)
            from ..ops.int8 import int8_dense
            w1, b1 = _ProjParams(cfg.d_feedforward,
                                 name="mlp_in")(cfg.d_model)
            h = int8_dense(h, w1, b1)
            h = gelu_exact(h)
            w2, b2 = _ProjParams(cfg.d_model,
                                 name="mlp_out")(cfg.d_feedforward)
            h = int8_dense(h, w2, b2)
        else:
            h = nn.Dense(cfg.d_feedforward, dtype=x.dtype,
                         param_dtype=jnp.float32, name="mlp_in")(h)
            h = gelu_exact(h)
            h = nn.Dense(cfg.d_model, dtype=x.dtype, param_dtype=jnp.float32,
                         name="mlp_out")(h)
        ls2 = self.param("layerscale2", ls_init, (cfg.d_model,), jnp.float32)
        return x + h * ls2.astype(x.dtype)


class DinoViT(nn.Module):
    """Returns (cls [B,D], patches [B,N,D]) like CXREncoder with
    return_patches=True."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        B = pixel_values.shape[0]
        x = nn.Conv(cfg.d_model, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=pixel_values.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(pixel_values)
        x = x.reshape(B, -1, cfg.d_model)                  # [B, N, D]
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.d_model), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, cfg.d_model)), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.n_patches + 1, cfg.d_model), jnp.float32)
        x = x + pos.astype(x.dtype)

        # Pad the token dim ONCE to the flash block multiple; every layer's
        # attention masks the pads via segment ids. Profiling showed per-layer
        # pad/transpose copies cost ~40% of the teacher step otherwise.
        # 128-multiple (1370→1408): 5.6% wasted attention area vs 26% at the
        # r1 512-multiple (1536) — measured 17% faster per layer with
        # full-length blocks (benchmarks/flash_tune.py).
        n_tokens = cfg.n_patches + 1
        valid_len = None
        if cfg.use_flash_attention and n_tokens >= 256:
            n_padded = ((n_tokens + 127) // 128) * 128
            if n_padded != n_tokens:
                x = jnp.pad(x, ((0, 0), (0, n_padded - n_tokens), (0, 0)))
                valid_len = n_tokens

        for i in range(cfg.n_layers):
            x = DinoBlock(cfg, valid_len=valid_len,
                          name=f"block_{i}")(x, train=train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype,
                         name="final_norm")(x).astype(pixel_values.dtype)
        if valid_len is not None:
            x = x[:, :n_tokens]
        return x[:, 0], x[:, 1:]


# =============================================================================
# HF Dinov2 checkpoint conversion (torch state_dict → flax params)
# =============================================================================
def convert_hf_dinov2(state_dict: dict, cfg: ViTConfig) -> dict:
    """Convert a HF ``Dinov2Model`` state dict (e.g. microsoft/rad-dino) to
    this module's parameter tree. Accepts numpy-valued dicts."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: dict = {}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    emb = "embeddings"
    conv_w = sd[f"{emb}.patch_embeddings.projection.weight"]  # [D,3,14,14]
    p["patch_embed"] = {
        "kernel": conv_w.transpose(2, 3, 1, 0),               # HWIO
        "bias": sd[f"{emb}.patch_embeddings.projection.bias"],
    }
    p["cls_token"] = sd[f"{emb}.cls_token"]
    pos = sd[f"{emb}.position_embeddings"]
    if pos.shape[1] != cfg.n_patches + 1:
        raise ValueError(
            f"position embedding length {pos.shape[1]} != {cfg.n_patches + 1};"
            " interpolate before conversion")
    p["pos_embed"] = pos

    for i in range(cfg.n_layers):
        b = f"encoder.layer.{i}"
        blk = {
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "attn": {
                "q": lin(f"{b}.attention.attention.query"),
                "k": lin(f"{b}.attention.attention.key"),
                "v": lin(f"{b}.attention.attention.value"),
                "out": lin(f"{b}.attention.output.dense"),
            },
            "mlp_in": lin(f"{b}.mlp.fc1"),
            "mlp_out": lin(f"{b}.mlp.fc2"),
            "layerscale1": sd[f"{b}.layer_scale1.lambda1"],
            "layerscale2": sd[f"{b}.layer_scale2.lambda1"],
        }
        p[f"block_{i}"] = blk
    p["final_norm"] = ln("layernorm")
    return jax.tree.map(jnp.asarray, p)


def load_vit_params(path: str, cfg: ViTConfig) -> dict:
    """Load a converted RAD-DINO checkpoint (scripts/convert_rad_dino.py
    output, ``save_checkpoint`` format) and validate its shapes against the
    DinoViT parameter tree for ``cfg``."""
    from ..train.checkpoint import load_checkpoint
    loaded = load_checkpoint(path)["params"]
    template = jax.eval_shape(
        lambda: DinoViT(cfg).init(
            jax.random.key(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3))))["params"]
    t_flat = jax.tree_util.tree_flatten_with_path(template)[0]
    l_flat = {tuple(str(k) for k in kp): np.asarray(v) for kp, v in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}
    if len(l_flat) != len(t_flat):
        raise ValueError(
            f"{path}: {len(l_flat)} arrays, expected {len(t_flat)} — wrong "
            f"ViT size? (config {cfg.n_layers} layers, d={cfg.d_model})")
    for kp, leaf in t_flat:
        key = tuple(str(k) for k in kp)
        if key not in l_flat:
            raise ValueError(f"{path}: missing parameter {key}")
        if tuple(l_flat[key].shape) != tuple(leaf.shape):
            raise ValueError(
                f"{path}: shape mismatch at {key}: "
                f"{l_flat[key].shape} vs expected {leaf.shape}")
    return jax.tree.map(jnp.asarray, loaded)
