"""Teacher: DuETT(TS) + RAD-DINO(CXR) + pathology-query perceiver fusion.

Reference: ``models/main_architecture_duett.py:993-1197``. Two runnable modes:

- ``dual_patch`` (default): ViT patch tokens → img_proj → perceiver
  cross-attention (reference :1097-1129).
- ``dual``: ViT CLS → frozen pretrained CXR linear head → per-label logits
  as the image branch (reference :1047-1071, :1131-1150).

Freezing is expressed functionally: frozen submodules run with
``train=False`` (dropout off, BN in inference mode — the reference's
``_set_train_with_frozen_eval``, ``training_duett/engine.py:7-20``) and their
parameters get zero optimizer updates (``train/optim.py`` frozen group).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TeacherConfig
from .duett import DuettEncoder
from .layers import gelu_exact
from .perceiver import (DualPathologyPerceiver, EventPatchPerceiver,
                        PathologyPerceiver, PatchDualPathologyPerceiver,
                        TemporalPerceiver, adaptive_avg_pool_tokens)
from .vit import DinoViT


class PretrainedCXRHead(nn.Module):
    """Frozen linear head trained on the 240k-image CXR catalog
    (cxr_linear_training.ipynb cells 6-13); label re-indexing buffer
    ``keep_idx`` maps head outputs onto pathology_labels order
    (reference :1047-1069)."""
    n_pretrained: int
    d_img: int = 768

    @nn.compact
    def __call__(self, cls: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.n_pretrained, dtype=cls.dtype,
                        param_dtype=jnp.float32, name="linear")(cls)


class TeacherModel(nn.Module):
    cfg: TeacherConfig
    n_pretrained_labels: int = 7     # dual mode only
    # static label re-indexing for 'dual' mode (head outputs → pathology
    # order); can also be passed per-call as `keep_idx`.
    static_keep_idx: Optional[tuple] = None

    @nn.compact
    def __call__(self, x_in: jnp.ndarray, x_static: jnp.ndarray,
                 times: jnp.ndarray, pixel_values: Optional[jnp.ndarray],
                 train: bool = False, return_attn: bool = False,
                 keep_idx: Optional[jnp.ndarray] = None,
                 cxr_feats: Optional[tuple] = None,
                 token_eps: Optional[tuple] = None) -> dict:
        if keep_idx is None and self.static_keep_idx is not None:
            keep_idx = jnp.asarray(self.static_keep_idx, jnp.int32)
        cfg = self.cfg
        duett_train = train and not cfg.freeze_duett
        cxr_train = train and not cfg.freeze_cxr

        ts_tokens, psi_grid = DuettEncoder(cfg.duett, name="duett")(
            x_in, x_static, times, train=duett_train)
        if cfg.freeze_duett:
            ts_tokens = jax.lax.stop_gradient(ts_tokens)
            psi_grid = jax.lax.stop_gradient(psi_grid)

        if cxr_feats is not None:
            # encode-once tier (data/features.py): the frozen ViT's (CLS,
            # patch) tokens were cached per image; skip the encoder entirely.
            # Only legal when the branch cannot train — the cache holds
            # constants, so a trainable CXR branch would silently never
            # update (eval-mode forwards, e.g. the KD teacher, are fine
            # regardless of the freeze flag).
            assert cfg.freeze_cxr or not train, \
                "cxr_feats in a train step requires freeze_cxr=True"
            cls, patches = cxr_feats
        else:
            cls, patches = DinoViT(cfg.vit, name="cxr")(
                pixel_values, train=cxr_train)
        if cfg.freeze_cxr:
            cls = jax.lax.stop_gradient(cls)
            patches = jax.lax.stop_gradient(patches)

        if token_eps is not None and cfg.perceiver_type not in (
                "dual_patch", "dual_patch_event"):
            raise ValueError("token_eps (fusion-token sensitivity hook) is "
                             "only defined for the patch perceiver modes")
        if cfg.perceiver_type == "dual_patch_event":
            # Event-attention variant (the reference's designed-but-
            # uncommitted newer API, models/main_architecture_duett.py:
            # 886-893): the temporal branch reads the DYNAMIC event grid —
            # psi minus the [REP] row and the static column (the commented
            # ``dynamic_grid = ts_grid[:, :-1, :-1, :]``) — one KV token per
            # clinical variable's full 24 h trajectory.
            patches_proj = nn.Dense(cfg.perceiver.d_latent,
                                    dtype=patches.dtype,
                                    param_dtype=jnp.float32,
                                    name="img_proj")(patches)
            dynamic_grid = psi_grid[:, :-1, :-1, :]    # [B, T, V, d_emb]
            # variables with zero observations in the window are padded-out
            # keys (the trajectory path's key_padding_mask semantics,
            # reference :1389-1391); counts live at x_in[..., V:2V]
            V = cfg.duett.n_variables
            observed = (x_in[:, :, V:2 * V] > 0).any(axis=1)     # [B, V]
            out = EventPatchPerceiver(cfg.perceiver, name="perceiver")(
                dynamic_grid, patches_proj, train=train,
                return_attn=return_attn, ts_padding_mask=~observed,
                token_eps=token_eps)
        elif cfg.perceiver_type == "dual_patch":
            patches_proj = nn.Dense(cfg.perceiver.d_latent,
                                    dtype=patches.dtype,
                                    param_dtype=jnp.float32,
                                    name="img_proj")(patches)
            out = PatchDualPathologyPerceiver(
                cfg.perceiver, cfg.duett.d_representation, name="perceiver")(
                ts_tokens, patches_proj, train=train, return_attn=return_attn,
                token_eps=token_eps)
        elif cfg.perceiver_type == "single":
            # 37×37 patches → 7×7 adaptive pool FIRST (reference pools under
            # cxr_return_patches before the pathology branch, :1158-1167),
            # then project the 49 pooled tokens
            img_tokens = adaptive_avg_pool_tokens(patches, 7)
            patches_proj = nn.Dense(cfg.perceiver.d_latent,
                                    dtype=img_tokens.dtype,
                                    param_dtype=jnp.float32,
                                    name="img_proj")(img_tokens)
            out = PathologyPerceiver(
                cfg.perceiver, cfg.duett.d_representation, name="perceiver")(
                ts_tokens, patches_proj, train=train, return_attn=return_attn)
            result = {
                "main_logit": out["stage4_logits"][:, 0],
                "stage2_logits": out["stage2_logits"],
                "stage4_logits": out["stage4_logits"],
            }
            if return_attn:
                for k in ("stage2_tokens", "stage4_tokens", "img_attn",
                          "ts_attn"):
                    result[k] = out[k]
            return result
        elif cfg.perceiver_type == "legacy":
            # 37×37 patches → 7×7 adaptive pool, CLS prepended (:1152-1181)
            img_tokens = adaptive_avg_pool_tokens(patches, 7)
            img_kv = jnp.concatenate([cls[:, None, :], img_tokens], axis=1)
            img_kv_proj = nn.Dense(cfg.perceiver.d_latent,
                                   dtype=img_kv.dtype,
                                   param_dtype=jnp.float32,
                                   name="img_proj")(img_kv)
            fused = TemporalPerceiver(
                cfg.perceiver, cfg.duett.d_representation,
                name="perceiver")(ts_tokens, img_kv_proj, train=train)
            h = nn.Dense(128, dtype=fused.dtype, param_dtype=jnp.float32,
                         name="head_in")(fused)
            h = gelu_exact(h)
            h = nn.Dropout(cfg.perceiver.head_dropout,
                           deterministic=not train)(h)
            main = nn.Dense(1, dtype=fused.dtype, param_dtype=jnp.float32,
                            name="head_out")(h).squeeze(-1)
            result = {"main_logit": main.astype(jnp.float32)}
            # auxiliary CXR-only head on the projected CLS (:1187-1190)
            cxr_summary = img_kv_proj[:, 0]
            a = nn.Dense(128, dtype=fused.dtype, param_dtype=jnp.float32,
                         name="aux_in")(cxr_summary)
            a = gelu_exact(a)
            a = nn.Dropout(cfg.perceiver.head_dropout,
                           deterministic=not train)(a)
            result["aux_logit"] = nn.Dense(
                1, dtype=fused.dtype, param_dtype=jnp.float32,
                name="aux_out")(a).squeeze(-1).astype(jnp.float32)
            return result
        elif cfg.perceiver_type == "dual":
            head_logits = PretrainedCXRHead(
                self.n_pretrained_labels, cfg.d_img,
                name="pretrained_cxr_head")(cls)
            head_logits = jax.lax.stop_gradient(head_logits)
            if keep_idx is not None:
                head_logits = head_logits[:, keep_idx]
            out = DualPathologyPerceiver(
                cfg.perceiver, cfg.duett.d_representation, name="perceiver")(
                ts_tokens, head_logits, train=train, return_attn=return_attn)
        else:
            raise ValueError(f"unknown perceiver_type "
                             f"{cfg.perceiver_type!r}")

        result = {
            "main_logit": out["fusion_logits"][:, 0],
            "img_logits": out["img_logits"],
            "ts_logits": out["ts_logits"],
            "fusion_logits": out["fusion_logits"],
            "ts_correction": out["ts_correction"],
            "scaled_correction": out["scaled_correction"],
        }
        if return_attn:
            for k in ("img_tokens", "ts_tokens", "fusion_tokens",
                      "img_attn", "ts_attn", "event_attn"):
                if k in out:
                    result[k] = out[k]
        return result
