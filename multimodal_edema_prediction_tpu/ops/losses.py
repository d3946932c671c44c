"""Loss functions — vectorized, jit-friendly, numerically stable.

Re-implements the reference loss layer (``loss/losses_duett.py``) without the
per-label python loops: the masked per-label BCE reduces over the batch axis
with a single fused elementwise + reduction pass (XLA fuses it into the
backward matmuls of the heads).

All functions take/return f32 scalars or [K] vectors; inputs may be bf16.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits, y, pos_weight: Optional[jnp.ndarray] = None,
                    weight: Optional[jnp.ndarray] = None, reduce: bool = True):
    """Numerically-stable sigmoid BCE matching torch BCEWithLogitsLoss.

    loss = pos_weight*y*softplus(-x) + (1-y)*softplus(x), optionally
    elementwise-weighted.
    """
    x = logits.astype(jnp.float32)
    y = y.astype(jnp.float32)
    pos = jax.nn.softplus(-x)
    neg = jax.nn.softplus(x)
    if pos_weight is not None:
        loss = pos_weight * y * pos + (1.0 - y) * neg
    else:
        loss = y * pos + (1.0 - y) * neg
    if weight is not None:
        loss = loss * weight
    return loss.mean() if reduce else loss


def masked_per_label_bce(logits, y, mask,
                         pos_weight: Optional[jnp.ndarray] = None,
                         eps: float = 1e-6) -> jnp.ndarray:
    """Per-label masked-mean BCE over [B, K] → [K].

    per[k] = sum_b BCE(logits[b,k], y[b,k]) * mask[b,k] / (sum_b mask[b,k] + eps)

    Reference: loss/losses_duett.py:152-164 (loop over K → one vector op).
    """
    l = bce_with_logits(logits, y, pos_weight=pos_weight, reduce=False)
    m = mask.astype(jnp.float32)
    return (l * m).sum(axis=0) / (m.sum(axis=0) + eps)


def dual_pathology_loss(img_logits, ts_logits, fusion_logits, y_multi,
                        y_multi_mask, label_weights,
                        pos_weight: Optional[jnp.ndarray] = None,
                        alpha_img: float = 0.5, alpha_ts: float = 0.5,
                        alpha_fus: float = 1.0) -> dict:
    """3-branch masked multi-label BCE (loss/losses_duett.py:131-194)."""
    lw = label_weights.astype(jnp.float32)
    img_per = masked_per_label_bce(img_logits, y_multi, y_multi_mask, pos_weight)
    ts_per = masked_per_label_bce(ts_logits, y_multi, y_multi_mask, pos_weight)
    fus_per = masked_per_label_bce(fusion_logits, y_multi, y_multi_mask, pos_weight)
    img_total = (lw * img_per).sum()
    ts_total = (lw * ts_per).sum()
    fus_total = (lw * fus_per).sum()
    total = alpha_img * img_total + alpha_ts * ts_total + alpha_fus * fus_total
    return {
        "total": total,
        "img_total": img_total, "ts_total": ts_total, "fus_total": fus_total,
        "img_per": img_per, "ts_per": ts_per, "fus_per": fus_per,
    }


def pathology_multilabel_loss(stage2_logits, stage4_logits, y_multi,
                              y_multi_mask, label_weights,
                              pos_weight: Optional[jnp.ndarray] = None,
                              alpha_stage2: float = 0.5,
                              alpha_stage4: float = 1.0) -> dict:
    """Stage2 (image-only) + stage4 (multimodal) masked multi-label BCE
    (loss/losses_duett.py:63-125)."""
    lw = label_weights.astype(jnp.float32)
    s2_per = masked_per_label_bce(stage2_logits, y_multi, y_multi_mask, pos_weight)
    s4_per = masked_per_label_bce(stage4_logits, y_multi, y_multi_mask, pos_weight)
    s2_total = (lw * s2_per).sum()
    s4_total = (lw * s4_per).sum()
    return {
        "total": alpha_stage2 * s2_total + alpha_stage4 * s4_total,
        "stage2_total": s2_total, "stage4_total": s4_total,
        "stage2_per": s2_per, "stage4_per": s4_per,
    }


def aux_residual_kl(img_logits, scaled_correction, y_multi, y_multi_mask,
                    label_smoothing: float = 0.05) -> jnp.ndarray:
    """KL(Bernoulli(y_smooth) || Bernoulli(σ(stop_grad(img) + correction))).

    Gradient flows only through ``scaled_correction``
    (reference training_duett/engine.py:149-165).
    """
    y = y_multi.astype(jnp.float32)
    eps = label_smoothing
    y_s = y * (1.0 - eps) + (1.0 - y) * eps
    anchor = jax.lax.stop_gradient(img_logits.astype(jnp.float32))
    p = jax.nn.sigmoid(anchor + scaled_correction.astype(jnp.float32))
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    kl = y_s * (jnp.log(y_s) - jnp.log(p)) + \
        (1.0 - y_s) * (jnp.log(1.0 - y_s) - jnp.log(1.0 - p))
    m = y_multi_mask.astype(jnp.float32)
    return (kl * m).sum() / jnp.maximum(m.sum(), 1.0)


# =============================================================================
# Knowledge distillation (loss/losses_duett.py:8-57)
# =============================================================================
def binary_kl_kd(z_s, z_t, T: float = 4.0, eps: float = 1e-7) -> jnp.ndarray:
    """T² · mean KL(σ(z_t/T) || σ(z_s/T)) over binary logits."""
    z_t = jax.lax.stop_gradient(z_t.astype(jnp.float32))
    z_s = z_s.astype(jnp.float32)
    p_t = jnp.clip(jax.nn.sigmoid(z_t / T), eps, 1 - eps)
    p_s = jnp.clip(jax.nn.sigmoid(z_s / T), eps, 1 - eps)
    kl = p_t * (jnp.log(p_t) - jnp.log(p_s)) + \
        (1 - p_t) * (jnp.log(1 - p_t) - jnp.log(1 - p_s))
    return (T ** 2) * kl.mean()


# KD-loss registry keyed by the --kd_name flag (the reference's
# build_kd_loss, loss/losses_duett.py:28-36 — 'vanilla_kl' is the only
# entry there too; unknown names fail fast with the available list).
KD_LOSSES = {"vanilla_kl": binary_kl_kd}


def resolve_kd_loss(name: str):
    if name not in KD_LOSSES:
        raise ValueError(f"unknown KD loss: {name!r}. "
                         f"available: {list(KD_LOSSES)}")
    return KD_LOSSES[name]


def student_kd_loss(z_s, z_t, y, kd_T: float = 4.0, kd_alpha: float = 0.5,
                    pos_weight: Optional[float] = None,
                    kd_name: str = "vanilla_kl") -> dict:
    """total = α·BCE(z_s, y) + (1-α)·KD(z_s, z_t)."""
    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)
    loss_bce = bce_with_logits(z_s, y, pos_weight=pw)
    loss_kd = resolve_kd_loss(kd_name)(z_s, z_t, T=kd_T)
    return {
        "total": kd_alpha * loss_bce + (1.0 - kd_alpha) * loss_kd,
        "bce": loss_bce, "kd": loss_kd,
    }


# =============================================================================
# DuETT SSL pretraining losses (duett/duett.py:337-358)
# =============================================================================
def ssl_pretrain_loss(y_hat_value, y_hat_presence, y_hat_events,
                      y_hat_events_presence, y_value, y_presence_mask,
                      y_events, y_events_mask,
                      pretrain_value: bool = True,
                      pretrain_presence: bool = True,
                      presence_weight: float = 0.2,
                      predict_events: bool = True) -> dict:
    """Masked value MSE + presence BCE + event value MSE + event presence BCE.

    Matches the reference exactly, including its quirk of averaging the
    masked MSE over *all* elements (``F.mse_loss(y_hat*mask, y*mask)``),
    not just the observed ones.

    Shapes: y_hat_value/presence [B, S, V] (S = masked steps), y_value [B,S,V],
    y_presence_mask [B,S,V], y_hat_events [B,T], y_events [B,T], mask [B,T].
    """
    out = {}
    total = 0.0
    mask = y_presence_mask.astype(jnp.float32)
    if pretrain_value:
        diff = (y_hat_value.astype(jnp.float32) * mask
                - y_value.astype(jnp.float32) * mask)
        # mean over [B,V] per masked step, then mean over steps — identical to
        # the reference's sum-over-steps / n_steps at duett.py:339-343.
        value_loss = jnp.mean(diff ** 2, axis=(0, 2)).mean()
        out["value"] = value_loss
        total = total + value_loss
    if pretrain_presence:
        pres = bce_with_logits(y_hat_presence, mask, reduce=False)
        presence_loss = presence_weight * jnp.mean(pres, axis=(0, 2)).mean()
        out["presence"] = presence_loss
        total = total + presence_loss
    if predict_events:
        em = y_events_mask.astype(jnp.float32)
        ediff = (y_hat_events.astype(jnp.float32) * em
                 - y_events.astype(jnp.float32) * em)
        if pretrain_value:
            ev = jnp.mean(ediff ** 2)
            out["event_value"] = ev
            total = total + ev
        if pretrain_presence:
            ep = presence_weight * bce_with_logits(y_hat_events_presence, em)
            out["event_presence"] = ep
            total = total + ep
    out["total"] = total
    return out
