"""Legacy LUPI (learning-under-privileged-information) distillation losses.

Reference: ``loss/losses.py`` — dead code there (its ``utils`` dependency is
gitignored) but it defines the repo's privileged→deploy distillation
capabilities, reimplemented here as jit-able functions:

    masked soft cross-entropy (subtype head, :13-41)
    NaN-masked soft-label BCE (:57-75)
    feature distillation  (cosine + smooth-L1 on fused features)
    readout distillation  (cosine + smooth-L1 on readout features)
    temperature-2 logit distillation (binary KD)
    covariance regularization (off-diagonal penalty on pooled features)

``dual_stream_distillation_loss`` composes them with the same weight
structure as the reference's total (:171-180).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_soft_cross_entropy(logits, target_probs, mask):
    """-Σ p·log_softmax(logits) over masked rows; (loss, valid_count)."""
    logits = logits.astype(jnp.float32)
    p = target_probs.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -(p * logp).sum(axis=-1)
    count = m.sum()
    loss = (ce * m).sum() / jnp.maximum(count, 1.0)
    return jnp.where(count > 0, loss, 0.0 * logits.sum()), count


def nan_masked_bce(logits, soft_labels):
    """BCE over entries whose (soft) label is not NaN; (loss, count)."""
    y = soft_labels.astype(jnp.float32)
    valid = ~jnp.isnan(y)
    y0 = jnp.where(valid, y, 0.0)
    x = logits.astype(jnp.float32)
    per = jnp.maximum(x, 0) - x * y0 + jnp.log1p(jnp.exp(-jnp.abs(x)))
    count = valid.sum()
    loss = (per * valid).sum() / jnp.maximum(count, 1)
    return jnp.where(count > 0, loss, 0.0 * x.sum()), count


def _cos_l1_match(student_feat, teacher_feat):
    """direction (1 − cosine) + magnitude (smooth-L1) feature matching."""
    t = jax.lax.stop_gradient(teacher_feat.astype(jnp.float32))
    s = student_feat.astype(jnp.float32)
    cos = (s * t).sum(-1) / (jnp.linalg.norm(s, axis=-1)
                             * jnp.linalg.norm(t, axis=-1) + 1e-8)
    cos_loss = (1.0 - cos).mean()
    diff = jnp.abs(s - t)
    l1 = jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5).mean()
    return cos_loss + l1, cos_loss, l1


def covariance_regularization(features):
    """Off-diagonal covariance penalty on pooled features [B, D]."""
    f = features.astype(jnp.float32)
    f = f - f.mean(axis=0, keepdims=True)
    n = f.shape[0]
    cov = (f.T @ f) / jnp.maximum(n - 1, 1)
    off = cov - jnp.diag(jnp.diag(cov))
    return (off ** 2).sum() / f.shape[1]


def binary_logit_kd(logit_priv, logit_deploy, valid, T: float = 2.0):
    """T²·BCE(σ(priv/T) targets, deploy/T logits) over valid rows."""
    lp = jax.lax.stop_gradient(logit_priv.astype(jnp.float32))
    ld = logit_deploy.astype(jnp.float32)
    target = jax.nn.sigmoid(lp / T)
    x = ld / T
    per = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    count = valid.sum()
    return jnp.where(count > 0,
                     (T ** 2) * (per * valid).sum() / jnp.maximum(count, 1),
                     0.0)


def dual_stream_distillation_loss(
        logit_priv, logit_deploy, soft_labels,
        fused_priv=None, fused_deploy=None,
        readout_priv=None, readout_deploy=None,
        subtype_logits_priv=None, subtype_logits_deploy=None,
        subtype_target_probs=None, subtype_mask=None,
        fd_weight: float = 1.0, rd_weight: float = 1.0,
        kd_weight: float = 1.0, cov_weight: float = 0.0,
        subtype_weight: float = 0.0, kd_T: float = 2.0) -> dict:
    """Privileged (priv) → deployable (deploy) dual-stream loss
    (loss/losses.py:44-191)."""
    bce_priv, n_valid = nan_masked_bce(logit_priv, soft_labels)
    bce_deploy, _ = nan_masked_bce(logit_deploy, soft_labels)
    valid = (~jnp.isnan(soft_labels.astype(jnp.float32))).astype(jnp.float32)

    out = {"bce_priv": bce_priv, "bce_deploy": bce_deploy,
           "n_valid": n_valid}
    total = bce_priv + bce_deploy

    if fused_priv is not None and fused_deploy is not None:
        fd, fd_cos, fd_l1 = _cos_l1_match(fused_deploy, fused_priv)
        out.update({"fd": fd, "fd_cos": fd_cos, "fd_l1": fd_l1})
        total = total + fd_weight * fd
    if readout_priv is not None and readout_deploy is not None:
        rd, rd_cos, rd_l1 = _cos_l1_match(readout_deploy, readout_priv)
        out.update({"rd": rd, "rd_cos": rd_cos, "rd_l1": rd_l1})
        total = total + rd_weight * rd
    kd = binary_logit_kd(logit_priv, logit_deploy, valid, kd_T)
    out["kd"] = kd
    total = total + kd_weight * kd
    if cov_weight > 0 and fused_deploy is not None:
        pooled = fused_deploy.mean(axis=1) if fused_deploy.ndim == 3 \
            else fused_deploy
        cov = covariance_regularization(pooled)
        out["cov"] = cov
        total = total + cov_weight * cov
    if subtype_weight > 0 and subtype_target_probs is not None:
        st = 0.0
        for logits in (subtype_logits_priv, subtype_logits_deploy):
            if logits is not None:
                l, _ = masked_soft_cross_entropy(logits,
                                                 subtype_target_probs,
                                                 subtype_mask)
                st = st + l
        out["subtype"] = st
        total = total + subtype_weight * st
    out["total"] = total
    return out
