"""Optimizer: AdamW with differential-LR param groups + warmup/cosine.

Replicates the reference's group rules (``training_duett/trainer.py:77-125``):

    backbone (duett.* / cxr.*)              lr × backbone_lr_mult
    pathology queries (shared_queries)      lr × query_lr_mult
    correction_head + beta                  lr × correction_lr_mult
    everything else                         lr
    frozen modules                          zero updates

implemented with ``optax.multi_transform`` over a path-derived label tree, so
the whole optimizer remains one jitted update.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence, Tuple

import jax
import optax

from ..config import OptimConfig


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  min_lr_ratio: float = 0.01,
                  warmup_start_factor: float = 1e-4) -> optax.Schedule:
    """Linear warmup (start_factor → 1) then cosine to base·min_lr_ratio.

    Matches torch LinearLR + CosineAnnealingLR under SequentialLR
    (trainer.py:119-125).
    """
    warmup = max(int(warmup_steps), 1)
    cosine_steps = max(int(total_steps) - warmup, 1)
    return optax.join_schedules([
        optax.linear_schedule(base_lr * warmup_start_factor, base_lr, warmup),
        optax.cosine_decay_schedule(base_lr, cosine_steps,
                                    alpha=min_lr_ratio),
    ], [warmup])


def default_label_fn(path: str) -> str:
    """Reference group rules (trainer.py:88-102), path is '/'-joined."""
    if path.startswith(("duett/", "cxr/", "vit/")):
        return "backbone"
    if "correction_head" in path or path.endswith("/beta") or path == "beta":
        return "correction"
    if "queries" in path:
        return "queries"
    return "rest"


def make_optimizer(cfg: OptimConfig, total_steps: int,
                   label_fn: Callable[[str], str] = default_label_fn,
                   frozen_prefixes: Sequence[str] = (),
                   params=None) -> optax.GradientTransformation:
    """Build the multi-group AdamW. ``params`` is the template pytree."""
    mults = {"backbone": cfg.backbone_lr_mult, "queries": cfg.query_lr_mult,
             "correction": cfg.correction_lr_mult, "rest": 1.0}

    def group_tx(mult):
        # torch CosineAnnealingLR gets eta_min = args.lr · min_lr_ratio as an
        # ABSOLUTE floor shared by every param group (trainer.py:124), so a
        # mult-scaled group's cosine bottoms out at lr·ratio, not
        # lr·mult·ratio — divide the ratio by the mult to reproduce that.
        alpha = min(cfg.min_lr_ratio / mult, 1.0) if mult > 0 \
            else cfg.min_lr_ratio
        sched = warmup_cosine(cfg.lr * mult, cfg.warmup_steps, total_steps,
                              alpha)
        tx = optax.adamw(sched, b1=cfg.b1, b2=cfg.b2,
                         weight_decay=cfg.weight_decay)
        if cfg.grad_clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
        return tx

    transforms = {k: group_tx(m) for k, m in mults.items()}
    transforms["frozen"] = optax.set_to_zero()

    def labels(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path_entries, _ in flat:
            path = "/".join(str(getattr(k, "key", k)) for k in path_entries)
            if any(path.startswith(p) for p in frozen_prefixes):
                out[path] = "frozen"
            else:
                out[path] = label_fn(path)
        treedef = jax.tree_util.tree_structure(tree)
        return jax.tree_util.tree_unflatten(
            treedef,
            [out["/".join(str(getattr(k, "key", k)) for k in p)]
             for p, _ in flat])

    return optax.multi_transform(transforms, labels)


def simple_adamw(lr: float, weight_decay: float = 1e-2,
                 warmup_steps: int = 0, total_steps: int = 10_000,
                 min_lr_ratio: float = 0.0, grad_clip: float = 0.0
                 ) -> optax.GradientTransformation:
    """Single-group AdamW (SSL pretraining uses invsqrt warmup; the
    supervised paths use warmup+cosine)."""
    sched = warmup_cosine(lr, warmup_steps, total_steps, min_lr_ratio) \
        if warmup_steps > 0 else lr
    tx = optax.adamw(sched, weight_decay=weight_decay)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def invsqrt_warmup(base_lr: float, warmup_steps: int = 2000) -> optax.Schedule:
    """WarmUp callback EXACT equivalent (duett/train_duett_ssl.py:27-50):
    lr(s) = base·s/w for s < w, then base·(w/s)^0.5 (decay == warmup). The
    first update (s == 0) has lr 0 — the reference callback sets it before
    the step, so step 0 only seeds the Adam moments. Closed form:
    base · w^0.5 · min(s^-0.5, s·w^-1.5), with s^-0.5 → inf at s = 0."""
    def sched(step):
        s = step.astype(jax.numpy.float32)
        w = float(warmup_steps)
        return base_lr * (w ** 0.5) * jax.numpy.minimum(
            jax.numpy.where(s > 0, s, 1.0) ** -0.5 * (s > 0),
            s * w ** -1.5)
    return sched
