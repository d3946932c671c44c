"""Supervised finetune of an SSL-pretrained DuETT backbone.

Reference: ``duett/train_duett_finetune.py`` — per seed: load SSL encoder
(head-surgery tolerant restore), train the supervised classifier on the
stay-level label (``death_adm``) with pos-frac class weighting, track the
top-k checkpoints by val AUPRC, evaluate the **averaged** top-k weights on
test (:56-62, :204-207), and report mean±std across seeds (:160-224).
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DuettConfig, TrainConfig
from ..data.pipeline import gather_windows
from ..data.sliding import StayLabelDataset
from ..models.duett import DuettClassifier, feats_to_input
from ..ops import metrics as M
from ..ops.losses import bce_with_logits
from ..parallel import mesh as meshlib
from ..utils.logging import Logger
from .checkpoint import BestKTracker, average_params, load_checkpoint
from .loops import EarlyStopper
from .optim import simple_adamw
from .state import TrainState


def _make_steps(model, n_timesteps, dtype, pos_frac: Optional[float]):
    if pos_frac is not None:
        pos_w = 1.0 / (2.0 * pos_frac)
        neg_w = 1.0 / (2.0 * (1.0 - pos_frac))
    else:
        pos_w = neg_w = None

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, grid, static, batch, rng):
        x_ts = gather_windows(grid, batch["stay_rows"], batch["slot_idx"],
                              n_timesteps)
        x_static = static[batch["stay_rows"]].astype(dtype)
        x_in, x_static = feats_to_input(None, x_ts.astype(dtype), x_static)
        times = batch["bin_ends"].astype(dtype)

        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_in, x_static, times, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            y = batch["y"]
            w = None
            if pos_w is not None:
                w = jnp.where(y > 0, pos_w, neg_w)
            return bce_with_logits(logits, y, weight=w), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, mut["batch_stats"]), loss

    @jax.jit
    def eval_step(params, batch_stats, grid, static, batch):
        x_ts = gather_windows(grid, batch["stay_rows"], batch["slot_idx"],
                              n_timesteps)
        x_static = static[batch["stay_rows"]].astype(dtype)
        x_in, x_static = feats_to_input(None, x_ts.astype(dtype), x_static)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x_in, x_static, batch["bin_ends"].astype(dtype),
                             train=False)
        return logits.astype(jnp.float32)

    return train_step, eval_step


def _evaluate(eval_step, params, batch_stats, ds, split, batch_size,
              grid, static):
    # iter_batches drops the incomplete remainder (fixed shapes); a split
    # smaller than the batch would otherwise yield ZERO batches and a NaN
    # metric that silently disables early stopping / best-ckpt selection
    # (the bug class the SSL loop hit) — clamp to the split size instead
    # (one extra compile at the clamped shape, eval-only).
    n = ds.split_size(split)
    if n == 0:
        raise ValueError(f"{split} split is empty — cannot evaluate")
    logits, ys = [], []
    for batch in ds.iter_batches(split, min(batch_size, n), shuffle=False):
        logits.append(np.asarray(eval_step(params, batch_stats, grid,
                                           static, batch)))
        ys.append(batch["y"])
    return M.binary_metrics(np.concatenate(ys), np.concatenate(logits))


def finetune_duett(ds: StayLabelDataset, duett_cfg: DuettConfig,
                   cfg: TrainConfig, ckpt_dir: str,
                   ssl_ckpt: Optional[str] = None,
                   seeds: Sequence[int] = (0, 1, 2), top_k: int = 5,
                   logger: Optional[Logger] = None) -> dict:
    log = logger or Logger("duett_finetune")
    dtype = jnp.dtype(cfg.dtype)
    grid, static = ds.grid, ds.static
    per_seed = []

    for seed in seeds:
        model = DuettClassifier(duett_cfg, d_target=1,
                                fusion_method="rep_token")
        x_in = jnp.zeros((2, ds.n_timesteps,
                          2 * duett_cfg.n_variables + 1), dtype)
        variables = jax.jit(model.init)(
            {"params": jax.random.key(seed)}, x_in,
            jnp.zeros((2, duett_cfg.d_static), dtype),
            jnp.zeros((2, ds.n_timesteps), dtype))
        params, batch_stats = variables["params"], variables["batch_stats"]
        if ssl_ckpt:
            from .ssl_loop import transplant_encoder
            wrapped = {"encoder": params["encoder"]}
            new, enc_stats, changed = transplant_encoder(ssl_ckpt, wrapped,
                                                         dest_key="encoder")
            params = dict(params)
            params["encoder"] = new["encoder"]
            if enc_stats is not None:
                batch_stats = dict(batch_stats)
                batch_stats["encoder"] = enc_stats

        steps_per_epoch = max(ds.split_size("train") // cfg.batch_size, 1)
        tx = simple_adamw(cfg.optim.lr, cfg.optim.weight_decay,
                          warmup_steps=cfg.optim.warmup_steps,
                          total_steps=steps_per_epoch * cfg.epochs,
                          min_lr_ratio=cfg.optim.min_lr_ratio)
        state = TrainState.create(params, batch_stats, tx)
        train_step, eval_step = _make_steps(model, ds.n_timesteps, dtype,
                                            ds.pos_frac("train") or None)

        tracker = BestKTracker(os.path.join(ckpt_dir, f"seed{seed}"),
                               k=top_k, mode="max", prefix="ft")
        stopper = EarlyStopper(cfg.patience, mode="max")
        rng = jax.random.key(seed + 100)
        for epoch in range(cfg.epochs):
            for batch in ds.iter_batches("train", cfg.batch_size, True,
                                         seed=seed * 1000 + epoch,
                                         limit=cfg.limit_batches):
                dev = jax.tree.map(jnp.asarray, batch)
                rng, sub = jax.random.split(rng)
                state, loss = train_step(state, grid, static, dev, sub)
            val = _evaluate(eval_step, state.params, state.batch_stats, ds,
                            "val", cfg.batch_size, grid, static)
            improved = stopper.update(val["auprc"])
            tracker.offer(val["auprc"], state.params, state.batch_stats,
                          int(state.step))
            if stopper.should_stop:
                break

        # top-k weight averaging at test time
        avg = average_params([load_checkpoint(p)["params"]
                              for _, p in tracker.entries])
        avg = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), avg)
        best_stats = load_checkpoint(tracker.entries[0][1])["batch_stats"]
        test_avg = _evaluate(eval_step, avg, best_stats, ds, "test",
                             cfg.batch_size, grid, static)
        test_best = _evaluate(eval_step,
                              load_checkpoint(tracker.entries[0][1])["params"],
                              best_stats, ds, "test", cfg.batch_size, grid,
                              static)
        log.info(f"seed {seed}: val_auprc={stopper.best:.4f}  "
                 f"test(best)={test_best['auprc']:.4f}  "
                 f"test(avg{len(tracker.entries)})={test_avg['auprc']:.4f}")
        per_seed.append({"seed": seed, "val_auprc": stopper.best,
                         "test_best": test_best, "test_avg": test_avg})

    aurocs = [r["test_avg"]["auroc"] for r in per_seed]
    auprcs = [r["test_avg"]["auprc"] for r in per_seed]
    summary = {
        "per_seed": per_seed,
        "test_auroc_mean": float(np.mean(aurocs)),
        "test_auroc_std": float(np.std(aurocs)),
        "test_auprc_mean": float(np.mean(auprcs)),
        "test_auprc_std": float(np.std(auprcs)),
    }
    log.info(f"summary: AUROC {summary['test_auroc_mean']:.4f}"
             f"±{summary['test_auroc_std']:.4f}  "
             f"AUPRC {summary['test_auprc_mean']:.4f}"
             f"±{summary['test_auprc_std']:.4f}")
    return summary
