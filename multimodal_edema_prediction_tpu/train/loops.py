"""Training loops: epoch iteration, streaming eval, early stopping, best-ckpt.

The reference's trainer machinery (``training_duett/trainer.py``) rebuilt
around jitted steps. Loops are host-side orchestration only — all math is in
:mod:`.engine`.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StudentConfig, TrainConfig
from ..data.pipeline import AnchorDataset
from ..models.student import StudentModel
from ..ops import metrics as M
from ..parallel import mesh as meshlib
from ..utils.logging import Logger
from . import engine
from .checkpoint import BestKTracker, load_checkpoint
from .optim import make_optimizer
from .state import TrainState, param_count


class EarlyStopper:
    """Patience-based early stop on a monotone-improving metric
    (trainer.py:707-716). Under GSPMD there is a single logical process, so
    the rank-broadcast of the stop flag is unnecessary by construction."""

    def __init__(self, patience: int, mode: str = "max"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, metric: float) -> bool:
        """Returns True if this metric is an improvement. NaN never improves
        (a NaN first epoch must not become the 'best' checkpoint)."""
        if metric != metric:   # NaN
            self.bad_epochs += 1
            return False
        improved = (self.best is None
                    or (metric > self.best if self.mode == "max"
                        else metric < self.best))
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return improved

    @property
    def should_stop(self) -> bool:
        return self.patience > 0 and self.bad_epochs >= self.patience


def evaluate_binary_split(eval_step, params, batch_stats, dataset,
                          split: str, batch_size: int, mesh,
                          limit: int = 0) -> Dict[str, float]:
    """Streaming logit collection → AUROC/AUPRC (evaluator.py:10-37).

    Multi-process: logits come back globally gathered; labels/valid use the
    global host copies the dataset keeps under ``batch["_global"]``."""
    from ..parallel.multihost import fetch_global
    logits_all, y_all = [], []
    for batch in dataset.iter_batches(split, batch_size, shuffle=False,
                                      limit=limit):
        src = batch.get("_global", batch)
        keep = np.asarray(src["valid"]) > 0 if "valid" in src else None
        y = np.asarray(src["y"])
        batch.pop("valid", None)
        dev_batch = meshlib.shard_batch(batch, mesh)
        logits = fetch_global(eval_step(params, batch_stats, dataset.grid,
                                        dataset.static, dev_batch))
        if keep is None:
            keep = np.ones(len(logits), bool)
        logits_all.append(logits[keep])
        y_all.append(y[keep])
    return M.binary_metrics(np.concatenate(y_all), np.concatenate(logits_all))


@dataclass
class TrainResult:
    best_metric: float
    best_path: str
    history: List[dict]
    test_metrics: Dict[str, float]
    steps_per_sec: float = 0.0
    samples_per_sec: float = 0.0


def train_supervised_ts(dataset: AnchorDataset, model_cfg: StudentConfig,
                        cfg: TrainConfig, ckpt_dir: str,
                        mesh=None, logger: Optional[Logger] = None
                        ) -> TrainResult:
    """Minimum end-to-end slice: TS-only supervised training of the
    student architecture with BCE on the main label."""
    log = logger or Logger("supervised_ts")
    mesh = mesh or meshlib.create_mesh(cfg.n_data, cfg.n_model)
    dtype = jnp.dtype(cfg.dtype)
    model = StudentModel(model_cfg)
    T = dataset.n_timesteps

    # init
    rng = jax.random.key(cfg.seed)
    init_batch = next(dataset.iter_batches("train", cfg.batch_size,
                                           shuffle=False))
    init_batch.pop("valid")
    x_in = jnp.zeros((cfg.batch_size, T,
                      2 * model_cfg.duett.n_variables + 1), dtype)
    x_static = jnp.zeros((cfg.batch_size, model_cfg.duett.d_static), dtype)
    times = jnp.asarray(init_batch["bin_ends"], dtype)
    variables = jax.jit(model.init)({"params": rng}, x_in, x_static, times)
    params, batch_stats = variables["params"], variables["batch_stats"]
    log.info(f"params: {param_count(params):,}")

    steps_per_epoch = dataset.split_size("train") // cfg.batch_size
    if cfg.limit_batches > 0:
        steps_per_epoch = min(steps_per_epoch, cfg.limit_batches)
    total_steps = steps_per_epoch * cfg.epochs
    tx = make_optimizer(cfg.optim, total_steps)
    state = TrainState.create(params, batch_stats, tx)

    with mesh:
        train_step = engine.make_supervised_ts_step(
            model, model_cfg.duett, T, dtype)
        scan_k = max(1, int(cfg.steps_per_call))
        scan_step = engine.scan_steps(engine.make_supervised_ts_step(
            model, model_cfg.duett, T, dtype, jit=False)) \
            if scan_k > 1 else None
        eval_step = engine.make_supervised_ts_eval(model, T, dtype)

        grid = jax.device_put(dataset.grid, meshlib.replicated(mesh))
        static = jax.device_put(dataset.static, meshlib.replicated(mesh))
        dataset.grid, dataset.static = grid, static

        stopper = EarlyStopper(cfg.patience, mode="max")
        tracker = BestKTracker(ckpt_dir, k=1, mode="max", prefix="best")
        history = []
        step_rng = jax.random.key(cfg.seed + 1)
        t_start, n_steps_timed = time.time(), 0

        for epoch in range(cfg.epochs):
            losses = []

            def _host_batches():
                for b in dataset.iter_batches(
                        "train", cfg.batch_size, shuffle=True,
                        seed=cfg.seed + epoch, limit=cfg.limit_batches):
                    b.pop("valid")
                    yield b

            batch_iter = _host_batches()
            if scan_step is not None:
                from ..data.prefetch import stack_host_batches
                batch_iter = stack_host_batches(batch_iter, scan_k)
            for batch in batch_iter:
                if scan_step is not None:
                    dev_batch = meshlib.shard_batch(batch, mesh,
                                                    stacked=True)
                    kk = int(next(iter(dev_batch.values())).shape[0])
                    step_rng, subs = engine.split_chain(step_rng, kk)
                    state, out = scan_step(state, grid, static, dev_batch,
                                           subs)
                    losses.append(out["per_step"]["loss"])   # (kk,)
                    n_steps_timed += kk
                    continue
                dev_batch = meshlib.shard_batch(batch, mesh)
                step_rng, sub = jax.random.split(step_rng)
                state, out = train_step(state, grid, static, dev_batch, sub)
                losses.append(out["loss"])
                n_steps_timed += 1
            train_loss = float(jnp.concatenate(
                [jnp.atleast_1d(x) for x in losses]).mean())

            val = evaluate_binary_split(eval_step, state.params,
                                        state.batch_stats, dataset, "val",
                                        cfg.batch_size, mesh)
            improved = stopper.update(val["auroc"])
            if improved:
                tracker.offer(val["auroc"], state.params, state.batch_stats,
                              int(state.step),
                              config={"model": model_cfg.to_dict(),
                                      "train": cfg.to_dict()})
            history.append({"epoch": epoch, "train_loss": train_loss, **val})
            log.info(f"epoch {epoch:3d}  loss={train_loss:.4f}  "
                     f"val_auroc={val['auroc']:.4f}  "
                     f"val_auprc={val['auprc']:.4f}"
                     f"{'  *' if improved else ''}")
            if stopper.should_stop:
                log.info(f"early stop at epoch {epoch}")
                break

        elapsed = time.time() - t_start
        # reload best and test (trainer.py:718-764)
        best_metric, best_path = tracker.best
        ckpt = load_checkpoint(best_path)
        test = evaluate_binary_split(eval_step, ckpt["params"],
                                     ckpt["batch_stats"], dataset, "test",
                                     cfg.batch_size, mesh)
        log.info(f"test: auroc={test['auroc']:.4f} auprc={test['auprc']:.4f}")

    sps = n_steps_timed / max(elapsed, 1e-9)
    return TrainResult(best_metric=best_metric, best_path=best_path,
                       history=history, test_metrics=test,
                       steps_per_sec=sps,
                       samples_per_sec=sps * cfg.batch_size)
