"""Teacher training loop (dual_patch / dual residual fusion).

Reference: ``training_duett/trainer.py:216-764``. Differences by design:
- one jitted step fuses gather + both encoders + perceiver + loss + update;
- frozen modules are frozen functionally (eval-mode forward + zero updates)
  instead of ``requires_grad`` bookkeeping;
- validation metric = macro fusion AUROC (trainer.py:560-566), early stop on
  patience, best-ckpt reload + test with gap tables;
- LP (correction-only linear probing) is a second invocation with an
  optimizer mask instead of in-place ``requires_grad`` surgery
  (trainer.py:169-210).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TeacherConfig, TrainConfig
from ..data.pipeline import AnchorDataset, synthetic_image_device
from ..models.teacher import TeacherModel
from ..models.vit import normalize_image
from ..parallel import mesh as meshlib
from ..utils.logging import Logger
from . import engine
from .checkpoint import BestKTracker, load_checkpoint, restore_tolerant
from .evaluator import (evaluate_dual_pathology,
                        format_dual_pathology_gap_table)
from .loops import EarlyStopper, TrainResult
from .optim import default_label_fn, make_optimizer
from .state import TrainState, param_count


def make_synthetic_image_source(image_size: int = 518):
    """Device-side procedural image source for tests/benchmarks: builds the
    pixel batch from (image_ids, labels) inside the jitted step."""
    def source(batch):
        img = synthetic_image_device(batch["image_ids"], batch["y_multi"],
                                     size=image_size)
        return normalize_image(img)
    return source


def make_bank_image_source(bank):
    """Gather pixel batches from a device-resident (prefetched) image bank —
    the production shape of the input pipeline: images land in HBM ahead of
    the step; the step only indexes them."""
    n = bank.shape[0]

    def source(batch):
        return bank[batch["image_ids"] % n]
    return source


def teacher_frozen_prefixes(cfg: TeacherConfig) -> tuple:
    frozen = []
    if cfg.freeze_cxr:
        frozen.append("cxr/")
    if cfg.freeze_duett:
        frozen.append("duett/")
    if cfg.perceiver_type == "dual":
        frozen.append("pretrained_cxr_head/")
    return tuple(frozen)


LP_TRAINABLE = ("perceiver/correction_head", "perceiver/beta")


def lp_frozen_label_fn(path: str) -> str:
    """LP mode: only correction_head + beta train (trainer.py:194-202)."""
    if any(path.startswith(p) for p in LP_TRAINABLE):
        return "correction"
    return "frozen"


def init_teacher(model: TeacherModel, cfg: TeacherConfig, batch_size: int,
                 n_timesteps: int, rng) -> dict:
    """Initialize parameters. Param shapes are batch-independent, so init
    runs jitted at batch 2 (eager init would dispatch hundreds of individual
    ops — pathological under remote-compile TPU backends)."""
    del batch_size
    V, D = cfg.duett.n_variables, cfg.duett.d_static
    S = cfg.vit.image_size
    B = 2
    x_in = jnp.zeros((B, n_timesteps, 2 * V + 1))
    x_static = jnp.zeros((B, D))
    times = jnp.zeros((B, n_timesteps))
    pixels = jnp.zeros((B, S, S, 3))
    return jax.jit(model.init)({"params": rng}, x_in, x_static, times,
                               pixels)


def train_teacher(dataset: AnchorDataset, teacher_cfg: TeacherConfig,
                  cfg: TrainConfig, ckpt_dir: str,
                  pathology_labels, mesh=None,
                  image_source: Optional[Callable] = None,
                  logger: Optional[Logger] = None,
                  lp_from: Optional[str] = None,
                  lp_beta_l2: float = 1e-3, lp_corr_l2: float = 1e-2,
                  init_variables: Optional[dict] = None,
                  grad_diag_every: int = 0,
                  grad_diag_batches: int = 4,
                  pretrained_head_ckpt: Optional[str] = None,
                  jpeg_store=None, prefetch_depth: int = 2) -> TrainResult:
    log = logger or Logger("teacher")
    mesh = mesh or meshlib.create_mesh(cfg.n_data, cfg.n_model)
    dtype = jnp.dtype(cfg.dtype)
    static_keep_idx = None
    n_pretrained = len(pathology_labels)
    if teacher_cfg.perceiver_type == "dual" and pretrained_head_ckpt:
        from .checkpoint import load_checkpoint as _load
        head_ck = _load(pretrained_head_ckpt)
        pre_labels = list(head_ck["config"]["label_cols"])
        n_pretrained = len(pre_labels)
        static_keep_idx = tuple(pre_labels.index(l)
                                for l in pathology_labels)
        log.info(f"[dual] pretrained head {pretrained_head_ckpt}: "
                 f"keep_idx={static_keep_idx}")
    model = TeacherModel(teacher_cfg, n_pretrained_labels=n_pretrained,
                         static_keep_idx=static_keep_idx)
    T = dataset.n_timesteps
    K = len(pathology_labels)
    lw = np.ones(K, np.float32)   # uniform per-pathology (trainer.py:390-391)
    if jpeg_store is not None:
        # real-image path: decode on host (native libjpeg) via the dataset's
        # batch hook — trainers, evaluators and analysis all see
        # pixel_values; the jitted step consumes them directly.
        from ..data.images import make_jpeg_host_fn
        dataset.batch_hook = make_jpeg_host_fn(jpeg_store,
                                               teacher_cfg.vit.image_size)
        image_source = engine.default_image_source
    else:
        image_source = image_source or make_synthetic_image_source(
            teacher_cfg.vit.image_size)
    lp_mode = lp_from is not None

    if init_variables is None:
        variables = init_teacher(model, teacher_cfg, cfg.batch_size, T,
                                 jax.random.key(cfg.seed))
    else:
        variables = init_variables
    params, batch_stats = variables["params"], variables["batch_stats"]
    if teacher_cfg.perceiver_type == "dual" and pretrained_head_ckpt:
        from .cxr_head_loop import load_cxr_head_into_teacher
        params, _ = load_cxr_head_into_teacher(pretrained_head_ckpt, params,
                                               pathology_labels)
    if lp_mode:
        ckpt = load_checkpoint(lp_from)
        params, changed = restore_tolerant(params, ckpt["params"], ())
        batch_stats, _ = restore_tolerant(batch_stats, ckpt["batch_stats"], ())
        log.info(f"[LP] loaded {lp_from} (metric={ckpt['metric']:.4f}); "
                 f"{len(changed)} keys adjusted")

    log.info(f"params: {param_count(params):,}  mode="
             f"{teacher_cfg.perceiver_type}  lp={lp_mode}")

    steps_per_epoch = dataset.split_size("train") // cfg.batch_size
    if cfg.limit_batches > 0:
        steps_per_epoch = min(steps_per_epoch, cfg.limit_batches)
    total_steps = max(steps_per_epoch * cfg.epochs, 1)
    tx = make_optimizer(
        cfg.optim, total_steps,
        label_fn=lp_frozen_label_fn if lp_mode else default_label_fn,
        frozen_prefixes=() if lp_mode else teacher_frozen_prefixes(teacher_cfg))
    state = TrainState.create(params, batch_stats, tx)

    mode = teacher_cfg.perceiver_type
    uses_dual = mode in ("dual_patch", "dual")

    with mesh:
        if uses_dual:
            train_step = engine.make_teacher_step(
                model, cfg, teacher_cfg.duett, T, lw, None, dtype,
                image_source, lp_mode=lp_mode, lp_beta_l2=lp_beta_l2,
                lp_corr_l2=lp_corr_l2)
            eval_step = engine.make_teacher_eval(model, T, dtype,
                                                 image_source)
            loss_keys = ("total", "img_total", "ts_total", "fus_total")
        elif mode == "single":
            train_step = engine.make_teacher_pathology_step(
                model, cfg, teacher_cfg.duett, T, lw, None, dtype,
                image_source=image_source)
            eval_step = engine.make_teacher_pathology_eval(
                model, T, dtype, image_source)
            loss_keys = ("total", "stage2_total", "stage4_total")
        elif mode == "legacy":
            train_step = engine.make_teacher_legacy_step(
                model, cfg, teacher_cfg.duett, T, dtype,
                aux_alpha=cfg.alpha_img, image_source=image_source)
            eval_step = engine.make_supervised_ts_eval  # placeholder below
            loss_keys = ("loss", "main_loss", "aux_loss")

            @jax.jit
            def legacy_eval(params, batch_stats, grid, static, batch):
                from ..data.pipeline import gather_windows
                from ..models.duett import feats_to_input
                x_ts = gather_windows(grid, batch["stay_rows"],
                                      batch["slot_idx"], T)
                x_static = static[batch["stay_rows"]].astype(dtype)
                x_in, x_static = feats_to_input(None, x_ts.astype(dtype),
                                                x_static)
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x_in, x_static, batch["bin_ends"].astype(dtype),
                    image_source(batch).astype(dtype), train=False)
                return out["main_logit"].astype(jnp.float32)

            eval_step = legacy_eval
        else:
            raise ValueError(f"unknown perceiver_type {mode!r}")

        def run_eval(params, batch_stats, split, beta, limit=0):
            if uses_dual:
                r = evaluate_dual_pathology(
                    eval_step, params, batch_stats, dataset, split,
                    cfg.batch_size, mesh, pathology_labels, beta, limit=limit)
                return r, r["main_auroc"], format_dual_pathology_gap_table(r)
            if mode == "single":
                from .evaluator import (evaluate_pathology,
                                        format_pathology_gap_table)
                r = evaluate_pathology(eval_step, params, batch_stats,
                                       dataset, split, cfg.batch_size, mesh,
                                       pathology_labels, limit=limit)
                return r, r["main_auroc"], format_pathology_gap_table(r)
            from .loops import evaluate_binary_split
            r = evaluate_binary_split(eval_step, params, batch_stats,
                                      dataset, split, cfg.batch_size, mesh,
                                      limit=limit)
            return r, r["auroc"], f"binary: {r}"

        grid = jax.device_put(dataset.grid, meshlib.replicated(mesh))
        static = jax.device_put(dataset.static, meshlib.replicated(mesh))
        dataset.grid, dataset.static = grid, static

        stopper = EarlyStopper(cfg.patience, mode="max")
        tracker = BestKTracker(ckpt_dir, k=1, mode="max", prefix="best")
        history: List[dict] = []
        step_rng = jax.random.key(cfg.seed + 1)
        t_start, n_steps = time.time(), 0
        cfg_dict = {"model": teacher_cfg.to_dict(), "train": cfg.to_dict(),
                    "pathology_labels": list(pathology_labels)}

        for epoch in range(cfg.epochs):
            # accumulate metrics as device scalars; one host sync per epoch
            # (a per-step float() would serialize dispatch behind a host
            # round-trip — costly on remote/tunneled TPU backends)
            acc = []
            nb = 0

            def _host_batches():
                for b in dataset.iter_batches(
                        "train", cfg.batch_size, shuffle=True,
                        seed=cfg.seed + epoch, limit=cfg.limit_batches):
                    b.pop("valid")
                    yield b

            if prefetch_depth > 0:
                from ..data.prefetch import prefetch
                batches = prefetch(_host_batches(), mesh,
                                   depth=prefetch_depth)
            else:
                batches = (meshlib.shard_batch(b, mesh)
                           for b in _host_batches())
            for dev_batch in batches:
                step_rng, sub = jax.random.split(step_rng)
                state, out = train_step(state, grid, static, dev_batch, sub)
                acc.append({k: out[k] for k in loss_keys})
                nb += 1
                n_steps += 1
            run = {k: float(jnp.stack([m[k] for m in acc]).sum())
                   for k in loss_keys} if acc else {k: 0.0 for k in loss_keys}
            if not np.isfinite(run[loss_keys[0]]):
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch} "
                    f"(loss={run[loss_keys[0]]}); aborting before the "
                    "optimizer state is poisoned — restore from the last "
                    "checkpoint")
            beta = (np.asarray(state.params["perceiver"]["beta"])
                    if uses_dual else None)

            val, val_metric, _ = run_eval(state.params, state.batch_stats,
                                          "val", beta)
            improved = stopper.update(val_metric)
            if improved:
                tracker.offer(val_metric, state.params,
                              state.batch_stats, int(state.step), cfg_dict)
            history.append({"epoch": epoch,
                            **{f"train_{k}": v / max(nb, 1)
                               for k, v in run.items()},
                            "val_main_auroc": val_metric})
            parts = " ".join(f"{k}={run[k]/max(nb,1):.3f}"
                             for k in loss_keys[1:])
            log.info(f"epoch {epoch:3d}  loss="
                     f"{run[loss_keys[0]]/max(nb,1):.4f} ({parts})  "
                     f"val_AUROC={val_metric:.4f}"
                     f"{'  *' if improved else ''}")
            log.metrics({"val/main_auroc": val_metric,
                         "train/loss": run[loss_keys[0]] / max(nb, 1)},
                        epoch)

            if cfg.eval_train_batches > 0:
                _, _, table = run_eval(state.params, state.batch_stats,
                                       "train", beta,
                                       limit=cfg.eval_train_batches)
                log.info("train-subset gap table:\n" + table)
            # in-loop read-only gradient diagnostics (trainer.py:684-705)
            if grad_diag_every > 0 and (epoch + 1) % grad_diag_every == 0:
                from ..analysis.grad_flow_diagnostics import (format_report,
                                                              run_diagnostics)
                diag = run_diagnostics(model, state.params,
                                       state.batch_stats, dataset,
                                       image_source, "val", cfg.batch_size,
                                       grad_diag_batches)
                log.info("grad-flow diagnostics:\n" + format_report(diag))
                log.metrics({f"grad_diag/{k}": v for k, v in diag.items()
                             if isinstance(v, float)}, epoch)
            if stopper.should_stop:
                log.info(f"early stop at epoch {epoch}")
                break

        elapsed = time.time() - t_start
        tracker.ensure_saved(state.params, state.batch_stats,
                             int(state.step), cfg_dict)
        best_metric, best_path = tracker.best
        ckpt = load_checkpoint(best_path)
        beta = (np.asarray(ckpt["params"]["perceiver"]["beta"])
                if uses_dual else None)
        test, test_metric, table = run_eval(ckpt["params"],
                                            ckpt["batch_stats"], "test", beta)
        log.info(f"test: main AUROC={test_metric:.4f}\n" + table)

    sps = n_steps / max(elapsed, 1e-9)
    test_metrics = {"main_auroc": test_metric}
    if isinstance(test, dict):
        for k in ("main_auprc", "per_label", "auprc"):
            if k in test:
                test_metrics[k] = test[k]
    return TrainResult(best_metric=best_metric, best_path=best_path,
                       history=history, test_metrics=test_metrics,
                       steps_per_sec=sps,
                       samples_per_sec=sps * cfg.batch_size)
