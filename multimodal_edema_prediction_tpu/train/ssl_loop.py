"""DuETT SSL pretraining loop (masked value/presence/event reconstruction).

Reference: ``duett/train_duett_ssl.py`` + ``duett/duett.py:329-418``:
sliding-window samples, invsqrt warmup, grad-clip 1.0, best ckpt by min
val_loss, and the crucial side artifact — ``meta_with_stats.pkl`` saved next
to the checkpoints (train_duett_ssl.py:130-135), the contract every
downstream stage consumes.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DuettConfig, TrainConfig
from ..data.sliding import SlidingSSLDataset
from ..models.duett import DuettPretrainModel
from ..parallel import mesh as meshlib
from ..parallel import multihost as mh
from ..utils.logging import Logger
from . import engine
from .checkpoint import BestKTracker, load_checkpoint
from .loops import EarlyStopper, TrainResult
from .optim import invsqrt_warmup
from .state import TrainState, param_count


def train_ssl(dataset: SlidingSSLDataset, duett_cfg: DuettConfig,
              cfg: TrainConfig, ckpt_dir: str, mesh=None,
              lr: float = 3e-4, weight_decay: float = 0.1,
              warmup_steps: int = 2000, grad_clip: float = 1.0,
              logger: Optional[Logger] = None,
              auto_resume: bool = False,
              save_full_state: Optional[bool] = None,
              state_backend: str = "msgpack",
              stop_after_epochs: Optional[int] = None,
              init_variables: Optional[dict] = None) -> TrainResult:
    """Resume semantics identical to ``train_teacher``: epoch-boundary
    full-state saves + bit-exact ``auto_resume`` restore (the SSL pretrain
    is the longest job of the pipeline — 300 epochs in the reference's
    PhysioNet recipe, duett/train.py:74-100)."""
    log = logger or Logger("duett_ssl")
    mesh = mesh or meshlib.create_mesh(cfg.n_data, cfg.n_model)
    multi = mh.process_count() > 1
    dtype = jnp.dtype(cfg.dtype)
    model = DuettPretrainModel(duett_cfg)
    T = dataset.n_timesteps
    V = duett_cfg.n_variables

    # init with a dummy pretrain batch
    from ..models.duett import PretrainBatch
    B = cfg.batch_size
    S = duett_cfg.pretrain_masked_steps
    pb = PretrainBatch(
        x_in=np.zeros((B, T, 2 * V + 1), dtype),
        mask_idx=np.zeros((B, S), np.int32),
        y_value=np.zeros((B, S, V), np.float32),
        y_presence_mask=np.zeros((B, S, V), np.float32),
        event_var=np.zeros((B,), np.int32),
        y_events=np.zeros((B, T), np.float32),
        y_events_mask=np.zeros((B, T), np.float32))
    x_static = np.zeros((B, duett_cfg.d_static), dtype)
    times = np.zeros((B, T), dtype)
    if init_variables is not None:
        # warm start / transplant (same contract as train_teacher's
        # init_variables)
        variables = init_variables
    else:
        init = jax.jit(model.init, out_shardings=meshlib.replicated(mesh)) \
            if multi else jax.jit(model.init)
        variables = init(
            {"params": mh.maybe_raw_key(jax.random.key(cfg.seed))},
            pb, x_static, times)
    params, batch_stats = variables["params"], variables["batch_stats"]
    log.info(f"SSL params: {param_count(params):,}")

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(invsqrt_warmup(lr, warmup_steps),
                    weight_decay=weight_decay))
    if multi:
        state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(
            params, batch_stats)
    else:
        state = TrainState.create(params, batch_stats, tx)

    if save_full_state is None:
        save_full_state = auto_resume
    from .checkpoint import FullStateResumer
    resumer = FullStateResumer(ckpt_dir, state_backend,
                               enabled=save_full_state or auto_resume)
    start_epoch, resume_meta = 0, None
    if auto_resume:
        state, resume_meta = resumer.restore(state)

    with mesh:
        train_step = engine.make_ssl_step(model, duett_cfg, T, dtype)
        scan_k = max(1, int(cfg.steps_per_call))
        # SSL steps are ~tiny (41.9k samples/s/chip measured): per-step host
        # dispatch dominates; fuse K steps into one program (scan_steps)
        scan_step = engine.scan_steps(
            engine.make_ssl_step(model, duett_cfg, T, dtype, jit=False)) \
            if scan_k > 1 else None
        eval_step = engine.make_ssl_eval(model, duett_cfg, T, dtype)
        grid = mh.replicate_to_mesh(dataset.grid, mesh)
        static = mh.replicate_to_mesh(dataset.static, mesh)
        dataset.grid, dataset.static = grid, static

        tracker = BestKTracker(ckpt_dir, k=1, mode="min", prefix="pretrain")
        stopper = EarlyStopper(cfg.patience, mode="min")
        history = []
        step_rng = jax.random.key(cfg.seed + 1)
        t0, n_steps = time.time(), 0
        cfg_dict = {"duett": duett_cfg.to_dict(), "train": cfg.to_dict()}
        if resume_meta is not None:
            start_epoch, history, n_steps, step_rng = \
                resumer.apply_meta(resume_meta, stopper, tracker)
            log.info(f"[resume:{state_backend}] continuing at epoch "
                     f"{start_epoch}")

        # persist the meta contract next to the checkpoints
        if mh.is_main_process():
            dataset.meta.save(os.path.join(ckpt_dir, "meta_with_stats.pkl"))

        add = jax.jit(jnp.add)
        for epoch in range(start_epoch, cfg.epochs):
            loss_sum, nb = None, 0
            batch_iter = dataset.iter_batches(
                "train", cfg.batch_size, shuffle=True,
                seed=cfg.seed + epoch, limit=cfg.limit_batches)
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
                                           mh.maybe_raw_key(subs))
                    # out["total"] is already the K-sum (scan_steps)
                    loss_sum = out["total"] if loss_sum is None \
                        else add(loss_sum, out["total"])
                    nb += kk
                    n_steps += kk
                    continue
                dev_batch = meshlib.shard_batch(batch, mesh)
                step_rng, sub = jax.random.split(step_rng)
                state, out = train_step(state, grid, static, dev_batch,
                                        mh.maybe_raw_key(sub))
                # device-scalar accumulation; one host sync per epoch
                loss_sum = out["total"] if loss_sum is None \
                    else add(loss_sum, out["total"])
                nb += 1
                n_steps += 1
            train_loss = float(mh.fetch_global(loss_sum)) / nb if nb \
                else float("nan")
            if nb and not np.isfinite(train_loss):
                raise FloatingPointError(
                    f"non-finite SSL loss at epoch {epoch}; aborting")

            # validation loss with deterministic per-batch masking rng;
            # cap the eval batch size so small val splits still produce
            # at least one full fixed-shape batch — rounded DOWN to a
            # multiple of the data mesh axis (an indivisible batch cannot
            # shard)
            n_data = int(mesh.shape.get("data", 1))
            if dataset.split_size("val") < n_data:
                # a val split smaller than the data-mesh axis cannot form
                # even one shardable batch; SlidingSSLDataset drops the
                # incomplete remainder, validation would yield zero batches
                # and val_loss would silently become NaN (never firing
                # early-stop / best-ckpt) — fail fast instead
                raise ValueError(
                    f"val split has {dataset.split_size('val')} windows < "
                    f"data-mesh axis {n_data}; cannot build a shardable "
                    f"validation batch — enlarge the val split or shrink "
                    f"the mesh")
            val_bs = min(cfg.batch_size,
                         max(dataset.split_size("val"), 1))
            val_bs = max((val_bs // n_data) * n_data, n_data)
            val_losses = []
            for i, batch in enumerate(dataset.iter_batches(
                    "val", val_bs, shuffle=False,
                    limit=cfg.limit_batches)):
                dev_batch = meshlib.shard_batch(batch, mesh)
                parts = eval_step(state.params, state.batch_stats, grid,
                                  static, dev_batch,
                                  mh.maybe_raw_key(jax.random.key(1000 + i)))
                val_losses.append(float(mh.fetch_global(parts["total"])))
            val_loss = float(np.mean(val_losses)) if val_losses else \
                float("nan")

            improved = stopper.update(val_loss)
            if improved and mh.is_main_process():
                # tracker is mode="min": offer the RAW loss. (Negating it
                # here double-inverted the ordering and kept the WORST
                # checkpoint — caught by the 2-proc SSL equivalence test,
                # where the non-main process reports stopper.best instead.)
                tracker.offer(val_loss, state.params, state.batch_stats,
                              int(state.step), cfg_dict)
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "val_loss": val_loss})
            log.info(f"epoch {epoch:3d}  train={train_loss:.4f}  "
                     f"val={val_loss:.4f}{'  *' if improved else ''}")
            from ..utils import preemption
            # agree on the flag globally: SIGTERM may hit only some hosts
            preempted = mh.any_flag(preemption.requested())
            if save_full_state or preempted:
                resumer.save(state, epoch, stopper, tracker, history,
                             n_steps, step_rng)
            if preempted:
                log.info(f"SIGTERM/preemption at epoch {epoch} — state "
                         f"saved; resume with auto_resume/--resume_dir")
                break
            if stopper.should_stop:
                break
            if stop_after_epochs is not None \
                    and epoch + 1 - start_epoch >= stop_after_epochs:
                log.info(f"pausing after {stop_after_epochs} epochs "
                         f"(graceful preemption)")
                break
        resumer.finish()

        elapsed = time.time() - t0
        if mh.is_main_process():
            tracker.ensure_saved(state.params, state.batch_stats,
                                 int(state.step), cfg_dict)
            best_metric, best_path = tracker.best
        else:
            best_metric = (stopper.best if stopper.best is not None
                           else float("nan"))
            best_path = ""

    sps = n_steps / max(elapsed, 1e-9)
    return TrainResult(best_metric=best_metric, best_path=best_path,
                       history=history, test_metrics={},
                       steps_per_sec=sps,
                       samples_per_sec=sps * cfg.batch_size)


def transplant_encoder(ssl_ckpt_path: str, target_params, dest_key: str = "duett"):
    """Load an SSL checkpoint's encoder into a downstream model's backbone —
    the ``load_duett_backbone`` equivalent
    (models/main_architecture_duett.py:98-123, strict=False semantics)."""
    from .checkpoint import restore_tolerant
    ckpt = load_checkpoint(ssl_ckpt_path)
    enc = ckpt["params"]["encoder"]
    new_backbone, changed = restore_tolerant(target_params[dest_key], enc,
                                             skip_prefixes=("head",))
    out = dict(target_params)
    out[dest_key] = new_backbone
    stats = ckpt.get("batch_stats", {}).get("encoder", None)
    return out, stats, changed
