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
from ..parallel import multihost as mh
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
    the step; the step only indexes them.

    Out-of-range ids are poisoned with NaN (not silently aliased or clamped):
    a broken id→row mapping then trips the training loop's finite-loss guard
    on the very first epoch instead of quietly training on wrong images.
    Host-side validation with a real exception lives in
    ``HBMImageBank.rows_for`` (the production hook)."""
    n = bank.shape[0]

    def source(batch):
        ids = batch["image_ids"]
        rows = bank[jnp.clip(ids, 0, n - 1)]
        bad = (ids < 0) | (ids >= n)
        return jnp.where(bad[:, None, None, None], jnp.nan, rows)
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

# loss-part → wandb key, mirroring the reference's names
# (training_duett/trainer.py:485-527)
_WB_TRAIN_KEYS = {
    "img_total": "train/img_loss", "ts_total": "train/ts_loss",
    "fus_total": "train/fus_loss",
    "aux_residual": "train/aux_residual_loss",
    "reg_beta_l2": "train/lp_reg_beta_l2",
    "reg_corr_l2": "train/lp_reg_corr_l2",
    "stage2_total": "train/stage2_loss", "stage4_total": "train/stage4_loss",
    "main_loss": "train/main_loss", "aux_loss": "train/aux_loss",
}

# per-label val/test scalars logged at reference depth (trainer.py:544-566)
_WB_PER_LABEL_KEYS = (
    "img_auroc", "ts_auroc", "fus_auroc", "gap_i2f", "gap_t2f",
    "img_auprc", "ts_auprc", "fus_auprc", "beta",
    "stage2_auroc", "stage4_auroc", "stage2_auprc", "stage4_auprc",
)


def lp_frozen_label_fn(path: str) -> str:
    """LP mode: only correction_head + beta train (trainer.py:194-202)."""
    if any(path.startswith(p) for p in LP_TRAINABLE):
        return "correction"
    return "frozen"


def init_teacher(model: TeacherModel, cfg: TeacherConfig, batch_size: int,
                 n_timesteps: int, rng, out_sharding=None) -> dict:
    """Initialize parameters. Param shapes are batch-independent, so init
    runs jitted at batch 2 (eager init would dispatch hundreds of individual
    ops — pathological under remote-compile TPU backends).

    ``out_sharding``: optional placement for the initialized variables —
    multi-process runs pass ``replicated(mesh)`` so params are born globally
    replicated (default-device placement would commit them to a different
    physical device on each host)."""
    del batch_size
    V, D = cfg.duett.n_variables, cfg.duett.d_static
    S = cfg.vit.image_size
    B = 2
    # numpy inputs: replicate cleanly under multi-process jit (a local
    # jnp.zeros would be committed to a different device on each host)
    x_in = np.zeros((B, n_timesteps, 2 * V + 1), np.float32)
    x_static = np.zeros((B, D), np.float32)
    times = np.zeros((B, n_timesteps), np.float32)
    pixels = np.zeros((B, S, S, 3), np.float32)
    init = jax.jit(model.init) if out_sharding is None else \
        jax.jit(model.init, out_shardings=out_sharding)
    return init({"params": rng}, x_in, x_static, times, pixels)


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
                  jpeg_store=None, prefetch_depth: int = 2,
                  image_bank: str = "auto",
                  u8_store_path: Optional[str] = None,
                  hbm_image_budget_gb: float = 8.0,
                  feature_cache: str = "none",
                  feature_store_path: Optional[str] = None,
                  hbm_feature_budget_gb: float = 8.0,
                  auto_resume: bool = False,
                  save_full_state: Optional[bool] = None,
                  state_backend: str = "msgpack",
                  stop_after_epochs: Optional[int] = None) -> TrainResult:
    """``auto_resume=True`` restores the full train state (params, optimizer,
    RNG, early-stop bookkeeping) saved at the last completed epoch in
    ``ckpt_dir`` and continues bit-exactly — the capability the reference
    lacks entirely ("resume" there = reload best.pt and re-run,
    trainer.py:718-764). ``save_full_state`` (default: ``auto_resume``)
    persists that state at every epoch boundary. ``state_backend`` picks the
    artifact format: ``msgpack`` (single file) or ``orbax`` (sharded, async
    saves that overlap the next epoch — the pod-scale path).
    ``stop_after_epochs``: graceful-preemption hook — end THIS invocation
    after N epochs (the schedule still spans ``cfg.epochs``); a later
    ``auto_resume=True`` invocation continues where it left off. For
    chunked/preemptible schedulers and the resume tests.

    ``feature_cache`` (encode-once tier, data/features.py): with the CXR
    branch frozen (the reference's default), encode every unique image ONCE
    and train on cached (CLS, patch) tokens — the ViT forward (~90% of the
    fused step) drops out of every subsequent step/epoch. Modes: ``none``,
    ``auto`` (device bank if it fits ``hbm_feature_budget_gb``, else host),
    ``hbm`` (device-resident), ``host`` (RAM, or a reusable disk memmap when
    ``feature_store_path`` is given). Multi-process runs partition features
    per host by ``image_id % P`` like the pixel tiers."""
    log = logger or Logger("teacher")
    mesh = mesh or meshlib.create_mesh(cfg.n_data, cfg.n_model)
    multi = mh.process_count() > 1
    if multi and cfg.n_model != 1:
        raise ValueError("multi-process runs are data-parallel over the pod; "
                         "set n_model=1 (TP spans hosts only via GSPMD "
                         "single-controller, not jax.distributed)")
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
    if feature_cache not in ("none", "auto", "hbm", "host"):
        raise ValueError(f"unknown feature_cache mode {feature_cache!r}")
    if feature_cache != "none" and not teacher_cfg.freeze_cxr:
        raise ValueError(
            "feature_cache requires freeze_cxr=True: cached ViT tokens are "
            "constants — a trainable CXR branch would silently never update")
    if jpeg_store is not None and feature_cache != "none":
        # encode-once tier replaces the pixel tiers entirely: pixels are
        # needed exactly once (feature build below), so stream-decode for
        # the build and skip banks/stores.
        from ..data.images import make_jpeg_host_fn
        dataset.batch_hook = make_jpeg_host_fn(jpeg_store,
                                               teacher_cfg.vit.image_size)
        image_source = engine.default_image_source
    elif jpeg_store is not None:
        # real-image path. Single-process preferred tier: decode every image
        # ONCE into a device-resident uint8 bank (zero per-step host image
        # work or H2D image bytes; normalization fuses into the step).
        # Multi-process: per-host partitioned feeding — each host decodes
        # only its ``image_id % P`` share into RAM (or a disk memmap via
        # ``u8_store_path``) and batches are composed per-partition
        # (AnchorDataset.host_partition_count), so a pod never replicates
        # the pixel set per chip. Last resort: per-step host JPEG decode.
        if image_bank not in ("auto", "hbm", "stream"):
            raise ValueError(f"unknown image_bank mode {image_bank!r}")
        from ..data.images import HBMImageBank, make_jpeg_host_fn
        S = teacher_cfg.vit.image_size
        all_ids = np.unique(dataset.anchor["image_ids"])
        bank_bytes = HBMImageBank.nbytes(len(all_ids), S)
        if image_bank == "auto":
            use_bank = (not multi
                        and bank_bytes <= hbm_image_budget_gb * 2 ** 30)
        else:
            use_bank = image_bank == "hbm" and not multi
        if multi:
            P, pid = mh.process_count(), jax.process_index()
            own_ids = all_ids[all_ids % P == pid]
            dataset.host_partition_count = P
            if u8_store_path is not None:
                from ..data.images import U8MemmapStore
                store = U8MemmapStore.build(jpeg_store, own_ids, S,
                                            f"{u8_store_path}.host{pid}")
                dataset.batch_hook = store.host_fn()
            else:
                from ..data.images import HostU8Bank
                hbank = HostU8Bank(jpeg_store, own_ids, S)
                dataset.batch_hook = hbank.host_fn()
            image_source = engine.default_image_source
            log.info(f"[images] per-host u8 partition "
                     f"({len(own_ids)}/{len(all_ids)} images on host "
                     f"{pid}/{P}, {bank_bytes / P / 2**30:.2f} GiB/host) — "
                     f"pixels never replicated across the pod")
        elif use_bank:
            bank = HBMImageBank(
                jpeg_store, all_ids, S,
                device_put=lambda a: jax.device_put(
                    a, meshlib.replicated(mesh)))
            dataset.batch_hook = bank.host_fn()
            image_source = bank.image_source()
            log.info(f"[images] HBM-resident u8 bank: {len(all_ids)} images"
                     f" ({bank_bytes / 2**30:.2f} GiB) — per-step host "
                     f"image work eliminated")
        elif u8_store_path is not None:
            # catalog-scale tier: decode ONCE into a disk-resident uint8
            # memmap; epochs serve page-cached reads in the prefetch thread
            # and normalization fuses into the jitted step
            from ..data.images import U8MemmapStore
            store = U8MemmapStore.build(jpeg_store, all_ids, S,
                                        u8_store_path)
            dataset.batch_hook = store.host_fn()
            image_source = engine.default_image_source
            log.info(f"[images] disk-resident u8 memmap store "
                     f"({len(all_ids)} images, "
                     f"{bank_bytes / 2**30:.2f} GiB at {u8_store_path}) — "
                     f"decode-once, page-cached streaming")
        else:
            dataset.batch_hook = make_jpeg_host_fn(jpeg_store, S)
            image_source = engine.default_image_source
            log.info(f"[images] streaming host decode "
                     f"({bank_bytes / 2**30:.2f} GiB exceeds the "
                     f"{hbm_image_budget_gb} GiB bank budget or "
                     f"multi-process)")
    else:
        image_source = image_source or make_synthetic_image_source(
            teacher_cfg.vit.image_size)
    lp_mode = lp_from is not None

    if init_variables is None:
        variables = init_teacher(
            model, teacher_cfg, cfg.batch_size, T,
            mh.maybe_raw_key(jax.random.key(cfg.seed)),
            out_sharding=meshlib.replicated(mesh) if multi else None)
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

    # ---- encode-once frozen-ViT feature tier (data/features.py) -----------
    # Built AFTER all param surgeries (LP restore, head load, --vit_weights)
    # so tokens come from the exact frozen encoder this run trains against.
    feature_source = None
    if feature_cache != "none":
        if teacher_cfg.perceiver_type == "legacy":
            raise ValueError("feature_cache is not supported for the "
                             "deprecated 'legacy' perceiver mode")
        from ..data import features as F
        all_ids = np.unique(dataset.anchor["image_ids"]).astype(np.int64)
        order = np.argsort(dataset.anchor["image_ids"], kind="stable")
        srt = dataset.anchor["image_ids"][order]
        first = order[np.searchsorted(srt, all_ids)]
        y_rep = np.asarray(dataset.anchor["y_multi"][first], np.float32)
        base_hook, base_source = dataset.batch_hook, image_source

        def pixels_for_ids(ids):
            rows = np.searchsorted(all_ids, np.asarray(ids, np.int64))
            b = {"image_ids": np.asarray(ids, np.int32),
                 "y_multi": y_rep[rows]}
            if base_hook is not None:
                b = base_hook(b)
            return np.asarray(base_source(b), np.float32)

        encode = F.encode_fn_for_teacher(model, params, dtype)
        # store at the loop's compute precision: bf16 storage is lossless
        # for bf16 compute; f32 loops keep exactness
        fdt = np.float32 if dtype == jnp.float32 else None
        n_patches = teacher_cfg.vit.n_patches
        t_fb = time.time()
        if multi:
            P, pid = mh.process_count(), jax.process_index()
            own = all_ids[all_ids % P == pid]
            dataset.host_partition_count = P
            fstore = F.HostFeatureStore.build(
                encode, pixels_for_ids, own,
                path=(f"{feature_store_path}.host{pid}"
                      if feature_store_path else None), out_dtype=fdt)
            dataset.batch_hook = fstore.host_fn()
            feature_source = F.features_from_batch
            log.info(f"[features] per-host encode-once store: "
                     f"{len(own)}/{len(all_ids)} images on host {pid}/{P} "
                     f"({F.CXRFeatureBank.nbytes(len(own), n_patches, teacher_cfg.d_img) / 2**30:.2f}"
                     f" GiB/host, {time.time() - t_fb:.1f}s build) — ViT "
                     f"forward eliminated from every step")
        else:
            fb_bytes = F.CXRFeatureBank.nbytes(len(all_ids), n_patches,
                                               teacher_cfg.d_img)
            use_dev = feature_cache == "hbm" or (
                feature_cache == "auto"
                and fb_bytes <= hbm_feature_budget_gb * 2 ** 30)
            if use_dev:
                fbank = F.CXRFeatureBank.build(
                    encode, pixels_for_ids, all_ids, out_dtype=fdt,
                    device_put=lambda a: jax.device_put(
                        a, meshlib.replicated(mesh)))
                dataset.batch_hook = fbank.host_fn()
                feature_source = fbank.feature_source(mesh=mesh)
                tier = "HBM-resident token bank"
            else:
                fstore = F.HostFeatureStore.build(
                    encode, pixels_for_ids, all_ids,
                    path=feature_store_path, out_dtype=fdt)
                dataset.batch_hook = fstore.host_fn()
                feature_source = F.features_from_batch
                tier = ("disk memmap token store" if feature_store_path
                        else "host-RAM token store")
            log.info(f"[features] encode-once {tier}: {len(all_ids)} images"
                     f" ({fb_bytes / 2**30:.2f} GiB bf16, "
                     f"{time.time() - t_fb:.1f}s build) — ViT forward "
                     f"eliminated from every step")

    steps_per_epoch = dataset.split_size("train") // cfg.batch_size
    if cfg.limit_batches > 0:
        steps_per_epoch = min(steps_per_epoch, cfg.limit_batches)
    total_steps = max(steps_per_epoch * cfg.epochs, 1)
    tx = make_optimizer(
        cfg.optim, total_steps,
        label_fn=lp_frozen_label_fn if lp_mode else default_label_fn,
        frozen_prefixes=() if lp_mode else teacher_frozen_prefixes(teacher_cfg))
    if multi:
        # optimizer-state init must run as a global computation (params are
        # globally replicated; eager zeros_like on them is illegal)
        state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(
            params, batch_stats)
    else:
        state = TrainState.create(params, batch_stats, tx)

    # ---- full-state resume (epoch-boundary; see docstring) ----------------
    if save_full_state is None:
        save_full_state = auto_resume
    from .checkpoint import FullStateResumer
    resumer = FullStateResumer(ckpt_dir, state_backend,
                               enabled=save_full_state or auto_resume)
    start_epoch, resume_meta = 0, None
    if auto_resume:
        state, resume_meta = resumer.restore(state)
        if resume_meta is not None:
            start_epoch = int(resume_meta["epoch"]) + 1
            log.info(f"[resume:{state_backend}] restored epoch "
                     f"{resume_meta['epoch']} state from {ckpt_dir}; "
                     f"continuing at epoch {start_epoch}")

    mode = teacher_cfg.perceiver_type
    uses_dual = mode in ("dual_patch", "dual_patch_event", "dual")
    scan_k = max(1, int(cfg.steps_per_call))
    if scan_k > 1 and not uses_dual:
        log.info(f"steps_per_call={scan_k} is wired for the dual modes "
                 "only; falling back to single-step dispatch")
        scan_k = 1
    scan_step = None

    with mesh:
        if uses_dual:
            train_step = engine.make_teacher_step(
                model, cfg, teacher_cfg.duett, T, lw, None, dtype,
                image_source, lp_mode=lp_mode, lp_beta_l2=lp_beta_l2,
                lp_corr_l2=lp_corr_l2, feature_source=feature_source)
            eval_step = engine.make_teacher_eval(
                model, T, dtype, image_source,
                feature_source=feature_source)
            loss_keys = ("total", "img_total", "ts_total", "fus_total")
            if cfg.aux_residual_alpha > 0.0:
                loss_keys += ("aux_residual",)
            if lp_mode:
                loss_keys += ("reg_beta_l2", "reg_corr_l2")
            if scan_k > 1:
                # K steps per XLA program (engine.scan_steps): amortizes
                # per-step dispatch; exact sequential semantics
                raw = engine.make_teacher_step(
                    model, cfg, teacher_cfg.duett, T, lw, None, dtype,
                    image_source, lp_mode=lp_mode, lp_beta_l2=lp_beta_l2,
                    lp_corr_l2=lp_corr_l2, feature_source=feature_source,
                    jit=False)
                scan_step = engine.scan_steps(raw, model)
        elif mode == "single":
            train_step = engine.make_teacher_pathology_step(
                model, cfg, teacher_cfg.duett, T, lw, None, dtype,
                alpha_stage2=cfg.aux_stage2_alpha,
                alpha_stage4=cfg.aux_stage4_alpha,
                image_source=image_source, feature_source=feature_source)
            eval_step = engine.make_teacher_pathology_eval(
                model, T, dtype, image_source,
                feature_source=feature_source)
            loss_keys = ("total", "stage2_total", "stage4_total")
        elif mode == "legacy":
            train_step = engine.make_teacher_legacy_step(
                model, cfg, teacher_cfg.duett, T, dtype,
                aux_alpha=(cfg.aux_cxr_alpha if cfg.use_aux_cxr else 0.0),
                image_source=image_source)
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

        grid = mh.replicate_to_mesh(dataset.grid, mesh)
        static = mh.replicate_to_mesh(dataset.static, mesh)
        dataset.grid, dataset.static = grid, static

        stopper = EarlyStopper(cfg.patience, mode="max")
        tracker = BestKTracker(ckpt_dir, k=1, mode="max", prefix="best")
        history: List[dict] = []
        step_rng = jax.random.key(cfg.seed + 1)
        t_start, n_steps = time.time(), 0
        cfg_dict = {"model": teacher_cfg.to_dict(), "train": cfg.to_dict(),
                    "pathology_labels": list(pathology_labels)}
        if teacher_cfg.perceiver_type == "dual":
            # 'dual' reconstruction needs these (NOT recoverable from params:
            # keep_idx is an index buffer, reference :1069) — ride the sidecar
            cfg_dict["n_pretrained_labels"] = n_pretrained
            if static_keep_idx is not None:
                cfg_dict["static_keep_idx"] = list(static_keep_idx)
        best_vars = None   # multi-process: in-memory best (file is main-only)
        if resume_meta is not None:
            start_epoch, history, n_steps, step_rng = \
                resumer.apply_meta(resume_meta, stopper, tracker)

        @jax.jit
        def _acc_add(a, b):
            return jax.tree.map(jnp.add, a, b)

        for epoch in range(start_epoch, cfg.epochs):
            # accumulate metrics as device scalars; one host sync per epoch
            # (a per-step float() would serialize dispatch behind a host
            # round-trip — costly on remote/tunneled TPU backends)
            acc = None
            nb = 0

            def _host_batches():
                for b in dataset.iter_batches(
                        "train", cfg.batch_size, shuffle=True,
                        seed=cfg.seed + epoch, limit=cfg.limit_batches):
                    b.pop("valid")
                    yield b

            host_iter = _host_batches()
            if scan_step is not None:
                from ..data.prefetch import stack_host_batches
                host_iter = stack_host_batches(host_iter, scan_k)
            if prefetch_depth > 0:
                from ..data.prefetch import prefetch
                batches = prefetch(host_iter, mesh, depth=prefetch_depth,
                                   stacked=scan_step is not None)
            else:
                batches = (meshlib.shard_batch(
                    b, mesh, stacked=scan_step is not None)
                    for b in host_iter)
            # per-step scalar logging only when a wandb sink is live —
            # the fetch is a host sync, so the default path stays sync-free
            # (the reference logs running losses every --log_every steps,
            # trainer.py:481-529)
            step_log = cfg.log_every > 0 \
                and getattr(log, "_wb", None) is not None
            for dev_batch in batches:
                if scan_step is not None:
                    kk = int(next(iter(dev_batch.values())).shape[0])
                    step_rng, subs = engine.split_chain(step_rng, kk)
                    if multi:   # raw key bits replicate globally
                        subs = np.asarray(jax.random.key_data(subs))
                    state, out = scan_step(state, grid, static, dev_batch,
                                           subs)
                    cur = {k: out[k] for k in loss_keys}   # K-sums
                    acc = cur if acc is None else _acc_add(acc, cur)
                    nb += kk
                    n_steps += kk
                    if step_log and (n_steps // cfg.log_every
                                     > (n_steps - kk) // cfg.log_every):
                        ps = {k: np.asarray(
                            mh.fetch_global(out["per_step"][k]))
                            for k in loss_keys}
                        for i in range(kk):
                            gs = n_steps - kk + i + 1
                            if gs % cfg.log_every == 0:
                                log.metrics(
                                    {f"train_step/{k}": float(ps[k][i])
                                     for k in loss_keys}, gs)
                    continue
                step_rng, sub = jax.random.split(step_rng)
                if multi:   # raw key bits: numpy inputs replicate globally
                    sub = np.asarray(jax.random.key_data(sub))
                state, out = train_step(state, grid, static, dev_batch, sub)
                cur = {k: out[k] for k in loss_keys}
                acc = cur if acc is None else _acc_add(acc, cur)
                nb += 1
                n_steps += 1
                if step_log and n_steps % cfg.log_every == 0:
                    log.metrics({f"train_step/{k}":
                                 float(mh.fetch_global(cur[k]))
                                 for k in loss_keys}, n_steps)
            run = {k: float(mh.fetch_global(acc[k])) for k in loss_keys} \
                if acc is not None else {k: 0.0 for k in loss_keys}
            if not np.isfinite(run[loss_keys[0]]):
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch} "
                    f"(loss={run[loss_keys[0]]}); aborting before the "
                    "optimizer state is poisoned — restore from the last "
                    "checkpoint")
            # 'dual' (faithful legacy mode) has additive residuals, no beta
            beta_p = state.params["perceiver"].get("beta") \
                if uses_dual else None
            beta = mh.fetch_global(beta_p) if beta_p is not None else None

            val, val_metric, _ = run_eval(state.params, state.batch_stats,
                                          "val", beta)
            improved = stopper.update(val_metric)
            if improved:
                if multi:   # every host keeps the best weights in memory —
                    # hosts need not share a filesystem with process 0
                    best_vars = jax.tree.map(
                        mh.fetch_global, (state.params, state.batch_stats))
                if mh.is_main_process():
                    tracker.offer(val_metric, state.params,
                                  state.batch_stats, int(state.step),
                                  cfg_dict)
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
            # wandb telemetry at reference depth (trainer.py:481-566):
            # per-part train losses, per-label val scalars + fusion gaps,
            # β magnitude, LP regularizer terms, best-metric watermark.
            wb = {"train/loss": run[loss_keys[0]] / max(nb, 1),
                  "train/epoch": epoch,
                  "val/auroc": val_metric,
                  "val/main_auroc": val_metric}
            for k in loss_keys[1:]:
                wb[_WB_TRAIN_KEYS.get(k, f"train/{k}")] = run[k] / max(nb, 1)
            if isinstance(val, dict):
                if "main_auprc" in val:
                    wb["val/auprc"] = val["main_auprc"]
                for r in val.get("per_label", []):
                    nm = r["name"]
                    for key in _WB_PER_LABEL_KEYS:
                        if key in r:
                            wb[f"val/{nm}/{key}"] = r[key]
            if lp_mode and uses_dual:
                babs = np.abs(np.asarray(beta))
                wb["train/lp_beta_mean_abs"] = float(babs.mean())
                wb["train/lp_beta_max_abs"] = float(babs.max())
            if improved:
                wb["val/best_auroc"] = stopper.best
            log.metrics(wb, epoch)

            if cfg.eval_train_batches > 0:
                tr, tr_metric, table = run_eval(state.params,
                                                state.batch_stats,
                                                "train", beta,
                                                limit=cfg.eval_train_batches)
                log.info("train-subset gap table:\n" + table)
                # train-vs-val overfit telemetry (trainer.py:626-647)
                wb_t = {"train_eval/auroc": tr_metric,
                        "train_eval/epoch": epoch,
                        "train_eval/main_gap_over_val":
                            tr_metric - val_metric}
                if isinstance(tr, dict):
                    if "main_auprc" in tr:
                        wb_t["train_eval/auprc"] = tr["main_auprc"]
                    for r in tr.get("per_label", []):
                        nm = r["name"]
                        for key in _WB_PER_LABEL_KEYS:
                            if key in r:
                                wb_t[f"train_eval/{nm}/{key}"] = r[key]
                log.metrics(wb_t, epoch)
            # in-loop read-only gradient diagnostics (trainer.py:684-705)
            if grad_diag_every > 0 and (epoch + 1) % grad_diag_every == 0 \
                    and mode in ("dual_patch", "dual_patch_event"):
                from ..analysis.grad_flow_diagnostics import (
                    diagnostics_to_log_dict, format_report, run_diagnostics)
                diag = run_diagnostics(model, state.params,
                                       state.batch_stats, dataset,
                                       image_source, "val", cfg.batch_size,
                                       grad_diag_batches,
                                       alphas=(cfg.alpha_img, cfg.alpha_ts,
                                               cfg.alpha_fus),
                                       label_weights=lw,
                                       label_names=list(pathology_labels))
                log.info("grad-flow diagnostics:\n" + format_report(diag))
                log.metrics(diagnostics_to_log_dict(
                    diag, labels=list(pathology_labels)), epoch)
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
                log.info(f"early stop at epoch {epoch}")
                break
            if stop_after_epochs is not None \
                    and epoch + 1 - start_epoch >= stop_after_epochs:
                log.info(f"pausing after {stop_after_epochs} epochs this "
                         f"invocation (graceful preemption; resume with "
                         f"auto_resume)")
                break
        resumer.finish()

        elapsed = time.time() - t_start
        if multi:
            if mh.is_main_process():
                tracker.ensure_saved(state.params, state.batch_stats,
                                     int(state.step), cfg_dict)
                best_metric, best_path = tracker.best
            else:
                best_metric, best_path = stopper.best or float("nan"), ""
            if best_vars is None:
                best_vars = jax.tree.map(
                    mh.fetch_global, (state.params, state.batch_stats))
            best_params, best_stats = best_vars
        else:
            tracker.ensure_saved(state.params, state.batch_stats,
                                 int(state.step), cfg_dict)
            best_metric, best_path = tracker.best
            ckpt = load_checkpoint(best_path)
            best_params, best_stats = ckpt["params"], ckpt["batch_stats"]
        beta_p = best_params["perceiver"].get("beta") if uses_dual else None
        beta = np.asarray(beta_p) if beta_p is not None else None
        test, test_metric, table = run_eval(best_params, best_stats,
                                            "test", beta)
        log.info(f"test: main AUROC={test_metric:.4f}\n" + table)
        wb_test = {"test/auroc": test_metric}
        if isinstance(test, dict):
            if "main_auprc" in test:
                wb_test["test/auprc"] = test["main_auprc"]
            for r in test.get("per_label", []):
                for key in _WB_PER_LABEL_KEYS:
                    if key in r:
                        wb_test[f"test/{r['name']}/{key}"] = r[key]
        log.metrics(wb_test)

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
