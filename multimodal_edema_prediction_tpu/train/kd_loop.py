"""Student knowledge-distillation loop.

Reference: ``training_duett/trainer.py:828-989``. The teacher is rebuilt from
its checkpoint's embedded config (checkpoint-as-config,
``_build_teacher_from_ckpt`` trainer.py:770-822) and frozen; the student is a
fresh DuETT + head trained with α·BCE + (1−α)·T²·binary-KL. Unlike the
reference (which only supports ``perceiver_type='dual'`` teachers here), both
teacher modes distill.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StudentConfig, TeacherConfig, TrainConfig
from ..data.pipeline import AnchorDataset
from ..models.student import StudentModel
from ..models.teacher import TeacherModel
from ..parallel import mesh as meshlib
from ..parallel import multihost as mh
from ..utils.logging import Logger
from . import engine
from .checkpoint import BestKTracker, load_checkpoint
from .loops import EarlyStopper, TrainResult, evaluate_binary_split
from .optim import make_optimizer
from .state import TrainState, param_count
from .teacher_loop import init_teacher, make_synthetic_image_source


def load_teacher_from_ckpt(ckpt_path: str):
    """Rebuild the exact teacher from a saved checkpoint (config rides in the
    checkpoint sidecar)."""
    ckpt = load_checkpoint(ckpt_path)
    if "config" not in ckpt:
        raise ValueError(f"{ckpt_path} has no config sidecar")
    tcfg = TeacherConfig.from_dict(ckpt["config"]["model"])
    # 'dual' teachers carry the pretrained-head width and keep_idx buffer in
    # the sidecar (teacher_loop writes them; reference rebuilds them from the
    # head ckpt file, trainer.py:786-800)
    keep = ckpt["config"].get("static_keep_idx")
    model = TeacherModel(
        tcfg,
        n_pretrained_labels=int(ckpt["config"].get("n_pretrained_labels", 7)),
        static_keep_idx=tuple(keep) if keep is not None else None)
    return model, tcfg, ckpt["params"], ckpt["batch_stats"], ckpt


def train_student_kd(dataset: AnchorDataset, student_cfg: StudentConfig,
                     teacher_ckpt: str, cfg: TrainConfig, ckpt_dir: str,
                     mesh=None, image_source: Optional[Callable] = None,
                     logger: Optional[Logger] = None,
                     ssl_backbone_ckpt: Optional[str] = None,
                     auto_resume: bool = False,
                     save_full_state: Optional[bool] = None,
                     state_backend: str = "msgpack",
                     stop_after_epochs: Optional[int] = None,
                     feature_cache: str = "none",
                     feature_store_path: Optional[str] = None,
                     hbm_feature_budget_gb: float = 8.0,
                     init_variables: Optional[dict] = None) -> TrainResult:
    """Resume semantics identical to ``train_teacher`` (FullStateResumer:
    bit-exact epoch-boundary restore).

    ``feature_cache`` (encode-once tier, data/features.py): the KD teacher
    is entirely frozen, so its ViT forward — the dominant cost of the KD
    step — is a constant per image; ``auto``/``hbm``/``host`` cache the
    (CLS, patch) tokens once and every KD step skips the ViT."""
    log = logger or Logger("student_kd")
    mesh = mesh or meshlib.create_mesh(cfg.n_data, cfg.n_model)
    multi = mh.process_count() > 1
    dtype = jnp.dtype(cfg.dtype)
    T = dataset.n_timesteps

    teacher_model, teacher_cfg, t_params, t_stats, t_ckpt = \
        load_teacher_from_ckpt(teacher_ckpt)
    log.info(f"teacher from {teacher_ckpt} "
             f"(metric={t_ckpt['metric']:.4f}, "
             f"mode={teacher_cfg.perceiver_type})")
    image_source = image_source or make_synthetic_image_source(
        teacher_cfg.vit.image_size)

    # encode-once frozen-ViT tier: the KD teacher never trains, so cache its
    # (CLS, patch) tokens per unique image and drop the ViT from the step
    feature_source = None
    if feature_cache != "none":
        if feature_cache not in ("auto", "hbm", "host"):
            raise ValueError(f"unknown feature_cache mode {feature_cache!r}")
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
            return np.asarray(engine.default_image_source(b)
                              if ("pixel_u8" in b or "pixel_values" in b)
                              else base_source(b), np.float32)

        encode = F.encode_fn_for_teacher(teacher_model, t_params, dtype)
        # store at the loop's compute precision (see teacher_loop)
        fdt = np.float32 if dtype == jnp.float32 else None
        n_patches = teacher_cfg.vit.n_patches
        fb_bytes = F.CXRFeatureBank.nbytes(len(all_ids), n_patches,
                                           teacher_cfg.d_img)
        if not multi and (feature_cache == "hbm" or (
                feature_cache == "auto"
                and fb_bytes <= hbm_feature_budget_gb * 2 ** 30)):
            fbank = F.CXRFeatureBank.build(
                encode, pixels_for_ids, all_ids, out_dtype=fdt,
                device_put=lambda a: jax.device_put(
                    a, meshlib.replicated(mesh)))
            dataset.batch_hook = fbank.host_fn()
            feature_source = fbank.feature_source(mesh=mesh)
            tier = "HBM token bank"
        else:
            own = all_ids
            if multi:
                P, pid = mh.process_count(), jax.process_index()
                own = all_ids[all_ids % P == pid]
                dataset.host_partition_count = P
                if feature_store_path:
                    feature_store_path = f"{feature_store_path}.host{pid}"
            fstore = F.HostFeatureStore.build(encode, pixels_for_ids, own,
                                              path=feature_store_path,
                                              out_dtype=fdt)
            dataset.batch_hook = fstore.host_fn()
            feature_source = F.features_from_batch
            tier = "host token store"
        log.info(f"[features] encode-once {tier}: {len(all_ids)} images "
                 f"({fb_bytes / 2**30:.2f} GiB bf16) — teacher ViT forward "
                 f"eliminated from every KD step")

    student = StudentModel(student_cfg)
    V = student_cfg.duett.n_variables
    x_in = np.zeros((cfg.batch_size, T, 2 * V + 1), dtype)
    x_static = np.zeros((cfg.batch_size, student_cfg.duett.d_static), dtype)
    times = np.zeros((cfg.batch_size, T), dtype)
    if init_variables is not None:   # e.g. transplant parity tests
        variables = init_variables
    else:
        init = jax.jit(student.init,
                       out_shardings=meshlib.replicated(mesh)) \
            if multi else jax.jit(student.init)
        variables = init(
            {"params": mh.maybe_raw_key(jax.random.key(cfg.seed))},
            x_in, x_static, times)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if ssl_backbone_ckpt:
        from .ssl_loop import transplant_encoder
        params, enc_stats, changed = transplant_encoder(ssl_backbone_ckpt,
                                                        params)
        if enc_stats is not None:
            batch_stats = dict(batch_stats)
            batch_stats["duett"] = enc_stats
        log.info(f"student backbone from {ssl_backbone_ckpt} "
                 f"({len(changed)} keys adjusted)")
    log.info(f"student params: {param_count(params):,}")

    steps_per_epoch = dataset.split_size("train") // cfg.batch_size
    if cfg.limit_batches > 0:
        steps_per_epoch = min(steps_per_epoch, cfg.limit_batches)
    tx = make_optimizer(cfg.optim, max(steps_per_epoch * cfg.epochs, 1))
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
        kd_step = engine.make_kd_step(student, teacher_model, cfg,
                                      student_cfg.duett, T, dtype,
                                      image_source,
                                      feature_source=feature_source)
        scan_k = max(1, int(cfg.steps_per_call))
        # K fused steps per dispatch (engine.scan_steps); the frozen
        # teacher params ride through as scan-invariant consts
        kd_scan = engine.scan_steps(
            engine.make_kd_step(student, teacher_model, cfg,
                                student_cfg.duett, T, dtype, image_source,
                                feature_source=feature_source, jit=False),
            teacher_model) if scan_k > 1 else None
        eval_step = engine.make_supervised_ts_eval(student, T, dtype)
        grid = mh.replicate_to_mesh(dataset.grid, mesh)
        static = mh.replicate_to_mesh(dataset.static, mesh)
        dataset.grid, dataset.static = grid, static
        t_params = jax.tree.map(lambda a: mh.replicate_to_mesh(a, mesh),
                                t_params)
        t_stats = jax.tree.map(lambda a: mh.replicate_to_mesh(a, mesh),
                               t_stats)

        stopper = EarlyStopper(cfg.patience, mode="max")
        tracker = BestKTracker(ckpt_dir, k=1, mode="max", prefix="best")
        history = []
        step_rng = jax.random.key(cfg.seed + 1)
        t0, n_steps = time.time(), 0
        cfg_dict = {"model": student_cfg.to_dict(), "train": cfg.to_dict(),
                    "teacher_ckpt": teacher_ckpt}

        keys = ("total", "bce", "kd")
        best_vars = None
        if resume_meta is not None:
            start_epoch, history, n_steps, step_rng = \
                resumer.apply_meta(resume_meta, stopper, tracker)
            log.info(f"[resume:{state_backend}] continuing at epoch "
                     f"{start_epoch}")

        @jax.jit
        def _acc_add(a, b):
            return jax.tree.map(jnp.add, a, b)

        for epoch in range(start_epoch, cfg.epochs):
            acc = None
            nb = 0
            def _host_batches():
                for b in dataset.iter_batches(
                        "train", cfg.batch_size, shuffle=True,
                        seed=cfg.seed + epoch, limit=cfg.limit_batches):
                    b.pop("valid")
                    yield b

            batch_iter = _host_batches()
            if kd_scan is not None:
                from ..data.prefetch import stack_host_batches
                batch_iter = stack_host_batches(batch_iter, scan_k)
            for batch in batch_iter:
                if kd_scan is not None:
                    dev_batch = meshlib.shard_batch(batch, mesh,
                                                    stacked=True)
                    kk = int(next(iter(dev_batch.values())).shape[0])
                    step_rng, subs = engine.split_chain(step_rng, kk)
                    state, out = kd_scan(state, grid, static, dev_batch,
                                         mh.maybe_raw_key(subs),
                                         t_params, t_stats)
                    cur = {k: out[k] for k in keys}   # K-sums
                    acc = cur if acc is None else _acc_add(acc, cur)
                    nb += kk
                    n_steps += kk
                    continue
                dev_batch = meshlib.shard_batch(batch, mesh)
                step_rng, sub = jax.random.split(step_rng)
                state, out = kd_step(state, t_params, t_stats, grid, static,
                                     dev_batch, mh.maybe_raw_key(sub))
                cur = {k: out[k] for k in keys}
                acc = cur if acc is None else _acc_add(acc, cur)
                nb += 1
                n_steps += 1
            run = {k: float(mh.fetch_global(acc[k])) for k in keys} \
                if acc is not None else {k: 0.0 for k in keys}

            val = evaluate_binary_split(eval_step, state.params,
                                        state.batch_stats, dataset, "val",
                                        cfg.batch_size, mesh)
            improved = stopper.update(val["auroc"])
            if improved:
                if multi:
                    best_vars = jax.tree.map(
                        mh.fetch_global, (state.params, state.batch_stats))
                if mh.is_main_process():
                    tracker.offer(val["auroc"], state.params,
                                  state.batch_stats, int(state.step),
                                  cfg_dict)
            history.append({"epoch": epoch,
                            **{f"train_{k}": v / max(nb, 1)
                               for k, v in run.items()}, **val})
            log.info(f"epoch {epoch:3d}  loss={run['total']/max(nb,1):.4f} "
                     f"(bce={run['bce']/max(nb,1):.3f} "
                     f"kd={run['kd']/max(nb,1):.3f})  "
                     f"val_auroc={val['auroc']:.4f}"
                     f"{'  *' if improved else ''}")
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
        test = evaluate_binary_split(eval_step, best_params,
                                     best_stats, dataset, "test",
                                     cfg.batch_size, mesh)
        log.info(f"test: auroc={test['auroc']:.4f} auprc={test['auprc']:.4f}")

    sps = n_steps / max(elapsed, 1e-9)
    return TrainResult(best_metric=best_metric, best_path=best_path,
                       history=history, test_metrics=test,
                       steps_per_sec=sps,
                       samples_per_sec=sps * cfg.batch_size)
