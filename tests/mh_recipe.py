"""Shared tiny recipes for the multi-host equivalence tests.

Imported both by the 2-process workers (``mh_worker.py``) and by the
single-process reference runs in ``test_multihost_2proc.py``; any drift
between multi-host and single-host execution of the SAME recipe shows up as
a metric mismatch. Recipes:

- ``teacher``         — fused teacher, procedural images (round-2 coverage)
- ``teacher_images``  — real-JPEG path with PER-HOST image partitioning:
    multi-process runs decode only their ``image_id % P`` share into a host
    bank (teacher_loop per-host tier); the single-process reference sets the
    same ``host_partition_count`` so batch composition is identical.
- ``ssl``             — masked-reconstruction pretraining loop
- ``kd``              — student distillation from a teacher checkpoint it
    first trains (multi-host: ckpt written by process 0 on the SHARED
    ``workdir``; the train-end eval collectives double as the barrier before
    process 1 reads it).
"""
import io
import os
import tempfile

import numpy as np


def _tiny_teacher_cfgs():
    from multimodal_edema_prediction_tpu.config import (
        DuettConfig, OptimConfig, PerceiverConfig, TeacherConfig, TrainConfig,
        ViTConfig)
    tcfg = TeacherConfig(
        duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                          d_embedding=8, n_layers=1, d_feedforward=32,
                          d_hidden_mlp_embedding=16,
                          d_hidden_tab_encoder=16),
        vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                      n_heads=2, d_feedforward=64),
        perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                                  head_hidden=16))
    cfg = TrainConfig(batch_size=32, epochs=2, patience=2, dtype="float32",
                      limit_batches=3, optim=OptimConfig(lr=1e-3,
                                                         warmup_steps=5))
    return tcfg, cfg


def _cohort():
    from multimodal_edema_prediction_tpu.config import DataConfig
    from multimodal_edema_prediction_tpu.data import pipeline as P
    from multimodal_edema_prediction_tpu.data import synthetic as S
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    anchor_ds = P.build_anchor_dataset(ds, meta, DataConfig())
    return ds, meta, anchor_ds


def _result(res) -> dict:
    out = {
        "best_metric": float(res.best_metric),
        "history": [{"epoch": h["epoch"],
                     **{k: float(v) for k, v in h.items() if k != "epoch"}}
                    for h in res.history],
    }
    if "main_auroc" in res.test_metrics:
        out["test_auroc"] = float(res.test_metrics["main_auroc"])
    elif "auroc" in res.test_metrics:
        out["test_auroc"] = float(res.test_metrics["auroc"])
    else:
        out["test_auroc"] = float("nan")
    return out


def run_recipe(kind: str = "teacher", workdir: str = None) -> dict:
    from multimodal_edema_prediction_tpu.config import DataConfig
    from multimodal_edema_prediction_tpu.train.teacher_loop import \
        train_teacher

    if workdir is None:
        _tmp = tempfile.TemporaryDirectory()
        workdir = _tmp.name
    labels = DataConfig().pathology_labels

    if kind == "teacher":
        tcfg, cfg = _tiny_teacher_cfgs()
        _, _, anchor_ds = _cohort()
        res = train_teacher(anchor_ds, tcfg, cfg,
                            os.path.join(workdir, "teacher"), labels,
                            prefetch_depth=2)
        return _result(res)

    if kind == "teacher_images":
        from PIL import Image
        from multimodal_edema_prediction_tpu.data.images import JpegStore
        tcfg, cfg = _tiny_teacher_cfgs()
        _, _, anchor_ds = _cohort()
        rng = np.random.default_rng(3)
        blobs = {}
        for img_id in np.unique(anchor_ds.anchor["image_ids"]):
            arr = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            blobs[int(img_id)] = buf.getvalue()
        # identical batch composition whether 1 or 2 processes run: the
        # single-process reference partitions by the same P=2 rule the
        # per-host tier uses (train_teacher sets it to process_count when
        # multi — same value)
        anchor_ds.host_partition_count = 2
        res = train_teacher(anchor_ds, tcfg, cfg,
                            os.path.join(workdir, "teacher_img"), labels,
                            jpeg_store=JpegStore(blobs=blobs),
                            prefetch_depth=2)
        return _result(res)

    if kind == "teacher_cached":
        # encode-once tier under multi-process: per-host FEATURE
        # partitioning (teacher_loop host-store branch) — each process
        # encodes only its image_id % P == pid share into a HostFeatureStore
        # and batches gather from the local partition; equivalence vs
        # single-process proves the partitioned token gather feeds the step
        # the same values.
        tcfg, cfg = _tiny_teacher_cfgs()
        _, _, anchor_ds = _cohort()
        anchor_ds.host_partition_count = 2
        res = train_teacher(anchor_ds, tcfg, cfg,
                            os.path.join(workdir, "teacher_cached"), labels,
                            prefetch_depth=2, feature_cache="host")
        return _result(res)

    if kind == "teacher_orbax":
        # pod-scale state backend: orbax save/commit of replicated global
        # jax.Arrays is a COLLECTIVE — FullStateResumer.save must run on
        # every process (checkpoint.py:194-216); a process-0 gate would
        # deadlock this recipe at the first epoch save (ADVICE r2, medium).
        tcfg, cfg = _tiny_teacher_cfgs()
        _, _, anchor_ds = _cohort()
        res = train_teacher(anchor_ds, tcfg, cfg,
                            os.path.join(workdir, "teacher_orbax"), labels,
                            prefetch_depth=2, save_full_state=True,
                            state_backend="orbax")
        out = _result(res)
        out["orbax_state_saved"] = os.path.isdir(
            os.path.join(workdir, "teacher_orbax", "orbax_state"))
        return out

    if kind in ("teacher_preempt", "teacher_preempt_resume"):
        # VERDICT r3 item 7: a REAL SIGTERM delivered to exactly ONE of the
        # two processes mid-run must stop BOTH at the same epoch boundary
        # with matching resumable state — that is ``mh.any_flag``
        # (parallel/multihost.py:132) turning the local signal flag into a
        # global agreement. A divergence (only the signaled host stopping)
        # deadlocks the survivor in the next epoch's collectives, which the
        # parent's subprocess timeout converts into a failure.
        import dataclasses
        import signal
        import threading

        import jax

        from multimodal_edema_prediction_tpu.utils import preemption
        tcfg, cfg = _tiny_teacher_cfgs()
        # patience high enough that ONLY the signal can end the run early
        cfg = dataclasses.replace(cfg, epochs=4, patience=10)
        _, _, anchor_ds = _cohort()
        resume = kind.endswith("_resume")
        preemption.clear()
        preemption.install_handler()
        timer = None
        if not resume and jax.process_count() > 1 \
                and jax.process_index() == 1:
            delay = float(os.environ.get("MH_PREEMPT_AFTER_S", "20"))
            timer = threading.Timer(
                delay, lambda: os.kill(os.getpid(), signal.SIGTERM))
            timer.start()
        try:
            res = train_teacher(anchor_ds, tcfg, cfg,
                                os.path.join(workdir, "teacher_pre"),
                                labels, prefetch_depth=2,
                                auto_resume=resume)
        finally:
            if timer is not None:
                timer.cancel()
            preemption.clear()
        out = _result(res)
        out["n_epochs_run"] = len(res.history)
        out["state_saved"] = os.path.exists(os.path.join(
            workdir, "teacher_pre", "train_state.meta.json"))
        return out

    if kind == "ssl":
        from multimodal_edema_prediction_tpu.config import TrainConfig
        from multimodal_edema_prediction_tpu.data.sliding import \
            build_sliding_ssl_dataset
        from multimodal_edema_prediction_tpu.train.ssl_loop import train_ssl
        tcfg, _ = _tiny_teacher_cfgs()
        ds, meta, _ = _cohort()
        sds = build_sliding_ssl_dataset(ds, meta, n_timesteps=24, stride=12)
        cfg = TrainConfig(batch_size=32, epochs=2, patience=2,
                          dtype="float32", limit_batches=3)
        res = train_ssl(sds, tcfg.duett, cfg, os.path.join(workdir, "ssl"),
                        warmup_steps=5)
        return _result(res)

    if kind == "kd":
        from multimodal_edema_prediction_tpu.config import StudentConfig
        from multimodal_edema_prediction_tpu.train.kd_loop import \
            train_student_kd
        tcfg, cfg = _tiny_teacher_cfgs()
        _, _, anchor_ds = _cohort()
        t_dir = os.path.join(workdir, "kd_teacher")
        t_res = train_teacher(anchor_ds, tcfg, cfg, t_dir, labels,
                              prefetch_depth=2)
        scfg = StudentConfig(duett=tcfg.duett)
        res = train_student_kd(anchor_ds, scfg, t_res.best_path
                               or _best_in(t_dir), cfg,
                               os.path.join(workdir, "kd_student"))
        out = _result(res)
        out["teacher_best"] = float(t_res.best_metric)
        return out

    raise ValueError(f"unknown recipe {kind!r}")


def _best_in(ckpt_dir: str) -> str:
    import glob
    paths = sorted(glob.glob(os.path.join(ckpt_dir, "best-*.msgpack")))
    assert paths, f"no checkpoint in {ckpt_dir}"
    return paths[-1]
