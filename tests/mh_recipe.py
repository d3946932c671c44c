"""Shared tiny teacher recipe for the multi-host equivalence test.

Imported both by the 2-process workers (``mh_worker.py``) and by the
single-process reference run in ``test_multihost_2proc.py``; any drift
between multi-host and single-host execution of the SAME recipe shows up as
a metric mismatch.
"""
import tempfile


def run_recipe() -> dict:
    from multimodal_edema_prediction_tpu.config import (
        DataConfig, DuettConfig, OptimConfig, PerceiverConfig, TeacherConfig,
        TrainConfig, ViTConfig)
    from multimodal_edema_prediction_tpu.data import pipeline as P
    from multimodal_edema_prediction_tpu.data import synthetic as S
    from multimodal_edema_prediction_tpu.train.teacher_loop import \
        train_teacher

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
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    anchor_ds = P.build_anchor_dataset(ds, meta, DataConfig())

    with tempfile.TemporaryDirectory() as ckpt_dir:
        res = train_teacher(anchor_ds, tcfg, cfg, ckpt_dir,
                            DataConfig().pathology_labels,
                            prefetch_depth=2)
    return {
        "best_metric": float(res.best_metric),
        "test_auroc": float(res.test_metrics["main_auroc"]),
        "history": [{"epoch": h["epoch"],
                     "train_total": float(h["train_total"]),
                     "val_main_auroc": float(h["val_main_auroc"])}
                    for h in res.history],
    }
