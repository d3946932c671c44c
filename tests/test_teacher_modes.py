"""All four teacher modes train end-to-end through the unified loop."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.train.teacher_loop import train_teacher

BASE = TeacherConfig(
    duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                  n_heads=2, d_feedforward=64),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                              head_hidden=16))


@pytest.fixture(scope="module")
def anchor_ds():
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    return P.build_anchor_dataset(ds, meta, DataConfig())


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["single", "legacy"])
def test_mode_trains_one_epoch(anchor_ds, mode, tmp_path):
    cfg = TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                      optim=OptimConfig(lr=1e-3, warmup_steps=5))
    res = train_teacher(anchor_ds, BASE.replace(perceiver_type=mode), cfg,
                        str(tmp_path), DataConfig().pathology_labels)
    assert np.isfinite(res.best_metric)
    assert np.isfinite(res.test_metrics["main_auroc"])
    assert res.best_path.endswith(".msgpack")


@pytest.mark.slow
def test_log_every_step_metrics(anchor_ds, tmp_path):
    """--log_every emits per-step scalars ONLY when a wandb sink is live
    (the default path must stay free of per-step host syncs)."""
    from multimodal_edema_prediction_tpu.utils.logging import Logger

    class _Sink:
        def __init__(self):
            self.rows = []

        def log(self, data, step=None):
            self.rows.append((step, data))

    cfg = TrainConfig(batch_size=16, epochs=1, patience=1, dtype="float32",
                      limit_batches=4, log_every=2,
                      optim=OptimConfig(lr=1e-3, warmup_steps=2))
    log = Logger("t")
    log._wb = _Sink()
    res = train_teacher(anchor_ds, BASE, cfg, str(tmp_path / "a"),
                        DataConfig().pathology_labels, logger=log)
    assert np.isfinite(res.best_metric)
    step_rows = [(s, d) for s, d in log._wb.rows
                 if any(k.startswith("train_step/") for k in d)]
    assert [s for s, _ in step_rows] == [2, 4]       # 4 steps, every 2nd
    assert all(np.isfinite(v) for _, d in step_rows for v in d.values())
    # (the sink-less sync-free path is what every other loop test runs)
