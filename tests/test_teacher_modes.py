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
