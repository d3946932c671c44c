"""SSL pretraining and KD distillation: loss decreases, contract artifacts,
teacher→student rebuild from checkpoint config."""
import os

import jax
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    StudentConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.sliding import \
    build_sliding_ssl_dataset
from multimodal_edema_prediction_tpu.train.kd_loop import train_student_kd
from multimodal_edema_prediction_tpu.train.ssl_loop import (train_ssl,
                                                            transplant_encoder)
from multimodal_edema_prediction_tpu.train.teacher_loop import train_teacher

DUETT = DuettConfig(n_variables=8, n_timesteps=24, d_static=18, d_embedding=8,
                    n_layers=1, d_feedforward=32, d_hidden_mlp_embedding=16,
                    d_hidden_tab_encoder=16, pretrain_masked_steps=2)


@pytest.fixture(scope="module")
def data():
    ds = S.make_synthetic(seed=0, n_subjects=120, n_stays=300, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    return ds, meta


@pytest.mark.slow
def test_ssl_pretrain_reduces_loss_and_saves_meta(data, tmp_path):
    ds, meta = data
    ssl_ds = build_sliding_ssl_dataset(ds, meta, n_timesteps=24, stride=12)
    cfg = TrainConfig(batch_size=32, epochs=3, patience=3, dtype="float32",
                      seed=0)
    res = train_ssl(ssl_ds, DUETT, cfg, str(tmp_path / "ssl"), lr=1e-3,
                    warmup_steps=20)
    assert res.history[-1]["val_loss"] < res.history[0]["val_loss"] * 1.05
    assert np.isfinite(res.best_metric)
    # best ckpt = MIN val loss (regression: a double sign inversion once
    # made the tracker keep the WORST epoch; the reference selects min
    # val_loss, train_duett_ssl.py:188-196)
    assert res.best_metric == pytest.approx(
        min(h["val_loss"] for h in res.history), abs=1e-6)
    assert os.path.exists(str(tmp_path / "ssl" / "meta_with_stats.pkl"))

    # encoder transplant into a fresh student
    from multimodal_edema_prediction_tpu.models.student import StudentModel
    import jax.numpy as jnp
    student = StudentModel(StudentConfig(duett=DUETT))
    v = student.init(jax.random.key(0), jnp.zeros((2, 24, 17)),
                     jnp.zeros((2, 18)), jnp.zeros((2, 24)))
    new_params, enc_stats, changed = transplant_encoder(res.best_path,
                                                        v["params"])
    # backbone weights must equal the SSL checkpoint's encoder
    from multimodal_edema_prediction_tpu.train.checkpoint import \
        load_checkpoint
    enc = load_checkpoint(res.best_path)["params"]["encoder"]
    a = np.asarray(new_params["duett"]["tab_encoder"]["in"]["kernel"])
    b = np.asarray(enc["tab_encoder"]["in"]["kernel"])
    np.testing.assert_allclose(a, b)


@pytest.mark.slow
def test_teacher_to_student_kd(data, tmp_path):
    ds, meta = data
    anchor_ds = P.build_anchor_dataset(ds, meta, DataConfig())
    tiny_teacher = TeacherConfig(
        duett=DUETT,
        vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                      n_heads=2, d_feedforward=64),
        perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                                  dropout=0.1, head_hidden=16))
    tcfg = TrainConfig(batch_size=32, epochs=2, patience=2, dtype="float32",
                       optim=OptimConfig(lr=2e-3, warmup_steps=5))
    t_res = train_teacher(anchor_ds, tiny_teacher, tcfg,
                          str(tmp_path / "teacher"),
                          DataConfig().pathology_labels)

    scfg = TrainConfig(batch_size=32, epochs=2, patience=2, dtype="float32",
                       optim=OptimConfig(lr=2e-3, warmup_steps=5))
    s_res = train_student_kd(anchor_ds, StudentConfig(duett=DUETT),
                             t_res.best_path, scfg, str(tmp_path / "student"))
    assert np.isfinite(s_res.best_metric)
    assert s_res.best_metric > 0.5
    # KD loss components were tracked
    assert "train_kd" in s_res.history[0]
    assert "train_bce" in s_res.history[0]
