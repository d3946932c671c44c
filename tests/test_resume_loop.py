"""Full-state auto-resume wired through the teacher loop (beyond the
reference, which has no resume at all — "resume" there = reload best.pt and
re-run, trainer.py:718-764): a run killed at an epoch boundary continues
bit-exactly, including optimizer state, RNG stream, early-stop bookkeeping
and best-checkpoint tracking. Both state backends (msgpack, orbax async)."""
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

TINY = TeacherConfig(
    duett=DuettConfig(n_variables=6, n_timesteps=24, d_static=18,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=28, patch_size=14, d_model=32, n_layers=1,
                  n_heads=2, d_feedforward=64),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                              head_hidden=16))


@pytest.fixture(scope="module")
def anchor_data():
    ds = S.make_synthetic(seed=0, n_subjects=50, n_stays=120, n_variables=6,
                          min_len=26, max_len=40)
    meta = P.meta_from_events(ds, DataConfig())
    return P.build_anchor_dataset(ds, meta, DataConfig())


def _cfg(epochs):
    return TrainConfig(batch_size=16, epochs=epochs, patience=10,
                       dtype="float32", limit_batches=2,
                       eval_train_batches=0,
                       optim=OptimConfig(lr=1e-3, warmup_steps=2))


def _assert_histories_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.keys() == rb.keys()
        for k in ra:
            assert ra[k] == pytest.approx(rb[k], abs=1e-6), k


@pytest.mark.slow
def test_resume_is_bit_exact_vs_uninterrupted(anchor_data, tmp_path):
    labels = DataConfig().pathology_labels
    d_resume = str(tmp_path / "run")
    # phase 1: a 4-epoch job "preempted" after 2 epochs (same config — the
    # LR schedule spans all 4 epochs in every invocation)
    r1 = train_teacher(anchor_data, TINY, _cfg(4), d_resume, labels,
                       save_full_state=True, stop_after_epochs=2)
    assert len(r1.history) == 2
    # phase 2: restart — must continue at epoch 2
    r2 = train_teacher(anchor_data, TINY, _cfg(4), d_resume, labels,
                       auto_resume=True)
    assert len(r2.history) == 4
    _assert_histories_equal(r2.history[:2], r1.history)
    # control: the same 4 epochs uninterrupted
    r3 = train_teacher(anchor_data, TINY, _cfg(4), str(tmp_path / "ctl"),
                       labels)
    _assert_histories_equal(r2.history, r3.history)
    assert r2.best_metric == pytest.approx(r3.best_metric, abs=1e-6)


@pytest.mark.slow
def test_ssl_resume_bit_exact(tmp_path):
    from multimodal_edema_prediction_tpu.config import DuettConfig
    from multimodal_edema_prediction_tpu.data.sliding import \
        build_sliding_ssl_dataset
    from multimodal_edema_prediction_tpu.train.ssl_loop import train_ssl
    ds = S.make_synthetic(seed=0, n_subjects=50, n_stays=120, n_variables=6,
                          min_len=26, max_len=48)
    meta = P.meta_from_events(ds, DataConfig())
    ssl_ds = build_sliding_ssl_dataset(ds, meta, n_timesteps=24, stride=12)
    duett = DuettConfig(n_variables=6, n_timesteps=24, d_static=18,
                        d_embedding=8, n_layers=1, d_feedforward=32,
                        d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16,
                        pretrain_masked_steps=2)
    cfg = TrainConfig(batch_size=32, epochs=4, patience=10, dtype="float32",
                      seed=0, limit_batches=2)
    d = str(tmp_path / "ssl")
    r1 = train_ssl(ssl_ds, duett, cfg, d, lr=1e-3, warmup_steps=5,
                   save_full_state=True, stop_after_epochs=2)
    assert len(r1.history) == 2
    r2 = train_ssl(ssl_ds, duett, cfg, d, lr=1e-3, warmup_steps=5,
                   auto_resume=True)
    assert len(r2.history) == 4
    r3 = train_ssl(ssl_ds, duett, cfg, str(tmp_path / "ctl"), lr=1e-3,
                   warmup_steps=5)
    _assert_histories_equal(r2.history, r3.history)
    assert r2.best_metric == pytest.approx(r3.best_metric, abs=1e-6)


@pytest.mark.slow
def test_kd_resume_bit_exact(anchor_data, tmp_path):
    from multimodal_edema_prediction_tpu.config import StudentConfig
    from multimodal_edema_prediction_tpu.train.kd_loop import train_student_kd
    labels = DataConfig().pathology_labels
    t_res = train_teacher(anchor_data, TINY, _cfg(1),
                          str(tmp_path / "teacher"), labels)
    scfg = StudentConfig(duett=TINY.duett)
    d = str(tmp_path / "kd")
    r1 = train_student_kd(anchor_data, scfg, t_res.best_path, _cfg(4), d,
                          save_full_state=True, stop_after_epochs=2)
    assert len(r1.history) == 2
    r2 = train_student_kd(anchor_data, scfg, t_res.best_path, _cfg(4), d,
                          auto_resume=True)
    assert len(r2.history) == 4
    r3 = train_student_kd(anchor_data, scfg, t_res.best_path, _cfg(4),
                          str(tmp_path / "ctl"))
    _assert_histories_equal(r2.history, r3.history)
    assert r2.best_metric == pytest.approx(r3.best_metric, abs=1e-6)


@pytest.mark.slow
def test_sigterm_preemption_saves_state_and_resumes(anchor_data, tmp_path):
    """SIGTERM mid-training → the loop finishes the epoch, saves the full
    state (even without save_full_state), and a restart with auto_resume
    continues bit-exactly."""
    import os
    import signal
    import threading

    from multimodal_edema_prediction_tpu.utils import preemption
    labels = DataConfig().pathology_labels
    d = str(tmp_path / "run")
    preemption.clear()
    preemption.install_handler()
    # deliver a real SIGTERM shortly after training starts
    timer = threading.Timer(20.0, lambda: os.kill(os.getpid(),
                                                  signal.SIGTERM))
    timer.start()
    try:
        r1 = train_teacher(anchor_data, TINY, _cfg(4), d, labels)
    finally:
        timer.cancel()
        preemption.clear()
    assert 1 <= len(r1.history) < 4          # stopped early by the signal
    assert os.path.exists(os.path.join(d, "train_state.meta.json"))
    # restart continues from where the signal landed, to completion
    r2 = train_teacher(anchor_data, TINY, _cfg(4), d, labels,
                       auto_resume=True)
    assert len(r2.history) == 4
    _assert_histories_equal(r2.history[:len(r1.history)], r1.history)


@pytest.mark.slow
def test_resume_orbax_backend(anchor_data, tmp_path):
    labels = DataConfig().pathology_labels
    d = str(tmp_path / "orbax_run")
    r1 = train_teacher(anchor_data, TINY, _cfg(1), d, labels,
                       save_full_state=True, state_backend="orbax")
    r2 = train_teacher(anchor_data, TINY, _cfg(2), d, labels,
                       auto_resume=True, state_backend="orbax")
    assert len(r2.history) == 2
    _assert_histories_equal(r2.history[:1], r1.history)
    # the restored epoch-0 metrics came from disk, not recomputation
    assert np.isfinite(r2.best_metric)
