"""CLI layer end-to-end: tiny runs through the argparse entry points."""
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_train_ssl_cli(tmp_path):
    from multimodal_edema_prediction_tpu.cli import train_ssl
    res = train_ssl.main([
        "--synthetic_stays", "120", "--n_variables", "8",
        "--d_embedding", "8", "--n_duett_layers", "1",
        "--batch_size", "32", "--epochs", "2", "--patience", "2",
        "--mixed_precision", "no", "--ssl_warmup", "20",
        "--ckpt_dir", str(tmp_path)])
    assert np.isfinite(res.best_metric)
    run_dirs = os.listdir(tmp_path)
    assert len(run_dirs) == 1
    assert os.path.exists(tmp_path / run_dirs[0] / "config.json")
    assert os.path.exists(tmp_path / run_dirs[0] / "meta_with_stats.pkl")


@pytest.mark.slow
def test_train_teacher_then_student_cli(tmp_path):
    from multimodal_edema_prediction_tpu.cli import train_student, \
        train_teacher
    t_res = train_teacher.main([
        "--synthetic_stays", "250", "--n_variables", "8",
        "--d_embedding", "8", "--n_duett_layers", "1", "--d_latent", "32",
        "--head_hidden", "16", "--vit_size", "tiny",
        "--batch_size", "32", "--epochs", "1", "--patience", "1",
        "--mixed_precision", "no", "--warmup_steps", "5",
        "--ckpt_dir", str(tmp_path / "teacher")])
    assert np.isfinite(t_res.best_metric)

    s_res = train_student.main([
        "--teacher_ckpt", t_res.best_path,
        "--synthetic_stays", "250", "--n_variables", "8",
        "--d_embedding", "8", "--n_duett_layers", "1",
        "--batch_size", "32", "--epochs", "1", "--patience", "1",
        "--mixed_precision", "no", "--warmup_steps", "5",
        "--ckpt_dir", str(tmp_path / "student")])
    assert np.isfinite(s_res.best_metric)


@pytest.mark.slow
def test_finetune_mimic_cli(tmp_path):
    """SSL → MIMIC supervised finetune chain through the argparse entry
    points (reference duett/train_duett_ssl.py → train_duett_finetune.py)."""
    from multimodal_edema_prediction_tpu.cli import finetune_mimic, train_ssl
    ssl_res = train_ssl.main([
        "--synthetic_stays", "120", "--n_variables", "8",
        "--d_embedding", "8", "--n_duett_layers", "1",
        "--batch_size", "32", "--epochs", "1", "--patience", "1",
        "--mixed_precision", "no", "--ssl_warmup", "20",
        "--ckpt_dir", str(tmp_path / "ssl")])
    summary = finetune_mimic.main([
        "--ssl_ckpt", ssl_res.best_path,
        "--synthetic_stays", "120", "--n_variables", "8",
        "--d_embedding", "8", "--n_duett_layers", "1",
        "--batch_size", "32", "--epochs", "2", "--patience", "2",
        "--seeds", "0", "1", "--top_k", "2",
        "--ckpt_dir", str(tmp_path / "ft")])
    assert np.isfinite(summary["test_auroc_mean"])
    assert len(summary["per_seed"]) == 2


def test_run_dir_never_overwrites(tmp_path):
    from multimodal_edema_prediction_tpu.cli.common import make_run_dir
    from multimodal_edema_prediction_tpu.config import TrainConfig
    cfg = TrainConfig()
    d1 = make_run_dir(str(tmp_path), cfg)
    assert os.path.isdir(d1)
    # same config within the same second must not clobber (exist_ok=False)
    import pytest as _pytest
    with _pytest.raises(FileExistsError):
        os.makedirs(d1, exist_ok=False)
