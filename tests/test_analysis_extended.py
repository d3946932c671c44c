"""Extended analysis + CXR-head pipeline tests (shared tiny teacher)."""
import os

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
    duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                  n_heads=2, d_feedforward=64),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                              dropout=0.1, head_hidden=16))


@pytest.fixture(scope="module")
def teacher_ckpt(tmp_path_factory):
    ds = S.make_synthetic(seed=0, n_subjects=130, n_stays=400, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    anchor_ds = P.build_anchor_dataset(ds, meta, DataConfig())
    res = train_teacher(
        anchor_ds, TINY,
        TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                    optim=OptimConfig(lr=2e-3, warmup_steps=5)),
        str(tmp_path_factory.mktemp("teacher")),
        DataConfig().pathology_labels)
    return res.best_path


def _flags(ckpt, out_dir, extra=()):
    return (["--ckpt", ckpt] if ckpt else []) + [
        "--synthetic_stays", "400", "--n_variables", "8",
        "--batch_size", "32", "--out_dir", out_dir, "--n_boot", "10",
    ] + list(extra)


@pytest.mark.slow
def test_conditional_information_probe(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        conditional_information_probe as C
    # default --label_idx -1 sweeps ALL labels; results keyed per label
    results = C.main(_flags(teacher_ckpt, str(tmp_path),
                            ["--n_perm", "5", "--label_idx", "0"]))
    assert list(results.keys()) == ["label_edema"]
    for name in C.PROBES[1:]:
        r = results["label_edema"][name]
        assert r["evidence"] in {"supported", "suggestive", "not_detected"}
        assert np.isfinite(r["p_conditional_perm"])
    # reference file outputs (:575-582): CSV + per-sample probabilities
    import csv
    with open(tmp_path / "conditional_probe.csv") as f:
        rows = list(csv.DictReader(f))
    assert {r["probe"] for r in rows} == set(C.PROBES)
    npz = np.load(tmp_path / "conditional_probe_predictions.npz")
    assert "label_edema_y" in npz.files
    p = npz["label_edema_image_cal_probability"]
    assert p.shape == npz["label_edema_y"].shape
    assert np.all((p >= 0) & (p <= 1))


@pytest.mark.slow
def test_conditional_probe_all_labels(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        conditional_information_probe as C
    from multimodal_edema_prediction_tpu.config import \
        DEFAULT_PATHOLOGY_LABELS
    results = C.main(_flags(teacher_ckpt, str(tmp_path),
                            ["--n_perm", "2", "--n_boot", "5"]))
    assert set(results.keys()) == set(DEFAULT_PATHOLOGY_LABELS)


@pytest.mark.slow
def test_visualize_pathology_artifacts(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        visualize_pathology as V
    V.main(_flags(teacher_ckpt, str(tmp_path), ["--max_batches", "3"]))
    for fname in ("ts_attention_heatmap.png", "query_cosine.png",
                  "gap_summary.png", "gap_summary.csv", "query_cosine.csv",
                  "stage4_projection.png"):
        assert os.path.exists(tmp_path / fname), fname


@pytest.mark.slow
def test_trajectory_probe_trains(tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        train_trajectory_probe as T
    result = T.main(["--synthetic_stays", "300", "--n_variables", "8",
                     "--batch_size", "32", "--out_dir", str(tmp_path),
                     "--epochs", "3", "--d_model", "32"])
    assert np.isfinite(result["test_macro_auroc"])
    assert result["val_macro_auroc"] > 0.45
    # best-probe checkpoint + test metrics file (reference :351-358, :378)
    from flax import serialization
    import os
    ckpt = tmp_path / "trajectory_probe_best.msgpack"
    assert os.path.exists(ckpt) and os.path.exists(
        tmp_path / "test_metrics.json")
    blob = open(ckpt, "rb").read()
    restored = serialization.msgpack_restore(blob)
    assert "encoder" in restored and "pathology_queries" in restored


@pytest.mark.slow
def test_cxr_head_pipeline_and_why_multimodal(tmp_path):
    from multimodal_edema_prediction_tpu.cli import train_cxr_head as H
    result = H.main(["--synthetic_stays", "200", "--vit_size", "tiny",
                     "--epochs", "30", "--ckpt_dir", str(tmp_path / "head"),
                     "--feature_cache", str(tmp_path / "cls.npz")])
    assert result["best_val_macro_auroc"] > 0.5   # images carry labels
    assert os.path.exists(result["ckpt_path"])
    assert os.path.exists(tmp_path / "cls.npz")

    # artifact consumable by the dual teacher
    import jax
    import jax.numpy as jnp
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.train.cxr_head_loop import \
        load_cxr_head_into_teacher
    from multimodal_edema_prediction_tpu.config import \
        DEFAULT_PATHOLOGY_LABELS
    # ViT must match the head's feature dim (CLI tiny ViT: d_model=64)
    cfg = TINY.replace(
        perceiver_type="dual", d_img=64,
        vit=ViTConfig(image_size=56, patch_size=14, d_model=64, n_layers=2,
                      n_heads=2, d_feedforward=128))
    model = TeacherModel(cfg)
    B, T, V = 4, 24, 8
    args = (jnp.zeros((B, T, 2 * V + 1)), jnp.zeros((B, 18)),
            jnp.zeros((B, T)), jnp.zeros((B, 56, 56, 3)))
    vars_ = model.init(jax.random.key(0), *args, keep_idx=jnp.arange(7))
    params, keep_idx = load_cxr_head_into_teacher(
        result["ckpt_path"], vars_["params"], DEFAULT_PATHOLOGY_LABELS)
    out = model.apply({"params": params,
                       "batch_stats": vars_["batch_stats"]},
                      *args, keep_idx=jnp.asarray(keep_idx))
    assert out["fusion_logits"].shape == (B, 7)

    # ICU-hardness decomposition on the head
    from multimodal_edema_prediction_tpu.analysis import \
        why_we_need_multimodal as W
    r = W.main(["--head_ckpt", result["ckpt_path"], "--vit_size", "tiny",
                "--synthetic_stays", "200", "--out_dir", str(tmp_path),
                "--batch_size", "32"])
    assert r["G0_all"]["n"] == (r["G1_non_icu"]["n"]
                                + r["G2_icu_unanchored"]["n"]
                                + r["G3_icu_anchor"]["n"])
    # reference-parity artifacts (analysis/why_we_need_multimodal.py:295-416)
    for fname in ("icu_hardness_summary.json", "icu_hardness_table_main.csv",
                  "icu_hardness_table_7label.csv", "icu_hardness_macro.png",
                  "icu_hardness_per_label_main.png",
                  "icu_hardness_per_label_7label.png"):
        assert os.path.exists(tmp_path / fname), fname
    import csv as _csv
    with open(tmp_path / "icu_hardness_table_7label.csv") as f:
        rows = list(_csv.DictReader(f))
    assert {r_["group"] for r_ in rows} == {
        "G0_all", "G1_non_icu", "G2_icu_unanchored", "G3_icu_anchor"}
    assert any(r_["label"] == "MACRO" for r_ in rows)


def test_offset_correction_null_wins_on_noise():
    """Pure-noise features: the exact-null candidate must win the inner CV
    (the probe cannot claim TS signal by overfitting)."""
    from multimodal_edema_prediction_tpu.analysis import \
        raw_trajectory_conditional_probe as R
    rng = np.random.default_rng(0)
    N, F = 2000, 12    # large N: spurious OOF gains shrink below tolerance
    X = rng.normal(size=(N, F))
    offset = rng.normal(size=N)
    y = (rng.random(N) < 1 / (1 + np.exp(-offset))).astype(np.float32)
    corr = R.fit_offset_correction(X, y, offset, seed=0)
    assert corr.null_selected
    assert np.all(corr.weights == 0.0)
    # and the signal case: features that ARE the residual signal win
    z = rng.normal(size=N)
    y2 = (rng.random(N) < 1 / (1 + np.exp(-(offset + 2 * z)))).astype(
        np.float32)
    X2 = np.concatenate([z[:, None], rng.normal(size=(N, F - 1))], axis=1)
    corr2 = R.fit_offset_correction(X2, y2, offset, seed=0)
    assert not corr2.null_selected
    assert "null" in corr2.cv_results and len(corr2.cv_results) == 1 + len(
        R.L2_GRID)


@pytest.mark.slow
def test_raw_trajectory_probe_all_labels(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        raw_trajectory_conditional_probe as R
    from multimodal_edema_prediction_tpu.config import \
        DEFAULT_PATHOLOGY_LABELS
    results = R.main(_flags(teacher_ckpt, str(tmp_path),
                            ["--n_perm", "2", "--n_boot", "5"]))
    assert set(results.keys()) == set(DEFAULT_PATHOLOGY_LABELS)
    r = results["label_edema"]["offset_logistic"]
    assert "inner_cv_bce" in r and "null" in r["inner_cv_bce"]
    assert r["evidence"] in {"supported", "suggestive", "not_detected"}


@pytest.mark.slow
def test_analysis_on_real_jpegs(teacher_ckpt, tmp_path):
    """--cxr_jpeg_root drives an analysis script on REAL decoded JPEGs
    (VERDICT round-1 item 5): writes one jpg per anchor image_id, runs
    residual_by_confidence end-to-end through the native decode hook."""
    import io
    from PIL import Image
    import argparse
    from multimodal_edema_prediction_tpu.analysis import \
        residual_by_confidence as RBC
    from multimodal_edema_prediction_tpu.analysis.common import \
        load_analysis_data

    # the EXACT dataset the analysis CLI will rebuild from these flags
    ns = argparse.Namespace(data_dir="", synthetic_stays=400, n_variables=8)
    _, _, ads, _ = load_analysis_data(ns)
    jpg_dir = tmp_path / "jpegs"
    jpg_dir.mkdir()
    rng = np.random.default_rng(0)
    for img_id in np.unique(ads.anchor["image_ids"]):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(jpg_dir / f"{int(img_id)}.jpg")

    out = RBC.main(_flags(teacher_ckpt, str(tmp_path / "out"),
                          ["--cxr_jpeg_root", str(jpg_dir)]))
    assert out is not None
