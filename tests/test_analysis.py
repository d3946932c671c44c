"""Analysis suite smoke+semantics tests: train a tiny teacher once, then run
every analysis CLI against its checkpoint."""
import json
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
    run_dir = str(tmp_path_factory.mktemp("teacher"))
    res = train_teacher(
        anchor_ds, TINY,
        TrainConfig(batch_size=32, epochs=2, patience=2, dtype="float32",
                    optim=OptimConfig(lr=2e-3, warmup_steps=5)),
        run_dir, DataConfig().pathology_labels)
    return res.best_path


def _flags(ckpt, out_dir, extra=()):
    return (["--ckpt", ckpt] if ckpt else []) + [
        "--synthetic_stays", "400", "--n_variables", "8",
        "--batch_size", "32", "--out_dir", out_dir, "--n_boot", "20",
    ] + list(extra)


@pytest.mark.slow
def test_diagnose_temporal_usage(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        diagnose_temporal_usage as D
    report = D.main(_flags(teacher_ckpt, str(tmp_path),
                           ["--max_batches", "3"]))
    assert set(D.CONDITIONS) <= set(report["conditions"])
    for cond in D.CONDITIONS[1:]:
        assert "mean_abs_dp_fus" in report["conditions"][cond]
    assert os.path.exists(tmp_path / "temporal_usage.json")
    # counterfactual TS must change the ts-branch logits
    assert report["conditions"]["patient_shuffle"]["mean_abs_dp_fus"] >= 0
    # raw prediction archive (reference --output_npz payload, :608-621)
    npz = np.load(tmp_path / "temporal_usage_predictions.npz",
                  allow_pickle=False)
    assert {"y", "mask", "img_full", "subject_ids"} <= set(npz.files)
    for cond in D.CONDITIONS:
        assert npz[f"fus_{cond}"].shape == npz["y"].shape


@pytest.mark.slow
def test_complementarity(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import complementarity as C
    result = C.main(_flags(teacher_ckpt, str(tmp_path)))
    rows = [r for r in result["per_label"] if r.get("n", 0) > 0]
    assert rows, "no labels analyzed"
    for r in rows:
        cells = (r["both_correct"] + r["image_only_correct"]
                 + r["ts_only_correct"] + r["both_wrong"])
        assert cells == r["n"]
        # Venn region counts decompose the positives exactly
        vc = r["venn_positives"]
        assert sum(vc.values()) == int(round(r["n"] * r["pos_frac"]))
    # Venn figures emitted for labels with positives (reference :305-341)
    import glob
    assert glob.glob(str(tmp_path / "venn_*.png"))
    # flat per-label CSV (reference :288-297)
    import csv
    with open(tmp_path / "complementarity.csv") as f:
        csv_rows = list(csv.DictReader(f))
    assert len(csv_rows) == len(result["per_label"])
    assert "label" in csv_rows[0]


@pytest.mark.slow
def test_unimodal_probe_and_feature_cache(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        unimodal_linear_probe as U
    cache = str(tmp_path / "feats.npz")
    results = U.main(_flags(teacher_ckpt, str(tmp_path),
                            ["--save_features", cache,
                             "--probe_steps", "60"]))
    assert os.path.exists(cache)
    for name in ("cxr_cls", "duett_rep", "duett_hourly_mean",
                 "duett_multiscale", "duett_attn_pool"):
        assert np.isfinite(results[name]["macro_auroc"])


@pytest.mark.slow
def test_logit_fusion_probe(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        logit_fusion_probe as L
    results = L.main(_flags(teacher_ckpt, str(tmp_path),
                            ["--probe_steps", "60"]))
    for kind in L.HEADS:
        assert np.isfinite(results[kind]["macro_auroc"])


@pytest.mark.slow
def test_residual_by_confidence(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        residual_by_confidence as R
    result = R.main(_flags(teacher_ckpt, str(tmp_path)))
    assert len(result["quartiles"]) >= 2


@pytest.mark.slow
def test_grad_flow_diagnostics(teacher_ckpt, tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        grad_flow_diagnostics as G
    r = G.main(_flags(teacher_ckpt, str(tmp_path), ["--n_batches", "2"]))
    # residual fusion: the fusion loss cannot reach the pixels (stop_gradient)
    assert r["fus_px_input_grad"] < 1e-5
    assert r["ts_query_grad_norm"] > 0
    assert np.isfinite(r["query_gram_gap"])
    # reference-depth report surface (grad_flow_diagnostics.py:575-608)
    K = len(r["per_label"])
    assert r["query_layout"] == "shared" and r["samples"] > 0
    for b in ("img", "ts", "fus"):
        item = r["branch"][b]
        assert np.isfinite(item["loss"]) and item["raw_grad_norm"] >= 0
        assert -1.001 <= item["cos_to_total_update"] <= 1.001
    c = r["pairwise_gradient_cosine"]
    assert 0.0 <= c["img_ts_negative_batch_fraction"] <= 1.0
    # trained ckpt: the correction head is non-zero, so the fusion loss
    # reaches the TS tokens; the stop-grad anchor blocks the image tokens
    s = r["fusion_token_sensitivity"]
    assert s["ts_raw"] > 0 and s["img_raw"] < 1e-7
    assert s["scaled_img_over_ts"] < 1e-6
    for item in r["per_label"]:
        assert 0.0 <= item["img_own_query_fraction"] <= 1.0 + 1e-6
        assert -1.001 <= item["img_ts_cos"] <= 1.001
        assert item["valid_samples"] >= 0
    g = r["query_geometry"]
    assert np.asarray(g["raw_cosine"]).shape == (K, K)
    assert np.asarray(g["image_effective_cosine"]).shape == (K, K)
    assert np.isfinite(g["image_ts_gram_gap"])
    # artifacts (reference :821-828)
    assert (tmp_path / "grad_flow_report.txt").exists()
    assert (tmp_path / "grad_flow_report.json").exists()
    # the wandb flattener covers the new keys
    ld = G.diagnostics_to_log_dict(r)
    assert any(k.endswith("/cos_to_total_update") for k in ld)
    assert all(np.isfinite(v) for v in ld.values())


@pytest.mark.slow
def test_complementarity_feature_cache_parity(teacher_ckpt, tmp_path):
    """--cxr_feature_cache must not change the analysis: the cached
    (CLS, patch) tokens are the same frozen-ViT outputs the pixel path
    computes in-step, so per-label contingency tables agree."""
    from multimodal_edema_prediction_tpu.analysis import complementarity as C
    px = C.main(_flags(teacher_ckpt, str(tmp_path / "px")))
    ft = C.main(_flags(teacher_ckpt, str(tmp_path / "ft"),
                       ["--cxr_feature_cache", "hbm"]))
    for r_px, r_ft in zip(px["per_label"], ft["per_label"]):
        assert r_px["n"] == r_ft["n"]
        # same frozen-ViT outputs; only near-tie threshold flips allowed
        for k in ("img_acc", "ts_acc", "fus_acc"):
            if r_px["n"]:
                assert abs(r_px[k] - r_ft[k]) < 0.02, (r_px["label"], k)


def test_grad_flow_rejects_feature_cache(tmp_path):
    """Pixel-gradient diagnostics (px_input_grad) need real pixels; the
    encode-once flag must fail loudly, not silently change semantics.
    (Rejection fires before the checkpoint is touched.)"""
    from multimodal_edema_prediction_tpu.analysis import \
        grad_flow_diagnostics as G
    with pytest.raises(SystemExit):
        G.main(_flags(str(tmp_path / "unused.msgpack"), str(tmp_path),
                      ["--cxr_feature_cache", "hbm"]))


def test_trajectory_availability(tmp_path):
    from multimodal_edema_prediction_tpu.analysis import \
        trajectory_availability as T
    result = T.main(["--synthetic_stays", "100", "--n_variables", "8",
                     "--out_dir", str(tmp_path), "--max_samples", "200"])
    assert result["verdict"] in {"SPARSE", "TRAJECTORY-RICH"}
    assert len(result["per_var"]) == 8
