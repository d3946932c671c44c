"""End-to-end L0: raw MIMIC-IV-layout tables → artifacts → training.

The reference's offline preprocessing is six pandas notebooks that have
only ever run on credentialed PHI. This test executes this repo's
orchestrated equivalent (:mod:`multimodal_edema_prediction_tpu.data.
raw_mimic` / ``cli/preprocess.py``) on a synthetic directory laid out like
a raw MIMIC-IV + MIMIC-CXR download, then checks stage semantics against
the notebook rules (groundwork cells 36-252, input_preprocess cells 71-94,
cxr_db cells 19-53) and finally trains a tiny teacher on the produced
cohort — proving raw-layout → cohort.npz → jitted training executes with
no gaps. Only the real data is absent.
"""
import os

import numpy as np
import pandas as pd
import pytest

from multimodal_edema_prediction_tpu.data import raw_mimic as rm

from multimodal_edema_prediction_tpu.data.synthetic_raw import \
    make_raw_layout  # moved to product code (scripts/e2e_rehearsal.sh)


@pytest.fixture(scope="module")
def l0_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw"))
    out = str(tmp_path_factory.mktemp("cohort"))
    make_raw_layout(root)
    paths = rm.run_l0(root, out)
    return root, out, paths


def _load_frame(paths, name):
    p = paths[name]
    return pd.read_feather(p) if p.endswith(".ftr") else pd.read_pickle(p)


def test_artifacts_written(l0_run):
    _, out, paths = l0_run
    for k in ("static_full", "final_df", "final_cxr_df", "cohort", "meta"):
        assert os.path.exists(paths[k]), k


def test_variable_set_is_the_reference_34(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    assert len(rm.ALL_VARS) == 34
    for v, c in zip(rm.ALL_VARS, rm.ALL_COUNTS):
        assert v in final_df.columns, v
        assert c in final_df.columns, c
    # dropped sparse/duplicate variables must NOT resurface
    for v in ("Brain Natiuretic Peptide", "d-dimer", "hematocrit",
              "sbp", "dbp"):
        assert v not in final_df.columns


def test_fahrenheit_converted(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    obs = final_df[final_df["count_temperature"] > 0]["temperature"]
    assert len(obs) > 0
    # 98.6 °F = 37 °C; all charted temps were Fahrenheit
    assert obs.between(36.5, 38.5).all()


def test_fio2_percent_and_spo2_fio2(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    fio2 = final_df[final_df["count_fio2"] > 0]["fio2"]
    assert (fio2 == 40.0).all()          # 0.40 fraction → 40 %
    sf = final_df[final_df["count_spo2_fio2"] > 0]["spo2_fio2"]
    assert len(sf) > 0
    np.testing.assert_allclose(sf, 96.0 / 0.40, rtol=1e-6)


def test_outlier_heart_rate_dropped(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    hr = final_df[final_df["count_heart_rate"] > 0]["heart_rate"]
    assert hr.max() < 300.0


def test_ward_lab_backfills_slot0(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    # creatinine was ONLY drawn 6 h pre-ICU → appears at slot 0 with count 1
    slot0 = final_df[(final_df["slot_idx"] == 0)
                     & (final_df["count_creatinine"] > 0)]
    assert len(slot0) > 0
    assert (slot0["count_creatinine"] == 1).all()
    assert (final_df[final_df["slot_idx"] > 0]["count_creatinine"]
            == 0).all()


def test_map_derived_from_sbp_dbp(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    bp = final_df[final_df["count_map"] > 0]
    assert len(bp) > 0
    # only sbp/dbp were charted → MAP = (sbp + 2·dbp)/3 ∈ plausible band
    assert bp["map"].between(70, 100).all()


def test_gcs_summed_triples(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    gcs = final_df[final_df["count_gcs"] > 0]["gcs"]
    assert (gcs == 15.0).all()           # 4 + 5 + 6


def test_fluid_distribution_and_unit_fix(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    # subject 0 charted 1 L; unit fix → 1000 ml over 4 h ⇒ 250 ml/slot
    s0 = final_df[final_df["stay_id"] == 1000]
    infusion = s0[(s0["slot_idx"] >= 2) & (s0["slot_idx"] < 6)]
    np.testing.assert_allclose(infusion["fluid_cumul"], 250.0, rtol=1e-6)
    # the bolus lands entirely in its containing slot
    bolus = s0[s0["slot_idx"] == 10]
    np.testing.assert_allclose(bolus["fluid_cumul"], 250.0, rtol=1e-6)


def test_urine_present(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    assert (final_df["count_urine"] > 0).any()
    assert (final_df["urine"] >= 0).all()


def test_lateral_views_filtered_and_anchors_assigned(l0_run):
    _, _, paths = l0_run
    final_df = _load_frame(paths, "final_df")
    cxr_df = _load_frame(paths, "final_cxr_df")
    assert set(cxr_df["ViewPosition"]) <= {"AP", "PA"}
    anchors = final_df[final_df["cxr_flag"] == 1]
    assert not anchors["dicom_id"].str.endswith("_2").any()   # laterals out
    # both in-stay frontal images got slots; the anchor one sits at 30
    assert (anchors["slot_idx"] == 30).sum() > 0


def test_cxlseg_lung_mask_joined(l0_run):
    """cxr_db cells 2-8 + 30: the CXLSeg-mask table left-joins
    lung_mask_path (with the <root>/cxr/lung_mask/ prefix) onto the
    catalog; PA rows have no synthetic mask → has_lung_mask=False."""
    root, _, paths = l0_run
    cxr_df = _load_frame(paths, "final_cxr_df")
    assert "lung_mask_path" in cxr_df.columns
    ap = cxr_df[cxr_df["ViewPosition"] == "AP"]
    pa = cxr_df[cxr_df["ViewPosition"] == "PA"]
    assert ap["has_lung_mask"].all()
    assert not pa["has_lung_mask"].any()
    p0 = ap["lung_mask_path"].iloc[0]
    assert p0.startswith(os.path.join(root, "cxr", "lung_mask"))
    assert p0.endswith(".png")


def test_death_label(l0_run):
    _, _, paths = l0_run
    static_df = _load_frame(paths, "static_full")
    dead = static_df[static_df["subject_id"] == 11]
    assert (dead["death_adm"] == 1).all()
    assert (static_df[static_df["subject_id"] != 11]["death_adm"] == 0).all()


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_cohort_trains_end_to_end(l0_run):
    """The produced cohort flows through load_artifacts →
    build_anchor_dataset → the jitted supervised training loop with finite
    losses — raw CSVs to TPU-style training with no manual glue."""
    from multimodal_edema_prediction_tpu.config import (DataConfig,
                                                        DuettConfig,
                                                        OptimConfig,
                                                        StudentConfig,
                                                        TrainConfig)
    from multimodal_edema_prediction_tpu.data.ingest import load_artifacts
    from multimodal_edema_prediction_tpu.data import pipeline as P
    from multimodal_edema_prediction_tpu.train.loops import (
        train_supervised_ts)

    _, out, _ = l0_run
    cfg = DataConfig()
    ds, meta = load_artifacts(out, cfg)
    ads = P.build_anchor_dataset(ds, meta, cfg)
    assert sum(len(v) for v in ads.splits.values()) > 0

    duett = DuettConfig(n_variables=meta.n_variables, n_timesteps=24,
                        d_static=meta.d_static, d_embedding=8, n_layers=1,
                        d_feedforward=32, d_hidden_mlp_embedding=16,
                        d_hidden_tab_encoder=16)
    mcfg = StudentConfig(duett=duett, head_hidden=16)
    tcfg = TrainConfig(batch_size=8, epochs=1, patience=2, dtype="float32",
                       optim=OptimConfig(lr=1e-3, warmup_steps=2,
                                         weight_decay=1e-4))
    res = train_supervised_ts(ads, mcfg, tcfg,
                              str(os.path.join(out, "run")))
    assert len(res.history) >= 1
