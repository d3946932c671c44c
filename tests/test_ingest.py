"""Ingest: reference pandas frames → columnar tables → npz round trip →
anchor dataset build (the real-data on-ramp, end to end on fabricated
frames matching the reference column contract)."""
import numpy as np
import pandas as pd
import pytest

from multimodal_edema_prediction_tpu.config import (DEFAULT_PATHOLOGY_LABELS,
                                                    DataConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data.ingest import (IngestedDataset,
                                                         from_reference_frames,
                                                         load_npz, save_npz)
from multimodal_edema_prediction_tpu.data.meta import Meta

LABELS = list(DEFAULT_PATHOLOGY_LABELS)


def _fabricate_frames(rng, n_stays=30, V=4, T=40):
    """Frames with the reference's column contract (final_df / static_full /
    final_cxr_df — data_processing.py:137-214, mimic_dataset.py:33-53)."""
    var_names = [f"var_{i}" for i in range(V)]
    count_cols = [f"count_var_{i}" for i in range(V)]
    rows = []
    stay_ids = np.arange(100, 100 + n_stays)
    subj_of_stay = rng.integers(0, 12, n_stays)
    for s, sid in enumerate(stay_ids):
        for t in range(T):
            if rng.random() < 0.5:
                continue
            r = {"stay_id": sid, "subject_id": subj_of_stay[s],
                 "slot_idx": t, "cxr_flag": 0, "study_id": 0, "dicom_id": "",
                 "hadm_id": 0}
            for v, c in zip(var_names, count_cols):
                observed = rng.random() < 0.6
                r[v] = rng.normal() if observed else np.nan
                r[c] = rng.integers(1, 4) if observed else 0
            for lbl in LABELS:
                r[lbl] = np.nan
            rows.append(r)
        # one CXR anchor row per stay at slot >= 24 when possible
        if T > 25:
            t = int(rng.integers(24, T))
            r = {"stay_id": sid, "subject_id": subj_of_stay[s],
                 "slot_idx": t, "cxr_flag": 1, "study_id": 7,
                 "dicom_id": f"d{s}", "hadm_id": 1}
            for v, c in zip(var_names, count_cols):
                r[v], r[c] = np.nan, 0
            for lbl in LABELS:
                r[lbl] = float(rng.integers(0, 2)) \
                    if rng.random() > 0.2 else np.nan
            if np.isnan(r[LABELS[0]]):
                r[LABELS[0]] = 1.0
            rows.append(r)
    final_df = pd.DataFrame(rows)

    static_df = pd.DataFrame({
        "stay_id": stay_ids, "subject_id": subj_of_stay,
        "age_at_intime": rng.uniform(30, 90, n_stays),
        "onehot_a": rng.integers(0, 2, n_stays).astype(float),
        "onehot_b": rng.integers(0, 2, n_stays).astype(float),
        "death_adm": rng.integers(0, 2, n_stays).astype(float)})

    cat = pd.DataFrame({
        "subject_id": np.r_[subj_of_stay, rng.integers(0, 12, 40)],
        "dicom_id": [f"c{i}" for i in range(n_stays + 40)]})
    for lbl in LABELS:
        cat[lbl] = rng.integers(0, 2, len(cat)).astype(float)
    return final_df, static_df, cat, var_names, count_cols


@pytest.fixture(scope="module")
def ingested(tmp_path_factory):
    rng = np.random.default_rng(0)
    final_df, static_df, cat, var_names, count_cols = _fabricate_frames(rng)
    meta = Meta(all_vars=tuple(var_names),
                all_counts=tuple(count_cols),
                onehot_static=("onehot_a", "onehot_b"),
                d_static=3, label_col="death_adm", n_timesteps=24,
                means=np.zeros(len(var_names), np.float32),
                stds=np.ones(len(var_names), np.float32),
                age_mean=60.0, age_std=15.0)
    ds = from_reference_frames(final_df, static_df, cat, meta,
                               DEFAULT_PATHOLOGY_LABELS)
    return ds, meta, final_df


def test_frames_convert_to_columnar(ingested):
    ds, meta, final_df = ingested
    assert len(ds.events.stay_ids) == 30
    assert ds.events.values.shape[1] == 4
    # only observed slots kept
    assert (ds.events.counts.sum(axis=1) > 0).all()
    # anchors = cxr_flag==1 rows
    assert len(ds.anchors.subject_ids) == (final_df["cxr_flag"] == 1).sum()
    assert len(ds.cxr_catalog.subject_ids) == 70


def test_npz_round_trip(ingested, tmp_path):
    ds, _, _ = ingested
    p = str(tmp_path / "cohort.npz")
    save_npz(p, ds)
    ds2 = load_npz(p)
    np.testing.assert_array_equal(ds2.events.values, ds.events.values)
    np.testing.assert_array_equal(ds2.events.offsets, ds.events.offsets)
    np.testing.assert_array_equal(ds2.anchors.labels, ds.anchors.labels)
    assert ds2.var_names == ds.var_names


def test_ingested_builds_anchor_dataset(ingested):
    ds, meta, _ = ingested
    ads = P.build_anchor_dataset(ds, meta, DataConfig())
    total = sum(len(v) for v in ads.splits.values())
    assert total == len(ads.anchor["y"]) > 0
    b = next(ads.iter_batches("train", 4, shuffle=False))
    assert b["y"].shape == (4,)
    assert np.isfinite(np.asarray(ads.grid)).all()
