"""Per-sample tensor + anchor/split parity vs the ACTUAL reference dataset
code (`training_duett/data_processing.py`, `duett/mimic_dataset.py`) — both
imported unmodified (pandas+torch, no stubs on this path).

A tiny synthetic cohort is materialized twice from one ground truth:
  - as the reference's pandas frames (final_df / static_df / meta dict /
    CXR-catalog feather) driving build_anchors → split_anchors →
    DuettAnchorDataset.__getitem__;
  - as this repo's columnar tables driving build_anchor_dataset.
Every anchor's x_ts window, x_static, labels, masks and the three split
index sets must agree exactly.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import torch

from ref_harness import load_reference, t2n
from multimodal_edema_prediction_tpu.config import DataConfig
from multimodal_edema_prediction_tpu.data.meta import Meta
from multimodal_edema_prediction_tpu.data.pipeline import (
    build_anchor_dataset)
from multimodal_edema_prediction_tpu.data.synthetic import (
    AnchorTable, EventTable, StaticTable)

REF = load_reference()

LABELS = ("label_edema", "label_cardiomegaly", "label_effusion",
          "label_pneumonia", "label_atelectasis", "label_opacity",
          "label_consolidation")
V, T = 6, 8            # variables, window length
N_STAYS = 40
L_MAX = 20             # dense grid length


class _Cohort:
    """One ground-truth cohort rendered both ways."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self.var_names = tuple(f"v{i}" for i in range(V))
        self.count_names = tuple(f"count_v{i}" for i in range(V))
        self.onehot_names = ("oh_a", "oh_b", "oh_c")

        stay_ids = np.arange(1000, 1000 + N_STAYS, dtype=np.int64)
        subject_ids = 5000 + rng.integers(0, 25, N_STAYS).astype(np.int64)
        stay_len = rng.integers(T + 2, L_MAX + 1, N_STAYS).astype(np.int32)

        # sparse events: each (stay, slot) observed with p=0.6; counts 0..15
        rows = []
        for s in range(N_STAYS):
            for slot in range(stay_len[s]):
                counts = np.where(rng.random(V) < 0.6,
                                  rng.integers(1, 15, V), 0)
                if counts.sum() == 0:
                    continue
                vals = np.where(counts > 0, rng.normal(50, 20, V), 0.0)
                rows.append((s, slot, vals.astype(np.float32),
                             counts.astype(np.int32)))
        offsets = np.zeros(N_STAYS + 1, np.int64)
        for s, *_ in rows:
            offsets[s + 1] += 1
        offsets = np.cumsum(offsets)
        self.events = EventTable(
            stay_ids=stay_ids, subject_ids=subject_ids, stay_len=stay_len,
            offsets=offsets,
            slot_idx=np.array([r[1] for r in rows], np.int32),
            values=np.stack([r[2] for r in rows]),
            counts=np.stack([r[3] for r in rows]))

        age = rng.uniform(30, 90, N_STAYS).astype(np.float32)
        onehot = (rng.random((N_STAYS, 3)) < 0.5).astype(np.float32)
        self.static = StaticTable(stay_ids=stay_ids, subject_ids=subject_ids,
                                  age=age, onehot=onehot,
                                  death_adm=np.zeros(N_STAYS, np.float32))

        # anchors: ~2 per stay at random slots, labels {0,1,-1,NaN}
        a_stay, a_slot, a_lab, a_img = [], [], [], []
        used = set()
        for s in range(N_STAYS):
            for _ in range(rng.integers(1, 4)):
                slot = int(rng.integers(1, stay_len[s] + 1))
                if (s, slot) in used:      # one CXR row per (stay, slot)
                    continue
                used.add((s, slot))
                a_stay.append(s)
                a_slot.append(slot)
                lab = rng.choice([0.0, 1.0, -1.0, np.nan], size=len(LABELS),
                                 p=[0.4, 0.3, 0.1, 0.2])
                a_lab.append(lab)
                a_img.append(rng.integers(0, 10 ** 6))
        # align with the reference's final_df sort order (stay_id, slot_idx)
        order = np.lexsort((np.array(a_slot), stay_ids[np.array(a_stay)]))
        a_stay = np.array(a_stay)[order]
        a_slot = list(np.array(a_slot)[order])
        a_lab = [a_lab[i] for i in order]
        a_img = [a_img[i] for i in order]
        self.anchors = AnchorTable(
            subject_ids=subject_ids[a_stay], stay_ids=stay_ids[a_stay],
            slot_idx=np.array(a_slot, np.int32),
            image_ids=np.array(a_img, np.int64),
            labels=np.stack(a_lab).astype(np.float32))

        # CXR catalog ("240k table"): every subject + extras, some label-less
        extra_subj = 5000 + rng.integers(0, 40, 60).astype(np.int64)
        cat_subj = np.concatenate([subject_ids, extra_subj])
        cat_lab = np.stack([
            rng.choice([0.0, 1.0, np.nan], size=len(LABELS))
            for _ in range(len(cat_subj))]).astype(np.float32)
        # a few catalog rows with no labels at all → dropped by both sides
        cat_lab[::17] = np.nan
        self.cxr_catalog = AnchorTable(
            subject_ids=cat_subj,
            stay_ids=np.zeros(len(cat_subj), np.int64),
            slot_idx=np.zeros(len(cat_subj), np.int32),
            image_ids=rng.permutation(len(cat_subj)).astype(np.int64),
            labels=cat_lab)

        # train-split normalization stats (shared verbatim by both sides)
        self.means = rng.normal(50, 5, V).astype(np.float32)
        self.stds = rng.uniform(5, 25, V).astype(np.float32)
        self.age_mean, self.age_std = 62.0, 16.0

    # ---- reference-side rendering -----------------------------------------
    def reference_frames(self):
        ev = self.events
        recs = []
        stay_row = np.repeat(np.arange(N_STAYS), np.diff(ev.offsets))
        dense = {}
        for i in range(len(ev.slot_idx)):
            dense[(stay_row[i], int(ev.slot_idx[i]))] = i
        anchor_key = {}
        for j in range(len(self.anchors.stay_ids)):
            s = int(np.where(ev.stay_ids == self.anchors.stay_ids[j])[0][0])
            anchor_key.setdefault((s, int(self.anchors.slot_idx[j])), j)

        for s in range(N_STAYS):
            for slot in range(int(ev.stay_len[s])):
                rec = {
                    "stay_id": int(ev.stay_ids[s]),
                    "subject_id": int(ev.subject_ids[s]),
                    "hadm_id": 77000 + s, "slot_idx": slot,
                    "study_id": 0, "dicom_id": "",
                    "cxr_flag": 0,
                }
                i = dense.get((s, slot))
                for v in range(V):
                    if i is not None and ev.counts[i, v] > 0:
                        rec[self.var_names[v]] = float(ev.values[i, v])
                        rec[self.count_names[v]] = int(ev.counts[i, v])
                    else:
                        rec[self.var_names[v]] = 0.0
                        rec[self.count_names[v]] = 0
                for k, c in enumerate(LABELS):
                    rec[c] = np.nan
                recs.append(rec)
        final_df = pd.DataFrame.from_records(recs)

        # anchor rows: mark cxr_flag on the (stay, slot) row; the reference
        # keeps CXR rows inside final_df (slot may exceed stay rows for
        # slot == stay_len → append a pure-anchor row)
        extra = []
        for (s, slot), j in anchor_key.items():
            sel = (final_df["stay_id"] == int(ev.stay_ids[s])) & \
                (final_df["slot_idx"] == slot)
            lab = self.anchors.labels[j]
            if sel.any():
                ii = final_df.index[sel][0]
                final_df.loc[ii, "cxr_flag"] = 1
                final_df.loc[ii, "study_id"] = 9000 + j
                final_df.loc[ii, "dicom_id"] = f"d{j}"
                for k, c in enumerate(LABELS):
                    final_df.loc[ii, c] = lab[k]
            else:
                rec = {"stay_id": int(ev.stay_ids[s]),
                       "subject_id": int(ev.subject_ids[s]),
                       "hadm_id": 77000 + s, "slot_idx": slot,
                       "study_id": 9000 + j, "dicom_id": f"d{j}",
                       "cxr_flag": 1}
                for v in range(V):
                    rec[self.var_names[v]] = 0.0
                    rec[self.count_names[v]] = 0
                for k, c in enumerate(LABELS):
                    rec[c] = lab[k]
                extra.append(rec)
        if extra:
            final_df = pd.concat([final_df, pd.DataFrame.from_records(extra)],
                                 ignore_index=True)
        final_df = final_df.sort_values(
            ["stay_id", "slot_idx"]).reset_index(drop=True)

        static_df = pd.DataFrame({
            "age_at_intime": self.static.age.astype(float),
            **{c: self.static.onehot[:, i].astype(float)
               for i, c in enumerate(self.onehot_names)},
        }, index=pd.Index(self.static.stay_ids, name="stay_id"))

        meta = {
            "ALL_VARS": list(self.var_names),
            "ALL_COUNTS": list(self.count_names),
            "ONEHOT_STATIC": list(self.onehot_names),
            "means": {v: float(m) for v, m in zip(self.var_names, self.means)},
            "stds": {v: float(s) for v, s in zip(self.var_names, self.stds)},
            "age_mean": self.age_mean, "age_std": self.age_std,
        }

        catalog_df = pd.DataFrame({
            "subject_id": self.cxr_catalog.subject_ids,
            "dicom_id": [f"c{i}" for i in
                         self.cxr_catalog.image_ids.tolist()],
            **{c: self.cxr_catalog.labels[:, k]
               for k, c in enumerate(LABELS)},
        })
        return final_df, static_df, meta, catalog_df

    # ---- my-side rendering --------------------------------------------------
    def my_dataset(self):
        class _DS:
            pass

        ds = _DS()
        ds.events = self.events
        ds.static = self.static
        ds.anchors = self.anchors
        ds.cxr_catalog = self.cxr_catalog
        ds.var_names = self.var_names
        ds.onehot_names = self.onehot_names
        return ds

    def my_meta(self):
        return Meta(all_vars=self.var_names, all_counts=self.count_names,
                    onehot_static=self.onehot_names,
                    d_static=1 + len(self.onehot_names),
                    label_col="label_edema", n_timesteps=T,
                    means=self.means, stds=self.stds,
                    age_mean=self.age_mean, age_std=self.age_std)


@pytest.fixture(scope="module")
def cohort():
    return _Cohort(seed=0)


@pytest.fixture(scope="module")
def both_sides(cohort, tmp_path_factory):
    final_df, static_df, meta, catalog_df = cohort.reference_frames()
    rd = REF["data"]
    cfg = rd.AnchorConfig(final_df_path="", static_path="", meta_path="",
                          n_timesteps=T, pathology_labels=tuple(LABELS))
    anchor_df, ts_vars, ts_counts = rd.build_anchors(
        cfg, meta, final_df, static_df)

    # reference split reads the catalog from feather; give it a real file
    pq = pytest.importorskip("pandas")  # noqa: F841
    cat_path = tmp_path_factory.mktemp("cat") / "cat.ftr"
    try:
        catalog_df.to_feather(cat_path)
        splits_ref = rd.split_anchors(
            anchor_df, seed=42, pretrained_ftr_path=str(cat_path),
            pretrained_label_cols=list(LABELS))
    except ImportError:  # no pyarrow in image → patch the reader
        orig = rd.pd.read_feather
        rd.pd.read_feather = lambda *_a, **_k: catalog_df
        try:
            splits_ref = rd.split_anchors(
                anchor_df, seed=42, pretrained_ftr_path="ignored",
                pretrained_label_cols=list(LABELS))
        finally:
            rd.pd.read_feather = orig

    final_by_stay = {sid: g for sid, g in final_df.groupby("stay_id")}
    ref_ds = rd.DuettAnchorDataset(
        mode="student", final_df_by_stay=final_by_stay, anchor_df=anchor_df,
        static_df=static_df, meta=meta, ts_vars=ts_vars, ts_counts=ts_counts,
        cfg=cfg)

    mine = build_anchor_dataset(cohort.my_dataset(), cohort.my_meta(),
                                DataConfig(n_timesteps=T, split_seed=42,
                                           pathology_labels=tuple(LABELS)))
    return anchor_df, splits_ref, ref_ds, mine


class TestAnchorParity:
    def test_anchor_count_and_order(self, both_sides):
        anchor_df, _, _, mine = both_sides
        assert len(anchor_df) == len(mine.anchor["y"])
        np.testing.assert_array_equal(
            anchor_df["subject_id"].values.astype(np.int64),
            mine.anchor["subject_ids"].astype(np.int64))
        np.testing.assert_array_equal(
            anchor_df["slot_idx"].values.astype(np.int32),
            mine.anchor["slot_idx"])

    def test_main_label_u_to_zero(self, both_sides):
        anchor_df, _, _, mine = both_sides
        np.testing.assert_array_equal(
            anchor_df["y_e"].values.astype(np.float32), mine.anchor["y"])
        # U(-1) rows must exist in the fixture and be mapped to 0
        assert (mine.anchor["y_multi_mask"][:, 0] == 1.0).all()

    def test_splits_identical(self, both_sides):
        _, splits_ref, _, mine = both_sides
        for name in ("train", "val", "test"):
            np.testing.assert_array_equal(
                np.sort(splits_ref[name]), np.sort(mine.splits[name]),
                err_msg=name)

    def test_per_sample_tensors(self, both_sides):
        _, _, ref_ds, mine = both_sides
        grid = np.asarray(mine.grid)
        static = np.asarray(mine.static)
        n = len(ref_ds)
        for i in range(0, n, max(1, n // 32)):
            item = ref_ds[i]
            row = mine.anchor["stay_rows"][i]
            e = int(mine.anchor["slot_idx"][i])
            x_ts_mine = grid[row, e - T:e]
            np.testing.assert_allclose(
                x_ts_mine, t2n(item["x_ts"]), atol=1e-5,
                err_msg=f"x_ts anchor {i}")
            np.testing.assert_allclose(
                static[row], t2n(item["x_static"]), atol=1e-5,
                err_msg=f"x_static anchor {i}")
            # Documented divergence: the reference's __getitem__ passes the
            # RAW main label into y_multi — a U(-1) main label reaches the
            # multilabel BCE as target -1 (data_processing.py:184-189,
            # 375-378), even though the binary y maps U→0 (:166-174). The
            # reference's own comment states real labels are {0,1,NaN} only,
            # so this path never fires on real data; this repo applies U→0
            # to the main column consistently.
            ref_y_multi = t2n(item["y_multi"]).copy()
            if ref_y_multi[0] == -1.0:
                assert mine.anchor["y_multi"][i, 0] == 0.0
                ref_y_multi[0] = 0.0
            np.testing.assert_allclose(
                mine.anchor["y_multi"][i], ref_y_multi, atol=0)
            np.testing.assert_allclose(
                mine.anchor["y_multi_mask"][i], t2n(item["y_multi_mask"]),
                atol=0)
            np.testing.assert_allclose(
                mine.bin_ends, t2n(item["bin_ends"]), atol=1e-7)

    def test_aux_label_nan_masking(self, both_sides):
        """NaN aux labels → mask 0 with y placeholder 0; -1 aux labels pass
        through as-is on both sides (only the MAIN label maps U→0,
        data_processing.py:166-174 vs 184-213)."""
        anchor_df, _, ref_ds, mine = both_sides
        raw = anchor_df[[f"_y_{c}" for c in LABELS]].values.astype(np.float32)
        has_neg1_aux = (raw[:, 1:] == -1.0).any()
        assert has_neg1_aux, "fixture must exercise U in aux labels"
        mask = (~np.isnan(raw)).astype(np.float32)
        np.testing.assert_array_equal(mask, mine.anchor["y_multi_mask"])
