"""Real-data ingest: reference artifacts → columnar tables.

Consumes the reference pipeline's on-disk contract
(``final_df_*`` merged multimodal table, ``static_full.ftr``,
``meta_with_stats.pkl`` — see SURVEY.md L0/L1) and converts it ONCE into the
framework's canonical columnar form (:class:`..data.synthetic.EventTable` /
``StaticTable`` / ``AnchorTable``), which is then densified and shipped to
device. After this one-time conversion there is no pandas anywhere in the
training path.

Also defines a portable ``.npz`` export so converted cohorts round-trip
without pandas/pyarrow installed.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..config import DataConfig
from .meta import Meta
from .synthetic import AnchorTable, EventTable, StaticTable


@dataclass
class IngestedDataset:
    """Duck-typed like SyntheticDataset for build_anchor_dataset()."""
    events: EventTable
    static: StaticTable
    anchors: AnchorTable
    cxr_catalog: AnchorTable
    var_names: Tuple[str, ...]
    onehot_names: Tuple[str, ...]


NPZ_KEYS = ("events", "static", "anchors", "cxr_catalog")


def save_npz(path: str, ds: IngestedDataset):
    np.savez_compressed(
        path,
        ev_stay_ids=ds.events.stay_ids, ev_subject_ids=ds.events.subject_ids,
        ev_stay_len=ds.events.stay_len, ev_offsets=ds.events.offsets,
        ev_slot_idx=ds.events.slot_idx, ev_values=ds.events.values,
        ev_counts=ds.events.counts,
        st_stay_ids=ds.static.stay_ids, st_subject_ids=ds.static.subject_ids,
        st_age=ds.static.age, st_onehot=ds.static.onehot,
        st_death=ds.static.death_adm,
        an_subject_ids=ds.anchors.subject_ids, an_stay_ids=ds.anchors.stay_ids,
        an_slot_idx=ds.anchors.slot_idx, an_image_ids=ds.anchors.image_ids,
        an_labels=ds.anchors.labels,
        cat_subject_ids=ds.cxr_catalog.subject_ids,
        cat_image_ids=ds.cxr_catalog.image_ids,
        cat_labels=ds.cxr_catalog.labels,
        var_names=np.asarray(ds.var_names),
        onehot_names=np.asarray(ds.onehot_names))


def load_npz(path: str) -> IngestedDataset:
    z = np.load(path, allow_pickle=False)
    n_cat = len(z["cat_subject_ids"])
    return IngestedDataset(
        events=EventTable(z["ev_stay_ids"], z["ev_subject_ids"],
                          z["ev_stay_len"], z["ev_offsets"],
                          z["ev_slot_idx"], z["ev_values"], z["ev_counts"]),
        static=StaticTable(z["st_stay_ids"], z["st_subject_ids"],
                           z["st_age"], z["st_onehot"], z["st_death"]),
        anchors=AnchorTable(z["an_subject_ids"], z["an_stay_ids"],
                            z["an_slot_idx"], z["an_image_ids"],
                            z["an_labels"]),
        cxr_catalog=AnchorTable(z["cat_subject_ids"],
                                np.full(n_cat, -1, np.int64),
                                np.zeros(n_cat, np.int32),
                                z["cat_image_ids"], z["cat_labels"]),
        var_names=tuple(str(v) for v in z["var_names"]),
        onehot_names=tuple(str(v) for v in z["onehot_names"]))


def from_reference_frames(final_df, static_df, cxr_df, meta: Meta,
                          pathology_labels) -> IngestedDataset:
    """Convert reference pandas frames (final_df / static_full / final_cxr_df)
    into columnar tables. Mirrors the column contracts of
    ``training_duett/data_processing.py:137-214`` and
    ``duett/mimic_dataset.py:33-53``. Requires pandas at call time only."""
    import pandas as pd  # local import: training path stays pandas-free

    var_names = list(meta.all_vars)
    count_cols = list(meta.all_counts)

    final_df = final_df.sort_values(["stay_id", "slot_idx"])
    stay_groups = final_df.groupby("stay_id", sort=True)
    stay_ids = np.asarray(list(stay_groups.groups.keys()), np.int64)
    sdf = static_df.drop_duplicates("stay_id").set_index("stay_id")

    offsets = [0]
    slot_rows, val_rows, cnt_rows, stay_len, subj_ids = [], [], [], [], []
    for sid in stay_ids:
        g = stay_groups.get_group(sid)
        slots = g["slot_idx"].to_numpy(np.int32)
        vals = g[var_names].to_numpy(np.float32)
        cnts = g[count_cols].to_numpy(np.float32)
        keep = np.nan_to_num(cnts, nan=0.0).sum(axis=1) > 0
        slot_rows.append(slots[keep])
        val_rows.append(np.nan_to_num(vals[keep], nan=0.0))
        cnt_rows.append(np.nan_to_num(cnts[keep], nan=0.0).astype(np.int32))
        offsets.append(offsets[-1] + int(keep.sum()))
        stay_len.append(int(slots.max()) + 1 if len(slots) else 0)
        subj_ids.append(int(sdf.loc[sid, "subject_id"])
                        if sid in sdf.index else -1)

    events = EventTable(
        stay_ids=stay_ids, subject_ids=np.asarray(subj_ids, np.int64),
        stay_len=np.asarray(stay_len, np.int32),
        offsets=np.asarray(offsets, np.int64),
        slot_idx=np.concatenate(slot_rows) if slot_rows else
        np.zeros(0, np.int32),
        values=np.concatenate(val_rows), counts=np.concatenate(cnt_rows))

    onehot_names = list(meta.onehot_static)
    srows = sdf.loc[[s for s in stay_ids if s in sdf.index]]
    static = StaticTable(
        stay_ids=np.asarray(srows.index, np.int64),
        subject_ids=srows["subject_id"].to_numpy(np.int64),
        age=srows["age_at_intime"].to_numpy(np.float32),
        onehot=srows[onehot_names].to_numpy(np.float32),
        death_adm=(srows[meta.label_col].to_numpy(np.float32)
                   if meta.label_col in srows.columns
                   else np.zeros(len(srows), np.float32)))

    cxr_rows = final_df[final_df["cxr_flag"] == 1]
    anchors = AnchorTable(
        subject_ids=cxr_rows["subject_id"].to_numpy(np.int64),
        stay_ids=cxr_rows["stay_id"].to_numpy(np.int64),
        slot_idx=cxr_rows["slot_idx"].to_numpy(np.int32),
        image_ids=np.arange(len(cxr_rows), dtype=np.int64),
        labels=cxr_rows[list(pathology_labels)].to_numpy(np.float32))

    cat = cxr_df.drop_duplicates(subset=["dicom_id"])
    catalog = AnchorTable(
        subject_ids=cat["subject_id"].to_numpy(np.int64),
        stay_ids=np.full(len(cat), -1, np.int64),
        slot_idx=np.zeros(len(cat), np.int32),
        image_ids=np.arange(len(cat), dtype=np.int64),
        labels=cat[list(pathology_labels)].to_numpy(np.float32))

    return IngestedDataset(events=events, static=static, anchors=anchors,
                           cxr_catalog=catalog, var_names=tuple(var_names),
                           onehot_names=tuple(onehot_names))


def load_artifacts(data_dir: str, cfg: DataConfig):
    """Load a converted cohort: ``cohort.npz`` + ``meta_with_stats.pkl``."""
    npz = os.path.join(data_dir, "cohort.npz")
    meta_path = os.path.join(data_dir, "meta_with_stats.pkl")
    if not os.path.exists(npz):
        raise FileNotFoundError(
            f"{npz} not found — convert reference artifacts first with "
            "multimodal_edema_prediction_tpu.data.ingest.from_reference_frames"
            " + save_npz")
    ds = load_npz(npz)
    meta = Meta.load(meta_path)
    return ds, meta
