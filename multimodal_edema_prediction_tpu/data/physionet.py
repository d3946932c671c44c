"""PhysioNet-2012 mortality dataset (DuETT paper-repro path).

Reference: ``duett/physionet.py`` — a torchtime-backed DataModule with 36
time-series variables, 8 static features, hourly binning into value+count
channels, per-dataset caching, fixed split seed. torchtime is not in this
image, so the real loader is gated; :func:`make_synthetic_physionet`
generates a structurally identical cohort (36 vars, 48 h windows, static
block, in-hospital-death label with learnable signal) for tests and smoke
runs. Downstream consumption reuses the stay-label dataset machinery.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import DataConfig
from .meta import Meta
from .pipeline import meta_from_events
from .synthetic import AnchorTable, EventTable, StaticTable, SyntheticDataset

N_TS_VARS = 36       # physionet.py: 36 time-series variables
N_STATIC = 8         # 8 static features (age, gender, height, ICU type…)


def make_synthetic_physionet(seed: int = 0, n_patients: int = 400,
                             n_hours: int = 48, obs_rate: float = 0.25
                             ) -> Tuple[SyntheticDataset, Meta]:
    """P12-shaped synthetic cohort: one stay per patient, 48 h of sparse
    vitals/labs, mortality label driven by a latent severity state."""
    rng = np.random.default_rng(seed)
    V = N_TS_VARS
    sev = rng.normal(size=(n_patients, 3)).astype(np.float32)
    load = rng.normal(size=(3, V)).astype(np.float32) * \
        (rng.random((3, V)) < 0.4)
    base = rng.normal(1.0, 0.5, V).astype(np.float32)
    scale = rng.uniform(0.3, 2.0, V).astype(np.float32)

    stay_ids = np.arange(5000, 5000 + n_patients, dtype=np.int64)
    subj = np.arange(n_patients, dtype=np.int64)
    stay_len = np.full(n_patients, n_hours, np.int32)

    rows_slot, rows_val, rows_cnt, offsets = [], [], [], [0]
    for i in range(n_patients):
        t = np.arange(n_hours, dtype=np.float32)
        mean_tv = base + scale * (sev[i] @ load)[None, :] * \
            (0.5 + t[:, None] / n_hours)
        observed = rng.random((n_hours, V)) < obs_rate
        observed[0, rng.integers(0, V)] = True
        counts = np.where(observed, 1 + rng.poisson(0.5, (n_hours, V)),
                          0).astype(np.int32)
        vals = np.where(observed,
                        mean_tv + rng.normal(scale=0.4, size=(n_hours, V))
                        * scale, 0.0).astype(np.float32)
        keep = observed.any(axis=1)
        rows_slot.append(np.nonzero(keep)[0].astype(np.int32))
        rows_val.append(vals[keep])
        rows_cnt.append(counts[keep])
        offsets.append(offsets[-1] + int(keep.sum()))

    events = EventTable(stay_ids=stay_ids, subject_ids=subj,
                        stay_len=stay_len,
                        offsets=np.asarray(offsets, np.int64),
                        slot_idx=np.concatenate(rows_slot),
                        values=np.concatenate(rows_val),
                        counts=np.concatenate(rows_cnt))
    onehot = (rng.random((n_patients, N_STATIC - 1)) < 0.4).astype(np.float32)
    age = rng.uniform(20, 90, n_patients).astype(np.float32)
    death = (1 / (1 + np.exp(-(sev[:, 0] * 1.5 - 1.0)))
             > rng.random(n_patients)).astype(np.float32)

    static = StaticTable(stay_ids=stay_ids, subject_ids=subj, age=age,
                         onehot=onehot, death_adm=death)
    empty = AnchorTable(np.zeros(0, np.int64), np.zeros(0, np.int64),
                        np.zeros(0, np.int32), np.zeros(0, np.int64),
                        np.zeros((0, 1), np.float32))
    ds = SyntheticDataset(
        events=events, static=static, anchors=empty, cxr_catalog=empty,
        var_names=tuple(f"p12_var_{i:02d}" for i in range(V)),
        onehot_names=tuple(f"p12_static_{i}" for i in range(N_STATIC - 1)),
        latent_by_stay=sev, label_weights_true=load)
    meta = meta_from_events(ds, DataConfig(n_timesteps=24),
                            label_col="death_adm")
    return ds, meta


def load_physionet2012(data_dir: str):  # pragma: no cover - needs torchtime
    """Real P12 loader (requires torchtime, not in this image)."""
    try:
        import torchtime  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "torchtime is not installed in this image; use "
            "make_synthetic_physionet() or provide converted artifacts"
        ) from e
    raise NotImplementedError(
        "wire torchtime.data.PhysioNet2012 → EventTable here when available")
