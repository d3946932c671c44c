"""Sliding-window SSL sample index construction.

Equivalent of ``MIMICSlidingDataset`` (duett/mimic_dataset.py:103-155): one
sample per (stay, start) pair with stride windows fully inside the stay.
Window materialization reuses the device-side gather from
:mod:`.pipeline` — slot_end = start + T.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, Optional

import jax.numpy as jnp
import numpy as np

from .meta import Meta


def sliding_samples(stay_len: np.ndarray, stay_rows: np.ndarray,
                    n_timesteps: int, stride: int = 12,
                    max_stay_hours: int = 336) -> np.ndarray:
    """[(stay_row, start)] pairs for windows inside [0, min(L, cap))."""
    out = []
    for row in stay_rows:
        L = min(int(stay_len[row]), max_stay_hours)
        max_start = L - n_timesteps
        if max_start < 0:
            continue
        for start in range(0, max_start + 1, stride):
            out.append((row, start))
    return np.asarray(out, np.int32).reshape(-1, 2)


@dataclass
class SlidingSSLDataset:
    """Device-resident SSL dataset over sliding windows."""
    grid: jnp.ndarray            # [S, L, 2V]
    static: jnp.ndarray          # [S, D]
    samples: Dict[str, np.ndarray]   # split → [(stay_row, start)]
    meta: Meta
    n_timesteps: int

    @property
    def bin_ends(self) -> np.ndarray:
        return (np.arange(1, self.n_timesteps + 1) / 24.0).astype(np.float32)

    def split_size(self, name: str) -> int:
        return len(self.samples[name])

    def iter_batches(self, name: str, batch_size: int, shuffle: bool,
                     seed: int = 0, limit: int = 0) -> Iterator[dict]:
        from ..parallel.multihost import split_batch_for_process
        pairs = self.samples[name]
        if shuffle:
            pairs = np.random.default_rng(seed).permutation(pairs)
        n = len(pairs) - (len(pairs) % batch_size)  # fixed shapes: drop last
        count = 0
        for i in range(0, n, batch_size):
            b = pairs[i:i + batch_size]
            yield split_batch_for_process({
                "stay_rows": b[:, 0],
                "slot_idx": b[:, 1] + self.n_timesteps,  # slot_end convention
                "bin_ends": np.broadcast_to(
                    self.bin_ends, (batch_size, self.n_timesteps)),
            })
            count += 1
            if limit and count >= limit:
                return


@dataclass
class StayLabelDataset(SlidingSSLDataset):
    """First-window-per-stay supervised dataset with a per-stay label
    (MIMICDataset equivalent, duett/mimic_dataset.py:59-91: label =
    ``death_adm`` from the static frame)."""
    labels: np.ndarray = None      # [S] aligned with grid rows

    def iter_batches(self, name, batch_size, shuffle, seed=0, limit=0):
        for b in super().iter_batches(name, batch_size, shuffle, seed, limit):
            b["y"] = self.labels[b["stay_rows"]]
            if "_global" in b:   # multi-process: global label copy for eval
                b["_global"]["y"] = self.labels[b["_global"]["stay_rows"]]
            yield b

    def pos_frac(self, name: str = "train") -> float:
        rows = np.unique(self.samples[name][:, 0])
        return float(self.labels[rows].mean()) if len(rows) else 0.0


def build_stay_label_dataset(dataset, meta: Meta, n_timesteps: int = 24,
                             max_len: Optional[int] = None
                             ) -> StayLabelDataset:
    """One first-`T`h window per stay + death_adm label
    (prepare_from_raw path, mimic_dataset.py:254-330)."""
    base = build_sliding_ssl_dataset(dataset, meta, n_timesteps,
                                     stride=10 ** 9,   # start=0 only
                                     max_stay_hours=n_timesteps,
                                     max_len=max_len or n_timesteps)
    return StayLabelDataset(grid=base.grid, static=base.static,
                            samples=base.samples, meta=base.meta,
                            n_timesteps=base.n_timesteps,
                            labels=dataset.static.death_adm.astype(np.float32))


def build_sliding_ssl_dataset(dataset, meta: Meta, n_timesteps: int = 24,
                              stride: int = 12, max_stay_hours: int = 336,
                              max_len: Optional[int] = None
                              ) -> SlidingSSLDataset:
    """SyntheticDataset/ingest → sliding SSL dataset using meta's stay splits.

    Cohort filter: stay length >= n_timesteps (mimic_dataset.py:188-195).
    """
    from .pipeline import densify_events, encode_static_table

    events, static = dataset.events, dataset.static
    L = int(min(max_len or events.stay_len.max(), max_stay_hours))
    grid = densify_events(events, meta, L)
    static_enc = encode_static_table(static, meta)

    id_to_row = {int(s): i for i, s in enumerate(events.stay_ids)}
    samples = {}
    for name, ids in (("train", meta.train_ids), ("val", meta.val_ids),
                      ("test", meta.test_ids)):
        rows = np.asarray([id_to_row[int(s)] for s in ids
                           if int(s) in id_to_row], np.int32)
        keep = events.stay_len[rows] >= n_timesteps
        samples[name] = sliding_samples(events.stay_len, rows[keep],
                                        n_timesteps, stride, max_stay_hours)
    return SlidingSSLDataset(grid=jnp.asarray(grid),
                             static=jnp.asarray(static_enc),
                             samples=samples, meta=meta,
                             n_timesteps=n_timesteps)
