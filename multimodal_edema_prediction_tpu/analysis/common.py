"""Shared analysis machinery.

The reference's ``load_teacher`` (analysis/visualize_pathology.py:94-192)
reconstructs the exact trained teacher from a checkpoint's embedded args and
rebuilds the datasets from the saved paths/seed. Here the config rides in the
checkpoint sidecar, so reconstruction is one call; datasets rebuild from the
same flags the trainers use.
"""
from __future__ import annotations

import argparse
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import DataConfig
from ..data import pipeline as P
from ..data import synthetic as S
from ..train.kd_loop import load_teacher_from_ckpt


def add_analysis_flags(p: argparse.ArgumentParser, needs_ckpt: bool = True):
    if needs_ckpt:
        p.add_argument("--ckpt", type=str, required=True,
                       help="teacher best checkpoint (.msgpack)")
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--synthetic_stays", type=int, default=400)
    p.add_argument("--n_variables", type=int, default=34)
    p.add_argument("--split", type=str, default="test",
                   choices=["train", "val", "test"])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_boot", type=int, default=200)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="analysis_out")
    p.add_argument("--cxr_jpeg_root", type=str, default="",
                   help="directory of {image_id}.jpg files — run the "
                        "analysis on REAL CXRs (native decode) instead of "
                        "procedural images")
    p.add_argument("--cxr_feature_cache", type=str, default="none",
                   choices=["none", "hbm"],
                   help="encode-once tier for analyses that stream many "
                        "frozen-teacher forwards over the same images "
                        "(counterfactual conditions, probes): cache the "
                        "ViT's (CLS, patch) tokens per unique image and "
                        "skip the ViT in every forward")


def make_image_source(args, anchor_ds, vit_cfg):
    """Image source for analysis eval steps.

    With ``--cxr_jpeg_root``: attaches the native-JPEG decode hook to the
    dataset so every batch carries real ``pixel_values`` (reference analyses
    always run on real CXRs, e.g. visualize_pathology.py:208-281); returns
    the pass-through source. Otherwise returns the procedural-image source.
    """
    root = getattr(args, "cxr_jpeg_root", "")
    if root:
        from ..data.images import JpegStore, make_jpeg_host_fn
        from ..train import engine
        anchor_ds.batch_hook = make_jpeg_host_fn(
            JpegStore(root=root), vit_cfg.image_size)
        return engine.default_image_source
    from ..train.teacher_loop import make_synthetic_image_source
    return make_synthetic_image_source(vit_cfg.image_size)


def make_sources(args, anchor_ds, model, params, cfg):
    """(image_source, feature_source) honoring ``--cxr_feature_cache``.

    With the cache on, every unique image in the cohort is encoded once by
    the checkpoint's frozen ViT and analyses gather cached (CLS, patch)
    tokens keyed by RAW image id (analysis batches are assembled without the
    training loops' row-rewriting hook). The pixel hook is detached after
    the build so per-batch JPEG decode stops too.
    """
    image_source = make_image_source(args, anchor_ds, cfg.vit)
    if getattr(args, "cxr_feature_cache", "none") == "none":
        return image_source, None
    from ..data import features as F
    a = anchor_ds.anchor
    all_ids = np.unique(a["image_ids"]).astype(np.int64)
    order = np.argsort(a["image_ids"], kind="stable")
    srt = a["image_ids"][order]
    first = order[np.searchsorted(srt, all_ids)]
    y_rep = np.asarray(a["y_multi"][first], np.float32)
    base_hook = anchor_ds.batch_hook

    def pixels_for_ids(ids):
        b = {"image_ids": np.asarray(ids, np.int32),
             "y_multi": y_rep[np.searchsorted(all_ids,
                                              np.asarray(ids, np.int64))]}
        if base_hook is not None:
            b = base_hook(b)
        return np.asarray(image_source(b), np.float32)

    encode = F.encode_fn_for_teacher(model, params)
    bank = F.CXRFeatureBank.build(encode, pixels_for_ids, all_ids)
    anchor_ds.batch_hook = None      # pixels no longer needed per batch
    return image_source, bank.feature_source(keyed_by_row=False)


def load_analysis_data(args, n_variables: Optional[int] = None):
    dcfg = DataConfig(data_dir=getattr(args, "data_dir", ""))
    if getattr(args, "data_dir", ""):
        from ..data.ingest import load_artifacts
        ds, meta = load_artifacts(args.data_dir, dcfg)
    else:
        ds = S.make_synthetic(
            seed=0, n_stays=args.synthetic_stays,
            n_subjects=max(args.synthetic_stays // 3, 10),
            n_variables=n_variables or args.n_variables)
        meta = P.meta_from_events(ds, dcfg)
    anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)
    return ds, meta, anchor_ds, dcfg


def load_teacher(ckpt_path: str):
    """(model, cfg, params, batch_stats, raw_ckpt) from one checkpoint."""
    return load_teacher_from_ckpt(ckpt_path)


def gather_host_windows(anchor_ds, idx: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Host-side window gather for counterfactual transforms."""
    grid = np.asarray(anchor_ds.grid)
    static = np.asarray(anchor_ds.static)
    a = anchor_ds.anchor
    T = anchor_ds.n_timesteps
    rows, ends = a["stay_rows"][idx], a["slot_idx"][idx]
    x_ts = np.stack([grid[r, e - T:e] for r, e in zip(rows, ends)])
    return x_ts, static[rows]


def different_subject_permutation(subject_ids: np.ndarray,
                                  rng: np.random.Generator) -> np.ndarray:
    """Within-batch permutation maximizing cross-subject pairing
    (reference diagnose_temporal_usage.py:104-126)."""
    n = len(subject_ids)
    if n <= 1:
        return np.arange(n)
    for _ in range(100):
        perm = rng.permutation(n)
        if np.all(subject_ids[perm] != subject_ids):
            return perm
    best_perm = np.roll(np.arange(n), 1)
    best = int(np.sum(subject_ids[best_perm] == subject_ids))
    for shift in range(2, n):
        cand = np.roll(np.arange(n), shift)
        m = int(np.sum(subject_ids[cand] == subject_ids))
        if m < best:
            best_perm, best = cand, m
            if m == 0:
                break
    return best_perm


def subject_cluster_bootstrap(subject_ids: np.ndarray,
                              stat_fn: Callable[[np.ndarray], float],
                              n_boot: int = 200, seed: int = 0
                              ) -> Dict[str, float]:
    """Paired bootstrap resampling whole subjects
    (reference diagnose_temporal_usage.py:215-242). ``stat_fn`` maps an index
    array (sample rows) to a scalar; returns mean + 95% CI."""
    rng = np.random.default_rng(seed)
    subjects = np.unique(subject_ids)
    by_subj = {s: np.nonzero(subject_ids == s)[0] for s in subjects}
    stats = []
    for _ in range(n_boot):
        chosen = rng.choice(subjects, size=len(subjects), replace=True)
        idx = np.concatenate([by_subj[s] for s in chosen])
        v = stat_fn(idx)
        if np.isfinite(v):
            stats.append(v)
    stats = np.asarray(stats)
    if len(stats) == 0:
        return {"mean": float("nan"), "lo": float("nan"),
                "hi": float("nan"), "n_valid": 0}
    return {"mean": float(stats.mean()),
            "lo": float(np.percentile(stats, 2.5)),
            "hi": float(np.percentile(stats, 97.5)),
            "n_valid": int(len(stats))}


def attention_entropy(attn: np.ndarray) -> np.ndarray:
    """Normalized entropy of attention rows [N,K,S] → [N,K]
    (reference :397-406)."""
    p = attn / np.clip(attn.sum(axis=-1, keepdims=True), 1e-12, None)
    ent = -(p * np.log(np.clip(p, 1e-12, None))).sum(axis=-1)
    return ent / max(np.log(attn.shape[-1]), 1e-12)
