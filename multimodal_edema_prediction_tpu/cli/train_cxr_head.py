"""CXR linear-head training CLI (reference: cxr_linear_training.ipynb).

Extracts frozen-ViT CLS features for the full CXR catalog (cached), trains
the masked-BCE linear head, and saves the artifact the 'dual' teacher loads.
"""
from __future__ import annotations

import argparse
import os

import jax

from ..config import DEFAULT_PATHOLOGY_LABELS, ViTConfig
from ..data import synthetic as S
from ..models.vit import DinoViT
from ..train.cxr_head_loop import (extract_cls_features,
                                   split_catalog_subjects, train_cxr_head)
from ..train.teacher_loop import make_synthetic_image_source
from ..utils.logging import Logger


def main(argv=None):
    p = argparse.ArgumentParser("CXR linear head training (TPU)")
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--synthetic_stays", type=int, default=400)
    p.add_argument("--vit_size", type=str, default="base",
                   choices=["tiny", "base"])
    p.add_argument("--vit_params", type=str, default="",
                   help="converted RAD-DINO weights (msgpack); random if empty")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ckpt_dir", type=str, default="runs/cxr_head")
    p.add_argument("--feature_cache", type=str, default="")
    p.add_argument("--head_batch_size", type=int, default=0,
                   help="mini-batch size for head training (0 = full batch)")
    p.add_argument("--uncertain_policy", type=str, default="to_positive",
                   choices=["to_positive", "to_zero", "keep"],
                   help="U(-1) label mapping at the CXR-head level "
                        "(reference: U->1, cxr_db.ipynb cell 24)")
    p.add_argument("--cxr_jpeg_root", type=str, default="",
                   help="directory of {image_id}.jpg catalog files — extract "
                        "features from REAL CXRs (native decode)")
    args = p.parse_args(argv)

    log = Logger("cxr_head")
    vit_cfg = ViTConfig() if args.vit_size == "base" else ViTConfig(
        image_size=56, patch_size=14, d_model=64, n_layers=2, n_heads=2,
        d_feedforward=128)

    if args.data_dir:
        from ..config import DataConfig
        from ..data.ingest import load_artifacts
        ds, _ = load_artifacts(args.data_dir, DataConfig())
    else:
        ds = S.make_synthetic(seed=0, n_stays=args.synthetic_stays,
                              n_subjects=max(args.synthetic_stays // 3, 10))
    catalog = ds.cxr_catalog

    if args.vit_params:
        from ..train.checkpoint import load_checkpoint
        vit_params = load_checkpoint(args.vit_params)["params"]
    else:
        import jax.numpy as jnp
        S_ = vit_cfg.image_size
        vit_params = DinoViT(vit_cfg).init(
            jax.random.key(0), jnp.zeros((1, S_, S_, 3)))["params"]
        log.info("using randomly initialized ViT (no weights provided)")

    jpeg_store = None
    if args.cxr_jpeg_root:
        from ..data.images import JpegStore
        jpeg_store = JpegStore(root=args.cxr_jpeg_root)
        log.info(f"extracting features from real JPEGs: {args.cxr_jpeg_root}")
    cls = extract_cls_features(
        vit_params, vit_cfg, make_synthetic_image_source(vit_cfg.image_size),
        catalog.image_ids, catalog.labels, args.batch_size,
        args.feature_cache or None, jpeg_store=jpeg_store)
    splits = split_catalog_subjects(catalog.subject_ids, catalog.labels,
                                    args.seed)
    os.makedirs(args.ckpt_dir, exist_ok=True)
    result = train_cxr_head(
        cls, catalog.labels, splits, DEFAULT_PATHOLOGY_LABELS,
        os.path.join(args.ckpt_dir, "cxr_linear_head.msgpack"),
        batch_size=args.head_batch_size,
        uncertain_policy=args.uncertain_policy,
        lr=args.lr, epochs=args.epochs, dropout=args.dropout,
        seed=args.seed, logger=log)
    log.info(f"saved → {result['ckpt_path']}")
    return result


if __name__ == "__main__":
    main()
