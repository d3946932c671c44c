"""ICU-hardness ablation of the CXR head: where does image-only break down?

Reference: ``analysis/why_we_need_multimodal.py``. Evaluates the pretrained
CXR linear head on mutually exclusive slices of its own test split:

    G0  all test images
    G1  non-ICU subjects (no ICU stay in the cohort)
    G2  ICU subjects, image NOT anchored to a stay window
    G3  ICU anchor images (the multimodal cohort)

The assert G1+G2+G3 == G0 (reference :208-210) guards the decomposition.
A worse G3 than G1 motivates fusing the temporal modality.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..config import DEFAULT_PATHOLOGY_LABELS
from ..ops import metrics as M
from ..train.checkpoint import load_checkpoint
from .common import add_analysis_flags, load_analysis_data


def evaluate_slices(catalog, anchors, head_logits: np.ndarray,
                    labels) -> dict:
    icu_subjects = set(anchors.subject_ids.tolist())
    anchor_images = set(anchors.image_ids.tolist())
    g1 = ~np.isin(catalog.subject_ids, list(icu_subjects))
    g3 = np.isin(catalog.image_ids, list(anchor_images))
    g2 = ~g1 & ~g3
    g0 = np.ones(len(catalog.subject_ids), bool)
    assert (g1.sum() + g2.sum() + g3.sum()) == g0.sum(), \
        "G1+G2+G3 must decompose G0 exactly"

    y = catalog.labels
    mask = (~np.isnan(y)).astype(np.float32)
    y0 = np.nan_to_num(y, nan=0.0)
    out = {}
    for name, sel in (("G0_all", g0), ("G1_non_icu", g1),
                      ("G2_icu_unanchored", g2), ("G3_icu_anchor", g3)):
        if sel.sum() == 0:
            out[name] = {"n": 0, "macro_auroc": float("nan")}
            continue
        rows = M.masked_multilabel_metrics(
            y0[sel], mask[sel], {"head": head_logits[sel]})
        out[name] = {"n": int(sel.sum()),
                     "macro_auroc": M.macro_mean(rows, "head_auroc"),
                     "macro_auprc": M.macro_mean(rows, "head_auprc"),
                     "per_label": rows}
    return out


def main(argv=None):
    p = argparse.ArgumentParser("CXR-head ICU-hardness decomposition")
    add_analysis_flags(p, needs_ckpt=False)
    p.add_argument("--head_ckpt", type=str, required=True)
    p.add_argument("--vit_size", type=str, default="tiny",
                   choices=["tiny", "base"])
    args = p.parse_args(argv)

    from ..config import ViTConfig
    from ..models.vit import DinoViT
    from ..models.cxr_head import CXRLinearHead
    from ..train.cxr_head_loop import extract_cls_features
    from ..train.teacher_loop import make_synthetic_image_source
    import jax
    import jax.numpy as jnp

    ds, meta, anchor_ds, dcfg = load_analysis_data(args)
    catalog = ds.cxr_catalog
    ckpt = load_checkpoint(args.head_ckpt)
    label_cols = ckpt["config"]["label_cols"]
    vit_cfg = ViTConfig() if args.vit_size == "base" else ViTConfig(
        image_size=56, patch_size=14, d_model=64, n_layers=2, n_heads=2,
        d_feedforward=128)
    vit_params = DinoViT(vit_cfg).init(
        jax.random.key(0),
        jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3)))["params"]
    jpeg_store = None
    if getattr(args, "cxr_jpeg_root", ""):
        from ..data.images import JpegStore
        jpeg_store = JpegStore(root=args.cxr_jpeg_root)
    cls = extract_cls_features(
        vit_params, vit_cfg, make_synthetic_image_source(vit_cfg.image_size),
        catalog.image_ids, catalog.labels, args.batch_size,
        jpeg_store=jpeg_store)
    head = CXRLinearHead(len(label_cols))
    logits = np.asarray(head.apply({"params": ckpt["params"]},
                                   jnp.asarray(cls), train=False))
    result = evaluate_slices(catalog, ds.anchors, logits, label_cols)
    print(f"{'slice':<20s} {'n':>6s} {'macroROC':>9s}")
    for name, r in result.items():
        print(f"{name:<20s} {r['n']:>6d} {r['macro_auroc']:>9.4f}")
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "why_we_need_multimodal.json"),
              "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


if __name__ == "__main__":
    main()
