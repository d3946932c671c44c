"""Residual direction/usefulness by image-confidence quartile.

Reference: ``analysis/residual_by_confidence.py``. Buckets samples by the
image branch's confidence (|σ(img_logit) − 0.5|) and reports, per quartile:
mean |scaled_correction|, the fraction of corrections pointing toward the
label (sign(corr) == sign(y − σ(img))), and the BCE delta fusion − image.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..ops.metrics import bce_per_sample
from ..parallel import mesh as meshlib
from ..train import engine
from ..train.evaluator import collect_dual_outputs
from .common import add_analysis_flags, load_analysis_data, load_teacher


def analyze(o: dict, label_idx: int = 0, n_bins: int = 4) -> dict:
    m = o["mask"][:, label_idx].astype(bool)
    y = o["y"][m, label_idx]
    img = o["img"][m, label_idx]
    fus = o["fus"][m, label_idx]
    corr = o["corr"][m, label_idx]
    p_img = 1 / (1 + np.exp(-img))
    conf = np.abs(p_img - 0.5)
    edges = np.quantile(conf, np.linspace(0, 1, n_bins + 1))
    rows = []
    for b in range(n_bins):
        sel = (conf >= edges[b]) & (conf <= edges[b + 1] if b == n_bins - 1
                                    else conf < edges[b + 1])
        if sel.sum() == 0:
            continue
        toward = np.sign(corr[sel]) == np.sign(y[sel] - p_img[sel])
        rows.append({
            "quartile": b, "n": int(sel.sum()),
            "conf_lo": float(edges[b]), "conf_hi": float(edges[b + 1]),
            "mean_abs_corr": float(np.abs(corr[sel]).mean()),
            "frac_toward_label": float(toward.mean()),
            "delta_bce": float(bce_per_sample(fus[sel], y[sel]).mean()
                               - bce_per_sample(img[sel], y[sel]).mean()),
        })
    return {"label_idx": label_idx, "quartiles": rows}


def main(argv=None):
    p = argparse.ArgumentParser("residual usage by image confidence")
    add_analysis_flags(p)
    p.add_argument("--label_idx", type=int, default=0)
    args = p.parse_args(argv)
    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_sources
    image_source, feature_source = make_sources(args, anchor_ds, model,
                                                params, cfg)
    mesh = meshlib.create_mesh()
    eval_step = engine.make_teacher_eval(
        model, anchor_ds.n_timesteps,
        image_source=image_source, feature_source=feature_source)
    with mesh:
        anchor_ds.grid = jax.device_put(anchor_ds.grid,
                                        meshlib.replicated(mesh))
        o = collect_dual_outputs(eval_step, params, batch_stats, anchor_ds,
                                 args.split, args.batch_size, mesh)
    result = analyze(o, args.label_idx)
    print(f"{'Q':>2s} {'n':>5s} {'|corr|':>8s} {'toward':>7s} {'dBCE':>8s}")
    for r in result["quartiles"]:
        print(f"{r['quartile']:>2d} {r['n']:>5d} "
              f"{r['mean_abs_corr']:>8.4f} {r['frac_toward_label']:>7.3f} "
              f"{r['delta_bce']:>+8.4f}")
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "residual_by_confidence.json"),
              "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


if __name__ == "__main__":
    main()
