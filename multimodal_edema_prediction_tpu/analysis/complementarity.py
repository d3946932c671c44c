"""Complementarity analysis: does the TS branch fix cases the image misses,
and does fusion retain those fixes?

Reference: ``analysis/complementarity.py``. Per pathology: Youden-J
thresholds derived on the validation split, then on the eval split a 2×2
(image-correct × ts-correct) contingency and its 3-way refinement with the
fusion branch, summarized as:

    ts_unique_gain     P(ts correct, image wrong)
    ts_redundancy      both_correct / (both_correct + ts_only)
    ts_gain_retention  of ts-only-correct cases, fraction fusion keeps
    fusion_harm_rate   of image-only-correct cases, fraction fusion loses
    emergent_gain      of both-wrong cases, fraction fusion saves
    kappa_img_ts       Cohen's κ between branch correctness indicators
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import jax
import numpy as np

from ..ops.metrics import pearson
from ..train import engine
from ..train.evaluator import collect_dual_outputs
from ..parallel import mesh as meshlib
from .common import add_analysis_flags, load_analysis_data, load_teacher


def youden_threshold(logits: np.ndarray, y: np.ndarray) -> float:
    """Logit threshold maximizing TPR − FPR."""
    if len(np.unique(y)) < 2:
        return float("nan")
    order = np.argsort(-logits, kind="mergesort")
    ys = y[order] > 0.5
    tp = np.cumsum(ys)
    fp = np.cumsum(~ys)
    tpr = tp / max(ys.sum(), 1)
    fpr = fp / max((~ys).sum(), 1)
    j = tpr - fpr
    i = int(np.argmax(j))
    return float(logits[order][i])


def cohens_kappa(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0:
        return float("nan")
    po = float((a == b).mean())
    pa, pb = float(a.mean()), float(b.mean())
    pe = pa * pb + (1 - pa) * (1 - pb)
    return (po - pe) / (1 - pe) if pe != 1 else float("nan")


def analyze_label(y: np.ndarray, img_ok: np.ndarray, ts_ok: np.ndarray,
                  fus_ok: np.ndarray) -> Dict[str, float]:
    n = len(y)
    if n == 0:
        return {"n": 0}
    cells3 = {}
    for name, sel in (
            ("ts_only_and_fus_ok", ~img_ok & ts_ok & fus_ok),
            ("ts_only_but_fus_lost_it", ~img_ok & ts_ok & ~fus_ok),
            ("image_only_and_fus_ok", img_ok & ~ts_ok & fus_ok),
            ("image_only_but_fus_lost_it", img_ok & ~ts_ok & ~fus_ok),
            ("both_wrong_but_fus_saved", ~img_ok & ~ts_ok & fus_ok),
            ("all_three_wrong", ~img_ok & ~ts_ok & ~fus_ok),
            ("both_correct_and_fus_ok", img_ok & ts_ok & fus_ok),
            ("both_correct_but_fus_broke_it", img_ok & ts_ok & ~fus_ok)):
        cells3[name] = int(sel.sum())

    def ratio(a, b):
        return a / b if b > 0 else float("nan")

    both = int((img_ok & ts_ok).sum())
    img_only = int((img_ok & ~ts_ok).sum())
    ts_only = int((~img_ok & ts_ok).sum())
    both_wrong = int((~img_ok & ~ts_ok).sum())
    return {
        "n": n, "pos_frac": float(y.mean()),
        "img_acc": float(img_ok.mean()), "ts_acc": float(ts_ok.mean()),
        "fus_acc": float(fus_ok.mean()),
        "both_correct": both, "image_only_correct": img_only,
        "ts_only_correct": ts_only, "both_wrong": both_wrong,
        "ts_unique_gain": ts_only / n,
        "ts_redundancy": ratio(both, both + ts_only),
        "coverage_gain": (both + img_only + ts_only) / n,
        "kappa_img_ts": cohens_kappa(img_ok, ts_ok),
        "err_corr": pearson((~img_ok).astype(float), (~ts_ok).astype(float)),
        **cells3,
        "ts_gain_retention": ratio(
            cells3["ts_only_and_fus_ok"],
            cells3["ts_only_and_fus_ok"] + cells3["ts_only_but_fus_lost_it"]),
        "fusion_harm_rate": ratio(
            cells3["image_only_but_fus_lost_it"],
            cells3["image_only_and_fus_ok"]
            + cells3["image_only_but_fus_lost_it"]),
        "emergent_gain": ratio(
            cells3["both_wrong_but_fus_saved"],
            cells3["both_wrong_but_fus_saved"] + cells3["all_three_wrong"]),
        "both_agree_broken_rate": ratio(
            cells3["both_correct_but_fus_broke_it"],
            cells3["both_correct_and_fus_ok"]
            + cells3["both_correct_but_fus_broke_it"]),
    }


def run(model, cfg, params, batch_stats, anchor_ds, labels, split: str,
        batch_size: int, image_source, threshold_method: str = "youden"
        ) -> dict:
    mesh = meshlib.create_mesh()
    eval_step = engine.make_teacher_eval(model, anchor_ds.n_timesteps,
                                         image_source=image_source)
    with mesh:
        anchor_ds.grid = jax.device_put(anchor_ds.grid,
                                        meshlib.replicated(mesh))
        val = collect_dual_outputs(eval_step, params, batch_stats, anchor_ds,
                                   "val", batch_size, mesh)
        ev = collect_dual_outputs(eval_step, params, batch_stats, anchor_ds,
                                  split, batch_size, mesh)
    K = val["y"].shape[1]
    thr = {mod: np.full(K, np.nan) for mod in ("img", "ts", "fus")}
    if threshold_method == "fixed":
        thr = {mod: np.zeros(K) for mod in thr}
    else:
        for mod in thr:
            for k in range(K):
                m = val["mask"][:, k].astype(bool)
                if m.sum() >= 2:
                    thr[mod][k] = youden_threshold(val[mod][m, k],
                                                   val["y"][m, k])
    per_label = []
    for k in range(K):
        m = ev["mask"][:, k].astype(bool)
        y = ev["y"][m, k] > 0.5
        row = {"label": labels[k]}
        if m.sum() == 0 or np.isnan(thr["img"][k]):
            row["n"] = 0
        else:
            row.update(analyze_label(
                y,
                (ev["img"][m, k] > thr["img"][k]) == y,
                (ev["ts"][m, k] > thr["ts"][k]) == y,
                (ev["fus"][m, k] > thr["fus"][k]) == y))
        per_label.append(row)
    return {"labels": list(labels), "per_label": per_label,
            "thresholds": {m: t.tolist() for m, t in thr.items()}}


def format_table(result: dict) -> str:
    header = (f"{'label':<14s} {'n':>5s} {'imgAcc':>7s} {'tsAcc':>7s} "
              f"{'fusAcc':>7s} {'tsGain':>7s} {'retain':>7s} {'harm':>7s} "
              f"{'emerg':>7s} {'kappa':>7s}")
    lines = [header, "-" * len(header)]
    for r in result["per_label"]:
        if r.get("n", 0) == 0:
            lines.append(f"{r['label']:<14s}    --")
            continue
        lines.append(
            f"{r['label'].replace('label_', ''):<14s} {r['n']:>5d} "
            f"{r['img_acc']:>7.3f} {r['ts_acc']:>7.3f} {r['fus_acc']:>7.3f} "
            f"{r['ts_unique_gain']:>7.3f} {r['ts_gain_retention']:>7.3f} "
            f"{r['fusion_harm_rate']:>7.3f} {r['emergent_gain']:>7.3f} "
            f"{r['kappa_img_ts']:>7.3f}")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser("img × ts × fusion complementarity")
    add_analysis_flags(p)
    p.add_argument("--threshold_method", type=str, default="youden",
                   choices=["youden", "fixed"])
    args = p.parse_args(argv)
    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_image_source
    result = run(model, cfg, params, batch_stats, anchor_ds,
                 dcfg.pathology_labels, args.split, args.batch_size,
                 make_image_source(args, anchor_ds, cfg.vit),
                 args.threshold_method)
    print(format_table(result))
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "complementarity.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2, default=float)
    print(f"saved → {out}")
    return result


if __name__ == "__main__":
    main()
