"""Post-hoc conditional-information probes: does the TS branch add label
information beyond the image?

Reference: ``analysis/conditional_information_probe.py``. Logistic probes on
frozen teacher outputs for the main label:

    image_cal          1-feature recalibration of the image logit (base)
    logit_add          [img_logit, ts_logit]
    logit_interaction  [img, ts, img·ts]
    token_linear       [img_logit, fusion-token features]

Significance machinery: paired subject-cluster bootstrap CIs on ΔAUROC vs
``image_cal``, plus a conditional permutation null — TS features permuted
*within image-risk quantile bins* so marginal image information is preserved
(:311-351). Evidence grading supported/suggestive/not_detected (:488-574).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import jax
import numpy as np
from sklearn.linear_model import LogisticRegression

from ..ops import metrics as M
from ..parallel import mesh as meshlib
from ..train import engine
from .common import (add_analysis_flags, load_analysis_data, load_teacher,
                     subject_cluster_bootstrap)

PROBES = ("image_cal", "logit_add", "logit_interaction", "token_linear")


def collect_with_tokens(model, params, batch_stats, anchor_ds, split,
                        batch_size, image_source, label_idx=0,
                        feature_source=None):
    """img/ts logits + fusion tokens + y + subject ids for one split."""
    eval_step = engine.make_teacher_eval_from_windows(
        model, image_source=image_source, return_attn=True,
        feature_source=feature_source)
    from .common import gather_host_windows
    a = anchor_ds.anchor
    idx_all = anchor_ds.splits[split]
    out = {"img": [], "ts": [], "tok": [], "y": [], "sid": []}
    if len(idx_all) == 0:
        raise ValueError(f"split {split!r} is empty")
    if len(idx_all) < batch_size:   # tiny cohort: one short batch
        batch_size = len(idx_all)
    n = len(idx_all) - (len(idx_all) % batch_size)
    for i in range(0, n, batch_size):
        idx = idx_all[i:i + batch_size]
        x_ts, x_static = gather_host_windows(anchor_ds, idx)
        batch = {"image_ids": a["image_ids"][idx].astype(np.int32),
                 "y_multi": a["y_multi"][idx],
                 "y_multi_mask": a["y_multi_mask"][idx],
                 "bin_ends": np.broadcast_to(
                     anchor_ds.bin_ends,
                     (len(idx), anchor_ds.n_timesteps))}
        if anchor_ds.batch_hook is not None:   # real-JPEG pixel hook
            batch = anchor_ds.batch_hook(batch)
        o = eval_step(params, batch_stats, x_ts, x_static, batch)
        keep = a["y_multi_mask"][idx][:, label_idx] > 0
        out["img"].append(np.asarray(o["img_logits"])[keep, label_idx])
        out["ts"].append(np.asarray(o["ts_logits"])[keep, label_idx])
        # fusion tokens for the main-label query
        tok = np.asarray(o.get("fusion_tokens",
                               np.zeros((len(idx), 1, 1))))
        out["tok"].append(tok[keep, label_idx])
        out["y"].append(a["y_multi"][idx][keep, label_idx])
        out["sid"].append(a["subject_ids"][idx][keep])
    return {k: np.concatenate(v) for k, v in out.items()}


def probe_features(name: str, d: dict) -> np.ndarray:
    img, ts = d["img"][:, None], d["ts"][:, None]
    if name == "image_cal":
        return img
    if name == "logit_add":
        return np.concatenate([img, ts], axis=1)
    if name == "logit_interaction":
        return np.concatenate([img, ts, img * ts], axis=1)
    if name == "token_linear":
        tok = d["tok"].reshape(len(d["y"]), -1)
        # standardize tokens to keep the logistic probe conditioned
        tok = (tok - tok.mean(0)) / (tok.std(0) + 1e-6)
        return np.concatenate([img, tok], axis=1)
    raise ValueError(name)


def fit_eval(name: str, tr: dict, ev: dict) -> Dict[str, float]:
    Xtr, Xev = probe_features(name, tr), probe_features(name, ev)
    clf = LogisticRegression(max_iter=2000, C=1.0)
    clf.fit(Xtr, tr["y"])
    s = clf.decision_function(Xev)
    return {"auroc": M.auroc(ev["y"], s),
            "auprc": M.average_precision(ev["y"], s),
            "scores": s}


def conditional_permutation_null(tr: dict, ev: dict, probe: str = "logit_add",
                                 n_perm: int = 50, n_bins: int = 5,
                                 seed: int = 0) -> np.ndarray:
    """Permute TS features within image-risk quantile bins → ΔAUROC null."""
    rng = np.random.default_rng(seed)
    edges = np.quantile(tr["img"], np.linspace(0, 1, n_bins + 1))
    bins_tr = np.clip(np.searchsorted(edges, tr["img"]) - 1, 0, n_bins - 1)
    nulls = []
    for _ in range(n_perm):
        tr_p = dict(tr)
        ts_p = tr["ts"].copy()
        tok_p = tr["tok"].copy()
        for b in range(n_bins):
            sel = np.nonzero(bins_tr == b)[0]
            perm = rng.permutation(sel)
            ts_p[sel] = tr["ts"][perm]
            tok_p[sel] = tr["tok"][perm]
        tr_p["ts"], tr_p["tok"] = ts_p, tok_p
        r = fit_eval(probe, tr_p, ev)
        nulls.append(r["auroc"])
    return np.asarray(nulls)


def grade_evidence(delta: float, ci_lo: float, p_perm: float) -> str:
    if delta > 0 and ci_lo > 0 and p_perm < 0.05:
        return "supported"
    if delta > 0 and (ci_lo > -0.005 or p_perm < 0.15):
        return "suggestive"
    return "not_detected"


def run_label(model, cfg, params, batch_stats, anchor_ds, image_source,
              args, label_idx: int, feature_source=None) -> dict:
    tr = collect_with_tokens(model, params, batch_stats, anchor_ds, "train",
                             args.batch_size, image_source, label_idx,
                             feature_source=feature_source)
    ev = collect_with_tokens(model, params, batch_stats, anchor_ds,
                             args.split, args.batch_size, image_source,
                             label_idx, feature_source=feature_source)

    results = {}
    scores = {}
    for name in PROBES:
        r = fit_eval(name, tr, ev)
        scores[name] = r.pop("scores")
        results[name] = r

    base_auroc = results["image_cal"]["auroc"]
    sid = ev["sid"]
    for name in PROBES[1:]:
        delta = results[name]["auroc"] - base_auroc

        def boot_stat(idx, name=name):
            return (M.auroc(ev["y"][idx], scores[name][idx])
                    - M.auroc(ev["y"][idx], scores["image_cal"][idx]))

        ci = subject_cluster_bootstrap(sid, boot_stat, args.n_boot, args.seed)
        nulls = conditional_permutation_null(tr, ev, name, args.n_perm,
                                             seed=args.seed)
        p_perm = float((nulls >= results[name]["auroc"]).mean())
        results[name].update({
            "delta_auroc_vs_image": delta,
            "ci_lo": ci["lo"], "ci_hi": ci["hi"],
            "p_conditional_perm": p_perm,
            "evidence": grade_evidence(delta, ci["lo"], p_perm)})
    # per-sample eval-split archive (reference prediction_archive,
    # conditional_information_probe.py:432, :555-557)
    archive = {"y": ev["y"].astype(np.float32),
               "subject_ids": ev["sid"]}
    for name in PROBES:
        archive[f"{name}_probability"] = (
            1.0 / (1.0 + np.exp(-scores[name]))).astype(np.float32)
    return results, archive


def main(argv=None):
    p = argparse.ArgumentParser("conditional information probes")
    add_analysis_flags(p)
    p.add_argument("--n_perm", type=int, default=30)
    p.add_argument("--label_idx", type=int, default=-1,
                   help="-1 (default) sweeps ALL pathology labels, matching "
                        "the reference analysis scope")
    args = p.parse_args(argv)

    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_sources
    image_source, feature_source = make_sources(args, anchor_ds, model,
                                                params, cfg)

    labels = dcfg.pathology_labels
    idxs = range(len(labels)) if args.label_idx < 0 else [args.label_idx]
    all_results = {}
    csv_rows = []
    archives = {}

    def _slug(s: str) -> str:
        import re
        return re.sub(r"[^0-9A-Za-z._-]+", "_", s).strip("_") or "label"

    for li in idxs:
        results, archive = run_label(model, cfg, params, batch_stats,
                                     anchor_ds, image_source, args, li,
                                     feature_source=feature_source)
        all_results[labels[li]] = results
        for key, arr in archive.items():
            archives[f"{_slug(labels[li])}_{key}"] = arr
        print(f"== {labels[li]} ==")
        print(f"{'probe':<18s} {'AUROC':>7s} {'dAUROC':>8s} "
              f"{'95% CI':>20s} {'p_perm':>7s}  evidence")
        for name in PROBES:
            r = results[name]
            csv_rows.append({"label": labels[li], "probe": name, **r})
            if name == "image_cal":
                print(f"{name:<18s} {r['auroc']:>7.4f}")
            else:
                print(f"{name:<18s} {r['auroc']:>7.4f} "
                      f"{r['delta_auroc_vs_image']:>+8.4f} "
                      f"[{r['ci_lo']:+.4f}, {r['ci_hi']:+.4f}] "
                      f"{r['p_conditional_perm']:>7.3f}  {r['evidence']}")
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir,
                           "conditional_information_probe.json"), "w") as f:
        json.dump(all_results, f, indent=2, default=float)
    # reference file outputs: per-probe CSV + per-sample probability archive
    # (conditional_information_probe.py:575-582)
    import csv as _csv
    fieldnames = sorted({k for row in csv_rows for k in row},
                        key=lambda k: (k not in ("label", "probe"), k))
    with open(os.path.join(args.out_dir, "conditional_probe.csv"), "w",
              newline="") as f:
        w = _csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(csv_rows)
    np.savez_compressed(
        os.path.join(args.out_dir, "conditional_probe_predictions.npz"),
        **archives)
    return all_results


if __name__ == "__main__":
    main()
