"""Conditional-information probe on RAW time-series summaries.

Reference: ``analysis/raw_trajectory_conditional_probe.py``. Asks the same
question as the conditional probe but bypasses the trained TS encoder: builds
per-variable raw summary blocks from the window itself (:75-110, :329-483)

    level        last observed value, window mean
    trajectory   slope of observed values over time, last-minus-first
    observation  observed-hour count, time since last observation

then fits a **frozen-image offset-logistic** correction (:563-747): logits =
image_logit (fixed offset) + X·w; an exact-null candidate (w = 0) competes via
inner CV so the probe can't win by overfitting. Inference: subject-cluster
bootstrap CIs (:760-801) and conditional permutation within image-risk bins
(:804-840).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import metrics as M
from ..train import engine
from .common import (add_analysis_flags, gather_host_windows,
                     load_analysis_data, load_teacher,
                     subject_cluster_bootstrap)

BLOCKS = ("level", "trajectory", "observation")


def raw_summaries(x_ts: np.ndarray, blocks=BLOCKS) -> np.ndarray:
    """[N, T, 2V] windows → [N, F] raw per-variable summary features."""
    N, T, C = x_ts.shape
    V = C // 2
    values, counts = x_ts[..., :V], x_ts[..., V:]
    obs = counts > 0
    any_obs = obs.any(axis=1)                              # [N, V]
    t = np.arange(T, dtype=np.float64)[None, :, None]

    feats = []
    if "level" in blocks:
        last_idx = T - 1 - np.argmax(obs[:, ::-1, :], axis=1)
        last_val = np.take_along_axis(values, last_idx[:, None, :],
                                      axis=1)[:, 0, :]
        last_val = np.where(any_obs, last_val, 0.0)
        denom = np.maximum(obs.sum(axis=1), 1)
        mean_val = (values * obs).sum(axis=1) / denom
        feats += [last_val, mean_val]
    if "trajectory" in blocks:
        w = obs.astype(np.float64)
        sw = w.sum(axis=1)
        t_mean = (w * t).sum(axis=1) / np.maximum(sw, 1)
        v_mean = (w * values).sum(axis=1) / np.maximum(sw, 1)
        cov = (w * (t - t_mean[:, None, :])
               * (values - v_mean[:, None, :])).sum(axis=1)
        var = (w * (t - t_mean[:, None, :]) ** 2).sum(axis=1)
        slope = np.where(var > 0, cov / np.maximum(var, 1e-9), 0.0)
        first_idx = np.argmax(obs, axis=1)
        first_val = np.take_along_axis(values, first_idx[:, None, :],
                                       axis=1)[:, 0, :]
        delta = np.where(any_obs,
                         np.take_along_axis(
                             values, (T - 1 - np.argmax(obs[:, ::-1, :],
                                                        axis=1))[:, None, :],
                             axis=1)[:, 0, :] - first_val, 0.0)
        feats += [slope.astype(np.float32), delta]
    if "observation" in blocks:
        n_obs = obs.sum(axis=1).astype(np.float32) / T
        recency = np.where(any_obs,
                           (T - 1 - (T - 1 - np.argmax(obs[:, ::-1, :],
                                                       axis=1))) / T, 1.0)
        feats += [n_obs, recency.astype(np.float32)]
    X = np.concatenate(feats, axis=1).astype(np.float32)
    mu, sd = X.mean(0), X.std(0) + 1e-6
    return (X - mu) / sd


def fit_offset_logistic(X, y, offset, l2: float = 1e-2, steps: int = 500,
                        lr: float = 5e-2):
    """minimize masked BCE(σ(offset + Xw + b)) + l2‖w‖²; returns (w, b)."""
    Xj, yj, oj = jnp.asarray(X), jnp.asarray(y), jnp.asarray(offset)
    params = {"w": jnp.zeros(X.shape[1]), "b": jnp.asarray(0.0)}
    tx = optax.adam(lr)
    st = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss(p):
            logits = oj + Xj @ p["w"] + p["b"]
            bce = jnp.mean(jnp.maximum(logits, 0) - logits * yj
                           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return bce + l2 * jnp.sum(p["w"] ** 2)
        g = jax.grad(loss)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    for _ in range(steps):
        params, st = step(params, st)
    return np.asarray(params["w"]), float(params["b"])


def cv_selects_model(X, y, offset, n_folds: int = 3, seed: int = 0) -> bool:
    """Inner CV: does the offset-logistic beat the exact null (w=0)?"""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(y))
    folds = np.array_split(order, n_folds)
    model_bce, null_bce = [], []
    for f in range(n_folds):
        te = folds[f]
        tr = np.concatenate([folds[i] for i in range(n_folds) if i != f])
        w, b = fit_offset_logistic(X[tr], y[tr], offset[tr])
        logits = offset[te] + X[te] @ w + b
        model_bce.append(M.bce_per_sample(logits, y[te]).mean())
        null_bce.append(M.bce_per_sample(offset[te], y[te]).mean())
    return float(np.mean(model_bce)) < float(np.mean(null_bce))


def main(argv=None):
    p = argparse.ArgumentParser("raw-TS conditional probe")
    add_analysis_flags(p)
    p.add_argument("--label_idx", type=int, default=0)
    p.add_argument("--n_perm", type=int, default=20)
    args = p.parse_args(argv)

    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from ..train.teacher_loop import make_synthetic_image_source
    eval_step = engine.make_teacher_eval_from_windows(
        model, image_source=make_synthetic_image_source(cfg.vit.image_size))
    a = anchor_ds.anchor
    li = args.label_idx

    def collect(split):
        idx_all = anchor_ds.splits[split]
        xw, img, y, sid = [], [], [], []
        n = len(idx_all) - len(idx_all) % args.batch_size
        for i in range(0, n, args.batch_size):
            idx = idx_all[i:i + args.batch_size]
            x_ts, x_static = gather_host_windows(anchor_ds, idx)
            batch = {"image_ids": a["image_ids"][idx].astype(np.int32),
                     "y_multi": a["y_multi"][idx],
                     "y_multi_mask": a["y_multi_mask"][idx],
                     "bin_ends": np.broadcast_to(
                         anchor_ds.bin_ends,
                         (len(idx), anchor_ds.n_timesteps))}
            o = eval_step(params, batch_stats, x_ts, x_static, batch)
            keep = a["y_multi_mask"][idx][:, li] > 0
            xw.append(x_ts[keep])
            img.append(np.asarray(o["img_logits"])[keep, li])
            y.append(a["y_multi"][idx][keep, li])
            sid.append(a["subject_ids"][idx][keep])
        return (np.concatenate(xw), np.concatenate(img), np.concatenate(y),
                np.concatenate(sid))

    xw_tr, img_tr, y_tr, _ = collect("train")
    xw_ev, img_ev, y_ev, sid_ev = collect(args.split)
    # feature schema equality guard (reference :888-889)
    assert xw_tr.shape[1:] == xw_ev.shape[1:], "train/eval schema mismatch"

    results = {}
    X_tr_all = raw_summaries(xw_tr)
    X_ev_all = raw_summaries(xw_ev)
    base_auroc = M.auroc(y_ev, img_ev)
    results["image_only"] = {"auroc": base_auroc}

    selected = cv_selects_model(X_tr_all, y_tr, img_tr, seed=args.seed)
    w, b = fit_offset_logistic(X_tr_all, y_tr, img_tr)
    scores = img_ev + X_ev_all @ w + b
    auroc = M.auroc(y_ev, scores)

    def boot(idx):
        return M.auroc(y_ev[idx], scores[idx]) - M.auroc(y_ev[idx],
                                                         img_ev[idx])

    ci = subject_cluster_bootstrap(sid_ev, boot, args.n_boot, args.seed)

    # conditional permutation within image-risk quintiles
    rng = np.random.default_rng(args.seed)
    edges = np.quantile(img_tr, np.linspace(0, 1, 6))
    bins = np.clip(np.searchsorted(edges, img_tr) - 1, 0, 4)
    nulls = []
    for _ in range(args.n_perm):
        Xp = X_tr_all.copy()
        for bnum in range(5):
            sel = np.nonzero(bins == bnum)[0]
            Xp[sel] = X_tr_all[rng.permutation(sel)]
        wp, bp = fit_offset_logistic(Xp, y_tr, img_tr)
        nulls.append(M.auroc(y_ev, img_ev + X_ev_all @ wp + bp))
    p_perm = float((np.asarray(nulls) >= auroc).mean())

    results["offset_logistic"] = {
        "auroc": auroc, "delta_vs_image": auroc - base_auroc,
        "cv_beats_exact_null": bool(selected),
        "ci_lo": ci["lo"], "ci_hi": ci["hi"],
        "p_conditional_perm": p_perm,
        "evidence": ("supported" if selected and ci["lo"] > 0
                     and p_perm < 0.05 else
                     "suggestive" if auroc > base_auroc else
                     "not_detected"),
    }

    # per-block ablation
    for block in BLOCKS:
        Xb_tr = raw_summaries(xw_tr, blocks=(block,))
        Xb_ev = raw_summaries(xw_ev, blocks=(block,))
        wb, bb = fit_offset_logistic(Xb_tr, y_tr, img_tr)
        results[f"block_{block}"] = {
            "auroc": M.auroc(y_ev, img_ev + Xb_ev @ wb + bb)}

    print(f"{'probe':<18s} {'AUROC':>7s} {'delta':>8s}  evidence")
    print(f"{'image_only':<18s} {base_auroc:>7.4f}")
    r = results["offset_logistic"]
    print(f"{'offset_logistic':<18s} {r['auroc']:>7.4f} "
          f"{r['delta_vs_image']:>+8.4f}  {r['evidence']} "
          f"(CI [{r['ci_lo']:+.4f},{r['ci_hi']:+.4f}], "
          f"p={r['p_conditional_perm']:.3f})")
    for block in BLOCKS:
        print(f"{'block_' + block:<18s} "
              f"{results['block_' + block]['auroc']:>7.4f}")
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "raw_trajectory_probe.json"),
              "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


if __name__ == "__main__":
    main()
