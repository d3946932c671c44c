"""Unimodal linear probes: frozen-backbone features → joint multi-label head.

Reference: ``analysis/unimodal_linear_probe.py``. Compares what each frozen
modality encodes linearly: CXR CLS vs DuETT token poolings
(``rep`` / ``hourly_mean`` / ``multiscale`` / ``attn_pool``,
reference ``_pool_duett_tokens`` :64-88). The probe head is a single Dense
layer trained with masked multi-label BCE (attn_pool adds a learned query).
Features are cached to ``.npz`` (reference ``--save_features`` :346-351).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.duett import feats_to_input
from ..ops import metrics as M
from ..ops.losses import masked_per_label_bce
from .common import add_analysis_flags, gather_host_windows, \
    load_analysis_data, load_teacher

POOLINGS = ("rep", "hourly_mean", "multiscale", "attn_pool")


def extract_features(model, params, batch_stats, anchor_ds, image_source,
                     batch_size: int = 64, cache_path: Optional[str] = None,
                     feature_source=None) -> dict:
    """One pass over all anchors → duett tokens (all poolings) + CXR CLS.

    ``feature_source`` (encode-once tier, ``--cxr_feature_cache``): anchors
    repeat images, so the CLS gather from the per-unique-image token bank
    replaces one full ViT forward per anchor."""
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return {k: z[k] for k in z.files}

    from ..models.duett import DuettEncoder
    from ..models.vit import DinoViT

    duett_cfg, vit_cfg = model.cfg.duett, model.cfg.vit

    @jax.jit
    def duett_step(x_ts, x_static, times):
        x_in, xs = feats_to_input(None, x_ts, x_static)
        tokens, _ = DuettEncoder(duett_cfg).apply(
            {"params": params["duett"],
             "batch_stats": batch_stats.get("duett", {})},
            x_in, xs, times, train=False)
        return tokens.astype(jnp.float32)

    @jax.jit
    def cxr_step(batch):
        if feature_source is not None:
            cls, _ = feature_source(batch)
        else:
            pixels = image_source(batch)
            cls, _ = DinoViT(vit_cfg).apply(
                {"params": params["cxr"]}, pixels, train=False)
        return cls.astype(jnp.float32)

    a = anchor_ds.anchor
    N = len(a["y"])
    tokens_all, cls_all = [], []
    T = anchor_ds.n_timesteps
    for i in range(0, N, batch_size):
        idx = np.arange(i, min(i + batch_size, N))
        x_ts, x_static = gather_host_windows(anchor_ds, idx)
        times = np.broadcast_to(anchor_ds.bin_ends, (len(idx), T))
        tokens_all.append(np.asarray(duett_step(x_ts, x_static, times)))
        cls_all.append(np.asarray(cxr_step({
            "image_ids": a["image_ids"][idx].astype(np.int32),
            "y_multi": a["y_multi"][idx]})))
    feats = {"duett_tokens": np.concatenate(tokens_all),
             "cxr_cls": np.concatenate(cls_all)}
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, **feats)
    return feats


def pool_duett_tokens(tokens: np.ndarray, pooling: str,
                      windows=(6, 12, 24)) -> np.ndarray:
    """[N, T+1, R] → pooled features (reference :64-88)."""
    hourly, rep = tokens[:, :-1], tokens[:, -1]
    if pooling == "rep":
        return rep
    if pooling == "hourly_mean":
        return hourly.mean(axis=1)
    if pooling == "multiscale":
        T = hourly.shape[1]
        parts = [hourly[:, T - w:].mean(axis=1) for w in windows]
        return np.concatenate(parts, axis=1)
    if pooling == "attn_pool":
        return hourly  # pooled inside the probe with a learned query
    raise ValueError(pooling)


def train_probe(x_train, y_train, m_train, x_eval, y_eval, m_eval,
                attn_pool: bool = False, lr: float = 1e-2,
                steps: int = 400, seed: int = 0) -> dict:
    """Joint multi-label linear head on frozen features (full-batch Adam)."""
    K = y_train.shape[1]
    rng = jax.random.key(seed)
    if attn_pool:
        N, T, R = x_train.shape
        params = {"q": 0.02 * jax.random.normal(rng, (R,)),
                  "w": jnp.zeros((R, K)), "b": jnp.zeros(K)}

        def logits_fn(p, x):
            att = jax.nn.softmax(jnp.einsum("ntr,r->nt", x, p["q"]), axis=1)
            pooled = jnp.einsum("nt,ntr->nr", att, x)
            return pooled @ p["w"] + p["b"]
    else:
        mu, sd = x_train.mean(0), x_train.std(0) + 1e-6
        x_train = (x_train - mu) / sd
        x_eval = (x_eval - mu) / sd
        params = {"w": jnp.zeros((x_train.shape[1], K)), "b": jnp.zeros(K)}

        def logits_fn(p, x):
            return x @ p["w"] + p["b"]

    xt, yt, mt = jnp.asarray(x_train), jnp.asarray(y_train), \
        jnp.asarray(m_train)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss(p):
            per = masked_per_label_bce(logits_fn(p, xt), yt, mt)
            return per.sum()
        g = jax.grad(loss)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    for _ in range(steps):
        params, opt_state = step(params, opt_state)

    ev_logits = np.asarray(logits_fn(params, jnp.asarray(x_eval)))
    rows = M.masked_multilabel_metrics(y_eval, m_eval, {"probe": ev_logits})
    return {"per_label": rows,
            "macro_auroc": M.macro_mean(rows, "probe_auroc"),
            "macro_auprc": M.macro_mean(rows, "probe_auprc")}


def main(argv=None):
    p = argparse.ArgumentParser("unimodal linear probes")
    add_analysis_flags(p)
    p.add_argument("--save_features", type=str, default="")
    p.add_argument("--probe_steps", type=int, default=400)
    args = p.parse_args(argv)

    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_sources
    image_source, feature_source = make_sources(args, anchor_ds, model,
                                                params, cfg)
    feats = extract_features(model, params, batch_stats, anchor_ds,
                             image_source, args.batch_size,
                             args.save_features or None,
                             feature_source=feature_source)
    a, s = anchor_ds.anchor, anchor_ds.splits
    tr, ev = s["train"], s[args.split]
    y_tr, m_tr = a["y_multi"][tr], a["y_multi_mask"][tr]
    y_ev, m_ev = a["y_multi"][ev], a["y_multi_mask"][ev]

    results = {}
    results["cxr_cls"] = train_probe(
        feats["cxr_cls"][tr], y_tr, m_tr, feats["cxr_cls"][ev], y_ev, m_ev,
        steps=args.probe_steps, seed=args.seed)
    for pooling in POOLINGS:
        x = pool_duett_tokens(feats["duett_tokens"], pooling)
        results[f"duett_{pooling}"] = train_probe(
            x[tr], y_tr, m_tr, x[ev], y_ev, m_ev,
            attn_pool=(pooling == "attn_pool"), steps=args.probe_steps,
            seed=args.seed)

    print(f"{'probe':<20s} {'macroROC':>9s} {'macroAP':>9s}")
    for name, r in results.items():
        print(f"{name:<20s} {r['macro_auroc']:>9.4f} {r['macro_auprc']:>9.4f}")
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "unimodal_probe.json")
    with open(out, "w") as f:
        json.dump({k: {"macro_auroc": v["macro_auroc"],
                       "macro_auprc": v["macro_auprc"],
                       "per_label": v["per_label"]}
                   for k, v in results.items()}, f, indent=2, default=float)
    print(f"saved → {out}")
    return results


if __name__ == "__main__":
    main()
