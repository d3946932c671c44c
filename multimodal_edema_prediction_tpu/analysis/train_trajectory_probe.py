"""Standalone TS-only trajectory probe trainer.

Reference: ``analysis/train_trajectory_probe.py`` — trains
``LocalTrajectoryEncoder`` + a pathology-query readout with key-padding mask
on the anchor cohort (no images), with cosine LR, early stopping, and a Δ
table against stored reference AUROCs (:71-77). bf16 via the standard dtype
flag; the whole step is one jit.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..config import DEFAULT_PATHOLOGY_LABELS
from ..models.layers import MultiHeadAttention
from ..models.trajectory import LocalTrajectoryEncoder
from ..ops import metrics as M
from ..ops.losses import masked_per_label_bce
from .common import add_analysis_flags, gather_host_windows, \
    load_analysis_data

# Reference TS-branch AUROCs for the 4-label era (train_trajectory_probe.py:72-75)
REFERENCE_AUROCS = {"label_edema": 0.641, "label_cardiomegaly": 0.634,
                    "label_effusion": 0.609, "label_pneumonia": 0.604}


class TrajectoryPathologyProbe(nn.Module):
    """Trajectory tokens → K pathology queries (masked cross-attn + self) →
    per-label logits (reference TrajectoryPathologyProbe :98-167)."""
    n_vars: int
    n_timesteps: int = 24
    n_pathologies: int = 7
    d_model: int = 128
    n_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x_ts, train: bool = False):
        tokens, pad = LocalTrajectoryEncoder(
            self.n_vars, self.n_timesteps, self.d_model,
            self.dropout, name="encoder")(x_ts, train=train,
                                          return_padding_mask=True)
        B = tokens.shape[0]
        q = self.param("pathology_queries", nn.initializers.normal(0.02),
                       (self.n_pathologies, self.d_model), jnp.float32)
        q = jnp.broadcast_to(q.astype(tokens.dtype),
                             (B, self.n_pathologies, self.d_model))
        h = q + MultiHeadAttention(self.n_heads, dropout=self.dropout,
                                   name="cross")(
            q, tokens, train=train, key_padding_mask=pad)
        h = h + MultiHeadAttention(self.n_heads, dropout=self.dropout,
                                   name="self")(h, h, train=train)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(h).astype(h.dtype)
        logits = nn.Dense(1, dtype=h.dtype, param_dtype=jnp.float32,
                          name="head")(h).squeeze(-1)
        bias = self.param("label_bias", nn.initializers.zeros,
                          (self.n_pathologies,), jnp.float32)
        return logits.astype(jnp.float32) + bias[None, :]


def train_probe(anchor_ds, labels, n_vars: int, d_model: int = 128,
                epochs: int = 20, batch_size: int = 64, lr: float = 1e-3,
                patience: int = 5, seed: int = 0) -> dict:
    model = TrajectoryPathologyProbe(n_vars, anchor_ds.n_timesteps,
                                     len(labels), d_model)
    a = anchor_ds.anchor
    T = anchor_ds.n_timesteps

    x0, _ = gather_host_windows(anchor_ds, anchor_ds.splits["train"][:2])
    variables = jax.jit(model.init)({"params": jax.random.key(seed)},
                                    jnp.asarray(x0))
    params = variables["params"]
    steps_per_epoch = max(len(anchor_ds.splits["train"]) // batch_size, 1)
    tx = optax.adamw(optax.cosine_decay_schedule(lr,
                                                 steps_per_epoch * epochs),
                     weight_decay=1e-4)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x_ts, y, m, rng):
        def loss(p):
            logits = model.apply({"params": p}, x_ts, train=True,
                                 rngs={"dropout": rng})
            return masked_per_label_bce(logits, y, m).sum()
        l, g = jax.value_and_grad(loss)(params)
        up, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, l

    @jax.jit
    def predict(params, x_ts):
        return model.apply({"params": params}, x_ts, train=False)

    def evaluate(params, split):
        idx = anchor_ds.splits[split]
        logits = []
        for i in range(0, len(idx), batch_size):
            x, _ = gather_host_windows(anchor_ds, idx[i:i + batch_size])
            logits.append(np.asarray(predict(params, jnp.asarray(x))))
        logits = np.concatenate(logits)
        rows = M.masked_multilabel_metrics(a["y_multi"][idx],
                                           a["y_multi_mask"][idx],
                                           {"ts": logits})
        return M.macro_mean(rows, "ts_auroc"), rows

    rng = jax.random.key(seed + 1)
    best, best_rows, bad = -1.0, None, 0
    for epoch in range(epochs):
        order = np.random.default_rng(seed + epoch).permutation(
            anchor_ds.splits["train"])
        bs = min(batch_size, max(len(order), 1))
        n = len(order) - len(order) % bs
        for i in range(0, n, bs):
            idx = order[i:i + bs]
            x, _ = gather_host_windows(anchor_ds, idx)
            rng, sub = jax.random.split(rng)
            params, opt_state, l = step(
                params, opt_state, jnp.asarray(x),
                jnp.asarray(a["y_multi"][idx]),
                jnp.asarray(a["y_multi_mask"][idx]), sub)
        val, rows = evaluate(params, "val")
        if val > best:
            best, best_rows, bad = val, rows, 0
            best_params = jax.tree.map(np.asarray, params)
        else:
            bad += 1
            if bad >= patience:
                break
    test, test_rows = evaluate(jax.tree.map(jnp.asarray, best_params), "test")
    return {"val_macro_auroc": best, "test_macro_auroc": test,
            "test_per_label": test_rows, "best_params": best_params}


def main(argv=None):
    p = argparse.ArgumentParser("trajectory-encoder TS-only probe")
    add_analysis_flags(p, needs_ckpt=False)
    p.add_argument("--d_model", type=int, default=128)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args(argv)
    _, meta, anchor_ds, dcfg = load_analysis_data(args)
    result = train_probe(anchor_ds, dcfg.pathology_labels, meta.n_variables,
                         args.d_model, args.epochs, args.batch_size, args.lr,
                         seed=args.seed)
    print(f"val macro AUROC:  {result['val_macro_auroc']:.4f}")
    print(f"test macro AUROC: {result['test_macro_auroc']:.4f}")
    print(f"{'label':<22s} {'AUROC':>7s} {'ref':>7s} {'delta':>7s}")
    for k, lbl in enumerate(dcfg.pathology_labels):
        au = result["test_per_label"][k]["ts_auroc"]
        ref = REFERENCE_AUROCS.get(lbl, float("nan"))
        print(f"{lbl:<22s} {au:>7.4f} {ref:>7.3f} {au - ref:>+7.4f}")
    os.makedirs(args.out_dir, exist_ok=True)
    # best-probe checkpoint + test metrics file (reference
    # train_trajectory_probe.py:351-358, :378-379)
    from flax import serialization
    best_params = result.pop("best_params")
    ckpt_path = os.path.join(args.out_dir, "trajectory_probe_best.msgpack")
    with open(ckpt_path, "wb") as f:
        f.write(serialization.to_bytes(best_params))
    with open(ckpt_path + ".config.json", "w") as f:
        json.dump({"labels": list(dcfg.pathology_labels),
                   "d_model": args.d_model, "epochs": args.epochs,
                   "lr": args.lr, "seed": args.seed,
                   "val_macro_auroc": result["val_macro_auroc"]},
                  f, indent=2, default=float)
    with open(os.path.join(args.out_dir, "trajectory_probe.json"), "w") as f:
        json.dump(result, f, indent=2, default=float)
    with open(os.path.join(args.out_dir, "test_metrics.json"), "w") as f:
        json.dump({"test_macro_auroc": result["test_macro_auroc"],
                   "test_per_label": result["test_per_label"]},
                  f, indent=2, default=float)
    return result


if __name__ == "__main__":
    main()
