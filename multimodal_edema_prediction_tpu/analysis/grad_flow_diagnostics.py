"""Read-only gradient-flow diagnostics for the dual-branch teacher.

Reference: ``analysis/grad_flow_diagnostics.py:234-610`` (also invoked
in-loop by the trainer every N epochs, trainer.py:684-705). Reports, without
taking an optimizer step:

- per-branch (img/ts/fus) loss gradients w.r.t. the shared pathology queries:
  norms + pairwise cosines (img–ts interference on the shared bank);
- modality-input sensitivity: ‖∂branch_loss/∂ts_windows‖ vs
  ‖∂branch_loss/∂pixels‖ (raw and scale-normalized) — for residual fusion the
  fusion→pixels path must be ~0 because the anchor is stop-gradient'd;
- query-geometry Gram gap: ‖QQᵀ − I‖ of the row-normalized query bank.
"""
from __future__ import annotations

import argparse
import json
import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.duett import feats_to_input
from ..ops.losses import masked_per_label_bce
from .common import add_analysis_flags, gather_host_windows, \
    load_analysis_data, load_teacher

BRANCHES = ("img", "ts", "fus")


def make_diag_step(model, image_source: Callable):
    """Returns a jitted fn computing all diagnostics for one batch."""

    def branch_loss(params, x_ts, x_static, times, pixels, y, mask, branch):
        x_in, xs = feats_to_input(None, x_ts, x_static)
        out = model.apply({"params": params["params"],
                           "batch_stats": params["batch_stats"]},
                          x_in, xs, times, pixels, train=False)
        return masked_per_label_bce(out[f"{branch}_logits"
                                        if branch != "fus"
                                        else "fusion_logits"],
                                    y, mask).sum()

    @jax.jit
    def step(variables, x_ts, x_static, batch):
        pixels = image_source(batch)
        times = batch["bin_ends"]
        y, mask = batch["y_multi"], batch["y_multi_mask"]
        out = {}
        q_grads = {}
        for branch in BRANCHES:
            # grad wrt shared queries
            g_params = jax.grad(branch_loss)(variables, x_ts, x_static,
                                             times, pixels, y, mask, branch)
            gq = g_params["params"]["perceiver"]["shared_queries"]
            q_grads[branch] = gq
            out[f"{branch}_query_grad_norm"] = jnp.linalg.norm(gq)
            # modality-input sensitivity
            g_ts = jax.grad(branch_loss, argnums=1)(
                variables, x_ts, x_static, times, pixels, y, mask, branch)
            g_px = jax.grad(branch_loss, argnums=4)(
                variables, x_ts, x_static, times, pixels, y, mask, branch)
            out[f"{branch}_ts_input_grad"] = jnp.linalg.norm(g_ts)
            out[f"{branch}_px_input_grad"] = jnp.linalg.norm(g_px)

        def cos(a, b):
            a, b = a.ravel(), b.ravel()
            return jnp.vdot(a, b) / (jnp.linalg.norm(a)
                                     * jnp.linalg.norm(b) + 1e-12)

        out["img_ts_query_grad_cos"] = cos(q_grads["img"], q_grads["ts"])
        out["img_fus_query_grad_cos"] = cos(q_grads["img"], q_grads["fus"])
        out["ts_fus_query_grad_cos"] = cos(q_grads["ts"], q_grads["fus"])

        # per-label breakdown on the shared query bank (reference :400-480):
        # row k of the query bank belongs to pathology k; img-vs-ts gradient
        # dominance per label shows which modality pulls each query.
        img_rows = jnp.linalg.norm(q_grads["img"], axis=-1)
        ts_rows = jnp.linalg.norm(q_grads["ts"], axis=-1)
        out["per_label_img_query_grad"] = img_rows
        out["per_label_ts_query_grad"] = ts_rows
        out["per_label_img_dominance"] = img_rows / (img_rows + ts_rows
                                                     + 1e-12)

        q = variables["params"]["perceiver"]["shared_queries"]
        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        gram = qn @ qn.T
        out["query_gram_gap"] = jnp.linalg.norm(gram - jnp.eye(q.shape[0]))
        return out

    return step


def run_diagnostics(model, params, batch_stats, anchor_ds, image_source,
                    split: str = "val", batch_size: int = 32,
                    n_batches: int = 4) -> dict:
    step = make_diag_step(model, image_source)
    variables = {"params": params, "batch_stats": batch_stats}
    a = anchor_ds.anchor
    idx_all = anchor_ds.splits[split]
    acc = {}
    nb = 0
    for i in range(0, min(len(idx_all), n_batches * batch_size), batch_size):
        idx = idx_all[i:i + batch_size]
        if len(idx) < batch_size:
            break
        x_ts, x_static = gather_host_windows(anchor_ds, idx)
        batch = {
            "image_ids": a["image_ids"][idx].astype(np.int32),
            "y_multi": a["y_multi"][idx],
            "y_multi_mask": a["y_multi_mask"][idx],
            "bin_ends": np.broadcast_to(
                anchor_ds.bin_ends,
                (len(idx), anchor_ds.n_timesteps)).copy(),
        }
        out = step(variables, jnp.asarray(x_ts), jnp.asarray(x_static),
                   jax.tree.map(jnp.asarray, batch))
        for k, v in out.items():
            v = np.asarray(v)
            acc[k] = acc.get(k, 0.0) + (float(v) if v.ndim == 0 else v)
        nb += 1
    return {k: (v / max(nb, 1)).tolist() if isinstance(v, np.ndarray)
            else v / max(nb, 1) for k, v in acc.items()} | {"n_batches": nb}


def diagnostics_to_log_dict(r: dict, labels=None,
                            prefix: str = "grad_diag") -> dict:
    """Flatten a diagnostics report into wandb/TensorBoard scalar keys —
    including the per-label query-gradient breakdown (the reference's
    ``gradient_diagnostics_to_log_dict``, grad_flow_diagnostics.py:705-751).
    """
    out = {}
    for k, v in r.items():
        if isinstance(v, (int, float)):
            out[f"{prefix}/{k}"] = float(v)
        elif isinstance(v, (list, tuple)):
            for i, x in enumerate(v):
                name = (labels[i].replace("/", "_")
                        if labels is not None and i < len(labels) else str(i))
                out[f"{prefix}/label/{name}/{k}"] = float(x)
    return out


def format_report(r: dict) -> str:
    lines = [f"{'branch':<6s} {'|dL/dQ|':>10s} {'|dL/dTS|':>10s} "
             f"{'|dL/dPX|':>10s}"]
    for b in BRANCHES:
        lines.append(f"{b:<6s} {r[f'{b}_query_grad_norm']:>10.4f} "
                     f"{r[f'{b}_ts_input_grad']:>10.4f} "
                     f"{r[f'{b}_px_input_grad']:>10.4f}")
    lines.append(f"query-grad cosines: img·ts={r['img_ts_query_grad_cos']:+.3f}"
                 f"  img·fus={r['img_fus_query_grad_cos']:+.3f}"
                 f"  ts·fus={r['ts_fus_query_grad_cos']:+.3f}")
    lines.append(f"query Gram gap ‖QQᵀ−I‖ = {r['query_gram_gap']:.4f}")
    dom = r.get("per_label_img_dominance")
    if dom is not None:
        lines.append("per-label img-gradient dominance on shared queries: "
                     + " ".join(f"{d:.2f}" for d in dom))
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser("gradient-flow diagnostics")
    add_analysis_flags(p)
    p.add_argument("--n_batches", type=int, default=4)
    args = p.parse_args(argv)
    if getattr(args, "cxr_feature_cache", "none") != "none":
        p.error("--cxr_feature_cache is not applicable here: the pixel-"
                "input sensitivity diagnostics (px_input_grad) differentiate "
                "the loss w.r.t. PIXELS, which the encode-once tier removes")
    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, _ = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_image_source
    r = run_diagnostics(model, params, batch_stats, anchor_ds,
                        make_image_source(args, anchor_ds, cfg.vit),
                        args.split, args.batch_size, args.n_batches)
    print(format_report(r))
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "grad_flow.json"), "w") as f:
        json.dump(r, f, indent=2, default=float)
    return r


if __name__ == "__main__":
    main()
