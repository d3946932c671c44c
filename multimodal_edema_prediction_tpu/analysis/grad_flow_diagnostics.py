"""Read-only gradient-flow diagnostics for the dual-branch teacher.

Reference: ``analysis/grad_flow_diagnostics.py:234-610`` (also invoked
in-loop by the trainer every N epochs, trainer.py:684-705). Reports, without
taking an optimizer step:

- per-branch (img/ts/fus) objective gradients w.r.t. the shared pathology
  queries: losses, α weights, raw and α-weighted norms, cosine of each
  weighted branch gradient to the total update (reference :472-482);
- pairwise gradient cosines of the batch-mean gradients plus the per-batch
  img–ts cosine mean and negative-batch fraction (:373-375, :581-591);
- fusion-token sensitivity: ‖∂fus_loss/∂I‖ and ‖∂fus_loss/∂T_k‖ on the
  post-self-attention fusion tokens, raw and scale-normalized
  (‖g_i‖·‖token_i‖ per sample, :188-196), aggregate and per label
  (:389-419) — realized with a zero-perturbation hook (``token_eps``) on the
  perceiver so ``jax.jacrev`` differentiates w.r.t. the intermediates;
- per-label query-gradient breakdown: per-branch norms, pairwise cosines,
  α-weighted total, and the own-query fraction — how much of label k's
  gradient lands on query row k (:498-549);
- modality-input sensitivity: ‖∂branch_loss/∂ts_windows‖ vs
  ‖∂branch_loss/∂pixels‖ — for residual fusion the fusion→pixels path must
  be ~0 because the image anchor is stop-gradient'd (this repo's addition);
- query geometry: prototype norms, raw Gram, and the *effective* query Grams
  after each branch's LayerNorm + W_Q projection, with the image-vs-TS Gram
  gap ‖G_img − G_ts‖/K (:551-573, :596-608).

Everything per batch comes out of ONE jitted step: a ``jax.jacrev`` of the
[3 branches, K labels] weighted per-label loss matrix w.r.t. (queries,
eps_img, eps_ts). The backward never traverses the ViT/DuETT encoders for
those jacobians (the queries and token perturbations live in the perceiver),
so the 3K vjp passes are cheap; only the input-sensitivity jacobian (3
cotangents) runs through the encoders.

Artifacts: ``grad_flow_report.txt`` + ``grad_flow_report.json`` in
``--out_dir`` (reference :821-828).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.duett import feats_to_input
from ..ops.losses import masked_per_label_bce
from .common import add_analysis_flags, gather_host_windows, \
    load_analysis_data, load_teacher

BRANCHES = ("img", "ts", "fus")
_LOGIT_KEY = {"img": "img_logits", "ts": "ts_logits", "fus": "fusion_logits"}
_EPS = 1e-12


def _cos(a, b):
    a, b = a.ravel(), b.ravel()
    return jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + _EPS)


def _cosine_matrix(rows: jnp.ndarray) -> jnp.ndarray:
    rows = rows.astype(jnp.float32)
    rows = rows / (jnp.linalg.norm(rows, axis=-1, keepdims=True) + _EPS)
    return rows @ rows.T


def _effective_queries(block_params: dict, q: jnp.ndarray) -> jnp.ndarray:
    """Apply a PerceiverBlock's norm_q LayerNorm and the attention W_Q
    (reference ``_effective_queries``, :211-227)."""
    ln = block_params["norm_q"]
    mu = q.mean(axis=-1, keepdims=True)
    var = ((q - mu) ** 2).mean(axis=-1, keepdims=True)
    normed = (q - mu) / jnp.sqrt(var + 1e-6)
    normed = normed * ln["scale"] + ln["bias"]
    proj = block_params["attn"]["q"]
    out = normed @ proj["kernel"]
    if "bias" in proj:
        out = out + proj["bias"]
    return out


def _query_banks(perc: dict):
    """→ (names tuple, stacked banks [NB, K, D]). Shared layout (active
    reference, ``shared_queries``) or the independent two-bank layout of the
    event variant (reference ``_find_pathology_query_banks``, :70-90:
    image_queries + temporal_queries preferred, shared as fallback)."""
    if "shared_queries" in perc:
        return ("shared_queries",), jnp.asarray(
            perc["shared_queries"], jnp.float32)[None]
    return ("image_queries", "temporal_queries"), jnp.stack(
        [jnp.asarray(perc["image_queries"], jnp.float32),
         jnp.asarray(perc["temporal_queries"], jnp.float32)])


def _effective_event_queries(event_cross: dict, q: jnp.ndarray
                             ) -> jnp.ndarray:
    """event_query_norm(event_query_proj(q)) — the event variant's TS query
    path (reference grad_flow_diagnostics.py:563-571; the analysis suite
    dispatches on the presence of ``event_query_proj``)."""
    proj = event_cross["event_query_proj"]
    h = q @ proj["kernel"]
    if "bias" in proj:
        h = h + proj["bias"]
    ln = event_cross["event_query_norm"]
    mu = h.mean(axis=-1, keepdims=True)
    var = ((h - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((h - mu) / jnp.sqrt(var + 1e-6)) * ln["scale"] + ln["bias"]


def query_geometry(params: dict) -> dict:
    """Deterministic at the checkpoint — no loader averaging needed
    (reference :551-573)."""
    perc = params["perceiver"]
    names, banks = _query_banks(perc)
    img_q, ts_q = banks[0], banks[-1]
    K = ts_q.shape[0]
    raw_gram = _cosine_matrix(ts_q)
    img_eff = _effective_queries(perc["img_cross"], img_q)
    if "event_cross" in perc:
        ts_eff = _effective_event_queries(perc["event_cross"], ts_q)
    else:
        ts_eff = _effective_queries(perc["ts_cross"], ts_q)
    img_gram = _cosine_matrix(img_eff)
    ts_gram = _cosine_matrix(ts_eff)
    gap = jnp.linalg.norm(img_gram - ts_gram) / K
    return {
        "prototype_norms": np.linalg.norm(np.asarray(ts_q),
                                          axis=-1).tolist(),
        "raw_cosine": np.asarray(raw_gram).tolist(),
        "image_effective_cosine": np.asarray(img_gram).tolist(),
        "ts_effective_cosine": np.asarray(ts_gram).tolist(),
        "image_ts_gram_gap": float(gap),
        # legacy scalar kept from the round-1 report: ‖QQᵀ − I‖ of the
        # row-normalized bank
        "query_gram_gap": float(jnp.linalg.norm(raw_gram - jnp.eye(K))),
    }


def make_diag_step(model, image_source: Callable, label_weights=None):
    """Returns a jitted fn computing all per-batch diagnostics."""

    def _per_label_mat(variables, x_in, xs, times, pixels, y, mask, lw,
                      token_eps):
        # return_attn=True exposes img_tokens/ts_tokens, mirroring the
        # reference's diagnostic forward (grad_flow_diagnostics.py:334-340)
        out = model.apply({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                          x_in, xs, times, pixels, train=False,
                          return_attn=True, token_eps=token_eps)
        per = jnp.stack([masked_per_label_bce(out[_LOGIT_KEY[b]], y, mask)
                         for b in BRANCHES])                    # [3, K]
        return lw[None, :] * per, out

    @jax.jit
    def step(variables, x_ts, x_static, batch):
        pixels = image_source(batch)
        times = batch["bin_ends"]
        y, mask = batch["y_multi"], batch["y_multi_mask"]
        x_in, xs = feats_to_input(None, x_ts, x_static)
        params = variables["params"]
        bank_names, q0 = _query_banks(params["perceiver"])
        _, K, D = q0.shape                      # [NB, K, D]
        B = y.shape[0]
        lw = (jnp.ones(K, jnp.float32) if label_weights is None
              else jnp.asarray(label_weights, jnp.float32))
        eps0 = jnp.zeros((B, K, D), jnp.float32)

        def f(q, eps_i, eps_t):
            p = dict(params)
            p["perceiver"] = dict(p["perceiver"]) | {
                name: q[i] for i, name in enumerate(bank_names)}
            m, out = _per_label_mat(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x_in, xs, times, pixels, y, mask, lw, (eps_i, eps_t))
            return m, (m, out)

        (jac_q, jac_ei, jac_et), (wper, fwd_out) = jax.jacrev(
            f, argnums=(0, 1, 2), has_aux=True)(q0, eps0, eps0)
        # jac_q: [3, K_label, NB, K_query, D]; jac_e*: [3, K_label, B, K, D]

        out = {"wper": wper,                                   # [3, K]
               "jac_q": jac_q,
               "valid_per_label": mask.astype(jnp.float32).sum(axis=0)}

        # --- fusion-token sensitivity (fus branch only, reference :389-419)
        tok_i = fwd_out["img_tokens"].astype(jnp.float32).reshape(B, -1)
        tok_t = fwd_out["ts_tokens"].astype(jnp.float32).reshape(B, -1)
        tok_i_norm = jnp.linalg.norm(tok_i, axis=1)            # [B]
        tok_t_norm = jnp.linalg.norm(tok_t, axis=1)
        # per-label per-sample grad norms on each token bank: [K, B]
        gi = jnp.linalg.norm(jac_ei[2].reshape(K, B, -1), axis=-1)
        gt = jnp.linalg.norm(jac_et[2].reshape(K, B, -1), axis=-1)
        # aggregate fus-loss grads = sum over labels of per-label grads
        agg_i = jnp.linalg.norm(jac_ei[2].sum(0).reshape(B, -1), axis=-1)
        agg_t = jnp.linalg.norm(jac_et[2].sum(0).reshape(B, -1), axis=-1)
        out["fus_sens"] = jnp.stack([
            agg_i.sum(), agg_t.sum(),
            (agg_i * tok_i_norm).sum(), (agg_t * tok_t_norm).sum()])
        out["fus_sens_label"] = jnp.stack([
            gi.sum(1), gt.sum(1),
            (gi * tok_i_norm[None, :]).sum(1),
            (gt * tok_t_norm[None, :]).sum(1)])                # [4, K]

        # --- modality-input sensitivity: 3 branch totals w.r.t. raw inputs
        def totals(x_ts_in, px):
            xi, xsi = feats_to_input(None, x_ts_in, x_static)
            m, _ = _per_label_mat(variables, xi, xsi, times, px, y, mask,
                                  lw, None)
            return m.sum(axis=1)                               # [3]

        g_ts, g_px = jax.jacrev(totals, argnums=(0, 1))(x_ts, pixels)
        out["ts_input_grad"] = jnp.linalg.norm(
            g_ts.reshape(3, -1).astype(jnp.float32), axis=1)
        out["px_input_grad"] = jnp.linalg.norm(
            g_px.reshape(3, -1).astype(jnp.float32), axis=1)

        # per-batch img–ts cosine of aggregate query grads (:373-375)
        agg = jac_q.sum(axis=1)                                # [3, K, D]
        out["batch_img_ts_cos"] = _cos(agg[0], agg[1])
        return out

    return step


def run_diagnostics(model, params, batch_stats, anchor_ds, image_source,
                    split: str = "val", batch_size: int = 32,
                    n_batches: int = 4,
                    alphas: tuple = (0.5, 0.5, 1.0),
                    label_weights=None,
                    label_names: Optional[Sequence[str]] = None) -> dict:
    if getattr(model.cfg, "perceiver_type", "dual_patch") not in (
            "dual_patch", "dual_patch_event"):
        raise ValueError(
            f"grad-flow diagnostics target the patch teacher modes (got "
            f"perceiver_type={model.cfg.perceiver_type!r}) — the reference "
            "CLI enforces the same (grad_flow_diagnostics.py:782-783)")
    step = make_diag_step(model, image_source, label_weights)
    variables = {"params": params, "batch_stats": batch_stats}
    a = anchor_ds.anchor
    idx_all = anchor_ds.splits[split]

    sums: dict = {}
    cos_list: list = []
    nb, n_samples = 0, 0
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
        out = jax.tree.map(np.asarray,
                           step(variables, jnp.asarray(x_ts),
                                jnp.asarray(x_static),
                                jax.tree.map(jnp.asarray, batch)))
        cos_list.append(float(out.pop("batch_img_ts_cos")))
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + v.astype(np.float64)
        nb += 1
        n_samples += len(idx)
    if nb == 0:
        raise RuntimeError("the diagnostic split yielded no full batches")

    K = sums["jac_q"].shape[1]
    n_banks = sums["jac_q"].shape[2]
    # per-branch "own" query bank: image branch reads bank 0, ts/fus the
    # last (with the shared layout NB=1 they coincide — reference :70-90)
    bank_of = {"img": 0, "ts": n_banks - 1, "fus": n_banks - 1}
    if label_names is None:
        label_names = [f"label_{k}" for k in range(K)]
    alphas_d = dict(zip(BRANCHES, alphas))

    mean_jac = sums["jac_q"] / nb                    # [3, K, NB, K, D]
    mean_agg = mean_jac.sum(axis=1)                  # [3, NB, K, D]
    losses = sums["wper"].sum(axis=1) / nb           # [3]
    valid = sums["valid_per_label"]                  # [K]

    def norm(x):
        return float(np.linalg.norm(np.asarray(x).ravel()))

    def cosn(x, y):
        d = norm(x) * norm(y)
        return float(np.dot(np.asarray(x).ravel(), np.asarray(y).ravel())
                     / d) if d > _EPS else 0.0

    weighted = {b: alphas_d[b] * mean_agg[j]
                for j, b in enumerate(BRANCHES)}
    total_update = sum(weighted.values())
    branch_report = {}
    for j, b in enumerate(BRANCHES):
        branch_report[b] = {
            "loss": float(losses[j]),
            "alpha": float(alphas_d[b]),
            "raw_grad_norm": norm(mean_agg[j]),
            "weighted_grad_norm": norm(weighted[b]),
            "cos_to_total_update": cosn(weighted[b], total_update),
        }

    fus_sens = sums["fus_sens"] / max(n_samples, 1)  # [4]
    sens_report = {
        "img_raw": float(fus_sens[0]), "ts_raw": float(fus_sens[1]),
        "img_scaled": float(fus_sens[2]), "ts_scaled": float(fus_sens[3]),
    }
    sens_report["raw_img_over_ts"] = sens_report["img_raw"] / max(
        sens_report["ts_raw"], _EPS)
    sens_report["scaled_img_over_ts"] = sens_report["img_scaled"] / max(
        sens_report["ts_scaled"], _EPS)

    label_sens = sums["fus_sens_label"]              # [4, K]
    per_label = []
    for k in range(K):
        g = {b: mean_jac[j, k] for j, b in enumerate(BRANCHES)}
        full = {b: norm(g[b]) for b in BRANCHES}
        # own row = query row k in the branch's own bank (shared layout:
        # the single bank; independent layout: img→image_queries,
        # ts/fus→temporal_queries)
        own = {b: float(np.linalg.norm(mean_jac[j, k, bank_of[b], k]))
               for j, b in enumerate(BRANCHES)}
        total_k = sum(alphas_d[b] * g[b] for b in BRANCHES)
        vk = max(float(valid[k]), 1.0)
        ls = {key: float(label_sens[i, k] / vk)
              for i, key in enumerate(
                  ("img_raw", "ts_raw", "img_scaled", "ts_scaled"))}
        ls["scaled_img_over_ts"] = ls["img_scaled"] / max(ls["ts_scaled"],
                                                          _EPS)
        per_label.append({
            "label": str(label_names[k]) if k < len(label_names)
            else f"label_{k}",
            "valid_samples": int(round(float(valid[k]))),
            "img_grad_norm": full["img"],
            "ts_grad_norm": full["ts"],
            "fus_grad_norm": full["fus"],
            "img_ts_cos": cosn(g["img"], g["ts"]),
            "img_fus_cos": cosn(g["img"], g["fus"]),
            "ts_fus_cos": cosn(g["ts"], g["fus"]),
            "weighted_total_grad_norm": norm(total_k),
            "img_own_query_fraction": own["img"] / max(full["img"], _EPS),
            "ts_own_query_fraction": own["ts"] / max(full["ts"], _EPS),
            "fus_own_query_fraction": own["fus"] / max(full["fus"], _EPS),
            "fusion_token_sensitivity": ls,
        })

    geometry = query_geometry(
        jax.tree.map(np.asarray, params) if not isinstance(params, dict)
        else params)

    report = {
        "query_parameter": "perceiver/shared_queries" if n_banks == 1 else
        "perceiver/image_queries+perceiver/temporal_queries",
        "query_layout": "shared" if n_banks == 1 else "independent",
        "batches": nb,
        "samples": n_samples,
        "n_batches": nb,   # legacy key
        "branch": branch_report,
        "pairwise_gradient_cosine": {
            "img_ts": cosn(mean_agg[0], mean_agg[1]),
            "img_fus": cosn(mean_agg[0], mean_agg[2]),
            "ts_fus": cosn(mean_agg[1], mean_agg[2]),
            "img_ts_batch_mean": float(np.mean(cos_list)),
            "img_ts_negative_batch_fraction": float(
                np.mean([c < 0 for c in cos_list])),
        },
        "weighted_img_over_ts": branch_report["img"]["weighted_grad_norm"]
        / max(branch_report["ts"]["weighted_grad_norm"], _EPS),
        "fusion_token_sensitivity": sens_report,
        "per_label": per_label,
        "query_geometry": geometry,
    }

    # ---- flat legacy keys (kept stable for the in-loop logger and tests)
    for j, b in enumerate(BRANCHES):
        report[f"{b}_query_grad_norm"] = norm(mean_agg[j])
        report[f"{b}_ts_input_grad"] = float(sums["ts_input_grad"][j] / nb)
        report[f"{b}_px_input_grad"] = float(sums["px_input_grad"][j] / nb)
    report["img_ts_query_grad_cos"] = report[
        "pairwise_gradient_cosine"]["img_ts"]
    report["img_fus_query_grad_cos"] = report[
        "pairwise_gradient_cosine"]["img_fus"]
    report["ts_fus_query_grad_cos"] = report[
        "pairwise_gradient_cosine"]["ts_fus"]
    report["query_gram_gap"] = geometry["query_gram_gap"]
    img_rows = np.linalg.norm(mean_agg[0, bank_of["img"]], axis=-1)
    ts_rows = np.linalg.norm(mean_agg[1, bank_of["ts"]], axis=-1)
    report["per_label_img_query_grad"] = img_rows.tolist()
    report["per_label_ts_query_grad"] = ts_rows.tolist()
    report["per_label_img_dominance"] = (
        img_rows / (img_rows + ts_rows + _EPS)).tolist()
    return report


def diagnostics_to_log_dict(r: dict, labels=None,
                            prefix: str = "grad_diag") -> dict:
    """Flatten a diagnostics report into wandb/TensorBoard scalar keys — the
    reference's ``gradient_diagnostics_to_log_dict``
    (grad_flow_diagnostics.py:705-751)."""
    out = {}
    for b, item in r.get("branch", {}).items():
        for key in ("loss", "raw_grad_norm", "weighted_grad_norm",
                    "cos_to_total_update"):
            out[f"{prefix}/{b}/{key}"] = float(item[key])
    for key, v in r.get("pairwise_gradient_cosine", {}).items():
        out[f"{prefix}/cosine/{key}"] = float(v)
    if "weighted_img_over_ts" in r:
        out[f"{prefix}/dominance/weighted_img_over_ts"] = float(
            r["weighted_img_over_ts"])
    for key in ("raw_img_over_ts", "scaled_img_over_ts"):
        if key in r.get("fusion_token_sensitivity", {}):
            out[f"{prefix}/fusion_sensitivity/{key}"] = float(
                r["fusion_token_sensitivity"][key])
    if "query_geometry" in r:
        out[f"{prefix}/query_geometry/image_ts_gram_gap"] = float(
            r["query_geometry"]["image_ts_gram_gap"])
    for item in r.get("per_label", []):
        base = f"{prefix}/label/{item['label'].replace('/', '_')}"
        for key in ("img_grad_norm", "ts_grad_norm", "fus_grad_norm",
                    "img_ts_cos"):
            out[f"{base}/{key}"] = float(item[key])
        out[f"{base}/fusion_scaled_img_over_ts"] = float(
            item["fusion_token_sensitivity"]["scaled_img_over_ts"])
    # flat legacy scalars (input sensitivity has no reference counterpart)
    for k, v in r.items():
        if isinstance(v, (int, float)) and k not in out:
            out[f"{prefix}/{k}"] = float(v)
        elif isinstance(v, (list, tuple)) and k.startswith("per_label_"):
            for i, x in enumerate(v):
                name = (labels[i].replace("/", "_")
                        if labels is not None and i < len(labels) else str(i))
                out[f"{prefix}/label/{name}/{k}"] = float(x)
    return out


def format_report(r: dict) -> str:
    """Human-readable console summary (reference
    ``format_gradient_diagnostics``, :613-702)."""
    lines = [
        f"[grad-diag] parameter={r['query_parameter']} "
        f"layout={r['query_layout']} batches={r['batches']} "
        f"samples={r['samples']}",
        "",
        "branch      loss    alpha    ||g raw||   ||alpha*g||   cos(g,total)",
        "-------------------------------------------------------------------",
    ]
    for b in BRANCHES:
        item = r["branch"][b]
        lines.append(
            f"{b:<7} {item['loss']:>9.5f} {item['alpha']:>7.3f} "
            f"{item['raw_grad_norm']:>12.6g} "
            f"{item['weighted_grad_norm']:>13.6g} "
            f"{item['cos_to_total_update']:>14.5f}")
    c = r["pairwise_gradient_cosine"]
    s = r["fusion_token_sensitivity"]
    lines.extend([
        "",
        f"gradient cosine: img-ts={c['img_ts']:+.5f}  "
        f"img-fus={c['img_fus']:+.5f}  ts-fus={c['ts_fus']:+.5f}",
        f"batch img-ts cosine: mean={c['img_ts_batch_mean']:+.5f}  "
        f"negative_fraction={c['img_ts_negative_batch_fraction']:.3f}",
        f"weighted gradient dominance: "
        f"img/ts={r['weighted_img_over_ts']:.4f}",
        f"fusion token sensitivity: "
        f"raw img/ts={s['raw_img_over_ts']:.4f}  "
        f"scale-normalized img/ts={s['scaled_img_over_ts']:.4f}",
        "",
        "input sensitivity  |dL/dTS|   |dL/dPX|   (fus→PX must be ~0: "
        "residual fusion stop-grads the image anchor)",
    ])
    for b in BRANCHES:
        lines.append(f"  {b:<6s} {r[f'{b}_ts_input_grad']:>10.4f} "
                     f"{r[f'{b}_px_input_grad']:>10.4f}")
    lines.extend([
        "",
        "label                         ||g_img||   ||g_ts||  cos(i,t)  "
        "fusSens(i/t)  ownQ(img/ts/fus)",
        "-" * 100,
    ])
    for item in r["per_label"]:
        ts_sens = item["fusion_token_sensitivity"]
        lines.append(
            f"{item['label']:<28} "
            f"{item['img_grad_norm']:>10.5g} "
            f"{item['ts_grad_norm']:>10.5g} "
            f"{item['img_ts_cos']:>+9.4f} "
            f"{ts_sens['scaled_img_over_ts']:>13.4f} "
            f"{item['img_own_query_fraction']:.2f}/"
            f"{item['ts_own_query_fraction']:.2f}/"
            f"{item['fus_own_query_fraction']:.2f}")
    g = r["query_geometry"]
    lines.extend([
        "",
        "query geometry: prototype norms="
        + ", ".join(f"{v:.4f}" for v in g["prototype_norms"]),
        f"effective image-vs-TS Gram gap={g['image_ts_gram_gap']:.6f}",
        f"query Gram gap ||QQ^T - I|| = {g['query_gram_gap']:.4f}",
    ])
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser("gradient-flow diagnostics")
    add_analysis_flags(p)
    p.add_argument("--n_batches", type=int, default=4)
    p.add_argument("--alpha_img", type=float, default=0.5)
    p.add_argument("--alpha_ts", type=float, default=0.5)
    p.add_argument("--alpha_fus", type=float, default=1.0)
    args = p.parse_args(argv)
    if getattr(args, "cxr_feature_cache", "none") != "none":
        p.error("--cxr_feature_cache is not applicable here: the pixel-"
                "input sensitivity diagnostics (px_input_grad) differentiate "
                "the loss w.r.t. PIXELS, which the encode-once tier removes")
    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_image_source
    K = cfg.perceiver.n_pathologies
    labels = list(dcfg.pathology_labels)[:K]
    r = run_diagnostics(model, params, batch_stats, anchor_ds,
                        make_image_source(args, anchor_ds, cfg.vit),
                        args.split, args.batch_size, args.n_batches,
                        alphas=(args.alpha_img, args.alpha_ts,
                                args.alpha_fus),
                        label_names=labels)
    txt = format_report(r)
    print(txt)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "grad_flow_report.txt"), "w") as f:
        f.write(txt + "\n")
    for name in ("grad_flow.json", "grad_flow_report.json"):
        with open(os.path.join(args.out_dir, name), "w") as f:
            json.dump(r, f, indent=2, default=float)
    return r


if __name__ == "__main__":
    main()
