"""Figure suite for a trained teacher.

Reference: ``analysis/visualize_pathology.py`` — five artifact families:

1. patch-attention overlays on positive CXRs (:208-281)
2. K×T time-series attention heatmaps (:287-361)
3. query cosine-similarity matrices (:367-434)
4. 2-D embedding (t-SNE; reference prefers UMAP, unavailable here) of fusion
   tokens, raw and per-sample-centered (:440-510)
5. per-label img/ts/fusion gap bars + CSV (:516-598)

All outputs land in ``--out_dir`` as PNG/CSV.
"""
from __future__ import annotations

import argparse
import csv
import math
import os

import numpy as np

from ..ops import metrics as M
from ..train import engine
from .common import (add_analysis_flags, gather_host_windows,
                     load_analysis_data, load_teacher)


def _collect(model, params, batch_stats, anchor_ds, split, batch_size,
             image_source, max_batches=8, feature_source=None):
    eval_step = engine.make_teacher_eval_from_windows(
        model, image_source=image_source, return_attn=True,
        feature_source=feature_source)
    a = anchor_ds.anchor
    idx_all = anchor_ds.splits[split]
    acc = {k: [] for k in ("img_attn", "ts_attn", "fus_tok", "img", "ts",
                           "fus", "y", "mask", "image_ids")}
    if 0 < len(idx_all) < batch_size:   # tiny cohort: one short batch
        batch_size = len(idx_all)
    n = min(len(idx_all) - len(idx_all) % batch_size,
            max_batches * batch_size)
    if n == 0:
        raise SystemExit(
            f"split '{split}' has {len(idx_all)} anchors < batch_size="
            f"{batch_size}: no full batch to visualize — lower --batch_size "
            f"or use a larger cohort")
    uses_event = False
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
        acc["img_attn"].append(np.asarray(o["img_attn"]))
        # event variant outputs per-variable ``event_attn`` instead of the
        # per-hour ``ts_attn`` (reference visualize_pathology.py:291-292
        # selects by the presence of event_query_proj)
        acc["ts_attn"].append(np.asarray(
            o["event_attn"] if "event_attn" in o else o["ts_attn"]))
        acc["fus_tok"].append(np.asarray(o["fusion_tokens"]))
        acc["img"].append(np.asarray(o["img_logits"]))
        acc["ts"].append(np.asarray(o["ts_logits"]))
        acc["fus"].append(np.asarray(o["fusion_logits"]))
        acc["y"].append(a["y_multi"][idx])
        acc["mask"].append(a["y_multi_mask"][idx])
        acc["image_ids"].append(a["image_ids"][idx])
        uses_event = "event_attn" in o
    res = {k: np.concatenate(v) for k, v in acc.items()}
    res["attn_axis"] = "variable" if uses_event else "hour"
    return res


def plot_attention_overlays(data, labels, image_size, out_dir,
                            n_examples=4):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ..data.synthetic import synthetic_image_batch

    n_patches = data["img_attn"].shape[-1]
    g = int(math.sqrt(n_patches))
    pos = np.nonzero(data["y"][:, 0] * data["mask"][:, 0])[0][:n_examples]
    if len(pos) == 0:
        return
    imgs = synthetic_image_batch(None, data["image_ids"][pos],
                                 data["y"][pos], size=image_size)
    fig, axes = plt.subplots(len(pos), 2, figsize=(6, 3 * len(pos)),
                             squeeze=False)
    for r, i in enumerate(pos):
        axes[r][0].imshow(imgs[r], cmap="gray")
        axes[r][0].set_title(f"id={data['image_ids'][i]}")
        attn = data["img_attn"][i, 0].reshape(g, g)
        axes[r][1].imshow(attn, cmap="viridis")
        axes[r][1].set_title(f"{labels[0]} attention")
        for ax in axes[r]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "patch_attention_overlays.png"),
                dpi=100)
    plt.close(fig)


def plot_ts_attention_heatmap(data, labels, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    mean_attn = data["ts_attn"].mean(axis=0)     # [K, T] or [K, V] (event)
    fig, ax = plt.subplots(figsize=(8, 4))
    im = ax.imshow(mean_attn, aspect="auto", cmap="magma")
    ax.set_yticks(range(len(labels)))
    ax.set_yticklabels([l.replace("label_", "") for l in labels])
    ax.set_xlabel("hour token" if data.get("attn_axis") != "variable"
                  else "clinical variable (full 24 h trajectory)")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "ts_attention_heatmap.png"), dpi=100)
    plt.close(fig)


def plot_query_cosine(params, labels, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    perc = params["perceiver"]
    if "shared_queries" in perc:
        banks = {"": perc["shared_queries"]}
    else:
        # independent image/temporal banks (dual_patch_event; the two-bank
        # layout of the reference's _find_pathology_query_banks, :70-90)
        banks = {"_image": perc["image_queries"],
                 "_temporal": perc["temporal_queries"]}
    names = [l.replace("label_", "") for l in labels]
    for suffix, bank in banks.items():
        q = np.asarray(bank)
        qn = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        cos = qn @ qn.T
        fig, ax = plt.subplots(figsize=(5, 4))
        im = ax.imshow(cos, vmin=-1, vmax=1, cmap="coolwarm")
        ax.set_xticks(range(len(names)))
        ax.set_xticklabels(names, rotation=45, ha="right")
        ax.set_yticks(range(len(names)))
        ax.set_yticklabels(names)
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"query_cosine{suffix}.png"),
                    dpi=100)
        plt.close(fig)
        np.savetxt(os.path.join(out_dir, f"query_cosine{suffix}.csv"), cos,
                   delimiter=",")


def plot_token_embedding(data, labels, out_dir, perplexity=15):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE
    tok = data["fus_tok"][:, 0, :]          # main-label query token
    y = data["y"][:, 0]
    for centered, name in ((False, "raw"), (True, "centered")):
        x = tok - data["fus_tok"].mean(axis=1) if centered else tok
        if len(x) <= perplexity + 1:
            continue
        emb = TSNE(n_components=2, perplexity=min(perplexity, len(x) // 3),
                   init="pca", random_state=0).fit_transform(x)
        fig, ax = plt.subplots(figsize=(5, 4))
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=y, cmap="coolwarm", s=8)
        fig.colorbar(sc)
        ax.set_title(f"fusion tokens ({name})")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"fusion_tokens_{name}.png"),
                    dpi=100)
        plt.close(fig)


def projection_filename(mode: str) -> str:
    """Reference main() (:623-628): figure name varies by perceiver mode —
    fusion tokens for dual_patch, ts tokens for dual, stage4 otherwise."""
    if mode in ("dual_patch", "dual_patch_event"):
        return "fusion_token_umap.png"
    if mode == "dual":
        return "ts_token_umap.png"
    return "stage4_token_umap.png"


def plot_query_token_projection(data, labels, out_dir, dim_reduce="auto",
                                mode="dual_patch"):
    """Reference ``viz_stage4_projection`` (:440-510): embed ALL N×K
    pathology-query fusion tokens in 2-D, colored by pathology, raw and
    per-sample-centered side by side — centering removes the sample-level
    component so remaining structure must be pathology-specific (clusters =
    the queries learned distinct readouts). ``dim_reduce`` mirrors the
    reference's ``--dim_reduce`` flag (:68-69): 'auto'/'umap' use the
    ``umap-learn`` package when importable, else the in-tree implementation
    of the same algorithm (``analysis/umap_impl.py``); 'tsne' forces the
    reference's t-SNE fallback."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    tokens = data["fus_tok"]                       # [N, K, d]
    N, K, d = tokens.shape
    if N * K < 12:
        return
    color_ids = np.tile(np.arange(K), N)
    centered = tokens - tokens.mean(axis=1, keepdims=True)
    flat_raw = tokens.reshape(N * K, d)
    flat_cen = centered.reshape(N * K, d)

    if dim_reduce == "tsne":
        from sklearn.manifold import TSNE
        reducer_name = "tsne"

        def _fit(flat):
            perp = min(30, max(5, flat.shape[0] // 4 - 1))
            return TSNE(n_components=2, random_state=42, init="pca",
                        perplexity=perp).fit_transform(flat)
    else:
        try:
            import umap
        except ImportError:
            from . import umap_impl as umap
        reducer_name = "umap"

        def _fit(flat):
            return umap.UMAP(n_components=2,
                             random_state=42).fit_transform(flat)

    names = [l.replace("label_", "") for l in labels]
    cmap = plt.get_cmap("tab10")
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, (flat, tag) in zip(axes, ((flat_raw, "raw"),
                                      (flat_cen, "per-sample centered"))):
        proj = _fit(flat)
        for k in range(K):
            m = color_ids == k
            ax.scatter(proj[m, 0], proj[m, 1], s=10, alpha=0.5,
                       color=cmap(k % 10), label=names[k])
        ax.legend(fontsize=8, loc="best")
        ax.set_title(f"Fusion tokens — {tag} ({reducer_name.upper()})")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fname = projection_filename(mode)
    fig.savefig(os.path.join(out_dir, fname), dpi=120, bbox_inches="tight")
    # stable alias kept from earlier rounds' artifact layout
    fig.savefig(os.path.join(out_dir, "stage4_projection.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)


def gap_summary(data, labels, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rows = M.masked_multilabel_metrics(
        data["y"], data["mask"],
        {"img": data["img"], "ts": data["ts"], "fus": data["fus"]})
    names = [l.replace("label_", "") for l in labels]
    x = np.arange(len(names))
    fig, ax = plt.subplots(figsize=(9, 4))
    for off, key in ((-0.25, "img_auroc"), (0.0, "ts_auroc"),
                     (0.25, "fus_auroc")):
        ax.bar(x + off, [r[key] for r in rows], width=0.25,
               label=key.replace("_auroc", ""))
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=30, ha="right")
    ax.set_ylabel("AUROC")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "gap_summary.png"), dpi=100)
    plt.close(fig)
    with open(os.path.join(out_dir, "gap_summary.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["label"] + list(rows[0].keys()))
        w.writeheader()
        for name, r in zip(labels, rows):
            w.writerow({"label": name, **r})
    return rows


def main(argv=None):
    p = argparse.ArgumentParser("teacher visualization suite")
    add_analysis_flags(p)
    p.add_argument("--dim_reduce", type=str, default="auto",
                   choices=["auto", "umap", "tsne"],
                   help="stage4 token projection reducer (reference "
                        "visualize_pathology.py:68-69); auto = UMAP "
                        "(in-tree impl if the package is absent)")
    args = p.parse_args(argv)
    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_sources
    image_source, feature_source = make_sources(args, anchor_ds, model,
                                                params, cfg)
    data = _collect(model, params, batch_stats, anchor_ds, args.split,
                    args.batch_size, image_source,
                    args.max_batches or 8, feature_source=feature_source)
    os.makedirs(args.out_dir, exist_ok=True)
    labels = dcfg.pathology_labels
    plot_attention_overlays(data, labels, cfg.vit.image_size, args.out_dir)
    plot_ts_attention_heatmap(data, labels, args.out_dir)
    plot_query_cosine(params, labels, args.out_dir)
    plot_token_embedding(data, labels, args.out_dir)
    plot_query_token_projection(data, labels, args.out_dir,
                                dim_reduce=args.dim_reduce,
                                mode=cfg.perceiver_type)
    rows = gap_summary(data, labels, args.out_dir)
    print(f"figures + CSVs → {args.out_dir}")
    return rows


if __name__ == "__main__":
    main()
