"""Oracle late-fusion probe on frozen unimodal logits.

Reference: ``analysis/logit_fusion_probe.py``. Upper-bounds what any fusion
rule could extract from the two branches' *logits* alone:

    per_label  per-pathology 2→1 linear head, image-passthrough init
               (weight [1, 0], bias 0) so training starts at the image branch
    linear     joint 2K→K linear map
    mlp        2K→64→K with GELU

All heads train with masked multi-label BCE on the train split's frozen
logits; evaluation reports per-label and macro AUROC vs the img/ts bases.
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
from ..ops.losses import masked_per_label_bce
from ..parallel import mesh as meshlib
from ..train import engine
from ..train.evaluator import collect_dual_outputs
from .common import add_analysis_flags, load_analysis_data, load_teacher

HEADS = ("per_label", "linear", "mlp")


def make_head(kind: str, K: int, rng):
    if kind == "per_label":
        # per-label [img, ts] → logit, image-passthrough init (:48-84)
        params = {"w": jnp.tile(jnp.array([[1.0], [0.0]]), (1, K)),
                  "b": jnp.zeros(K)}

        def fn(p, img, ts):
            return img * p["w"][0] + ts * p["w"][1] + p["b"]
    elif kind == "linear":
        params = {"w": 0.01 * jax.random.normal(rng, (2 * K, K)),
                  "b": jnp.zeros(K)}

        def fn(p, img, ts):
            return jnp.concatenate([img, ts], axis=1) @ p["w"] + p["b"]
    elif kind == "mlp":
        k1, k2 = jax.random.split(rng)
        params = {"w1": 0.1 * jax.random.normal(k1, (2 * K, 64)),
                  "b1": jnp.zeros(64),
                  "w2": 0.1 * jax.random.normal(k2, (64, K)),
                  "b2": jnp.zeros(K)}

        def fn(p, img, ts):
            h = jax.nn.gelu(jnp.concatenate([img, ts], axis=1) @ p["w1"]
                            + p["b1"])
            return h @ p["w2"] + p["b2"]
    else:
        raise ValueError(kind)
    return params, fn


def train_fusion_head(kind: str, tr, ev, steps: int = 500, lr: float = 5e-2,
                      seed: int = 0) -> dict:
    K = tr["y"].shape[1]
    params, fn = make_head(kind, K, jax.random.key(seed))
    img, ts = jnp.asarray(tr["img"]), jnp.asarray(tr["ts"])
    y, m = jnp.asarray(tr["y"]), jnp.asarray(tr["mask"])
    tx = optax.adam(lr)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda p: masked_per_label_bce(
            fn(p, img, ts), y, m).sum())(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    for _ in range(steps):
        params, state = step(params, state)
    ev_logits = np.asarray(fn(params, jnp.asarray(ev["img"]),
                              jnp.asarray(ev["ts"])))
    rows = M.masked_multilabel_metrics(ev["y"], ev["mask"],
                                       {"fusion": ev_logits})
    return {"per_label": rows,
            "macro_auroc": M.macro_mean(rows, "fusion_auroc")}


def main(argv=None):
    p = argparse.ArgumentParser("oracle logit-fusion probe")
    add_analysis_flags(p)
    p.add_argument("--probe_steps", type=int, default=500)
    args = p.parse_args(argv)

    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from .common import make_sources
    image_source, feature_source = make_sources(args, anchor_ds, model,
                                                params, cfg)

    mesh = meshlib.create_mesh()
    eval_step = engine.make_teacher_eval(model, anchor_ds.n_timesteps,
                                         image_source=image_source,
                                         feature_source=feature_source)
    with mesh:
        anchor_ds.grid = jax.device_put(anchor_ds.grid,
                                        meshlib.replicated(mesh))
        tr = collect_dual_outputs(eval_step, params, batch_stats, anchor_ds,
                                  "train", args.batch_size, mesh)
        ev = collect_dual_outputs(eval_step, params, batch_stats, anchor_ds,
                                  args.split, args.batch_size, mesh)

    base = M.masked_multilabel_metrics(ev["y"], ev["mask"],
                                       {"img": ev["img"], "ts": ev["ts"],
                                        "fus": ev["fus"]})
    results = {"base": {
        "img_macro_auroc": M.macro_mean(base, "img_auroc"),
        "ts_macro_auroc": M.macro_mean(base, "ts_auroc"),
        "trained_fus_macro_auroc": M.macro_mean(base, "fus_auroc")}}
    for kind in HEADS:
        results[kind] = train_fusion_head(kind, tr, ev, args.probe_steps,
                                          seed=args.seed)

    print(f"{'head':<12s} {'macroROC':>9s}")
    print(f"{'img (base)':<12s} {results['base']['img_macro_auroc']:>9.4f}")
    print(f"{'ts (base)':<12s} {results['base']['ts_macro_auroc']:>9.4f}")
    print(f"{'fus (model)':<12s} "
          f"{results['base']['trained_fus_macro_auroc']:>9.4f}")
    for kind in HEADS:
        print(f"{kind:<12s} {results[kind]['macro_auroc']:>9.4f}")
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "logit_fusion_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"saved → {out}")
    return results


if __name__ == "__main__":
    main()
