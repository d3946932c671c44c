"""Inference CLI: load a teacher/student checkpoint, run a split, save NPZ.

The reference's ``inference.py`` is gitignored/absent (SURVEY §1); this is
its working equivalent. The NPZ (img/ts/fusion logits + labels + correction)
is the input format of ``analysis/residual_by_confidence`` in the reference.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..analysis.common import add_analysis_flags, load_analysis_data, \
    load_teacher
from ..parallel import mesh as meshlib
from ..train import engine
from ..train.evaluator import collect_dual_outputs, evaluate_dual_pathology, \
    format_dual_pathology_gap_table


def main(argv=None):
    p = argparse.ArgumentParser("teacher inference → NPZ")
    add_analysis_flags(p)
    p.add_argument("--out", type=str, default="predictions.npz")
    args = p.parse_args(argv)

    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    _, meta, anchor_ds, dcfg = load_analysis_data(
        args, n_variables=cfg.duett.n_variables)
    from ..analysis.common import make_sources
    image_source, feature_source = make_sources(args, anchor_ds, model,
                                                params, cfg)

    mesh = meshlib.create_mesh()
    eval_step = engine.make_teacher_eval(model, anchor_ds.n_timesteps,
                                         image_source=image_source,
                                         feature_source=feature_source)
    with mesh:
        anchor_ds.grid = jax.device_put(anchor_ds.grid,
                                        meshlib.replicated(mesh))
        o = collect_dual_outputs(eval_step, params, batch_stats, anchor_ds,
                                 args.split, args.batch_size, mesh)
        beta_p = params["perceiver"].get("beta")   # absent in 'dual' mode
        beta = np.asarray(beta_p) if beta_p is not None else None
        result = evaluate_dual_pathology(
            eval_step, params, batch_stats, anchor_ds, args.split,
            args.batch_size, mesh, dcfg.pathology_labels, beta)
    print(format_dual_pathology_gap_table(result))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    extra = {} if beta is None else {"beta": beta}
    np.savez_compressed(
        args.out, img_logits=o["img"], ts_logits=o["ts"],
        fusion_logits=o["fus"], scaled_correction=o["corr"],
        main_logit=o["main"], y_multi=o["y"], y_multi_mask=o["mask"],
        labels=np.asarray(dcfg.pathology_labels), **extra)
    print(f"predictions → {args.out}")
    return result


if __name__ == "__main__":
    main()
