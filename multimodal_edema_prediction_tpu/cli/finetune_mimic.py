"""MIMIC supervised finetune CLI (reference: duett/train_duett_finetune.py).

The reference script loads an SSL-pretrained DuETT checkpoint and finetunes
it on the stay-level mortality label (``death_adm`` from the meta contract,
train_duett_finetune.py:160-224): a multi-seed loop, per-seed best-AUPRC
checkpoints, top-k WEIGHT AVERAGING at test time (:56-62), and a mean±std
summary across seeds. This CLI drives the same recipe
(`train/finetune_loop.finetune_duett`) on an ingested cohort or the
synthetic default.

    python -m multimodal_edema_prediction_tpu.cli.finetune_mimic \
        --ssl_ckpt runs/ssl/<run>/best-*.msgpack --epochs 10
"""
from __future__ import annotations

import argparse

from ..config import DataConfig, DuettConfig, OptimConfig, TrainConfig
from ..data import pipeline as P
from ..data import synthetic as S
from ..data.sliding import build_stay_label_dataset
from ..train.finetune_loop import finetune_duett
from ..utils.logging import Logger
from .common import wandb_project


def main(argv=None):
    p = argparse.ArgumentParser("DuETT MIMIC supervised finetune (TPU)")
    p.add_argument("--ssl_ckpt", type=str, default="",
                   help="SSL-pretrained DuETT checkpoint to start from "
                        "(empty: random init, still multi-seed+averaged)")
    p.add_argument("--data_dir", type=str, default="",
                   help="ingested cohort dir (data/ingest.py artifacts); "
                        "default: synthetic")
    p.add_argument("--synthetic_stays", type=int, default=500)
    p.add_argument("--n_variables", type=int, default=34)
    p.add_argument("--n_timesteps", type=int, default=24)
    p.add_argument("--d_embedding", type=int, default=24)
    p.add_argument("--n_duett_layers", type=int, default=2)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--mixed_precision", type=str, default="none",
                   choices=["none", "bf16"])
    p.add_argument("--ckpt_dir", type=str, default="runs/finetune_mimic")
    p.add_argument("--wandb_project", type=str, default="")
    args = p.parse_args(argv)

    from ..utils import preemption
    preemption.install_handler()

    log = Logger("finetune_mimic", wandb_project(args))
    dcfg = DataConfig(n_timesteps=args.n_timesteps, data_dir=args.data_dir)
    if args.data_dir:
        from ..data.ingest import load_artifacts
        ds, meta = load_artifacts(args.data_dir, dcfg)
    else:
        ds = S.make_synthetic(seed=0, n_stays=args.synthetic_stays,
                              n_subjects=max(args.synthetic_stays // 3, 10),
                              n_variables=args.n_variables)
        meta = P.meta_from_events(ds, dcfg)
    ft_ds = build_stay_label_dataset(ds, meta, args.n_timesteps)
    duett = DuettConfig(n_variables=meta.n_variables,
                        d_static=meta.d_static,
                        n_timesteps=args.n_timesteps,
                        d_embedding=args.d_embedding,
                        n_layers=args.n_duett_layers)
    cfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        patience=args.patience,
        dtype="bfloat16" if args.mixed_precision == "bf16" else "float32",
        optim=OptimConfig(lr=args.lr, weight_decay=args.weight_decay,
                          warmup_steps=args.warmup_steps))
    summary = finetune_duett(ft_ds, duett, cfg, args.ckpt_dir,
                             ssl_ckpt=args.ssl_ckpt or None,
                             seeds=tuple(args.seeds), top_k=args.top_k,
                             logger=log)
    log.finish()
    return summary


if __name__ == "__main__":
    main()
