"""DuETT SSL pretraining CLI (reference: duett/train_duett_ssl.py)."""
from __future__ import annotations

import argparse

from ..data.sliding import build_sliding_ssl_dataset
from ..train.ssl_loop import train_ssl
from ..utils.logging import Logger
from .common import add_common_flags, configs_from_args, load_data, \
    make_run_dir, sync_duett_with_meta, wandb_project


def main(argv=None):
    p = argparse.ArgumentParser("DuETT SSL pretraining (TPU)")
    add_common_flags(p)
    p.add_argument("--stride", type=int, default=12)
    p.add_argument("--max_stay_hours", type=int, default=336)
    p.add_argument("--ssl_lr", type=float, default=3e-4)
    p.add_argument("--ssl_weight_decay", type=float, default=0.1)
    p.add_argument("--ssl_warmup", type=int, default=2000)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--pretrain_masked_steps", type=int, default=1)
    p.add_argument("--resume_dir", type=str, default="",
                   help="existing run directory: restore the full train "
                        "state at the last completed epoch and continue "
                        "bit-exactly")
    p.add_argument("--state_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"])
    p.add_argument("--save_state", action="store_true", default=True)
    p.add_argument("--no_save_state", dest="save_state",
                   action="store_false")
    args = p.parse_args(argv)

    dcfg, duett, tcfg = configs_from_args(args)
    duett = duett.replace(pretrain_masked_steps=args.pretrain_masked_steps)
    run_dir = args.resume_dir or make_run_dir(args.ckpt_dir, tcfg)
    log = Logger("duett_ssl", wandb_project(args),
                 args.wandb_run_name or None, tcfg.to_dict())
    ds, meta, _ = load_data(args, dcfg)
    duett = sync_duett_with_meta(duett, meta, log)
    ssl_ds = build_sliding_ssl_dataset(ds, meta, dcfg.n_timesteps,
                                       args.stride, args.max_stay_hours)
    res = train_ssl(ssl_ds, duett, tcfg, run_dir, lr=args.ssl_lr,
                    weight_decay=args.ssl_weight_decay,
                    warmup_steps=args.ssl_warmup, grad_clip=args.grad_clip,
                    logger=log, auto_resume=bool(args.resume_dir),
                    save_full_state=args.save_state,
                    state_backend=args.state_backend)
    log.info(f"best val_loss: {res.best_metric:.4f}  ckpt: {res.best_path}")
    log.finish()
    return res


if __name__ == "__main__":
    main()
