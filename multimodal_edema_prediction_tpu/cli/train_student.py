"""Student KD training CLI (reference: main_train_student_duett.py)."""
from __future__ import annotations

import argparse

from ..config import StudentConfig
from ..train.kd_loop import train_student_kd
from ..utils.logging import Logger
from .common import add_common_flags, configs_from_args, load_data, \
    make_run_dir, sync_duett_with_meta, wandb_project


def main(argv=None):
    p = argparse.ArgumentParser("DuETT KD student training (TPU)")
    add_common_flags(p)
    p.add_argument("--teacher_ckpt", type=str, required=True)
    p.add_argument("--student_pool", type=str, default="mean",
                   choices=["mean", "rep_token"])
    p.add_argument("--kd_name", type=str, default="vanilla_kl",
                   help="KD loss from the ops.losses.KD_LOSSES registry "
                        "(run.py:200; unknown names fail fast)")
    p.add_argument("--kd_T", type=float, default=4.0)
    p.add_argument("--kd_alpha", type=float, default=0.5)
    p.add_argument("--duett_ckpt", type=str, default="",
                   help="SSL checkpoint for the student backbone")
    p.add_argument("--resume_dir", type=str, default="",
                   help="existing run directory: restore the full train "
                        "state at the last completed epoch and continue "
                        "bit-exactly")
    p.add_argument("--state_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"])
    p.add_argument("--save_state", action="store_true", default=True)
    p.add_argument("--no_save_state", dest="save_state",
                   action="store_false")
    p.add_argument("--cxr_feature_cache", type=str, default="none",
                   choices=["none", "auto", "hbm", "host"],
                   help="encode-once tier: the KD teacher is frozen, so "
                        "cache its ViT (CLS, patch) tokens per unique image "
                        "and drop the teacher's ViT forward from every KD "
                        "step")
    p.add_argument("--cxr_feature_store_path", type=str, default="")
    args = p.parse_args(argv)

    from ..ops.losses import resolve_kd_loss
    resolve_kd_loss(args.kd_name)   # unknown names fail fast (run.py:200)
    dcfg, duett, tcfg = configs_from_args(args)
    tcfg = tcfg.replace(kd_T=args.kd_T, kd_alpha=args.kd_alpha)
    student_cfg = StudentConfig(duett=duett, pool=args.student_pool,
                                head_hidden=args.head_hidden,
                                head_dropout=args.head_dropout)
    run_dir = args.resume_dir or make_run_dir(args.ckpt_dir, tcfg)
    log = Logger("student", wandb_project(args),
                 args.wandb_run_name or None, tcfg.to_dict())
    _, meta, anchor_ds = load_data(args, dcfg)
    student_cfg = student_cfg.replace(
        duett=sync_duett_with_meta(duett, meta, log))
    res = train_student_kd(anchor_ds, student_cfg, args.teacher_ckpt, tcfg,
                           run_dir, logger=log,
                           ssl_backbone_ckpt=args.duett_ckpt or None,
                           auto_resume=bool(args.resume_dir),
                           save_full_state=args.save_state,
                           state_backend=args.state_backend,
                           feature_cache=args.cxr_feature_cache,
                           feature_store_path=(args.cxr_feature_store_path
                                               or None))
    log.info(f"best val AUROC: {res.best_metric:.4f}  ckpt: {res.best_path}")
    log.finish()
    return res


if __name__ == "__main__":
    main()
