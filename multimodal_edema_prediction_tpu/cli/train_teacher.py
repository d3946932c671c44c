"""Teacher training CLI (reference: main_train_teacher_duett.py + run.py).

    python -m multimodal_edema_prediction_tpu.cli.train_teacher \
        --epochs 30 --batch_size 128 [--lp_only_correction --lp_ckpt ...]
"""
from __future__ import annotations

import argparse

from ..config import PerceiverConfig, TeacherConfig, ViTConfig
from ..data.images import JpegStore
from ..train.ssl_loop import transplant_encoder
from ..train.teacher_loop import init_teacher, train_teacher
from ..utils.logging import Logger
from .common import add_common_flags, configs_from_args, load_data, \
    make_run_dir, sync_duett_with_meta, wandb_project


def main(argv=None):
    p = argparse.ArgumentParser("DuETT KD teacher training (TPU)")
    add_common_flags(p)
    p.add_argument("--perceiver_type", type=str, default="dual_patch",
                   choices=["dual_patch", "dual_patch_event", "dual",
                            "single", "legacy"])
    p.add_argument("--freeze_duett", action="store_true")
    p.add_argument("--unfreeze_cxr", action="store_true")
    p.add_argument("--duett_ckpt", type=str, default="",
                   help="SSL checkpoint to initialize the DuETT backbone")
    p.add_argument("--vit_size", type=str, default="base",
                   choices=["tiny", "base"],
                   help="'tiny' for smoke runs without RAD-DINO weights")
    p.add_argument("--vit_quant", type=str, default="none",
                   choices=["none", "int8"],
                   help="int8: post-training-quantize the frozen CXR "
                        "branch's matmuls (2x MXU rate; ops/int8.py)")
    p.add_argument("--flash_block_b", type=int, default=2,
                   help="flash-attention batch block inside the fused step; "
                        "2 is the measured production winner on v5e (+10%% "
                        "samples/s, benchmarks/flash_step_probe.py) — the "
                        "step factories raise XLA's scoped-VMEM limit to "
                        "admit it. Set 1 to fall back to the default-VMEM "
                        "config.")
    p.add_argument("--vit_weights", type=str, default="",
                   help="converted RAD-DINO checkpoint "
                        "(scripts/convert_rad_dino.py output) loaded into "
                        "the frozen CXR branch")
    p.add_argument("--lp_only_correction", action="store_true")
    p.add_argument("--lp_ckpt", type=str, default="")
    p.add_argument("--lp_beta_l2", type=float, default=1e-3)
    p.add_argument("--lp_corr_l2", type=float, default=1e-2)
    p.add_argument("--lp_correction_dropout", type=float, default=0.3,
                   help="[LP mode] correction-head dropout override "
                        "(reference trainer.py:365-370, run.py:174)")
    p.add_argument("--n_latents", type=int, default=16,
                   help="[legacy] TemporalPerceiver latent-query count "
                        "(run.py:75)")
    p.add_argument("--n_perceiver_layers", type=int, default=2,
                   help="[legacy] TemporalPerceiver img/ts block pairs "
                        "(run.py:76)")
    p.add_argument("--aux_stage2_alpha", type=float, default=1.0,
                   help="[single] stage2 (image-only) loss weight "
                        "(run.py:134)")
    p.add_argument("--aux_stage4_alpha", type=float, default=0.5,
                   help="[single] stage4 (multimodal) loss weight "
                        "(run.py:136)")
    p.add_argument("--use_aux_cxr", action="store_true",
                   help="[legacy] auxiliary CXR-only head BCE "
                        "(run.py:120-123)")
    p.add_argument("--aux_cxr_alpha", type=float, default=0.0,
                   help="[legacy] total = main_bce + aux_cxr_alpha * aux_bce")
    p.add_argument("--grad_diag_every", type=int, default=0,
                   help="run read-only gradient-flow diagnostics every N "
                        "epochs (0 = off)")
    p.add_argument("--grad_diag_batches", type=int, default=4)
    p.add_argument("--pretrained_cxr_head_ckpt", type=str, default="",
                   help="[dual] frozen CXR linear head checkpoint "
                        "(cli.train_cxr_head output); label re-indexing is "
                        "derived from its label_cols")
    p.add_argument("--cxr_jpeg_root", type=str, default="",
                   help="directory of {image_id}.jpg files — enables the "
                        "real-image path (native decode in the prefetch "
                        "worker) instead of procedural images")
    p.add_argument("--prefetch_depth", type=int, default=2)
    p.add_argument("--image_bank", type=str, default="auto",
                   choices=["auto", "hbm", "stream"],
                   help="real-image feeding: 'hbm' decodes every image once "
                        "into a device-resident uint8 bank (zero per-step "
                        "host image work), 'stream' decodes per step on the "
                        "host, 'auto' picks by the HBM budget")
    p.add_argument("--hbm_image_budget_gb", type=float, default=8.0)
    p.add_argument("--cxr_feature_cache", type=str, default="none",
                   choices=["none", "auto", "hbm", "host"],
                   help="encode-once tier: with the CXR branch frozen "
                        "(default), cache the ViT's (CLS, patch) tokens per "
                        "unique image and drop the ViT forward (~90%% of "
                        "the step) from every subsequent step/epoch; 'auto' "
                        "picks a device bank if it fits the feature budget, "
                        "else a host store")
    p.add_argument("--cxr_feature_store_path", type=str, default="",
                   help="persist the encode-once token store as a reusable "
                        "disk memmap at this path (catalog-scale feature "
                        "sets; reopened instantly by later runs)")
    p.add_argument("--hbm_feature_budget_gb", type=float, default=8.0)
    p.add_argument("--u8_store_path", type=str, default="",
                   help="catalog-scale streaming: decode all images ONCE "
                        "into a disk-resident uint8 memmap at this path and "
                        "serve page-cached reads (for image sets that fit "
                        "neither the HBM bank nor RAM); used when the HBM "
                        "bank is unavailable")
    p.add_argument("--resume_dir", type=str, default="",
                   help="existing run directory to continue: restores the "
                        "full train state saved at the last completed epoch "
                        "(params, optimizer, RNG, early-stop bookkeeping) "
                        "and trains on bit-exactly")
    p.add_argument("--state_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="full-state checkpoint format; orbax saves async "
                        "(overlapping the next epoch) — the pod-scale path")
    p.add_argument("--save_state", action="store_true", default=True,
                   help="persist the full train state every epoch so the run "
                        "is resumable with --resume_dir (default on)")
    p.add_argument("--no_save_state", dest="save_state",
                   action="store_false")
    args = p.parse_args(argv)

    dcfg, duett, tcfg = configs_from_args(args)
    vit = ViTConfig(quant=args.vit_quant,
                    flash_block_b=args.flash_block_b) \
        if args.vit_size == "base" \
        else ViTConfig(image_size=56, patch_size=14, d_model=64, n_layers=2,
                       n_heads=2, d_feedforward=128, quant=args.vit_quant)
    if args.vit_quant != "none" and args.unfreeze_cxr:
        p.error("--vit_quant requires a frozen CXR branch (the quantized "
                "matmuls are inference-only)")
    teacher_cfg = TeacherConfig(
        duett=duett, vit=vit,
        perceiver=PerceiverConfig(
            n_pathologies=len(dcfg.pathology_labels),
            d_latent=args.d_latent, n_heads=args.n_perceiver_heads,
            dropout=args.perceiver_dropout, head_hidden=args.head_hidden,
            head_dropout=args.head_dropout,
            n_latents=args.n_latents, n_layers=args.n_perceiver_layers,
            correction_dropout=(args.lp_correction_dropout
                                if args.lp_only_correction else None)),
        perceiver_type=args.perceiver_type,
        freeze_duett=args.freeze_duett, freeze_cxr=not args.unfreeze_cxr)

    run_dir = args.resume_dir or make_run_dir(args.ckpt_dir, tcfg)
    log = Logger("teacher", wandb_project(args),
                 args.wandb_run_name or None, tcfg.to_dict())
    _, meta, anchor_ds = load_data(args, dcfg)
    duett = sync_duett_with_meta(duett, meta, log)
    teacher_cfg = teacher_cfg.replace(duett=duett)

    init_variables = None
    if args.duett_ckpt or args.vit_weights:
        import jax
        from ..models.teacher import TeacherModel
        model = TeacherModel(teacher_cfg)
        init_variables = dict(init_teacher(
            model, teacher_cfg, tcfg.batch_size, dcfg.n_timesteps,
            jax.random.key(tcfg.seed)))
    if args.duett_ckpt:
        params, enc_stats, changed = transplant_encoder(
            args.duett_ckpt, init_variables["params"])
        init_variables["params"] = params
        if enc_stats is not None:
            bs = dict(init_variables["batch_stats"])
            bs["duett"] = enc_stats
            init_variables["batch_stats"] = bs
        log.info(f"DuETT backbone from {args.duett_ckpt} "
                 f"({len(changed)} keys adjusted)")
    if args.vit_weights:
        from ..models.vit import load_vit_params
        vit_params = load_vit_params(args.vit_weights, teacher_cfg.vit)
        params = dict(init_variables["params"])
        params["cxr"] = vit_params
        init_variables["params"] = params
        log.info(f"CXR branch (RAD-DINO) from {args.vit_weights}")

    res = train_teacher(
        anchor_ds, teacher_cfg, tcfg, run_dir, dcfg.pathology_labels,
        logger=log, lp_from=args.lp_ckpt if args.lp_only_correction else None,
        lp_beta_l2=args.lp_beta_l2, lp_corr_l2=args.lp_corr_l2,
        init_variables=init_variables,
        grad_diag_every=args.grad_diag_every,
        grad_diag_batches=args.grad_diag_batches,
        pretrained_head_ckpt=args.pretrained_cxr_head_ckpt or None,
        jpeg_store=(JpegStore(root=args.cxr_jpeg_root)
                    if args.cxr_jpeg_root else None),
        prefetch_depth=args.prefetch_depth,
        image_bank=args.image_bank,
        u8_store_path=args.u8_store_path or None,
        hbm_image_budget_gb=args.hbm_image_budget_gb,
        feature_cache=args.cxr_feature_cache,
        feature_store_path=args.cxr_feature_store_path or None,
        hbm_feature_budget_gb=args.hbm_feature_budget_gb,
        auto_resume=bool(args.resume_dir), save_full_state=args.save_state,
        state_backend=args.state_backend)
    log.info(f"best val macro fusion AUROC: {res.best_metric:.4f}  "
             f"ckpt: {res.best_path}")
    log.finish()
    return res


if __name__ == "__main__":
    main()
