"""Loop-level training parity against the reference's ACTUAL ``train_teacher``
(`/root/reference/training_duett/trainer.py:216-764`), run end to end.

This closes the last pre-PHI gap in the parity chain (VERDICT r2, item 1):
module-level transplant parity says each block computes the same function;
THIS test says the whole training system — dataset → loader → differential-LR
AdamW → warmup/cosine SequentialLR → per-batch step → per-epoch validation →
best-checkpoint test — produces the same trajectory.

Design: a DETERMINISTIC transplant comparison, which is strictly stronger
than a seeds-and-noise-bands comparison:

- one tiny synthetic cohort rendered both as the reference's pandas frames
  (driving the real ``build_datasets``/``DuettAnchorDataset``) and as this
  repo's columnar tables (``_Cohort`` from test_reference_parity_data);
- the reference's x_transformers dependency replaced by the parity-pinned
  ``FaithfulEncoder`` (tests/ref_encoder.py, see test_ref_encoder_parity);
- the reference's HF RAD-DINO replaced by a locally-constructed tiny
  ``Dinov2Model`` (no egress), converted to flax via the parity-tested
  ``convert_hf_dinov2``;
- the torch teacher's INITIAL weights captured at the first batch and
  transplanted into the flax teacher, all stochasticity zeroed (dropout,
  aug), full-batch training (1 step/epoch ⇒ sample order irrelevant);
- both loops then run the SAME recipe for several epochs; per-epoch branch
  losses must agree to float32-accumulation tolerance and per-epoch/final
  AUROCs to rank-flip tolerance on the small eval splits.

Because the comparison is deterministic, a single run bounds the divergence
directly — no per-seed noise estimation is needed (that approach is only
required when inits differ; kept here as the fallback documented in
VERDICT).
"""
from __future__ import annotations

import copy
import io
import os
import pickle
import sys

import numpy as np
import pandas as pd
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_harness import load_reference, dense_from, duett_encoder_params, \
    patch_dual_perceiver_params, use_encoder
from ref_encoder import FaithfulEncoder
from test_reference_parity_data import _Cohort, LABELS, T, V

from multimodal_edema_prediction_tpu.config import (
    DataConfig, DuettConfig, OptimConfig, PerceiverConfig, TeacherConfig,
    TrainConfig, ViTConfig)
from multimodal_edema_prediction_tpu.data.pipeline import build_anchor_dataset
from multimodal_edema_prediction_tpu.models.vit import (IMAGE_MEAN, IMAGE_STD,
                                                        convert_hf_dinov2)

REF = load_reference()

# tiny ViT geometry shared by both sides
VIT_D, VIT_LAYERS, VIT_HEADS, VIT_FF, VIT_IMG, VIT_PATCH = 32, 2, 4, 128, 28, 14
D_LATENT, N_PERC_HEADS = 32, 4
EPOCHS = 4
LR, WD, MIN_LR_RATIO = 1e-3, 5e-2, 0.01


def _stub_processor_pixels(img, size=VIT_IMG):
    """The shared image pipeline both sides must implement identically:
    PIL RGB → bilinear resize → [0,1] → (x-mean)/std."""
    from PIL import Image
    arr = np.asarray(img.convert("RGB").resize((size, size), Image.BILINEAR),
                     np.float32) / 255.0
    return (arr - np.asarray(IMAGE_MEAN, np.float32)) / \
        np.asarray(IMAGE_STD, np.float32)


class _StubImageProcessor:
    """AutoImageProcessor stand-in matching rad-dino's preprocessing shape
    (resize + normalize) at the tiny test geometry."""

    @classmethod
    def from_pretrained(cls, name):
        return cls()

    def __call__(self, images, return_tensors="pt"):
        px = _stub_processor_pixels(images)
        t = torch.tensor(px).permute(2, 0, 1).unsqueeze(0)
        return {"pixel_values": t}


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    """Files + monkeypatches shared by the reference run."""
    root = tmp_path_factory.mktemp("loop_parity")
    cohort = _Cohort(seed=0)
    # Densify anchor labels to {0,1}: the reference evaluator's `_safe`
    # guards ValueError only, and a tiny val split with NaN/U labels can
    # leave a label with zero valid rows → sklearn IndexError (never happens
    # at real cohort scale). NaN-mask and U→0 semantics are covered by
    # test_reference_parity_data; THIS test is about the training loop.
    lab_rng = np.random.default_rng(99)
    labels = cohort.anchors.labels.copy()
    fix = ~np.isin(labels, (0.0, 1.0))
    labels[fix] = (lab_rng.random(int(fix.sum())) < 0.5).astype(np.float32)
    from multimodal_edema_prediction_tpu.data.synthetic import AnchorTable
    cohort.anchors = AnchorTable(
        subject_ids=cohort.anchors.subject_ids,
        stay_ids=cohort.anchors.stay_ids,
        slot_idx=cohort.anchors.slot_idx,
        image_ids=cohort.anchors.image_ids, labels=labels)
    final_df, static_df, meta, catalog_df = cohort.reference_frames()
    assert len(np.unique(cohort.anchors.image_ids)) == \
        len(cohort.anchors.image_ids), "image ids must be unique"

    # --- reference input files ------------------------------------------
    data_dir = root / "data"
    data_dir.mkdir()
    final_path = data_dir / "final_df.ftr"
    final_df.reset_index(drop=True).to_feather(final_path)
    static_path = data_dir / "static_full.ftr"
    static_df.reset_index().to_feather(static_path)
    cat_path = data_dir / "cat.ftr"
    catalog_df.to_feather(cat_path)

    # meta.pkl with the full REQUIRED_META_KEYS schema, stored where
    # _attach_meta_path derives it from the duett ckpt dir (run.py:44-46)
    ckpt_dir = root / "duett_ckpt"
    ckpt_dir.mkdir()
    meta_full = dict(meta)
    meta_full.update({"D_STATIC": 1 + len(cohort.onehot_names),
                      "LABEL_COL": "label_edema", "N_TIMESTEPS": T})
    with open(ckpt_dir / "meta_with_stats.pkl", "wb") as f:
        pickle.dump(meta_full, f)

    # DuETT SSL checkpoint: natural-init reference model at the test dims,
    # built with the faithful encoders so the state_dict has their weights
    with use_encoder(FaithfulEncoder):
        torch.manual_seed(0)
        duett0 = REF["models"].DuettFeatureExtractor(
            pretrain=False, d_static_num=meta_full["D_STATIC"],
            d_time_series_num=V, d_target=1, masked_transform_timesteps=T,
            max_len=T)
    duett_ckpt = ckpt_dir / "pretrain.ckpt"
    torch.save({"state_dict": duett0.state_dict()}, duett_ckpt)

    # tiny HF DINOv2 standing in for microsoft/rad-dino
    from transformers import Dinov2Config, Dinov2Model
    torch.manual_seed(1)
    hf_vit = Dinov2Model(Dinov2Config(
        hidden_size=VIT_D, num_hidden_layers=VIT_LAYERS,
        num_attention_heads=VIT_HEADS, mlp_ratio=VIT_FF // VIT_D,
        image_size=VIT_IMG, patch_size=VIT_PATCH,
        layerscale_value=1.0)).eval()

    # JPEGs: one per anchor; file name = dicom id for the reference loader,
    # bytes kept per image_id for this repo's bank
    from PIL import Image
    jpg_dir = root / "jpgs"
    jpg_dir.mkdir()
    rng = np.random.default_rng(7)
    blobs = {}
    for j, img_id in enumerate(cohort.anchors.image_ids):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        (jpg_dir / f"d{j}.jpg").write_bytes(buf.getvalue())
        blobs[int(img_id)] = buf.getvalue()

    # this repo's dataset (splits are parity-identical to the reference's —
    # test_reference_parity_data::test_splits_identical), needed up front so
    # the reference run can use batch_size == n_train (full-batch: with
    # drop_last=True any larger batch size would yield zero train batches)
    mine = build_anchor_dataset(
        cohort.my_dataset(), cohort.my_meta(),
        DataConfig(n_timesteps=T, split_seed=42, pathology_labels=LABELS))

    return dict(root=root, cohort=cohort, final_path=str(final_path),
                static_path=str(static_path), cat_path=str(cat_path),
                duett_ckpt=str(duett_ckpt), hf_vit=hf_vit,
                jpg_dir=str(jpg_dir), blobs=blobs, mine=mine,
                n_train=mine.split_size("train"),
                d_static=meta_full["D_STATIC"])


def _run_reference(rig, monkeypatch, mode="dual_patch", head_ckpt=None):
    """Run the reference's real train_teacher; return captured telemetry."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import training_duett.trainer as ref_trainer
    import training_duett.run as ref_run
    import training_duett.data_processing as ref_data
    ref_models = REF["models"]

    # --- IO monkeypatches -------------------------------------------------
    monkeypatch.setattr(ref_trainer, "AutoImageProcessor",
                        _StubImageProcessor)
    if mode == "dual":
        # the reference's 'dual' class is commented out in its tree; inject
        # the faithful transcription (unit-parity-tested) so its OWN dual
        # dispatch (trainer.py:291-302) runs
        from ref_dual_perceiver import FaithfulDualPerceiver
        monkeypatch.setattr(ref_trainer, "DualPathologyPerceiver",
                            FaithfulDualPerceiver)
    if mode == "single":
        # same situation for the 'single' class (dispatch :315-327)
        from ref_dual_perceiver import FaithfulPathologyPerceiver
        monkeypatch.setattr(ref_trainer, "PathologyPerceiver",
                            FaithfulPathologyPerceiver)
    if mode == "legacy":
        # and for the 'legacy' class (dispatch :329-340, variant 3)
        from ref_dual_perceiver import FaithfulTemporalPerceiver
        monkeypatch.setattr(ref_trainer, "TemporalPerceiver",
                            FaithfulTemporalPerceiver)

    class _StubAutoModel:
        @staticmethod
        def from_pretrained(name):
            return rig["hf_vit"]

    monkeypatch.setattr(ref_models, "AutoModel", _StubAutoModel)

    orig_split = ref_data.split_anchors
    monkeypatch.setattr(
        ref_data, "split_anchors",
        lambda adf, seed=42: orig_split(
            adf, seed=seed, pretrained_ftr_path=rig["cat_path"],
            pretrained_label_cols=list(LABELS)))
    monkeypatch.setattr(
        ref_data, "dicom_to_jpg_path",
        lambda subj, study, dicom, root=None: os.path.join(
            rig["jpg_dir"], f"{dicom}.jpg"))

    # --- capture hooks ----------------------------------------------------
    captured = {"steps": [], "vals": [], "init_model": None, "lrs": []}
    orig_batch = ref_trainer.train_teacher_dual_pathology_batch
    orig_eval = ref_trainer.evaluate_dual_pathology

    def batch_wrapper(batch, teacher, loss_fn, optimizer, device,
                      accelerator=None, aux_residual_alpha=0.0):
        if captured["init_model"] is None:
            un = accelerator.unwrap_model(teacher) if accelerator is not None \
                else teacher
            # determinism: zero every dropout (the flax side configures the
            # same); capture the initial weights for transplanting
            for m in un.modules():
                if isinstance(m, torch.nn.Dropout):
                    m.p = 0.0
            captured["init_model"] = copy.deepcopy(un)
        captured["lrs"].append(
            [g["lr"] for g in optimizer.param_groups])
        out = orig_batch(batch, teacher, loss_fn, optimizer, device,
                         accelerator, aux_residual_alpha)
        captured["steps"].append({k: float(out[k]) for k in
                                  ("loss", "img_total", "ts_total",
                                   "fus_total")})
        return out

    def eval_wrapper(teacher, loader, device, labels, query_ref=None):
        r = orig_eval(teacher, loader, device, labels, query_ref=query_ref)
        captured["vals"].append(r)
        return r

    monkeypatch.setattr(ref_trainer, "train_teacher_dual_pathology_batch",
                        batch_wrapper)
    monkeypatch.setattr(ref_trainer, "evaluate_dual_pathology", eval_wrapper)

    # 'single' mode routes through the pathology batch fn + evaluator
    orig_pbatch = ref_trainer.train_teacher_pathology_batch
    orig_peval = ref_trainer.evaluate_pathology

    def pbatch_wrapper(batch, teacher, path_loss_fn, optimizer, device,
                       accelerator=None):
        if captured["init_model"] is None:
            un = accelerator.unwrap_model(teacher) if accelerator is not None \
                else teacher
            for m in un.modules():
                if isinstance(m, torch.nn.Dropout):
                    m.p = 0.0
            captured["init_model"] = copy.deepcopy(un)
        captured["lrs"].append([g["lr"] for g in optimizer.param_groups])
        out = orig_pbatch(batch, teacher, path_loss_fn, optimizer, device,
                          accelerator)
        captured["steps"].append({k: float(out[k]) for k in
                                  ("loss", "stage2_total", "stage4_total")})
        return out

    def peval_wrapper(teacher, loader, device, labels):
        r = orig_peval(teacher, loader, device, labels)
        captured["vals"].append(r)
        return r

    monkeypatch.setattr(ref_trainer, "train_teacher_pathology_batch",
                        pbatch_wrapper)
    monkeypatch.setattr(ref_trainer, "evaluate_pathology", peval_wrapper)

    # 'legacy' mode routes through train_teacher_batch + evaluate_binary
    captured["bin_vals"] = []
    orig_lbatch = ref_trainer.train_teacher_batch
    orig_beval = ref_trainer.evaluate_binary

    def lbatch_wrapper(batch, teacher, loss_fn, optimizer, device,
                       accelerator=None, aux_alpha=0.0):
        if captured["init_model"] is None:
            un = accelerator.unwrap_model(teacher) if accelerator is not None \
                else teacher
            for m in un.modules():
                if isinstance(m, torch.nn.Dropout):
                    m.p = 0.0
            captured["init_model"] = copy.deepcopy(un)
        captured["lrs"].append([g["lr"] for g in optimizer.param_groups])
        out = orig_lbatch(batch, teacher, loss_fn, optimizer, device,
                          accelerator, aux_alpha=aux_alpha)
        captured["steps"].append({k: float(out[k]) for k in
                                  ("loss", "main_loss", "aux_loss")})
        return out

    def beval_wrapper(model, loader, device, forward_fn):
        r = orig_beval(model, loader, device, forward_fn)
        captured["bin_vals"].append(r)
        return r

    monkeypatch.setattr(ref_trainer, "train_teacher_batch", lbatch_wrapper)
    monkeypatch.setattr(ref_trainer, "evaluate_binary", beval_wrapper)

    # --- args via the reference's own parser ------------------------------
    # batch_size == n_train ⇒ full-batch (1 step/epoch, order cannot matter)
    argv = ["prog",
            "--final_df_path", rig["final_path"],
            "--static_path", rig["static_path"],
            "--duett_ckpt", rig["duett_ckpt"],
            "--ckpt_dir", str(rig["root"] / f"ref_runs_{mode}"),
            "--perceiver_type", mode,
            "--n_timesteps", str(T),
            "--batch_size", str(rig["n_train"]),
            "--num_workers", "0",
            "--epochs", str(EPOCHS),
            "--warmup_steps", "1",
            "--lr", str(LR),
            "--weight_decay", str(WD),
            "--min_lr_ratio", str(MIN_LR_RATIO),
            "--mixed_precision", "no",
            "--perceiver_dropout", "0.0",
            "--head_dropout", "0.0",
            "--d_latent", str(D_LATENT),
            "--n_perceiver_heads", str(N_PERC_HEADS),
            "--patience", "0",
            "--grad_diag_every", "0",
            "--eval_train_batches", "0",
            "--log_every", "1000000",
            "--wandb_disabled"]
    if mode == "dual":
        argv += ["--pretrained_cxr_head_ckpt", head_ckpt]
    if mode == "legacy":
        # align the reference's legacy knobs with this repo's fixed legacy
        # geometry (models/teacher.py legacy branch: 2-layer 16-latent
        # perceiver, 128-wide heads) and enable the aux CXR head — without
        # patches+aux the variant-3 perceiver has no coherent input path
        argv += ["--use_aux_cxr", "--aux_cxr_alpha", "0.5",
                 "--n_perceiver_layers", "2", "--n_latents", "16",
                 "--head_hidden", "128"]
    monkeypatch.setattr(sys, "argv", argv)
    args = ref_run.parse_teacher_args()

    with use_encoder(FaithfulEncoder):
        torch.manual_seed(123)
        ref_trainer.train_teacher(args)
    return captured


def _transplant_init(init_model, hf_vit, teacher_cfg, template):
    """torch teacher (initial weights) → flax init_variables."""
    cxr = convert_hf_dinov2(
        {k: v.numpy() for k, v in hf_vit.state_dict().items()},
        teacher_cfg.vit)
    if teacher_cfg.perceiver_type == "dual":
        from ref_harness import dual_perceiver_params
        params = {
            "cxr": cxr,
            "pretrained_cxr_head": {
                "linear": dense_from(init_model.pretrained_cxr_head)},
            "perceiver": dual_perceiver_params(init_model.perceiver),
        }
    elif teacher_cfg.perceiver_type == "single":
        from ref_harness import pathology_perceiver_params
        params = {
            "img_proj": dense_from(init_model.img_proj),
            "perceiver": pathology_perceiver_params(init_model.perceiver),
            "cxr": cxr,
        }
    elif teacher_cfg.perceiver_type == "legacy":
        from ref_harness import temporal_perceiver_params
        params = {
            "img_proj": dense_from(init_model.img_proj),
            "perceiver": temporal_perceiver_params(init_model.perceiver),
            "head_in": dense_from(init_model.head[0]),
            "head_out": dense_from(init_model.head[3]),
            "aux_in": dense_from(init_model.aux_cxr_head[0]),
            "aux_out": dense_from(init_model.aux_cxr_head[3]),
            "cxr": cxr,
        }
    else:
        params = {
            "img_proj": dense_from(init_model.img_proj),
            "perceiver": patch_dual_perceiver_params(init_model.perceiver),
            "cxr": cxr,
        }
    duett_p, duett_s = duett_encoder_params(init_model.duett,
                                            with_transformers=True)
    params["duett"] = duett_p
    variables = {"params": params, "batch_stats": {"duett": duett_s}}
    # structure must match model.init exactly — diff clearly if not
    t_struct = jax.tree_util.tree_structure(template)
    m_struct = jax.tree_util.tree_structure(variables)
    assert t_struct == m_struct, (
        f"transplant tree mismatch:\n{t_struct}\nvs\n{m_struct}")
    return variables


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dual_patch", "dual", "single", "legacy"])
def test_training_trajectory_parity(rig, monkeypatch, tmp_path, mode):
    head_pt = my_head = None
    if mode == "dual":
        # pretrained CXR-head ckpts, permuted labels ⇒ non-trivial keep_idx:
        # torch layout (cxr_linear_training.ipynb cell 13) + this repo's
        pre_labels = list(LABELS[::-1])
        torch.manual_seed(77)
        clf = torch.nn.Sequential(torch.nn.Dropout(0.1),
                                  torch.nn.Linear(VIT_D, len(pre_labels)))
        head_pt = str(tmp_path / "cxr_head.pt")
        torch.save({"classifier_state_dict": clf.state_dict(),
                    "label_cols": pre_labels,
                    "num_classes": len(pre_labels)}, head_pt)
        from multimodal_edema_prediction_tpu.train.checkpoint import \
            save_checkpoint
        my_head = str(tmp_path / "cxr_head.msgpack")
        save_checkpoint(my_head, {"linear": dense_from(clf[1])}, {},
                        step=0, metric=0.0,
                        config={"label_cols": pre_labels})

    captured = _run_reference(rig, monkeypatch, mode=mode, head_ckpt=head_pt)
    assert len(captured["steps"]) == EPOCHS          # full-batch: 1 step/epoch
    if mode == "legacy":
        # per epoch: main + aux evaluate_binary; final test: main only
        assert len(captured["bin_vals"]) == 2 * EPOCHS + 1
        ref_vals = captured["bin_vals"][0:2 * EPOCHS:2] \
            + [captured["bin_vals"][-1]]
        val_key = "auroc"
    else:
        assert len(captured["vals"]) == EPOCHS + 1   # per-epoch val + test
        ref_vals = captured["vals"]
        val_key = "main_auroc"

    mine = rig["mine"]
    n_train = rig["n_train"]

    teacher_cfg = TeacherConfig(
        duett=DuettConfig(n_variables=V, n_timesteps=T,
                          d_static=rig["d_static"], transformer_dropout=0.0,
                          aug_noise=0.0, aug_mask=0.0),
        vit=ViTConfig(image_size=VIT_IMG, patch_size=VIT_PATCH,
                      d_model=VIT_D, n_layers=VIT_LAYERS, n_heads=VIT_HEADS,
                      d_feedforward=VIT_FF, layerscale_init=1.0,
                      use_flash_attention=False),
        perceiver=PerceiverConfig(n_pathologies=len(LABELS),
                                  d_latent=D_LATENT, n_heads=N_PERC_HEADS,
                                  dropout=0.0, head_hidden=64,
                                  head_dropout=0.0),
        d_img=VIT_D, perceiver_type=mode, freeze_cxr=True)
    cfg = TrainConfig(
        batch_size=n_train, epochs=EPOCHS, patience=0, seed=0,
        dtype="float32", n_data=1, n_model=1,
        # legacy runs the reference with --use_aux_cxr --aux_cxr_alpha 0.5
        # (_run_reference argv above) — mirror the faithful mapping here
        use_aux_cxr=(mode == "legacy"),
        aux_cxr_alpha=0.5 if mode == "legacy" else 0.0,
        optim=OptimConfig(lr=LR, weight_decay=WD, warmup_steps=1,
                          min_lr_ratio=MIN_LR_RATIO, grad_clip=0.0))

    # image bank: identical pixels to the reference's PIL+processor path
    from PIL import Image
    ids = np.sort(np.unique(mine.anchor["image_ids"]))
    bank = np.stack([
        _stub_processor_pixels(Image.open(io.BytesIO(rig["blobs"][int(i)])))
        for i in ids]).astype(np.float32)

    def rows_hook(batch):
        rows = np.searchsorted(ids, batch["image_ids"])
        rows = np.clip(rows, 0, len(ids) - 1)
        assert (ids[rows] == batch["image_ids"]).all()
        return {**batch, "image_ids": rows.astype(np.int32)}

    mine.batch_hook = rows_hook
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        init_teacher, make_bank_image_source, train_teacher)
    bank_j = jnp.asarray(bank)

    init_model = captured["init_model"]
    tm_kwargs = {}
    if mode == "dual":
        keep = [int(i) for i in init_model.cxr_head_keep_idx.numpy()]
        tm_kwargs = {"n_pretrained_labels": len(LABELS),
                     "static_keep_idx": tuple(keep)}
    template = init_teacher(
        TeacherModel_like(teacher_cfg, **tm_kwargs), teacher_cfg, n_train, T,
        jax.random.key(0))
    variables = _transplant_init(init_model, rig["hf_vit"], teacher_cfg,
                                 template)

    result = train_teacher(
        mine, teacher_cfg, cfg, str(tmp_path / "jax_run"), LABELS,
        image_source=make_bank_image_source(bank_j),
        init_variables=jax.tree.map(jnp.asarray, variables),
        prefetch_depth=0, pretrained_head_ckpt=my_head)

    # ---- per-epoch branch-loss parity (deterministic ⇒ tight) ----------
    ref_losses = captured["steps"]
    if mode == "single":
        key_pairs = (("loss", "train_total"),
                     ("stage2_total", "train_stage2_total"),
                     ("stage4_total", "train_stage4_total"))
    elif mode == "legacy":
        key_pairs = (("loss", "train_loss"),
                     ("main_loss", "train_main_loss"),
                     ("aux_loss", "train_aux_loss"))
    else:
        key_pairs = (("loss", "train_total"),
                     ("img_total", "train_img_total"),
                     ("ts_total", "train_ts_total"),
                     ("fus_total", "train_fus_total"))
    for e in range(EPOCHS):
        h = result.history[e]
        for ref_k, my_k in key_pairs:
            r, m = ref_losses[e][ref_k], h[my_k]
            assert abs(r - m) <= 2e-3 + 5e-3 * abs(r), (
                f"epoch {e} {ref_k}: ref={r:.6f} mine={m:.6f}")

    # ---- per-epoch val AUROC parity ------------------------------------
    for e in range(EPOCHS):
        r_auroc = ref_vals[e][val_key]
        m_auroc = result.history[e]["val_main_auroc"]
        assert abs(r_auroc - m_auroc) <= 0.06, (
            f"epoch {e} val AUROC: ref={r_auroc:.4f} mine={m_auroc:.4f}")

    # ---- final test AUROC parity ---------------------------------------
    r_test = ref_vals[-1][val_key]
    m_test = result.test_metrics.get("main_auroc",
                                     result.test_metrics.get("auroc"))
    assert abs(r_test - m_test) <= 0.06, (
        f"test AUROC: ref={r_test:.4f} mine={m_test:.4f}")


def TeacherModel_like(cfg, **kwargs):
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    return TeacherModel(cfg, **kwargs)


def test_lr_schedule_matches_torch_sequential():
    """The optax warmup+cosine group schedules must reproduce torch
    LinearLR→CosineAnnealingLR under SequentialLR exactly, including the
    ABSOLUTE eta_min shared across differential-LR groups
    (trainer.py:119-125)."""
    from torch.optim.lr_scheduler import (CosineAnnealingLR, LinearLR,
                                          SequentialLR)
    from multimodal_edema_prediction_tpu.train.optim import warmup_cosine

    base, mult, warmup, total, ratio = 1e-3, 0.2, 3, 12, 0.01
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([{"params": [p], "lr": base * mult}])
    sched = SequentialLR(
        opt,
        [LinearLR(opt, start_factor=1e-4, end_factor=1.0, total_iters=warmup),
         CosineAnnealingLR(opt, T_max=total - warmup,
                           eta_min=base * ratio)],
        milestones=[warmup])
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    alpha = min(ratio / mult, 1.0)
    mine = warmup_cosine(base * mult, warmup, total, alpha)
    my_lrs = [float(mine(np.int32(i))) for i in range(total)]
    # optax computes schedules in f32 — allow its rounding
    np.testing.assert_allclose(my_lrs, torch_lrs, rtol=1e-3, atol=1e-10)
