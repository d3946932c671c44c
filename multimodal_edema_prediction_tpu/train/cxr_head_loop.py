"""CXR linear-head training on the full image catalog.

Reference: ``cxr_linear_training.ipynb``. Features (frozen ViT CLS) are
extracted once and cached; the head trains full-batch on device with masked
BCE; selection = best val macro AUROC; the checkpoint stores
``label_cols`` + the linear weights in the layout the ``dual`` teacher
consumes (``PretrainedCXRHead``).
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import train_test_split

from ..config import ViTConfig
from ..models.cxr_head import CXRLinearHead
from ..models.vit import DinoViT
from ..ops import metrics as M
from ..ops.losses import masked_per_label_bce
from ..utils.logging import Logger
from .checkpoint import load_checkpoint, save_checkpoint


def split_catalog_subjects(subject_ids: np.ndarray, labels: np.ndarray,
                           seed: int = 42) -> dict:
    """Subject-level 70/15/15 over labeled catalog rows — THE split every
    downstream stage aligns to (data_processing.py:234-243)."""
    has = ~np.isnan(labels).all(axis=1)
    subj = subject_ids[has]
    _, fi = np.unique(subj, return_index=True)
    subj_all = subj[np.sort(fi)]
    tr, tmp = train_test_split(subj_all, test_size=0.30, random_state=seed)
    va, te = train_test_split(tmp, test_size=0.50, random_state=seed)
    idx = np.arange(len(subject_ids))
    return {
        "train": idx[has & np.isin(subject_ids, tr)],
        "val": idx[has & np.isin(subject_ids, va)],
        "test": idx[has & np.isin(subject_ids, te)],
    }


def extract_cls_features(vit_params, vit_cfg: ViTConfig, image_source,
                         image_ids: np.ndarray, labels: np.ndarray,
                         batch_size: int = 64,
                         cache_path: Optional[str] = None,
                         jpeg_store=None,
                         u8_store_path: Optional[str] = None) -> np.ndarray:
    """``jpeg_store`` switches the catalog sweep to real images. With
    ``u8_store_path`` the images are decoded ONCE into a disk-resident uint8
    memmap (``data/images.py::U8MemmapStore`` — the catalog-scale tier: 240k
    images fit neither HBM nor RAM) and every pass serves page-cached reads;
    without it JPEG bytes are native-decoded per chunk each pass (the
    reference re-decodes per sample per epoch,
    cxr_linear_training.ipynb cells 6-9). Host work overlaps device compute
    via a one-deep pipeline."""
    if cache_path and os.path.exists(cache_path):
        return np.load(cache_path)["cls"]

    u8_fn = None
    if jpeg_store is not None:
        from ..train.engine import default_image_source
        image_source = default_image_source
        if u8_store_path is not None:
            from ..data.images import U8MemmapStore
            store = U8MemmapStore.build(jpeg_store, image_ids,
                                        vit_cfg.image_size, u8_store_path)
            u8_fn = store.get_batch
        else:
            from ..data.images import decode_batch

    @jax.jit
    def step(batch):
        cls, _ = DinoViT(vit_cfg).apply({"params": vit_params},
                                        image_source(batch), train=False)
        return cls.astype(jnp.float32)

    def make_batch(i):
        idx = np.arange(i, min(i + batch_size, len(image_ids)))
        batch = {
            "image_ids": image_ids[idx].astype(np.int32),
            "y_multi": np.nan_to_num(labels[idx], nan=0.0)}
        if u8_fn is not None:
            batch["pixel_u8"] = u8_fn(image_ids[idx])
        elif jpeg_store is not None:
            blobs = [jpeg_store.get(j) for j in image_ids[idx]]
            batch["pixel_values"] = decode_batch(blobs, vit_cfg.image_size)
        return batch

    from concurrent.futures import ThreadPoolExecutor
    out = []
    N = len(image_ids)
    starts = list(range(0, N, batch_size))
    with ThreadPoolExecutor(1) as ex:
        nxt = ex.submit(make_batch, starts[0])
        for k, i in enumerate(starts):
            batch = nxt.result()
            if k + 1 < len(starts):   # overlap host image work with the ViT
                nxt = ex.submit(make_batch, starts[k + 1])
            out.append(np.asarray(step(batch)))
    cls = np.concatenate(out)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, cls=cls)
    return cls


def train_cxr_head(cls_features: np.ndarray, labels: np.ndarray,
                   splits: dict, label_cols: Sequence[str], ckpt_path: str,
                   lr: float = 1e-3, weight_decay: float = 1e-4,
                   epochs: int = 50, dropout: float = 0.2, seed: int = 0,
                   batch_size: int = 0,
                   uncertain_policy: str = "to_positive",
                   logger: Optional[Logger] = None) -> dict:
    """``uncertain_policy='to_positive'`` applies the reference's U→1
    mapping at the CXR-head level (cxr_db.ipynb cell 24) before masking;
    ``batch_size=0`` keeps the full-batch path (fine at 240k×768 f32),
    ``>0`` trains mini-batch like the reference (cxr_linear_training.ipynb
    cell 10) — robust when the feature matrix outgrows HBM."""
    from ..data.cxr_catalog import apply_uncertain_policy
    log = logger or Logger("cxr_head")
    K = labels.shape[1]
    head = CXRLinearHead(K, dropout)
    labels = apply_uncertain_policy(labels, uncertain_policy)
    mask = (~np.isnan(labels)).astype(np.float32)
    y = np.nan_to_num(labels, nan=0.0).astype(np.float32)

    x_tr = jnp.asarray(cls_features[splits["train"]])
    y_tr = jnp.asarray(y[splits["train"]])
    m_tr = jnp.asarray(mask[splits["train"]])
    params = head.init({"params": jax.random.key(seed)}, x_tr[:2])["params"]
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def full_batch_epoch(params, opt_state, rng):
        def loss(p):
            logits = head.apply({"params": p}, x_tr, train=True,
                                rngs={"dropout": rng})
            return masked_per_label_bce(logits, y_tr, m_tr).sum()
        g = jax.grad(loss)(params)
        up, opt_state2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state2

    @jax.jit
    def minibatch_step(params, opt_state, rng, xb, yb, mb):
        def loss(p):
            logits = head.apply({"params": p}, xb, train=True,
                                rngs={"dropout": rng})
            return masked_per_label_bce(logits, yb, mb).sum()
        g = jax.grad(loss)(params)
        up, opt_state2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state2

    n_tr = int(x_tr.shape[0])
    shuffle_rng = np.random.default_rng(seed)

    def train_epoch(params, opt_state, rng):
        if batch_size <= 0 or batch_size >= n_tr:
            return full_batch_epoch(params, opt_state, rng)
        order = shuffle_rng.permutation(n_tr)
        stop = n_tr - n_tr % batch_size
        for i in range(0, stop, batch_size):
            b = order[i:i + batch_size]
            rng, sub = jax.random.split(rng)
            params, opt_state = minibatch_step(
                params, opt_state, sub, x_tr[b], y_tr[b], m_tr[b])
        return params, opt_state

    @jax.jit
    def predict(params, x):
        return head.apply({"params": params}, x, train=False)

    def macro_auroc(params, split):
        logits = np.asarray(predict(params, jnp.asarray(
            cls_features[splits[split]])))
        rows = M.masked_multilabel_metrics(y[splits[split]],
                                           mask[splits[split]],
                                           {"head": logits})
        return M.macro_mean(rows, "head_auroc"), rows

    rng = jax.random.key(seed + 1)
    best = -1.0
    best_params = params
    for epoch in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state = train_epoch(params, opt_state, sub)
        val_auroc, _ = macro_auroc(params, "val")
        if val_auroc > best:
            best, best_params = val_auroc, jax.tree.map(lambda a: a, params)
        if epoch % 10 == 0:
            log.info(f"epoch {epoch:3d}  val macro AUROC={val_auroc:.4f}")

    test_auroc, test_rows = macro_auroc(best_params, "test")
    log.info(f"best val={best:.4f}  test={test_auroc:.4f}")
    save_checkpoint(ckpt_path, best_params, {}, epochs, best,
                    config={"label_cols": list(label_cols),
                            "num_classes": K, "kind": "cxr_linear_head"})
    return {"best_val_macro_auroc": best, "test_macro_auroc": test_auroc,
            "test_per_label": test_rows, "ckpt_path": ckpt_path,
            "params": best_params}


def load_cxr_head_into_teacher(head_ckpt: str, teacher_params: dict,
                               pathology_labels: Sequence[str]) -> tuple:
    """Load the head checkpoint into TeacherModel('dual') params and compute
    keep_idx mapping head outputs → pathology_labels order
    (models/main_architecture_duett.py:1047-1069)."""
    ckpt = load_checkpoint(head_ckpt)
    pretrained_labels = list(ckpt["config"]["label_cols"])
    missing = [l for l in pathology_labels if l not in pretrained_labels]
    if missing:
        raise ValueError(f"pretrained CXR head missing labels: {missing}; "
                         f"has {pretrained_labels}")
    keep_idx = np.asarray([pretrained_labels.index(l)
                           for l in pathology_labels], np.int32)
    out = dict(teacher_params)
    out["pretrained_cxr_head"] = {"linear": ckpt["params"]["linear"]}
    return out, keep_idx
