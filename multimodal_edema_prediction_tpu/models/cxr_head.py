"""Frozen-ViT CXR linear head over the CheXpert labels.

Reference: ``cxr_linear_training.ipynb`` cells 6-13 — Dropout+Linear on the
frozen RAD-DINO CLS token, masked BCE over 7 labels, subject-level 70/15/15
split (seed 42), best-val macro-AUROC selection. The saved artifact
(classifier weights + ``label_cols``) is what the ``dual`` TeacherModel loads
and index-selects (models/main_architecture_duett.py:1047-1069).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class CXRLinearHead(nn.Module):
    n_labels: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, cls: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Dropout(self.dropout, deterministic=not train)(cls)
        return nn.Dense(self.n_labels, dtype=cls.dtype,
                        param_dtype=jnp.float32, name="linear")(h)
