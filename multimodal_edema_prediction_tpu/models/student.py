"""Student model: DuETT backbone + MLP head (no images).

Reference: ``models/main_architecture_duett.py:1202-1235``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import StudentConfig
from .duett import DuettEncoder
from .layers import gelu_exact


class StudentModel(nn.Module):
    cfg: StudentConfig

    @nn.compact
    def __call__(self, x_in: jnp.ndarray, x_static: jnp.ndarray,
                 times: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        tokens, _ = DuettEncoder(self.cfg.duett, name="duett")(
            x_in, x_static, times, train=train)
        if self.cfg.pool == "rep_token":
            feat = tokens[:, -1, :]
        elif self.cfg.pool == "mean":
            feat = tokens[:, :-1, :].mean(axis=1)   # exclude [REP]
        else:
            raise ValueError(f"unknown pool {self.cfg.pool!r}")
        h = nn.Dense(self.cfg.head_hidden, dtype=feat.dtype,
                     param_dtype=jnp.float32, name="head_in")(feat)
        h = gelu_exact(h)
        h = nn.Dropout(self.cfg.head_dropout, deterministic=not train)(h)
        logit = nn.Dense(1, dtype=feat.dtype, param_dtype=jnp.float32,
                         name="head_out")(h)
        return logit.squeeze(-1)
