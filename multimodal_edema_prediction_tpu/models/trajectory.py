"""LocalTrajectoryEncoder: per-variable GRU over the 24 h window.

Reference: ``models/main_architecture_duett.py:1242-1391``. Encodes each
variable's trajectory *before* cross-variable mixing: per-(variable,hour)
5-feature local input (value, observed flag, normalized log-count,
time-since-observation, time-to-anchor), a shared GRU over B·V independent
sequences, then non-overlapping recency-window mean pooling → one token per
(variable, window) + a REP token.

TPU notes: the GRU is a `flax.linen.GRUCell` driven by `nn.RNN` (lax.scan
under jit) over the folded [B·V, T, d] batch — the time loop is sequential
but every step is a [B·V, d] matmul, which keeps the MXU busy; the
time-since-observation recurrence is a `lax.scan` over T with vectorized
state. Returns an attention padding mask marking (variable, window) tokens
with no observations (True = ignore, matching torch MultiheadAttention
key_padding_mask semantics).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import gelu_exact


def time_since_last_observation(observed: jnp.ndarray) -> jnp.ndarray:
    """[B,T,V] bool → [B,T,V] float: grid steps since the previous
    observation, counting the current slot (reference :1312-1327)."""
    B, T, V = observed.shape

    def step(elapsed, obs_t):
        elapsed = elapsed + 1.0
        out = elapsed
        elapsed = jnp.where(obs_t, 0.0, elapsed)
        return elapsed, out

    _, out = jax.lax.scan(step, jnp.zeros((B, V)),
                          observed.transpose(1, 0, 2))
    return out.transpose(1, 0, 2)


class LocalTrajectoryEncoder(nn.Module):
    n_vars: int
    n_timesteps: int = 24
    d_model: int = 128
    dropout: float = 0.1
    recency_windows: Tuple[int, ...] = (6, 12, 24)

    def setup(self):
        windows = tuple(sorted(set(int(w) for w in self.recency_windows)))
        if not windows or windows[-1] != self.n_timesteps:
            raise ValueError(
                f"recency_windows must end at n_timesteps={self.n_timesteps},"
                f" got {windows}")
        self.windows = windows

    @property
    def d_representation(self) -> int:
        return self.d_model

    @nn.compact
    def __call__(self, x_ts: jnp.ndarray, train: bool = False,
                 return_padding_mask: bool = False):
        """x_ts [B, T, 2V] → tokens [B, V·W+1, d] (+ padding mask)."""
        B, T, C = x_ts.shape
        V, d = self.n_vars, self.d_model
        if T != self.n_timesteps or C != 2 * V:
            raise ValueError(f"expected [B,{self.n_timesteps},{2*V}], "
                             f"got {x_ts.shape}")
        values = x_ts[..., :V]
        counts = jnp.maximum(x_ts[..., V:], 0.0)
        observed = counts > 0
        values = jnp.where(observed, values, 0.0)
        log_count = jnp.log1p(counts) / jnp.log(16.0)
        delta = time_since_last_observation(observed).astype(x_ts.dtype) / T
        ttc = jnp.arange(T, 0, -1, dtype=x_ts.dtype)[None, :, None] / T
        ttc = jnp.broadcast_to(ttc, (B, T, V))

        local = jnp.stack([values, observed.astype(x_ts.dtype), log_count,
                           delta, ttc], axis=-1)            # [B,T,V,5]
        local = local.transpose(0, 2, 1, 3).reshape(B * V, T, 5)

        h = nn.Dense(d, dtype=x_ts.dtype, param_dtype=jnp.float32,
                     name="input_proj")(local)
        h = gelu_exact(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="input_norm")(
            h).astype(x_ts.dtype)

        var_emb = nn.Embed(V, d, name="variable_embedding",
                           param_dtype=jnp.float32)(jnp.arange(V))
        var_emb = jnp.tile(var_emb, (B, 1))[:, None, :].astype(h.dtype)
        hour_emb = nn.Embed(T, d, name="hour_embedding",
                            param_dtype=jnp.float32)(
            jnp.arange(T))[None].astype(h.dtype)
        h = nn.Dropout(self.dropout, deterministic=not train)(
            h + var_emb + hour_emb)

        rnn = nn.RNN(nn.GRUCell(features=d, param_dtype=jnp.float32),
                     name="temporal")
        h = rnn(h)                                           # [B·V, T, d]

        win_emb = self.param("window_embedding",
                             nn.initializers.normal(1.0),
                             (len(self.windows), d), jnp.float32)
        observed_by_var = observed.transpose(0, 2, 1)        # [B,V,T]
        pooled, valid = [], []
        prev = 0
        for wi, boundary in enumerate(self.windows):
            start, end = T - boundary, T - prev
            token = h[:, start:end, :].mean(axis=1)          # [B·V, d]
            pooled.append(token + win_emb[wi].astype(token.dtype))
            valid.append(observed_by_var[:, :, start:end].any(axis=-1))
            prev = boundary
        tokens = jnp.stack(pooled, axis=1)                   # [B·V, W, d]
        W = len(self.windows)
        tokens = tokens.reshape(B, V, W, d)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="output_norm")(
            tokens).astype(x_ts.dtype).reshape(B, V * W, d)

        rep = self.param("rep_token", nn.initializers.normal(0.02),
                         (1, 1, d), jnp.float32)
        tokens = jnp.concatenate(
            [tokens, jnp.broadcast_to(rep.astype(tokens.dtype),
                                      (B, 1, d))], axis=1)
        if not return_padding_mask:
            return tokens
        valid_mask = jnp.stack(valid, axis=2).reshape(B, V * W)
        padding_mask = ~jnp.concatenate(
            [valid_mask, jnp.ones((B, 1), bool)], axis=1)
        return tokens, padding_mask
