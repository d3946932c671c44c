"""DuETT: dual-axis transformer over the (time × event) grid — TPU-native.

Re-design of the reference ``duett/duett.py:48-495`` +
``models/main_architecture_duett.py:26-94``:

- The V per-variable embedding MLPs (a python loop over ``nn.ModuleList`` in
  the reference, duett.py:84-86/259-260) become one batched einsum stack
  (:class:`~..models.layers.PerVariableMLP`) — a single MXU matmul per layer.
- The dual-axis factorization is kept: attention cost T²·V + V²·T instead of
  (T·V)² by folding the other axis into the channel dim. Event axis: V+1
  tokens of dim d·(T+1); time axis: T+1 tokens of dim d·(V+1).
- All masking (timestep masking, event masking, SSL reconstruction targets)
  is computed with `jnp.where` selects over fixed shapes — no data-dependent
  control flow, fully jit/pjit compatible.
- Augmentation and SSL mask sampling use `jax.random` (the reference used
  per-sample numpy RNG in the DataLoader loop, duett.py:169-175/198-219);
  exact RNG streams differ but the distributions match.

Shape conventions
    x_ts    [B, T, 2V]   dense window: values(V) | counts(V)
    x_in    [B, T, 2V+1] after feats_to_input: values | counts | mask-col
    times   [B, T]       bin end times (hours / 24)
    tokens  [B, T+1, R]  R = d_embedding·(V+1); row T is the [REP] token
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DuettConfig
from .layers import CVE, PerVariableMLP, SimpleMLP, TransformerEncoder

MASKED_KEY = 0           # duett.py:79
REP_KEY = 1              # duett.py:80


# =============================================================================
# Input prep (feats_to_input, duett.py:159-187) — pure jit-able functions
# =============================================================================
def feats_to_input(rng: Optional[jax.Array], x_ts: jnp.ndarray,
                   x_static: jnp.ndarray, aug_noise: float = 0.0,
                   aug_mask: float = 0.0, train: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append the mask column; apply train-time augmentation.

    Returns (x_in [B,T,2V+1], x_static).
    """
    B, T, C = x_ts.shape
    V = C // 2
    values, counts = x_ts[..., :V], x_ts[..., V:]
    mask_col = jnp.zeros((B, T, 1), x_ts.dtype)
    if train and (aug_noise > 0 or aug_mask > 0):
        assert rng is not None
        r_noise, r_mask, r_static = jax.random.split(rng, 3)
        if aug_noise > 0:
            # noise scaled by the count channel (duett.py:170)
            values = values + aug_noise * jax.random.normal(
                r_noise, values.shape, values.dtype) * counts
            x_static = x_static + aug_noise * jax.random.normal(
                r_static, x_static.shape, x_static.dtype)
        if aug_mask > 0:
            m = jax.random.uniform(r_mask, (B, T)) < aug_mask
            values = jnp.where(m[..., None], 0.0, values)
            counts = jnp.where(m[..., None], 0.0, counts)
            mask_col = m[..., None].astype(x_ts.dtype)
    return jnp.concatenate([values, counts, mask_col], axis=-1), x_static


class PretrainBatch(NamedTuple):
    """Masked SSL inputs + reconstruction targets (duett.py:189-237)."""
    x_in: jnp.ndarray            # [B, T, 2V+1] masked input
    mask_idx: jnp.ndarray        # [B, S] masked timestep indices
    y_value: jnp.ndarray         # [B, S, V] target values
    y_presence_mask: jnp.ndarray  # [B, S, V] target presence (counts clip 0..1)
    event_var: jnp.ndarray       # [B] masked variable index
    y_events: jnp.ndarray        # [B, T] target values of the masked variable
    y_events_mask: jnp.ndarray   # [B, T]


def pretrain_prep_batch(rng: jax.Array, x_ts: jnp.ndarray,
                        masked_steps: int = 1,
                        pretrain_dropout: float = 0.5,
                        predict_events: bool = True,
                        mask_idx: Optional[jnp.ndarray] = None,
                        event_var: Optional[jnp.ndarray] = None
                        ) -> PretrainBatch:
    """jit-able SSL masking. Windows are always dense (n == T), so the
    reference's per-sample branch on n_timesteps collapses to uniform sampling.

    ``mask_idx`` [B,S] / ``event_var`` [B] override the random draws with
    caller-chosen masks — used by the loop-parity harness to transplant the
    reference trainer's exact mask sequence (its masking comes from a
    seeded numpy Generator, duett/duett.py:205-215, which no jax.random
    stream can reproduce).
    """
    B, T, C = x_ts.shape
    V = C // 2
    S = masked_steps
    r_steps, r_event, r_drop = jax.random.split(rng, 3)

    values, counts = x_ts[..., :V], x_ts[..., V:]
    # -- timestep masking (with replacement, matching rng.choice default) --
    if mask_idx is None:
        mask_idx = jax.random.randint(r_steps, (B, S), 0, T)
    else:
        mask_idx = jnp.asarray(mask_idx, jnp.int32).reshape(B, S)
    take = lambda a: jnp.take_along_axis(  # noqa: E731
        a, mask_idx[..., None], axis=1)
    y_value = take(values)                               # [B,S,V]
    y_presence_mask = jnp.clip(take(counts), 0.0, 1.0)   # [B,S,V]

    row_masked = jnp.zeros((B, T), bool).at[
        jnp.arange(B)[:, None], mask_idx].set(True)
    x_masked = jnp.where(row_masked[..., None], 0.0, x_ts)
    mask_col = row_masked[..., None].astype(x_ts.dtype)

    # -- event (variable) masking --
    if event_var is None:
        event_var = jax.random.randint(r_event, (B,), 0, V)
    else:
        event_var = jnp.asarray(event_var, jnp.int32).reshape(B)
    var_onehot = jax.nn.one_hot(event_var, V, dtype=x_ts.dtype)  # [B,V]
    y_events = jnp.einsum("btv,bv->bt", values, var_onehot)
    y_events_mask = jnp.clip(
        jnp.einsum("btv,bv->bt", counts, var_onehot), 0.0, 1.0)
    if predict_events:
        vmask = var_onehot[:, None, :] > 0                       # [B,1,V]
        x_val = jnp.where(vmask, 0.0, x_masked[..., :V])
        x_cnt = jnp.where(vmask, -1.0, x_masked[..., V:])
    else:
        x_val, x_cnt = x_masked[..., :V], x_masked[..., V:]

    # -- variable dropout (duett.py:227-236) --
    if pretrain_dropout > 0:
        keep = jax.random.uniform(r_drop, (B, V)) > pretrain_dropout
        observed_at_masked = jnp.clip(y_presence_mask.sum(axis=1), 0.0, 1.0)
        keep = jnp.logical_or(observed_at_masked < 0.5, keep)     # [B,V]
        kb = keep[:, None, :]
        x_val = jnp.where(kb, x_val, 0.0)
        x_cnt = jnp.where(jnp.logical_or(kb, x_cnt == -1.0), x_cnt, 0.0)

    x_in = jnp.concatenate([x_val, x_cnt, mask_col], axis=-1)
    return PretrainBatch(x_in, mask_idx, y_value, y_presence_mask,
                         event_var, y_events, y_events_mask)


# =============================================================================
# Encoder
# =============================================================================
class DuettEncoder(nn.Module):
    """Dual-axis encoder: returns all T+1 contextual tokens + the psi grid.

    Reference: DuettFeatureExtractor.encode
    (models/main_architecture_duett.py:31-94).

    ``identity_tx=True`` skips the transformer blocks while keeping the
    positional-embedding adds and axis-fold reshapes — used only by the
    reference-parity harness (tests/test_reference_parity.py), which patches
    the reference's x_transformers encoders to identity the same way.
    """
    cfg: DuettConfig
    identity_tx: bool = False

    @nn.compact
    def __call__(self, x_in: jnp.ndarray, x_static: jnp.ndarray,
                 times: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        B, T, _ = x_in.shape
        V, d = cfg.n_variables, cfg.d_embedding
        values, counts = x_in[..., :V], x_in[..., V:2 * V]
        row_mask_col = x_in[..., -1]

        # event-mask cells flagged by count == -1 (duett.py:248-250)
        event_mask = counts == -1.0                           # [B,T,V]
        event_mask = jnp.concatenate(
            [event_mask, jnp.zeros((B, T, 1), bool)], axis=2)  # +static col
        event_mask = jnp.concatenate(
            [event_mask, event_mask[:, :1, :]], axis=1)        # +REP row

        # count-bin embedding → scalar per cell (duett.py:88,251-252)
        n_obs = nn.Embed(cfg.n_obs_bins, 1, name="n_obs_embedding",
                         param_dtype=jnp.float32)(
            jnp.clip(counts.astype(jnp.int32), 0, cfg.n_obs_bins - 1))
        cell_in = jnp.stack(
            [values, n_obs.squeeze(-1).astype(values.dtype)], axis=-1)

        # per-variable MLP embeddings — one einsum stack
        emb = PerVariableMLP(V, d, cfg.d_hidden_mlp_embedding,
                             name="embedding_layers")(cell_in, train=train)

        static_emb = SimpleMLP(d, cfg.n_hidden_tab_encoder,
                               cfg.d_hidden_tab_encoder, hidden_batch_norm=True,
                               name="tab_encoder")(
            x_static.astype(emb.dtype), train=train)          # [B,d]

        special = self.param("special_embeddings",
                             nn.initializers.normal(1.0), (8, d), jnp.float32)
        special = special.astype(emb.dtype)

        # assemble psi [B, T+1, V+1, d]
        psi_t = jnp.concatenate(
            [emb, jnp.broadcast_to(static_emb[:, None, None, :],
                                   (B, T, 1, d))], axis=2)     # [B,T,V+1,d]
        rep_row = jnp.broadcast_to(special[REP_KEY], (B, 1, V + 1, d))
        psi = jnp.concatenate([psi_t, rep_row], axis=1)        # [B,T+1,V+1,d]

        row_mask = jnp.concatenate(
            [row_mask_col == 1.0, jnp.zeros((B, 1), bool)], axis=1)
        psi = jnp.where(row_mask[:, :, None, None], special[MASKED_KEY], psi)
        psi = jnp.where(event_mask[..., None], special[MASKED_KEY], psi)

        # time embeddings over continuous bin ends (duett.py:106,269-272)
        tt_dim, et_dim = cfg.tt_dim, cfg.et_dim
        time_emb = CVE(tt_dim, batch_norm=True, name="full_time_embedding")(
            times[..., None].astype(emb.dtype), train=train)   # [B,T,tt_dim]
        rep_time = self.param("full_rep_embedding",
                              nn.initializers.normal(1.0), (tt_dim,),
                              jnp.float32).astype(emb.dtype)
        time_emb = jnp.concatenate(
            [time_emb, jnp.broadcast_to(rep_time, (B, 1, tt_dim))], axis=1)

        event_pos = self.param("full_event_embedding",
                               nn.initializers.normal(1.0), (V + 1, et_dim),
                               jnp.float32).astype(emb.dtype)

        d_head = d // cfg.n_heads
        for i in range(cfg.n_layers):
            # event axis: tokens = variables, channels = all timesteps
            ev = psi.transpose(0, 2, 1, 3).reshape(B, V + 1, et_dim) + event_pos
            if not self.identity_tx:
                ev = TransformerEncoder(
                    1, cfg.n_heads, d_head, cfg.d_feedforward,
                    cfg.transformer_dropout, cfg.scalenorm,
                    name=f"event_transformer_{i}")(ev, train=train)
            psi = ev.reshape(B, V + 1, T + 1, d).transpose(0, 2, 1, 3)
            # time axis: tokens = hours, channels = all variables
            tt = psi.reshape(B, T + 1, tt_dim) + time_emb
            if not self.identity_tx:
                tt = TransformerEncoder(
                    1, cfg.n_heads, d_head, cfg.d_feedforward,
                    cfg.transformer_dropout, cfg.scalenorm,
                    name=f"time_transformer_{i}")(tt, train=train)
            psi = tt.reshape(B, T + 1, V + 1, d)

        tokens = psi.reshape(B, T + 1, tt_dim)
        return tokens, psi


# =============================================================================
# SSL pretraining model (heads at duett.py:110-122, forward at :304-316)
# =============================================================================
class DuettPretrainModel(nn.Module):
    cfg: DuettConfig

    @nn.compact
    def __call__(self, pb: PretrainBatch, x_static: jnp.ndarray,
                 times: jnp.ndarray, train: bool = False) -> dict:
        cfg = self.cfg
        tokens, psi = DuettEncoder(cfg, name="encoder")(
            pb.x_in, x_static, times, train=train)
        B = tokens.shape[0]

        # masked-embed fusion: gather the masked timesteps' contextual tokens
        z = jnp.take_along_axis(
            tokens, pb.mask_idx[..., None], axis=1)          # [B,S,R]

        head = lambda name: SimpleMLP(  # noqa: E731
            cfg.n_variables, cfg.pretrain_n_hidden, cfg.pretrain_d_hidden,
            hidden_batch_norm=True, name=name)
        out = {"y_hat_value": head("pretrain_value_proj")(z, train=train)
               if cfg.pretrain_value else None,
               "y_hat_presence": head("pretrain_presence_proj")(z, train=train)
               if cfg.pretrain_presence else None}

        if cfg.predict_events:
            # psi column of the masked variable, flattened over time → et_dim
            var_onehot = jax.nn.one_hot(pb.event_var, cfg.n_variables + 1,
                                        dtype=psi.dtype)
            z_events = jnp.einsum("btvd,bv->btd", psi, var_onehot)
            z_events = z_events.reshape(B, cfg.et_dim)
            ehead = lambda name: SimpleMLP(  # noqa: E731
                cfg.n_timesteps, cfg.pretrain_n_hidden, cfg.pretrain_d_hidden,
                hidden_batch_norm=True, name=name)
            out["y_hat_events"] = ehead("predict_events_proj")(
                z_events, train=train)
            out["y_hat_events_presence"] = (
                ehead("predict_events_presence_proj")(z_events, train=train)
                if cfg.pretrain_presence else None)
        else:
            out["y_hat_events"] = None
            out["y_hat_events_presence"] = None
        return out


# =============================================================================
# Supervised classifier (finetune path; fusion_method pooling duett.py:282-298)
# =============================================================================
class DuettClassifier(nn.Module):
    cfg: DuettConfig
    d_target: int = 1
    fusion_method: str = "rep_token"   # {'rep_token', 'averaging'}

    @nn.compact
    def __call__(self, x_in: jnp.ndarray, x_static: jnp.ndarray,
                 times: jnp.ndarray, train: bool = False,
                 return_representation: bool = False):
        cfg = self.cfg
        tokens, _ = DuettEncoder(cfg, name="encoder")(
            x_in, x_static, times, train=train)
        if self.fusion_method == "rep_token":
            z = tokens[:, -1, :]
        elif self.fusion_method == "averaging":
            z = tokens[:, :-1, :].mean(axis=1)
        else:
            raise ValueError(f"unknown fusion_method {self.fusion_method!r}")
        logits = SimpleMLP(self.d_target, cfg.n_hidden_head, cfg.d_hidden_head,
                           hidden_batch_norm=True, name="head")(z, train=train)
        logits = logits.squeeze(-1) if self.d_target == 1 else logits
        if return_representation:
            return logits, z
        return logits
