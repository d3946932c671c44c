"""Pathology-query Perceiver fusion.

Reference: ``models/main_architecture_duett.py:538-654`` (active
``PatchDualPathologyPerceiver``) and ``:745-774`` (``_PerceiverBlock``).
The ``dual`` variant reconstructs the frozen-CXR-head residual perceiver
(``:659-741``, commented in the reference but required by its student path).

Residual fusion rule (the core design):
    fusion_logit = stop_grad(img_logit) + beta[k] · correction_head(T_k)
with a zero-initialized correction output layer so fusion starts exactly at
the image anchor.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import PerceiverConfig
from .layers import MultiHeadAttention, gelu_exact


class PerceiverBlock(nn.Module):
    """Pre-LN cross-attention + FFN with residuals (reference :745-774).

    ``use_flash``: route the attention through the Pallas flash kernel
    where that is numerically EXACT — eval/serving with KV length >= 256
    and d_head >= 64 (the img_cross 1370-token read). Training always
    keeps the standard path: the reference applies dropout 0.2 to the
    attention probabilities (run.py:78 → _PerceiverBlock), which the
    flash kernel cannot reproduce; `MultiHeadAttention.flash_ok` gates on
    exactly these conditions."""
    n_heads: int
    dropout: float = 0.1
    use_flash: bool = False

    @nn.compact
    def __call__(self, latents, kv, train: bool = False,
                 return_attn: bool = False):
        d = latents.shape[-1]
        q = nn.LayerNorm(dtype=jnp.float32, name="norm_q")(latents)
        k = nn.LayerNorm(dtype=jnp.float32, name="norm_kv")(kv)
        q = q.astype(latents.dtype)
        k = k.astype(latents.dtype)
        attn = MultiHeadAttention(self.n_heads, d // self.n_heads,
                                  self.dropout, qkv_bias=True,
                                  use_flash=self.use_flash, name="attn")
        if return_attn:
            a, w = attn(q, k, train=train, return_weights=True)
        else:
            a, w = attn(q, k, train=train), None
        latents = latents + a
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_ff")(
            latents).astype(latents.dtype)
        h = nn.Dense(d * 4, dtype=latents.dtype, param_dtype=jnp.float32,
                     name="ff_in")(h)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(d, dtype=latents.dtype, param_dtype=jnp.float32,
                     name="ff_out")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        latents = latents + h
        return (latents, w) if return_attn else latents


class _Head(nn.Module):
    """Linear→GELU→Dropout→Linear (reference ``_mk_head`` :572-576)."""
    d_hidden: int
    dropout: float
    use_bias_out: bool = True
    zero_init_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.d_hidden, dtype=x.dtype, param_dtype=jnp.float32,
                     name="in")(x)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out_init = nn.initializers.zeros if self.zero_init_out \
            else nn.initializers.lecun_normal()
        return nn.Dense(1, use_bias=self.use_bias_out, kernel_init=out_init,
                        dtype=x.dtype, param_dtype=jnp.float32,
                        name="out")(h)


class CorrectionHead(nn.Module):
    """LN→Linear→GELU→Dropout→Linear(no bias, zero-init) (:582-589)."""
    d_hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        return _Head(self.d_hidden, self.dropout, use_bias_out=False,
                     zero_init_out=True, name="head")(h, train=train)


def _correction_dropout(cfg: PerceiverConfig) -> float:
    """Correction-head dropout: ``correction_dropout`` when set, otherwise
    the shared head dropout. LP mode overrides it to ``--lp_correction_
    dropout`` (reference trainer.py:365-370 resets the module's p in-place)."""
    return cfg.head_dropout if cfg.correction_dropout is None \
        else cfg.correction_dropout


class PatchDualPathologyPerceiver(nn.Module):
    """K shared pathology queries cross-attend image patches and DuETT
    hourly tokens; residual fusion on top (reference :538-654)."""
    cfg: PerceiverConfig
    d_ts: int

    @nn.compact
    def __call__(self, ts_tokens: jnp.ndarray, img_patches_proj: jnp.ndarray,
                 train: bool = False, return_attn: bool = False,
                 ts_ablation: Optional[str] = None,
                 token_eps: Optional[tuple] = None) -> dict:
        """``token_eps=(eps_img, eps_ts)``: zero perturbations added to the
        post-self-attention fusion tokens (I, T_k) right before the heads.
        Differentiating the loss w.r.t. these at zero gives exactly
        ∂loss/∂tokens — the JAX equivalent of the reference diagnostic's
        ``torch.autograd.grad(loss, (img_tokens, ts_tokens))``
        (analysis/grad_flow_diagnostics.py:389-419). Training never passes
        it; only analysis/grad_flow_diagnostics.py does."""
        cfg = self.cfg
        abl = ts_ablation or cfg.ts_ablation
        if ts_tokens.ndim != 3:
            raise ValueError(f"ts_tokens must be [B,T+1,d_ts], "
                             f"got {ts_tokens.shape}")
        B = ts_tokens.shape[0]
        dtype = ts_tokens.dtype

        queries = self.param("shared_queries",
                             nn.initializers.normal(0.02),
                             (cfg.n_pathologies, cfg.d_latent), jnp.float32)
        q = jnp.broadcast_to(queries.astype(dtype),
                             (B, cfg.n_pathologies, cfg.d_latent))

        if abl == "full":
            ts_sel = ts_tokens
        elif abl == "hourly_only":
            ts_sel = ts_tokens[:, :-1, :]
        elif abl == "rep_only":
            ts_sel = ts_tokens[:, -1:, :]
        else:
            raise ValueError(f"unknown ts_ablation {abl!r}")
        ts_kv = nn.Dense(cfg.d_latent, dtype=dtype, param_dtype=jnp.float32,
                         name="ts_proj")(ts_sel)

        img_cross = PerceiverBlock(cfg.n_heads, cfg.dropout,
                                   use_flash=cfg.use_flash, name="img_cross")
        img_self = PerceiverBlock(cfg.n_heads, cfg.dropout, name="img_self")
        ts_cross = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_cross")
        ts_self = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_self")

        if return_attn:
            I, img_attn = img_cross(q, img_patches_proj, train=train,
                                    return_attn=True)
            Tk, ts_attn = ts_cross(q, ts_kv, train=train, return_attn=True)
        else:
            I = img_cross(q, img_patches_proj, train=train)
            Tk = ts_cross(q, ts_kv, train=train)
            img_attn = ts_attn = None
        I = img_self(I, I, train=train)
        Tk = ts_self(Tk, Tk, train=train)
        if token_eps is not None:
            I = I + token_eps[0].astype(I.dtype)
            Tk = Tk + token_eps[1].astype(Tk.dtype)

        img_bias = self.param("image_label_bias", nn.initializers.zeros,
                              (cfg.n_pathologies,), jnp.float32)
        ts_bias = self.param("temporal_label_bias", nn.initializers.zeros,
                             (cfg.n_pathologies,), jnp.float32)
        beta = self.param("beta", nn.initializers.ones,
                          (cfg.n_pathologies,), jnp.float32)

        img_logits = _Head(cfg.head_hidden, cfg.head_dropout,
                           name="image_head")(I, train=train).squeeze(-1)
        img_logits = img_logits.astype(jnp.float32) + img_bias[None, :]
        ts_logits = _Head(cfg.head_hidden, cfg.head_dropout,
                          name="temporal_head")(Tk, train=train).squeeze(-1)
        ts_logits = ts_logits.astype(jnp.float32) + ts_bias[None, :]

        corr = CorrectionHead(cfg.head_hidden, _correction_dropout(cfg),
                              name="correction_head")(
            Tk, train=train).squeeze(-1).astype(jnp.float32)
        scaled_corr = beta[None, :] * corr
        fusion_logits = jax.lax.stop_gradient(img_logits) + scaled_corr

        out = {
            "img_logits": img_logits,
            "ts_logits": ts_logits,
            "fusion_logits": fusion_logits,
            "img_tokens": I,
            "ts_tokens": Tk,
            "fusion_tokens": Tk,
            "ts_correction": corr,
            "scaled_correction": scaled_corr,
        }
        if return_attn:
            out["img_attn"] = img_attn
            out["ts_attn"] = ts_attn
        return out


class EventPerceiverBlock(nn.Module):
    """Event-grid cross-attention block.

    Same pre-LN cross-attn + FFN skeleton as :class:`PerceiverBlock`, but the
    query path is ``event_query_proj`` → ``event_query_norm`` — the exact
    attribute names the reference's analysis suite dispatches on for its
    event-attention perceiver variant (a designed-but-uncommitted API:
    ``analysis/grad_flow_diagnostics.py:563-571`` computes effective TS
    queries as ``event_query_norm(event_query_proj(temporal_prototypes))``,
    and ``analysis/visualize_pathology.py:291-292`` selects the
    ``event_attn`` output when ``event_query_proj`` exists). The projection
    lets the shared-latent-space query bank address the event-grid key space
    while keeping the residual stream in d_latent.
    """
    n_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, event_kv, train: bool = False,
                 return_attn: bool = False, key_padding_mask=None):
        d = queries.shape[-1]
        q = nn.Dense(d, dtype=queries.dtype, param_dtype=jnp.float32,
                     name="event_query_proj")(queries)
        q = nn.LayerNorm(dtype=jnp.float32, name="event_query_norm")(
            q).astype(queries.dtype)
        k = nn.LayerNorm(dtype=jnp.float32, name="norm_kv")(
            event_kv).astype(event_kv.dtype)
        attn = MultiHeadAttention(self.n_heads, d // self.n_heads,
                                  self.dropout, qkv_bias=True, name="attn")
        if return_attn:
            a, w = attn(q, k, train=train, return_weights=True,
                        key_padding_mask=key_padding_mask)
        else:
            a, w = attn(q, k, train=train,
                        key_padding_mask=key_padding_mask), None
        latents = queries + a
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_ff")(
            latents).astype(latents.dtype)
        h = nn.Dense(d * 4, dtype=latents.dtype, param_dtype=jnp.float32,
                     name="ff_in")(h)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(d, dtype=latents.dtype, param_dtype=jnp.float32,
                     name="ff_out")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        latents = latents + h
        return latents, w


class EventPatchPerceiver(nn.Module):
    """'dual_patch_event' mode: the reference's event-attention perceiver —
    designed in its tree but never committed (SURVEY §7.3).

    The reference's analysis suite was written against this newer API and the
    commented TeacherModel sketches it (``models/main_architecture_duett.py:
    886-893``: "use the grid instead of ts_tokens … grid cross (Q: pathology
    queries, K,V: grid)"), but the checked-in model only ships the
    hourly-token path. This class completes it, TPU-first:

    - **independent query banks** ``image_queries`` + ``temporal_queries``
      (the two-bank layout ``grad_flow_diagnostics._find_pathology_query_banks``
      prefers, reference ``:70-90``) instead of ``shared_queries``;
    - the temporal branch cross-attends the **dynamic event grid**: each of
      the V clinical variables' full 24 h trajectory becomes ONE key/value
      token (``[B,T,V,d_emb] → [B,V,T·d_emb]`` — a single reshape feeding one
      batched MXU matmul, no per-variable loops), so ``event_attn`` is
      ``[B,K,V]`` — which pathology query reads which clinical variable,
      exactly the per-variable axis the reference's
      ``viz_ts_attention`` renders for the event variant
      (``visualize_pathology.py:330-339``: x-axis = "clinical variable
      (full 24 h trajectory)");
    - ``ts_padding_mask`` ``[B,V]`` (True = ignore) masks variables with no
      observations in the window, mirroring the trajectory path's
      key_padding_mask (``smoke_test_trajectory_encoder.py:44``,
      ``models/...:1389-1391``);
    - image branch, shared per-modality heads, per-label biases, β-scaled
      zero-init correction and stop-gradient residual fusion are identical to
      the active ``dual_patch`` semantics (``:538-654``).
    """
    cfg: PerceiverConfig

    @nn.compact
    def __call__(self, event_grid: jnp.ndarray,
                 img_patches_proj: jnp.ndarray, train: bool = False,
                 return_attn: bool = False,
                 ts_padding_mask: Optional[jnp.ndarray] = None,
                 token_eps: Optional[tuple] = None) -> dict:
        cfg = self.cfg
        if event_grid.ndim != 4:
            raise ValueError(f"event_grid must be [B,T,V,d_emb], "
                             f"got {event_grid.shape}")
        B, T, V, De = event_grid.shape
        dtype = event_grid.dtype

        img_bank = self.param("image_queries", nn.initializers.normal(0.02),
                              (cfg.n_pathologies, cfg.d_latent), jnp.float32)
        ts_bank = self.param("temporal_queries",
                             nn.initializers.normal(0.02),
                             (cfg.n_pathologies, cfg.d_latent), jnp.float32)
        img_q = jnp.broadcast_to(img_bank.astype(dtype),
                                 (B, cfg.n_pathologies, cfg.d_latent))
        ts_q = jnp.broadcast_to(ts_bank.astype(dtype),
                                (B, cfg.n_pathologies, cfg.d_latent))

        # image branch — unchanged from dual_patch
        img_cross = PerceiverBlock(cfg.n_heads, cfg.dropout, name="img_cross")
        img_self = PerceiverBlock(cfg.n_heads, cfg.dropout, name="img_self")
        if return_attn:
            I, img_attn = img_cross(img_q, img_patches_proj, train=train,
                                    return_attn=True)
        else:
            I, img_attn = img_cross(img_q, img_patches_proj,
                                    train=train), None
        I = img_self(I, I, train=train)

        # event branch: per-variable trajectory tokens
        ev_tokens = event_grid.transpose(0, 2, 1, 3).reshape(B, V, T * De)
        ev_kv = nn.Dense(cfg.d_latent, dtype=dtype, param_dtype=jnp.float32,
                         name="event_kv_proj")(ev_tokens)
        mask = None
        if ts_padding_mask is not None:
            # never mask ALL keys of a sample (softmax over -inf only):
            # a sample with zero observed variables falls back to uniform
            # attention over everything rather than NaN.
            all_masked = jnp.all(ts_padding_mask, axis=-1, keepdims=True)
            mask = ts_padding_mask & ~all_masked
        Tk, event_attn = EventPerceiverBlock(
            cfg.n_heads, cfg.dropout, name="event_cross")(
            ts_q, ev_kv, train=train, return_attn=return_attn,
            key_padding_mask=mask)
        Tk = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_self")(
            Tk, Tk, train=train)
        if token_eps is not None:
            I = I + token_eps[0].astype(I.dtype)
            Tk = Tk + token_eps[1].astype(Tk.dtype)

        img_bias = self.param("image_label_bias", nn.initializers.zeros,
                              (cfg.n_pathologies,), jnp.float32)
        ts_bias = self.param("temporal_label_bias", nn.initializers.zeros,
                             (cfg.n_pathologies,), jnp.float32)
        beta = self.param("beta", nn.initializers.ones,
                          (cfg.n_pathologies,), jnp.float32)

        img_logits = _Head(cfg.head_hidden, cfg.head_dropout,
                           name="image_head")(I, train=train).squeeze(-1)
        img_logits = img_logits.astype(jnp.float32) + img_bias[None, :]
        ts_logits = _Head(cfg.head_hidden, cfg.head_dropout,
                          name="temporal_head")(Tk, train=train).squeeze(-1)
        ts_logits = ts_logits.astype(jnp.float32) + ts_bias[None, :]

        corr = CorrectionHead(cfg.head_hidden, _correction_dropout(cfg),
                              name="correction_head")(
            Tk, train=train).squeeze(-1).astype(jnp.float32)
        scaled_corr = beta[None, :] * corr
        fusion_logits = jax.lax.stop_gradient(img_logits) + scaled_corr

        out = {
            "img_logits": img_logits,
            "ts_logits": ts_logits,
            "fusion_logits": fusion_logits,
            "img_tokens": I,
            "ts_tokens": Tk,
            "fusion_tokens": Tk,
            "ts_correction": corr,
            "scaled_correction": scaled_corr,
        }
        if return_attn:
            out["img_attn"] = img_attn
            # head-averaged [B, K, V]: per-(pathology, clinical variable)
            out["event_attn"] = event_attn
        return out


class TemporalPerceiver(nn.Module):
    """'legacy' mode: N learnable latent queries interleave cross-attention
    over the (already projected) image kv and the DuETT tokens, then mean-pool
    to one fused vector.

    Reconstruction of the reference's commented ``TemporalPerceiver`` variant
    3 — the image-first interleaving the legacy TeacherModel path consumes
    (models/main_architecture_duett.py:281-290, :1179-1191).
    """
    cfg: PerceiverConfig
    d_ts: int
    # explicit values override the config (cfg.n_latents / cfg.n_layers,
    # the reference's --n_latents/--n_perceiver_layers, run.py:75-76)
    n_latents: Optional[int] = None
    n_layers: Optional[int] = None

    @nn.compact
    def __call__(self, ts_tokens: jnp.ndarray, img_kv_proj: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        n_latents = cfg.n_latents if self.n_latents is None else self.n_latents
        n_layers = cfg.n_layers if self.n_layers is None else self.n_layers
        B = ts_tokens.shape[0]
        dtype = ts_tokens.dtype
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (n_latents, cfg.d_latent), jnp.float32)
        h = jnp.broadcast_to(latents.astype(dtype),
                             (B, n_latents, cfg.d_latent))
        ts_kv = nn.Dense(cfg.d_latent, dtype=dtype, param_dtype=jnp.float32,
                         name="ts_proj")(ts_tokens)
        for i in range(n_layers):
            h = PerceiverBlock(cfg.n_heads, cfg.dropout,
                               name=f"img_block_{i}")(h, img_kv_proj,
                                                      train=train)
            h = PerceiverBlock(cfg.n_heads, cfg.dropout,
                               name=f"ts_block_{i}")(h, ts_kv, train=train)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(h).astype(dtype)
        return h.mean(axis=1)


def adaptive_avg_pool_tokens(patches: jnp.ndarray, out_hw: int = 7
                             ) -> jnp.ndarray:
    """[B, g², D] patch tokens → [B, out_hw², D] via torch-style adaptive
    average pooling (reference :1156-1161: 37×37 → 7×7)."""
    B, N, D = patches.shape
    g = int(N ** 0.5)
    x = patches.reshape(B, g, g, D)
    rows = []
    for i in range(out_hw):
        r0, r1 = (i * g) // out_hw, -(-((i + 1) * g) // out_hw)
        cols = []
        for j in range(out_hw):
            c0, c1 = (j * g) // out_hw, -(-((j + 1) * g) // out_hw)
            cols.append(x[:, r0:r1, c0:c1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.concatenate(rows, axis=1)                      # [B, 49, D]


class PathologyPerceiver(nn.Module):
    """'single' mode: 4-stage image→self→TS→self pathology-query perceiver
    emitting stage2 (image-only) and stage4 (multimodal) logits.

    Faithful to the reference's commented ``PathologyPerceiver``
    (models/main_architecture_duett.py:293-399; commented in the checked-in
    tree but with a live train_teacher dispatch, trainer.py:318-327):
    per-label stage2/stage4 MLP ModuleLists (not shared heads + biases) and
    the class's own ``ts_ablation='full'`` default (``cfg.ts_ablation`` is
    the dual_patch knob and does not apply here, reference :346 vs :611).
    Trained with :func:`..ops.losses.pathology_multilabel_loss`.
    """
    cfg: PerceiverConfig
    d_ts: int

    @nn.compact
    def __call__(self, ts_tokens: jnp.ndarray, img_patches_proj: jnp.ndarray,
                 train: bool = False, return_attn: bool = False,
                 ts_ablation: Optional[str] = None) -> dict:
        cfg = self.cfg
        abl = ts_ablation if ts_ablation is not None else "full"
        B = ts_tokens.shape[0]
        dtype = ts_tokens.dtype
        queries = self.param("pathology_queries",
                             nn.initializers.normal(0.02),
                             (cfg.n_pathologies, cfg.d_latent), jnp.float32)
        q = jnp.broadcast_to(queries.astype(dtype),
                             (B, cfg.n_pathologies, cfg.d_latent))
        if abl == "full":
            ts_sel = ts_tokens
        elif abl == "hourly_only":
            ts_sel = ts_tokens[:, :-1, :]
        elif abl == "rep_only":
            ts_sel = ts_tokens[:, -1:, :]
        else:
            raise ValueError(f"unknown ts_ablation {abl!r}; expected one of "
                             "{'full', 'hourly_only', 'rep_only'}")
        ts_kv = nn.Dense(cfg.d_latent, dtype=dtype, param_dtype=jnp.float32,
                         name="ts_proj")(ts_sel)

        stage1 = PerceiverBlock(cfg.n_heads, cfg.dropout, name="img_cross")
        stage2 = PerceiverBlock(cfg.n_heads, cfg.dropout, name="img_self")
        stage3 = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_cross")
        stage4 = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_self")
        if return_attn:
            h, img_attn = stage1(q, img_patches_proj, train=train,
                                 return_attn=True)
        else:
            h, img_attn = stage1(q, img_patches_proj, train=train), None
        h2 = stage2(h, h, train=train)
        s2_tokens = h2
        if return_attn:
            h3, ts_attn = stage3(h2, ts_kv, train=train, return_attn=True)
        else:
            h3, ts_attn = stage3(h2, ts_kv, train=train), None
        s4_tokens = stage4(h3, h3, train=train)

        s2 = StackedLabelHeads(
            cfg.n_pathologies, cfg.head_hidden, cfg.head_dropout,
            name="stage2_heads")(s2_tokens, train=train).astype(jnp.float32)
        s4 = StackedLabelHeads(
            cfg.n_pathologies, cfg.head_hidden, cfg.head_dropout,
            name="stage4_heads")(s4_tokens, train=train).astype(jnp.float32)
        out = {"stage2_logits": s2, "stage4_logits": s4,
               "stage2_tokens": s2_tokens, "stage4_tokens": s4_tokens}
        if return_attn:
            out["img_attn"] = img_attn
            out["ts_attn"] = ts_attn
        return out


class StackedLabelHeads(nn.Module):
    """K independent per-label MLP heads — the reference 'dual' perceiver's
    ``nn.ModuleList([_mk_head() for _ in range(K)])``
    (main_architecture_duett.py:688-694) — as stacked ``[K,·,·]`` parameters
    driven by batched einsums: one MXU-friendly [B,K,d]×[K,d,h] contraction
    instead of K tiny per-label matmuls."""
    n_labels: int
    d_hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, K, d] → [B, K]
        K, d, H = self.n_labels, x.shape[-1], self.d_hidden
        init = nn.initializers.lecun_normal(batch_axis=(0,))
        w1 = self.param("w1", init, (K, d, H), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (K, H), jnp.float32)
        w2 = self.param("w2", init, (K, H, 1), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (K, 1), jnp.float32)
        h = jnp.einsum("bkd,kdh->bkh", x, w1.astype(x.dtype)) \
            + b1.astype(x.dtype)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        o = jnp.einsum("bkh,kho->bko", h, w2.astype(x.dtype)) \
            + b2.astype(x.dtype)
        return o[..., 0]


class DualPathologyPerceiver(nn.Module):
    """'dual' mode: image branch = frozen pretrained CXR-head logits passed
    in; temporal branch = per-pathology queries cross-attending DuETT
    tokens; ``fusion_logit[k] = img_logit[k] + residual_head_k(T_k)``.

    Faithful to the reference class at :659-741 — commented out in the
    checked-in tree but REQUIRED by its student-KD path
    (trainer.py:795-800) — including the parts that differ from the active
    ``dual_patch`` mode: per-label temporal/residual MLP ModuleLists (not a
    shared head + per-label bias), plain additive fusion (no beta scale),
    and standard (non-zero) residual-head initialization."""
    cfg: PerceiverConfig
    d_ts: int

    @nn.compact
    def __call__(self, ts_tokens: jnp.ndarray, img_logits: jnp.ndarray,
                 train: bool = False, return_attn: bool = False,
                 ts_ablation: Optional[str] = None) -> dict:
        cfg = self.cfg
        abl = ts_ablation or cfg.ts_ablation
        B = ts_tokens.shape[0]
        dtype = ts_tokens.dtype
        queries = self.param("shared_queries", nn.initializers.normal(0.02),
                             (cfg.n_pathologies, cfg.d_latent), jnp.float32)
        q = jnp.broadcast_to(queries.astype(dtype),
                             (B, cfg.n_pathologies, cfg.d_latent))
        if abl == "full":
            ts_sel = ts_tokens
        elif abl == "hourly_only":
            ts_sel = ts_tokens[:, :-1, :]
        elif abl == "rep_only":
            ts_sel = ts_tokens[:, -1:, :]
        else:
            raise ValueError(f"unknown ts_ablation {abl!r}; expected one of "
                             "{'full', 'hourly_only', 'rep_only'}")
        ts_kv = nn.Dense(cfg.d_latent, dtype=dtype, param_dtype=jnp.float32,
                         name="ts_proj")(ts_sel)
        ts_cross = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_cross")
        ts_self = PerceiverBlock(cfg.n_heads, cfg.dropout, name="ts_self")
        if return_attn:
            Tk, ts_attn = ts_cross(q, ts_kv, train=train, return_attn=True)
        else:
            Tk, ts_attn = ts_cross(q, ts_kv, train=train), None
        Tk = ts_self(Tk, Tk, train=train)

        ts_logits = StackedLabelHeads(
            cfg.n_pathologies, cfg.head_hidden, cfg.head_dropout,
            name="temporal_heads")(Tk, train=train).astype(jnp.float32)
        residuals = StackedLabelHeads(
            cfg.n_pathologies, cfg.head_hidden, cfg.head_dropout,
            name="residual_heads")(Tk, train=train).astype(jnp.float32)
        img_logits = jax.lax.stop_gradient(img_logits.astype(jnp.float32))
        out = {
            "img_logits": img_logits,
            "ts_logits": ts_logits,
            "fusion_logits": img_logits + residuals,
            "ts_tokens": Tk,
            "fusion_tokens": Tk,
            "residuals": residuals,
            # loop/evaluator aliases: diagnostics treat the additive residual
            # as an unscaled correction
            "ts_correction": residuals,
            "scaled_correction": residuals,
        }
        if return_attn:
            out["ts_attn"] = ts_attn
        return out
