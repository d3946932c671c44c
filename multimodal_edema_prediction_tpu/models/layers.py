"""Shared flax building blocks.

TPU-first re-implementations of the reference's primitive modules:

- :class:`ScaleNorm` — the x_transformers ``use_scalenorm=True`` norm used by
  DuETT's dual-axis encoders (reference ``duett/duett.py:95-105``).
- :class:`BatchNormLastDim` — BatchNorm over all leading axes, feature = last
  axis (reference ``duett/duett.py:11-22``). Under GSPMD jit the batch mean is
  a *global* mean across the data mesh axis automatically.
- :func:`make_mlp` / :class:`SimpleMLP` — ``simple_mlp`` equivalent
  (reference ``duett/duett.py:24-39``).
- :class:`CVE` — continuous value embedding ``cve`` (``duett/duett.py:151-157``).
- :class:`MultiHeadAttention` — einsum attention with decoupled head dim
  (x_transformers uses ``attn_dim_head=d_embedding//n_heads`` so the attention
  inner dim is tiny relative to the token dim).
- :class:`TransformerEncoder` — pre-norm encoder + final norm, the
  x_transformers ``Encoder(depth=1)`` equivalent.

All modules take an explicit ``train`` flag; dropout needs the ``"dropout"``
rng when ``train=True`` and BatchNorm mutates the ``"batch_stats"`` collection.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching the reference's ``nn.GELU()`` / HF exact-erf form.

    In float32 this is the exact erf formulation (the reference-transplant
    parity tests assert ≤1e-5 against torch in f32). In bfloat16 compute the
    tanh form is substituted: its absolute error vs erf is ≤5e-4 — below the
    ~2^-8 relative rounding the next bf16 matmul applies anyway — while
    XLA's erf lowering costs a measured 13% of the whole teacher step
    (246→283 samples/s/chip, benchmarks; see PARITY.md).
    """
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


class ScaleNorm(nn.Module):
    """g * x / max(||x|| * d^-0.5, eps) — a single learned scalar gain."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), jnp.float32)
        d = x.shape[-1]
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        norm = norm * (d ** -0.5)
        out = x / jnp.maximum(norm, self.eps).astype(x.dtype)
        return out * g.astype(x.dtype)


class _TorchBatchNorm(nn.Module):
    """BatchNorm over axis 0 of a 2-D input with exact torch BatchNorm1d
    semantics: eps=1e-5, momentum 0.1 (ra = 0.9·ra + 0.1·batch), batch
    normalized with the BIASED variance but running variance updated with the
    UNBIASED estimator (×n/(n−1)) — flax ``nn.BatchNorm`` updates with the
    biased one, which drifts eval-mode numerics away from the reference.
    Parameter/stat tree matches flax ``nn.BatchNorm`` ({scale,bias} /
    {mean,var}) so transplant code and checkpoints are unchanged."""
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((d,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((d,), jnp.float32))
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=0)
            var = x32.var(axis=0)
            if not self.is_initializing():
                n = x.shape[0]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) \
            + bias.astype(x.dtype)


class BatchNormLastDim(nn.Module):
    """BatchNorm1d over the last axis; stats over all leading axes.

    Matches torch BatchNorm1d defaults: eps=1e-5, momentum=0.1
    (flax momentum convention: ra = m*ra + (1-m)*batch → m=0.9), including
    the unbiased running-variance update (see :class:`_TorchBatchNorm`).
    """
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        flat = x.reshape(-1, x.shape[-1])
        out = _TorchBatchNorm(name="BatchNorm_0")(flat, use_running_average=ura)
        return out.reshape(x.shape)


class SimpleMLP(nn.Module):
    """``simple_mlp`` equivalent (duett/duett.py:24-39).

    Layer order for n_hidden >= 1:
        [BN_in?] Linear(d_in,d_h) act Dropout
        { [BN?] Linear(d_h,d_h) act Dropout } * (n_hidden-1)
        [BN?] Linear(d_h,d_out) [act?]
    """
    d_out: int
    n_hidden: int = 1
    d_hidden: int = 64
    final_activation: bool = False
    input_batch_norm: bool = False
    hidden_batch_norm: bool = False
    dropout: float = 0.0
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = lambda d, name: nn.Dense(  # noqa: E731
            d, dtype=x.dtype, param_dtype=jnp.float32, name=name)
        if self.n_hidden == 0:
            if self.input_batch_norm:
                x = BatchNormLastDim(name="bn_in")(x, use_running_average=not train)
            x = dense(self.d_out, "out")(x)
        else:
            if self.input_batch_norm:
                x = BatchNormLastDim(name="bn_in")(x, use_running_average=not train)
            x = dense(self.d_hidden, "in")(x)
            x = self.activation(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            for i in range(self.n_hidden - 1):
                if self.hidden_batch_norm:
                    x = BatchNormLastDim(name=f"bn_{i}")(x, use_running_average=not train)
                x = dense(self.d_hidden, f"hidden_{i}")(x)
                x = self.activation(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            if self.hidden_batch_norm:
                x = BatchNormLastDim(name="bn_out")(x, use_running_average=not train)
            x = dense(self.d_out, "out")(x)
        if self.final_activation:
            x = self.activation(x)
        return x


class CVE(nn.Module):
    """Continuous value embedding: Linear(1,√d) → tanh → [BN] → Linear(√d,d).

    Reference duett/duett.py:151-157.
    """
    d_embedding: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d_hidden = int(self.d_embedding ** 0.5)
        h = nn.Dense(d_hidden, dtype=x.dtype, param_dtype=jnp.float32, name="in")(x)
        h = jnp.tanh(h)
        if self.batch_norm:
            h = BatchNormLastDim(name="bn")(h, use_running_average=not train)
        return nn.Dense(self.d_embedding, dtype=x.dtype, param_dtype=jnp.float32,
                        name="out")(h)


class PerVariableMLP(nn.Module):
    """V independent 2→d_hidden→d_out MLPs as one batched einsum stack.

    Replaces the reference's python loop over ``nn.ModuleList`` of V MLPs
    (duett/duett.py:84-86, 259-260) with `[V, ...]`-leading parameter tensors:
    one einsum per layer feeds the MXU instead of V tiny matmuls.

    BatchNorm statistics are tracked **per variable** (matching V separate
    BatchNorm1d modules): running stats have shape [V, d_hidden].
    """
    n_variables: int
    d_out: int
    d_hidden: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [..., V, 2]
        V, dh, do = self.n_variables, self.d_hidden, self.d_out
        k_init = nn.initializers.lecun_normal()
        w1 = self.param("w1", k_init, (V, 2, dh), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (V, dh), jnp.float32)
        w2 = self.param("w2", k_init, (V, dh, do), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (V, do), jnp.float32)
        scale = self.param("bn_scale", nn.initializers.ones, (V, dh), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (V, dh), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((V, dh), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((V, dh), jnp.float32))

        h = jnp.einsum("...vc,vcd->...vd", x, w1.astype(x.dtype)) + b1.astype(x.dtype)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)

        # BatchNorm over all leading axes, per (v, channel). Normalization
        # uses the biased batch variance; the running update uses the
        # UNBIASED one (×n/(n−1)) — exact torch BatchNorm1d semantics.
        if train:
            axes = tuple(range(h.ndim - 2))
            h32 = h.astype(jnp.float32)
            mean = jnp.mean(h32, axis=axes)
            var = jnp.var(h32, axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= h.shape[a]
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + \
                    0.1 * var * (n / max(n - 1, 1))
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        h = (h - mean.astype(h.dtype)) * inv.astype(h.dtype) + bias.astype(h.dtype)

        return jnp.einsum("...vd,vdo->...vo", h, w2.astype(h.dtype)) + b2.astype(h.dtype)


class _ProjParams(nn.Module):
    """Dense-compatible parameter holder (same tree: {kernel, bias}) whose
    kernel can be consumed by layout-free einsums — projecting q/k/v directly
    into the head-major [B, H, N, dh] layout the flash kernel wants avoids
    the [B, N, H, dh] → [B, H, N, dh] transpose copies (profiled at ~9× the
    einsum cost on v5e)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, d_in: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (d_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Standard softmax attention with decoupled head dim.

    ``d_head`` can be much smaller than the token dim (DuETT's dual-axis
    encoders use token dims 600/840 with heads=2, d_head=12 — inner dim 24).
    """
    n_heads: int
    d_head: Optional[int] = None
    dropout: float = 0.0
    qkv_bias: bool = True
    out_bias: bool = True
    use_flash: bool = False     # Pallas flash kernel for long sequences
    flash_block_b: int = 0      # >1 needs the enclosing jit compiled with
    #                              scoped_vmem_compiler_options (attention.py)
    quant: str = "none"         # "int8": quantized projections (frozen
    #                              branches only; ops/int8.py)

    @nn.compact
    def __call__(self, q_in, kv_in, train: bool = False,
                 return_weights: bool = False, key_padding_mask=None,
                 valid_len: Optional[int] = None):
        """key_padding_mask: [..., K] bool, True = IGNORE that key (torch
        MultiheadAttention semantics). ``valid_len``: static true token count
        when the sequence is pre-padded (pad-once fast path: tokens ≥
        valid_len are masked as keys and their outputs are garbage-by-design,
        to be sliced off by the caller)."""
        d_model = q_in.shape[-1]
        dh = self.d_head or d_model // self.n_heads
        inner = self.n_heads * dh
        H = self.n_heads
        dtype = q_in.dtype
        wq, bq = _ProjParams(inner, self.qkv_bias, name="q")(d_model)
        wk, bk = _ProjParams(inner, self.qkv_bias, name="k")(d_model)
        wv, bv = _ProjParams(inner, self.qkv_bias, name="v")(d_model)
        wo, bo = _ProjParams(d_model, self.out_bias, name="out")(inner)

        flash_ok = (self.use_flash and not return_weights
                    and key_padding_mask is None
                    and (self.dropout == 0.0 or not train)
                    and q_in.ndim == 3 and kv_in.shape[-2] >= 256
                    and dh >= 64)
        if flash_ok:
            if self.quant == "int8":
                from ..ops.int8 import int8_out_bhnk, int8_proj_bhnk
                proj_bhnk = lambda x, w, b: int8_proj_bhnk(  # noqa: E731
                    x, w, None if b is None else b.astype(jnp.float32),
                    H, dh)
            else:
                # project straight into [B,H,N,dh] — no transpose copies
                def proj_bhnk(x, w, b):
                    y = jnp.einsum("bnd,dhk->bhnk", x,
                                   w.reshape(d_model, H, dh).astype(dtype))
                    if b is not None:
                        y = y + b.reshape(H, 1, dh).astype(dtype)
                    return y

            q = proj_bhnk(q_in, wq, bq)
            k = proj_bhnk(kv_in, wk, bk)
            v = proj_bhnk(kv_in, wv, bv)
            from ..ops.attention import flash_mha
            o = flash_mha(q, k, v, sm_scale=dh ** -0.5,
                          q_valid=valid_len, kv_valid=valid_len,
                          block_b=self.flash_block_b)
            if self.quant == "int8":
                return int8_out_bhnk(
                    o, wo.reshape(H, dh, d_model),
                    None if bo is None else bo.astype(jnp.float32))
            out = jnp.einsum("bhnk,hkd->bnd", o,
                             wo.reshape(H, dh, d_model).astype(dtype))
            if bo is not None:
                out = out + bo.astype(dtype)
            return out

        if self.quant == "int8":
            from ..ops.int8 import int8_dense

            def proj(x, w, b):
                return int8_dense(x, w, b).reshape(
                    x.shape[:-1] + (H, dh))
        else:
            def proj(x, w, b):
                y = x @ w.astype(dtype)
                if b is not None:
                    y = y + b.astype(dtype)
                return y.reshape(x.shape[:-1] + (H, dh))

        q, k, v = proj(q_in, wq, bq), proj(kv_in, wk, bk), proj(kv_in, wv, bv)
        if valid_len is not None and valid_len < k.shape[-3] \
                and key_padding_mask is None:
            key_padding_mask = jnp.arange(k.shape[-3]) >= valid_len
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k) * (dh ** -0.5)
        if key_padding_mask is not None:
            pad = key_padding_mask[..., None, None, :]   # [...,1,1,K]
            logits = jnp.where(pad, -1e30, logits)
        weights = jax.nn.softmax(logits.astype(jnp.float32),
                                 axis=-1).astype(dtype)
        dropped = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("...hqk,...khd->...qhd", dropped, v)
        out = out.reshape(out.shape[:-2] + (inner,))
        if self.quant == "int8":
            from ..ops.int8 import int8_dense
            out = int8_dense(out, wo, bo)
        else:
            out = out @ wo.astype(dtype)
            if bo is not None:
                out = out + bo.astype(dtype)
        if return_weights:
            return out, weights.mean(axis=-3)  # average over heads
        return out


class TransformerEncoderLayer(nn.Module):
    """Pre-norm block: x + attn(norm(x)); x + ff(norm(x))."""
    n_heads: int
    d_head: Optional[int] = None
    d_feedforward: int = 512
    dropout: float = 0.0
    scalenorm: bool = True

    def _norm(self, name):
        return ScaleNorm(name=name) if self.scalenorm else nn.LayerNorm(
            name=name, dtype=jnp.float32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self._norm("norm_attn")(x)
        h = MultiHeadAttention(self.n_heads, self.d_head, self.dropout,
                               qkv_bias=False, name="attn")(h, h, train=train)
        x = x + h
        h = self._norm("norm_ff")(x)
        h = nn.Dense(self.d_feedforward, dtype=x.dtype, param_dtype=jnp.float32,
                     name="ff_in")(h)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(x.shape[-1], dtype=x.dtype, param_dtype=jnp.float32,
                     name="ff_out")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class TransformerEncoder(nn.Module):
    """x_transformers ``Encoder`` equivalent: N pre-norm layers + final norm."""
    n_layers: int
    n_heads: int
    d_head: Optional[int] = None
    d_feedforward: int = 512
    dropout: float = 0.0
    scalenorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_layers):
            x = TransformerEncoderLayer(
                self.n_heads, self.d_head, self.d_feedforward, self.dropout,
                self.scalenorm, name=f"layer_{i}")(x, train=train)
        norm = ScaleNorm(name="final_norm") if self.scalenorm else nn.LayerNorm(
            name="final_norm", dtype=jnp.float32)
        return norm(x)
