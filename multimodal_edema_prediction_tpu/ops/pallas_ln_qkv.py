"""Fused LayerNorm → QKV projection Pallas kernel (round-2 wiring candidate).

The final round-1 profile of the teacher step shows standalone LayerNorm
convert+reduce passes cost ~68 ms of the 222 ms step: each ViT block reads
the [B, 1536, 768] activations for the LN, writes them back, and the three
projection matmuls read them again. This kernel performs, per (batch,
token-block) grid cell, entirely in VMEM:

    h = LN(x) · scale + bias            (f32 statistics)
    q,k,v = h @ W{q,k,v} + b{q,k,v}     (MXU, f32 accumulation)
    outputs written in head-major [B, H, N, dh] layout (flash-ready)

so x is read ONCE from HBM and no LN intermediate is materialized.

Gradient support mirrors ``pallas_dual_axis``: custom VJP whose backward
differentiates the pure-jax reference (the hot consumer — the frozen ViT —
only needs the forward).

MEASURED VERDICT (v5e-1, bf16, B=64/N=1536/D=768/H=12): XLA's LN+einsum is
5.3 ms — ~65% MXU INCLUDING the LN, i.e. XLA already fuses the normalization
into the projection reads; this kernel measured 34-36 ms (per-head lane
slicing + per-grid-cell weight refetch dominate). Kept as a tested, measured
alternative; the production path stays on XLA. Conclusion recorded in
ROADMAP.md: the step's apparent "LN convert+reduce" profile cost is the
intrinsic fused LN+projection work, not reclaimable overhead.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ln_qkv_reference(x, params, n_heads: int, d_head: int, eps: float = 1e-6
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B,N,D] → (q,k,v) each [B,H,N,dh]; the math the kernel must match."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * params["ln_scale"] + params["ln_bias"]).astype(x.dtype)
    B, N, D = x.shape

    def proj(w, b):
        y = jnp.einsum("bnd,dhk->bhnk", h,
                       w.reshape(D, n_heads, d_head).astype(x.dtype))
        return y + b.reshape(n_heads, 1, d_head).astype(x.dtype)

    return (proj(params["wq"], params["bq"]),
            proj(params["wk"], params["bk"]),
            proj(params["wv"], params["bv"]))


def _kernel(x_ref, scale_ref, bias_ref, wq_ref, wk_ref, wv_ref,
            bq_ref, bk_ref, bv_ref, q_ref, k_ref, v_ref, *,
            n_heads: int, d_head: int, eps: float):
    x = x_ref[0]                                   # [BLK_N, D]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)
         * scale_ref[0].astype(jnp.float32)
         + bias_ref[0].astype(jnp.float32)).astype(x.dtype)
    BLK = h.shape[0]

    for w_ref, b_ref, out_ref in ((wq_ref, bq_ref, q_ref),
                                  (wk_ref, bk_ref, k_ref),
                                  (wv_ref, bv_ref, v_ref)):
        # one full-width MXU dot, then per-head lane-slice writes — Mosaic
        # rejects the [BLK, H*dh] → [H, BLK, dh] shape cast, but slicing the
        # lane dim and writing each head's [BLK, dh] tile is supported.
        y = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        y = (y + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)
        for hd in range(n_heads):
            out_ref[0, hd] = y[:, hd * d_head:(hd + 1) * d_head]


def _forward(x, params, n_heads: int, d_head: int, eps: float,
             block_n: int = 512):
    B, N, D = x.shape
    inner = n_heads * d_head
    assert N % block_n == 0 or N < block_n, \
        f"token dim {N} must be a multiple of block_n={block_n} (pad once " \
        "at the model level)"
    blk = min(block_n, N)
    dtype = x.dtype

    def w2(name):
        return params[name].reshape(D, inner).astype(dtype)

    def b2(name):
        return params[name].reshape(1, inner).astype(dtype)

    row = lambda name: params[name].reshape(1, D).astype(dtype)  # noqa: E731

    full = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, n: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n_heads, blk, d_head),
                            lambda b, n: (b, 0, n, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, n_heads, N, d_head), dtype)
    kernel = functools.partial(_kernel, n_heads=n_heads, d_head=d_head,
                               eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B, N // blk),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            full(1, D), full(1, D),
            full(D, inner), full(D, inner), full(D, inner),
            full(1, inner), full(1, inner), full(1, inner),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=jax.devices()[0].platform != "tpu",
    )(x, row("ln_scale"), row("ln_bias"), w2("wq"), w2("wk"), w2("wv"),
      b2("bq"), b2("bk"), b2("bv"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_ln_qkv(x, params, n_heads: int, d_head: int, eps: float = 1e-6):
    """Pallas-fused forward; reference-math backward."""
    return _forward(x, params, n_heads, d_head, eps)


def _fwd(x, params, n_heads, d_head, eps):
    return _forward(x, params, n_heads, d_head, eps), (x, params)


def _bwd(n_heads, d_head, eps, res, gout):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: ln_qkv_reference(x_, p_, n_heads, d_head, eps),
        x, params)
    return vjp(gout)


fused_ln_qkv.defvjp(_fwd, _bwd)
