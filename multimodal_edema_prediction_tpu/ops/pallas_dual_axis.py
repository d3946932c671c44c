"""Fused dual-axis encoder block as a single Pallas TPU kernel.

DuETT's dual-axis layers run attention over few tokens (T+1=25 hours or
V+1=35 variables) with wide channels (840/600) and a tiny attention inner
dim (heads=2 × d_head=12). Under XLA each of the ~10 op boundaries
(norm → qkv → logits → softmax → AV → out-proj → residual → norm → FF → …)
round-trips the [B, L, D] activations through HBM; this kernel keeps one
batch-block of tokens resident in VMEM for the whole block:

    y = FinalScaleNorm( z + FF(ScaleNorm2(z)) ),
    z = x + OutProj( MHA(ScaleNorm1(x)) )

matching ``models/layers.TransformerEncoder`` with ``n_layers=1`` (the
x_transformers ``Encoder(depth=1)`` configuration DuETT uses).

MEASURED VERDICT (v5e-1, f32, B=512): XLA's fused pipeline beats this kernel
~8x at DuETT's shapes (L35/D600: 3.5 ms vs 29.6 ms; L25/D840: 2.8 vs 18.1) —
the 24-wide attention inner dim wastes 80% of the MXU's 128 lanes and the
per-head loop serializes tiny dots. The kernel is kept as a tested,
measured alternative and a template; the production encoder path stays on
XLA (where the Pallas win that *did* land is the ViT flash attention,
ops/attention.py: +15% end-to-end teacher throughput).

Gradients: ``fused_encoder_block`` carries a ``jax.custom_vjp`` whose
backward differentiates the pure-jax reference implementation (recompute) —
the fused kernel accelerates the forward (eval / frozen paths / serving);
training backward math is bit-consistent with the reference.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# =============================================================================
# Pure-jax reference (also the custom-vjp backward path)
# =============================================================================
def _scalenorm(x, g, eps=1e-5):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    n = n * (x.shape[-1] ** -0.5)
    return (x / jnp.maximum(n, eps).astype(x.dtype)) * g.astype(x.dtype)


def encoder_block_reference(x, params, n_heads: int, d_head: int):
    """[B, L, D] → [B, L, D]; params is a flat dict of the block weights."""
    h = _scalenorm(x, params["g1"])
    q = h @ params["wq"]
    k = h @ params["wk"]
    v = h @ params["wv"]
    B, L, _ = x.shape

    def split(a):
        return a.reshape(B, L, n_heads, d_head)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k) * (d_head ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(B, L, n_heads * d_head)
    z = x + o @ params["wo"] + params["bo"]
    h2 = _scalenorm(z, params["g2"])
    f = jax.nn.gelu(h2 @ params["w1"] + params["b1"])
    z = z + f @ params["w2"] + params["b2"]
    return _scalenorm(z, params["gf"])


# =============================================================================
# Pallas kernel
# =============================================================================
def _block_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, w1_ref,
                  b1_ref, w2_ref, b2_ref, g_ref, out_ref, *, L: int,
                  D: int, n_heads: int, d_head: int):
    """One batch-block [BB, Lp, Dp] fully in VMEM."""
    x = x_ref[...].astype(jnp.float32)
    BB, Lp, Dp = x.shape
    g1, g2, gf = g_ref[0, 0], g_ref[0, 1], g_ref[0, 2]

    # token-padding masks (rows ≥ L are zero-padded)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)
    valid = (row_ids < L).astype(jnp.float32)                 # [Lp, 1]

    def scalenorm(t, g):
        # padding cols are exactly zero, so the sum equals the true-D norm;
        # the d^-0.5 factor must use the TRUE feature dim.
        n = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True)) * (D ** -0.5)
        return t / jnp.maximum(n, 1e-5) * g

    h = scalenorm(x, g1)
    inner = n_heads * d_head
    dg = lambda a, b, dims: jax.lax.dot_general(  # noqa: E731
        a, b, dims, preferred_element_type=jnp.float32)
    q = dg(h, wq_ref[...].astype(jnp.float32),
           (((2,), (0,)), ((), ())))                           # [BB,Lp,inner]
    k = dg(h, wk_ref[...].astype(jnp.float32), (((2,), (0,)), ((), ())))
    v = dg(h, wv_ref[...].astype(jnp.float32), (((2,), (0,)), ((), ())))

    o_heads = []
    neg = -1e30
    key_mask = (row_ids.reshape(1, 1, Lp) <
                jnp.full((1, 1, Lp), L, jnp.int32)).astype(jnp.float32)
    for hd in range(n_heads):
        qs = q[..., hd * d_head:(hd + 1) * d_head]
        ks = k[..., hd * d_head:(hd + 1) * d_head]
        vs = v[..., hd * d_head:(hd + 1) * d_head]
        logits = dg(qs, ks, (((2,), (2,)), ((0,), (0,)))) * (d_head ** -0.5)
        logits = logits + (1.0 - key_mask) * neg               # [BB,Lp,Lp]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        o_heads.append(dg(w, vs, (((2,), (1,)), ((0,), (0,)))))  # [BB,Lp,dh]
    o = jnp.concatenate(o_heads, axis=-1)                      # [BB,Lp,inner]
    Ip = wo_ref.shape[0]
    o = jnp.pad(o, ((0, 0), (0, 0), (0, Ip - inner)))
    z = x + dg(o, wo_ref[...].astype(jnp.float32),
               (((2,), (0,)), ((), ()))) + bo_ref[...].astype(jnp.float32)
    z = z * valid[None, :, :]      # keep padded rows exactly zero

    h2 = scalenorm(z, g2)
    f = dg(h2, w1_ref[...].astype(jnp.float32),
           (((2,), (0,)), ((), ()))) + b1_ref[...].astype(jnp.float32)
    f = jax.nn.gelu(f)
    z = z + dg(f, w2_ref[...].astype(jnp.float32),
               (((2,), (0,)), ((), ()))) + b2_ref[...].astype(jnp.float32)
    z = z * valid[None, :, :]
    out_ref[...] = scalenorm(z, gf).astype(out_ref.dtype)


def _fused_forward(x, params, n_heads: int, d_head: int,
                   batch_block: int = 8):
    B, L, Dm = x.shape
    inner = n_heads * d_head
    F = params["w1"].shape[1]
    Lp = _round_up(L, 8)
    Dp = _round_up(Dm, 128)
    Fp = _round_up(F, 128)
    Ip = _round_up(inner, 128)
    BB = min(batch_block, B)
    while B % BB:
        BB -= 1
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (0, Lp - L), (0, Dp - Dm)))
    pad2 = lambda a, r, c: jnp.pad(  # noqa: E731
        a.astype(dtype), ((0, r - a.shape[0]), (0, c - a.shape[1])))
    pad1 = lambda a, c: jnp.pad(  # noqa: E731
        a.astype(dtype), ((0, c - a.shape[0])))[None, :]
    wq = pad2(params["wq"], Dp, Ip)
    wk = pad2(params["wk"], Dp, Ip)
    wv = pad2(params["wv"], Dp, Ip)
    wo = pad2(params["wo"], Ip, Dp)
    bo = pad1(params["bo"], Dp)
    w1 = pad2(params["w1"], Dp, Fp)
    b1 = pad1(params["b1"], Fp)
    w2 = pad2(params["w2"], Fp, Dp)
    b2 = pad1(params["b2"], Dp)
    g = jnp.stack([params["g1"].reshape(()), params["g2"].reshape(()),
                   params["gf"].reshape(())]).astype(jnp.float32)[None, :]

    kernel = functools.partial(_block_kernel, L=L, D=Dm, n_heads=n_heads,
                               d_head=d_head)
    full = lambda *s: pl.BlockSpec(  # noqa: E731
        s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, Lp, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(Dp, Ip), full(Dp, Ip), full(Dp, Ip),
            full(Ip, Dp), full(1, Dp),
            full(Dp, Fp), full(1, Fp), full(Fp, Dp), full(1, Dp),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BB, Lp, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, Dp), dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(xp, wq, wk, wv, wo, bo, w1, b1, w2, b2, g)
    return out[:, :L, :Dm]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_encoder_block(x, params, n_heads: int, d_head: int):
    """Pallas-fused forward; reference-math backward (see module docstring)."""
    return _fused_forward(x, params, n_heads, d_head)


def _fwd(x, params, n_heads, d_head):
    return _fused_forward(x, params, n_heads, d_head), (x, params)


def _bwd(n_heads, d_head, res, gout):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: encoder_block_reference(x_, p_, n_heads, d_head),
        x, params)
    return vjp(gout)


fused_encoder_block.defvjp(_fwd, _bwd)
