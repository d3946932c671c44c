"""Fused attention for the hot path (ViT self-attention, 1370 tokens).

XLA's default attention materializes the [B, H, N, N] probability tensor in
HBM; at N=1370 (518²/14² patches + CLS) that read/write traffic dominates the
frozen-ViT forward. ``flash_mha`` tiles the softmax(QKᵀ)V contraction in VMEM
via the Pallas TPU flash-attention kernel, padding N up to a lane multiple
and masking the padding with segment ids.

Only the forward pass is needed on the hot path (the CXR encoder is frozen
and stop-gradient'd), but the kernel is differentiable anyway (pallas custom
VJP inside jax's implementation).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# scoped-VMEM budget that admits flash block_b=2 inside the fused teacher
# step; 48 MiB measured fastest (benchmarks/flash_step_probe.py sweep:
# 24 MiB → 326, 48 MiB → 345, 64 MiB → 336 samples/s/chip at b96)
SCOPED_VMEM_KIB = 49152


def scoped_vmem_compiler_options(flash_block_b: int):
    """Compiler options for a jit that traces ``flash_mha`` with
    ``block_b > 1`` (its VMEM working set exceeds the default 16 MiB scoped
    limit). None on non-TPU backends and for the default block_b=1 —
    ``jax.jit(compiler_options=None)`` is a no-op."""
    if flash_block_b <= 1 or jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}


def choose_flash_blocks(B: int, Nq_p: int, Nk_p: int,
                        block_b: int) -> tuple:
    """(block_q, block_k, block_b) for the padded shape.

    Full-length q/k blocks up to 2048 (no inter-block softmax rescaling
    passes), 128 when the padded length isn't a divisor. ``block_b`` is
    clamped to the actual batch — the kernel rejects block_b > B, which the
    serving bucket-1 path hit with the production flash_block_b=2 config;
    the tuned value only matters at training/throughput batch sizes anyway.
    """
    bq = min(Nq_p, 2048)
    if Nq_p % bq:
        bq = 128
    bk = min(Nk_p, 2048)
    if Nk_p % bk:
        bk = 128
    return bq, bk, max(1, min(block_b, B))


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_size",
                                              "q_valid", "kv_valid",
                                              "block_b"))
def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              sm_scale: float = 1.0, block_size: int = 128,
              q_valid: Optional[int] = None,
              kv_valid: Optional[int] = None,
              block_b: int = 0) -> jnp.ndarray:
    """[B, H, N, D] self/cross attention via the Pallas TPU flash kernel.

    Pads N up to a multiple of ``block_size`` (lane-width 128 by default —
    minimum wasted area) with segment-id masking so padded keys contribute
    zero probability. If the caller ALREADY padded the token dim
    (``q_valid``/``kv_valid`` give the true lengths), no per-call pad/copy
    happens — the profiled fast path: pad once at the model level, mask
    here. Falls back to a pure-jax reference off-TPU.

    Block sizes (swept at the production ViT shape B=64 H=12 N=1370 D=64,
    benchmarks/flash_tune.py, v5e): FULL-length q/k blocks at the 128-padded
    length with block_b=2 run ~17% faster than the r1 pad-1536/bq512 config
    (6.4 vs 7.7 ms/layer) — less wasted area (1408 vs 1536 tokens) and no
    inter-block softmax rescaling passes. The splash kernel (~15 ms) and
    XLA's dot_product_attention (~20 ms) measured far behind.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention, mha_reference)

    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    nq_true = q_valid or Nq
    nk_true = kv_valid or Nk
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        ab = None
        if nk_true < Nk:
            mask = (jnp.arange(Nk) < nk_true).astype(q.dtype)
            ab = (mask[None, None, None, :] - 1.0) * 1e30
            ab = jnp.broadcast_to(ab, (B, H, Nq, Nk))
        return mha_reference(q, k, v, ab, sm_scale=sm_scale)

    Nq_p = _round_up(Nq, block_size)
    Nk_p = _round_up(Nk, block_size)

    def pad_to(x, n):
        if x.shape[2] == n:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n - x.shape[2]), (0, 0)))

    qp, kp, vp = pad_to(q, Nq_p), pad_to(k, Nk_p), pad_to(v, Nk_p)
    seg_q = (jnp.arange(Nq_p) < nq_true).astype(jnp.int32)[None].repeat(B, 0)
    seg_kv = (jnp.arange(Nk_p) < nk_true).astype(jnp.int32)[None].repeat(B, 0)
    # full-length q/k blocks. block_b=1 is the fastest configuration that
    # fits the default 16 MiB scoped-VMEM limit; block_b=2 runs ~10% faster
    # at the production shape but requires the enclosing step to be compiled
    # with a raised ``xla_tpu_scoped_vmem_limit_kib`` (the engine's step
    # factories do this automatically when ViTConfig.flash_block_b > 1 —
    # see ops.attention.scoped_vmem_compiler_options). Resolution order:
    # explicit arg > MMEDEMA_FLASH_BLOCK_B env (probes) > 1.
    import os as _os
    bb = block_b or int(_os.environ.get("MMEDEMA_FLASH_BLOCK_B", "1"))
    bq, bk, bb = choose_flash_blocks(B, Nq_p, Nk_p, bb)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_q_dkv=bq, block_k_dkv=bk,
        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
    out = flash_attention(qp, kp, vp,
                          segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
                          causal=False, sm_scale=sm_scale,
                          block_sizes=sizes)
    return out[:, :, :Nq, :] if Nq_p != Nq else out
