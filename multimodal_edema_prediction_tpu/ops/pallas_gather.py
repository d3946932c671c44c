"""Pallas row-gather: bandwidth-rate HBM row copies by dynamic index.

Why this kernel exists (measured, not assumed): XLA's dynamic gather on
TPU v5e moves the encode-once feature bank's rows at ~150 GB/s — a
[512, 1370, 768] bf16 token gather (1.08 GB out) costs ~14.4 ms standalone,
which makes the gather the single largest component of the cached-tier
training step (benchmarks/step_breakdown.py ``cached`` mode: 15.6 ms of a
44 ms step at b512). The rows themselves are large and contiguous
(~2.1 MB each) — a perfect DMA shape.

This kernel uses the canonical scalar-prefetch pattern
(``pltpu.PrefetchScalarGridSpec``): the row indices are prefetched before
the kernel body runs, the input BlockSpec's ``index_map`` reads them to
aim each grid step's automatic double-buffered DMA at the right bank row,
and the body is a VMEM copy. Grid step i streams ``bank[rows[i]]`` →
``out[i]`` at HBM bandwidth.

Gradients: not defined — the only caller gathers FROZEN (stop-gradient)
feature rows, so the kernel never appears on a differentiation path.

Non-TPU backends fall back to ``bank[rows]`` (identical semantics; CPU
tests exercise the kernel via Pallas interpret mode instead —
tests/test_pallas_gather.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows"]


def _kernel(rows_ref, bank_ref, out_ref):
    out_ref[...] = bank_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_3d(bank: jnp.ndarray, rows: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    N, P, D = bank.shape
    B = rows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, P, D), lambda i, rows: (rows[i], 0, 0))],
        out_specs=pl.BlockSpec((1, P, D), lambda i, rows: (i, 0, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, D), bank.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), bank)


def gather_rows(bank: jnp.ndarray, rows: jnp.ndarray,
                interpret: bool = False, mesh=None,
                data_axis: str = "data") -> jnp.ndarray:
    """``bank[rows]`` for a [N, ...] bank and [B] int rows, at DMA rate.

    Row indices must be in-range (callers map invalid ids to a sentinel row
    BEFORE the gather — see ``data/features.py``); out-of-range behavior is
    whatever the DMA does, not an error.

    Multi-device: GSPMD cannot auto-partition a pallas_call, so when the
    caller is sharding ``rows`` over a mesh axis it must pass ``mesh`` —
    the kernel then runs under ``shard_map`` (bank replicated, rows/output
    sharded on ``data_axis``), i.e. each device DMA-gathers its own batch
    shard from its local bank copy. Without a mesh, multi-device callers
    fall back to XLA's gather.
    """
    if bank.ndim == 2:      # [N, D] (CLS rows): tiny — one reshaped call
        out = gather_rows(bank[:, None, :], rows, interpret, mesh, data_axis)
        return out[:, 0, :]
    if bank.ndim != 3:
        raise ValueError(f"bank must be [N, D] or [N, P, D], got {bank.shape}")
    if not interpret and jax.default_backend() != "tpu":
        return bank[rows]
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        P = jax.sharding.PartitionSpec
        # check_vma=False: pallas_call's out_shape carries no varying-mesh-
        # axes annotation, which the checker (jax>=0.9) otherwise requires.
        f = jax.shard_map(
            functools.partial(_gather_rows_3d, interpret=interpret),
            mesh=mesh, in_specs=(P(), P(data_axis)),
            out_specs=P(data_axis), check_vma=False)
        return f(bank, rows)
    if not interpret and jax.device_count() != 1:
        return bank[rows]
    return _gather_rows_3d(bank, rows, interpret)
