"""Device mesh + sharding rules.

The reference scales with HF Accelerate DDP / Lightning DDP (NCCL all-reduce,
``training_duett/trainer.py:217-218``). The TPU-native equivalent is GSPMD: a
``Mesh(("data", "model"))``, batch arrays sharded on ``data``, parameters
replicated (models are ≤100M) with optional tensor-parallel sharding of the
ViT's large matmuls on ``model``. XLA inserts the gradient ``psum`` and any
TP collectives over ICI automatically — there is no hand-written comm layer.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: int = 0, n_model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices) // max(n_model, 1)
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, stacked: bool = False) -> dict:
    """Ship a host batch to the mesh, leading axis split over ``data``.

    ``stacked=True``: the batch is K per-step batches stacked on a NEW
    leading axis (the ``lax.scan`` input of ``engine.scan_steps``) — the
    scan axis replicates, the batch axis (now axis 1) splits over ``data``.

    Multi-process: the batch is this host's LOCAL slice (see
    ``multihost.split_batch_for_process``); the global logical array is
    stitched from per-process buffers with no cross-host copy. Host-only
    side-channel keys (``_global`` label copies) are dropped from the device
    batch — evaluators read them from the host batch directly.
    """
    batch = {k: v for k, v in batch.items() if not k.startswith("_")}
    sh = NamedSharding(mesh, P(None, "data")) if stacked \
        else batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), sh), batch)
    ax = 1 if stacked else 0

    def place(a):
        a = np.asarray(a)
        gshape = list(a.shape)
        gshape[ax] *= jax.process_count()
        return jax.make_array_from_process_local_data(sh, a, tuple(gshape))

    return jax.tree.map(place, batch)


# --- tensor-parallel parameter rules (ViT is the only big matmul owner) ---
_TP_RULES = (
    # (path regex, spec) — first match wins. Megatron-style column/row split:
    # FFN in / qkv projections: split the output features; FFN out / attn out:
    # split the input features so the pair needs one reduce per block.
    (re.compile(r"(vit|cxr).*(ff_in|mlp_in)/kernel"), P(None, "model")),
    (re.compile(r"(vit|cxr).*(ff_in|mlp_in)/bias"), P("model")),
    (re.compile(r"(vit|cxr).*(ff_out|mlp_out)/kernel"), P("model", None)),
    (re.compile(r"(vit|cxr).*attn/(q|k|v)/kernel"), P(None, "model")),
    (re.compile(r"(vit|cxr).*attn/(q|k|v)/bias"), P("model")),
    (re.compile(r"(vit|cxr).*attn/out/kernel"), P("model", None)),
)


def param_spec(path: str, leaf) -> P:
    for rx, spec in _TP_RULES:
        if rx.search(path):
            if len(spec) <= leaf.ndim:
                return spec
    return P()


def shard_params(params, mesh: Mesh):
    """device_put every param with its partition spec (TP where it pays)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path_entries, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_entries)
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf)))

    placed = {jax.tree_util.keystr(p): place(p, l) for p, l in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [placed[jax.tree_util.keystr(p)] for p, _ in flat])
