"""Multi-host (multi-process) utilities.

The reference scales with single-node DDP only (SURVEY §2.4); this module is
the TPU-pod path: `jax.distributed` process initialization, per-host local
batch feeding into globally-sharded arrays, and host-side metric gathering.
Everything degrades to a no-op in single-process runs, so the training loops
are identical on one chip and on a pod.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import batch_sharding


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Initialize jax.distributed when running multi-process; no-op
    otherwise. On Cloud TPU pods the arguments auto-detect from metadata."""
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        # auto-detection path (TPU pod metadata); safe no-op on single host
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


def global_batch_from_local(batch: dict, mesh) -> dict:
    """Assemble a globally-sharded batch from this process's LOCAL shard.

    Each host loads only its slice of the global batch (global batch size =
    local batch × process_count); `jax.make_array_from_process_local_data`
    stitches the global logical array without any cross-host copy.
    """
    sharding = batch_sharding(mesh)

    def place(a):
        a = np.asarray(a)
        if jax.process_count() == 1:
            return jax.device_put(a, sharding)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        return jax.make_array_from_process_local_data(sharding, a,
                                                      global_shape)

    return jax.tree.map(place, batch)


def gather_metrics(x):
    """All-gather host-side values across processes (no-op single-process).
    The reference's analogue is Accelerate's broadcast/reduce of metrics
    (trainer.py:708-716)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)
