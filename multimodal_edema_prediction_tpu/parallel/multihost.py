"""Multi-host (multi-process) utilities.

The reference scales with single-node DDP only (SURVEY §2.4; HF Accelerate /
Lightning DDP in ``training_duett/trainer.py:217-218,707-716``); this module
is the TPU-pod path: ``jax.distributed`` process initialization, per-host
local batch feeding into globally-sharded arrays, and host-side metric
gathering. Everything degrades to a no-op in single-process runs, so the
training loops are identical on one chip and on a pod.

Multi-host runs are data-parallel over the pod (``n_model == 1``): parameters
replicate, batches shard over ``data``, and XLA's gradient ``psum`` rides ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import replicated

# host-side label/index keys kept globally (for evaluation) when batches are
# process-sliced; see split_batch_for_process.
GLOBAL_LABEL_KEYS = ("y", "y_multi", "y_multi_mask", "valid", "stay_rows")


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


def process_count() -> int:
    return jax.process_count()


def split_batch_for_process(batch: dict) -> dict:
    """Slice a GLOBAL host batch down to this process's local shard.

    Every leading-dim array is sliced to rows
    ``[pid*local : (pid+1)*local]``; the label/valid arrays additionally keep
    their full global copies under ``batch["_global"]`` so evaluators can
    align globally-gathered logits with labels. No-op single-process.

    The global batch construction (index order, padding) is identical on all
    hosts — datasets iterate the same seeded permutation — so the slices are
    disjoint and cover the global batch in process order, matching
    ``jax.make_array_from_process_local_data`` reassembly.
    """
    pcount = jax.process_count()
    if pcount == 1:
        return batch
    pid = jax.process_index()
    B = len(batch["stay_rows"])
    if B % pcount:
        raise ValueError(f"global batch {B} not divisible by "
                         f"{pcount} processes")
    local = B // pcount
    sl = slice(pid * local, (pid + 1) * local)
    out = {k: np.asarray(v)[sl] for k, v in batch.items()}
    out["_global"] = {k: np.asarray(batch[k])
                      for k in GLOBAL_LABEL_KEYS if k in batch}
    return out


def global_batch_from_local(batch: dict, mesh) -> dict:
    """Assemble a globally-sharded batch from this process's LOCAL shard.

    Each host loads only its slice of the global batch (global batch size =
    local batch × process_count); `jax.make_array_from_process_local_data`
    stitches the global logical array without any cross-host copy.
    """
    from .mesh import shard_batch
    return shard_batch(batch, mesh)


def replicate_to_mesh(a, mesh):
    """Host array → globally replicated jax.Array over the full mesh.

    Single-process: plain ``device_put``. Multi-process: every host supplies
    the identical full array; ``make_array_from_process_local_data`` builds
    the replicated global array without cross-host traffic.
    """
    sh = replicated(mesh)
    a = np.asarray(a)
    if jax.process_count() == 1:
        return jax.device_put(a, sh)
    return jax.make_array_from_process_local_data(sh, a, a.shape)


def fetch_global(x) -> np.ndarray:
    """Device output → full host numpy on EVERY process.

    Fully-addressable (single-process) and fully-replicated arrays convert
    directly; data-sharded global arrays all-gather across processes first
    (tiled over the leading axis — the ``data`` batch axis)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def maybe_raw_key(key):
    """PRNG key in jit-input form: multi-process runs pass the raw numpy key
    bits (numpy inputs replicate globally; a typed key committed to the local
    default device would name a different physical device on each host).
    ``jax.random.split``/``fold_in`` accept raw uint32 keys unchanged."""
    if jax.process_count() == 1:
        return key
    return np.asarray(jax.random.key_data(key))


def any_flag(flag: bool) -> bool:
    """Global OR of a per-host boolean (no-op single-process).

    Used for preemption: a SIGTERM delivered to only some hosts must stop
    ALL of them at the same epoch boundary, otherwise the surviving hosts
    enter the next epoch's collectives alone and the job hangs (the
    reference's analogue is the broadcast early-stop flag,
    training_duett/trainer.py:707-716)."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(multihost_utils.process_allgather(
        np.asarray(bool(flag))).any())


def gather_metrics(x):
    """All-gather host-side values across processes (no-op single-process).
    The reference's analogue is Accelerate's broadcast/reduce of metrics
    (trainer.py:708-716)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)
