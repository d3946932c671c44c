"""Orbax checkpoint backend — async, multi-host-safe checkpointing.

The msgpack checkpoints (``train/checkpoint.py``) are the default (small
models, single-file artifacts with config sidecars). For pod-scale runs this
module offers orbax: sharded array storage, async saves that overlap
training, and a retention-managed step history via ``CheckpointManager``.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        save_interval_steps=save_interval_steps,
        enable_async_checkpointing=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_state(manager: ocp.CheckpointManager, step: int, state,
               metrics: Optional[dict] = None):
    """Async save of the training state pytree (params/batch_stats/opt_state)."""
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state, "step": state.step}
    manager.save(step, args=ocp.args.StandardSave(payload),
                 metrics=metrics or {})


def restore_state(manager: ocp.CheckpointManager, template_state,
                  step: Optional[int] = None):
    """Restore into a freshly-built TrainState template (same tx/config)."""
    step = manager.latest_step() if step is None else step
    if step is None:
        return None
    template = {"params": template_state.params,
                "batch_stats": template_state.batch_stats,
                "opt_state": template_state.opt_state,
                "step": template_state.step}
    restored = manager.restore(step, args=ocp.args.StandardRestore(template))
    # host numpy leaves: orbax commits restored arrays to specific devices;
    # uncommitted host arrays let the jitted step re-place them on whatever
    # mesh the caller runs under
    import numpy as np
    restored = jax.tree.map(np.asarray, restored)
    return template_state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"])
