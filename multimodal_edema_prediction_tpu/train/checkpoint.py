"""Checkpointing: params + stats + config in one restorable artifact.

Keeps the reference's load-bearing patterns:

- checkpoint-as-config: the full config dict rides in the checkpoint so
  analysis / KD rebuild the exact architecture
  (``training_duett/trainer.py:63-71``, ``:770-822``).
- best-metric selection + top-k retention + weight averaging
  (``duett/train_duett_finetune.py:56-62,204-207``).
- tolerant restore that back-fills missing keys and drops shape-mismatched
  head params for pretrain→finetune surgery (``duett/duett.py:459-487``).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_host(tree):
    from ..parallel.multihost import fetch_global
    return jax.tree.map(fetch_global, tree)


def save_checkpoint(path: str, params, batch_stats, step: int, metric: float,
                    config: Optional[dict] = None, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats),
        "step": int(step),
        "metric": float(metric),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    cfg_path = path + ".config.json"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            payload["config"] = json.load(f)
    return payload


def restore_tolerant(template_params, loaded_params,
                     skip_prefixes: Sequence[str] = ("head",)) -> Tuple[Any, list]:
    """Load into a template, back-filling missing keys and skipping
    shape-mismatched entries under ``skip_prefixes`` (duett.py:459-487)."""
    changed = []

    def walk(tmpl, loaded, prefix):
        out = {}
        for k, tv in tmpl.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(tv, dict):
                lv = loaded.get(k, {}) if isinstance(loaded, dict) else {}
                out[k] = walk(tv, lv, path)
            else:
                lv = loaded.get(k) if isinstance(loaded, dict) else None
                if lv is None:
                    changed.append(f"missing:{path}")
                    out[k] = tv
                elif np.shape(lv) != np.shape(tv):
                    if any(path.startswith(p) or f"/{p}" in path
                           for p in skip_prefixes):
                        changed.append(f"shape-skip:{path}")
                        out[k] = tv
                    else:
                        raise ValueError(
                            f"shape mismatch at {path}: "
                            f"{np.shape(lv)} vs {np.shape(tv)}")
                else:
                    # host numpy: jit replicates it on any mesh (a local
                    # jnp array would pin to one device — wrong multi-host)
                    out[k] = np.asarray(lv, dtype=tv.dtype)
        return out

    return walk(template_params, loaded_params, ""), changed


def average_params(param_trees: Sequence[Any]):
    """Top-k weight averaging (train_duett_finetune.py:56-62)."""
    n = float(len(param_trees))
    return jax.tree.map(lambda *xs: sum(x.astype(np.float64) for x in xs) / n,
                        *[_to_host(t) for t in param_trees])


def save_train_state(path: str, state, epoch: int, extra: Optional[dict] = None):
    """Mid-epoch-resumable full train state (params + optimizer + step).

    The reference has NO mid-epoch resume ("resume" = reload best and rerun,
    SURVEY §5); this adds it: the optimizer state round-trips so training
    continues bit-exactly from the saved step."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "step": int(state.step),
        "epoch": int(epoch),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": serialization.to_state_dict(state.opt_state),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(lambda a: np.asarray(a), payload)))


def load_train_state(path: str, template_state):
    """Restore into a freshly built TrainState (same tx/config)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    opt_state = serialization.from_state_dict(template_state.opt_state,
                                              payload["opt_state"])
    # leaves stay host numpy (uncommitted): the jitted step re-places them
    # under whatever mesh/sharding the resumed loop runs with
    state = template_state.replace(
        step=np.asarray(payload["step"], np.int32),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=opt_state)
    return state, int(payload["epoch"]), payload.get("extra", {})


class FullStateResumer:
    """Epoch-boundary full-state persistence + restore for training loops.

    Owns the train-state artifact (msgpack single file or orbax async
    sharded) plus a JSON sidecar carrying the loop bookkeeping (early-stop
    watermark, best-ckpt tracker entries, history, RNG stream, step count)
    so a restarted run continues bit-exactly. Shared by the teacher and SSL
    loops; see ``train_teacher(auto_resume=...)``.
    """

    def __init__(self, ckpt_dir: str, backend: str = "msgpack",
                 enabled: bool = True):
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown state_backend {backend!r}")
        del enabled   # the orbax manager is created lazily on first use
        self.ckpt_dir = ckpt_dir
        self.backend = backend
        self.state_path = os.path.join(ckpt_dir, "train_state.msgpack")
        self.meta_path = os.path.join(ckpt_dir, "train_state.meta.json")
        self.__mgr = None

    @property
    def _mgr(self):
        if self.backend == "orbax" and self.__mgr is None:
            from .orbax_io import make_manager
            self.__mgr = make_manager(
                os.path.join(self.ckpt_dir, "orbax_state"), max_to_keep=2)
        return self.__mgr

    def restore(self, state):
        """→ (state, meta dict) or (state, None) when nothing to resume."""
        if not os.path.exists(self.meta_path):
            return state, None
        with open(self.meta_path) as f:
            meta = json.load(f)
        if self.backend == "orbax":
            from .orbax_io import restore_state
            restored = restore_state(self._mgr, state)
            if restored is None:
                return state, None
            return restored, meta
        if not os.path.exists(self.state_path):
            return state, None
        state, _, _ = load_train_state(self.state_path, state)
        return state, meta

    @staticmethod
    def apply_meta(meta, stopper, tracker):
        """Restore loop bookkeeping; → (start_epoch, history, n_steps,
        step_rng)."""
        stopper.best = meta["stopper_best"]
        stopper.bad_epochs = int(meta["bad_epochs"])
        tracker.entries = [(m, p) for m, p in meta["tracker"]
                           if os.path.exists(p)]
        rng = jax.random.wrap_key_data(np.asarray(meta["rng"], np.uint32))
        return int(meta["epoch"]) + 1, list(meta["history"]), \
            int(meta["n_steps"]), rng

    def save(self, state, epoch: int, stopper, tracker, history,
             n_steps: int, step_rng):
        """Call on EVERY process. Orbax save/commit of non-fully-addressable
        global jax.Arrays is a collective across all processes (it requires a
        shared checkpoint filesystem — the standard pod setup); gating it on
        process 0 would deadlock the commit barrier. The msgpack backend
        materializes host copies on every process (``fetch_global``) but only
        process 0 writes; the meta-JSON sidecar is likewise main-only."""
        main = jax.process_index() == 0
        meta = {"epoch": epoch, "stopper_best": stopper.best,
                "bad_epochs": stopper.bad_epochs,
                "tracker": tracker.entries, "history": history,
                "n_steps": n_steps,
                "rng": np.asarray(jax.random.key_data(step_rng)).tolist()}
        if self.backend == "orbax":
            from .orbax_io import save_state
            save_state(self._mgr, epoch, state)   # async; collective
        elif main:
            save_train_state(self.state_path, state, epoch)
        if main:
            with open(self.meta_path + ".tmp", "w") as f:
                json.dump(meta, f)
            os.replace(self.meta_path + ".tmp", self.meta_path)

    def finish(self):
        if self.__mgr is not None:   # don't create a manager just to wait
            self.__mgr.wait_until_finished()


class BestKTracker:
    """Keep the k best checkpoints by a metric (higher- or lower-is-better)."""

    def __init__(self, ckpt_dir: str, k: int = 1, mode: str = "max",
                 prefix: str = "ckpt"):
        assert mode in {"max", "min"}
        self.ckpt_dir = ckpt_dir
        self.k = k
        self.mode = mode
        self.prefix = prefix
        self.entries: List[Tuple[float, str]] = []  # (metric, path)

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    @property
    def best(self) -> Optional[Tuple[float, str]]:
        return self.entries[0] if self.entries else None

    def offer(self, metric: float, params, batch_stats, step: int,
              config: Optional[dict] = None) -> bool:
        """Save if within top-k. Returns True if this is the new best."""
        if len(self.entries) >= self.k and not self._better(
                metric, self.entries[-1][0]):
            return False
        path = os.path.join(self.ckpt_dir,
                            f"{self.prefix}-step{step}-{metric:.4f}.msgpack")
        save_checkpoint(path, params, batch_stats, step, metric, config)
        self.entries.append((metric, path))
        self.entries.sort(key=lambda e: e[0], reverse=(self.mode == "max"))
        while len(self.entries) > self.k:
            _, drop = self.entries.pop()
            for p in (drop, drop + ".config.json"):
                if os.path.exists(p):
                    os.remove(p)
        return self.entries[0][1] == path

    def averaged_params(self):
        trees = [load_checkpoint(p)["params"] for _, p in self.entries]
        return average_params(trees)

    def ensure_saved(self, params, batch_stats, step: int,
                     config: Optional[dict] = None):
        """Guarantee at least one checkpoint exists (e.g. every epoch's
        metric was NaN): save the final state with a sentinel metric."""
        if not self.entries:
            sentinel = float("-inf") if self.mode == "max" else float("inf")
            path = os.path.join(self.ckpt_dir,
                                f"{self.prefix}-step{step}-final.msgpack")
            save_checkpoint(path, params, batch_stats, step, sentinel, config)
            self.entries.append((sentinel, path))
