"""Console + optional-wandb logging.

wandb is gated exactly like the reference (``training_duett/trainer.py:138-163``):
disabled by default, no-op when unavailable.
"""
from __future__ import annotations

import sys
import time
from typing import Optional


class Logger:
    def __init__(self, name: str, wandb_project: Optional[str] = None,
                 wandb_run_name: Optional[str] = None, config: Optional[dict] = None):
        self.name = name
        self._t0 = time.time()
        self._wb = None
        if wandb_project:
            try:
                import wandb
                self._wb = wandb
                wandb.init(project=wandb_project,
                           name=wandb_run_name or name, config=config or {})
            except Exception as e:  # pragma: no cover
                print(f"[{name}] wandb unavailable ({e}); continuing without")
                self._wb = None

    def info(self, msg: str):
        dt = time.time() - self._t0
        print(f"[{self.name} +{dt:7.1f}s] {msg}", flush=True)

    def metrics(self, data: dict, step: Optional[int] = None):
        if self._wb is not None:
            self._wb.log(data, step=step)

    def finish(self):
        if self._wb is not None:
            self._wb.finish()
