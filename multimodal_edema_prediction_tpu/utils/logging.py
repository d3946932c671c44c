"""Console + optional-wandb logging.

wandb is gated exactly like the reference (``training_duett/trainer.py:138-163``):
disabled by default, no-op when unavailable.
"""
from __future__ import annotations

import sys
import time
from typing import Optional


def _is_main_process() -> bool:
    """Multi-process runs log from process 0 only (the reference gates wandb
    on Accelerate's ``is_main_process``, trainer.py:140)."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:   # pragma: no cover - jax always importable here
        return True


class Logger:
    def __init__(self, name: str, wandb_project: Optional[str] = None,
                 wandb_run_name: Optional[str] = None, config: Optional[dict] = None):
        self.name = name
        self._t0 = time.time()
        self._wb = None
        if wandb_project and not _is_main_process():
            wandb_project = None
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
        if not _is_main_process():
            return
        dt = time.time() - self._t0
        print(f"[{self.name} +{dt:7.1f}s] {msg}", flush=True)

    def metrics(self, data: dict, step: Optional[int] = None):
        if self._wb is not None:
            self._wb.log(data, step=step)

    def alert(self, title: str, text: str = ""):
        """Crash/condition alert (reference main_train.py:50-82 sends a wandb
        alert with the traceback on failure)."""
        print(f"[{self.name}] ALERT: {title}\n{text}", flush=True)
        if self._wb is not None:
            try:
                self._wb.alert(title=title, text=text[:1024])
            except Exception:
                pass

    def finish(self):
        if self._wb is not None:
            self._wb.finish()


def run_with_crash_alert(main_fn, logger: "Logger"):
    """Run a CLI main; on exception, emit an alert with the traceback before
    re-raising (reference main_train.py crash handling)."""
    import traceback
    try:
        return main_fn()
    except Exception as e:
        logger.alert(f"run crashed: {type(e).__name__}",
                     traceback.format_exc())
        raise
    finally:
        logger.finish()
