"""Graceful-preemption support for preemptible/spot scheduling.

A SIGTERM (or SIGUSR1 — some clusters send it as the pre-preemption
warning) sets a flag; the training loops check it at every epoch boundary,
persist the full train state (``FullStateResumer``) and return cleanly, so
the restarted job continues bit-exactly with ``auto_resume``/
``--resume_dir``. The reference has no preemption handling (a kill loses
the epoch and any unsaved best checkpoint; "resume" there means starting
over from best.pt).
"""
from __future__ import annotations

import signal
import threading

_requested = threading.Event()
_installed = False


def install_handler(signals=(signal.SIGTERM, signal.SIGUSR1)) -> None:
    """Idempotent; call once from the CLI entrypoint (main thread)."""
    global _installed
    if _installed:
        return

    def _handler(signum, frame):
        _requested.set()

    for s in signals:
        signal.signal(s, _handler)
    _installed = True


def request() -> None:
    """Programmatic trigger (tests, in-process schedulers)."""
    _requested.set()


def requested() -> bool:
    return _requested.is_set()


def clear() -> None:
    _requested.clear()
