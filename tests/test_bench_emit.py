"""Bench emission robustness (VERDICT r3 item 1): the headline JSON line
must survive a driver kill at any point — best-so-far state is emitted
progressively and from the SIGTERM handler, and every emitted line is
strict JSON (no bare NaN).
"""
import json
import math
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _fresh_bench():
    import importlib
    import bench
    importlib.reload(bench)
    return bench


def test_sanitize_strips_nonfinite():
    bench = _fresh_bench()
    out = bench._sanitize({"a": float("nan"), "b": [1.0, float("inf")],
                           "c": {"d": -float("inf"), "e": 2}})
    assert out == {"a": None, "b": [1.0, None], "c": {"d": None, "e": 2}}
    json.dumps(out)  # strict-serializable


def test_assemble_none_before_first_measurement():
    bench = _fresh_bench()
    assert bench._assemble() is None


def test_assemble_is_strict_json_even_with_nan_flops():
    bench = _fresh_bench()
    bench._BEST.update({"samples_per_sec_per_chip": 123.4, "n_chips": 1,
                        "batch_size": 64, "platform": "tpu",
                        "mfu": float("nan"),
                        "flops_per_sample": float("nan"),
                        "dispatch": "per_step"})
    bench._SECTIONS["baseline_samples_per_sec"] = 0.165
    d = bench._assemble()
    parsed = json.loads(json.dumps(d))   # raises on bare NaN
    assert parsed["value"] == 123.4
    assert parsed["extra"]["mfu"] is None
    # vs_baseline falls back to the torch-CPU ratio when flops are unknown
    assert math.isclose(parsed["vs_baseline"], 123.4 / 0.165, rel_tol=1e-6)


def test_assemble_vs_baseline_is_a100_anchored():
    bench = _fresh_bench()
    bench._BEST.update({"samples_per_sec_per_chip": 300.0, "n_chips": 1,
                        "batch_size": 64, "platform": "tpu", "mfu": 0.5,
                        "flops_per_sample": 3.2e11,
                        "dispatch": "scan_k8"})
    d = bench._assemble()
    est = 312e12 * 0.30 / 3.2e11
    assert math.isclose(d["vs_baseline"], 300.0 / est, rel_tol=1e-3)
    assert "est_a100" in d["extra"]["vs_baseline_definition"]


def test_sigterm_flushes_best_so_far_line():
    """Kill the process mid-'run'; the handler must print a parseable
    headline before exiting."""
    script = f"""
import os, signal, sys
sys.path.insert(0, {REPO!r})
import bench
bench._BEST.update({{"samples_per_sec_per_chip": 42.0, "n_chips": 1,
                    "batch_size": 64, "platform": "cpu",
                    "dispatch": "per_step"}})
signal.signal(signal.SIGTERM, bench._signal_emit)
os.kill(os.getpid(), signal.SIGTERM)
signal.pause()
"""
    p = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=120)
    assert p.returncode == 0
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert lines, p.stdout + p.stderr
    d = json.loads(lines[-1])
    assert d["value"] == 42.0
    assert d["extra"]["terminated_by_signal"] == int(signal.SIGTERM)
