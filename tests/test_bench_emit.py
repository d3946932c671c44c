"""Bench emission robustness (VERDICT r3 item 1, r4 item 1): the headline
must survive a driver kill at any point — best-so-far state is emitted
progressively and from the SIGTERM handler, every emitted line is strict
JSON (no bare NaN), and the LAST stdout line is a COMPACT (<1000 char)
digest so a bounded tail capture always parses (rounds 3 and 4 both lost
their official record to one ever-growing detail line).
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
    assert bench._assemble() == (None, None)


def test_assemble_is_strict_json_even_with_nan_flops():
    bench = _fresh_bench()
    bench._BEST.update({"samples_per_sec_per_chip": 123.4, "n_chips": 1,
                        "batch_size": 64, "platform": "tpu",
                        "mfu": float("nan"),
                        "flops_per_sample": float("nan"),
                        "dispatch": "per_step"})
    bench._SECTIONS["baseline_samples_per_sec"] = 0.165
    d, c = bench._assemble()
    parsed = json.loads(json.dumps(d))   # raises on bare NaN
    assert parsed["value"] == 123.4
    assert parsed["extra"]["mfu"] is None
    # vs_baseline falls back to the torch-CPU ratio when flops are unknown
    assert math.isclose(parsed["vs_baseline"], 123.4 / 0.165, rel_tol=1e-6)
    json.loads(json.dumps(c))


def test_assemble_vs_baseline_is_a100_anchored():
    bench = _fresh_bench()
    bench._BEST.update({"samples_per_sec_per_chip": 300.0, "n_chips": 1,
                        "batch_size": 64, "platform": "tpu", "mfu": 0.5,
                        "flops_per_sample": 3.2e11,
                        "dispatch": "scan_k8"})
    d, c = bench._assemble()
    est = 312e12 * 0.30 / 3.2e11
    assert math.isclose(d["vs_baseline"], 300.0 / est, rel_tol=1e-3)
    assert "est_a100" in d["extra"]["vs_baseline_definition"]
    assert math.isclose(c["vs_baseline"], d["vs_baseline"], rel_tol=1e-9)


def test_compact_line_is_last_and_bounded(tmp_path):
    """The driver captures the final ~2000 chars of stdout and parses the
    LAST JSON line. Contract: that line is the compact digest, <1000 chars
    even with every section populated, and self-contained (value, mfu,
    dispatch, both cached-tier dispatch modes, winner)."""
    bench = _fresh_bench()
    bench._BEST.update({"samples_per_sec_per_chip": 351.137, "n_chips": 1,
                        "batch_size": 128, "platform": "tpu", "mfu": 0.572,
                        "flops_per_sample": 3.18e11,
                        "dispatch": "scan_k8"})
    bench._SECTIONS.update({
        "baseline_samples_per_sec": 0.165,
        "teacher_cached_features": {
            "samples_per_sec_per_chip": 13600.0, "batch_size": 512,
            "per_batch_size": {"512": 12918.4, "256": 11000.0},
            "scan_dispatch": {"steps_per_call": 8,
                              "samples_per_sec_per_chip": 13600.2,
                              "repeats": [13500.1, 13700.3]},
            "per_step_fresh_feed": {"samples_per_sec_per_chip": 7350.9,
                                    "repeats": [7300.0, 7400.0]},
            "winner": "scan_k8", "scan_vs_per_step_x": 1.85},
        "ssl_pretrain_samples_per_sec": 43323.03,
        "preprocess_rows_per_sec": 1985414.59,
        "e2e_hbm_bank": {"samples_per_sec_per_chip": 339.1},
        "wall_time_s": 1319.0})
    import contextlib
    import io
    os.environ["BENCH_DETAIL_PATH"] = str(tmp_path / "detail.json")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench._emit()
    finally:
        del os.environ["BENCH_DETAIL_PATH"]
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 2
    last = lines[-1]
    assert len(last) < 1000, len(last)
    c = json.loads(last)
    assert c["value"] == 351.137
    assert c["mfu"] == 0.572
    assert c["dispatch"] == "scan_k8"
    assert c["cached_scan_sps_chip"] == 13600.2
    assert c["cached_per_step_fresh_sps_chip"] == 7350.9
    assert c["cached_per_step_resident_sps_chip"] == 12918.4
    assert c["cached_winner"] == "scan_k8"
    # the detail line precedes it and carries the full sections
    d = json.loads(lines[0])
    assert d["extra"]["teacher_cached_features"]["scan_vs_per_step_x"] == 1.85
    # detail also persisted to the side file
    with open(tmp_path / "detail.json") as f:
        assert json.load(f)["value"] == 351.137


def test_assemble_tolerates_placeholder_sections():
    """Mid-run the cached section holds the string "pending" (and failed
    sections hold error strings) where dicts normally live; the compact
    assembler must emit nulls, not raise — a raise here inside the
    on_partial flush killed the whole cached-tier section in the r5
    trial run."""
    bench = _fresh_bench()
    bench._BEST.update({"samples_per_sec_per_chip": 100.0, "n_chips": 1,
                        "batch_size": 64, "platform": "tpu",
                        "dispatch": "per_step"})
    bench._SECTIONS["teacher_cached_features"] = {
        "samples_per_sec_per_chip": 123.0, "batch_size": 512,
        "per_batch_size": {"512": 123.0},
        "scan_dispatch": "pending"}
    d, c = bench._assemble()
    assert c["cached_scan_sps_chip"] is None
    assert c["cached_per_step_resident_sps_chip"] == 123.0
    bench._SECTIONS["teacher_cached_features"] = {"error": "boom"}
    d, c = bench._assemble()
    assert c["cached_scan_sps_chip"] is None
    json.loads(json.dumps(c))


def test_sigterm_flushes_best_so_far_line():
    """Kill the process mid-'run'; the handler must print a parseable
    compact headline LAST before exiting — with a NON-zero rc so a killed
    run is distinguishable from a completed one (ADVICE r4)."""
    script = f"""
import os, signal, sys
sys.path.insert(0, {REPO!r})
os.environ["BENCH_DETAIL_PATH"] = os.devnull
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
    assert p.returncode == 128 + int(signal.SIGTERM)
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert lines, p.stdout + p.stderr
    d = json.loads(lines[-1])
    assert d["value"] == 42.0
    assert d["terminated"] == int(signal.SIGTERM)
    assert len(lines[-1]) < 1000
