"""Probe the last two known flash levers IN the full fused teacher step
(VERDICT r2 'what's weak' item 4 / ROADMAP item 9):

- ``block_b=2`` needs ~18.8 MiB of scoped VMEM (over the 16 MiB default), so
  it only compiles with ``--xla_tpu_scoped_vmem_limit_kib`` raised;
- batch-size sweep b64/b96/b128 (the reference's batch size is 128,
  training_duett/run.py:83) under whichever flash config wins.

Each configuration runs in a SUBPROCESS because XLA_FLAGS is read at backend
init. Usage: ``python benchmarks/flash_step_probe.py`` on a TPU host;
prints one JSON line per config plus a verdict.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from bench import measure_jax_teacher
r = measure_jax_teacher(batch_size={bs}, n_steps=10)
print("RESULT " + json.dumps(
    {{"sps": r["samples_per_sec_per_chip"], "mfu": r["mfu"]}}))
"""


def run_config(name: str, bs: int, block_b: int, vmem_kib: int = 0) -> dict:
    env = dict(os.environ)
    env["MMEDEMA_FLASH_BLOCK_B"] = str(block_b)
    if vmem_kib:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_tpu_scoped_vmem_limit_kib={vmem_kib}")
    p = subprocess.run([sys.executable, "-c",
                        CHILD.format(repo=REPO, bs=bs)],
                       env=env, capture_output=True, text=True, timeout=1800)
    out = {"config": name, "batch_size": bs, "block_b": block_b,
           "vmem_kib": vmem_kib or "default"}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            out.update(json.loads(line[len("RESULT "):]))
            return out
    out["error"] = (p.stderr or p.stdout)[-800:]
    return out


def main():
    results = [
        run_config("baseline_b64_bb1", 64, 1),
        run_config("b64_bb2_vmem24M", 64, 2, 24576),
        run_config("b64_bb2_vmem32M", 64, 2, 32768),
        run_config("b96_bb1", 96, 1),
        run_config("b128_bb1", 128, 1),
    ]
    for r in results:
        print(json.dumps(r))
    ok = [r for r in results if "sps" in r]
    if ok:
        best = max(ok, key=lambda r: r["sps"])
        print(json.dumps({"winner": best["config"], "sps": best["sps"]}))


if __name__ == "__main__":
    main()
