"""Analytic multi-chip scaling model from measured single-chip constants.

Only one TPU chip is reachable in this environment (the multi-chip code
paths are validated on virtual CPU meshes — ``__graft_entry__.
dryrun_multichip``, ``tests/test_multichip.py``, 2-process equivalence
tests), so pod-scale throughput cannot be *measured* here. This script does
the next-best thing the scaling-book way: combine the measured step time and
XLA-counted FLOPs with the hardware's published link/HBM rates to predict DP
scaling efficiency and its breakdown, so a reviewer (or a future run on a
real pod) can check the design's communication budget line by line.

Model (DP over the ``data`` axis, per training step, per chip):

    t_step(n)  = t_compute + t_allreduce(n)
    allreduce bytes = 2·(n-1)/n · P_trainable · 4 B   (ring, f32 grads)
    t_allreduce     = bytes / BW_ici  (overlappable with bwd; we report the
                                       UNOVERLAPPED bound — worst case)

Constants are measured, not assumed:
- P_trainable: counted from the live param tree (ViT frozen ⇒ its 86.6 M
  params never reduce; trainable = DuETT 3.35 M + perceiver 3.43 M +
  img_proj 0.20 M ≈ 6.97 M).
- t_compute: the bench headline (BENCH_r*.json) or a fresh measurement.
- BW_ici: v5e = 4 links × ~186 GB/s usable ≈ 400 GB/s bidirectional in a
  2D torus; we use a conservative 100 GB/s per all-reduce direction.

Usage::

    python -m benchmarks.scaling_model                 # uses BENCH defaults
    python -m benchmarks.scaling_model --step_ms 188.6 --batch 64
"""
from __future__ import annotations

import argparse
import json


V5E_ICI_GBPS = 100.0      # conservative per-direction all-reduce bandwidth
V5E_PEAK_TFLOPS = 394.0   # bf16


def model(step_ms: float, batch: int, p_trainable: float,
          ici_gbps: float = V5E_ICI_GBPS, dtype_bytes: int = 4) -> dict:
    out = {"per_chip_batch": batch, "step_ms_1chip": step_ms,
           "trainable_params_M": round(p_trainable / 1e6, 3),
           "ici_gbps_assumed": ici_gbps, "chips": {}}
    for n in (2, 4, 8, 16, 64, 256):
        ar_bytes = 2 * (n - 1) / n * p_trainable * dtype_bytes
        t_ar_ms = ar_bytes / (ici_gbps * 1e9) * 1e3
        t_n = step_ms + t_ar_ms            # unoverlapped upper bound
        eff = step_ms / t_n
        out["chips"][n] = {
            "allreduce_MB": round(ar_bytes / 1e6, 2),
            "allreduce_ms_unoverlapped": round(t_ar_ms, 3),
            "samples_per_sec_total": round(batch * n / (t_n / 1e3), 1),
            "scaling_efficiency_lower_bound": round(eff, 4),
        }
    return out


def main(argv=None):
    p = argparse.ArgumentParser("DP scaling model")
    p.add_argument("--step_ms", type=float, default=0.0,
                   help="measured 1-chip step ms (default: derive from "
                        "--sps)")
    p.add_argument("--sps", type=float, default=339.3,
                   help="measured samples/s/chip (BENCH_r03 headline)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--trainable_params", type=float, default=6.974755e6,
                   help="counted from the live tree (ViT frozen)")
    p.add_argument("--ici_gbps", type=float, default=V5E_ICI_GBPS)
    p.add_argument("--cached", action="store_true",
                   help="model the encode-once tier instead "
                        "(b512, measured 12324 samples/s/chip)")
    args = p.parse_args(argv)
    if args.cached:
        batch, sps = 512, 12324.0
    else:
        batch, sps = args.batch, args.sps
    step_ms = args.step_ms or batch / sps * 1e3
    print(json.dumps(model(step_ms, batch, args.trainable_params,
                           args.ici_gbps), indent=1))


if __name__ == "__main__":
    main()
