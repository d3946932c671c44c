"""Measure whether int8 dot_general actually reaches the MXU int8 rate on
this TPU — the go/no-go gate for the quantized frozen-ViT path.

Shapes: the ViT-B/14 hot matmuls at batch 64 (tokens M = 64*1536 padded),
fc1 [768→3072], fc2 [3072→768], qkv [768→2304].

Usage: python benchmarks/int8_probe.py
Prints ms + TF(eff)/s per config for bf16 vs int8 (dynamic quant included).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from multimodal_edema_prediction_tpu.ops.int8 import int8_matmul  # noqa: E402


def timeit(fn, variants, iters=30, warmup=5):
    """``variants``: list of arg-tuples cycled per call — value-distinct
    inputs defeat any repeated-execution caching in tunneled backends."""
    for i in range(warmup):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


def main():
    rng = np.random.default_rng(0)
    M = 64 * 1536
    for name, K, N in (("fc1", 768, 3072), ("fc2", 3072, 768),
                       ("qkv", 768, 2304), ("attn_out", 768, 768)):
        xs = [jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
              for _ in range(3)]
        x = xs[0]
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
        wb = w.astype(jnp.bfloat16)
        tflop = 2 * M * K * N / 1e12

        f_bf16 = jax.jit(lambda a, b: a @ b)
        f_int8 = jax.jit(int8_matmul)
        ms_b = timeit(f_bf16, [(xi, wb) for xi in xs])
        ms_i = timeit(f_int8, [(xi, w) for xi in xs])
        err = float(jnp.abs(
            f_int8(x, w).astype(jnp.float32)
            - (x.astype(jnp.float32) @ w)).max())
        ref = float(jnp.abs(x.astype(jnp.float32) @ w).max())
        print(f"{name:9s} bf16 {ms_b:7.2f} ms {tflop/ms_b*1e3:6.1f} TF/s | "
              f"int8 {ms_i:7.2f} ms {tflop/ms_i*1e3:6.1f} TF(eff)/s | "
              f"speedup {ms_b/ms_i:4.2f}x  max_abs_err/absmax "
              f"{err/ref:.4f}")


if __name__ == "__main__":
    main()
