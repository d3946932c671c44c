"""Flash-attention tuning sweep at the production ViT shape (VERDICT r1
item 4: the D=64 half-lane question and the remaining ~82 ms).

Shape: B=64, H=12, N=1370 (518²/14² patches + CLS), D=64, bf16, forward
only (the CXR encoder is frozen — no bwd on the hot path).

Levers swept:
- token padding target: 1536 (12×128, 26% wasted area) vs 1408 (11×128,
  5.6% waste) with block sizes that divide it;
- block_q / block_k / block_b;
- the splash-attention kernel (newer TPU pallas kernel);
- the XLA fallback (materializing [B,H,N,N] — memory-infeasible at B=64,
  measured at smaller B for reference).

Usage: python benchmarks/flash_tune.py [B]
Prints ms/iter per config; the winner goes into ops/attention.py defaults.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(B=64, H=12, N=1370, D=64, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, dtype)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, dtype)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, dtype)
    return q, k, v


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


def flash_config(pad_to, bq, bk, bb):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    @functools.partial(jax.jit, static_argnames=())
    def run(q, k, v):
        B, H, N, D = q.shape
        P = pad_to
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, P - N), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, P - N), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, P - N), (0, 0)))
        seg = (jnp.arange(P) < N).astype(jnp.int32)[None].repeat(B, 0)
        sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_q_dkv=bq, block_k_dkv=bk,
            block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
        out = flash_attention(qp, kp, vp,
                              segment_ids=SegmentIds(q=seg, kv=seg),
                              causal=False, sm_scale=0.125,
                              block_sizes=sizes)
        return out[:, :, :N, :]

    return run


def splash_config(bq, bkv):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    @jax.jit
    def run(q, k, v):
        B, H, N, D = q.shape
        mask = sm.FullMask((N, N))
        mk = sm.MultiHeadMask([mask] * H)
        kernel = sk.make_splash_mha(
            mk, head_shards=1, q_seq_shards=1,
            block_sizes=sk.BlockSizes(block_q=bq, block_kv=bkv,
                                      block_kv_compute=bkv))
        fn = jax.vmap(kernel)
        return fn(q * 0.125, k, v)

    return run


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    q, k, v = make_inputs(B=B)
    flops = 4 * B * 12 * 1370 * 1370 * 64 / 1e12   # useful TF per call

    configs = [
        ("flash pad1536 bq512 bk1536 bb2 (r1 prod)", flash_config(1536, 512, 1536, 2)),
        ("flash pad1536 bq512 bk512 bb2", flash_config(1536, 512, 512, 2)),
        ("flash pad1536 bq768 bk1536 bb2", flash_config(1536, 768, 1536, 2)),
        ("flash pad1536 bq512 bk1536 bb4", flash_config(1536, 512, 1536, 4)),
        ("flash pad1536 bq512 bk1536 bb8", flash_config(1536, 512, 1536, 8)),
        ("flash pad1536 bq1536 bk1536 bb2", flash_config(1536, 1536, 1536, 2)),
        ("flash pad1408 bq128 bk1408 bb2", flash_config(1408, 128, 1408, 2)),
        ("flash pad1408 bq704 bk704 bb2", flash_config(1408, 704, 704, 2)),
        ("flash pad1408 bq1408 bk1408 bb2", flash_config(1408, 1408, 1408, 2)),
        ("flash pad1408 bq1408 bk1408 bb4", flash_config(1408, 1408, 1408, 4)),
        ("flash pad2048 bq2048 bk2048 bb1", flash_config(2048, 2048, 2048, 1)),
    ]
    for name, fn in configs:
        try:
            ms = timeit(fn, q, k, v)
            print(f"{name:<42s} {ms:8.2f} ms   {flops/ms*1000:6.1f} TF/s")
        except Exception as e:
            print(f"{name:<42s} FAILED: {str(e)[:120]}")

    for bq, bkv in [(512, 1024), (1024, 1024), (2048, 1024), (512, 512),
                    (1024, 2048)]:
        name = f"splash bq{bq} bkv{bkv}"
        try:
            # splash pads internally? it requires N multiples — pad to 1408
            N = 1370
            P = 1408
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, P - N), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, P - N), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, P - N), (0, 0)))
            fn = splash_config(min(bq, P), min(bkv, P))
            ms = timeit(fn, qp, kp, vp)
            print(f"{name:<42s} {ms:8.2f} ms   {flops/ms*1000:6.1f} TF/s")
        except Exception as e:
            print(f"{name:<42s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
