"""Flash-attention tuning sweep at the production ViT shape (VERDICT r1
item 4: the D=64 half-lane question and the remaining ~82 ms).

Shape: B=64, H=12, N=1370 (518²/14² patches + CLS), D=64, bf16, forward
only (the CXR encoder is frozen — no bwd on the hot path).

Levers swept:
- token padding target: 1536 (12×128, 26% wasted area) vs 1408 (11×128,
  5.6% waste) with block sizes that divide it;
- block_q / block_k / block_b;
- the splash-attention kernel (newer TPU pallas kernel);
- XLA's native jax.nn.dot_product_attention for reference.

Timing note: inputs are cycled across value-distinct variants per call —
tunneled TPU backends can short-circuit repeated executions with identical
arguments, which made same-args loops report physically impossible TF/s.

Usage: python benchmarks/flash_tune.py [B]
Prints ms/iter per config; the winner goes into ops/attention.py defaults.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_variants(P, B=64, H=12, N=1370, D=64, dtype=jnp.bfloat16, n=2):
    """Pre-padded to P tokens (zeros beyond N), matching the model-level
    pad-once layout."""
    rng = np.random.default_rng(0)
    outs = []
    for _ in range(n):
        arrs = []
        for _ in range(3):
            a = np.zeros((B, H, P, D), np.float32)
            a[:, :, :N] = rng.normal(size=(B, H, N, D)) * 0.1
            arrs.append(jnp.asarray(a, dtype))
        outs.append(tuple(arrs))
    return outs


def timeit(fn, variants, iters=40):
    """Chain ``iters`` kernel applications in ONE jitted fori_loop, feeding
    the output back as q: real data dependencies defeat both async-dispatch
    undertiming and any repeated-execution caching in tunneled backends
    (same-args python loops measured a physically impossible 15 PF/s)."""
    @jax.jit
    def chained(q, k, v):
        return jax.lax.fori_loop(0, iters, lambda i, qq: fn(qq, k, v), q)

    sum_ = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    q, k, v = variants[0]
    float(sum_(chained(q, k, v)))    # compile + warm + REAL host sync
    t0 = time.time()
    out = chained(*variants[1])
    s = float(sum_(out))             # scalar device→host fetch: cannot be
    #                                  elided or cached, unlike
    #                                  block_until_ready under the tunnel
    dt = (time.time() - t0) / iters * 1000.0
    assert s == s, "non-finite attention output"
    return dt


def flash_config(pad_to, bq, bk, bb, n_valid=1370):
    """Production shape: pad ONCE at the model level (models/vit.py:96-102),
    every layer's kernel masks the pads via segment ids — so the timed
    chain runs on pre-padded [B,H,P,D] and only the kernel is measured."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    def run(qp, kp, vp):
        B, H, P, D = qp.shape
        seg = (jnp.arange(P) < n_valid).astype(jnp.int32)[None].repeat(B, 0)
        sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_q_dkv=bq, block_k_dkv=bk,
            block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
        return flash_attention(qp, kp, vp,
                               segment_ids=SegmentIds(q=seg, kv=seg),
                               causal=False, sm_scale=0.125,
                               block_sizes=sizes)

    return run, pad_to


def splash_config(pad_to, bq, bkv):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    mask = sm.FullMask((pad_to, pad_to))
    mk = sm.MultiHeadMask([mask] * 12)
    kernel = sk.make_splash_mha(
        mk, head_shards=1, q_seq_shards=1,
        block_sizes=sk.BlockSizes(block_q=bq, block_kv=bkv,
                                  block_kv_compute=bkv))

    def run(qp, kp, vp):
        return jax.vmap(kernel)(qp * 0.125, kp, vp)

    return run, pad_to


def xla_dpa():
    def run(q, k, v):
        # jax.nn.dot_product_attention expects [B, N, H, D]
        o = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale=0.125)
        return o.transpose(0, 2, 1, 3)
    return run, 1370


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    flops = 4 * B * 12 * 1370 * 1370 * 64 / 1e12   # useful TF per call

    all_configs = {
        "prod": ("flash pad1536 bq512 bk1536 bb2 (r1 prod)",
                 lambda: flash_config(1536, 512, 1536, 2)),
        "f512": ("flash pad1536 bq512 bk512 bb2",
                 lambda: flash_config(1536, 512, 512, 2)),
        "fbb4": ("flash pad1536 bq512 bk1536 bb4",
                 lambda: flash_config(1536, 512, 1536, 4)),
        "f1536bb1": ("flash pad1536 bq1536 bk1536 bb1",
                     lambda: flash_config(1536, 1536, 1536, 1)),
        "p1408q128": ("flash pad1408 bq128 bk1408 bb2",
                      lambda: flash_config(1408, 128, 1408, 2)),
        "p1408full": ("flash pad1408 bq1408 bk1408 bb1",
                      lambda: flash_config(1408, 1408, 1408, 1)),
        "splash": ("splash pad1536 bq512 bkv1536",
                   lambda: splash_config(1536, 512, 1536)),
        "splash768": ("splash pad1536 bq768 bkv768",
                      lambda: splash_config(1536, 768, 768)),
        "xla": ("xla dot_product_attention", xla_dpa),
    }
    keys = sys.argv[2].split(",") if len(sys.argv) > 2 else \
        list(all_configs)
    variant_cache = {}
    for key in keys:
        name, make = all_configs[key]
        try:
            fn, P = make()
            if P not in variant_cache:
                variant_cache[P] = make_variants(P, B=B)
            ms = timeit(fn, variant_cache[P])
            print(f"{name:<42s} {ms:8.2f} ms   {flops/ms*1000:6.1f} TF/s")
        except Exception as e:
            print(f"{name:<42s} FAILED: {str(e)[:110]}")


if __name__ == "__main__":
    main()
