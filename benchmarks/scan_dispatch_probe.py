"""Measure the multi-step scan dispatch (engine.scan_steps) on the
encode-once tier.

The cached-tier step is ~tens of ms at large batch, so per-step host work —
batch device_put + program dispatch, each a round trip on remote/tunneled
TPU backends — can bound throughput instead of the device. This probe times
the SAME training work dispatched two ways:

- single: one jitted call per optimizer step (host batch shipped per call);
- scan K: one jitted call per K steps (K-stacked host megabatch per call).

Both paths feed freshly-built host batches each call (the honest e2e
comparison — nothing pre-staged on device except the feature bank, as in
production). Usage: python benchmarks/scan_dispatch_probe.py [batch] [K]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def _sync(x):
    """Host fetch of a reduced scalar — block_until_ready is unreliable
    through the tunnel (see bench.py)."""
    return float(jnp.asarray(x).sum())


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_calls = 6   # per mode; scan mode runs n_calls*K steps

    from multimodal_edema_prediction_tpu.config import (TeacherConfig,
                                                        TrainConfig)
    from multimodal_edema_prediction_tpu.data.features import CXRFeatureBank
    from multimodal_edema_prediction_tpu.data.prefetch import \
        stack_host_batches
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    from multimodal_edema_prediction_tpu.train import engine
    from multimodal_edema_prediction_tpu.train.optim import make_optimizer
    from multimodal_edema_prediction_tpu.train.state import TrainState
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        init_teacher, teacher_frozen_prefixes)

    cfg = TeacherConfig()
    tcfg = TrainConfig(batch_size=B)
    T, V, D = cfg.duett.n_timesteps, cfg.duett.n_variables, cfg.duett.d_static
    KL = cfg.perceiver.n_pathologies
    P = cfg.vit.n_patches
    N_IMG = 64
    rng = np.random.default_rng(0)
    mesh = meshlib.create_mesh(len(jax.devices()), 1)
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, B, T, jax.random.key(0))
    tx = make_optimizer(tcfg.optim, 10_000,
                        frozen_prefixes=teacher_frozen_prefixes(cfg))

    def host_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "stay_rows": r.integers(0, 64, B).astype(np.int32),
            "slot_idx": np.full(B, T, np.int32),
            "image_ids": r.integers(0, N_IMG, B).astype(np.int32),
            "y": r.integers(0, 2, B).astype(np.float32),
            "y_multi": r.integers(0, 2, (B, KL)).astype(np.float32),
            "y_multi_mask": np.ones((B, KL), np.float32),
            "bin_ends": np.broadcast_to(
                (np.arange(1, T + 1) / 24.0).astype(np.float32),
                (B, T)).copy(),
        }

    with mesh:
        rep = meshlib.replicated(mesh)
        params = meshlib.shard_params(variables["params"], mesh)
        state = TrainState.create(params, variables["batch_stats"], tx)
        grid = jax.device_put(
            rng.normal(size=(64, 48, 2 * V)).astype(np.float32), rep)
        static = jax.device_put(
            rng.normal(size=(64, D)).astype(np.float32), rep)
        fbank = CXRFeatureBank(
            np.arange(N_IMG, dtype=np.int64),
            rng.normal(size=(N_IMG, cfg.d_img)).astype(jnp.bfloat16),
            rng.normal(size=(N_IMG, P, cfg.d_img)).astype(jnp.bfloat16),
            device_put=lambda a: jax.device_put(a, rep))
        feat_src = fbank.feature_source(keyed_by_row=True)

        step = engine.make_teacher_step(model, tcfg, cfg.duett, T,
                                        np.ones(KL, np.float32), None,
                                        jnp.bfloat16, feature_source=feat_src)
        raw = engine.make_teacher_step(model, tcfg, cfg.duett, T,
                                       np.ones(KL, np.float32), None,
                                       jnp.bfloat16, feature_source=feat_src,
                                       jit=False)
        multi = engine.scan_steps(raw, model)

        key = jax.random.key(0)
        seed = [0]

        def run_single(n):
            nonlocal state, key
            tot = None
            for _ in range(n):
                key, sub = jax.random.split(key)
                b = meshlib.shard_batch(host_batch(seed[0]), mesh)
                seed[0] += 1
                state, out = step(state, grid, static, b, sub)
                tot = out["total"]
            return tot

        def run_scan(n_c):
            nonlocal state, key
            tot = None
            for _ in range(n_c):
                bs = [host_batch(seed[0] + i) for i in range(K)]
                seed[0] += K
                sb = next(iter(stack_host_batches(iter(bs), K)))
                db = meshlib.shard_batch(sb, mesh, stacked=True)
                key, subs = engine.split_chain(key, K)
                state, out = multi(state, grid, static, db, subs)
                tot = out["total"]
            return tot

        # warmup/compile both
        _sync(run_single(2))
        _sync(run_scan(1))

        t0 = time.time()
        _sync(run_single(n_calls * K))
        dt_single = time.time() - t0
        sps_single = B * n_calls * K / dt_single

        t0 = time.time()
        _sync(run_scan(n_calls))
        dt_scan = time.time() - t0
        sps_scan = B * n_calls * K / dt_scan

        print(f"batch {B}  K={K}  steps/mode={n_calls * K}")
        print(f"  single-step dispatch : {sps_single:9.1f} samples/s/chip "
              f"({dt_single / (n_calls * K) * 1000:.2f} ms/step)")
        print(f"  scan K dispatch      : {sps_scan:9.1f} samples/s/chip "
              f"({dt_scan / (n_calls * K) * 1000:.2f} ms/step)")
        print(f"  speedup              : {sps_scan / sps_single:.3f}x")


if __name__ == "__main__":
    main()
