"""Perceiver img_cross flash-attention probe (VERDICT r4 item 3).

The r4 cached-tier breakdown bounded the perceiver's 1370-token-KV
cross-attention reads at <=8% of the b512 step. This probe measures the
flash lever directly, at production shapes, in three places:

1. perceiver forward alone (b512, fake [B,1370,256] kv): standard XLA
   attention vs the Pallas flash kernel — the isolated ceiling;
2. cached-tier EVAL step (the only place flash is numerically exact:
   training applies dropout 0.2 to attention probs, run.py:78, which the
   flash kernel cannot reproduce);
3. cached-tier TRAIN step with dropout ablated to 0 in BOTH variants —
   the upper bound of what a hypothetical flash-with-dropout would buy
   the real training step.

Timing: per-call medians (tunnel stalls poison aggregates — docs/PERF.md),
value-distinct inputs per call.

Usage: python benchmarks/perceiver_flash_probe.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit_med(fn, variants, iters=10, warmup=2):
    for i in range(warmup):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        t0 = time.time()
        out = fn(*variants[i % len(variants)])
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000.0


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from multimodal_edema_prediction_tpu.config import (PerceiverConfig,
                                                        TeacherConfig,
                                                        TrainConfig)
    from multimodal_edema_prediction_tpu.data.features import CXRFeatureBank
    from multimodal_edema_prediction_tpu.models.perceiver import \
        PatchDualPathologyPerceiver
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    from multimodal_edema_prediction_tpu.train import engine
    from multimodal_edema_prediction_tpu.train.optim import make_optimizer
    from multimodal_edema_prediction_tpu.train.state import TrainState
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        init_teacher, teacher_frozen_prefixes)

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    mesh = meshlib.create_mesh(len(jax.devices()), 1)
    results = {}

    with mesh:
        rep = meshlib.replicated(mesh)

        # ---- 1. perceiver forward alone --------------------------------
        base = TeacherConfig()
        tt_dim = base.duett.d_embedding * (base.duett.n_variables + 1)
        d_lat = base.perceiver.d_latent
        T = base.duett.n_timesteps

        def mk(shape, scale=0.1):
            return [jax.device_put(
                jnp.asarray(rng.normal(size=shape) * scale, dt), rep)
                for _ in range(2)]

        ts_v = mk((B, T + 1, tt_dim))
        im_v = mk((B, 1370, d_lat))
        for label, pcfg in (("std", base.perceiver),
                            ("flash", base.perceiver.replace(use_flash=True))):
            perc = PatchDualPathologyPerceiver(pcfg, d_ts=tt_dim)
            pv = jax.jit(perc.init)(jax.random.key(0), ts_v[0], im_v[0])
            fwd = jax.jit(lambda ts, im, _p=perc, _v=pv: _p.apply(
                _v, ts, im, train=False)["fusion_logits"])
            results[f"perceiver_fwd_ms_{label}"] = round(
                timeit_med(fwd, list(zip(ts_v, im_v))), 3)
            print(f"  perceiver_fwd_ms_{label}: "
                  f"{results[f'perceiver_fwd_ms_{label}']}", flush=True)

        # ---- 2./3. cached-tier eval + dropout-0 train steps ------------
        for label, cfg in (
                ("std", TeacherConfig()),
                ("flash", TeacherConfig(
                    perceiver=PerceiverConfig(use_flash=True))),
                ("std_nodrop", TeacherConfig(
                    perceiver=PerceiverConfig(dropout=0.0))),
                ("flash_nodrop", TeacherConfig(
                    perceiver=PerceiverConfig(dropout=0.0, use_flash=True)))):
            tcfg = TrainConfig(batch_size=B)
            Tn = cfg.duett.n_timesteps
            V, D = cfg.duett.n_variables, cfg.duett.d_static
            K = cfg.perceiver.n_pathologies
            model = TeacherModel(cfg)
            variables = init_teacher(model, cfg, B, Tn, jax.random.key(0))
            params = meshlib.shard_params(variables["params"], mesh)
            P = cfg.vit.n_patches
            fbank = CXRFeatureBank(
                np.arange(32, dtype=np.int64),
                rng.normal(size=(32, cfg.d_img)).astype(jnp.bfloat16),
                rng.normal(size=(32, P, cfg.d_img)).astype(jnp.bfloat16),
                device_put=lambda a: jax.device_put(a, rep))
            fsrc = fbank.feature_source()
            grid = jax.device_put(
                rng.normal(size=(64, 48, 2 * V)).astype(np.float32), rep)
            static = jax.device_put(
                rng.normal(size=(64, D)).astype(np.float32), rep)

            def make_batch(seed):
                r = np.random.default_rng(seed)
                return meshlib.shard_batch({
                    "stay_rows": r.integers(0, 64, B).astype(np.int32),
                    "slot_idx": np.full(B, Tn, np.int32),
                    "image_ids": r.integers(0, 32, B).astype(np.int32),
                    "y": r.integers(0, 2, B).astype(np.float32),
                    "y_multi": r.integers(0, 2, (B, K)).astype(np.float32),
                    "y_multi_mask": np.ones((B, K), np.float32),
                    "bin_ends": np.broadcast_to(
                        (np.arange(1, Tn + 1) / 24.0).astype(np.float32),
                        (B, Tn)).copy(),
                }, mesh)

            batches = [make_batch(s) for s in range(2)]
            if label in ("std", "flash"):          # eval-step comparison
                ev = engine.make_teacher_eval(model, Tn, dt,
                                              feature_source=fsrc)
                b0 = variables["batch_stats"]
                results[f"cached_eval_ms_{label}"] = round(timeit_med(
                    lambda b, _e=ev, _p=params, _b=b0:
                        _e(_p, _b, grid, static, b)["main_logit"],
                    [(b,) for b in batches]), 3)
                print(f"  cached_eval_ms_{label}: "
                      f"{results[f'cached_eval_ms_{label}']}", flush=True)
            else:                                  # dropout-0 train bound
                tx = make_optimizer(tcfg.optim, 1000,
                                    frozen_prefixes=teacher_frozen_prefixes(
                                        cfg))
                state = TrainState.create(params, variables["batch_stats"],
                                          tx)
                step = engine.make_teacher_step(
                    model, tcfg, cfg.duett, Tn, np.ones(K, np.float32),
                    None, dt, feature_source=fsrc)
                stash = {"s": state}

                def full(b, key, _s=stash, _f=step):
                    _s["s"], out = _f(_s["s"], grid, static, b, key)
                    return out["total"]
                kk = f"cached_train_nodrop_ms_{label.split('_')[0]}"
                results[kk] = round(timeit_med(
                    full, [(b, jax.random.key(i))
                           for i, b in enumerate(batches)]), 3)
                print(f"  {kk}: {results[kk]}", flush=True)

    results["batch"] = B
    for k in sorted(results):
        print(f"  {k:34s} {results[k]}")
    # verdict helper
    e_std = results.get("cached_eval_ms_std")
    e_fl = results.get("cached_eval_ms_flash")
    if e_std and e_fl:
        print(f"  eval speedup: {e_std / e_fl:.3f}x")
    t_std = results.get("cached_train_nodrop_ms_std")
    t_fl = results.get("cached_train_nodrop_ms_flash")
    if t_std and t_fl:
        print(f"  train(nodrop) speedup bound: {t_std / t_fl:.3f}x")


if __name__ == "__main__":
    main()
