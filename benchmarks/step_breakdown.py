"""Teacher-step component breakdown by ablation timing.

The tunneled TPU backend defeats trace-based profiling workflows, so the
decomposition is measured by timing jitted sub-computations at production
shapes (value-distinct inputs per call — see flash_tune.py's timing note):

- full fused train step (gather + encoders + perceiver + loss + AdamW)
- eval step (same forward, no bwd/optimizer)      → bwd+opt = difference
- frozen ViT forward alone (B×518×518×3 → CLS+patches)
- DuETT encoder fwd alone
- perceiver fwd alone (on fake tokens)

With ``cached`` as the second argument, decompose the ENCODE-ONCE tier's
step instead (feature-bank gather replaces the ViT forward) — used to find
what binds the cached step at large batch (it plateaus ~12.5k samples/s
between b512 and b1024 on v5e-1).

Usage: python benchmarks/step_breakdown.py [batch] [cached]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, variants, iters=10, warmup=2):
    for i in range(warmup):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cached = len(sys.argv) > 2 and sys.argv[2] == "cached"
    from multimodal_edema_prediction_tpu.config import (TeacherConfig,
                                                        TrainConfig)
    from multimodal_edema_prediction_tpu.models.duett import DuettEncoder
    from multimodal_edema_prediction_tpu.models.perceiver import \
        PatchDualPathologyPerceiver
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.models.vit import DinoViT
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    from multimodal_edema_prediction_tpu.train import engine
    from multimodal_edema_prediction_tpu.train.optim import make_optimizer
    from multimodal_edema_prediction_tpu.train.state import TrainState
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        init_teacher, make_bank_image_source, teacher_frozen_prefixes)

    cfg = TeacherConfig()
    tcfg = TrainConfig(batch_size=B)
    T, V, D = cfg.duett.n_timesteps, cfg.duett.n_variables, cfg.duett.d_static
    K = cfg.perceiver.n_pathologies
    S = cfg.vit.image_size
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    mesh = meshlib.create_mesh(len(jax.devices()), 1)
    model = TeacherModel(cfg)
    variables = init_teacher(model, cfg, B, T, jax.random.key(0))
    tx = make_optimizer(tcfg.optim, 1000,
                        frozen_prefixes=teacher_frozen_prefixes(cfg))

    def mk(shape, scale=0.1):
        return [jnp.asarray(rng.normal(size=shape) * scale, dt)
                for _ in range(2)]

    with mesh:
        rep = meshlib.replicated(mesh)
        params = meshlib.shard_params(variables["params"], mesh)
        state = TrainState.create(params, variables["batch_stats"], tx)
        bank = jax.device_put(rng.random((32, S, S, 3), np.float32
                                         ).astype(dt), rep)
        grid = jax.device_put(rng.normal(size=(64, 48, 2 * V)
                                         ).astype(np.float32), rep)
        static = jax.device_put(rng.normal(size=(64, D)).astype(np.float32),
                                rep)

        def make_batch(seed):
            r = np.random.default_rng(seed)
            return meshlib.shard_batch({
                "stay_rows": r.integers(0, 64, B).astype(np.int32),
                "slot_idx": np.full(B, T, np.int32),
                "image_ids": r.permutation(B).astype(np.int32) % 32,
                "y": r.integers(0, 2, B).astype(np.float32),
                "y_multi": r.integers(0, 2, (B, K)).astype(np.float32),
                "y_multi_mask": np.ones((B, K), np.float32),
                "bin_ends": np.broadcast_to(
                    (np.arange(1, T + 1) / 24.0).astype(np.float32),
                    (B, T)).copy(),
            }, mesh)

        batches = [make_batch(s) for s in range(2)]
        src = make_bank_image_source(bank)
        feat_src = None
        if cached:
            from multimodal_edema_prediction_tpu.data.features import \
                CXRFeatureBank
            P = cfg.vit.n_patches
            fbank = CXRFeatureBank(
                np.arange(32, dtype=np.int64),
                rng.normal(size=(32, cfg.d_img)).astype(jnp.bfloat16),
                rng.normal(size=(32, P, cfg.d_img)).astype(jnp.bfloat16),
                device_put=lambda a: jax.device_put(a, rep))
            feat_src = fbank.feature_source(keyed_by_row=True)
        # independent device-resident copies — they survive the donating
        # train step below (host args would re-transfer 344 MB per call
        # through the tunnel)
        p0 = jax.device_put(jax.tree.map(np.asarray, variables["params"]),
                            rep)
        b0 = jax.device_put(
            jax.tree.map(np.asarray, variables["batch_stats"]), rep)

        ev = engine.make_teacher_eval(model, T, dt, src,
                                      feature_source=feat_src)
        ms_eval = timeit(lambda b: ev(p0, b0, grid, static,
                                      b)["main_logit"],
                         [(b,) for b in batches])

        if cached:
            # feature-bank gather alone (replaces the ViT fwd in this tier)
            gather = jax.jit(lambda b: feat_src(b)[1])
            ms_vit = timeit(gather, [(b,) for b in batches])
        else:
            # ViT forward alone
            vit = DinoViT(cfg.vit)
            vparams = {"params": jax.tree.map(np.asarray,
                                              variables["params"]["cxr"])}
            vit_fwd = jax.jit(lambda px: vit.apply(vparams, px)[1])
            ms_vit = timeit(vit_fwd, [(x,) for x in mk((B, S, S, 3), 0.5)])

        # DuETT encoder fwd alone
        duett = DuettEncoder(cfg.duett)
        dvars = {"params": jax.tree.map(np.asarray,
                                        variables["params"]["duett"]),
                 "batch_stats": jax.tree.map(
                     np.asarray, variables["batch_stats"]["duett"])}
        times = jnp.broadcast_to(jnp.arange(1, T + 1, dtype=dt) / 24,
                                 (B, T))
        du_fwd = jax.jit(lambda x, s: duett.apply(
            dvars, x, s, times, train=False)[0])
        ms_duett = timeit(du_fwd, list(zip(mk((B, T, 2 * V + 1)),
                                           mk((B, D)))))

        # perceiver fwd alone
        tt_dim0 = cfg.duett.d_embedding * (V + 1)
        perc = PatchDualPathologyPerceiver(cfg.perceiver, d_ts=tt_dim0)
        pvars = {"params": jax.tree.map(np.asarray,
                                        variables["params"]["perceiver"])}
        d_lat = cfg.perceiver.d_latent
        tt_dim = cfg.duett.d_embedding * (V + 1)
        ms_perc = timeit(
            jax.jit(lambda ts, im: perc.apply(pvars, ts, im,
                                              train=False)["fusion_logits"]),
            list(zip(mk((B, T + 1, tt_dim)), mk((B, 1370, d_lat)))))

        # multi-group AdamW update alone (zero grads for frozen groups is
        # exactly what the step feeds them — set_to_zero in optim.py)
        g_np = jax.tree.map(lambda p: np.asarray(p) * 0 + 1e-4,
                            jax.tree.map(np.asarray, variables["params"]))
        g_dev = [jax.device_put(jax.tree.map(lambda a, s=s: a * (1 + s),
                                             g_np), rep)
                 for s in range(2)]   # value-distinct (tunnel timing note)
        # donate + chain like the real step does — a non-donated update
        # measures 400 MB of state copies, not the optimizer (first r4 run
        # read 39.9 ms for what is really ~1 ms)
        opt_fn = jax.jit(lambda st, g: st.apply_gradients(g, st.batch_stats),
                         donate_argnums=(0,))
        opt_st = TrainState.create(
            jax.device_put(jax.tree.map(np.asarray, variables["params"]),
                           rep),
            jax.device_put(jax.tree.map(np.asarray,
                                        variables["batch_stats"]), rep), tx)

        def opt_call(g):
            nonlocal opt_st
            opt_st = opt_fn(opt_st, g)
            return opt_st.step
        ms_opt = timeit(opt_call, [(g,) for g in g_dev])

        # full train step LAST (donates/deletes the state buffers)
        step = engine.make_teacher_step(model, tcfg, cfg.duett, T,
                                        np.ones(K, np.float32), None, dt, src,
                                        feature_source=feat_src)
        step_flops = float("nan")
        try:    # XLA's own FLOP count for the whole fused step → honest MFU
            cost = step.lower(state, grid, static, batches[0],
                              jax.random.key(9)).compile().cost_analysis()
            step_flops = float(cost["flops"])
        except Exception:
            pass

        def full(batch, key):
            nonlocal state
            state, out = step(state, grid, static, batch, key)
            return out["total"]
        ms_full = timeit(full, [(b, jax.random.key(i))
                                for i, b in enumerate(batches)])

        # in-situ optimizer isolation: the SAME fused step with a trivial
        # SGD tx — the difference vs ms_full is the multi-group AdamW's
        # marginal in-step cost without any standalone-dispatch inflation
        # (the donated/chained standalone probe above still over-reads
        # through the tunnel; negative residuals flag it)
        import optax
        # p0/b0 are the pre-donation device copies (the originals inside
        # `state`/`variables` were consumed by the donating ms_full loop)
        sgd_state = TrainState.create(jax.tree.map(jnp.array, p0),
                                      jax.tree.map(jnp.array, b0),
                                      optax.sgd(1e-4))

        def full_sgd(batch, key):
            nonlocal sgd_state
            sgd_state, out = step(sgd_state, grid, static, batch, key)
            return out["total"]
        ms_full_sgd = timeit(full_sgd, [(b, jax.random.key(i + 7))
                                        for i, b in enumerate(batches)])

    tier = "cached (encode-once)" if cached else "fused (in-step ViT)"
    print(f"batch {B}  tier={tier}  (ms/step; tunnel RTT inflates each by "
          f"the same constant ≈ a few ms at 10 iters)")
    print(f"  full train step : {ms_full:7.2f}   "
          f"({B / ms_full * 1000:.0f} samples/s)")
    if step_flops == step_flops:
        peak = 197e12   # v5e dense bf16
        print(f"  XLA step flops  : {step_flops / 1e9:7.1f} G  "
              f"({step_flops / B / 1e9:.2f} G/sample; "
              f"MFU at this rate ≈ {step_flops / (ms_full / 1e3) / peak:.3f})")
    print(f"  eval (no bwd)   : {ms_eval:7.2f}   bwd+opt ≈ "
          f"{ms_full - ms_eval:.2f}")
    print(f"  AdamW update    : {ms_opt:7.2f}   standalone (dispatch-"
          f"inflated through the tunnel)")
    print(f"  step w/ SGD tx  : {ms_full_sgd:7.2f}   in-situ AdamW extra ≈ "
          f"{ms_full - ms_full_sgd:.2f}; bwd ≈ "
          f"{ms_full_sgd - ms_eval:.2f} (incl. trivial update)")
    print(f"  {'feat gather' if cached else 'ViT fwd'} alone   : "
          f"{ms_vit:7.2f}")
    print(f"  DuETT fwd alone : {ms_duett:7.2f}")
    print(f"  perceiver alone : {ms_perc:7.2f}")
    print(f"  residual (gather/loss/misc) ≈ "
          f"{ms_eval - ms_vit - ms_duett - ms_perc:.2f}")


if __name__ == "__main__":
    main()
