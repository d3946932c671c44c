"""Serving-path probe: micro-batching predictor latency/throughput on the
live backend (TPU via the tunnel, or CPU for smoke).

Measures, on the FULL-SIZE teacher (ViT-B/14 @ 518, bf16):

1. batch-1 round-trip latency through the predictor (p50/p90/p99) — the
   interactive floor;
2. sustained throughput with ``--clients`` concurrent open-loop submitters
   (the micro-batcher coalesces them into shape buckets) vs the raw eval
   step's batched ceiling (bench.py ``teacher_inference``);
3. the batch-size histogram actually formed — how well coalescing works at
   the offered load.

Usage::

    python -m benchmarks.serving_probe [--clients 32] [--seconds 20]
    JAX_PLATFORMS=cpu python -m benchmarks.serving_probe --tiny --seconds 3
"""
from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("serving probe")
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=4.0)
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry (CPU smoke)")
    p.add_argument("--aot_dir", type=str, default="",
                   help="measure cold-vs-warm warmup through the AOT "
                        "executable cache: run once to populate, again to "
                        "reload (utils/aot.py)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from multimodal_edema_prediction_tpu.config import (DuettConfig,
                                                        PerceiverConfig,
                                                        TeacherConfig,
                                                        ViTConfig)
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.serve import BatchingPredictor
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        init_teacher, make_bank_image_source)

    if args.tiny:
        cfg = TeacherConfig(
            duett=DuettConfig(n_variables=6, n_timesteps=24, d_embedding=8,
                              n_layers=1, d_feedforward=16,
                              d_hidden_mlp_embedding=8,
                              d_hidden_tab_encoder=8),
            vit=ViTConfig(image_size=28, patch_size=14, d_model=16,
                          n_layers=1, n_heads=2, d_feedforward=32),
            perceiver=PerceiverConfig(d_latent=16, n_heads=2, head_hidden=8))
    else:
        cfg = TeacherConfig(vit=ViTConfig(flash_block_b=2))
    model = TeacherModel(cfg)
    T, V, D = cfg.duett.n_timesteps, cfg.duett.n_variables, cfg.duett.d_static
    S = cfg.vit.image_size
    variables = init_teacher(model, cfg, 4, T, jax.random.key(0))

    rng = np.random.default_rng(0)
    # serve from an HBM pixel bank (production tier): requests carry ids only
    bank = jnp.asarray(rng.random((32, S, S, 3), np.float32)
                       .astype(jnp.bfloat16))
    pred = BatchingPredictor(
        model, variables["params"], variables["batch_stats"],
        image_source=make_bank_image_source(bank),
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        max_queue=4096, aot_dir=args.aot_dir or None).start()

    def req(i):
        return {"x_ts": rng.normal(size=(T, 2 * V)).astype(np.float32),
                "static": rng.normal(size=D).astype(np.float32),
                "image_id": int(i % 32)}

    example = req(0)
    t0 = time.time()
    compile_times = pred.warmup(example)
    warm_s = time.time() - t0

    # --- 1. batch-1 latency, closed loop
    lat = []
    for i in range(30):
        t = time.time()
        pred.predict(req(i))
        lat.append((time.time() - t) * 1e3)
    lat = np.asarray(lat[5:])        # drop stragglers from warm caches

    # --- 2. sustained throughput, N concurrent closed-loop clients
    stop = time.time() + args.seconds
    counts = [0] * args.clients

    def client(ci):
        while time.time() < stop:
            pred.predict(req(ci))
            counts[ci] += 1

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.time()
    [t.start() for t in threads]
    [t.join() for t in threads]
    dt = time.time() - t0
    qps = sum(counts) / dt
    st = pred.stats()
    pred_aot_hits = dict(pred.aot_hits)
    pred.close()

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "geometry": "tiny" if args.tiny else "full",
        "warmup_s": round(warm_s, 1),
        "bucket_compile_s": compile_times,
        "aot_hits": pred_aot_hits,
        "batch1_latency_ms": {"p50": round(float(np.percentile(lat, 50)), 2),
                              "p90": round(float(np.percentile(lat, 90)), 2),
                              "p99": round(float(np.percentile(lat, 99)), 2)},
        "clients": args.clients,
        "sustained_qps": round(qps, 1),
        "mean_formed_batch": round(st["mean_batch_size"], 2),
        "batch_size_hist": st["batch_size_hist"],
        "queue_latency_ms_p50": round(st["latency_ms_p50"], 2),
        "queue_latency_ms_p99": round(st["latency_ms_p99"], 2),
    }))


if __name__ == "__main__":
    main()
