"""Online serving CLI: checkpoint → warmed micro-batching HTTP endpoint.

The reference has no serving path (its ``inference.py`` is gitignored —
SURVEY §1); offline batch scoring lives in ``cli/predict.py``. This serves
the teacher interactively with bounded-compile shape buckets and the same
image tiers as training:

``--image_mode pixel``      clients send ``pixel_u8_b64`` (raw uint8 bytes
                            of the [S,S,3] resized CXR; normalization fuses
                            into the step on device) — the general mode.
``--image_mode jpeg_root``  server holds ``{image_id}.jpg`` files under
                            ``--cxr_jpeg_root`` and ENCODES EACH UNIQUE
                            IMAGE ONCE through the frozen ViT at startup
                            (data/features.py); requests reference
                            ``image_id`` and each forward skips the ViT —
                            the encode-once tier measured ~6x the pixel
                            step's throughput (docs/PERF.md).
``--image_mode synthetic``  procedural images keyed by ``image_id``
                            (demos, load tests; no image payloads at all).

Every bucket is pre-compiled before the port opens, so the first request
never pays an XLA compile.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("teacher online serving")
    p.add_argument("--ckpt", type=str, required=True,
                   help="teacher best checkpoint (.msgpack)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8389)
    p.add_argument("--image_mode", type=str, default="pixel",
                   choices=["pixel", "jpeg_root", "synthetic"])
    p.add_argument("--cxr_jpeg_root", type=str, default="",
                   help="directory of {image_id}.jpg files (jpeg_root mode)")
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=4.0)
    p.add_argument("--max_queue", type=int, default=1024)
    p.add_argument("--data_parallel", type=int, default=1,
                   help="serve DP over this many chips: buckets snap to "
                        "multiples of it and each batch shards over the "
                        "mesh's data axis")
    p.add_argument("--labels", type=str, default="",
                   help="comma-separated label names (default: the "
                        "DataConfig pathology set)")
    p.add_argument("--aot_dir", type=str, default="",
                   help="persist each bucket's compiled executable here "
                        "(utils/aot.py): restarts reload instead of "
                        "recompiling, so warmup drops from a full XLA "
                        "compile per bucket to a host-side lowering")
    args = p.parse_args(argv)

    from ..analysis.common import load_teacher
    from ..config import DataConfig
    from ..serve import BatchingPredictor, make_server, serve_forever

    model, cfg, params, batch_stats, _ = load_teacher(args.ckpt)
    labels = (args.labels.split(",") if args.labels
              else list(DataConfig().pathology_labels))
    S = cfg.vit.image_size

    mesh = None
    device_put = None
    if args.data_parallel > 1:
        import jax
        from ..parallel import mesh as meshlib
        mesh = meshlib.create_mesh(args.data_parallel, 1)
        params = meshlib.shard_params(params, mesh)
        rep = meshlib.replicated(mesh)
        device_put = lambda a: jax.device_put(a, rep)   # noqa: E731

    image_source = feature_source = None
    if args.image_mode == "synthetic":
        import jax.numpy as jnp
        from ..train.teacher_loop import make_synthetic_image_source
        base = make_synthetic_image_source(S)
        K = cfg.perceiver.n_pathologies

        def image_source(batch):
            # the procedural generator derives images from labels, which a
            # serving request doesn't carry — fix them to zeros
            return base({**batch, "y_multi": jnp.zeros(
                (batch["image_ids"].shape[0], K), jnp.float32)})
    elif args.image_mode == "jpeg_root":
        if not args.cxr_jpeg_root:
            p.error("--image_mode jpeg_root requires --cxr_jpeg_root")
        from ..data import features as F
        from ..data.images import JpegStore, decode_batch
        ids = sorted(int(f[:-4]) for f in os.listdir(args.cxr_jpeg_root)
                     if f.endswith(".jpg"))
        if not ids:
            p.error(f"no {{id}}.jpg files under {args.cxr_jpeg_root}")
        store = JpegStore(root=args.cxr_jpeg_root)
        n_threads = os.cpu_count() or 1

        def pixels_for_ids(batch_ids):
            blobs = [store.get(i) for i in np.asarray(batch_ids)]
            return decode_batch(blobs, S, n_threads=n_threads)

        encode = F.encode_fn_for_teacher(model, params)
        print(f"encoding {len(ids)} images once (frozen ViT) ...",
              flush=True)
        kw = {"device_put": device_put} if device_put is not None else {}
        bank = F.CXRFeatureBank.build(encode, pixels_for_ids,
                                      np.asarray(ids, np.int64), **kw)
        feature_source = bank.feature_source(keyed_by_row=False)

    pred = BatchingPredictor(
        model, params, batch_stats, image_source=image_source,
        feature_source=feature_source, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, max_queue=args.max_queue,
        labels=labels, mesh=mesh, aot_dir=args.aot_dir or None).start()

    T, V = cfg.duett.n_timesteps, cfg.duett.n_variables
    example = {"x_ts": np.zeros((T, 2 * V), np.float32),
               "static": np.zeros(cfg.duett.d_static, np.float32)}
    if args.image_mode == "pixel":
        example["pixel_u8"] = np.zeros((S, S, 3), np.uint8)
    print("pre-compiling buckets ...", flush=True)
    times = pred.warmup(example)
    print(f"warm: {times}", flush=True)
    if args.aot_dir:
        print(f"aot cache: {sum(pred.aot_hits.values())}/"
              f"{len(pred.aot_hits)} buckets loaded from {args.aot_dir}",
              flush=True)

    meta = {"n_timesteps": T, "n_variables": V,
            "d_static": cfg.duett.d_static, "image_size": S,
            "image_mode": args.image_mode, "perceiver": cfg.perceiver_type}
    server = make_server(pred, args.host, args.port, meta=meta)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(mode={args.image_mode})", flush=True)
    try:
        serve_forever(server)
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        pred.close()


if __name__ == "__main__":
    main()
