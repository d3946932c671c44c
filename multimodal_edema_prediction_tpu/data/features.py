"""Encode-once frozen-ViT feature cache (decode-once, ENCODE-once tier).

The teacher's CXR branch is frozen by default (the reference keeps RAD-DINO
in eval and never updates it — ``training_duett/trainer.py:287-289``,
``training_duett/engine.py:7-20``), which makes the ViT forward a pure
function of the pixels: same image → same (CLS, patch) tokens every step,
every epoch. The reference still recomputes it per sample per step — and at
the production shape that forward is ~90% of the fused step's FLOPs
(benchmarks/step_breakdown.py). This module encodes each unique image ONCE
and serves the cached tokens to the fusion step instead:

- :class:`CXRFeatureBank` — device(HBM)-resident bf16 token bank; the jitted
  step gathers rows by image id. (1+1369)·768·2 B ≈ 2.1 MB/image, so ~3.8k
  images/8 GiB of HBM budget.
- :class:`HostFeatureStore` — host tier (RAM or disk memmap) for feature
  sets beyond the HBM budget; the prefetch hook ships ~2.1 MB/sample of
  tokens instead of running 318 GFLOPs/sample of ViT.

Semantics are unchanged (verified bit-level in tests/test_feature_cache.py):
frozen ⇒ eval-mode forward (no dropout), the ViT has no batch statistics,
and preprocessing (resize+normalize) is deterministic, so the cached tokens
are exactly what the in-step encoder would produce. Gradients are identical
too — the reference detaches the image branch (stop_gradient here), so no
gradient ever flows into the cached tensors.

Invalid ids NaN-poison the gathered rows (same contract as
``teacher_loop.make_bank_image_source``) so a broken id→row mapping trips
the finite-loss guard instead of silently training on wrong features. The
poisoning is free: the device bank carries one extra all-NaN sentinel row
and invalid ids are remapped to it BEFORE the gather (a [B] integer op),
so no post-gather ``where`` pass re-touches the [B,1370,768] output. The
gather itself is a Pallas scalar-prefetch DMA kernel on TPU
(``ops/pallas_gather.py``; measured 5.2 ms vs XLA's 7.2 ms for a b512
patch-token gather on v5e) and plain ``bank[rows]`` elsewhere.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

__all__ = [
    "encode_fn_for_teacher", "build_feature_arrays",
    "CXRFeatureBank", "HostFeatureStore", "features_from_batch",
]


def encode_fn_for_teacher(model, params, dtype=None) -> Callable:
    """Jitted ``pixels[B,S,S,3] → (cls[B,768], patches[B,N,768])`` applying
    the teacher's frozen ViT submodule (``params['cxr']``) in eval mode.

    The ViT params are an explicit jit argument, not a closure capture —
    captured arrays serialize into the compile payload, which breaks
    remote-compile backends (HTTP 413 through the axon tunnel at ViT-B's
    344 MB f32) and bloats the executable."""
    import jax
    import jax.numpy as jnp

    from ..models.vit import DinoViT
    vit_cfg = model.cfg.vit
    dt = dtype or jnp.bfloat16
    cxr_params = params["cxr"]

    @jax.jit
    def encode(p, pixels):
        cls, patches = DinoViT(vit_cfg).apply(
            {"params": p}, pixels.astype(dt), train=False)
        return cls, patches

    return lambda pixels: encode(cxr_params, pixels)


def build_feature_arrays(encode_fn: Callable,
                         pixels_for_ids: Callable[[np.ndarray], "np.ndarray"],
                         image_ids: np.ndarray, chunk: int = 16,
                         progress: Optional[Callable[[int, int], None]] = None,
                         out_dtype=None
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode every unique image once (fixed-shape chunks → one compile).

    Returns ``(sorted_ids, cls[N,768], patches[N,P,768])`` as host numpy.
    ``out_dtype`` defaults to ``ml_dtypes.bfloat16`` — when the training
    compute dtype is bf16 (production) that storage is LOSSLESS (the encoder
    already emits bf16) at half the f32 footprint; loops that compute in f32
    pass ``np.float32`` to keep exactness.
    """
    import ml_dtypes
    if out_dtype is None:
        out_dtype = ml_dtypes.bfloat16
    ids = np.unique(np.asarray(image_ids)).astype(np.int64)
    n = len(ids)
    cls_out = patch_out = None
    for i in range(0, n, chunk):
        span = ids[i:i + chunk]
        pixels = np.asarray(pixels_for_ids(span), np.float32)
        pad = chunk - len(span)
        if pad:  # fixed chunk shape → a single jit compilation
            pixels = np.concatenate([pixels, pixels[-1:].repeat(pad, 0)])
        cls, patches = encode_fn(pixels)
        cls = np.asarray(cls).astype(out_dtype)
        patches = np.asarray(patches).astype(out_dtype)
        if cls_out is None:
            cls_out = np.empty((n,) + cls.shape[1:], cls.dtype)
            patch_out = np.empty((n,) + patches.shape[1:], patches.dtype)
        cls_out[i:i + len(span)] = cls[:len(span)]
        patch_out[i:i + len(span)] = patches[:len(span)]
        if progress is not None:
            progress(min(i + chunk, n), n)
    return ids, cls_out, patch_out


def _rows_for(sorted_ids: np.ndarray, image_ids: np.ndarray,
              what: str) -> np.ndarray:
    ids = np.asarray(image_ids, np.int64)
    rows = np.searchsorted(sorted_ids, ids)
    rows = np.clip(rows, 0, len(sorted_ids) - 1)
    if not (sorted_ids[rows] == ids).all():
        missing = ids[sorted_ids[rows] != ids]
        raise KeyError(f"image ids not in {what}: {missing[:5]}")
    return rows.astype(np.int32)


class CXRFeatureBank:
    """Device-resident (CLS, patch) token bank for the frozen ViT.

    Per-step cost replaced: 318 GFLOP/sample of ViT forward → a [B, 1370,
    768] HBM gather (~2.1 MB/sample — microseconds at HBM bandwidth).
    """

    def __init__(self, ids: np.ndarray, cls: np.ndarray, patches: np.ndarray,
                 device_put: Optional[Callable] = None):
        import jax
        put = device_put or jax.device_put
        self.ids = np.asarray(ids, np.int64)
        # One extra all-NaN sentinel row: invalid ids gather it directly,
        # replacing a full-size post-gather `where` pass (module docstring).
        nan_row = np.full((1,) + cls.shape[1:], np.nan, cls.dtype)
        nan_prow = np.full((1,) + patches.shape[1:], np.nan, patches.dtype)
        self.cls = put(np.concatenate([cls, nan_row]))
        self.patches = put(np.concatenate([patches, nan_prow]))

    @classmethod
    def build(cls, encode_fn, pixels_for_ids, image_ids, chunk: int = 16,
              device_put: Optional[Callable] = None,
              progress=None, out_dtype=None) -> "CXRFeatureBank":
        ids, c, p = build_feature_arrays(encode_fn, pixels_for_ids, image_ids,
                                         chunk, progress, out_dtype)
        return cls(ids, c, p, device_put)

    @staticmethod
    def nbytes(n_images: int, n_patches: int = 1369, d: int = 768) -> int:
        # +1: the NaN sentinel row appended in __init__.
        return (int(n_images) + 1) * (n_patches + 1) * d * 2   # bf16

    def rows_for(self, image_ids: np.ndarray) -> np.ndarray:
        return _rows_for(self.ids, image_ids, "feature bank")

    def host_fn(self) -> Callable[[dict], dict]:
        """Batch hook: rewrite ``image_ids`` to bank-row indices (validated
        host-side with a real exception)."""
        def fn(batch: dict) -> dict:
            return {**batch, "image_ids": self.rows_for(batch["image_ids"])}
        return fn

    def feature_source(self, keyed_by_row: bool = True, mesh=None
                       ) -> Callable[[dict], tuple]:
        """Device-side gather for the jitted step; invalid keys are
        NaN-poisoned (see module docstring).

        ``keyed_by_row=True`` (training loops): ``batch['image_ids']`` were
        rewritten to bank rows by :meth:`host_fn`. ``False`` (analysis paths
        that assemble batches without the hook): raw image ids resolve to
        rows by a device-side ``searchsorted`` over the sorted id vector —
        a [B]×log(N) scan, negligible.

        ``mesh``: pass the training mesh when the step shards the batch —
        the Pallas gather then runs per-shard under ``shard_map`` (see
        ``ops/pallas_gather.gather_rows``)."""
        import jax.numpy as jnp

        from ..ops.pallas_gather import gather_rows
        cls_bank, patch_bank = self.cls, self.patches
        n = cls_bank.shape[0] - 1          # last row is the NaN sentinel
        ids_dev = None if keyed_by_row else jnp.asarray(self.ids)

        def source(batch):
            ids = batch["image_ids"]
            if keyed_by_row:
                bad = (ids < 0) | (ids >= n)
                rows = jnp.where(bad, n, ids)
            else:
                rows = jnp.clip(jnp.searchsorted(ids_dev, ids), 0, n - 1)
                rows = jnp.where(ids_dev[rows] != ids, n, rows)
            rows = rows.astype(jnp.int32)
            return (gather_rows(cls_bank, rows, mesh=mesh),
                    gather_rows(patch_bank, rows, mesh=mesh))
        return source


class HostFeatureStore:
    """Host tier: features in RAM (default) or a disk memmap pair, attached
    to batches by the prefetch hook (``cxr_cls`` / ``cxr_patches`` keys,
    consumed by :func:`features_from_batch`).

    Disk layout: ``{path}.ids.npy`` + ``{path}.cls.npy`` +
    ``{path}.patches.npy`` with a ``{path}.meta.json`` fingerprint, mirroring
    :class:`..data.images.U8MemmapStore` (resumable, reusable across
    processes)."""

    def __init__(self, ids: np.ndarray, cls: np.ndarray,
                 patches: np.ndarray, n_threads: int = 4):
        self.ids = np.asarray(ids, np.int64)
        self.cls = cls
        self.patches = patches
        self.n_threads = n_threads

    # ---- build / persist --------------------------------------------------
    @classmethod
    def build(cls, encode_fn, pixels_for_ids, image_ids, chunk: int = 16,
              path: Optional[str] = None, progress=None,
              n_threads: int = 4, out_dtype=None) -> "HostFeatureStore":
        """In RAM when ``path`` is None; else build-once into a reusable
        memmap store (matching fingerprint → instant reopen)."""
        import hashlib
        import json
        ids_u = np.unique(np.asarray(image_ids)).astype(np.int64)
        if path is None:
            ids, c, p = build_feature_arrays(encode_fn, pixels_for_ids,
                                             ids_u, chunk, progress,
                                             out_dtype)
            return cls(ids, c, p, n_threads)
        fp = hashlib.sha256(ids_u.tobytes()).hexdigest()
        meta_p = f"{path}.meta.json"
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == fp and meta.get("complete"):
                return cls.open(path, n_threads=n_threads)
            if meta.get("fingerprint") != fp:
                raise ValueError(
                    f"existing feature store at {path} was built for a "
                    f"different image set — delete it or use another path")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        ids, c, p = build_feature_arrays(encode_fn, pixels_for_ids, ids_u,
                                         chunk, progress, out_dtype)
        np.save(f"{path}.ids.npy", ids)
        # raw-bytes memmap pair (np.save of bf16 round-trips via ml_dtypes)
        np.save(f"{path}.cls.npy", c)
        np.save(f"{path}.patches.npy", p)
        with open(meta_p, "w") as f:
            json.dump({"fingerprint": fp, "n": len(ids), "complete": True,
                       "cls_shape": list(c.shape),
                       "patch_shape": list(p.shape)}, f)
        return cls(ids, c, p, n_threads)

    @classmethod
    def open(cls, path: str, n_threads: int = 4) -> "HostFeatureStore":
        import json
        with open(f"{path}.meta.json") as f:
            meta = json.load(f)
        if not meta.get("complete"):
            raise ValueError(f"feature store at {path} incomplete — rebuild")
        ids = np.load(f"{path}.ids.npy")
        c = np.load(f"{path}.cls.npy", mmap_mode="r")
        p = np.load(f"{path}.patches.npy", mmap_mode="r")
        return cls(ids, c, p, n_threads)

    # ---- serving ----------------------------------------------------------
    def rows_for(self, image_ids: np.ndarray) -> np.ndarray:
        return _rows_for(self.ids, image_ids, "feature store")

    def get_batch(self, image_ids: np.ndarray):
        rows = self.rows_for(image_ids)
        if self.n_threads <= 1 or len(rows) < 8 or \
                not isinstance(self.patches, np.memmap):
            return np.asarray(self.cls[rows]), np.asarray(self.patches[rows])
        # memmap: parallel row gather (numpy reads release the GIL)
        from concurrent.futures import ThreadPoolExecutor
        out_c = np.empty((len(rows),) + self.cls.shape[1:], self.cls.dtype)
        out_p = np.empty((len(rows),) + self.patches.shape[1:],
                         self.patches.dtype)
        nt = min(self.n_threads, len(rows))
        spans = np.array_split(np.arange(len(rows)), nt)

        def fill(span):
            out_c[span] = self.cls[rows[span]]
            out_p[span] = self.patches[rows[span]]

        with ThreadPoolExecutor(nt) as ex:
            list(ex.map(fill, spans))
        return out_c, out_p

    def host_fn(self) -> Callable[[dict], dict]:
        """Prefetch hook: attach the token batch."""
        def fn(batch: dict) -> dict:
            c, p = self.get_batch(batch["image_ids"])
            return {**batch, "cxr_cls": c, "cxr_patches": p}
        return fn


def features_from_batch(batch: dict) -> tuple:
    """Feature source reading prefetched tokens (HostFeatureStore path)."""
    return batch["cxr_cls"], batch["cxr_patches"]
