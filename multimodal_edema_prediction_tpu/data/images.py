"""CXR image store + host decode hook for the real-JPEG path.

Reference equivalent: ``dicom_to_jpg_path`` + PIL decode + HF processor in
the DataLoader worker (training_duett/data_processing.py:295-391). Here:

- :class:`JpegStore` maps image_id → JPEG bytes (directory layout or an
  in-memory dict for tests),
- :func:`make_jpeg_host_fn` decodes/resizes/normalizes a batch with the
  native libjpeg kernel (numpy/PIL fallback) inside the prefetch worker
  thread, attaching ``pixel_values`` so the jitted teacher step's default
  image source consumes them.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence, Union

import numpy as np

from ..models.vit import IMAGE_MEAN, IMAGE_STD


class JpegStore:
    """image_id → JPEG bytes. Directory layout: ``{root}/{image_id}.jpg``
    (the MIMIC-CXR p##/p#####/s#####/dicom.jpg layout maps via an index
    file); or construct with an explicit dict for tests."""

    def __init__(self, root: Optional[str] = None,
                 blobs: Optional[Dict[int, bytes]] = None):
        assert root or blobs is not None
        self.root = root
        self.blobs = blobs

    def get(self, image_id: int) -> bytes:
        if self.blobs is not None:
            return self.blobs[int(image_id)]
        with open(os.path.join(self.root, f"{int(image_id)}.jpg"), "rb") as f:
            return f.read()


def decode_batch(blobs: Sequence[bytes], side: int,
                 mean=IMAGE_MEAN, std=IMAGE_STD,
                 n_threads: int = 4) -> np.ndarray:
    """[N] JPEG bytes → [N, side, side, 3] normalized float32 (native libjpeg
    kernel; PIL fallback)."""
    from .native_loader import decode_jpeg_batch_native
    out = decode_jpeg_batch_native(list(blobs), side, mean, std, n_threads)
    if out is not None:
        pixels, status = out
        if (status != 0).any():
            bad = np.nonzero(status)[0]
            raise ValueError(f"JPEG decode failed for batch items {bad}")
        return pixels
    # PIL fallback
    import io
    from PIL import Image
    pixels = np.empty((len(blobs), side, side, 3), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    for i, b in enumerate(blobs):
        img = Image.open(io.BytesIO(b)).convert("RGB").resize(
            (side, side), Image.BILINEAR)
        pixels[i] = (np.asarray(img, np.float32) / 255.0 - m) / s
    return pixels


def make_jpeg_host_fn(store: JpegStore, side: int = 518,
                      mean=IMAGE_MEAN, std=IMAGE_STD,
                      n_threads: int = 4) -> Callable[[dict], dict]:
    """Prefetch host hook: batch{image_ids} → batch + pixel_values."""
    def host_fn(batch: dict) -> dict:
        blobs = [store.get(i) for i in np.asarray(batch["image_ids"])]
        pixels = decode_batch(blobs, side, mean, std, n_threads)
        return {**batch, "pixel_values": pixels}
    return host_fn


def decode_batch_u8(blobs: Sequence[bytes], side: int,
                    n_threads: int = 4) -> np.ndarray:
    """[N] JPEG bytes → [N, side, side, 3] uint8 (resized, NOT normalized) —
    the cache-fill decode (native kernel; PIL fallback)."""
    from .native_loader import decode_jpeg_batch_u8_native
    out = decode_jpeg_batch_u8_native(list(blobs), side, n_threads)
    if out is not None:
        pixels, status = out
        if (status != 0).any():
            bad = np.nonzero(status)[0]
            raise ValueError(f"JPEG decode failed for batch items {bad}")
        return pixels
    import io
    from PIL import Image
    pixels = np.empty((len(blobs), side, side, 3), np.uint8)
    for i, b in enumerate(blobs):
        img = Image.open(io.BytesIO(b)).convert("RGB").resize(
            (side, side), Image.BILINEAR)
        pixels[i] = np.asarray(img, np.uint8)
    return pixels


class DecodedU8Cache:
    """Decode-once uint8 image cache: image_id → [side, side, 3] uint8.

    The recovery path when host JPEG decode cannot sustain device rate
    (BENCH: ~52 img/s/core native decode vs ~280 samples/s/chip step rate):
    each image is decoded+resized ONCE (native u8 kernel), cached at
    ``3·side²`` bytes (≈0.8 MB @ 518 — 4× smaller than f32), and per-step
    host work drops to slicing bytes; the [0,1]+mean/std normalization fuses
    into the jitted step on device (engine.default_image_source).

    The reference pays the full PIL decode + HF processor per sample per
    epoch in DataLoader workers (duett/mimic_dataset.py:33-46).
    """

    def __init__(self, store: JpegStore, side: int = 518,
                 n_threads: int = 4, max_images: Optional[int] = None):
        self.store = store
        self.side = side
        self.n_threads = n_threads
        self.max_images = max_images
        self._cache: Dict[int, np.ndarray] = {}

    def get_batch(self, image_ids: np.ndarray) -> np.ndarray:
        ids = [int(i) for i in np.asarray(image_ids)]
        missing = sorted({i for i in ids if i not in self._cache})
        if missing:
            blobs = [self.store.get(i) for i in missing]
            decoded = decode_batch_u8(blobs, self.side, self.n_threads)
            for i, px in zip(missing, decoded):
                self._cache[i] = px
        out = np.stack([self._cache[i] for i in ids])
        if self.max_images and len(self._cache) > self.max_images:
            # trim entries not referenced by this batch (arbitrary order —
            # epoch reuse dominates; a smarter policy hasn't been needed)
            needed = set(ids)
            drop = [k for k in self._cache if k not in needed]
            for k in drop[:len(self._cache) - self.max_images]:
                del self._cache[k]
        return out


def make_u8_cache_host_fn(cache: DecodedU8Cache) -> Callable[[dict], dict]:
    """Prefetch host hook: batch{image_ids} → batch + pixel_u8 (uint8)."""
    def host_fn(batch: dict) -> dict:
        return {**batch, "pixel_u8": cache.get_batch(batch["image_ids"])}
    return host_fn


class HostU8Bank:
    """Decode-once uint8 image bank in host RAM (the per-host tier for
    multi-process data parallelism): each host decodes ONLY its image
    partition (``image_id % P == pid``) once, and per-step work is a numpy
    row gather; the [0,1]+mean/std normalization fuses into the jitted step
    on device (``pixel_u8`` path). Unlike :class:`HBMImageBank` the rows are
    shipped host→device per step — at a per-host micro-batch (global/P
    images, ~0.8 MB each at 518²) that transfer is negligible, and nothing
    device-resident has to differ per host (which would break the SPMD
    single-program model). Reference equivalent: per-rank DataLoaders under
    DDP (training_duett/trainer.py:217-218)."""

    def __init__(self, store: JpegStore, image_ids: np.ndarray,
                 side: int = 518, n_threads: int = 4, chunk: int = 256):
        self.side = side
        self.ids = np.unique(np.asarray(image_ids)).astype(np.int64)
        n = len(self.ids)
        self.bank = np.empty((n, side, side, 3), np.uint8)
        for i in range(0, n, chunk):
            blobs = [store.get(j) for j in self.ids[i:i + chunk]]
            self.bank[i:i + len(blobs)] = decode_batch_u8(blobs, side,
                                                          n_threads)

    @property
    def nbytes(self) -> int:
        return self.bank.nbytes

    def rows_for(self, image_ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(image_ids, np.int64)
        rows = np.searchsorted(self.ids, ids)
        rows = np.clip(rows, 0, len(self.ids) - 1)
        if not (self.ids[rows] == ids).all():
            missing = ids[self.ids[rows] != ids]
            raise KeyError(f"image ids not in host bank: {missing[:5]}")
        return rows

    def host_fn(self) -> Callable[[dict], dict]:
        def fn(batch: dict) -> dict:
            return {**batch,
                    "pixel_u8": self.bank[self.rows_for(batch["image_ids"])]}
        return fn


class U8MemmapStore:
    """Catalog-scale decode-once image store: a disk-resident uint8 memmap
    of every image, resized, keyed by image_id.

    The missing tier between :class:`HBMImageBank` (device HBM, ~13k images
    at 518²/16 GB) and :class:`DecodedU8Cache` (host RAM dict, rebuilt every
    process): the full 240k-image CXR catalog at 518² is ~193 GB of u8 — too
    big for either — but decodes ONCE into a memmap file; every subsequent
    epoch/process serves batches by page-cached reads (microseconds/row warm)
    instead of the measured ~54 img/s/core JPEG decode that capped streaming
    at 11 samples/s/chip (BENCH_r02 e2e_jpeg_decode_per_step). The reference
    re-pays PIL decode + HF processor per sample per epoch in DataLoader
    workers (training_duett/data_processing.py:386-391).

    Layout: ``{path}.ids.npy`` (sorted image ids) + ``{path}.u8`` (memmap
    [n, side, side, 3]). ``build`` is resumable: a ``{path}.meta.json``
    records side + a content fingerprint of the id set; an existing store
    with a matching fingerprint is reused, a mismatched one rejected.

    Reads release the GIL inside numpy, so gathers are parallelized across
    ``n_threads`` for cold-cache (disk-bound) batches.
    """

    def __init__(self, path: str, ids: np.ndarray, side: int,
                 mmap: np.ndarray, n_threads: int = 4):
        self.path = path
        self.ids = ids
        self.side = side
        self._mm = mmap
        self.n_threads = n_threads

    # ---- build / open -----------------------------------------------------
    @staticmethod
    def _meta(path):
        return f"{path}.meta.json", f"{path}.ids.npy", f"{path}.u8"

    @classmethod
    def build(cls, store: JpegStore, image_ids: np.ndarray, side: int,
              path: str, n_threads: int = 4, chunk: int = 256,
              progress: Optional[Callable[[int, int], None]] = None
              ) -> "U8MemmapStore":
        """Decode every image once into the memmap; reuse if already built."""
        import hashlib
        import json
        ids = np.unique(np.asarray(image_ids)).astype(np.int64)
        fp = hashlib.sha256(ids.tobytes() + str(side).encode()).hexdigest()
        meta_p, ids_p, data_p = cls._meta(path)
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == fp and meta.get("complete"):
                return cls.open(path, n_threads=n_threads)
            if meta.get("fingerprint") != fp:
                raise ValueError(
                    f"existing u8 store at {path} was built for a different "
                    f"image set/side — delete it or use another path")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(ids_p, ids)
        n = len(ids)
        mm = np.lib.format.open_memmap(
            data_p, mode="w+", dtype=np.uint8, shape=(n, side, side, 3))
        with open(meta_p, "w") as f:
            json.dump({"fingerprint": fp, "side": side, "n": n,
                       "complete": False}, f)
        for i in range(0, n, chunk):
            blobs = [store.get(j) for j in ids[i:i + chunk]]
            mm[i:i + len(blobs)] = decode_batch_u8(blobs, side, n_threads)
            if progress is not None:
                progress(min(i + chunk, n), n)
        mm.flush()
        with open(meta_p, "w") as f:
            json.dump({"fingerprint": fp, "side": side, "n": n,
                       "complete": True}, f)
        return cls(path, ids, side, mm, n_threads)

    @classmethod
    def open(cls, path: str, n_threads: int = 4) -> "U8MemmapStore":
        import json
        meta_p, ids_p, data_p = cls._meta(path)
        with open(meta_p) as f:
            meta = json.load(f)
        if not meta.get("complete"):
            raise ValueError(f"u8 store at {path} is incomplete — rebuild")
        ids = np.load(ids_p)
        mm = np.load(data_p, mmap_mode="r")
        return cls(path, ids, int(meta["side"]), mm, n_threads)

    # ---- serving ----------------------------------------------------------
    def rows_for(self, image_ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(image_ids, np.int64)
        rows = np.searchsorted(self.ids, ids)
        rows = np.clip(rows, 0, len(self.ids) - 1)
        if not (self.ids[rows] == ids).all():
            missing = ids[self.ids[rows] != ids]
            raise KeyError(f"image ids not in u8 store: {missing[:5]}")
        return rows.astype(np.int64)

    def get_batch(self, image_ids: np.ndarray) -> np.ndarray:
        """[B] ids → [B, side, side, 3] uint8 (parallel gather)."""
        rows = self.rows_for(image_ids)
        out = np.empty((len(rows), self.side, self.side, 3), np.uint8)
        if self.n_threads <= 1 or len(rows) < 8:
            out[:] = self._mm[rows]
            return out
        from concurrent.futures import ThreadPoolExecutor
        nt = min(self.n_threads, len(rows))
        spans = np.array_split(np.arange(len(rows)), nt)

        def fill(span):
            out[span] = self._mm[rows[span]]

        with ThreadPoolExecutor(nt) as ex:
            list(ex.map(fill, spans))
        return out

    def host_fn(self) -> Callable[[dict], dict]:
        """Prefetch hook: attach ``pixel_u8``; the [0,1]+mean/std
        normalization fuses into the jitted step on device
        (engine.default_image_source)."""
        def fn(batch: dict) -> dict:
            return {**batch, "pixel_u8": self.get_batch(batch["image_ids"])}
        return fn


class HBMImageBank:
    """The whole image set decoded ONCE and resident in device HBM as uint8;
    the jitted step gathers rows and fuses [0,1]+mean/std normalization.

    Eliminates per-step host image work AND host→device image transfer
    entirely (the u8 streaming path still ships 3·side²·B bytes per step —
    ~51 MB at batch 64 — which bounds e2e throughput on slow interconnects
    and few-core hosts). At 518² a u8 image is ~0.8 MB, so the reference
    cohort's ~13k-anchor train split fits in ~10.5 GB of a v5e's 16 GB HBM
    next to the 86M-param model; the bank gates on an explicit budget and
    the caller falls back to streaming when it doesn't fit.

    Per-step host work that remains: an id→row ``searchsorted`` over the
    batch (microseconds).
    """

    def __init__(self, store: JpegStore, image_ids: np.ndarray,
                 side: int = 518, n_threads: int = 4, chunk: int = 256,
                 device_put: Optional[Callable] = None):
        import jax
        self.side = side
        self.ids = np.unique(np.asarray(image_ids)).astype(np.int64)
        n = len(self.ids)
        bank = np.empty((n, side, side, 3), np.uint8)
        for i in range(0, n, chunk):
            blobs = [store.get(j) for j in self.ids[i:i + chunk]]
            bank[i:i + len(blobs)] = decode_batch_u8(blobs, side, n_threads)
        self.bank = (device_put or jax.device_put)(bank)

    @staticmethod
    def nbytes(n_images: int, side: int = 518) -> int:
        return int(n_images) * 3 * side * side

    def rows_for(self, image_ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(image_ids, np.int64)
        rows = np.searchsorted(self.ids, ids)
        rows = np.clip(rows, 0, len(self.ids) - 1)
        if not (self.ids[rows] == ids).all():
            missing = ids[self.ids[rows] != ids]
            raise KeyError(f"image ids not in HBM bank: {missing[:5]}")
        return rows.astype(np.int32)

    def host_fn(self) -> Callable[[dict], dict]:
        """Batch hook: rewrite ``image_ids`` to bank-row indices."""
        def fn(batch: dict) -> dict:
            return {**batch, "image_ids": self.rows_for(batch["image_ids"])}
        return fn

    def image_source(self) -> Callable[[dict], "np.ndarray"]:
        """Device-side gather + fused normalization for the jitted step."""
        import jax.numpy as jnp
        bank = self.bank

        def source(batch):
            u8 = bank[batch["image_ids"]]
            from ..models.vit import normalize_image
            return normalize_image(u8.astype(jnp.float32) / 255.0)
        return source
