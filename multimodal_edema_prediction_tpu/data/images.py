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
