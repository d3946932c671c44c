"""Native C++ data-path ops: build + parity with the numpy path."""
import io

import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import DataConfig
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.native_loader import (
    decode_jpeg_batch_native, densify_events_native, gather_windows_native,
    load_native)

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def data():
    ds = S.make_synthetic(seed=0, n_subjects=30, n_stays=50, n_variables=8,
                          min_len=26, max_len=40)
    meta = P.meta_from_events(ds, DataConfig())
    return ds, meta


def test_densify_matches_numpy(data):
    ds, meta = data
    L = int(ds.events.stay_len.max())
    ref = P.densify_events(ds.events, meta, L)
    nat = densify_events_native(ds.events.offsets, ds.events.slot_idx,
                                ds.events.values, ds.events.counts,
                                meta.means, meta.stds, L)
    np.testing.assert_allclose(nat, ref, rtol=1e-6, atol=1e-6)


def test_gather_matches_numpy(data):
    ds, meta = data
    L = int(ds.events.stay_len.max())
    grid = P.densify_events(ds.events, meta, L)
    rng = np.random.default_rng(0)
    rows = rng.integers(0, grid.shape[0], 16).astype(np.int32)
    ends = rng.integers(24, L + 1, 16).astype(np.int32)
    nat = gather_windows_native(grid, rows, ends, 24)
    for i in range(16):
        np.testing.assert_array_equal(nat[i],
                                      grid[rows[i], ends[i] - 24:ends[i]])


def test_jpeg_decode_normalize():
    from PIL import Image
    rng = np.random.default_rng(0)
    blobs = []
    raws = []
    for _ in range(3):
        arr = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        blobs.append(buf.getvalue())
        raws.append(arr)
    mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
    out, status = decode_jpeg_batch_native(blobs, 56, mean, std)
    assert (status == 0).all()
    assert out.shape == (3, 56, 56, 3)
    # output statistics should match a PIL resize+normalize closely
    ref = np.asarray(Image.fromarray(raws[0]).resize((56, 56),
                                                     Image.BILINEAR),
                     np.float32) / 255.0
    ref = (ref - 0.5) / 0.25
    assert abs(out[0].mean() - ref.mean()) < 0.05


def test_corrupt_jpeg_sets_status():
    out, status = decode_jpeg_batch_native([b"not a jpeg"], 32,
                                           (0.5,) * 3, (0.25,) * 3)
    assert status[0] != 0
    assert (out[0] == 0).all()
