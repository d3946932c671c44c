"""Device prefetcher: ordering, completeness, host_fn, error propagation."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.data.prefetch import prefetch
from multimodal_edema_prediction_tpu.parallel import mesh as meshlib


def _batches(n, bs=8):
    for i in range(n):
        yield {"x": np.full((bs, 3), i, np.float32),
               "i": np.full((bs,), i, np.int32)}


def test_prefetch_preserves_order_and_count():
    mesh = meshlib.create_mesh()
    out = list(prefetch(_batches(10), mesh, depth=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert int(np.asarray(b["i"])[0]) == i
        assert b["x"].sharding is not None


def test_prefetch_host_fn_runs_in_worker():
    mesh = meshlib.create_mesh()
    out = list(prefetch(_batches(4), mesh, depth=2,
                        host_fn=lambda b: {**b, "x": b["x"] * 2}))
    assert float(np.asarray(out[3]["x"])[0, 0]) == 6.0


def test_prefetch_propagates_errors():
    mesh = meshlib.create_mesh()

    def bad():
        yield {"x": np.zeros((8, 2), np.float32)}   # divisible by 8 devices
        raise ValueError("boom")

    it = prefetch(bad(), mesh)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)
