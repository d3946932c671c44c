"""Multi-chip sharding: the full teacher training step must compile and run
under DP×TP meshes on the virtual 8-device CPU backend (the driver's
dryrun_multichip covers this too; this keeps it continuously tested)."""
import importlib.util
import os
import sys

import jax
import numpy as np
import pytest


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [8, 4, 2])
def test_dryrun_multichip(n_devices):
    graft = _load_graft()
    graft.dryrun_multichip(n_devices)   # raises on failure


def test_param_spec_tp_rules():
    from jax.sharding import PartitionSpec as P
    from multimodal_edema_prediction_tpu.parallel.mesh import param_spec
    w = np.zeros((768, 3072))
    assert param_spec("cxr/block_0/mlp_in/kernel", w) == P(None, "model")
    assert param_spec("cxr/block_0/mlp_out/kernel", w.T) == P("model", None)
    assert param_spec("cxr/block_0/attn/q/kernel",
                      np.zeros((768, 768))) == P(None, "model")
    assert param_spec("duett/tab_encoder/in/kernel",
                      np.zeros((18, 128))) == P()


def test_batch_shards_across_data_axis():
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    mesh = meshlib.create_mesh(4, 2)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    dev = meshlib.shard_batch(batch, mesh)
    # split over data=4, replicated over model=2 → lives on all 8 devices,
    # with 4 distinct shards of 2 rows each
    assert len(dev["x"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in dev["x"].addressable_shards}
    assert shard_shapes == {(2, 4)}
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])
