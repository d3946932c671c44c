"""Multi-host utilities degrade correctly to single-process behavior."""
import numpy as np

from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
from multimodal_edema_prediction_tpu.parallel.multihost import (
    gather_metrics, global_batch_from_local, initialize_distributed,
    is_main_process)


def test_single_process_no_ops():
    initialize_distributed(num_processes=1)
    assert is_main_process()
    np.testing.assert_array_equal(gather_metrics(np.arange(3)), np.arange(3))


def test_global_batch_from_local_single_process():
    mesh = meshlib.create_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = global_batch_from_local(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert len(out["x"].sharding.device_set) == 8
