"""Orbax checkpoint backend: async save/restore round trip + retention."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_edema_prediction_tpu.train.orbax_io import (make_manager,
                                                            restore_state,
                                                            save_state)
from multimodal_edema_prediction_tpu.train.state import TrainState


def _state(scale=1.0):
    params = {"w": jnp.full((4, 2), scale), "b": jnp.zeros(2)}
    tx = optax.adam(1e-2)
    return TrainState.create(params, {"bn": jnp.ones(2) * scale}, tx)


def test_orbax_round_trip_and_retention(tmp_path):
    mgr = make_manager(str(tmp_path), max_to_keep=2)
    for step in range(4):
        st = _state(scale=float(step))
        st = st.replace(step=jnp.asarray(step, jnp.int32))
        save_state(mgr, step, st)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 3
    assert len(mgr.all_steps()) == 2      # retention

    restored = restore_state(mgr, _state())
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.full((4, 2), 3.0))
    np.testing.assert_allclose(np.asarray(restored.batch_stats["bn"]),
                               np.ones(2) * 3.0)
    assert int(restored.step) == 3
    # optimizer state restored with matching structure
    assert jax.tree.structure(restored.opt_state) == \
        jax.tree.structure(_state().opt_state)
    mgr.close()
