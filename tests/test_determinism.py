"""Determinism: identical seeds → bit-identical training trajectories."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_edema_prediction_tpu.config import (DuettConfig,
                                                    StudentConfig, OptimConfig)
from multimodal_edema_prediction_tpu.models.student import StudentModel
from multimodal_edema_prediction_tpu.train import engine
from multimodal_edema_prediction_tpu.train.optim import make_optimizer
from multimodal_edema_prediction_tpu.train.state import TrainState
import pytest

CFG = StudentConfig(duett=DuettConfig(
    n_variables=6, n_timesteps=8, d_static=5, d_embedding=8, n_layers=1,
    d_feedforward=32, d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16,
    aug_noise=0.1, aug_mask=0.1))


def _run(seed, n_steps=3):
    rng = np.random.default_rng(0)
    model = StudentModel(CFG)
    x_in = jnp.zeros((4, 8, 13))
    variables = model.init({"params": jax.random.key(seed)}, x_in,
                           jnp.zeros((4, 5)), jnp.zeros((4, 8)))
    tx = make_optimizer(OptimConfig(lr=1e-3, warmup_steps=2), 10)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = engine.make_supervised_ts_step(model, CFG.duett, 8, jnp.float32)
    grid = jnp.array(rng.normal(size=(6, 12, 12)).astype(np.float32))
    static = jnp.array(rng.normal(size=(6, 5)).astype(np.float32))
    batch = {"stay_rows": jnp.arange(4, dtype=jnp.int32),
             "slot_idx": jnp.full((4,), 8, jnp.int32),
             "y": jnp.array([0., 1., 1., 0.]),
             "bin_ends": jnp.zeros((4, 8))}
    key = jax.random.key(seed + 1)
    losses = []
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        state, out = step(state, grid, static, batch, sub)
        losses.append(float(out["loss"]))
    return losses, jax.tree.map(np.asarray, state.params)


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_same_seed_bit_identical():
    l1, p1 = _run(7)
    l2, p2 = _run(7)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_different_seed_differs():
    l1, _ = _run(7)
    l2, _ = _run(8)
    assert l1 != l2
