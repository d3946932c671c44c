"""Encode-once frozen-ViT feature cache (data/features.py).

Proves the tier is a pure optimization: cached-token steps produce the same
logits, losses, and parameter updates as pixel steps (the CXR branch is
frozen + stop-gradient, so no gradient ever reaches the cached tensors), and
the loop-level path trains to the same metric.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import features as F
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
from multimodal_edema_prediction_tpu.models.vit import DinoViT
from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
from multimodal_edema_prediction_tpu.train import engine
from multimodal_edema_prediction_tpu.train.optim import make_optimizer
from multimodal_edema_prediction_tpu.train.state import TrainState
from multimodal_edema_prediction_tpu.train.teacher_loop import (
    init_teacher, make_synthetic_image_source, teacher_frozen_prefixes,
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


def _setup(rng, batch_size=8):
    T, V, D = (TINY.duett.n_timesteps, TINY.duett.n_variables,
               TINY.duett.d_static)
    K = TINY.perceiver.n_pathologies
    Ssz = TINY.vit.image_size
    model = TeacherModel(TINY)
    variables = init_teacher(model, TINY, batch_size, T, jax.random.key(0))
    pixels = rng.random((N_IMG, Ssz, Ssz, 3)).astype(np.float32)
    n_stays, L = 16, 48
    grid = jnp.asarray(rng.normal(size=(n_stays, L, 2 * V))
                       .astype(np.float32))
    static = jnp.asarray(rng.normal(size=(n_stays, D)).astype(np.float32))
    batch = {
        "stay_rows": jnp.asarray(
            rng.integers(0, n_stays, batch_size).astype(np.int32)),
        "slot_idx": jnp.full((batch_size,), T, jnp.int32),
        "image_ids": jnp.asarray(
            (np.arange(batch_size) % N_IMG).astype(np.int32)),
        "y": jnp.asarray(rng.integers(0, 2, batch_size).astype(np.float32)),
        "y_multi": jnp.asarray(
            rng.integers(0, 2, (batch_size, K)).astype(np.float32)),
        "y_multi_mask": jnp.ones((batch_size, K), jnp.float32),
        "bin_ends": jnp.broadcast_to(jnp.arange(1, T + 1) / 24.0,
                                     (batch_size, T)),
    }
    return model, variables, pixels, grid, static, batch


def _bank(model, variables, pixels):
    encode = F.encode_fn_for_teacher(model, variables["params"],
                                     jnp.float32)
    return F.CXRFeatureBank.build(
        encode, lambda ids: pixels[np.asarray(ids)],
        np.arange(N_IMG), chunk=5, out_dtype=np.float32), encode


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_bank_gather_matches_direct_encode(rng):
    model, variables, pixels, *_ = _setup(rng)
    bank, encode = _bank(model, variables, pixels)
    ids = np.array([3, 0, 7], np.int32)
    cls_direct, patch_direct = encode(jnp.asarray(pixels[ids]))
    cls_b, patch_b = bank.feature_source()({"image_ids": jnp.asarray(ids)})
    np.testing.assert_allclose(np.asarray(cls_b), np.asarray(cls_direct),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(patch_b),
                               np.asarray(patch_direct), atol=1e-6)
    # host-side validation raises on unknown ids
    with pytest.raises(KeyError):
        bank.rows_for(np.array([N_IMG + 5]))


def test_out_of_range_id_nan_poisons(rng):
    model, variables, pixels, *_ = _setup(rng)
    bank, _ = _bank(model, variables, pixels)
    cls_b, patch_b = bank.feature_source()(
        {"image_ids": jnp.asarray(np.array([0, N_IMG + 3], np.int32))})
    assert np.isfinite(np.asarray(cls_b[0])).all()
    assert np.isnan(np.asarray(cls_b[1])).all()
    assert np.isnan(np.asarray(patch_b[1])).all()


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_eval_and_train_step_parity_cached_vs_pixels(rng):
    """Same batch, same rng: the cached-feature step must reproduce the
    pixel step's logits AND parameter update (f32 storage → exact up to
    compile-order float noise)."""
    model, variables, pixels, grid, static, batch = _setup(rng)
    bank, _ = _bank(model, variables, pixels)
    bank_src = make_pixel_bank_source(pixels)
    tcfg = TrainConfig(batch_size=8, dtype="float32",
                       optim=OptimConfig(lr=1e-3, warmup_steps=2))
    T = TINY.duett.n_timesteps
    lw = np.ones(TINY.perceiver.n_pathologies, np.float32)

    # ---- eval parity
    ev_px = engine.make_teacher_eval(model, T, jnp.float32, bank_src)
    ev_ft = engine.make_teacher_eval(model, T, jnp.float32,
                                     feature_source=bank.feature_source())
    o_px = ev_px(variables["params"], variables["batch_stats"], grid,
                 static, batch)
    o_ft = ev_ft(variables["params"], variables["batch_stats"], grid,
                 static, batch)
    np.testing.assert_allclose(np.asarray(o_ft["fusion_logits"]),
                               np.asarray(o_px["fusion_logits"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_ft["img_logits"]),
                               np.asarray(o_px["img_logits"]), atol=2e-5)

    # ---- train-step parity (losses + updated params)
    tx = make_optimizer(tcfg.optim, total_steps=10,
                        frozen_prefixes=teacher_frozen_prefixes(TINY))
    step_px = engine.make_teacher_step(model, tcfg, TINY.duett, T, lw, None,
                                       jnp.float32, bank_src)
    step_ft = engine.make_teacher_step(
        model, tcfg, TINY.duett, T, lw, None, jnp.float32,
        feature_source=bank.feature_source())
    rng_step = jax.random.key(7)
    # steps donate their state: give each its own buffers
    fresh = lambda t: jax.tree.map(lambda a: jnp.array(a), t)  # noqa: E731
    s_px = TrainState.create(fresh(variables["params"]),
                             fresh(variables["batch_stats"]), tx)
    s_ft = TrainState.create(fresh(variables["params"]),
                             fresh(variables["batch_stats"]), tx)
    s_px, m_px = step_px(s_px, grid, static, batch, rng_step)
    s_ft, m_ft = step_ft(s_ft, grid, static, batch, rng_step)
    np.testing.assert_allclose(float(m_ft["total"]), float(m_px["total"]),
                               rtol=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64)
                                         - np.asarray(b, np.float64)))),
        s_ft.params, s_px.params)
    assert max(jax.tree.leaves(diffs)) < 1e-5, diffs


def make_pixel_bank_source(pixels):
    """Deterministic pixel source keyed by image id (no augmentation)."""
    bank = jnp.asarray(pixels)

    def src(batch):
        return bank[batch["image_ids"]]
    return src


def test_host_store_memmap_roundtrip(rng, tmp_path):
    model, variables, pixels, *_ = _setup(rng)
    encode = F.encode_fn_for_teacher(model, variables["params"], jnp.float32)
    path = str(tmp_path / "feat")
    st = F.HostFeatureStore.build(encode, lambda ids: pixels[np.asarray(ids)],
                                  np.arange(N_IMG), chunk=5, path=path,
                                  out_dtype=np.float32)
    st2 = F.HostFeatureStore.open(path)
    ids = np.array([1, 9, 4])
    c1, p1 = st.get_batch(ids)
    c2, p2 = st2.get_batch(ids)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(p1, p2)
    # prefetch hook attaches token keys consumed by features_from_batch
    b = st2.host_fn()({"image_ids": ids})
    assert b["cxr_cls"].shape == (3, TINY.vit.d_model)
    cls, patches = F.features_from_batch(b)
    np.testing.assert_array_equal(np.asarray(cls), c2)
    # a different id set at the same path is rejected, matching ids reopen
    with pytest.raises(ValueError):
        F.HostFeatureStore.build(encode,
                                 lambda ids: pixels[np.asarray(ids)],
                                 np.arange(N_IMG - 2), path=path)


def test_feature_cache_requires_frozen_cxr(rng, tmp_path):
    ds = S.make_synthetic(seed=0, n_subjects=30, n_stays=60, n_variables=8,
                          min_len=26, max_len=40)
    dcfg = DataConfig()
    meta = P.meta_from_events(ds, dcfg)
    anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)
    cfg = TINY.replace(freeze_cxr=False)
    tcfg = TrainConfig(batch_size=8, epochs=1, dtype="float32")
    with pytest.raises(ValueError, match="freeze_cxr"):
        train_teacher(anchor_ds, cfg, tcfg, str(tmp_path / "r"),
                      dcfg.pathology_labels, feature_cache="auto")


@pytest.mark.slow
def test_teacher_loop_feature_cache_matches_pixel_path(tmp_path):
    """Full train_teacher with feature_cache='hbm' reaches the same val/test
    metrics as the pixel path (same seeds; f32 storage; aug off)."""
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=260, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    dcfg = DataConfig()
    meta = P.meta_from_events(ds, dcfg)
    tcfg = TrainConfig(batch_size=16, epochs=2, patience=3, dtype="float32",
                       optim=OptimConfig(lr=2e-3, warmup_steps=10,
                                         weight_decay=1e-4))

    def run(feature_cache, sub):
        anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)
        model = TeacherModel(TINY)
        variables = init_teacher(model, TINY, tcfg.batch_size,
                                 anchor_ds.n_timesteps, jax.random.key(0))
        return train_teacher(anchor_ds, TINY, tcfg,
                             str(tmp_path / sub), dcfg.pathology_labels,
                             init_variables=variables,
                             feature_cache=feature_cache)

    r_px = run("none", "px")
    r_ft = run("hbm", "ft")
    assert abs(r_ft.best_metric - r_px.best_metric) < 2e-3, \
        (r_ft.best_metric, r_px.best_metric)
    assert abs(r_ft.test_metrics["main_auroc"]
               - r_px.test_metrics["main_auroc"]) < 2e-3


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_kd_step_with_cached_teacher_features(rng):
    """KD step: frozen teacher forward from cached tokens equals the pixel
    teacher forward (student update identical)."""
    from multimodal_edema_prediction_tpu.config import StudentConfig
    from multimodal_edema_prediction_tpu.models.student import StudentModel
    model, variables, pixels, grid, static, batch = _setup(rng)
    bank, _ = _bank(model, variables, pixels)
    scfg = StudentConfig(duett=TINY.duett)
    student = StudentModel(scfg)
    T = TINY.duett.n_timesteps
    sv = jax.jit(student.init)(
        {"params": jax.random.key(1)},
        np.zeros((8, T, 2 * TINY.duett.n_variables + 1), np.float32),
        np.zeros((8, TINY.duett.d_static), np.float32),
        np.zeros((8, T), np.float32))
    tcfg = TrainConfig(batch_size=8, dtype="float32",
                       optim=OptimConfig(lr=1e-3, warmup_steps=2))
    tx = make_optimizer(tcfg.optim, total_steps=10)
    bank_src = make_pixel_bank_source(pixels)
    kd_px = engine.make_kd_step(student, model, tcfg, TINY.duett, T,
                                jnp.float32, bank_src)
    kd_ft = engine.make_kd_step(student, model, tcfg, TINY.duett, T,
                                jnp.float32,
                                feature_source=bank.feature_source())
    fresh = lambda t: jax.tree.map(lambda a: jnp.array(a), t)  # noqa: E731
    s1 = TrainState.create(fresh(sv["params"]), fresh(sv["batch_stats"]), tx)
    s2 = TrainState.create(fresh(sv["params"]), fresh(sv["batch_stats"]), tx)
    r = jax.random.key(3)
    s1, m1 = kd_px(s1, variables["params"], variables["batch_stats"], grid,
                   static, batch, r)
    s2, m2 = kd_ft(s2, variables["params"], variables["batch_stats"], grid,
                   static, batch, r)
    np.testing.assert_allclose(float(m2["total"]), float(m1["total"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2["logits"]),
                               np.asarray(m1["logits"]), atol=2e-5)


def test_eval_from_windows_id_keyed_feature_source(rng):
    """Analysis path: batches carry RAW image ids (no row-rewriting hook);
    the id-keyed feature source resolves rows device-side and matches the
    pixel path; unknown ids NaN-poison."""
    model, variables, pixels, grid, static, batch = _setup(rng)
    # non-contiguous ids: id != row
    ids_raw = (np.arange(N_IMG) * 7 + 3).astype(np.int64)
    encode = F.encode_fn_for_teacher(model, variables["params"], jnp.float32)
    bank = F.CXRFeatureBank.build(
        encode, lambda ids: pixels[np.searchsorted(ids_raw,
                                                   np.asarray(ids))],
        ids_raw, chunk=5, out_dtype=np.float32)
    T = TINY.duett.n_timesteps
    B = 8
    x_ts = np.asarray(rng.normal(size=(B, T, 2 * TINY.duett.n_variables))
                      .astype(np.float32))
    x_static = np.asarray(rng.normal(size=(B, TINY.duett.d_static))
                          .astype(np.float32))
    wbatch = {
        "image_ids": jnp.asarray(ids_raw[np.arange(B) % N_IMG]
                                 .astype(np.int32)),
        "bin_ends": jnp.broadcast_to(jnp.arange(1, T + 1) / 24.0, (B, T)),
    }
    rows = np.searchsorted(ids_raw, np.asarray(wbatch["image_ids"]))
    px_batch = {**wbatch, "image_ids": jnp.asarray(rows.astype(np.int32))}
    ev_px = engine.make_teacher_eval_from_windows(
        model, jnp.float32, make_pixel_bank_source(pixels))
    ev_ft = engine.make_teacher_eval_from_windows(
        model, jnp.float32,
        feature_source=bank.feature_source(keyed_by_row=False))
    o_px = ev_px(variables["params"], variables["batch_stats"],
                 jnp.asarray(x_ts), jnp.asarray(x_static), px_batch)
    o_ft = ev_ft(variables["params"], variables["batch_stats"],
                 jnp.asarray(x_ts), jnp.asarray(x_static), wbatch)
    np.testing.assert_allclose(np.asarray(o_ft["fusion_logits"]),
                               np.asarray(o_px["fusion_logits"]), atol=2e-5)
    # unknown raw id → NaN logits
    bad = {**wbatch, "image_ids": wbatch["image_ids"].at[0].set(999999)}
    o_bad = ev_ft(variables["params"], variables["batch_stats"],
                  jnp.asarray(x_ts), jnp.asarray(x_static), bad)
    assert np.isnan(np.asarray(o_bad["img_logits"][0])).all()
    assert np.isfinite(np.asarray(o_bad["img_logits"][1:])).all()
