"""'dual_patch_event' mode — the reference's event-attention perceiver.

The reference designed (but never committed) a newer perceiver API whose
attribute names its analysis suite dispatches on: ``event_query_proj`` /
``event_query_norm`` (grad_flow_diagnostics.py:563-571), an ``event_attn``
output rendered per clinical variable (visualize_pathology.py:291-339),
independent ``image_queries`` + ``temporal_queries`` banks
(grad_flow_diagnostics.py:70-90) and a ``ts_padding_mask`` kwarg
(smoke_test_trajectory_encoder.py:44). These tests pin this repo's
first-class implementation of that variant.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DuettConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, ViTConfig)
from multimodal_edema_prediction_tpu.models.perceiver import \
    EventPatchPerceiver

B, T, V, DE, K, DL = 3, 6, 5, 8, 4, 32


def _perceiver():
    return EventPatchPerceiver(PerceiverConfig(
        n_pathologies=K, d_latent=DL, n_heads=2, dropout=0.0,
        head_hidden=16, head_dropout=0.0))


def _inputs(seed=0):
    r = np.random.default_rng(seed)
    grid = jnp.asarray(r.normal(size=(B, T, V, DE)), jnp.float32)
    patches = jnp.asarray(r.normal(size=(B, 10, DL)), jnp.float32)
    return grid, patches


def test_shapes_and_event_attn():
    model = _perceiver()
    grid, patches = _inputs()
    vars_ = model.init(jax.random.key(0), grid, patches)
    out = model.apply(vars_, grid, patches, return_attn=True)
    assert out["fusion_logits"].shape == (B, K)
    assert out["img_logits"].shape == (B, K)
    assert out["ts_logits"].shape == (B, K)
    assert out["event_attn"].shape == (B, K, V)
    # attention rows are distributions over the V variable-trajectories
    np.testing.assert_allclose(np.asarray(out["event_attn"]).sum(-1),
                               np.ones((B, K)), rtol=1e-5)
    # the analysis-era attribute names live in the param tree
    ec = vars_["params"]["event_cross"]
    assert "event_query_proj" in ec and "event_query_norm" in ec
    assert "image_queries" in vars_["params"]
    assert "temporal_queries" in vars_["params"]


def test_zero_init_fusion_starts_at_image_anchor():
    model = _perceiver()
    grid, patches = _inputs()
    vars_ = model.init(jax.random.key(1), grid, patches)
    out = model.apply(vars_, grid, patches)
    # correction output layer is zero-init → fusion == img_logits at init
    np.testing.assert_allclose(np.asarray(out["fusion_logits"]),
                               np.asarray(out["img_logits"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["scaled_correction"]), 0.0,
                               atol=1e-6)


def test_padding_mask_zeroes_masked_variables():
    model = _perceiver()
    grid, patches = _inputs()
    vars_ = model.init(jax.random.key(2), grid, patches)
    mask = jnp.zeros((B, V), bool).at[:, -2:].set(True)
    out = model.apply(vars_, grid, patches, return_attn=True,
                      ts_padding_mask=mask)
    attn = np.asarray(out["event_attn"])
    assert (attn[:, :, -2:] < 1e-6).all()
    np.testing.assert_allclose(attn.sum(-1), np.ones((B, K)), rtol=1e-5)


def test_all_masked_sample_falls_back_to_uniform():
    model = _perceiver()
    grid, patches = _inputs()
    vars_ = model.init(jax.random.key(3), grid, patches)
    mask = jnp.zeros((B, V), bool).at[0].set(True)   # sample 0: no variables
    out = model.apply(vars_, grid, patches, return_attn=True,
                      ts_padding_mask=mask)
    attn = np.asarray(out["event_attn"])
    assert np.isfinite(attn).all()
    np.testing.assert_allclose(attn[0].sum(-1), np.ones((K,)), rtol=1e-5)


def test_masked_variable_does_not_affect_ts_branch():
    model = _perceiver()
    grid, patches = _inputs()
    vars_ = model.init(jax.random.key(4), grid, patches)
    mask = jnp.zeros((B, V), bool).at[:, 0].set(True)
    out1 = model.apply(vars_, grid, patches, ts_padding_mask=mask)
    grid2 = grid.at[:, :, 0, :].set(123.0)   # perturb only the masked var
    out2 = model.apply(vars_, grid2, patches, ts_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out1["ts_logits"]),
                               np.asarray(out2["ts_logits"]), atol=1e-5)


def _tiny_teacher_cfg():
    return TeacherConfig(
        duett=DuettConfig(n_variables=V, n_timesteps=T, d_static=6,
                          d_embedding=DE, n_layers=1, d_feedforward=32,
                          d_hidden_mlp_embedding=16,
                          d_hidden_tab_encoder=16),
        vit=ViTConfig(image_size=28, patch_size=14, d_model=32, n_layers=1,
                      n_heads=2, d_feedforward=64),
        perceiver=PerceiverConfig(n_pathologies=K, d_latent=DL, n_heads=2,
                                  dropout=0.0, head_hidden=16,
                                  head_dropout=0.0),
        perceiver_type="dual_patch_event")


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_teacher_dispatch_and_grid_gradients():
    """The event branch must carry gradients into the DuETT backbone through
    the psi grid (not just through hourly tokens)."""
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    cfg = _tiny_teacher_cfg()
    model = TeacherModel(cfg)
    r = np.random.default_rng(0)
    x_in = jnp.asarray(r.normal(size=(B, T, 2 * V + 1)), jnp.float32)
    # make counts nonneg with var 0 unobserved everywhere
    x_in = x_in.at[:, :, V:2 * V].set(
        jnp.abs(x_in[:, :, V:2 * V])).at[:, :, V].set(0.0)
    x_static = jnp.asarray(r.normal(size=(B, 6)), jnp.float32)
    times = jnp.asarray(np.tile(np.arange(1, T + 1), (B, 1)), jnp.float32)
    pixels = jnp.asarray(r.normal(size=(B, 28, 28, 3)), jnp.float32)
    vars_ = model.init(jax.random.key(0), x_in, x_static, times, pixels)

    out = model.apply(vars_, x_in, x_static, times, pixels, return_attn=True,
                      rngs={"dropout": jax.random.key(1)})
    assert out["event_attn"].shape == (B, K, V)
    # unobserved variable 0 is a padded key
    assert (np.asarray(out["event_attn"])[:, :, 0] < 1e-6).all()

    def loss(params):
        o = model.apply({"params": params,
                         **{k: v for k, v in vars_.items() if k != "params"}},
                        x_in, x_static, times, pixels, train=False)
        return (o["ts_logits"] ** 2).mean() + (o["fusion_logits"] ** 2).mean()

    g = jax.grad(loss)(vars_["params"])
    duett_norm = sum(float(jnp.linalg.norm(x))
                     for x in jax.tree.leaves(g["duett"]))
    assert np.isfinite(duett_norm) and duett_norm > 0.0
    ev_norm = sum(float(jnp.linalg.norm(x)) for x in jax.tree.leaves(
        g["perceiver"]["event_cross"]))
    assert ev_norm > 0.0


@pytest.mark.slow
def test_event_mode_trains_through_the_loop(tmp_path):
    """1-epoch tiny end-to-end run of train_teacher in dual_patch_event mode:
    finite losses and eval metrics, checkpoint written."""
    from multimodal_edema_prediction_tpu.config import (DataConfig,
                                                        OptimConfig,
                                                        TrainConfig)
    from multimodal_edema_prediction_tpu.data import pipeline as P
    from multimodal_edema_prediction_tpu.data import synthetic as S
    from multimodal_edema_prediction_tpu.train.teacher_loop import \
        train_teacher
    teacher_cfg = TeacherConfig(
        duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                          d_embedding=8, n_layers=1, d_feedforward=32,
                          d_hidden_mlp_embedding=16,
                          d_hidden_tab_encoder=16),
        vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                      n_heads=2, d_feedforward=64),
        perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                                  head_hidden=16),
        perceiver_type="dual_patch_event")
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    anchor_ds = P.build_anchor_dataset(ds, meta, DataConfig())
    cfg = TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                      optim=OptimConfig(lr=1e-3, warmup_steps=5))
    res = train_teacher(anchor_ds, teacher_cfg, cfg, str(tmp_path),
                        DataConfig().pathology_labels)
    assert np.isfinite(res.best_metric)
    assert np.isfinite(res.test_metrics["main_auroc"])
    assert res.best_path.endswith(".msgpack")

    # grad-flow diagnostics on the two-bank event layout (the reference's
    # _find_pathology_query_banks "independent" branch, :70-90, and the
    # event_query_proj geometry path, :563-571)
    from multimodal_edema_prediction_tpu.analysis import \
        grad_flow_diagnostics as G
    from multimodal_edema_prediction_tpu.analysis.common import load_teacher
    from multimodal_edema_prediction_tpu.train.teacher_loop import \
        make_synthetic_image_source
    model, cfg2, params, batch_stats, _ = load_teacher(res.best_path)
    r = G.run_diagnostics(model, params, batch_stats, anchor_ds,
                          make_synthetic_image_source(cfg2.vit.image_size),
                          split="val", batch_size=16, n_batches=1)
    assert r["query_layout"] == "independent"
    assert r["query_parameter"] == \
        "perceiver/image_queries+perceiver/temporal_queries"
    # residual fusion: the fusion loss cannot reach the pixels
    assert r["fus_px_input_grad"] < 1e-5
    assert r["ts_query_grad_norm"] > 0
    assert np.isfinite(r["query_geometry"]["image_ts_gram_gap"])
    for item in r["per_label"]:
        assert 0.0 <= item["img_own_query_fraction"] <= 1.0 + 1e-6
    ld = G.diagnostics_to_log_dict(r)
    assert all(np.isfinite(v) for v in ld.values())
