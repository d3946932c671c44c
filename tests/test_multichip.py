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


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_full_size_teacher_step_aot_lowers_on_8dev_mesh():
    """AOT-lower (no execute) the FULL-SIZE teacher training step — 34-var
    DuETT + ViT-B/14 @ 518 — on the 8-device data×model mesh, closing the
    blind spot of the tiny-config dryrun (a sharding-spec mistake that only
    manifests at real dims would otherwise ship). Lower-only keeps this fast:
    tracing builds the whole fwd+bwd+update jaxpr with the production
    shardings attached, without paying a full-size CPU compile/execute."""
    import jax.numpy as jnp
    from multimodal_edema_prediction_tpu.config import (TeacherConfig,
                                                        TrainConfig)
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    from multimodal_edema_prediction_tpu.parallel.mesh import param_spec
    from multimodal_edema_prediction_tpu.train import engine
    from multimodal_edema_prediction_tpu.train.optim import make_optimizer
    from multimodal_edema_prediction_tpu.train.state import TrainState
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        make_synthetic_image_source, teacher_frozen_prefixes)

    mesh = meshlib.create_mesh(4, 2)
    cfg = TeacherConfig()                    # FULL size, no tiny shortcut
    tcfg = TrainConfig(batch_size=16, dtype="bfloat16")
    model = TeacherModel(cfg)
    T, V, D = cfg.duett.n_timesteps, cfg.duett.n_variables, cfg.duett.d_static
    B, K, S = tcfg.batch_size, cfg.perceiver.n_pathologies, cfg.vit.image_size

    # abstract init (no execution), then zero-materialize + production shard
    x_in = jnp.zeros((2, T, 2 * V + 1), jnp.float32)
    abstract = jax.eval_shape(
        lambda r: model.init(r, x_in, jnp.zeros((2, D), jnp.float32),
                             jnp.zeros((2, T), jnp.float32),
                             jnp.zeros((2, S, S, 3), jnp.float32)),
        jax.random.key(0))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)
    tx = make_optimizer(tcfg.optim, total_steps=100,
                        frozen_prefixes=teacher_frozen_prefixes(cfg))
    with mesh:
        params = meshlib.shard_params(variables["params"], mesh)
        state = TrainState.create(params, variables["batch_stats"], tx)
        step = engine.make_teacher_step(
            model, tcfg, cfg.duett, T, np.ones(K, np.float32),
            dtype=jnp.bfloat16,
            image_source=make_synthetic_image_source(S))
        rep = meshlib.replicated(mesh)
        grid = jax.device_put(np.zeros((8, T + 8, 2 * V), np.float32), rep)
        static = jax.device_put(np.zeros((8, D), np.float32), rep)
        batch = meshlib.shard_batch({
            "stay_rows": np.zeros(B, np.int32),
            "slot_idx": np.full(B, T, np.int32),
            "image_ids": np.arange(B, dtype=np.int32),
            "y": np.zeros(B, np.float32),
            "y_multi": np.zeros((B, K), np.float32),
            "y_multi_mask": np.ones((B, K), np.float32),
            "bin_ends": np.broadcast_to(
                (np.arange(1, T + 1) / 24.0).astype(np.float32),
                (B, T)).copy(),
        }, mesh)
        lowered = step.lower(state, grid, static, batch, jax.random.key(1))

    # every param carries exactly the spec the TP rules prescribe
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    from jax.sharding import NamedSharding
    n_tp = 0
    for path_entries, leaf in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in path_entries)
        want = param_spec(path, leaf)
        assert leaf.sharding == NamedSharding(mesh, want), path
        if want != jax.sharding.PartitionSpec():
            n_tp += 1
    assert n_tp >= 48          # 12 ViT blocks × (qkv+out+mlp_in/out) kernels

    # the lowered module must carry the sharding annotations through
    text = lowered.as_text()
    assert "mhlo.sharding" in text or "sdy.sharding" in text
    # batch stays data-sharded in the lowered signature
    assert batch["y_multi"].sharding.spec == jax.sharding.PartitionSpec("data")


@pytest.mark.slow   # >30 s on the 1-core host (VERDICT r3 item 4)
def test_cached_feature_step_runs_on_8dev_mesh():
    """The encode-once tier under DP×TP: token bank replicated across the
    mesh, batch data-sharded — one executed train step with finite loss
    (tiny dims so the CPU compile stays fast)."""
    import jax.numpy as jnp
    from multimodal_edema_prediction_tpu.config import (DuettConfig,
                                                        PerceiverConfig,
                                                        TeacherConfig,
                                                        TrainConfig,
                                                        ViTConfig)
    from multimodal_edema_prediction_tpu.data import features as F
    from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
    from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
    from multimodal_edema_prediction_tpu.train import engine
    from multimodal_edema_prediction_tpu.train.optim import make_optimizer
    from multimodal_edema_prediction_tpu.train.state import TrainState
    from multimodal_edema_prediction_tpu.train.teacher_loop import (
        init_teacher, teacher_frozen_prefixes)

    cfg = TeacherConfig(
        duett=DuettConfig(n_variables=6, n_timesteps=24, d_embedding=8,
                          n_layers=1, d_feedforward=16,
                          d_hidden_mlp_embedding=8, d_hidden_tab_encoder=8),
        vit=ViTConfig(image_size=28, patch_size=14, d_model=16, n_layers=1,
                      n_heads=2, d_feedforward=32),
        perceiver=PerceiverConfig(d_latent=16, n_heads=2, head_hidden=8))
    tcfg = TrainConfig(batch_size=16, dtype="float32")
    mesh = meshlib.create_mesh(4, 2)
    model = TeacherModel(cfg)
    T, V, D = cfg.duett.n_timesteps, cfg.duett.n_variables, cfg.duett.d_static
    B, K, S = tcfg.batch_size, cfg.perceiver.n_pathologies, cfg.vit.image_size
    rng = np.random.default_rng(0)
    n_img = 8
    variables = init_teacher(model, cfg, B, T, jax.random.key(0))
    tx = make_optimizer(tcfg.optim, total_steps=10,
                        frozen_prefixes=teacher_frozen_prefixes(cfg))
    with mesh:
        rep = meshlib.replicated(mesh)
        params = meshlib.shard_params(variables["params"], mesh)
        state = TrainState.create(params, variables["batch_stats"], tx)
        pix = rng.random((n_img, S, S, 3)).astype(np.float32)
        encode = F.encode_fn_for_teacher(model, params, jnp.float32)
        bank = F.CXRFeatureBank.build(
            encode, lambda ids: pix[np.asarray(ids)], np.arange(n_img),
            chunk=4, out_dtype=np.float32,
            device_put=lambda a: jax.device_put(a, rep))
        step = engine.make_teacher_step(
            model, tcfg, cfg.duett, T, np.ones(K, np.float32),
            dtype=jnp.float32, feature_source=bank.feature_source())
        grid = jax.device_put(
            rng.normal(size=(8, T + 8, 2 * V)).astype(np.float32), rep)
        static = jax.device_put(
            rng.normal(size=(8, D)).astype(np.float32), rep)
        batch = meshlib.shard_batch({
            "stay_rows": rng.integers(0, 8, B).astype(np.int32),
            "slot_idx": np.full(B, T, np.int32),
            "image_ids": (np.arange(B) % n_img).astype(np.int32),
            "y": rng.integers(0, 2, B).astype(np.float32),
            "y_multi": rng.integers(0, 2, (B, K)).astype(np.float32),
            "y_multi_mask": np.ones((B, K), np.float32),
            "bin_ends": np.broadcast_to(
                (np.arange(1, T + 1) / 24.0).astype(np.float32),
                (B, T)).copy(),
        }, mesh)
        state, out = step(state, grid, static, batch, jax.random.key(1))
        assert np.isfinite(float(out["total"]))
        # bank rows stay replicated; batch stays data-sharded
        assert batch["y_multi"].sharding.spec == \
            jax.sharding.PartitionSpec("data")
