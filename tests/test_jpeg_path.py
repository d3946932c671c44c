"""Real-image path: JPEG store → prefetch host decode → teacher train step
consuming batch pixel_values (the production image pipeline, end to end)."""
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.images import (JpegStore,
                                                         make_jpeg_host_fn)
from multimodal_edema_prediction_tpu.data.prefetch import prefetch
from multimodal_edema_prediction_tpu.models.teacher import TeacherModel
from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
from multimodal_edema_prediction_tpu.train import engine
from multimodal_edema_prediction_tpu.train.optim import make_optimizer
from multimodal_edema_prediction_tpu.train.state import TrainState
from multimodal_edema_prediction_tpu.train.teacher_loop import (
    init_teacher, teacher_frozen_prefixes)

TINY = TeacherConfig(
    duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                  n_heads=2, d_feedforward=64),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                              head_hidden=16))


@pytest.mark.slow
def test_jpeg_prefetch_into_teacher_step():
    ds = S.make_synthetic(seed=0, n_subjects=60, n_stays=150, n_variables=8,
                          min_len=26, max_len=40)
    meta = P.meta_from_events(ds, DataConfig())
    ads = P.build_anchor_dataset(ds, meta, DataConfig())

    # synthesize a JPEG store covering the anchor image ids
    rng = np.random.default_rng(0)
    blobs = {}
    for img_id in np.unique(ads.anchor["image_ids"]):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        blobs[int(img_id)] = buf.getvalue()
    store = JpegStore(blobs=blobs)
    host_fn = make_jpeg_host_fn(store, side=56)

    model = TeacherModel(TINY)
    cfg = TrainConfig(batch_size=16, dtype="float32")
    variables = init_teacher(model, TINY, 16, 24, jax.random.key(0))
    tx = make_optimizer(cfg.optim, 10,
                        frozen_prefixes=teacher_frozen_prefixes(TINY))
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    mesh = meshlib.create_mesh()
    with mesh:
        # default image source = batch["pixel_values"] (real-image path)
        step = engine.make_teacher_step(model, cfg, TINY.duett, 24,
                                        np.ones(7, np.float32),
                                        dtype=jnp.float32)
        grid = jax.device_put(ads.grid, meshlib.replicated(mesh))
        static = jax.device_put(ads.static, meshlib.replicated(mesh))

        def batches():
            for b in ads.iter_batches("train", 16, shuffle=False, limit=3):
                b.pop("valid")
                yield b

        rng_key = jax.random.key(1)
        n = 0
        for dev_batch in prefetch(batches(), mesh, depth=2, host_fn=host_fn):
            assert dev_batch["pixel_values"].shape == (16, 56, 56, 3)
            rng_key, sub = jax.random.split(rng_key)
            state, out = step(state, grid, static, dev_batch, sub)
            n += 1
        assert n == 3
        assert np.isfinite(float(out["total"]))
        assert int(state.step) == 3


def test_bank_image_source_poisons_out_of_range_ids():
    """make_bank_image_source must not silently alias out-of-range ids
    (the old modulo path); bad ids poison the gathered rows with NaN so the
    loop's finite-loss guard trips immediately."""
    from multimodal_edema_prediction_tpu.train.teacher_loop import \
        make_bank_image_source
    bank = jnp.asarray(np.random.default_rng(0).random((4, 8, 8, 3),
                                                       np.float32))
    src = jax.jit(lambda b: make_bank_image_source(bank)(b))
    good = src({"image_ids": jnp.asarray([0, 3, 2])})
    assert np.isfinite(np.asarray(good)).all()
    np.testing.assert_allclose(np.asarray(good[1]), np.asarray(bank[3]))
    bad = src({"image_ids": jnp.asarray([0, 4, -1])})
    bad = np.asarray(bad)
    assert np.isfinite(bad[0]).all()
    assert np.isnan(bad[1]).all() and np.isnan(bad[2]).all()
