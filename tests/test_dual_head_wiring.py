"""Dual-mode teacher with a pretrained CXR head: loading, label re-indexing
(keep_idx), frozen-head training through the loop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.train.checkpoint import (load_checkpoint,
                                                              save_checkpoint)
from multimodal_edema_prediction_tpu.train.teacher_loop import train_teacher

LABELS = DataConfig().pathology_labels


@pytest.mark.slow
def test_dual_mode_with_permuted_head_labels(tmp_path):
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    ads = P.build_anchor_dataset(ds, meta, DataConfig())

    # head checkpoint with PERMUTED label order (exercises keep_idx)
    d_img = 32
    perm = list(LABELS[::-1])
    rng = np.random.default_rng(0)
    head_params = {"linear": {
        "kernel": jnp.asarray(rng.normal(size=(d_img, len(perm)))
                              .astype(np.float32)),
        "bias": jnp.zeros(len(perm))}}
    head_path = str(tmp_path / "head.msgpack")
    save_checkpoint(head_path, head_params, {}, 0, 0.6,
                    config={"label_cols": perm, "num_classes": len(perm),
                            "kind": "cxr_linear_head"})

    cfg = TeacherConfig(
        duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                          d_embedding=8, n_layers=1, d_feedforward=32,
                          d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
        vit=ViTConfig(image_size=56, patch_size=14, d_model=d_img,
                      n_layers=1, n_heads=2, d_feedforward=64),
        perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                                  head_hidden=16),
        perceiver_type="dual")
    tcfg = TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                       optim=OptimConfig(lr=1e-3, warmup_steps=5))
    res = train_teacher(ads, cfg, tcfg, str(tmp_path / "run"), LABELS,
                        pretrained_head_ckpt=head_path)
    assert np.isfinite(res.best_metric)

    # the frozen head weights must be bit-identical after training
    ck = load_checkpoint(res.best_path)
    np.testing.assert_array_equal(
        np.asarray(ck["params"]["pretrained_cxr_head"]["linear"]["kernel"]),
        np.asarray(head_params["linear"]["kernel"]))
