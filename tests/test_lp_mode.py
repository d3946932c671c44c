"""LP (correction-only linear probing) mode: only correction_head + beta
update; everything else stays bit-identical (reference trainer.py:169-210).
Also covers the aux-residual KL term in the teacher step."""
import jax
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.train.checkpoint import load_checkpoint
from multimodal_edema_prediction_tpu.train.teacher_loop import train_teacher

TINY = TeacherConfig(
    duett=DuettConfig(n_variables=8, n_timesteps=24, d_static=18,
                      d_embedding=8, n_layers=1, d_feedforward=32,
                      d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16),
    vit=ViTConfig(image_size=56, patch_size=14, d_model=32, n_layers=1,
                  n_heads=2, d_feedforward=64),
    perceiver=PerceiverConfig(n_pathologies=7, d_latent=32, n_heads=2,
                              dropout=0.1, head_hidden=16))


@pytest.mark.slow
def test_lp_updates_only_correction_and_beta(tmp_path):
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    ads = P.build_anchor_dataset(ds, meta, DataConfig())
    labels = DataConfig().pathology_labels

    # stage 1: normal training (with the aux residual KL term active)
    cfg1 = TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                       aux_residual_alpha=0.3,
                       optim=OptimConfig(lr=1e-3, warmup_steps=5))
    res1 = train_teacher(ads, TINY, cfg1, str(tmp_path / "s1"), labels)
    base = load_checkpoint(res1.best_path)["params"]

    # stage 2: LP from the stage-1 checkpoint
    cfg2 = TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                       optim=OptimConfig(lr=5e-3, warmup_steps=2))
    res2 = train_teacher(ads, TINY, cfg2, str(tmp_path / "s2"), labels,
                         lp_from=res1.best_path,
                         lp_beta_l2=1e-3, lp_corr_l2=1e-2)
    lp = load_checkpoint(res2.best_path)["params"]

    def max_diff(a, b):
        leaves_a = jax.tree.leaves(a)
        leaves_b = jax.tree.leaves(b)
        return max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
                   for x, y in zip(leaves_a, leaves_b))

    # trainable under LP: correction_head + beta must have moved
    assert max_diff(base["perceiver"]["correction_head"],
                    lp["perceiver"]["correction_head"]) > 0 or \
        max_diff({"b": base["perceiver"]["beta"]},
                 {"b": lp["perceiver"]["beta"]}) > 0
    # everything else: bit-identical
    for key in ("duett", "cxr", "img_proj"):
        assert max_diff(base[key], lp[key]) == 0.0, key
    for key in ("shared_queries", "image_head", "temporal_head",
                "img_cross", "ts_cross", "image_label_bias"):
        assert max_diff({"x": base["perceiver"][key]},
                        {"x": lp["perceiver"][key]}) == 0.0, key
