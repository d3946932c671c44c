"""End-to-end: TS-only supervised training on the 8-device CPU mesh must
learn (AUROC well above chance) with fixed shapes and early stopping."""
import jax
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig, StudentConfig,
                                                    TrainConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.train.loops import train_supervised_ts


@pytest.mark.slow
def test_supervised_ts_learns(tmp_path):
    assert len(jax.devices()) == 8
    ds = S.make_synthetic(seed=0, n_subjects=150, n_stays=500, n_variables=8,
                          min_len=26, max_len=48, obs_rate=0.5)
    dcfg = DataConfig()
    meta = P.meta_from_events(ds, dcfg)
    anchor_ds = P.build_anchor_dataset(ds, meta, dcfg)

    duett = DuettConfig(n_variables=8, n_timesteps=24,
                        d_static=1 + len(ds.onehot_names), d_embedding=8,
                        n_layers=1, d_feedforward=64,
                        d_hidden_mlp_embedding=16, d_hidden_tab_encoder=16)
    mcfg = StudentConfig(duett=duett, head_hidden=32)
    tcfg = TrainConfig(batch_size=32, epochs=6, patience=6, dtype="float32",
                       optim=OptimConfig(lr=1e-3, warmup_steps=20,
                                         weight_decay=1e-4))
    res = train_supervised_ts(anchor_ds, mcfg, tcfg, str(tmp_path / "run"))
    assert res.best_metric > 0.65, f"val AUROC {res.best_metric} ≤ 0.65"
    assert res.test_metrics["auroc"] > 0.60
    assert res.best_path.endswith(".msgpack")
    assert len(res.history) >= 1
