"""Teacher loop on the REAL-image path: JPEG store → batch hook decode →
prefetched batches → full training loop incl. evaluation and best-ckpt test."""
import io

import numpy as np
import pytest
from PIL import Image

from multimodal_edema_prediction_tpu.config import (DataConfig, DuettConfig,
                                                    OptimConfig,
                                                    PerceiverConfig,
                                                    TeacherConfig, TrainConfig,
                                                    ViTConfig)
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.images import JpegStore
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
@pytest.mark.parametrize("image_bank", ["hbm", "stream"])
def test_teacher_loop_with_jpeg_store(tmp_path, image_bank):
    """Both real-image feeding modes through the FULL loop: the
    HBM-resident uint8 bank (production default when the set fits) and the
    per-step streaming host decode fallback."""
    ds = S.make_synthetic(seed=0, n_subjects=100, n_stays=250, n_variables=8,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    ads = P.build_anchor_dataset(ds, meta, DataConfig())

    rng = np.random.default_rng(0)
    blobs = {}
    for img_id in np.unique(ads.anchor["image_ids"]):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        blobs[int(img_id)] = buf.getvalue()

    cfg = TrainConfig(batch_size=32, epochs=1, patience=1, dtype="float32",
                      optim=OptimConfig(lr=1e-3, warmup_steps=5))
    res = train_teacher(ads, TINY, cfg, str(tmp_path),
                        DataConfig().pathology_labels,
                        jpeg_store=JpegStore(blobs=blobs),
                        prefetch_depth=2, image_bank=image_bank)
    assert np.isfinite(res.best_metric)
    assert np.isfinite(res.test_metrics["main_auroc"])
