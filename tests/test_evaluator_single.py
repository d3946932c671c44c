"""'single'-mode evaluator + gap table formatting."""
import jax
import numpy as np

from multimodal_edema_prediction_tpu.config import DataConfig
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.parallel import mesh as meshlib
from multimodal_edema_prediction_tpu.train.evaluator import (
    evaluate_pathology, format_pathology_gap_table)


def test_evaluate_pathology_and_table():
    ds = S.make_synthetic(seed=0, n_subjects=40, n_stays=80, n_variables=6,
                          min_len=26, max_len=40)
    meta = P.meta_from_events(ds, DataConfig())
    ads = P.build_anchor_dataset(ds, meta, DataConfig())
    K = 7
    rng = np.random.default_rng(0)

    def fake_eval_step(params, batch_stats, grid, static, batch):
        B = len(batch["stay_rows"])
        # stage4 correlates with the labels; stage2 is noise
        y = np.asarray(batch["y_multi"])
        return {"main_logit": np.zeros(B, np.float32),
                "stage2_logits": rng.normal(size=(B, K)).astype(np.float32),
                "stage4_logits": (2 * y - 1
                                  + rng.normal(size=(B, K)) * 0.5
                                  ).astype(np.float32)}

    mesh = meshlib.create_mesh()
    with mesh:
        result = evaluate_pathology(fake_eval_step, {}, {}, ads, "val", 16,
                                    mesh, DataConfig().pathology_labels)
    assert result["main_auroc"] > 0.8          # stage4 carries signal
    table = format_pathology_gap_table(result)
    assert "s2_auroc" in table and "label_edema" in table
    gaps = [r["gap_auroc"] for r in result["per_label"]
            if np.isfinite(r["gap_auroc"])]
    assert np.mean(gaps) > 0
