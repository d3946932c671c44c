"""Golden tests: our rank-based metrics must match sklearn exactly."""
import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from multimodal_edema_prediction_tpu.ops import metrics as M


@pytest.mark.parametrize("n,seed", [(37, 0), (500, 1), (1000, 2)])
def test_auroc_matches_sklearn(n, seed):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.3).astype(float)
    s = rng.normal(size=n)
    assert abs(M.auroc(y, s) - roc_auc_score(y, s)) < 1e-12


def test_auroc_with_ties():
    rng = np.random.default_rng(3)
    y = (rng.random(400) < 0.4).astype(float)
    s = rng.integers(0, 5, size=400).astype(float)  # heavy ties
    assert abs(M.auroc(y, s) - roc_auc_score(y, s)) < 1e-12


def test_auroc_degenerate_returns_nan():
    assert np.isnan(M.auroc(np.ones(10), np.random.rand(10)))
    assert np.isnan(M.auroc(np.zeros(10), np.random.rand(10)))


@pytest.mark.parametrize("n,seed", [(37, 0), (500, 1)])
def test_average_precision_matches_sklearn(n, seed):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.25).astype(float)
    s = rng.normal(size=n)
    assert abs(M.average_precision(y, s)
               - average_precision_score(y, s)) < 1e-12


def test_average_precision_ties_matches_sklearn():
    rng = np.random.default_rng(5)
    y = (rng.random(300) < 0.3).astype(float)
    s = rng.integers(0, 4, size=300).astype(float)
    assert abs(M.average_precision(y, s)
               - average_precision_score(y, s)) < 1e-12


def test_masked_multilabel_metrics():
    rng = np.random.default_rng(7)
    N, K = 200, 7
    y = (rng.random((N, K)) < 0.3).astype(float)
    mask = (rng.random((N, K)) < 0.8).astype(float)
    logits = rng.normal(size=(N, K))
    rows = M.masked_multilabel_metrics(y, mask, {"fus": logits})
    for k in range(K):
        m = mask[:, k].astype(bool)
        p = 1 / (1 + np.exp(-logits[m, k]))
        expected = roc_auc_score(y[m, k], p)
        assert abs(rows[k]["fus_auroc"] - expected) < 1e-12
    assert not np.isnan(M.macro_mean(rows, "fus_auroc"))
