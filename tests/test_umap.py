"""In-tree UMAP (analysis/umap_impl.py) — structure preservation, determinism,
and the visualize_pathology projection path that consumes it.

The reference's analysis suite prefers ``umap.UMAP(n_components=2,
random_state=42)`` for its token projections
(``/root/reference/analysis/visualize_pathology.py:470-479``); the package
is absent here so the in-tree implementation must behave like it on the
surface the suite uses.
"""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.analysis import umap_impl


def _three_clusters(n_per=60, d=12, sep=12.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d))
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True) * sep
    x = np.concatenate([c + rng.normal(scale=1.0, size=(n_per, d))
                        for c in centers])
    y = np.repeat(np.arange(3), n_per)
    return x, y


def test_find_ab_params_matches_published_defaults():
    # umap-learn's fitted curve params for spread=1, min_dist=0.1
    a, b = umap_impl.find_ab_params(1.0, 0.1)
    assert a == pytest.approx(1.577, abs=0.05)
    assert b == pytest.approx(0.8951, abs=0.02)


def test_fuzzy_graph_is_symmetric_unit_bounded():
    x, _ = _three_clusters(n_per=25)
    g = umap_impl.fuzzy_simplicial_set(x, n_neighbors=10)
    dense = g.toarray()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    assert dense.min() >= 0.0 and dense.max() <= 1.0 + 1e-12
    # every point keeps at least its nearest neighbor at full strength
    assert (dense.max(axis=1) > 0.99).all()


def test_separated_clusters_stay_separated():
    x, y = _three_clusters()
    emb = umap_impl.UMAP(n_components=2, n_neighbors=12,
                         random_state=42).fit_transform(x)
    assert emb.shape == (len(x), 2)
    assert np.isfinite(emb).all()
    cents = np.stack([emb[y == k].mean(axis=0) for k in range(3)])
    intra = max(np.linalg.norm(emb[y == k] - cents[k], axis=1).mean()
                for k in range(3))
    inter = min(np.linalg.norm(cents[i] - cents[j])
                for i in range(3) for j in range(i + 1, 3))
    # well-separated gaussians must embed with clear margins
    assert inter > 2.0 * intra, (inter, intra)


def test_deterministic_for_fixed_seed():
    x, _ = _three_clusters(n_per=30)
    e1 = umap_impl.UMAP(random_state=7, n_epochs=60).fit_transform(x)
    e2 = umap_impl.UMAP(random_state=7, n_epochs=60).fit_transform(x)
    np.testing.assert_array_equal(e1, e2)


def test_degenerate_inputs():
    # fewer points than components
    out = umap_impl.UMAP(n_components=2).fit_transform(np.zeros((2, 5)))
    assert out.shape == (2, 2)
    # coincident points must not NaN
    x = np.zeros((20, 4))
    emb = umap_impl.UMAP(random_state=0, n_epochs=30).fit_transform(x)
    assert np.isfinite(emb).all()


def test_projection_plot_uses_in_tree_umap(tmp_path):
    from multimodal_edema_prediction_tpu.analysis import visualize_pathology
    rng = np.random.default_rng(3)
    N, K, d = 24, 3, 16
    data = {"fus_tok": rng.normal(size=(N, K, d)).astype(np.float32),
            "y": rng.integers(0, 2, size=(N, K)).astype(np.float32)}
    visualize_pathology.plot_query_token_projection(
        data, [f"label_l{k}" for k in range(K)], str(tmp_path))
    assert (tmp_path / "fusion_token_umap.png").exists()   # dual_patch name
    assert (tmp_path / "stage4_projection.png").exists()   # stable alias
    # mode-dependent reference naming (:623-628)
    assert visualize_pathology.projection_filename("dual") == \
        "ts_token_umap.png"
    assert visualize_pathology.projection_filename("single") == \
        "stage4_token_umap.png"
