"""Data pipeline tests: densify, anchors, aligned split, window gather.

Includes a golden parity test of the densify+gather path against a direct
re-implementation of the reference's per-sample ``build_stay_tensor``
(duett/mimic_dataset.py:33-46).
"""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.config import DataConfig
from multimodal_edema_prediction_tpu.data import pipeline as P
from multimodal_edema_prediction_tpu.data import synthetic as S
from multimodal_edema_prediction_tpu.data.sliding import (
    build_sliding_ssl_dataset, sliding_samples)


@pytest.fixture(scope="module")
def ds():
    return S.make_synthetic(seed=0, n_subjects=40, n_stays=60, n_variables=8,
                            min_len=26, max_len=40)


@pytest.fixture(scope="module")
def meta(ds):
    return P.meta_from_events(ds, DataConfig())


@pytest.fixture(scope="module")
def anchor_ds(ds, meta):
    return P.build_anchor_dataset(ds, meta, DataConfig())


def reference_build_stay_tensor(events, meta, stay_row, lo, hi, count_clip=15):
    """Direct re-implementation of build_stay_tensor + window slice."""
    V = len(meta.all_vars)
    T = hi - lo
    x = np.zeros((T, 2 * V), np.float32)
    s, e = events.offsets[stay_row], events.offsets[stay_row + 1]
    for r in range(s, e):
        t = int(events.slot_idx[r])
        if not (lo <= t < hi):
            continue
        for j in range(V):
            c = min(int(events.counts[r, j]), count_clip)
            if c > 0:
                x[t - lo, j] = (events.values[r, j] - meta.means[j]) / \
                    (meta.stds[j] + 1e-7)
                x[t - lo, j + V] = c
    return x


def test_densify_matches_reference_per_sample(ds, meta, anchor_ds):
    a = anchor_ds.anchor
    grid = np.asarray(anchor_ds.grid)
    for i in [0, 5, len(a["y"]) - 1]:
        row, e = int(a["stay_rows"][i]), int(a["slot_idx"][i])
        lo = e - anchor_ds.n_timesteps
        expected = reference_build_stay_tensor(ds.events, meta, row, lo, e)
        np.testing.assert_allclose(grid[row, lo:e], expected, rtol=1e-5,
                                   atol=1e-6)


def test_gather_windows_matches_numpy_slice(anchor_ds):
    import jax.numpy as jnp
    a = anchor_ds.anchor
    idx = np.arange(min(16, len(a["y"])))
    w = P.gather_windows(anchor_ds.grid, jnp.asarray(a["stay_rows"][idx]),
                         jnp.asarray(a["slot_idx"][idx]),
                         anchor_ds.n_timesteps)
    grid = np.asarray(anchor_ds.grid)
    for j, i in enumerate(idx):
        row, e = int(a["stay_rows"][i]), int(a["slot_idx"][i])
        np.testing.assert_allclose(
            np.asarray(w[j]), grid[row, e - anchor_ds.n_timesteps:e])


def test_anchor_filters(ds, meta, anchor_ds):
    a = anchor_ds.anchor
    assert (a["slot_idx"] >= anchor_ds.n_timesteps).all()
    assert not np.isnan(a["y"]).any()
    assert set(np.unique(a["y_multi_mask"])) <= {0.0, 1.0}
    # masked labels are zero placeholders
    assert (a["y_multi"][a["y_multi_mask"] == 0] == 0).all()


def test_split_subject_disjoint_and_total(anchor_ds):
    s = anchor_ds.splits
    total = sum(len(v) for v in s.values())
    assert total == len(anchor_ds.anchor["y"])
    subj = anchor_ds.anchor["subject_ids"]
    for a in ("train", "val", "test"):
        for b in ("train", "val", "test"):
            if a < b:
                assert set(subj[s[a]]).isdisjoint(subj[s[b]])


def test_split_matches_sklearn_reference(ds, anchor_ds):
    """The aligned split must reproduce the reference's sklearn recipe."""
    from sklearn.model_selection import train_test_split
    cat = ds.cxr_catalog
    has = ~np.isnan(cat.labels).all(axis=1)
    subj = cat.subject_ids[has]
    _, fi = np.unique(subj, return_index=True)
    subj_all = subj[np.sort(fi)]
    tr, tmp = train_test_split(subj_all, test_size=0.30, random_state=42)
    va, te = train_test_split(tmp, test_size=0.50, random_state=42)
    a_subj = anchor_ds.anchor["subject_ids"]
    np.testing.assert_array_equal(
        np.sort(anchor_ds.splits["test"]),
        np.sort(np.arange(len(a_subj))[np.isin(a_subj, te)]))


def test_iter_batches_fixed_shapes_and_padding(anchor_ds):
    n_val = anchor_ds.split_size("val")
    bs = 8
    batches = list(anchor_ds.iter_batches("val", bs, shuffle=False))
    assert all(len(b["y"]) == bs for b in batches)
    n_valid = sum(int(b["valid"].sum()) for b in batches)
    assert n_valid == n_val
    # padded rows must be fully masked
    for b in batches:
        pad = b["valid"] == 0
        assert (b["y_multi_mask"][pad] == 0).all()


def test_sliding_samples_cover_stays():
    stay_len = np.array([30, 23, 50], np.int32)
    s = sliding_samples(stay_len, np.array([0, 1, 2]), n_timesteps=24,
                        stride=12)
    # stay 0: starts {0}, wait 30-24=6 → starts {0}; stay 1 too short;
    # stay 2: 50-24=26 → starts {0,12,24}
    assert [tuple(x) for x in s] == [(0, 0), (2, 0), (2, 12), (2, 24)]


def test_build_sliding_ssl_dataset(ds, meta):
    ssl = build_sliding_ssl_dataset(ds, meta, n_timesteps=24, stride=12)
    assert ssl.split_size("train") > 0
    b = next(ssl.iter_batches("train", 4, shuffle=True))
    assert b["stay_rows"].shape == (4,)
    assert (b["slot_idx"] >= 24).all()


def test_meta_round_trip(meta, tmp_path):
    p = str(tmp_path / "meta_with_stats.pkl")
    meta.save(p)
    from multimodal_edema_prediction_tpu.data.meta import Meta
    m2 = Meta.load(p)
    np.testing.assert_allclose(m2.means, meta.means)
    assert m2.all_vars == meta.all_vars
    assert m2.d_static == meta.d_static


def test_host_partitioned_batches_cover_split_and_respect_ownership():
    """host_partition_count=P composes each global batch as P per-partition
    slices (image_id % P), so host p's rows only ever reference its own
    images (per-host bank feeding); unshuffled iteration covers every sample
    exactly once with padding masked via `valid`."""
    from multimodal_edema_prediction_tpu.config import DataConfig
    from multimodal_edema_prediction_tpu.data import pipeline as P
    from multimodal_edema_prediction_tpu.data import synthetic as S
    ds = S.make_synthetic(seed=0, n_subjects=40, n_stays=80, n_variables=6,
                          min_len=26, max_len=40, obs_rate=0.5)
    meta = P.meta_from_events(ds, DataConfig())
    ads = P.build_anchor_dataset(ds, meta, DataConfig())
    Pn, B = 2, 16
    ads.host_partition_count = Pn
    local = B // Pn

    seen = []
    for batch in ads.iter_batches("train", B, shuffle=False):
        ids = batch["image_ids"]
        for p in range(Pn):
            sl = slice(p * local, (p + 1) * local)
            assert (ids[sl] % Pn == p).all()          # ownership invariant
        v = batch["valid"].astype(bool)
        assert (batch["y_multi_mask"][~v] == 0).all()  # padding masked
        seen.extend(np.asarray(batch["stay_rows"])[v].tolist())
        # padded rows never counted: valid rows map 1:1 onto split samples
    train_idx = ads.splits["train"]
    assert len(seen) == len(train_idx)
    np.testing.assert_array_equal(
        np.sort(np.asarray(seen)),
        np.sort(ads.anchor["stay_rows"][train_idx]))

    # shuffled training mode drops ragged tails instead of padding
    for batch in ads.iter_batches("train", B, shuffle=True, seed=1):
        assert batch["valid"].all()

    # too many partitions for the cohort → loud failure, not silent skew
    ads.host_partition_count = 64
    with pytest.raises(ValueError, match="owns no samples"):
        next(ads.iter_batches("train", 64, shuffle=False))
