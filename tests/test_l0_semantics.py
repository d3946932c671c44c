"""L0 label/catalog/demographic semantics, each rule pinned to its reference
notebook cell (VERDICT round-1 item 6)."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.data import cxr_catalog as C
from multimodal_edema_prediction_tpu.data import demographics as D


# =============================================================================
# cxr_db.ipynb
# =============================================================================
class TestCxrCatalog:
    def test_ap_pa_filter(self):
        """cell 24: only AP/PA views survive."""
        keep = C.filter_ap_pa(["AP", "PA", "LATERAL", "LL", "AP", None])
        np.testing.assert_array_equal(keep, [1, 1, 0, 0, 1, 0])

    def test_u_to_positive(self):
        """cell 24: replace(-1, 1) on label columns, NaN untouched."""
        lab = np.array([[0.0, -1.0, 1.0, np.nan]])
        out = C.uncertain_to_positive(lab)
        np.testing.assert_array_equal(out[0, :3], [0.0, 1.0, 1.0])
        assert np.isnan(out[0, 3])
        # original untouched
        assert lab[0, 1] == -1.0

    def test_uncertain_policies(self):
        lab = np.array([[-1.0, 0.5]])
        assert C.apply_uncertain_policy(lab, "to_positive")[0, 0] == 1.0
        assert C.apply_uncertain_policy(lab, "to_zero")[0, 0] == 0.0
        assert C.apply_uncertain_policy(lab, "keep")[0, 0] == -1.0
        with pytest.raises(ValueError):
            C.apply_uncertain_policy(lab, "drop")

    def test_cxrtime_parse(self):
        """cell 26: StudyDate %Y%m%d + StudyTime '%#010.3f' → %H%M%S.%f."""
        t = C.parse_cxrtime(np.array([20190321, 20200101]),
                            np.array([953.0, 235959.500]))
        assert t[0] == np.datetime64("2019-03-21T00:09:53.000", "ms")
        assert t[1] == np.datetime64("2020-01-01T23:59:59.500", "ms")

    def test_slot_assignment_and_dedupe(self):
        """groundwork cell 391: cxrtime ∈ [slot_start, slot_end), earliest
        CXR wins per (stay, slot), outside-grid → -1."""
        intime = {7: np.datetime64("2020-01-01T00:00", "ms")}
        n_slots = {7: 48}
        times = np.array([
            np.datetime64("2020-01-01T03:30", "ms"),   # slot 3
            np.datetime64("2020-01-01T03:59", "ms"),   # slot 3 (loses)
            np.datetime64("2020-01-01T04:00", "ms"),   # boundary → slot 4
            np.datetime64("2019-12-31T23:00", "ms"),   # before intime → -1
            np.datetime64("2020-01-03T01:00", "ms"),   # past grid → -1
        ])
        stays = np.full(5, 7)
        slot, keep = C.assign_cxr_to_slots(stays, times, intime, n_slots)
        np.testing.assert_array_equal(slot, [3, 3, 4, -1, -1])
        np.testing.assert_array_equal(keep, [1, 0, 1, 0, 0])

    def test_derive_catalog_end_to_end(self):
        meta = {
            "subject_id": np.array([1, 2, 3]),
            "study_id": np.array([10, 20, 30]),
            "dicom_id": np.array(["a", "b", "c"]),
            "ViewPosition": np.array(["AP", "LATERAL", "PA"]),
            "StudyDate": np.array([20190321] * 3),
            "StudyTime": np.array([953.0, 1200.0, 120000.0]),
        }
        lab = np.array([[1.0, -1.0], [0.0, 0.0], [np.nan, -1.0]])
        out = C.derive_catalog(meta, lab)
        np.testing.assert_array_equal(out["subject_id"], [1, 3])
        assert out["labels"][0, 1] == 1.0           # U→1
        assert np.isnan(out["labels"][1, 0])
        assert out["cxrtime"][1] == np.datetime64("2019-03-21T12:00", "ms")

    def test_cxlseg_lung_mask_join(self):
        """cxr_db cells 2-8 + 30: CXLSeg-mask DicomPath → lung_mask_path,
        <root>/lung_mask/ prefix, LEFT merge on (subject, study, dicom) —
        unmatched rows keep None / has_lung_mask=False."""
        catalog = {
            "subject_id": np.array([1, 3]),
            "study_id": np.array([10, 30]),
            "dicom_id": np.array(["a", "c"]),
        }
        seg = {
            "subject_id": np.array([1, 9]),
            "study_id": np.array([10, 90]),
            "dicom_id": np.array(["a", "z"]),
            "DicomPath": np.array(["p10/a.png", "p90/z.png"]),
        }
        out = C.join_lung_masks(catalog, seg, lung_data_path="/seg/root")
        assert out["lung_mask_path"][0] == "/seg/root/lung_mask/p10/a.png"
        assert out["lung_mask_path"][1] is None
        np.testing.assert_array_equal(out["has_lung_mask"], [True, False])
        # derive_catalog wires it through end-to-end
        meta = {
            "subject_id": np.array([1, 3]),
            "study_id": np.array([10, 30]),
            "dicom_id": np.array(["a", "c"]),
            "ViewPosition": np.array(["AP", "PA"]),
            "StudyDate": np.array([20190321] * 2),
            "StudyTime": np.array([953.0, 1200.0]),
        }
        full = C.derive_catalog(meta, np.zeros((2, 2)), seg_mask=seg)
        assert full["has_lung_mask"].tolist() == [True, False]
        # pandas-style missing values: a float NaN DicomPath (what
        # df[c].to_numpy() yields for empty cells) must not become a
        # ".../lung_mask/nan" path with has_lung_mask=True
        seg_nan = {
            "subject_id": np.array([1]),
            "study_id": np.array([10]),
            "dicom_id": np.array(["a"]),
            "DicomPath": np.array([float("nan")], object),
        }
        out2 = C.join_lung_masks(catalog, seg_nan, lung_data_path="/r")
        assert out2["lung_mask_path"][0] is None
        assert not out2["has_lung_mask"].any()


# =============================================================================
# demographic_preprocess.ipynb
# =============================================================================
class TestDemographics:
    def test_icd_flags(self):
        """cells 6/65: ICD-9 390-459 / I* circulatory, 460-519 / J* resp."""
        assert D.has_circulatory(["42822"]) == 1      # ICD-9 428.22
        assert D.has_circulatory(["I5030"]) == 1      # ICD-10 I50.30
        assert D.has_circulatory(["J80", "51882"]) == 0
        assert D.has_respiratory(["51882"]) == 1      # ICD-9 518.82
        assert D.has_respiratory(["J80"]) == 1        # ICD-10 ARDS
        assert D.has_respiratory(["486"]) == 1        # pneumonia
        assert D.has_respiratory(["I50"]) == 0
        assert D.has_circulatory(["XYZ"]) == 0        # non-numeric, non-I/J

    def test_past_history_strictly_prior(self):
        """cell 62: an admission's flags come from EARLIER admissions only."""
        subj = np.array([1, 1, 1])
        hadm = np.array([100, 101, 102])
        adm = np.array([1, 2, 3])
        codes = ["I50", "J80", "42822"]
        out = D.past_history_flags(subj, hadm, adm, codes)
        assert out[(1, 100)] == (0, 0)    # first admission: no history
        assert out[(1, 101)] == (1, 0)    # sees I50 only
        assert out[(1, 102)] == (1, 1)    # sees I50 + J80, not its own 428

    def test_past_history_resets_per_subject(self):
        subj = np.array([1, 2])
        hadm = np.array([100, 200])
        adm = np.array([1, 2])
        out = D.past_history_flags(subj, hadm, adm, ["I50", "J80"])
        assert out[(2, 200)] == (0, 0)    # subject 2 has no history

    def test_bmi_binning(self):
        """cells 35-37: WHO cutoffs 18.5/25/30/35/40."""
        cases = [(17.0, "under"), (18.5, "normal"), (24.9, "normal"),
                 (25.0, "overweight"), (30.0, "obese1"), (35.0, "obese2"),
                 (40.0, "obese3"), (float("nan"), "unknown")]
        for bmi, want in cases:
            assert D.bmi_bin(bmi) == want, bmi

    def test_bmi_onehot_missingness(self):
        """cell 80: NaN BMI → all-zero one-hots + observed_bmi=0."""
        names, x = D.bmi_onehot(np.array([22.0, np.nan]))
        assert names[-1] == "observed_bmi"
        assert x[0, names.index("bmi_normal")] == 1.0 and x[0, -1] == 1.0
        np.testing.assert_array_equal(x[1], 0.0)

    def test_compute_bmi(self):
        """cell 32: weight / (height/100)^2, rounded to 1 decimal."""
        bmi = D.compute_bmi(np.array([70.0]), np.array([175.0]))
        assert bmi[0] == 22.9

    def test_onehot_categorical_get_dummies_semantics(self):
        """cells 44-51: sorted unique categories, NaN rows all-zero."""
        names, x = D.onehot_categorical(
            ["Medicare", "Private", np.nan, "Medicare", ""], "ins")
        assert names == ["ins_Medicare", "ins_Private"]
        np.testing.assert_array_equal(x[:, 0], [1, 0, 0, 1, 0])
        np.testing.assert_array_equal(x[2], 0.0)
        np.testing.assert_array_equal(x[4], 0.0)

    def test_build_demographics_assembly(self):
        names, x = D.build_demographics(
            hadm_ids=np.array([100, 101]),
            age=np.array([60.0, 70.0]),
            gender=["M", "F"],
            bmi=np.array([22.0, np.nan]),
            insurance=["Medicare", "Private"],
            marital_status=["MARRIED", np.nan],
            race=["WHITE", "BLACK"],
            icd_history={100: (1, 0)})
        assert x.shape == (2, len(names))
        assert x[0, names.index("gender_m")] == 1.0
        assert x[1, names.index("gender_m")] == 0.0
        assert x[0, names.index("hx_circulatory")] == 1.0
        assert x[1, names.index("hx_circulatory")] == 0.0
        assert x[0, names.index("observed_bmi")] == 1.0
        assert x[1, names.index("observed_bmi")] == 0.0
        assert x[0, names.index("ethn_WHITE")] == 1.0


# =============================================================================
# U→1 inside the head trainer
# =============================================================================
def test_cxr_head_trainer_applies_u_to_positive(tmp_path):
    from multimodal_edema_prediction_tpu.train.cxr_head_loop import (
        split_catalog_subjects, train_cxr_head)
    rng = np.random.default_rng(0)
    N, Dd, K = 300, 16, 7
    w = rng.normal(size=(Dd, K))
    x = rng.normal(size=(N, Dd)).astype(np.float32)
    probs = 1 / (1 + np.exp(-(x @ w)))
    lab = (rng.random((N, K)) < probs).astype(np.float32)
    # mark a slice uncertain: with U→1 these train as positives
    lab[lab == 1.0] = np.where(rng.random((lab == 1.0).sum()) < 0.5,
                               -1.0, 1.0)
    subj = rng.integers(0, 80, N)
    splits = split_catalog_subjects(subj, lab)
    labels = [f"label_{i}" for i in range(K)]
    r_pos = train_cxr_head(x, lab, splits, labels,
                           str(tmp_path / "h1.msgpack"), epochs=20,
                           uncertain_policy="to_positive")
    # U→1 on a half-positive-uncertain synthetic task must score well;
    # with 'keep', -1 targets corrupt the BCE and AUROC collapses
    r_keep = train_cxr_head(x, lab, splits, labels,
                            str(tmp_path / "h2.msgpack"), epochs=20,
                            uncertain_policy="keep")
    assert r_pos["best_val_macro_auroc"] > r_keep["best_val_macro_auroc"]


def test_cxr_head_minibatch_matches_fullbatch_quality(tmp_path):
    from multimodal_edema_prediction_tpu.train.cxr_head_loop import (
        split_catalog_subjects, train_cxr_head)
    rng = np.random.default_rng(1)
    N, Dd, K = 400, 16, 3
    w = rng.normal(size=(Dd, K))
    x = rng.normal(size=(N, Dd)).astype(np.float32)
    lab = (rng.random((N, K)) < 1 / (1 + np.exp(-(x @ w)))).astype(np.float32)
    subj = rng.integers(0, 100, N)
    splits = split_catalog_subjects(subj, lab)
    labels = [f"label_{i}" for i in range(K)]
    r_full = train_cxr_head(x, lab, splits, labels,
                            str(tmp_path / "f.msgpack"), epochs=100)
    r_mb = train_cxr_head(x, lab, splits, labels,
                          str(tmp_path / "m.msgpack"), epochs=100,
                          batch_size=64)
    assert r_mb["best_val_macro_auroc"] > 0.75
    # mini-batch takes ~5x more optimizer steps per epoch → at least as good
    assert r_mb["best_val_macro_auroc"] >= \
        r_full["best_val_macro_auroc"] - 0.02
