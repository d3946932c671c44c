"""CPE/NCPE silver-standard subtype scoring + phenotype decay half-life
(time_series_text notebook cells 51/81/85)."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.data.subtype import (
    MEDIANS, phenotype_half_life, silver_standard_subtype)


def test_phenotype_half_life_rules():
    hl = phenotype_half_life(
        cardiomegaly=np.array([1, 0, 0, 1, 0]),
        bnp=np.array([np.nan, 600.0, np.nan, np.nan, 100.0]),
        pneumonia=np.array([0, 0, 1, 1, 0]),
        consolidation=np.zeros(5),
        spo2_fio2=np.array([400.0, np.nan, 200.0, np.nan, np.nan]))
    # fast only / fast only (bnp) / slow only / both→default / neither
    np.testing.assert_array_equal(hl, [12.0, 12.0, 72.0, 48.0, 48.0])


def _cols(n, **kw):
    base = {k: np.full(n, np.nan) for k in
            ("bnp", "troponin", "bun", "creatinine", "spo2_fio2", "fio2",
             "albumin", "temperature", "lactate")}
    for k, v in kw.items():
        base[k] = np.asarray(v, np.float64)
    return base


def test_cpe_scoring_thresholds():
    out = silver_standard_subtype(_cols(
        4, bnp=[6000.0, 4000.0, 600.0, 100.0]))
    np.testing.assert_allclose(out["cpe_score"], [3.0, 2.0, 1.0, 0.0])
    # bnp 6000: CPE-dominant hard label
    assert out["subtype_label"][0] == 2.0
    assert out["subtype_mask"][0] == 1.0
    # bnp 100 (< threshold): insufficient evidence → NaN label, mask 0
    assert np.isnan(out["subtype_label"][3])
    assert out["subtype_mask"][3] == 0.0


def test_median_value_is_not_a_signal():
    # the ffill'd global median must contribute NOTHING (cell 81/85)
    out = silver_standard_subtype(_cols(1, bnp=[MEDIANS["bnp"]]))
    assert out["cpe_score"][0] == 0.0


def test_ncpe_scoring_and_combined_rules():
    out = silver_standard_subtype(_cols(
        2, spo2_fio2=[140.0, 250.0], fio2=[0.7, 0.3]))
    # sf<150 → 2.0; fio2≥0.6 → 0.5; sf<235&fio2≥0.5 → 0.5; sf<150&fio2≥0.6
    # → 1.0 ⇒ total 4.0
    assert out["ncpe_score"][0] == pytest.approx(4.0)
    assert out["subtype_label"][0] == 1.0          # NCPE
    # sf 250 → 0.5 only, below MIN_SCORE → unlabeled
    assert out["ncpe_score"][1] == pytest.approx(0.5)
    assert np.isnan(out["subtype_label"][1])


def test_mixed_label_and_softmax_probs():
    # strong CPE and NCPE within margin → Mixed (0.0)
    out = silver_standard_subtype(_cols(
        1, bnp=[600.0], troponin=[0.6], spo2_fio2=[160.0], fio2=[0.65]))
    # cpe = 1+1 = 2.0; ncpe = 1.0+0.5+0.5 = 2.0 → diff 0 → Mixed
    assert out["cpe_score"][0] == pytest.approx(2.0)
    assert out["ncpe_score"][0] == pytest.approx(2.0)
    assert out["subtype_label"][0] == 0.0
    # soft labels sum to 1 and favour mixed (z_mixed = 1.5·min = 3.0)
    p = np.array([out["p_mixed"][0], out["p_ncpe"][0], out["p_cpe"][0]])
    assert p.sum() == pytest.approx(1.0)
    assert p.argmax() == 0


def test_bun_cr_ratio_rule():
    out = silver_standard_subtype(_cols(
        3, bun=[40.0, 30.0, 40.0], creatinine=[1.5, 2.0, np.nan]))
    # 40/1.5 = 26.7 > 20 → +1.0 ; 30/2.0 = 15 but bun≥26 → +0.5 ;
    # no creatinine, bun≥26 → +0.5
    np.testing.assert_allclose(out["cpe_score"], [1.0, 0.5, 0.5])


def test_edema_gating():
    out = silver_standard_subtype(
        _cols(2, bnp=[6000.0, 6000.0]), edema=np.array([1.0, 0.0]))
    assert out["subtype_label"][0] == 2.0
    assert np.isnan(out["subtype_label"][1])       # non-edema row untouched
    assert out["subtype_mask"].tolist() == [1.0, 0.0]
    assert out["p_cpe"][1] == 0.0
