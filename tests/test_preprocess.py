"""L0 preprocessing: hourly binning aggregation policies, unit
standardization, CXR slot assignment, soft-label decay."""
import numpy as np

from multimodal_edema_prediction_tpu.data.preprocess import (
    AGG_LAST, AGG_MEAN, AGG_SUM, RawEvents, VariableSpec, assign_cxr_slots,
    hourly_bin, soft_label_decay, standardize)

SPECS = [VariableSpec("hr", agg=AGG_MEAN),
         VariableSpec("bp", agg=AGG_LAST),
         VariableSpec("urine", agg=AGG_SUM, lo=0.0, hi=2000.0),
         VariableSpec("temp_f", unit_scale=0.5556, agg=AGG_MEAN)]


def test_hourly_bin_aggregation_policies():
    raw = RawEvents(
        stay_ids=np.array([1, 1, 1, 1, 1, 1], np.int64),
        times_h=np.array([0.2, 0.7, 0.5, 0.9, 0.1, 0.3]),
        var_ids=np.array([0, 0, 1, 1, 2, 2], np.int32),
        values=np.array([60.0, 80.0, 120.0, 110.0, 100.0, 50.0], np.float32))
    ev = hourly_bin(raw, SPECS, np.array([1]), np.array([7]), max_hours=24)
    assert ev.stay_len[0] == 1
    row = ev.values[0]
    assert row[0] == 70.0        # mean(60, 80)
    assert row[1] == 110.0       # last by time (0.9 after 0.5)
    assert row[2] == 150.0       # sum(100, 50)
    np.testing.assert_array_equal(ev.counts[0, :3], [2, 2, 2])


def test_hourly_bin_multi_stay_offsets():
    raw = RawEvents(
        stay_ids=np.array([2, 1, 2, 1], np.int64),
        times_h=np.array([0.5, 3.5, 5.5, 0.5]),
        var_ids=np.array([0, 0, 0, 0], np.int32),
        values=np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    ev = hourly_bin(raw, SPECS, np.array([1, 2]), np.array([7, 8]),
                    max_hours=24)
    assert ev.stay_len.tolist() == [4, 6]
    # stay 1: slots {0: 4.0, 3: 2.0}
    s, e = ev.offsets[0], ev.offsets[1]
    assert ev.slot_idx[s:e].tolist() == [0, 3]
    assert ev.values[s, 0] == 4.0 and ev.values[s + 1, 0] == 2.0


def test_standardize_units_and_clipping():
    raw = RawEvents(np.array([1, 1, 1], np.int64),
                    np.array([0.1, 0.2, 0.3]),
                    np.array([3, 2, 2], np.int32),
                    np.array([98.6, 5000.0, np.nan], np.float32))
    out = standardize(raw, SPECS)
    assert len(out.values) == 2            # NaN dropped
    assert abs(out.values[0] - 98.6 * 0.5556) < 1e-3
    assert out.values[1] == 2000.0         # clipped to hi


def test_assign_cxr_slots():
    slot, flag = assign_cxr_slots(
        np.array([2.5, 30.0, 1.0]), np.array([1, 1, 9], np.int64),
        np.array([1]), np.array([24], np.int32))
    assert slot.tolist() == [2, 30, 1]
    assert flag.tolist() == [1, 0, 0]      # 30h beyond stay; stay 9 unknown


def test_soft_label_decay_half_lives():
    d = soft_label_decay(np.array([0.0, 0.0]), np.array([12.0, 72.0]),
                         np.array([True, False]))
    np.testing.assert_allclose(d, [0.5, 0.5], rtol=1e-6)
    d2 = soft_label_decay(np.array([0.0]), np.array([24.0]),
                          np.array([True]))
    np.testing.assert_allclose(d2, [0.25], rtol=1e-6)
