"""L0 static-info hygiene rules vs the groundwork notebook
(preprocess/[Subject data]multimodal_preprocessing_groundwork.ipynb):
time-error taxonomy & repair, death reconciliation, race mapping, age."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.data.static_info import (
    ORDER_RULESET, age_at, audit_death_flags, classify_stay_order,
    death_error_handling, dedupe_deathtime, flag_overlapping_intervals,
    handle_reversed_intervals, map_race, repair_stay_order,
    reversed_interval_subjects)

T = np.datetime64


def ts(s):
    return T(s)


# --- error type 0 (cell 29) -------------------------------------------------
def test_reversed_intervals_detect_and_delete():
    subs = np.array([1, 1, 2, 3])
    start = np.array([ts("2020-01-01"), ts("2020-02-01"),
                      ts("2020-03-05"), ts("2020-04-01")])
    end = np.array([ts("2020-01-03"), ts("2020-02-02"),
                    ts("2020-03-01"), ts("2020-04-09")])   # subject 2 reversed
    assert reversed_interval_subjects(subs, start, end).tolist() == [2]
    keep = handle_reversed_intervals(subs, start, end, how="del")
    assert keep.tolist() == [True, True, False, True]
    s2, e2 = handle_reversed_intervals(subs, start, end, how="adj")
    assert s2[2] == end[2] and e2[2] == start[2]           # swapped
    assert s2[0] == start[0]                               # untouched


def test_reversed_intervals_equal_times_are_errors():
    # cell 29 uses >=: zero-length intervals count as reversed
    subs = np.array([7])
    t = np.array([ts("2021-06-01T12:00")])
    assert reversed_interval_subjects(subs, t, t).tolist() == [7]


# --- error type 1 (cells 33/35) ---------------------------------------------
def test_overlapping_admissions_flags_both():
    subject = np.array([1, 1, 1, 2, 2])
    hadm = np.array([10, 11, 12, 20, 21])
    start = np.array([ts("2020-01-01"), ts("2020-01-05"), ts("2020-02-01"),
                      ts("2020-03-01"), ts("2020-03-10")])
    end = np.array([ts("2020-01-06"), ts("2020-01-08"), ts("2020-02-03"),
                    ts("2020-03-05"), ts("2020-03-12")])
    # hadm 11 starts before hadm 10 ends → both flagged; subject 2 clean
    flagged = flag_overlapping_intervals(subject, hadm, start, end)
    assert flagged.tolist() == [10, 11]


def test_overlap_ignores_duplicate_rows_of_same_item():
    subject = np.array([1, 1])
    stay = np.array([100, 100])     # same stay repeated (static_info join)
    start = np.array([ts("2020-01-01"), ts("2020-01-01")])
    end = np.array([ts("2020-01-02"), ts("2020-01-02")])
    assert len(flag_overlapping_intervals(subject, stay, start, end)) == 0


# --- error type 3 (cells 38-41) ---------------------------------------------
@pytest.mark.parametrize("a,d,i,o,expect", [
    ("01-01", "01-10", "01-02", "01-05", None),      # normal A<I<O<D
    ("01-01", "01-02", "01-05", "01-08", "ADIO"),
    ("01-01", "01-06", "01-02", "01-08", "AIDO"),
    ("01-03", "01-06", "01-01", "01-08", "IADO"),
    ("01-03", "01-10", "01-01", "01-08", "IAOD"),
    ("01-08", "01-10", "01-01", "01-05", "IOAD"),
])
def test_order_classification(a, d, i, o, expect):
    f = lambda s: ts(f"2020-{s}")  # noqa: E731
    assert classify_stay_order(f(a), f(d), f(i), f(o)) == expect


def test_order_repair_mm_and_del():
    f = lambda s: ts(f"2020-{s}")  # noqa: E731
    # AIDO → 'mm': AT=min(IT,AT), DT=max(OT,DT)
    et, keep, a2, d2 = repair_stay_order(f("01-01"), f("01-06"),
                                         f("01-02"), f("01-08"))
    assert (et, keep) == ("AIDO", True)
    assert a2 == f("01-01") and d2 == f("01-08")
    # ADIO → 'del'
    et, keep, _, _ = repair_stay_order(f("01-01"), f("01-02"),
                                       f("01-05"), f("01-08"))
    assert (et, keep) == ("ADIO", False)
    # 'aa' variant: AT=IT-12h, DT=OT+12h
    et, keep, a2, d2 = repair_stay_order(
        f("01-03"), f("01-06"), f("01-01"), f("01-08"),
        ruleset={**ORDER_RULESET, "IADO": "aa"})
    assert et == "IADO" and keep
    assert a2 == f("01-01") - np.timedelta64(12, "h")
    assert d2 == f("01-08") + np.timedelta64(12, "h")


# --- death reconciliation (cells 44-54) --------------------------------------
def test_dedupe_deathtime_prefers_dod_date_then_backfills():
    subs = np.array([1, 1, 1])
    dod = np.array([ts("2020-05-02")] * 3)
    dht = np.array([ts("2020-05-02T10:00"), ts("2020-04-01T08:00"),
                    T("NaT")])
    out = dedupe_deathtime(subs, dht, dod)
    # the 04-01 record mismatches dod's date → replaced by the 05-02 value
    assert (out == ts("2020-05-02T10:00")).all()


def test_audit_death_flags_taxonomy():
    # cell 49: consistent death in last admission → None
    assert audit_death_flags(np.array([0, 1]), np.array([0, 1])) is None
    assert audit_death_flags(np.array([0, 0]), np.array([0, 0])) is None
    # hef != died on the last admission → inconsistent
    assert audit_death_flags(np.array([0, 1]),
                             np.array([0, 0])) == "error_incons"
    # death recorded but NOT on the last admission → admission after death
    assert audit_death_flags(np.array([1, 0]),
                             np.array([1, 0])) == "adm_after_death"
    # repeated death flags → death_rep
    assert audit_death_flags(np.array([1, 1]),
                             np.array([1, 1])) == "death_rep"


def test_death_error_handling_in_hospital_timestamp():
    at = np.array([ts("2020-01-01T00:00"), ts("2020-02-01T00:00")])
    dt = np.array([ts("2020-01-10T00:00"), ts("2020-02-20T00:00")])
    r = death_error_handling(at, dt, dod="2020-02-15",
                             deathtime="2020-02-15T03:00",
                             died=np.array([0, 1]), hef=np.array([0, 1]))
    assert r["deathtype"] == "in"
    assert r["death_adm"].tolist() == [0, 1]      # second admission
    assert r["certainty"] == "certain"            # died+hef = 2
    assert r["is_dht_date"] == 0


def test_death_error_handling_survived_and_error():
    at = np.array([ts("2020-01-01T00:00")])
    dt = np.array([ts("2020-01-10T00:00")])
    r = death_error_handling(at, dt, dod=None, deathtime=None,
                             died=np.array([0]), hef=np.array([0]))
    assert r["deathtype"] == "survived" and r["certainty"] == "certain"
    # deathtime before admission → error
    r = death_error_handling(at, dt, dod="2019-12-30",
                             deathtime="2019-12-30T01:00",
                             died=np.array([0]), hef=np.array([0]))
    assert r["deathtype"] == "error" and r["certainty"] == "error"


def test_death_error_handling_out_of_hospital_date_precision():
    at = np.array([ts("2020-01-01T08:00")])
    dt = np.array([ts("2020-01-10T17:00")])
    # dod only (date precision), 3 months post-discharge → 'out'
    r = death_error_handling(at, dt, dod="2020-04-15", deathtime=None,
                             died=np.array([0]), hef=np.array([0]))
    assert r["deathtype"] == "out"
    assert r["is_dht_date"] == 1
    assert r["certainty"] == "certain"            # no conflicting flags
    # next-day death → out_in_24hr with numeric certainty
    r = death_error_handling(at, dt, dod="2020-01-11", deathtime=None,
                             died=np.array([1]), hef=np.array([0]))
    assert r["deathtype"] == "out_in_24hr"
    assert r["certainty"] == pytest.approx(0.5)   # 1 flag / (1 adm × 2)


# --- race mapping (cell 58) --------------------------------------------------
def test_race_mapping_groups_and_multirace_rule():
    subs = np.array([1, 1, 2, 2, 3])
    race = ["WHITE - RUSSIAN", "WHITE", "ASIAN - KOREAN",
            "BLACK/CAPE VERDEAN", "PATIENT DECLINED TO ANSWER"]
    out = map_race(subs, race)
    # subject 1: two raw strings but ONE mapped group → kept as WHITE
    assert out[0] == out[1] == "WHITE"
    # subject 2: two distinct mapped groups → rule 5 coerces to OTHER
    assert out[2] == out[3] == "OTHER"
    assert out[4] == "UNKNOWN"
    assert map_race(np.array([9]), [None]).tolist() == ["UNKNOWN"]


# --- age (cell 62) ------------------------------------------------------------
def test_age_at_intime():
    t = np.array([ts("2150-07-02T00:00")])        # 182.5 days into the year
    age = age_at(t, anchor_year=np.array([2150]),
                 anchor_age=np.array([60]))
    assert age[0] == pytest.approx(60.5, abs=0.01)
