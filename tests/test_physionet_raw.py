"""Raw PhysioNet-2012 challenge-file reader (torchtime-free real loader).

Fabricates the published layout (set-a/<rid>.txt + Outcomes-a.txt) and
asserts the loader reproduces the reference semantics: hourly binning with
within-slot means + counts, 36 TS vars in torchtime column order, 8 static
dims, outcome labels, and that the cohort flows into the standard
stay-label dataset machinery."""
import os

import numpy as np
import pytest

from multimodal_edema_prediction_tpu.data.physionet import (
    N_STATIC, N_TS_VARS, P12_TS_PARAMS, load_physionet2012_raw)


def _write_record(d, rid, rows, statics):
    lines = ["Time,Parameter,Value", f"00:00,RecordID,{rid}"]
    for k, v in statics.items():
        lines.append(f"00:00,{k},{v}")
    for t, p, v in rows:
        lines.append(f"{t},{p},{v}")
    with open(os.path.join(d, f"{rid}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture()
def raw_dir(tmp_path):
    seta = tmp_path / "set-a"
    seta.mkdir()
    rng = np.random.default_rng(0)
    rids = list(range(132539, 132539 + 12))
    for rid in rids:
        rows = []
        for _ in range(30):
            hh, mm = rng.integers(0, 48), rng.integers(0, 60)
            p = P12_TS_PARAMS[rng.integers(0, N_TS_VARS)]
            rows.append((f"{hh:02d}:{mm:02d}", p,
                         round(float(rng.normal(100, 20)), 1)))
        _write_record(str(seta), rid, rows,
                      {"Age": int(rng.integers(40, 90)),
                       "Gender": int(rng.integers(0, 2)),
                       "Height": round(float(rng.normal(170, 10)), 1),
                       "ICUType": int(rng.integers(1, 5)),
                       "Weight": round(float(rng.normal(80, 15)), 1)})
    with open(tmp_path / "Outcomes-a.txt", "w") as f:
        f.write("RecordID,SAPS-I,SOFA,Length_of_stay,Survival,"
                "In-hospital_death\n")
        for i, rid in enumerate(rids):
            f.write(f"{rid},10,5,7,-1,{i % 2}\n")
    return str(tmp_path)


def test_loader_shapes_and_labels(raw_dir):
    ds, meta = load_physionet2012_raw(raw_dir)
    assert len(ds.events.stay_ids) == 12
    assert ds.events.values.shape[1] == N_TS_VARS
    assert ds.static.onehot.shape == (12, N_STATIC - 1)
    np.testing.assert_array_equal(np.sort(np.unique(ds.static.death_adm)),
                                  [0.0, 1.0])
    assert ds.static.death_adm.sum() == 6
    # meta carries the subject-level split over all 12 records
    n_split = len(meta.train_ids) + len(meta.val_ids) + len(meta.test_ids)
    assert n_split == 12


def test_hourly_binning_means_and_counts(tmp_path):
    seta = tmp_path / "set-a"
    seta.mkdir()
    # two HR obs in hour 3 (mean 80), one GCS in hour 0; Albumin -1 ignored
    _write_record(str(seta), 140000,
                  [("03:10", "HR", 70.0), ("03:50", "HR", 90.0),
                   ("00:30", "GCS", 14.0), ("01:00", "Albumin", -1.0)],
                  {"Age": 60, "Gender": 1, "Height": 175.0, "ICUType": 3,
                   "Weight": 82.0})
    # filler records so the subject-level split has enough subjects
    for k in range(1, 6):
        _write_record(str(seta), 140000 + k, [("02:00", "HR", 75.0)],
                      {"Age": 50 + k, "Gender": 0, "Height": 160.0,
                       "ICUType": 1, "Weight": 70.0})
    with open(tmp_path / "Outcomes-a.txt", "w") as f:
        f.write("RecordID,SAPS-I,SOFA,Length_of_stay,Survival,"
                "In-hospital_death\n140000,1,1,5,-1,1\n")
        for k in range(1, 6):
            f.write(f"{140000 + k},1,1,5,-1,0\n")
    ds, _ = load_physionet2012_raw(str(tmp_path))
    ev = ds.events
    i_hr = P12_TS_PARAMS.index("HR")
    i_gcs = P12_TS_PARAMS.index("GCS")
    i_alb = P12_TS_PARAMS.index("Albumin")
    lo, hi = ev.offsets[0], ev.offsets[1]         # record 140000's rows
    slots = ev.slot_idx[lo:hi].tolist()
    assert set(slots) == {0, 3}
    r3 = lo + slots.index(3)
    assert ev.values[r3, i_hr] == pytest.approx(80.0)
    assert ev.counts[r3, i_hr] == 2
    r0 = lo + slots.index(0)
    assert ev.values[r0, i_gcs] == pytest.approx(14.0)
    assert ev.counts[:, i_alb].sum() == 0          # -1 = missing, dropped
    # statics: [gender, icu1..4, height_z, weight_z]; icu3 set
    assert ds.static.onehot[0, 0] == 1.0
    np.testing.assert_array_equal(ds.static.onehot[0, 1:5], [0, 0, 1, 0])
    assert ds.static.age[0] == 60.0
    assert ds.static.death_adm[0] == 1.0


def test_relative_binning_reference_semantics(tmp_path):
    """binning='relative' mirrors the reference exactly
    (duett/physionet.py:92-96): bins over the record's OWN span, the final
    observation lands in the last bin, within-bin value = LAST observation
    (overwrite), counts accumulate per observation."""
    seta = tmp_path / "set-a"
    seta.mkdir()
    # span = 40h; n_bins=4 → bin = minutes/2400*4
    _write_record(str(seta), 150000,
                  [("00:00", "HR", 60.0),      # t=0    → bin 0
                   ("05:00", "HR", 70.0),      # t=300  → bin 0 (overwrite)
                   ("12:00", "HR", 80.0),      # t=720  → bin 1
                   ("30:00", "GCS", 10.0),     # t=1800 → bin 3
                   ("40:00", "HR", 90.0)],     # t=t_last → last bin 3
                  {"Age": 60, "Gender": 1, "Height": 175.0, "ICUType": 2,
                   "Weight": 82.0})
    for k in range(1, 6):
        _write_record(str(seta), 150000 + k, [("02:00", "HR", 75.0)],
                      {"Age": 50 + k, "Gender": 0, "Height": 160.0,
                       "ICUType": 1, "Weight": 70.0})
    with open(tmp_path / "Outcomes-a.txt", "w") as f:
        f.write("RecordID,SAPS-I,SOFA,Length_of_stay,Survival,"
                "In-hospital_death\n")
        for k in range(6):
            f.write(f"{150000 + k},1,1,5,-1,{k % 2}\n")
    ds, _ = load_physionet2012_raw(str(tmp_path), binning="relative",
                                   n_bins=4)
    ev = ds.events
    i_hr = P12_TS_PARAMS.index("HR")
    i_gcs = P12_TS_PARAMS.index("GCS")
    lo, hi = ev.offsets[0], ev.offsets[1]
    slots = ev.slot_idx[lo:hi].tolist()
    assert set(slots) == {0, 1, 3}
    r0 = lo + slots.index(0)
    assert ev.values[r0, i_hr] == pytest.approx(70.0)   # last obs wins
    assert ev.counts[r0, i_hr] == 2                      # both counted
    r1 = lo + slots.index(1)
    assert ev.values[r1, i_hr] == pytest.approx(80.0)
    r3 = lo + slots.index(3)
    assert ev.values[r3, i_hr] == pytest.approx(90.0)    # t_last → last bin
    assert ev.values[r3, i_gcs] == pytest.approx(10.0)
    assert int(ev.stay_len[0]) == 4                      # n_bins, not hours


def test_flows_into_stay_label_dataset(raw_dir):
    from multimodal_edema_prediction_tpu.data.sliding import \
        build_stay_label_dataset
    ds, meta = load_physionet2012_raw(raw_dir)
    sld = build_stay_label_dataset(ds, meta, n_timesteps=24)
    assert sld.grid.shape[2] == 2 * N_TS_VARS
    total = sum(sld.split_size(s) for s in ("train", "val", "test"))
    assert total == 12
