"""Synthetic raw-MIMIC directory generator: the standing rehearsal cohort.

Writes a tiny directory laid out exactly like a raw MIMIC-IV + MIMIC-CXR
download (``hosp/``, ``icu/``, ``cxr/`` CSVs) so the FULL offline chain —
``cli/preprocess`` (the six reference notebooks' orchestrated equivalent,
see :mod:`.raw_mimic`), CXR head, SSL, teacher, KD, analysis — can be
executed end-to-end with no PHI (``scripts/e2e_rehearsal.sh``; VERDICT r3
item 8). The cohort is deliberately adversarial where the notebook rules
have teeth: Fahrenheit temperatures, FiO2 charted as a fraction, an
impossible heart rate the outlier criteria must drop, a pre-ICU ward lab
draw that must backfill slot 0, an instantaneous bolus next to an
infusion, and a LATERAL view the CXR filter must reject.

Reference anchors: the notebooks under ``/root/reference/preprocess/``
(groundwork cells 36-252, input_preprocess cells 71-94, cxr_db cells
19-53); raw tables per the MIMIC-IV v2.2 layout.

Usage:
    python -m multimodal_edema_prediction_tpu.data.synthetic_raw \
        --out /tmp/raw [--n_subjects 24] [--jpegs_for /path/to/artifacts]
"""
from __future__ import annotations

import argparse
import io
import os

import numpy as np
import pandas as pd

from . import raw_mimic as rm

H = np.timedelta64(1, "h")
M = np.timedelta64(1, "m")

__all__ = ["make_raw_layout", "write_jpegs_for_artifacts"]


def _ts(s):
    return pd.Timestamp(s)


def _write(root, rel, df):
    p = os.path.join(root, rel + ".csv")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    df.to_csv(p, index=False)


def make_raw_layout(root, n_subjects=24, stay_hours=40, seed=0):
    """Tiny raw cohort: one stay per subject, hourly vitals, labs with a
    pre-ICU ward draw, an infusion + bolus, urine records, and 2 CXRs per
    stay (one anchor-eligible at slot >= 24, plus a lateral that must be
    dropped)."""
    rng = np.random.default_rng(seed)
    base = _ts("2150-03-01 08:00")
    subs, hadms, stays = [], [], []
    adm_rows, pat_rows, icu_rows = [], [], []
    chart, lab, inputs, outputs = [], [], [], []
    meta_rows, chex_rows = [], []

    for i in range(n_subjects):
        sid, hid, stid = 10 + i, 100 + i, 1000 + i
        subs.append(sid)
        hadms.append(hid)
        stays.append(stid)
        admit = base + i * np.timedelta64(3, "D")
        intime = admit + 2 * H
        outtime = intime + stay_hours * H
        disch = outtime + 5 * H
        died = i == 1
        adm_rows.append({
            "subject_id": sid, "hadm_id": hid, "admittime": admit,
            "dischtime": disch,
            "deathtime": disch if died else pd.NaT,
            "admission_type": "EW EMER." if i % 2 else "ELECTIVE",
            "admission_location": "EMERGENCY ROOM",
            "discharge_location": "DIED" if died else "HOME",
            "insurance": "Medicare", "marital_status": "SINGLE",
            "race": "WHITE" if i % 3 else "BLACK/AFRICAN AMERICAN",
            "hospital_expire_flag": int(died)})
        pat_rows.append({
            "subject_id": sid, "gender": "M" if i % 2 else "F",
            "anchor_age": 50 + i, "anchor_year": 2150,
            "dod": disch if died else pd.NaT})
        icu_rows.append({
            "subject_id": sid, "hadm_id": hid, "stay_id": stid,
            "first_careunit": "Medical Intensive Care Unit (MICU)",
            "last_careunit": "Medical Intensive Care Unit (MICU)",
            "intime": intime, "outtime": outtime,
            "los": stay_hours / 24.0})

        for t in range(stay_hours):
            ct = intime + t * H + 10 * M
            chart.append({"subject_id": sid, "hadm_id": hid,
                          "stay_id": stid, "charttime": ct,
                          "itemid": 220045,
                          "valuenum": 70 + 10 * np.sin(t / 5) + i,
                          "valueuom": "bpm"})
            if t % 4 == 0:   # temperature charted in Fahrenheit
                chart.append({"subject_id": sid, "hadm_id": hid,
                              "stay_id": stid, "charttime": ct,
                              "itemid": 223761, "valuenum": 98.6 + 0.1 * i,
                              "valueuom": "°F"})
            if t % 2 == 0:   # arterial + noninvasive BP
                sbp = 115 + rng.normal(0, 3)
                dbp = 70 + rng.normal(0, 2)
                for iid, v in ((220050, sbp), (220051, dbp)):
                    chart.append({"subject_id": sid, "hadm_id": hid,
                                  "stay_id": stid, "charttime": ct,
                                  "itemid": iid, "valuenum": v,
                                  "valueuom": "mmHg"})
            if t % 6 == 0:   # complete GCS triple
                for iid, v in ((220739, 4), (223900, 5), (223901, 6)):
                    chart.append({"subject_id": sid, "hadm_id": hid,
                                  "stay_id": stid, "charttime": ct,
                                  "itemid": iid, "valuenum": v,
                                  "valueuom": "points"})
            if t % 3 == 0:   # SpO2 + FiO2 charted as a FRACTION
                chart.append({"subject_id": sid, "hadm_id": hid,
                              "stay_id": stid, "charttime": ct,
                              "itemid": 220277, "valuenum": 96.0,
                              "valueuom": "%"})
                chart.append({"subject_id": sid, "hadm_id": hid,
                              "stay_id": stid, "charttime": ct,
                              "itemid": 223835, "valuenum": 0.40,
                              "valueuom": "fraction"})

        # an impossible heart rate that the criteria table must drop
        chart.append({"subject_id": sid, "hadm_id": hid, "stay_id": stid,
                      "charttime": intime + 5 * H + 20 * M,
                      "itemid": 220045, "valuenum": 400.0,
                      "valueuom": "bpm"})

        # labs: sodium every 12 h in-ICU, one ward draw 6 h BEFORE intime
        for t in range(0, stay_hours, 12):
            lab.append({"subject_id": sid, "hadm_id": hid,
                        "charttime": intime + t * H + 30 * M,
                        "itemid": 50983, "valuenum": 140 + i,
                        "valueuom": "mEq/L"})
        lab.append({"subject_id": sid, "hadm_id": hid,
                    "charttime": intime - 6 * H, "itemid": 50912,
                    "valuenum": 1.0 + 0.1 * i, "valueuom": "mg/dL"})

        # crystalloid: 4-hour infusion + an instantaneous bolus, in L once
        inputs.append({"subject_id": sid, "hadm_id": hid, "stay_id": stid,
                       "starttime": intime + 2 * H, "endtime": intime + 6 * H,
                       "itemid": 225158, "amount": 1.0 if i == 0 else 1000.0,
                       "amountuom": "L" if i == 0 else "ml"})
        inputs.append({"subject_id": sid, "hadm_id": hid, "stay_id": stid,
                       "starttime": intime + 10 * H + 15 * M,
                       "endtime": intime + 10 * H + 15 * M,
                       "itemid": 225158, "amount": 250.0,
                       "amountuom": "ml"})

        # urine foley records every 4 h
        for t in range(4, stay_hours, 4):
            outputs.append({"subject_id": sid, "hadm_id": hid,
                            "stay_id": stid, "charttime": intime + t * H,
                            "itemid": 226559, "value": 200.0 + 10 * i,
                            "valueuom": "ml"})

        # CXRs: anchor at slot 30 (AP), early one at slot 2 (PA),
        # plus a LATERAL that the view filter must drop
        for k, (view, slot) in enumerate(
                (("AP", 30), ("PA", 2), ("LATERAL", 31))):
            ct = intime + slot * H + 5 * M
            meta_rows.append({
                "subject_id": sid, "study_id": 5000 + 10 * i + k,
                "dicom_id": f"im{i}_{k}", "ViewPosition": view,
                "StudyDate": int(pd.Timestamp(ct).strftime("%Y%m%d")),
                "StudyTime": float(pd.Timestamp(ct).strftime("%H%M%S"))})
            row = {"subject_id": sid, "study_id": 5000 + 10 * i + k}
            for j, c in enumerate(rm.CHEXPERT_TO_LABEL):
                row[c] = float(rng.choice([0.0, 1.0, -1.0, np.nan],
                                          p=[0.4, 0.4, 0.1, 0.1]))
            row["Edema"] = float(i % 2)      # main target always labeled
            chex_rows.append(row)

    _write(root, "hosp/admissions", pd.DataFrame(adm_rows))
    _write(root, "hosp/patients", pd.DataFrame(pat_rows))
    _write(root, "hosp/labevents", pd.DataFrame(lab))
    _write(root, "icu/icustays", pd.DataFrame(icu_rows))
    _write(root, "icu/chartevents", pd.DataFrame(chart))
    _write(root, "icu/inputevents", pd.DataFrame(inputs))
    _write(root, "icu/outputevents", pd.DataFrame(outputs))
    _write(root, "cxr/mimic-cxr-2.0.0-metadata", pd.DataFrame(meta_rows))
    _write(root, "cxr/mimic-cxr-2.0.0-chexpert", pd.DataFrame(chex_rows))
    # CXLSeg lung masks for the AP images only — the PA/LATERAL rows stay
    # unmatched so the left-join semantics (NaN path, has_lung_mask=False)
    # are exercised end-to-end (cxr_db cells 2-8 + 30)
    seg_rows = [{"subject_id": r["subject_id"], "study_id": r["study_id"],
                 "dicom_id": r["dicom_id"],
                 "DicomPath": f"{r['dicom_id']}.png"}
                for r in meta_rows if r["ViewPosition"] == "AP"]
    _write(root, "cxr/CXLSeg-mask", pd.DataFrame(seg_rows))
    return root


def write_jpegs_for_artifacts(artifacts_dir: str, out_root: str,
                              side: int = 96, seed: int = 7) -> int:
    """One tiny distinct JPEG per catalog image id of a produced cohort,
    in the ``JpegStore`` ``{root}/{id}.jpg`` layout — lets the rehearsal
    drive the real-JPEG training tier (``--cxr_jpeg_root``) without
    MIMIC-CXR files. Returns the number written."""
    from PIL import Image
    z = np.load(os.path.join(artifacts_dir, "cohort.npz"),
                allow_pickle=True)
    ids = np.unique(np.concatenate(
        [np.asarray(z["cat_image_ids"], np.int64),
         np.asarray(z["an_image_ids"], np.int64)]))
    ids = ids[ids >= 0]
    os.makedirs(out_root, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in ids:
        arr = (rng.random((side, side)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(np.stack([arr] * 3, -1)).save(buf, format="JPEG",
                                                      quality=90)
        with open(os.path.join(out_root, f"{int(i)}.jpg"), "wb") as f:
            f.write(buf.getvalue())
    return len(ids)


def main(argv=None):
    ap = argparse.ArgumentParser("synthetic raw-MIMIC layout generator")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_subjects", type=int, default=24)
    ap.add_argument("--stay_hours", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jpegs_for", default="",
                    help="artifacts dir of a finished preprocess run: "
                         "write {id}.jpg files into --out instead of CSVs")
    args = ap.parse_args(argv)
    if args.jpegs_for:
        n = write_jpegs_for_artifacts(args.jpegs_for, args.out)
        print(f"[synthetic_raw] wrote {n} JPEGs to {args.out}")
    else:
        make_raw_layout(args.out, args.n_subjects, args.stay_hours,
                        args.seed)
        print(f"[synthetic_raw] raw MIMIC-style layout at {args.out}")


if __name__ == "__main__":
    main()
