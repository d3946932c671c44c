"""Executable L0: raw MIMIC-IV-layout tables → reference artifact frames.

The reference's offline preprocessing lives in ~6 pandas notebooks
(`preprocess/[Full data]multimodal_preprocessing_groundwork.ipynb`,
`preprocess/cxr_db.ipynb`, `duett/[full]input_preprocess.ipynb`,
`duett/[subject]input_preprocess.ipynb` — SURVEY §2.3). The *semantics* of
those notebooks already exist in this package as unit-tested array functions
(:mod:`.static_info`, :mod:`.preprocess`, :mod:`.demographics`,
:mod:`.cxr_catalog`); what was missing is the ORCHESTRATION — one executable
chain that takes a directory laid out like a raw MIMIC-IV + MIMIC-CXR
download and produces the exact artifact frames the reference's training
layer consumes (``final_df`` / ``static_full`` / ``final_cxr_df``), then
hands off to :func:`..data.ingest.from_reference_frames` →
``cohort.npz`` + ``meta_with_stats.pkl`` so the training path never touches
pandas again.

This module is that chain. It is deliberately host-side columnar
numpy/pandas (executed ONCE per cohort) — everything downstream is
fixed-shape arrays on device. Cell citations below point into the reference
notebooks so each stage can be audited line by line:

- itemid → variable table: groundwork cell 36 (``my_query_dict``).
- unit fixes: cells 60 (ck_mb '%'), 62 (°F→°C), 74 (inch→cm), 85 (fluid
  L→mL), 95-96 (FiO2 fraction→%), 107 (albumin 5%→25% ÷5).
- outlier criteria: cell 98's table (recovered from the notebook's stored
  output) + the 2%/98% percentile fallback of cell 101.
- GCS: cell 217 — per-(stay, charttime) sum of the 3 components, complete
  triples only.
- BP: cell 148 (ABP-priority sbp/dbp/map + derived MAP) and cell 211/212
  (within-slot LAST aggregation, sbp>dbp sanity filter).
- urine: cells 113-125 (pivot per itemid, 227488 sign flip, negatives→NaN,
  sum, 3000 mL hard cap, interval construction from consecutive charttimes,
  top-2% rate cut) + cell 252 (overlap-proportional slot distribution).
- fluids: cell 202 (overlap-proportional amounts, bolus containment,
  decision-point counts).
- chart/lab slot binning: cells 219-246 (valid-itemid mapping, lab→stay
  assignment, ward T0 backfill, dedupe keep-last, within-slot LAST).
- slot grid: cell 180 (hourly slots from intime to outtime).
- wide assembly + variable set: input_preprocess cells 76-94 (pivot,
  spo2_fio2 derivation, BNP/d-dimer/hematocrit drop ⇒ 34 TS variables).
- static frame: input_preprocess cell 71 (admission type/location/careunit
  grouping maps, race/gender one-hots, 18≤age≤90 filter) on top of
  :mod:`.static_info`'s repaired times + death reconciliation.
- CXR: cxr_db cells 19-28/53 (AP/PA, cxrtime, slot assignment) via
  :mod:`.cxr_catalog`.

Real PHI is not present in this environment; ``tests/test_raw_mimic.py``
executes the full chain on a synthetic raw-layout fixture and trains on the
resulting cohort, so the day credentialed data is available the run is
``python -m multimodal_edema_prediction_tpu.cli.preprocess --raw_root …``.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from . import static_info as si
from .cxr_catalog import (apply_uncertain_policy, assign_cxr_to_slots,
                          filter_ap_pa, parse_cxrtime)

HOUR = np.timedelta64(1, "h")

# =============================================================================
# Tables transcribed from the reference (groundwork cells 36 / 98;
# input_preprocess cells 71 / 85-94). Data, not code.
# =============================================================================
QUERY_DICT: Dict[str, List[int]] = {
    "heart_rate": [220045],
    "sbp": [220050, 225309, 220179],
    "dbp": [220051, 225310, 220180],
    "map": [220052, 220181, 225312],
    "temperature": [50825, 223761, 223762],
    "gcs": [220739, 223900, 223901],
    "resp_rate": [224690, 220210],
    "o2sat": [50817, 220277, 220227],
    "pao2": [50821, 220224],
    "fio2": [50816, 223835],
    "paco2": [50818, 52040, 220235],
    "wbc": [51300, 51301, 51755, 51756, 220546],
    "platelets": [51265, 51704, 227457],
    "hematocrit": [51221, 51638, 51639, 52028, 50810, 226540, 220545],
    "hemoglobin": [50811, 51222, 51640, 220228],
    "pt_inr": [51237, 51675, 227467],
    "ptt": [51275, 52923, 227466],
    "d-dimer": [52551, 51196, 50915, 225636],
    "sodium": [50983, 52623, 50824, 52455, 220645, 228389, 226534, 228390],
    "potassium": [50971, 52610, 50822, 52452, 227442, 227464],
    "chloride": [220367, 220602, 225166, 226536, 228385, 228386, 229618],
    "ca_ion": [50808, 51624, 225667],
    "glucose": [50809, 50931, 52569, 52027, 220621, 225664, 226537, 228338],
    "art_ph": [50820, 223830],
    "base_excess": [50802, 224828],
    "anion_gap": [50868, 52500, 227073],
    "lactate": [50813, 52442, 225668],
    "bilirubin": [50885, 53089, 225690],
    "creatinine": [50912, 52546, 52024, 220615],
    "bun": [51006, 52647, 225624],
    "albumin": [50862, 52022, 53085, 53138, 227456],
    "ast": [53088, 50878, 220587],
    "alt": [50861, 53084, 220644],
    "troponin-T": [51003, 227429],
    "Brain Natiuretic Peptide": [227446],
    "NTproBNP": [50963],
    "ck_mb": [50911, 227445],
    "ck_mb_frac": [50908, 225628],
    "urine": [226557, 226558, 226559, 226560, 226561, 226563, 226564,
              226565, 226567, 226584, 227488, 227489],
    "fluid_alb": [220862, 220864],
    "fluid_cyst": [220949, 220950, 220952, 225158, 225159, 225161, 225828,
                   225797, 225799, 225823, 225825, 225827, 225830, 226089,
                   225941, 225943, 225944, 226361, 226363, 226364, 226375,
                   226377, 226452, 226453, 227533, 228140, 228141, 228142,
                   228341, 220955, 220967, 220968, 220953],
    "weight": [224639],
    "height": [226707, 226730],
}

# variables fed to resampling_chart — everything except the ones with
# dedicated pipelines / non-TS roles (groundwork cell 219 exclude set).
CHART_LAB_EXCLUDE = {"specimen", "height", "weight", "sbp", "dbp", "map",
                     "NTproBNP", "ck_mb_frac", "gcs", "fluid_alb",
                     "fluid_cyst", "urine"}

# name → (lb, ub, lb_inclusive_drop, ub_inclusive_drop); inclusion=1 means
# the boundary value itself is ALSO an outlier (cell 98 stored output).
OUTLIER_CRITERIA: Dict[str, Tuple[float, float, int, int]] = {
    "heart_rate": (0.0, 300.0, 1, 1),
    "resp_rate": (0.0, 60.0, 1, 0),
    "temperature": (32.0, 43.0, 0, 1),
    "sbp": (0.0, 300.0, 1, 0),
    "dbp": (10.0, 175.0, 0, 0),
    "pao2": (10.0, 500.0, 0, 0),
    "fio2": (20.98, 100.0, 0, 0),
    "bilirubin": (0.0, 100.0, 1, 0),
    "platelets": (0.0, 1500.0, 0, 0),
    "creatinine": (0.0, 40.0, 0, 0),
    "lactate": (0.0, 30.0, 0, 0),
    "bun": (0.0, 300.0, 1, 0),
    "art_ph": (6.5, 7.8, 0, 0),
    "wbc": (0.0, 200.0, 0, 0),
    "paco2": (0.0, 200.0, 1, 0),
    "hemoglobin": (0.0, 30.0, 1, 0),
    "hematocrit": (0.0, 100.0, 1, 1),
    "potassium": (0.0, 10.0, 1, 0),
    "sodium": (80.0, 200.0, 0, 0),
    "height": (140.0, 240.0, 0, 0),
    "weight": (30.0, 250.0, 0, 0),
    "glucose": (20.0, 2000.0, 0, 0),
    "albumin": (0.6, 6.0, 0, 0),
    "alt": (2.0, 10000.0, 0, 0),
    "ast": (6.0, 20000.0, 0, 0),
    "anion_gap": (5.0, 50.0, 0, 0),
    "chloride": (50.0, 175.0, 0, 0),
    "o2sat": (0.0, 100.0, 0, 0),
    "ca_ion": (1.0, 10.0, 0, 0),
    "gcs_eye": (1.0, 4.0, 0, 0),
    "gcs_verbal": (1.0, 5.0, 0, 0),
    "gcs_motor": (1.0, 6.0, 0, 0),
}
GCS_SUB = {220739: "gcs_eye", 223900: "gcs_verbal", 223901: "gcs_motor"}

# input_preprocess cell 71 grouping maps.
ADMISSION_TYPE_MAP = {
    "EW EMER.": "EMERGENCY", "DIRECT EMER.": "EMERGENCY",
    "URGENT": "EMERGENCY",
    "OBSERVATION ADMIT": "OBSERVATION", "EU OBSERVATION": "OBSERVATION",
    "DIRECT OBSERVATION": "OBSERVATION",
    "AMBULATORY OBSERVATION": "OBSERVATION",
    "ELECTIVE": "ELECTIVE", "SURGICAL SAME DAY ADMISSION": "ELECTIVE",
}
ADMISSION_LOCATION_MAP = {
    "EMERGENCY ROOM": "EMERGENCY", "WALK-IN/SELF REFERRAL": "EMERGENCY",
    "PHYSICIAN REFERRAL": "REFERRAL", "CLINIC REFERRAL": "REFERRAL",
    "TRANSFER FROM HOSPITAL": "TRANSFER",
    "TRANSFER FROM SKILLED NURSING FACILITY": "TRANSFER",
    "AMBULATORY SURGERY TRANSFER": "TRANSFER",
    "PROCEDURE SITE": "PROCEDURE_PACU", "PACU": "PROCEDURE_PACU",
    "INFORMATION NOT AVAILABLE": "OTHER_UNKNOWN",
    "INTERNAL TRANSFER TO OR FROM PSYCH": "OTHER_UNKNOWN",
}
CAREUNIT_GROUPS = {
    "MICU": ["Medical Intensive Care Unit (MICU)", "Medicine", "Med/Surg"],
    "SICU": ["Surgical Intensive Care Unit (SICU)",
             "Surgery/Vascular/Intermediate", "Surgery/Trauma"],
    "MICU_SICU": ["Medical/Surgical Intensive Care Unit (MICU/SICU)",
                  "Intensive Care Unit (ICU)"],
    "CARDIAC": ["Cardiac Vascular Intensive Care Unit (CVICU)",
                "Coronary Care Unit (CCU)",
                "Medicine/Cardiology Intermediate"],
    "TSICU": ["Trauma SICU (TSICU)"],
    "NEURO": ["Neuro Intermediate", "Neuro Stepdown",
              "Neuro Surgical Intensive Care Unit (Neuro SICU)",
              "Neurology"],
}

# input_preprocess cells 85/88/94: 33 STD vars − {BNP, d-dimer, hematocrit}
# + spo2_fio2 ⇒ 31 value-pivot vars; EXTRA {fluid_cumul, map, urine} ⇒ 34.
STD_VARS_PIVOT = [
    "albumin", "alt", "anion_gap", "art_ph", "ast", "base_excess",
    "bilirubin", "bun", "ca_ion", "chloride", "ck_mb", "creatinine",
    "fio2", "gcs", "glucose", "heart_rate", "hemoglobin", "lactate",
    "o2sat", "paco2", "pao2", "platelets", "potassium", "pt_inr", "ptt",
    "resp_rate", "sodium", "temperature", "troponin-T", "wbc",
]
STD_VARS = STD_VARS_PIVOT + ["spo2_fio2"]
EXTRA_VARS = {"fluid_cumul": "count_fluid_cumul", "map": "count_map",
              "urine": "count_urine"}
ALL_VARS = STD_VARS + list(EXTRA_VARS.keys())
ALL_COUNTS = [f"count_{v}" for v in STD_VARS] + list(EXTRA_VARS.values())

# mimic-cxr-2.0.0-chexpert column → reference final_df label column.
CHEXPERT_TO_LABEL = {
    "Edema": "label_edema",
    "Cardiomegaly": "label_cardiomegaly",
    "Pleural Effusion": "label_effusion",
    "Pneumonia": "label_pneumonia",
    "Atelectasis": "label_atelectasis",
    "Lung Opacity": "label_opacity",
    "Consolidation": "label_consolidation",
}


# =============================================================================
# IO
# =============================================================================
RAW_TABLES = {
    "admissions": ("hosp/admissions",),
    "patients": ("hosp/patients",),
    "labevents": ("hosp/labevents",),
    "omr": ("hosp/omr",),
    "diagnoses_icd": ("hosp/diagnoses_icd",),
    "icustays": ("icu/icustays",),
    "chartevents": ("icu/chartevents",),
    "inputevents": ("icu/inputevents",),
    "outputevents": ("icu/outputevents",),
    "cxr_metadata": ("cxr/mimic-cxr-2.0.0-metadata", "cxr/metadata"),
    "cxr_chexpert": ("cxr/mimic-cxr-2.0.0-chexpert", "cxr/chexpert"),
    # CXLSeg lung segmentation masks (chest-x-ray-segmentation 1.0.0;
    # cxr_db cells 2-8) — optional: the join degrades to no mask columns
    "cxr_seg_mask": ("cxr/CXLSeg-mask", "cxr/seg_mask"),
}
OPTIONAL_TABLES = {"omr", "diagnoses_icd", "cxr_seg_mask"}
_TIME_COLS = ("admittime", "dischtime", "deathtime", "intime", "outtime",
              "charttime", "starttime", "endtime", "dod")


def read_table(root: str, stems: Sequence[str]) -> Optional[pd.DataFrame]:
    """Read ``<root>/<stem>.{ftr,feather,csv,csv.gz}`` — first hit wins;
    the reference converts csv.gz → feather up front (groundwork cell 3)."""
    for stem in stems:
        base = os.path.join(root, stem)
        for ext, reader in ((".ftr", pd.read_feather),
                            (".feather", pd.read_feather),
                            (".csv", pd.read_csv),
                            (".csv.gz", pd.read_csv)):
            p = base + ext
            if os.path.exists(p):
                df = reader(p)
                for c in df.columns:
                    if c in _TIME_COLS:
                        df[c] = pd.to_datetime(df[c])
                return df
    return None


def load_raw_tables(root: str) -> Dict[str, pd.DataFrame]:
    out = {}
    for name, stems in RAW_TABLES.items():
        df = read_table(root, stems)
        if df is None and name not in OPTIONAL_TABLES:
            raise FileNotFoundError(
                f"required raw table {name!r} not found under {root} "
                f"(tried {stems} with .ftr/.csv/.csv.gz)")
        if df is not None:
            out[name] = df
    return out


# =============================================================================
# Slot grid (groundwork cell 180 — vectorized, no per-row python)
# =============================================================================
def build_slot_grid(icustays: pd.DataFrame) -> pd.DataFrame:
    """Hourly ``slot_idx`` grid per stay from intime to outtime."""
    n_slots = np.ceil((icustays["outtime"] - icustays["intime"])
                      / HOUR).astype(int).clip(lower=0).to_numpy()
    rep = np.repeat(np.arange(len(icustays)), n_slots)
    slot = np.concatenate([np.arange(n) for n in n_slots]) \
        if len(icustays) else np.zeros(0, int)
    intime = icustays["intime"].to_numpy()[rep]
    return pd.DataFrame({
        "subject_id": icustays["subject_id"].to_numpy()[rep],
        "hadm_id": icustays["hadm_id"].to_numpy()[rep],
        "stay_id": icustays["stay_id"].to_numpy()[rep],
        "slot_idx": slot,
        "slot_start": intime + slot * HOUR,
        "slot_end": intime + (slot + 1) * HOUR,
    })


def _stay_index(icustays: pd.DataFrame):
    ids = icustays["stay_id"].to_numpy()
    return ({int(s): t for s, t in zip(ids, icustays["intime"].to_numpy())},
            {int(s): t for s, t in zip(ids, icustays["outtime"].to_numpy())})


def _slot_of(df: pd.DataFrame, icustays: pd.DataFrame,
             time_col: str = "charttime") -> np.ndarray:
    """Vectorized containment: slot k iff charttime ∈ [intime+k, intime+k+1)
    and the slot exists (< ceil(outtime-intime)); −1 otherwise. Equivalent to
    the notebook's merge_asof + [slot_start, slot_end) mask (cell 231)."""
    intime, outtime = _stay_index(icustays)
    t_in = np.array([intime.get(int(s), np.datetime64("NaT"))
                     for s in df["stay_id"]], dtype="datetime64[ns]")
    t_out = np.array([outtime.get(int(s), np.datetime64("NaT"))
                      for s in df["stay_id"]], dtype="datetime64[ns]")
    dt = (df[time_col].to_numpy() - t_in) / HOUR
    n_slots = np.ceil((t_out - t_in) / HOUR)
    slot = np.floor(dt)
    ok = np.isfinite(dt) & (slot >= 0) & (slot < n_slots)
    return np.where(ok, slot, -1).astype(np.int64)


# =============================================================================
# Unit standardization + outlier policy (cells 52-110)
# =============================================================================
def fix_units(chart: pd.DataFrame, lab: pd.DataFrame,
              inputev: pd.DataFrame
              ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    chart = chart.dropna(subset=["valuenum"]).copy()
    lab = lab.dropna(subset=["valuenum"]).copy()
    inputev = inputev.copy()
    uom_c = chart.get("valueuom", pd.Series("", index=chart.index))
    uom_l = lab.get("valueuom", pd.Series("", index=lab.index))

    # ck_mb rows recorded as '%' are a different assay — drop (cell 60).
    chart = chart[~(chart["itemid"].isin(QUERY_DICT["ck_mb"])
                    & (uom_c == "%"))]
    # °F → °C (cell 62)
    cond = chart["itemid"].isin(QUERY_DICT["temperature"]) \
        & (chart.get("valueuom", "") == "°F")
    chart.loc[cond, "valuenum"] = (chart.loc[cond, "valuenum"] - 32) * 5 / 9
    # height inch → cm (cell 74)
    cond = chart["itemid"].isin(QUERY_DICT["height"]) \
        & (chart.get("valueuom", "") == "Inch")
    chart.loc[cond, "valuenum"] = chart.loc[cond, "valuenum"] * 2.54
    # FiO2 recorded as a fraction → percent, both sources (cells 95-96)
    for df in (chart, lab):
        cond = df["itemid"].isin(QUERY_DICT["fio2"]) \
            & (df["valuenum"] >= 0.21) & (df["valuenum"] <= 1)
        df.loc[cond, "valuenum"] = df.loc[cond, "valuenum"] * 100
    del uom_l

    if len(inputev):
        # fluid volumes to mL (cell 85)
        cond = inputev["itemid"].isin(QUERY_DICT["fluid_cyst"]) \
            & (inputev.get("amountuom", "") == "L")
        inputev.loc[cond, "amount"] = inputev.loc[cond, "amount"] * 1000
        # Albumin 5% (220864) → equivalent 25% amount (cell 107)
        cond = inputev["itemid"] == 220864
        inputev.loc[cond, "amount"] = inputev.loc[cond, "amount"] / 5
    return chart, lab, inputev


def _criteria_mask(values: np.ndarray, crit) -> np.ndarray:
    """True = outlier (cell 101: strict bound violation, plus the bound
    itself when the inclusion flag is set)."""
    lb, ub, lb_incl, ub_incl = crit
    bad = (values > ub) | (values < lb)
    if ub_incl:
        bad |= values == ub
    if lb_incl:
        bad |= values == lb
    return bad


def remove_outliers(chart: pd.DataFrame, lab: pd.DataFrame
                    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Per-variable lb/ub criteria; GCS bounded per subcomponent; variables
    without criteria get the 2%/98% percentile trim (cell 101)."""
    drop_c = np.zeros(len(chart), bool)
    drop_l = np.zeros(len(lab), bool)
    vc = chart["valuenum"].to_numpy()
    vl = lab["valuenum"].to_numpy()
    for item, itemids in QUERY_DICT.items():
        if item == "gcs":
            for iid, sub in GCS_SUB.items():
                cond = (chart["itemid"] == iid).to_numpy()
                drop_c |= cond & _criteria_mask(vc, OUTLIER_CRITERIA[sub])
            continue
        in_c = chart["itemid"].isin(itemids).to_numpy()
        in_l = lab["itemid"].isin(itemids).to_numpy()
        if item in OUTLIER_CRITERIA:
            drop_c |= in_c & _criteria_mask(vc, OUTLIER_CRITERIA[item])
            drop_l |= in_l & _criteria_mask(vl, OUTLIER_CRITERIA[item])
        else:
            for in_x, vx, drop_x in ((in_c, vc, drop_c), (in_l, vl, drop_l)):
                if in_x.sum() > 0:
                    hi = np.quantile(vx[in_x], 0.98)
                    lo = np.quantile(vx[in_x], 0.02)
                    drop_x |= in_x & ((vx > hi) | (vx < lo))
    return chart[~drop_c].copy(), lab[~drop_l].copy()


# =============================================================================
# Per-modality streams
# =============================================================================
def build_gcs(chart: pd.DataFrame) -> pd.DataFrame:
    """Complete (eye, verbal, motor) triples summed per (stay, charttime)
    (cell 217)."""
    g = chart[chart["itemid"].isin(GCS_SUB)].groupby(
        ["stay_id", "charttime"], as_index=False).agg(
        valuenum=("valuenum", "sum"), n=("itemid", "count"))
    g = g[g["n"] == 3].drop(columns="n")
    g["feature_name"] = "gcs"
    return g[["stay_id", "feature_name", "charttime", "valuenum"]]


def build_bp(chart: pd.DataFrame, icustays: pd.DataFrame) -> pd.DataFrame:
    """ABP-priority sbp/dbp/map at charttime granularity (cell 148), then
    within-slot LAST + count + sbp>dbp filter (cells 211-212). Returns the
    full slot grid left-joined (missing slots → NaN, bp_count 0)."""
    ids = [220050, 225309, 220179, 220051, 225310, 220180,
           220052, 225312, 220181]
    bp = chart[chart["itemid"].isin(ids)]
    if not len(bp):
        grid = build_slot_grid(icustays)[["stay_id", "slot_idx"]]
        grid[["sbp", "dbp", "map"]] = np.nan
        grid["bp_count"] = 0
        return grid
    wide = bp.pivot_table(index=["stay_id", "charttime"], columns="itemid",
                          values="valuenum").reset_index()

    def col_mean(cols):
        exist = [c for c in cols if c in wide.columns]
        return wide[exist].mean(axis=1) if exist \
            else pd.Series(np.nan, index=wide.index)

    def first_valid(cols):
        exist = [c for c in cols if c in wide.columns]
        return wide[exist].bfill(axis=1).iloc[:, 0] if exist \
            else pd.Series(np.nan, index=wide.index)

    wide["sbp"] = col_mean([220050, 225309]).fillna(first_valid([220179]))
    wide["dbp"] = col_mean([220051, 225310]).fillna(first_valid([220180]))
    wide["map"] = col_mean([220052, 225312]).fillna(first_valid([220181]))
    calc = wide["map"].isna() & wide["sbp"].notna() & wide["dbp"].notna()
    wide.loc[calc, "map"] = (wide.loc[calc, "sbp"]
                             + 2 * wide.loc[calc, "dbp"]) / 3

    wide["slot_idx"] = _slot_of(wide, icustays)
    wide = wide[wide["slot_idx"] >= 0].sort_values(
        ["stay_id", "slot_idx", "charttime"])
    grouped = wide.groupby(["stay_id", "slot_idx"], as_index=False).agg(
        sbp=("sbp", "last"), dbp=("dbp", "last"), map=("map", "last"),
        bp_count=("sbp", "count"))
    grouped = grouped[grouped["sbp"] > grouped["dbp"]]
    grid = build_slot_grid(icustays)[["stay_id", "slot_idx"]]
    out = grid.merge(grouped, on=["stay_id", "slot_idx"], how="left")
    out["bp_count"] = out["bp_count"].fillna(0).astype(int)
    return out


def build_urine(outputev: pd.DataFrame, icustays: pd.DataFrame
                ) -> pd.DataFrame:
    """Cells 113-125 + 252: per-charttime urine totals → intervals between
    consecutive measurements → overlap-proportional hourly distribution."""
    grid = build_slot_grid(icustays)
    empty = grid[["stay_id", "slot_idx"]].copy()
    empty["urine"] = 0.0
    empty["urine_count"] = 0
    ur = outputev[outputev["itemid"].isin(QUERY_DICT["urine"])].copy()
    if not len(ur):
        return empty
    # pivot per itemid; 227488 (irrigant in) flips sign; other negatives→NaN
    wide = ur.pivot_table(index=["stay_id", "charttime"], columns="itemid",
                          values="value", aggfunc="sum").reset_index()
    if 227488 in wide.columns:
        wide[227488] = -wide[227488]
    for iid in QUERY_DICT["urine"]:
        if iid in wide.columns and iid != 227488:
            wide.loc[wide[iid] < 0, iid] = np.nan
    cols = [c for c in QUERY_DICT["urine"] if c in wide.columns]
    wide["urine"] = wide[cols].sum(axis=1, min_count=1)
    wide = wide.dropna(subset=["urine"])[["stay_id", "charttime", "urine"]]
    wide.loc[wide["urine"] > 3000, "urine"] = np.nan   # bag-size hard cap
    wide = wide.dropna(subset=["urine"])

    intime, _ = _stay_index(icustays)
    wide["intime"] = np.array(
        [intime.get(int(s), np.datetime64("NaT")) for s in wide["stay_id"]],
        dtype="datetime64[ns]")
    wide = wide.dropna(subset=["intime"])
    off = (wide["charttime"] - wide["intime"]) / HOUR
    wide = wide[off >= -24].sort_values(["stay_id", "charttime"])

    # starttime = previous charttime + 1 min (first: intime − 60 min)
    prev = wide.groupby("stay_id")["charttime"].shift(1)
    start = prev + np.timedelta64(1, "m")
    first = prev.isna()
    start[first] = wide.loc[first, "intime"] - np.timedelta64(60, "m")
    wide["starttime"] = start
    wide["endtime"] = wide["charttime"]
    dur = (wide["endtime"] - wide["starttime"]) / HOUR
    rate = wide["urine"] / dur
    cutoff = rate.quantile(0.98)
    wide = wide[~(rate > cutoff)]

    dist = _distribute_intervals(wide, grid, "urine")
    if not len(dist):
        return empty
    out = grid[["stay_id", "slot_idx"]].merge(
        dist.rename(columns={"amount": "urine", "count": "urine_count"}),
        on=["stay_id", "slot_idx"], how="left")
    out["urine"] = out["urine"].fillna(0.0).clip(lower=0)
    out["urine_count"] = out["urine_count"].fillna(0).astype(int)
    return out


def build_fluid(inputev: pd.DataFrame, icustays: pd.DataFrame
                ) -> pd.DataFrame:
    """Crystalloid infusions distributed over overlapped slots; boluses go
    to the containing slot; counts = decision points (cell 202)."""
    grid = build_slot_grid(icustays)
    fl = inputev[inputev["itemid"].isin(QUERY_DICT["fluid_cyst"])].copy()
    fl = fl[fl["amount"] > 0].rename(columns={"amount": "fluid_cumul"})
    dist = _distribute_intervals(fl, grid, "fluid_cumul")
    out = grid[["stay_id", "slot_idx"]].merge(
        dist.rename(columns={"amount": "fluid_cumul",
                             "count": "count_fluid_cumul"}),
        on=["stay_id", "slot_idx"], how="left") if len(dist) \
        else grid[["stay_id", "slot_idx"]].assign(fluid_cumul=np.nan,
                                                  count_fluid_cumul=np.nan)
    out["fluid_cumul"] = out["fluid_cumul"].fillna(0.0)
    out["count_fluid_cumul"] = out["count_fluid_cumul"].fillna(0).astype(int)
    return out


def _distribute_intervals(df: pd.DataFrame, grid: pd.DataFrame,
                          value_col: str) -> pd.DataFrame:
    """Shared overlap-proportional slot distribution (cells 202 / 252):
    momentary records (start == end) land fully in their containing slot;
    interval records contribute ``amount · overlap/total`` per slot; the
    per-slot count sums records whose decision point falls in the slot."""
    if not len(df):
        return pd.DataFrame(columns=["stay_id", "slot_idx", "amount",
                                     "count"])
    m = df.merge(grid, on="stay_id", how="inner")
    ov_start = np.maximum(m["starttime"].to_numpy(),
                          m["slot_start"].to_numpy())
    ov_end = np.minimum(m["endtime"].to_numpy(), m["slot_end"].to_numpy())
    ov_h = np.clip((ov_end - ov_start) / HOUR, 0, None)
    tot_h = (m["endtime"].to_numpy() - m["starttime"].to_numpy()) / HOUR
    keep = tot_h >= 0
    m, ov_h, tot_h = m[keep], ov_h[keep], tot_h[keep]
    momentary = tot_h == 0
    st = m["starttime"].to_numpy()
    en = m["endtime"].to_numpy()
    s0 = m["slot_start"].to_numpy()
    s1 = m["slot_end"].to_numpy()
    in_slot = (st >= s0) & (st < s1)
    amount = np.where(momentary, np.where(in_slot, m[value_col], 0.0),
                      m[value_col] * np.where(tot_h > 0, ov_h
                                              / np.where(tot_h > 0, tot_h, 1),
                                              0.0))
    measured_here = np.where(momentary, in_slot, (en > s0) & (en <= s1))
    m = m.assign(amount=amount, measured=measured_here)
    m = m[m["amount"] != 0]
    return m.groupby(["stay_id", "slot_idx"], as_index=False).agg(
        amount=("amount", "sum"), count=("measured", "sum"))


def bin_chart_lab(chart: pd.DataFrame, lab: pd.DataFrame,
                  icustays: pd.DataFrame) -> pd.DataFrame:
    """Cells 219-246: itemid→feature mapping, lab assignment to stays by
    hadm + containment, GCS concat, dedupe keep-last per (stay, feature,
    charttime), within-slot LAST + count, ward T0 backfill, fillna 0.
    Returns long frame [stay_id, slot_idx, feature_name, value, count]."""
    itemid_to_var = {iid: v for v, ids in QUERY_DICT.items() for iid in ids
                     if v not in CHART_LAB_EXCLUDE}
    valid = set(itemid_to_var)

    c = chart[chart["itemid"].isin(valid)].copy()
    c["feature_name"] = c["itemid"].map(itemid_to_var)
    c = c[["stay_id", "feature_name", "charttime", "valuenum"]]
    c = pd.concat([c, build_gcs(chart)], ignore_index=True)

    # labevents carry hadm_id but no stay_id: containment assignment
    l = lab[lab["itemid"].isin(valid)].copy()
    l["feature_name"] = l["itemid"].map(itemid_to_var)
    stays = icustays[["hadm_id", "stay_id", "intime", "outtime"]]
    li = l.merge(stays, on="hadm_id", how="inner")
    in_icu = (li["charttime"] >= li["intime"]) \
        & (li["charttime"] < li["outtime"])
    l_icu = li[in_icu][["stay_id", "feature_name", "charttime", "valuenum"]]

    combined = pd.concat([c, l_icu], ignore_index=True)
    combined = combined.drop_duplicates(
        subset=["stay_id", "feature_name", "charttime"], keep="last")
    combined["slot_idx"] = _slot_of(combined, icustays)
    combined = combined[combined["slot_idx"] >= 0].sort_values(
        ["stay_id", "feature_name", "slot_idx", "charttime"])
    grouped = combined.groupby(["stay_id", "feature_name", "slot_idx"],
                               as_index=False).agg(
        value=("valuenum", "last"), count=("valuenum", "count"))

    # ward labs in the 24 h before ICU admission → closest value per
    # feature backfills slot 0 where the ICU value is missing (cell 222/237)
    pre = li[(li["charttime"] >= li["intime"] - np.timedelta64(24, "h"))
             & (li["charttime"] < li["intime"])].copy()
    if len(pre):
        pre["tdiff"] = (pre["intime"] - pre["charttime"]).abs()
        idx = pre.groupby(["stay_id", "feature_name"])["tdiff"].idxmin()
        ward = pre.loc[idx, ["stay_id", "feature_name", "valuenum"]]
        ward = ward.rename(columns={"valuenum": "value_ward"})
        ward["slot_idx"] = 0
        grouped = grouped.merge(
            ward, on=["stay_id", "feature_name", "slot_idx"], how="outer")
        fill = grouped["value"].isna() & grouped["value_ward"].notna()
        grouped.loc[fill, "value"] = grouped.loc[fill, "value_ward"]
        grouped.loc[fill, "count"] = 1
        grouped = grouped.drop(columns="value_ward")
    grouped["count"] = grouped["count"].fillna(0).astype(int)
    grouped["value"] = grouped["value"].fillna(0.0)
    return grouped


# =============================================================================
# Wide assembly (input_preprocess cells 73-94)
# =============================================================================
def assemble_icu_events(binned: pd.DataFrame, bp: pd.DataFrame,
                        fluid: pd.DataFrame, urine: pd.DataFrame,
                        icustays: pd.DataFrame) -> pd.DataFrame:
    grid = build_slot_grid(icustays)[["subject_id", "hadm_id", "stay_id",
                                      "slot_idx"]]
    wide = binned.pivot_table(index=["stay_id", "slot_idx"],
                              columns="feature_name",
                              values=["value", "count"],
                              aggfunc="first")
    wide.columns = [c[1] if c[0] == "value" else f"count_{c[1]}"
                    for c in wide.columns]
    wide = wide.reset_index()

    df = grid.merge(wide, on=["stay_id", "slot_idx"], how="left")
    df = df.merge(fluid, on=["stay_id", "slot_idx"], how="left")
    df = df.merge(bp[["stay_id", "slot_idx", "map", "bp_count"]]
                  .rename(columns={"bp_count": "count_map"}),
                  on=["stay_id", "slot_idx"], how="left")
    df = df.merge(urine.rename(columns={"urine_count": "count_urine"}),
                  on=["stay_id", "slot_idx"], how="left")

    for v in STD_VARS_PIVOT:
        if v not in df.columns:
            df[v] = 0.0
            df[f"count_{v}"] = 0
    df[STD_VARS_PIVOT] = df[STD_VARS_PIVOT].fillna(0.0)
    cnt = [f"count_{v}" for v in STD_VARS_PIVOT]
    df[cnt] = df[cnt].fillna(0).astype(int)
    for v in ("fluid_cumul", "map", "urine"):
        df[v] = df[v].fillna(0.0)
        df[EXTRA_VARS[v]] = df[EXTRA_VARS[v]].fillna(0).astype(int)

    # derived spo2_fio2 (input_preprocess cell 90); count = validity flag
    fio2 = df["fio2"].where(df["fio2"] <= 1, df["fio2"] / 100)
    ok = (df["o2sat"] > 0) & (df["o2sat"] <= 100) \
        & (fio2 >= 0.21) & (fio2 <= 1.0)
    df["spo2_fio2"] = np.where(ok, df["o2sat"] / fio2.where(ok, 1.0), 0.0)
    df["count_spo2_fio2"] = ok.astype(int)

    return df[["subject_id", "hadm_id", "stay_id", "slot_idx"]
              + ALL_VARS + ALL_COUNTS]


# =============================================================================
# Static frame (groundwork cells 14-57 via static_info +
# input_preprocess cell 71)
# =============================================================================
def build_static(admissions: pd.DataFrame, patients: pd.DataFrame,
                 icustays: pd.DataFrame) -> pd.DataFrame:
    adm = admissions.merge(patients, on="subject_id")
    # per-admission stay ranges for the order taxonomy
    rng = icustays.groupby("hadm_id").agg(intime_min=("intime", "min"),
                                          outtime_max=("outtime", "max"))
    adm = adm.merge(rng, on="hadm_id", how="left")

    # time-order repair on admissions having ICU stays
    keep_subject = set(adm["subject_id"])
    for i, row in adm.dropna(subset=["intime_min"]).iterrows():
        _, keep, at, dt = si.repair_stay_order(
            row["admittime"].to_datetime64(),
            row["dischtime"].to_datetime64(),
            row["intime_min"].to_datetime64(),
            row["outtime_max"].to_datetime64())
        if not keep:
            keep_subject.discard(row["subject_id"])
        else:
            adm.at[i, "admittime"] = at
            adm.at[i, "dischtime"] = dt
    adm = adm[adm["subject_id"].isin(keep_subject)]

    # death reconciliation per subject (cells 44-52); `died` is the
    # notebook's discharge-location flag
    if "died" not in adm.columns:
        adm["died"] = (adm.get("discharge_location", pd.Series(
            "", index=adm.index)) == "DIED").astype(int)
    adm = adm.sort_values(["subject_id", "admittime"])
    death_adm = np.zeros(len(adm), np.int64)
    drop_subjects = set()
    adm = adm.reset_index(drop=True)
    for s, g in adm.groupby("subject_id"):
        dt = si.dedupe_deathtime(
            g["subject_id"].to_numpy(),
            g["deathtime"].to_numpy("datetime64[ns]"),
            g.get("dod", pd.Series(pd.NaT, index=g.index))
            .to_numpy("datetime64[ns]"))
        dod = g["dod"].iloc[0] if "dod" in g else pd.NaT
        nn = dt[~np.isnat(dt)]
        res = si.death_error_handling(
            g["admittime"].to_numpy("datetime64[ns]"),
            g["dischtime"].to_numpy("datetime64[ns]"),
            None if pd.isna(dod) else dod.to_datetime64(),
            None if len(nn) == 0 else nn[0],
            g.get("died", pd.Series(0, index=g.index)).to_numpy(),
            g.get("hospital_expire_flag",
                  pd.Series(0, index=g.index)).to_numpy())
        if res["certainty"] == "error":
            drop_subjects.add(s)
        death_adm[g.index.to_numpy()] = res["death_adm"]
    adm["death_adm"] = death_adm
    adm = adm[~adm["subject_id"].isin(drop_subjects)]

    # race mapping (cells 51-54)
    adm["race"] = si.map_race(adm["subject_id"].to_numpy(),
                              adm["race"].tolist())

    st = icustays.merge(
        adm[["subject_id", "hadm_id", "admission_type",
             "admission_location", "race", "death_adm"]],
        on=["subject_id", "hadm_id"], how="inner")
    st = st.merge(patients[["subject_id", "gender", "anchor_age",
                            "anchor_year"]], on="subject_id")
    st["age_at_intime"] = si.age_at(st["intime"].to_numpy("datetime64[ns]"),
                                    st["anchor_year"].to_numpy(),
                                    st["anchor_age"].to_numpy())
    st = st[(st["age_at_intime"] >= 18.0) & (st["age_at_intime"] <= 90.0)]

    # grouped one-hots (input_preprocess cell 71)
    st["admission_type_grouped"] = st["admission_type"].map(
        ADMISSION_TYPE_MAP).fillna("OTHER")
    st["admission_location_grouped"] = st["admission_location"].map(
        ADMISSION_LOCATION_MAP).fillna("OTHER_UNKNOWN")
    unit_map = {u: g for g, units in CAREUNIT_GROUPS.items() for u in units}
    st["first_careunit_grouped"] = st["first_careunit"].map(
        unit_map).fillna("OTHER")
    out = pd.get_dummies(
        st[["subject_id", "hadm_id", "stay_id", "age_at_intime", "death_adm",
            "admission_type_grouped", "admission_location_grouped",
            "first_careunit_grouped", "race", "gender"]],
        columns=["admission_type_grouped", "admission_location_grouped",
                 "first_careunit_grouped", "race", "gender"], dtype=int)
    return out.reset_index(drop=True)


# =============================================================================
# CXR frames (cxr_db cells 19-28 / 53 / 73)
# =============================================================================
def build_cxr_frames(metadata: pd.DataFrame, chexpert: pd.DataFrame,
                     icustays: pd.DataFrame,
                     label_policy: str = "to_positive",
                     seg_mask: Optional[pd.DataFrame] = None,
                     lung_mask_root: str = ""
                     ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """→ (final_cxr_df catalog, anchor rows with stay/slot/cxr_flag).

    The catalog keeps the CXR-head label policy (U→1 by default, cell 24);
    anchor rows carry the RAW CheXpert values — the anchor-level U→0 happens
    downstream in :func:`..data.pipeline.build_anchor_frame`
    (data_processing.py:162-174).

    ``seg_mask``: CXLSeg-mask table (chest-x-ray-segmentation 1.0.0). The
    reference renames ``DicomPath`` → ``lung_mask_path``, prefixes it with
    ``<root>/lung_mask/`` and LEFT-merges on (subject_id, study_id,
    dicom_id) — cxr_db cells 5-6 + 30; ``lung_mask_path`` rides into the
    final multimodal frame (cell 73)."""
    m = metadata.merge(chexpert, on=["subject_id", "study_id"], how="inner")
    keep = filter_ap_pa(m["ViewPosition"].tolist())
    m = m[keep].reset_index(drop=True)
    m["cxrtime"] = parse_cxrtime(m["StudyDate"].to_numpy(),
                                 m["StudyTime"].to_numpy())

    label_cols = [c for c in CHEXPERT_TO_LABEL if c in m.columns]
    raw = m[label_cols].to_numpy(np.float32)
    head = apply_uncertain_policy(raw, label_policy)

    catalog = m[["subject_id", "study_id", "dicom_id", "ViewPosition",
                 "cxrtime"]].copy()
    for j, c in enumerate(label_cols):
        catalog[CHEXPERT_TO_LABEL[c]] = head[:, j]

    if seg_mask is not None:                     # CXLSeg join (cell 30)
        sm = seg_mask.rename(columns={"DicomPath": "lung_mask_path"})
        sm = sm[["subject_id", "study_id", "dicom_id", "lung_mask_path"]] \
            .drop_duplicates(["subject_id", "study_id", "dicom_id"])
        if lung_mask_root:                       # cell 6 path prefix
            sm["lung_mask_path"] = sm["lung_mask_path"].map(
                lambda x: os.path.join(lung_mask_root, "lung_mask", str(x))
                if pd.notna(x) else x)
        catalog = catalog.merge(sm, on=["subject_id", "study_id",
                                        "dicom_id"], how="left")
        catalog["has_lung_mask"] = catalog["lung_mask_path"].notna()

    # assign each image to a stay of the same subject whose window holds it
    stays = icustays[["subject_id", "hadm_id", "stay_id", "intime",
                      "outtime"]]
    a = m.merge(stays, on="subject_id", how="inner")
    inside = (a["cxrtime"] >= a["intime"]) & (a["cxrtime"] < a["outtime"])
    a = a[inside].reset_index(drop=True)
    slot_idx, keep2 = assign_cxr_to_slots(
        a["stay_id"].to_numpy(), a["cxrtime"].to_numpy("datetime64[ns]"),
        *_stay_n_slots(icustays))
    a["slot_idx"] = slot_idx
    a = a[keep2].reset_index(drop=True)
    anchors = a[["subject_id", "hadm_id", "stay_id", "study_id", "dicom_id",
                 "slot_idx", "cxrtime"]].copy()
    raw_a = a[label_cols].to_numpy(np.float32)
    for j, c in enumerate(label_cols):
        anchors[CHEXPERT_TO_LABEL[c]] = raw_a[:, j]
    anchors["cxr_flag"] = 1
    return catalog, anchors


def _stay_n_slots(icustays: pd.DataFrame):
    intime, _ = _stay_index(icustays)
    n = np.ceil((icustays["outtime"] - icustays["intime"])
                / HOUR).astype(int).clip(lower=0)
    return intime, {int(s): int(k)
                    for s, k in zip(icustays["stay_id"], n)}


def build_final_df(icu_events: pd.DataFrame, anchors: pd.DataFrame,
                   ) -> pd.DataFrame:
    """[subject]input_preprocess cells 41-46: CXR anchor rows joined onto
    the slot-grid events. Row set = all event-grid rows; anchor slots carry
    cxr_flag=1 + dicom_id + raw labels."""
    label_cols = [c for c in anchors.columns if c.startswith("label_")]
    join = anchors[["stay_id", "slot_idx", "study_id", "dicom_id",
                    "cxr_flag"] + label_cols]
    df = icu_events.merge(join, on=["stay_id", "slot_idx"], how="left")
    df["cxr_flag"] = df["cxr_flag"].fillna(0).astype(int)
    df["study_id"] = df["study_id"].fillna(0).astype(np.int64)
    df["dicom_id"] = df["dicom_id"].fillna("")
    return df


# =============================================================================
# Orchestrator
# =============================================================================
def run_l0(raw_root: str, out_dir: str, n_timesteps: int = 24,
           label_policy: str = "to_positive", split_seed: int = 42,
           count_clip: int = 15) -> Dict[str, str]:
    """Full L0 chain → reference artifact frames + columnar cohort.

    Writes ``static_full``, ``final_df``, ``final_cxr_df`` (feather when
    pyarrow is available, .pkl otherwise), ``cohort.npz`` and
    ``meta_with_stats.pkl`` into ``out_dir``; returns the path map."""
    from ..config import DataConfig, DEFAULT_PATHOLOGY_LABELS
    from .ingest import from_reference_frames, save_npz
    from .pipeline import meta_from_events

    t = load_raw_tables(raw_root)
    icustays = t["icustays"]

    chart, lab, inputev = fix_units(t["chartevents"], t["labevents"],
                                    t["inputevents"])
    chart, lab = remove_outliers(chart, lab)

    binned = bin_chart_lab(chart, lab, icustays)
    bp = build_bp(chart, icustays)
    fluid = build_fluid(inputev, icustays)
    urine = build_urine(t["outputevents"], icustays)
    icu_events = assemble_icu_events(binned, bp, fluid, urine, icustays)

    static_df = build_static(t["admissions"], t["patients"], icustays)
    # cohort filter: stays surviving the static hygiene chain
    icu_events = icu_events[
        icu_events["stay_id"].isin(static_df["stay_id"])]

    catalog, anchors = build_cxr_frames(
        t["cxr_metadata"], t["cxr_chexpert"], icustays, label_policy,
        seg_mask=t.get("cxr_seg_mask"),
        lung_mask_root=os.path.join(raw_root, "cxr"))
    final_df = build_final_df(icu_events, anchors)

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, df in (("static_full", static_df), ("final_df", final_df),
                     ("final_cxr_df", catalog)):
        try:
            p = os.path.join(out_dir, f"{name}.ftr")
            df.reset_index(drop=True).to_feather(p)
        except (ImportError, ValueError):
            p = os.path.join(out_dir, f"{name}.pkl")
            df.to_pickle(p)
        paths[name] = p

    labels = [l for l in DEFAULT_PATHOLOGY_LABELS if l in final_df.columns]
    ds = from_reference_frames(final_df, static_df, catalog,
                               _schema_meta(static_df, n_timesteps), labels)
    cfg = DataConfig(n_timesteps=n_timesteps, split_seed=split_seed,
                     count_clip=count_clip)
    meta = meta_from_events(ds, cfg, label_col="death_adm")
    # same pickle contract the reference's SSL script writes
    # (duett/train_duett_ssl.py:130-135) and Meta.load consumes
    with open(os.path.join(out_dir, "meta_with_stats.pkl"), "wb") as f:
        pickle.dump(meta.to_reference_dict(), f)
    save_npz(os.path.join(out_dir, "cohort.npz"), ds)
    paths["cohort"] = os.path.join(out_dir, "cohort.npz")
    paths["meta"] = os.path.join(out_dir, "meta_with_stats.pkl")
    return paths


def _schema_meta(static_df: pd.DataFrame, n_timesteps: int):
    """Schema-only Meta for the frame→columnar conversion; the real
    train-split stats are recomputed by meta_from_events afterwards."""
    from .meta import Meta
    onehot = tuple(c for c in static_df.columns
                   if c not in {"subject_id", "hadm_id", "stay_id",
                                "age_at_intime", "death_adm"})
    V = len(ALL_VARS)
    return Meta(all_vars=tuple(ALL_VARS), all_counts=tuple(ALL_COUNTS),
                onehot_static=onehot, d_static=1 + len(onehot),
                label_col="death_adm", n_timesteps=n_timesteps,
                means=np.zeros(V, np.float32), stds=np.ones(V, np.float32),
                age_mean=0.0, age_std=1.0)
