"""Clinical-prompt builder (data/prompts.py) vs the reference notebook.

The reference pipeline lives in ``/root/reference/preprocess/
demographic_preprocess.ipynb`` cells 6-22 as pandas cells; this test replays
those cells verbatim-in-spirit on a synthetic cohort (pandas is a test-only
dependency here) and asserts the framework's columnar implementation
produces identical prompts, ids and ordering.
"""
import math

import numpy as np
import pandas as pd
import pytest

from multimodal_edema_prediction_tpu.data import prompts as PR


# ---------------------------------------------------------------------------
# reference replica (pandas, mirrors the notebook cells)
# ---------------------------------------------------------------------------
def ref_build_diagnosis_prompt(diag: pd.DataFrame) -> pd.DataFrame:
    diag = diag.sort_values(["subject_id", "hadm_id", "seq_num"])

    def _process_group(df):
        titles = df["long_title"].dropna().str.strip()
        titles = pd.unique(titles)
        icd_list = df["icd_code"].tolist()
        from multimodal_edema_prediction_tpu.data.demographics import (
            has_circulatory, has_respiratory)
        parts = []
        if has_respiratory(icd_list):
            parts.append("respiratory disease present")
        if has_circulatory(icd_list):
            parts.append("cardiovascular disease present")
        titles = titles[:10]
        if len(titles) > 0:
            parts.append("Clinical history: " + "; ".join(titles))
        return "Diagnoses: " + ". ".join(parts) + "."

    return (diag.groupby(["subject_id", "hadm_id"]).apply(
        _process_group, include_groups=False)
        .reset_index(name="diag_prompt"))


def ref_build_procedure_by_date(proc: pd.DataFrame) -> pd.DataFrame:
    proc = proc.sort_values(["subject_id", "hadm_id", "chartdate", "seq_num"])
    return (proc.groupby(["subject_id", "hadm_id", "chartdate"])["long_title"]
            .apply(lambda t: "; ".join(t.dropna().str.strip()))
            .reset_index().rename(columns={"long_title": "proc_prompt"}))


def ref_build_cumulative_procedure(pbd: pd.DataFrame) -> pd.DataFrame:
    pbd = pbd.sort_values(["subject_id", "hadm_id", "chartdate"]).copy()

    def accumulate(series):
        seen, result = [], []
        for v in series:
            if pd.notna(v) and v.strip():
                seen.append(v)
            result.append("; ".join(seen))
        return result

    pbd["proc_prompt"] = (pbd.groupby(["subject_id", "hadm_id"])
                          ["proc_prompt"].transform(accumulate))
    return pbd


def ref_format_demo(row):
    parts = []
    age, gender = row.get("anchor_age"), row.get("gender")
    if pd.notna(age) and pd.notna(gender):
        gender_str = "male" if str(gender).upper() == "M" else "female"
        parts.append(f"{int(age)}-year-old {gender_str}")
    for col in ("race", "marital_status", "insurance"):
        v = row.get(col)
        if pd.notna(v) and str(v).strip():
            parts.append(str(v).strip().lower())
    return "Demographics: " + ", ".join(parts) + "." if parts else ""


def ref_build_prompt(row):
    parts = []
    if pd.notna(row["demo_prompt"]):
        parts.append(row["demo_prompt"])
    height, weight = row.get("height"), row.get("weight")
    if pd.notna(height) and pd.notna(weight):
        parts.append(f"Body size: {height:.1f} cm, {weight:.1f} kg.")
    elif pd.notna(weight):
        parts.append(f"Weight: {weight:.1f} kg.")
    elif pd.notna(height):
        parts.append(f"Height: {height:.1f} cm.")
    if pd.notna(row["diag_prompt"]):
        parts.append(row["diag_prompt"])
    if pd.notna(row["proc_prompt"]):
        parts.append(f"Procedures so far: {row['proc_prompt']}.")
    return "\n".join(parts)


def ref_match_slots(slots: pd.DataFrame, prompts: pd.DataFrame):
    merged = slots.merge(prompts, on="hadm_id", how="left")
    in_range = merged[(merged["chartdate"] >= merged["slot_start"])
                      & (merged["chartdate"] < merged["slot_end"])]
    in_range = in_range.sort_values("chartdate")
    latest = (in_range.groupby(["hadm_id", "hour_slot"]).tail(1)
              .reset_index(drop=True))
    result = slots.merge(latest[["hadm_id", "hour_slot", "clinical_prompt"]],
                         on=["hadm_id", "hour_slot"], how="left")
    result = result.sort_values(["hadm_id", "stay_id", "slot_start"])
    result["clinical_prompt"] = (result.groupby("hadm_id")
                                 ["clinical_prompt"].ffill())
    result = result.sort_values(["hadm_id", "stay_id", "hour_slot"])
    result["clinical_prompt"] = (result.groupby("hadm_id")
                                 ["clinical_prompt"].bfill())
    result["clinical_prompt"] = result["clinical_prompt"].fillna(
        "No clinical information available.")
    result["prompt_id"] = (result.groupby("hadm_id")["clinical_prompt"]
                           .transform(lambda x: pd.factorize(x)[0]))
    return result.reset_index(drop=True)


# ---------------------------------------------------------------------------
# synthetic cohort
# ---------------------------------------------------------------------------
def _cohort(seed=0):
    rng = np.random.default_rng(seed)
    titles_pool = ["Acute pulmonary edema", "Congestive heart failure",
                   "Pneumonia, unspecified", None, "Sepsis",
                   "  Chronic kidney disease ", "Atrial fibrillation",
                   "Acute pulmonary edema"]
    codes_pool = ["I50", "J18", "4280", "486", "5849", "E119", "N17"]
    diag_rows = []
    for subj in (1, 2, 3):
        for hadm in (subj * 10, subj * 10 + 1):
            n = int(rng.integers(1, 14))
            for s in range(n):
                diag_rows.append({
                    "subject_id": subj, "hadm_id": hadm, "seq_num": s + 1,
                    "icd_code": codes_pool[int(rng.integers(len(codes_pool)))],
                    "long_title":
                        titles_pool[int(rng.integers(len(titles_pool)))]})
    diag = pd.DataFrame(diag_rows)

    proc_rows = []
    for subj in (1, 2, 3):
        for hadm in (subj * 10, subj * 10 + 1):
            for d in sorted(rng.choice(10, size=3, replace=False)):
                for s in range(int(rng.integers(1, 3))):
                    proc_rows.append({
                        "subject_id": subj, "hadm_id": hadm,
                        "chartdate": int(d), "seq_num": s + 1,
                        "long_title": f"Procedure {d}-{s}" if s != 1
                        else None})
    proc = pd.DataFrame(proc_rows)

    demo = pd.DataFrame([
        {"subject_id": 1, "hadm_id": 10, "anchor_age": 63.0, "gender": "M",
         "race": "WHITE", "marital_status": "MARRIED",
         "insurance": "Medicare", "height": 172.0},
        {"subject_id": 1, "hadm_id": 11, "anchor_age": 63.0, "gender": "M",
         "race": None, "marital_status": " ", "insurance": "Medicaid",
         "height": np.nan},
        {"subject_id": 2, "hadm_id": 20, "anchor_age": np.nan, "gender": "F",
         "race": "BLACK/AFRICAN AMERICAN", "marital_status": "SINGLE",
         "insurance": None, "height": 158.5},
        {"subject_id": 2, "hadm_id": 21, "anchor_age": 44.0, "gender": None,
         "race": "OTHER", "marital_status": None, "insurance": "Other",
         "height": 161.0},
        {"subject_id": 3, "hadm_id": 30, "anchor_age": 81.0, "gender": "F",
         "race": "ASIAN", "marital_status": "WIDOWED",
         "insurance": "Medicare", "height": np.nan},
        {"subject_id": 3, "hadm_id": 31, "anchor_age": 81.0, "gender": "F",
         "race": "ASIAN", "marital_status": "WIDOWED",
         "insurance": "Medicare", "height": 149.0},
    ])
    demo["demo_prompt"] = demo.apply(ref_format_demo, axis=1)

    weight_rows = []
    for subj in (1, 2, 3):
        for hadm in (subj * 10, subj * 10 + 1):
            for d in sorted(rng.choice(10, size=2, replace=False)):
                weight_rows.append({
                    "subject_id": subj, "hadm_id": hadm, "chartdate": int(d),
                    "weight": float(np.round(50 + rng.random() * 60, 1))})
    weight = pd.DataFrame(weight_rows)
    return diag, proc, demo, weight


def _timeline_frames(diag, proc, demo, weight):
    """Reference cells 11-12 end to end → clinical_prompt_df."""
    diag_df = ref_build_diagnosis_prompt(diag)
    pbd = ref_build_procedure_by_date(proc)
    cum = ref_build_cumulative_procedure(pbd)
    timeline = pd.concat([
        pbd[["subject_id", "hadm_id", "chartdate"]],
        weight[["subject_id", "hadm_id", "chartdate"]],
    ], ignore_index=True).drop_duplicates().sort_values(
        ["subject_id", "hadm_id", "chartdate"])
    df = timeline.merge(demo[["subject_id", "hadm_id", "demo_prompt",
                              "height"]],
                        on=["subject_id", "hadm_id"], how="left")
    df = df.merge(diag_df, on=["subject_id", "hadm_id"], how="left")
    df = df.merge(cum, on=["subject_id", "hadm_id", "chartdate"], how="left")
    df["proc_prompt"] = df.groupby(["subject_id", "hadm_id"])[
        "proc_prompt"].ffill()
    df = df.merge(weight, on=["subject_id", "hadm_id", "chartdate"],
                  how="left")
    df["weight"] = df.groupby(["subject_id", "hadm_id"])["weight"].ffill()
    df["clinical_prompt"] = df.apply(ref_build_prompt, axis=1)
    return diag_df, pbd, cum, df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------
def test_diagnosis_prompt_parity():
    diag, _, _, _ = _cohort()
    ref = ref_build_diagnosis_prompt(diag)
    ours = PR.build_diagnosis_prompts(
        diag["subject_id"].to_numpy(), diag["hadm_id"].to_numpy(),
        diag["seq_num"].to_numpy(), diag["icd_code"].tolist(),
        diag["long_title"].tolist())
    assert len(ours) == len(ref)
    for _, row in ref.iterrows():
        assert ours[(row.subject_id, row.hadm_id)] == row.diag_prompt


def test_procedure_cumulative_parity():
    _, proc, _, _ = _cohort()
    pbd = ref_build_procedure_by_date(proc)
    cum = ref_build_cumulative_procedure(pbd)
    ours_pbd = PR.build_procedure_by_date(
        proc["subject_id"].to_numpy(), proc["hadm_id"].to_numpy(),
        proc["chartdate"].to_numpy(), proc["seq_num"].to_numpy(),
        proc["long_title"].tolist())
    ours_cum = PR.build_cumulative_procedure(ours_pbd)
    assert len(ours_pbd) == len(pbd)
    for _, row in pbd.iterrows():
        assert ours_pbd[(row.subject_id, row.hadm_id,
                         row.chartdate)] == row.proc_prompt
    for _, row in cum.iterrows():
        assert ours_cum[(row.subject_id, row.hadm_id,
                         row.chartdate)] == row.proc_prompt


def test_demo_prompt_parity():
    _, _, demo, _ = _cohort()
    for _, row in demo.iterrows():
        ours = PR.format_demo_prompt(
            age=row.anchor_age, gender=row.gender, race=row.race,
            marital_status=row.marital_status, insurance=row.insurance)
        assert ours == row.demo_prompt
    # the reference's operator-precedence quirk: no parts → empty string
    assert PR.format_demo_prompt() == ""


def test_timeline_prompt_assembly_parity():
    diag, proc, demo, weight = _cohort()
    diag_df, pbd, cum, ref_df = _timeline_frames(diag, proc, demo, weight)

    diag_map = PR.build_diagnosis_prompts(
        diag["subject_id"].to_numpy(), diag["hadm_id"].to_numpy(),
        diag["seq_num"].to_numpy(), diag["icd_code"].tolist(),
        diag["long_title"].tolist())
    ours_pbd = PR.build_procedure_by_date(
        proc["subject_id"].to_numpy(), proc["hadm_id"].to_numpy(),
        proc["chartdate"].to_numpy(), proc["seq_num"].to_numpy(),
        proc["long_title"].tolist())
    ours_cum = PR.build_cumulative_procedure(ours_pbd)
    demo_map = {(r.subject_id, r.hadm_id):
                {"demo_prompt": r.demo_prompt,
                 "height": None if pd.isna(r.height) else float(r.height)}
                for _, r in demo.iterrows()}
    w_map = {(r.subject_id, r.hadm_id, r.chartdate): float(r.weight)
             for _, r in weight.iterrows()}
    timeline = PR.build_timeline(list(ours_pbd.keys()), list(w_map.keys()))
    rows = PR.build_time_aware_prompts(timeline, demo_map, diag_map,
                                       ours_cum, w_map)
    assert len(rows) == len(ref_df)
    for ours, (_, ref) in zip(rows, ref_df.iterrows()):
        assert (ours["subject_id"], ours["hadm_id"], ours["chartdate"]) == \
            (ref.subject_id, ref.hadm_id, ref.chartdate)
        assert ours["clinical_prompt"] == ref.clinical_prompt, \
            (ours, ref.clinical_prompt)


def test_slot_matching_parity():
    diag, proc, demo, weight = _cohort(seed=3)
    _, _, _, prompt_df = _timeline_frames(diag, proc, demo, weight)
    # hour slots: 2 stays per admission, hours 0..5, slot k covers
    # chartdate ∈ [2k, 2k+2) so some slots are empty, some have 2 prompts
    slot_rows = []
    for hadm in prompt_df["hadm_id"].unique():
        for stay in (0, 1):
            for h in range(6):
                slot_rows.append({"hadm_id": hadm, "stay_id": stay,
                                  "hour_slot": h, "slot_start": 2 * h,
                                  "slot_end": 2 * h + 2})
    slots = pd.DataFrame(slot_rows).sample(frac=1.0, random_state=7) \
        .reset_index(drop=True)      # shuffled input order
    ref = ref_match_slots(
        slots, prompt_df[["hadm_id", "chartdate", "clinical_prompt"]])

    texts, pid, order = PR.match_prompt_to_slots(
        slots["hadm_id"].to_numpy(), slots["stay_id"].to_numpy(),
        slots["hour_slot"].to_numpy(), slots["slot_start"].to_numpy(),
        slots["slot_end"].to_numpy(),
        prompt_df["hadm_id"].to_numpy(), prompt_df["chartdate"].to_numpy(),
        prompt_df["clinical_prompt"].tolist())
    assert list(ref["clinical_prompt"]) == texts
    assert list(ref["prompt_id"]) == list(pid)
    # the permutation maps back into the caller's row order
    assert list(ref["hour_slot"]) == \
        [int(slots["hour_slot"][j]) for j in order]
    # every admission starts its ids at 0 and the sentinel appears for
    # admissions with no in-range prompt at all
    assert (pid >= 0).all()


def test_unique_texts_with_inverse():
    texts = ["a", "b", "a", "c", "b", "a"]
    uniq, inv = PR.unique_texts_with_inverse(texts)
    assert uniq == ["a", "b", "c"]                 # first-occurrence order
    assert [uniq[j] for j in inv] == texts
    # matches pandas drop_duplicates + reconstruction
    s = pd.Series(texts)
    assert list(s.drop_duplicates()) == uniq


def test_no_prompt_admission_gets_sentinel():
    texts, pid, order = PR.match_prompt_to_slots(
        np.array([5, 5]), np.array([0, 0]), np.array([0, 1]),
        np.array([0, 2]), np.array([2, 4]),
        np.array([9]), np.array([1]), ["never matches"])
    assert texts == [PR.NO_INFO, PR.NO_INFO]
    assert list(pid) == [0, 0]
