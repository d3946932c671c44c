"""Radiology-report sectioning + EXT-ILS lesion catalog (cxr_db.ipynb
cells 10-15)."""
import json

from multimodal_edema_prediction_tpu.data.reports import (
    NO_TEXT, build_lesion_catalog, build_report_table, extract_sections)


def test_findings_priority():
    txt = ("EXAMINATION: CHEST\n\nFINDINGS: Mild pulmonary edema.\n"
           "Heart size normal.\n\nIMPRESSION: Edema.")
    out = extract_sections(txt)
    assert out.startswith("Mild pulmonary edema.")
    assert "IMPRESSION" not in out


def test_impression_fallback_and_last_paragraph():
    assert extract_sections("IMPRESSION: No acute process.") == \
        "No acute process."
    txt = "INDICATION: fever.\n\nCOMPARISON: none.\n\nLines unchanged."
    assert extract_sections(txt) == "Lines unchanged."
    assert extract_sections("") == NO_TEXT
    assert extract_sections(None) == NO_TEXT
    # empty FINDINGS body falls through to IMPRESSION
    assert extract_sections("FINDINGS:\nIMPRESSION: ok") == "ok"


def test_build_report_table_layout(tmp_path):
    d = tmp_path / "p10" / "p10001234"
    d.mkdir(parents=True)
    (d / "s5000001.txt").write_text("FINDINGS: Clear lungs.\n")
    (d / "s5000002.txt").write_text("no sections here")
    rows = build_report_table(str(tmp_path))
    assert rows["subject_id"] == ["p10001234", "p10001234"]
    assert rows["study_id"] == ["s5000001", "s5000002"]
    assert rows["report"][0] == "Clear lungs."
    assert rows["report"][1] == "no sections here"   # last-paragraph rule


def test_build_lesion_catalog():
    raw = {"train": {
        "s1": {"subject_id": "p1",
               "image_path": "p10/p1/s1/abc123.jpg",
               "section_content": "...",
               "instruction_answer_pairs": {"positive_pairs": [
                   {"target": "edema", "seg_mask_path": "m/edema1.png",
                    "grounded_location": ["left lower lobe", "right base"]},
                   {"target": "cardiomegaly"},
                   {"target": "fracture"},        # not a target lesion
               ]}},
    }, "test": {
        "s2": {"subject_id": "p2", "image_path": "p10/p2/s2/def456.jpg",
               "instruction_answer_pairs": {"positive_pairs": []}},
    }}
    rows = build_lesion_catalog(raw, lesion_data_path="/ils")
    assert len(rows) == 2
    r1 = rows[0]
    assert r1["label_edema"] == 1
    assert r1["mask_edema"] == "/ils/lesion_mask/m/edema1.png"
    assert r1["loc_edema"] == "left lower lobe, right base"
    # cardiomegaly with no grounded location → fixed 'heart'
    assert r1["label_cardiomegaly"] == 1 and r1["loc_cardiomegaly"] == "heart"
    assert r1["label_pneumonia"] == 0
    assert "label_fracture" not in r1
    assert r1["dicom_id"] == "abc123"
    assert r1["image_path"] == "files/p10/p1/s1/abc123.jpg"
    r2 = rows[1]
    assert all(r2[f"label_{p}"] == 0 for p in
               ("edema", "cardiomegaly", "effusion"))
