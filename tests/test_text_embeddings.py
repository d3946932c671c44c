"""Report-embedding pipeline (time_series_text notebook cells 128-148)
against a locally built tiny BERT — offline, weight-free."""
import numpy as np
import pytest

from multimodal_edema_prediction_tpu.data.text_embeddings import (
    clean_radiology_report, embed_reports, join_text_flag)


def test_clean_radiology_report():
    raw = "FINDINGS:\n  Mild   edema.\n====\n-- unchanged **lines++"
    out = clean_radiology_report(raw)
    # reference order (cell 143): whitespace collapse FIRST, then separator
    # runs → a stripped separator may leave a double space; newlines and
    # separator runs are gone
    assert "\n" not in out
    assert "====" not in out and "--" not in out and "**" not in out
    assert out.startswith("FINDINGS: Mild edema.")
    assert clean_radiology_report(None) == ""
    assert clean_radiology_report(3.14) == ""


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizerFast
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "edema", "mild",
             "severe", "clear", "lungs", "effusion", "no", "findings", "."]
    d = tmp_path_factory.mktemp("vocab")
    p = d / "vocab.txt"
    p.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(p), do_lower_case=True)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=37, max_position_embeddings=128)
    import torch
    torch.manual_seed(0)
    return tok, BertModel(cfg)


def test_embed_reports_shapes_and_pooling(tiny_bert):
    tok, model = tiny_bert
    texts = ["mild edema .", "no findings .", "severe effusion .",
             "clear lungs ."]
    emb = embed_reports(texts, tok, model, batch_size=3)
    assert emb.shape == (4, 32)
    assert np.isfinite(emb).all()
    # masked mean pooling: embeddings must NOT depend on the pad region,
    # i.e. identical text twice → identical embedding
    emb2 = embed_reports(["mild edema ."], tok, model)
    np.testing.assert_allclose(emb[0], emb2[0], atol=1e-5)
    # different texts → different embeddings
    assert np.abs(emb[0] - emb[1]).max() > 1e-4
    # cls pooling differs from mean pooling
    cls = embed_reports(texts, tok, model, pooling="cls")
    assert np.abs(cls - emb).max() > 1e-4


def test_join_text_flag():
    flags = join_text_flag(np.array([10, 10, 11]), np.array([3, 5, 3]),
                           embedded=[(10, 3), (11, 3)])
    np.testing.assert_array_equal(flags, [1.0, 0.0, 1.0])
