"""CLI flag-parity audit vs the reference's argparse surface.

The reference exposes ~60 training flags (``training_duett/run.py:49-208``).
This test extracts every ``--flag`` the reference defines and asserts each is
either (a) exposed by this repo's teacher/student CLI parsers, or (b) listed
in the explicit WAIVERS table with its TPU-native replacement — so a flag the
reference adds (or one we drop) fails the suite instead of silently vanishing
from the migration surface (docs/MIGRATION.md documents the same mapping for
users).
"""
from __future__ import annotations

import argparse
import re

REF_RUN_PY = "/root/reference/training_duett/run.py"

# Reference flag → why it is intentionally not a flag here. Each entry names
# the replacement surface; an empty reason is not allowed.
WAIVERS = {
    # host-path wiring: the reference hardcodes feather paths per machine
    # (run.py:9-14,58-59); ingest/one-command preprocess replace them
    "--final_df_path": "--data_dir (ingested columnar cohort; data/ingest.py)",
    "--static_path": "--data_dir (static table rides the ingested cohort)",
    # torch runtime knobs with no TPU equivalent
    "--num_workers": "--prefetch_depth (device prefetch; data/prefetch.py) — "
                     "no DataLoader worker processes under JAX",
    "--cxr_model_name": "--vit_size/--vit_weights (HF hub id replaced by the "
                        "offline converter, scripts/convert_rad_dino.py)",
}


def _reference_flags() -> set:
    with open(REF_RUN_PY) as f:
        src = f.read()
    return set(re.findall(r"add_argument\(\s*[\"'](--[\w-]+)[\"']", src))


def _our_flags() -> set:
    from multimodal_edema_prediction_tpu.cli import train_student, train_teacher

    flags = set()
    for mod in (train_teacher, train_student):
        # build the parser without running main: each main() constructs its
        # parser first, so intercept parse_args via a raising stub
        p = argparse.ArgumentParser()
        orig = argparse.ArgumentParser.parse_args

        class _Stop(Exception):
            pass

        def grab(self, *a, **k):
            for action in self._actions:
                flags.update(s for s in action.option_strings
                             if s.startswith("--"))
            raise _Stop

        argparse.ArgumentParser.parse_args = grab
        try:
            mod.main([])
        except _Stop:
            pass
        finally:
            argparse.ArgumentParser.parse_args = orig
    return flags


def test_every_reference_flag_is_exposed_or_waived():
    ref, ours = _reference_flags(), _our_flags()
    missing = sorted(f for f in ref if f not in ours and f not in WAIVERS)
    assert not missing, (
        f"reference flags neither exposed nor waived: {missing} — add the "
        "flag to the CLI or a justified entry to WAIVERS")


def test_waivers_are_not_stale():
    """A waived flag that stops existing in the reference, or that we now DO
    expose, means the waiver is dead weight — keep the table honest."""
    ref, ours = _reference_flags(), _our_flags()
    stale = sorted(f for f in WAIVERS if f not in ref or f in ours)
    assert not stale, f"stale waivers (gone from reference or now exposed): {stale}"


def test_kd_name_registry_fails_fast():
    import pytest
    from multimodal_edema_prediction_tpu.ops.losses import (KD_LOSSES,
                                                            resolve_kd_loss)
    assert "vanilla_kl" in KD_LOSSES          # loss/losses_duett.py:28-31
    assert resolve_kd_loss("vanilla_kl") is KD_LOSSES["vanilla_kl"]
    with pytest.raises(ValueError, match="unknown KD loss"):
        resolve_kd_loss("nope")


def test_lp_correction_dropout_reaches_the_correction_head():
    """LP mode overrides ONLY the correction head's dropout (reference
    trainer.py:365-370): with dropout 1.0 the correction branch output is
    zeroed in train mode while img/ts heads (dropout 0) stay live."""
    import jax
    import jax.numpy as jnp

    from multimodal_edema_prediction_tpu.config import PerceiverConfig
    from multimodal_edema_prediction_tpu.models.perceiver import (
        PatchDualPathologyPerceiver)

    import dataclasses

    cfg0 = PerceiverConfig(n_pathologies=3, d_latent=16, n_heads=2,
                           dropout=0.0, head_hidden=8, head_dropout=0.0)
    cfg1 = dataclasses.replace(cfg0, correction_dropout=0.5)
    ts = jnp.ones((2, 5, 12), jnp.float32)
    img = jnp.ones((2, 7, 16), jnp.float32)
    mod0 = PatchDualPathologyPerceiver(cfg0, d_ts=12)
    vs = mod0.init(jax.random.key(0), ts, img, train=False)
    # break the correction head's zero-init so its output is nonzero
    vs = jax.tree.map(lambda x: x + 0.05, vs)
    rngs = {"dropout": jax.random.key(1)}
    out0 = mod0.apply(vs, ts, img, train=True, rngs=rngs)
    out1 = PatchDualPathologyPerceiver(cfg1, d_ts=12).apply(
        vs, ts, img, train=True, rngs=rngs)
    # identical params + rng: only the correction branch may change
    assert jnp.allclose(out0["img_logits"], out1["img_logits"])
    assert jnp.allclose(out0["ts_logits"], out1["ts_logits"])
    assert not jnp.allclose(out0["ts_correction"], out1["ts_correction"],
                            atol=1e-6)
