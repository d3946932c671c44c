"""The one-command end-to-end rehearsal (VERDICT r3 item 8) runs in the
slow tier: synthetic raw MIMIC layout → L0 preprocess → JPEGs → CXR head →
SSL → teacher → KD → analysis CLIs, with the produced artifact tree diffed
against the committed manifest (scripts/e2e_manifest.txt)."""
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_e2e_rehearsal_script(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS")}
    p = subprocess.run(
        ["bash", os.path.join(REPO, "scripts/e2e_rehearsal.sh"),
         str(tmp_path / "work")],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO)
    tail = (p.stdout + p.stderr)[-4000:]
    assert p.returncode == 0, tail
    assert "E2E REHEARSAL OK" in p.stdout, tail
    assert "artifact manifest matches" in p.stdout, tail
