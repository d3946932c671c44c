"""Numerics-sensitive subset at XLA's DEFAULT optimization level.

The test conftest runs the whole suite at ``--xla_backend_optimization_level=0``
(measured ~25% off fast-tier wall time on the 1-core host), which means the
golden / determinism / parity tests normally never exercise the optimization
pipeline production runs use — an optimization-level-only numerics or fusion
bug would pass CI by default (ADVICE r4). This slow-tier job re-runs that
subset in a subprocess with ``TEST_XLA_OPT=1`` (conftest then leaves the
backend at its default level).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

# goldens (torch-anchored losses, aux-residual, duett-vs-numpy), sklearn-
# exact metrics, and bitwise determinism — the surfaces where an XLA
# optimization-level numerics change would land first
SUBSET = [
    "tests/test_determinism.py",
    "tests/test_losses.py",
    "tests/test_aux_residual_golden.py",
    "tests/test_duett_numpy_parity.py",
    "tests/test_metrics.py",
]


def test_numerics_subset_at_default_xla_opt_level():
    env = dict(os.environ, TEST_XLA_OPT="1")
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # The PARENT pytest's conftest already appended
    # --xla_backend_optimization_level=0 to os.environ["XLA_FLAGS"], and
    # the child conftest only refrains from ADDING the flag under
    # TEST_XLA_OPT=1 — it never strips an inherited one. Drop XLA_FLAGS
    # entirely so the child builds its own (device count re-added by its
    # conftest); without this the subset still ran at -O0 and the test
    # was vacuous.
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         *SUBSET],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert p.returncode == 0, p.stdout[-4000:] + p.stderr[-2000:]
    # belt-and-braces: prove the child really dropped the -O0 flag
    probe = subprocess.run(
        [sys.executable, "-c",
         "import os, sys; sys.path.insert(0, 'tests'); import conftest; "
         "print(os.environ.get('XLA_FLAGS', ''))"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert "xla_backend_optimization_level" not in probe.stdout, \
        probe.stdout
