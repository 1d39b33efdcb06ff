"""Machine-check the compat shims' runnable ``__main__`` entry points.

The reference's modules are directly executable (each ``__main__`` runs a
property-test battery or a self-demo, e.g.
marginalizable_state_space_model.py:947-1187, util_post_hoc.py:84-104);
the shims replicate that usage.  These smokes execute
``python <shim>.py`` in a subprocess — the pytest-delegating batteries
with ``--collect-only -q`` (validates repo layout, the import chain,
pytest availability, and that the delegated test file still collects
without paying for a full battery run), the self-demo scripts in full.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PYTEST_SHIMS = [
    "framework/marginalizable_state_space_model.py",
    "framework/marginalizable_mixture_model.py",
    "framework_extended/state_space_model_classifier.py",
    "framework_extended/state_space_model_knn.py",
    "framework_extended/state_space_model_linear_gaussian.py",
    "framework_extended/state_space_model_linear_trans_knn_meas.py",
    "framework_extended/state_space_model_mixture.py",
]

DEMO_SHIMS = [
    "util/util_post_hoc.py",
    "util/util_macc.py",  # gates cleanly on the unshipped MACC data
]


def _run(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTEST_CURRENT_TEST", None)
    # a nested pytest must not inherit the outer run's addopts/plugins
    env.pop("PYTEST_ADDOPTS", None)
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
@pytest.mark.parametrize("shim", PYTEST_SHIMS)
def test_pytest_shim_main_collects(shim):
    proc = _run([shim, "--collect-only", "-q", "-p", "no:cacheprovider"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # `-q` collect output: one "tests/<file>.py: N" line per module
    import re

    m = re.search(r"tests/\S+\.py: (\d+)", proc.stdout)
    assert m and int(m.group(1)) > 0, proc.stdout


@pytest.mark.slow
@pytest.mark.parametrize("shim", DEMO_SHIMS)
def test_demo_shim_main_runs(shim):
    proc = _run([shim])
    assert proc.returncode == 0, proc.stdout + proc.stderr


@pytest.mark.slow
def test_util_adni_shim_main_prints_summary():
    proc = _run(["util/util_adni.py"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.strip(), "expected the ADNI summary block"
