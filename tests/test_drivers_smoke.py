"""End-to-end smoke tests of the experiment drivers as subprocesses
(tiny restart budgets; outputs written into a temp cwd).  These are the
CI-level equivalent of the reference's `make experiments` integration run
(reference Makefile:20-34)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, tmp_path, extra_env=None, timeout=560):
    env = os.environ.copy()
    env["MTM_N_RESTARTS"] = "2"
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "drivers", script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_xval_then_collate_smoke(tmp_path):
    r = _run("inference-adni-xval.py", tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    stem = "ADNI_r7_xval10_4clusters"
    assert (tmp_path / "results" / f"{stem}_results.csv").exists()
    assert (tmp_path / "posthoc" / "results" / f"{stem}_mtm_post.csv").exists()

    r2 = _run("inference-adni-xval-collate-results.py", tmp_path)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "maintain labels" in r2.stdout
    for out in (
        "prognostics_all.csv",
        "survival_modelling_data.csv",
        "mmse_by_cluster_over_time.csv",
        "biomarkers_by_cluster_over_time.csv",
        "contingency_table_ours_test.csv",
        "contingency_table_gmm_init.csv",
    ):
        assert (tmp_path / "posthoc" / "results" / out).exists(), out


@pytest.mark.slow
def test_macc_driver_gates_cleanly(tmp_path):
    r = _run("inference-train-adni-test-macc.py", tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "not shipped" in r.stdout


@pytest.mark.slow
def test_bench_long_T_smoke(tmp_path):
    """bench-long-T at tiny scale on CPU: one short-T (dense column
    present) and one past-the-dense-gate T; every timing column must be
    finite and positive — this drives all four density routes (packed
    Markov EM, grid-materialized Φ, routed suffix inference, masked
    Kalman filter) plus the dense kernels through one process."""
    code = (
        "import os, sys\n"
        "os.environ['MTM_LONGT_N'] = '1000'\n"
        "os.environ['MTM_LONGT_TLIST'] = '6,12'\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        f"runpy.run_path({os.path.join(REPO, 'drivers', 'bench-long-T.py')!r},"
        " run_name='__main__')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json

    rows = json.loads(r.stdout.strip().splitlines()[-1])["rows"]
    assert [row["T"] for row in rows] == [6, 12]
    for row in rows:
        assert row["dense_ms"] is not None  # both Ts under the dense gate
        for key, val in row.items():
            if key.endswith("_ms"):
                assert np.isfinite(val) and val > 0, (key, val)


@pytest.mark.slow
def test_scale_sweep_smoke(tmp_path):
    """synthetic-scale-sweep at n=2000 on CPU: every cluster count must
    converge (status 1) and report finite objectives."""
    code = (
        "import os, sys\n"
        "os.environ['MTM_SWEEP_N'] = '2000'\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        f"runpy.run_path({os.path.join(REPO, 'drivers', 'synthetic-scale-sweep.py')!r},"
        " run_name='__main__')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import json

    sweep = json.loads(r.stdout.strip().splitlines()[-1])["sweep"]
    assert [row["n_clusters"] for row in sweep] == [2, 4, 8, 16]
    assert all(row["status"] == 1 for row in sweep)
    assert all(
        np.isfinite(row["complete_data_loglik"]) for row in sweep
    )
