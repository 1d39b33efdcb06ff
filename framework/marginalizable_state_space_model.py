"""Compat shim → multimodal_trajectory_modeling_tpu.models.statespace_api.

Exposes the reference's module-level L0 API (mm/CC/log-prob family,
samplers) under its original import path."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.models.statespace_api import (  # noqa: F401
    CC,
    CXX,
    CZX,
    CZZ,
    composite_hidden_log_prob,
    composite_log_prob,
    full_log_prob,
    full_marginalizable_log_prob,
    hidden_log_prob,
    marginalizable_gaussian_log_prob,
    mm,
    mmX,
    mmZ,
    multivariate_normal_log_likelihood,
    observed_log_prob,
    sample_nonlinear_nongaussian_trajectory,
    sample_trajectory,
)
if __name__ == "__main__":
    # Reference usage parity: `python3 framework/marginalizable_state_space_model.py` runs the module's
    # property-test battery (marginalizable_state_space_model.py:947-1187).  The battery lives as pytest
    # (tests/test_statespace_api.py); delegate to it.
    import os
    import subprocess
    import sys

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *["tests/test_statespace_api.py"], *sys.argv[1:]],
            cwd=_root,
        )
    )
