"""Compat shim → multimodal_trajectory_modeling_tpu.models.mixture."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.models.mixture import (  # noqa: F401
    MMLinGaussSS_marginalizable,
    home_dir,
    np_eps,
)
if __name__ == "__main__":
    # Reference usage parity: `python3 framework/marginalizable_mixture_model.py` runs the module's
    # property-test battery (marginalizable_mixture_model.py:1920-2103).  The battery lives as pytest
    # (tests/test_mixture_api.py); delegate to it.
    import os
    import subprocess
    import sys

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *["tests/test_mixture_api.py"], *sys.argv[1:]],
            cwd=_root,
        )
    )
