"""Compat shim → models.ssm_mixture."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.models.ssm_mixture import (  # noqa: F401
    StateSpaceMixtureModel,
    home_dir,
)
if __name__ == "__main__":
    # Reference usage parity: `python3 framework_extended/state_space_model_mixture.py` runs the module's
    # property-test battery (state_space_model_mixture.py:509-600).  The battery lives as pytest
    # (tests/test_extended_framework.py -k 'generic_mixture or parallel_restarts'); delegate to it.
    import os
    import subprocess
    import sys

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *["tests/test_extended_framework.py", "-k", "generic_mixture or parallel_restarts"], *sys.argv[1:]],
            cwd=_root,
        )
    )
