"""Compat shim → models.knn_model."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.models.knn_model import (  # noqa: F401
    StateSpaceKNN,
)
if __name__ == "__main__":
    # Reference usage parity: `python3 framework_extended/state_space_model_knn.py` runs the module's
    # property-test battery (state_space_model_knn.py:158-205).  The battery lives as pytest
    # (tests/test_extended_framework.py -k knn); delegate to it.
    import os
    import subprocess
    import sys

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *["tests/test_extended_framework.py", "-k", "knn"], *sys.argv[1:]],
            cwd=_root,
        )
    )
