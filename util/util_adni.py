"""Compat shim → multimodal_trajectory_modeling_tpu.utils.adni."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.utils.adni import *  # noqa: F401,F403
from multimodal_trajectory_modeling_tpu.utils.adni import (  # noqa: F401
    cluster_colors,
    diagnosis_colors,
    diagnosis_list,
    hidden_columns,
    name,
    observed_columns,
)

if __name__ == "__main__":
    # Reference usage parity: `python3 util/util_adni.py` prints the
    # ADNI summary-statistics block (util_adni.py:410-487); the
    # implementation module carries it.
    import subprocess
    import sys

    sys.exit(
        subprocess.call(
            [
                sys.executable,
                "-m",
                "multimodal_trajectory_modeling_tpu.utils.adni",
            ],
            cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        )
    )
