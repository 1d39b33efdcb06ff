"""Compat shim → multimodal_trajectory_modeling_tpu.utils.macc."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.utils.macc import *  # noqa: F401,F403
from multimodal_trajectory_modeling_tpu.utils.macc import (  # noqa: F401
    cluster_colors,
    diagnosis_colors,
    diagnosis_list,
    name,
)

if __name__ == "__main__":
    # Reference usage parity (util_macc.py:171-195; gates cleanly on
    # the unshipped MACC data exactly as the reference does).
    import subprocess
    import sys

    sys.exit(
        subprocess.call(
            [
                sys.executable,
                "-m",
                "multimodal_trajectory_modeling_tpu.utils.macc",
            ],
            cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        )
    )
