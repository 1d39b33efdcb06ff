"""Compat shim → multimodal_trajectory_modeling_tpu.utils.state_space."""
from multimodal_trajectory_modeling_tpu.utils.state_space import *  # noqa: F401,F403
from multimodal_trajectory_modeling_tpu.utils.state_space import (  # noqa: F401
    CLUSTER_COLORS,
)
from multimodal_trajectory_modeling_tpu.utils.state_space import (  # noqa: F401
    slugify as make_str_nice,
    tidy_labels as format_names,
)
import os as _os

# reference module-level constant (util_state_space.py:30): the repo root —
# scripts use it to anchor figure/result output paths
home_dir = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
