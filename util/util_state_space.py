"""Compat shim → multimodal_trajectory_modeling_tpu.utils.state_space."""
from multimodal_trajectory_modeling_tpu.utils.state_space import *  # noqa: F401,F403
from multimodal_trajectory_modeling_tpu.utils.state_space import (  # noqa: F401
    CLUSTER_COLORS,
)
from multimodal_trajectory_modeling_tpu.utils.state_space import (  # noqa: F401
    slugify as make_str_nice,
    tidy_labels as format_names,
)
