"""Compat shim → multimodal_trajectory_modeling_tpu.utils.macc."""
from multimodal_trajectory_modeling_tpu.utils.macc import *  # noqa: F401,F403
from multimodal_trajectory_modeling_tpu.utils.macc import (  # noqa: F401
    cluster_colors,
    diagnosis_colors,
    diagnosis_list,
    name,
)
