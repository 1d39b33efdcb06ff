"""Compat shim → multimodal_trajectory_modeling_tpu.utils.adni."""
from multimodal_trajectory_modeling_tpu.utils.adni import *  # noqa: F401,F403
from multimodal_trajectory_modeling_tpu.utils.adni import (  # noqa: F401
    cluster_colors,
    diagnosis_colors,
    diagnosis_list,
    hidden_columns,
    name,
    observed_columns,
)
