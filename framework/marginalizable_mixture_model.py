"""Compat shim → multimodal_trajectory_modeling_tpu.models.mixture."""
from multimodal_trajectory_modeling_tpu.models.mixture import (  # noqa: F401
    MMLinGaussSS_marginalizable,
    home_dir,
    np_eps,
)
