"""Compat shim → models.ssm_mixture."""
from multimodal_trajectory_modeling_tpu.models.ssm_mixture import (  # noqa: F401
    StateSpaceMixtureModel,
    home_dir,
)
