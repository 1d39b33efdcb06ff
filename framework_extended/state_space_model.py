"""Compat shim → models.state_space_model."""
from multimodal_trajectory_modeling_tpu.models.state_space_model import (  # noqa: F401
    StateSpaceModel,
)
