"""Compat shim → models.linear_gaussian."""
from multimodal_trajectory_modeling_tpu.models.linear_gaussian import (  # noqa: F401
    StateSpaceLinearGaussian,
)
