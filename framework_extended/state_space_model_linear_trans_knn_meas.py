"""Compat shim → models.hybrid."""
from multimodal_trajectory_modeling_tpu.models.hybrid import (  # noqa: F401
    StateSpaceHybrid,
)
