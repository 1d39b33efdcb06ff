"""Compat shim → models.knn_model."""
from multimodal_trajectory_modeling_tpu.models.knn_model import (  # noqa: F401
    StateSpaceKNN,
)
