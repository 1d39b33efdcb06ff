"""Compat shim → models.classifier."""
from multimodal_trajectory_modeling_tpu.models.classifier import (  # noqa: F401
    StateSpaceModelClassifier,
)
