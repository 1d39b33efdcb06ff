"""Compat shim → models.linear_gaussian."""
from multimodal_trajectory_modeling_tpu.models.linear_gaussian import (  # noqa: F401
    StateSpaceLinearGaussian,
)
import numpy as _np

# reference module-level constant (state_space_model_linear_gaussian.py:16)
np_eps = _np.finfo(float).eps
