"""Compat shim → models.hybrid."""
from multimodal_trajectory_modeling_tpu.models.hybrid import (  # noqa: F401
    StateSpaceHybrid,
)
import numpy as _np

# reference module-level constant (state_space_model_linear_trans_knn_meas.py)
np_eps = _np.finfo(float).eps
