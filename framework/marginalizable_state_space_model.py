"""Compat shim → multimodal_trajectory_modeling_tpu.models.statespace_api.

Exposes the reference's module-level L0 API (mm/CC/log-prob family,
samplers) under its original import path."""
from multimodal_trajectory_modeling_tpu.models.statespace_api import (  # noqa: F401
    CC,
    CXX,
    CZX,
    CZZ,
    composite_hidden_log_prob,
    composite_log_prob,
    full_log_prob,
    full_marginalizable_log_prob,
    hidden_log_prob,
    marginalizable_gaussian_log_prob,
    mm,
    mmX,
    mmZ,
    multivariate_normal_log_likelihood,
    observed_log_prob,
    sample_nonlinear_nongaussian_trajectory,
    sample_trajectory,
)
