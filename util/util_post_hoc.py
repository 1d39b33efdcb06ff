"""Compat shim → multimodal_trajectory_modeling_tpu.utils.post_hoc."""
from multimodal_trajectory_modeling_tpu.utils.post_hoc import (  # noqa: F401
    logit_cv_auc,
    regressed_out_effect_cv,
    stratified_logit_cv_metrics,
)
