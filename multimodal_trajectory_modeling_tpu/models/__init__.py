"""Model layer: the jitted hard-EM engine and the public model classes."""

from multimodal_trajectory_modeling_tpu.models import em  # noqa: F401
from multimodal_trajectory_modeling_tpu.models.mixture import (  # noqa: F401
    MMLinGaussSS_marginalizable,
)
