"""Host-side utilities: NaN-shape tooling, transforms, plotting, adapters."""

from multimodal_trajectory_modeling_tpu.utils import (  # noqa: F401
    post_hoc,
    state_space,
)
