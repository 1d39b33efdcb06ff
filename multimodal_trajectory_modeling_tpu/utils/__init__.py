"""Host-side utilities: NaN-shape tooling, transforms, plotting, adapters,
survival/LME statistics, tracing and checkpointing."""

from multimodal_trajectory_modeling_tpu.utils import (  # noqa: F401
    lme,
    post_hoc,
    state_space,
    survival,
    trace,
)
