"""Model layer: the jitted hard-EM engine and the public model classes."""

from multimodal_trajectory_modeling_tpu.models import em  # noqa: F401
from multimodal_trajectory_modeling_tpu.models import (  # noqa: F401
    statespace_api,
)
from multimodal_trajectory_modeling_tpu.models.classifier import (  # noqa: F401
    StateSpaceModelClassifier,
)
from multimodal_trajectory_modeling_tpu.models.hybrid import (  # noqa: F401
    StateSpaceHybrid,
)
from multimodal_trajectory_modeling_tpu.models.knn_model import (  # noqa: F401
    StateSpaceKNN,
)
from multimodal_trajectory_modeling_tpu.models.linear_gaussian import (  # noqa: F401
    StateSpaceLinearGaussian,
)
from multimodal_trajectory_modeling_tpu.models.mixture import (  # noqa: F401
    MMLinGaussSS_marginalizable,
)
from multimodal_trajectory_modeling_tpu.models.ssm_mixture import (  # noqa: F401
    StateSpaceMixtureModel,
)
from multimodal_trajectory_modeling_tpu.models.state_space_model import (  # noqa: F401
    StateSpaceModel,
)
