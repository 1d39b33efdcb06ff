"""Pure-JAX compute kernels (moments, masked Gaussians, regression, samplers,
kNN) — everything jittable, vmappable and shardable."""

from multimodal_trajectory_modeling_tpu.ops.moments import (  # noqa: F401
    joint_cov,
    joint_mean,
    joint_moments,
    latent_cov,
    latent_cov_blocks,
    latent_means,
    observed_cov,
    observed_mean,
    observed_moments,
)
from multimodal_trajectory_modeling_tpu.ops.gaussian import (  # noqa: F401
    masked_identity_pad,
    masked_mvn_logpdf,
    masked_mvn_logpdf_grouped,
    mvn_logpdf,
    pattern_groups,
)
from multimodal_trajectory_modeling_tpu.ops.regression import (  # noqa: F401
    RegressionStats,
    masked_mean_and_cov,
    regress,
    solve_regression,
    weighted_regression_stats,
)
from multimodal_trajectory_modeling_tpu.ops.samplers import (  # noqa: F401
    sample_nonlinear_trajectories,
    sample_trajectories,
)
from multimodal_trajectory_modeling_tpu.ops.regression import (  # noqa: F401
    MomentStats,
    masked_moment_stats,
    mean_cov_from_stats,
    weighted_regression_stats_timebatched,
)
from multimodal_trajectory_modeling_tpu.ops.knn import (  # noqa: F401
    KNNRegressor,
    grid_search_knn,
    knn_predict,
)
from multimodal_trajectory_modeling_tpu.ops.markov import (  # noqa: F401
    is_suffix_mask,
    markov_cluster_weights,
    markov_suffix_logliks,
    suffix_lengths,
)
from multimodal_trajectory_modeling_tpu.ops.kalman import (  # noqa: F401
    kalman_filter_covs,
    kalman_observed_logliks,
)
