#!/usr/bin/env python3
"""Nonlinear component-model comparison on ADNI: kNN mixture, hybrid
(linear transition + kNN measurement) mixture, and the linear-Gaussian
mixture, for 3 and 4 clusters.

Behavioral equivalent of the reference driver
(inference-adni-trajectories-nonlinear.py:23-111); expected reference
outputs in its trailing docstring (:114-170) are the parity targets.
"""

import os
import sys
import textwrap

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

from multimodal_trajectory_modeling_tpu import config as mtm_config

# Parity mode: the reference computes in float64; TPU lacks f64 linalg, so
# the ADNI-scale drivers run on CPU x64 (set MTM_DEVICE=tpu for f32-on-TPU).
if os.environ.get("MTM_DEVICE", "cpu") == "cpu":
    mtm_config.use_cpu_x64()
mtm_config.enable_persistent_compilation_cache()

from multimodal_trajectory_modeling_tpu.models import (
    MMLinGaussSS_marginalizable,
)
from multimodal_trajectory_modeling_tpu.models.hybrid import StateSpaceHybrid
from multimodal_trajectory_modeling_tpu.models.knn_model import StateSpaceKNN
from multimodal_trajectory_modeling_tpu.models.ssm_mixture import (
    StateSpaceMixtureModel,
)
from multimodal_trajectory_modeling_tpu.utils import adni as data
from multimodal_trajectory_modeling_tpu.utils import state_space as util

alpha = 1.0
n_cluster_list = [3, 4]
n_restarts = int(os.environ.get("MTM_N_RESTARTS", "1000"))
n_jobs = int(os.environ.get("MTM_N_JOBS", "1"))


def main():
    (z_orig, x, d, ids, time, mmse, approx_age) = data.get_trajectories(
        return_mmse=True, return_approx_age=True
    )
    z, std_param = util.standardize(z_orig, return_params=True)
    os.makedirs("figures", exist_ok=True)

    for n_clusters in n_cluster_list:
        print(f"|{n_clusters=}|".upper().center(79, "="))

        print("Mixture of k-NN-based State Space models".ljust(79, "-"))
        best_mdl_knn = StateSpaceMixtureModel(
            n_clusters=n_clusters,
            data=(z, x),
            component_model=StateSpaceKNN,
            component_model_hyperparams={"n_neighbors": [5, 10, 15]},
        ).fit(n_restarts=n_restarts, n_jobs=n_jobs)
        data.set_model_correspondence(best_mdl_knn, d)
        data.plot_2d_trajectories(
            best_mdl_knn,
            savename=os.path.join(
                "figures", f"r7_adni_knn{n_clusters}cluster.pdf"
            ),
            title="",
            states=z_orig,
            xlabel="β-amyloid burden (centiloid)",
        )
        data.generate_outcome_table(best_mdl_knn, d)
        print(f"{best_mdl_knn.hex_hash=}")

        print("-" * 79)
        print("Mixture of state space models with linear transition model and")
        print("k-NN-based measurement model".ljust(79, "-"))
        best_mdl_hybrid = StateSpaceMixtureModel(
            n_clusters=n_clusters,
            data=(z, x),
            component_model=StateSpaceHybrid,
            component_model_hyperparams={
                "n_neighbors": [5, 10, 15],
                "alpha": 1.0,
            },
        ).fit(n_restarts=n_restarts, n_jobs=n_jobs)
        data.set_model_correspondence(best_mdl_hybrid, d)
        data.plot_2d_trajectories(
            best_mdl_hybrid,
            savename=os.path.join(
                "figures", f"r7_adni_hybrid{n_clusters}cluster.pdf"
            ),
            title="",
            states=z_orig,
            xlabel="β-amyloid burden (centiloid)",
        )
        data.generate_outcome_table(best_mdl_hybrid, d)
        print(f"{best_mdl_hybrid.hex_hash=}")

        print("-" * 79)
        print("Mixture of linear Gaussian State Space models".ljust(79, "-"))
        best_mdl_lg0 = MMLinGaussSS_marginalizable(
            n_clusters=n_clusters,
            states=z,
            observations=x,
            random_seed=0,
            init="kmeans",
            alpha=1.0,
        ).train_with_multiple_random_starts(n_starts=n_restarts)
        data.set_model_correspondence(best_mdl_lg0, d)
        best_mdl_lg0.to_pickle()  # update correspondence in the cache
        data.generate_outcome_table(best_mdl_lg0, d)
        data.plot_2d_trajectories(
            best_mdl_lg0,
            savename=os.path.join(
                "figures", f"r7_adni_lg{n_clusters}cluster.pdf"
            ),
            title="",
            states=z_orig,
            xlabel="β-amyloid burden (centiloid)",
        )
        print(f"{best_mdl_lg0.hex_hash=}")

    print("\n".join(textwrap.wrap(f"{std_param=}")))


if __name__ == "__main__":
    main()
