#!/usr/bin/env python3
"""Model-selection sweep: fit the LG-SSM mixture for 1..7 clusters on ADNI
and plot elbow curves of Q / AIC / BIC.

Behavioral equivalent of the reference driver (model-selection.py:26-104):
standardized hidden states, alpha=1.0, 1000 random starts per cluster count
with the content-addressed cache, figures into ``figures/``.
"""

import os
import sys

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

import matplotlib.pyplot as plt

from multimodal_trajectory_modeling_tpu.models import (
    MMLinGaussSS_marginalizable,
)
from multimodal_trajectory_modeling_tpu.utils import adni as data_adni
from multimodal_trajectory_modeling_tpu.utils import state_space as util

plt.rcParams["figure.autolayout"] = True
plt.rcParams["legend.loc"] = "upper right"
plt.rcParams["font.family"] = "serif"

alpha = 1.0
n_cluster_list = range(1, 8)


def main():
    ztrain_orig, xtrain, *_ = data_adni.get_trajectories()
    ztrain, std_param = util.standardize(ztrain_orig, return_params=True)

    mdls = [
        MMLinGaussSS_marginalizable(
            n_clusters=n_clusters,
            states=ztrain,
            observations=xtrain,
            init="k-means",
            alpha=alpha,
        ).train_with_multiple_random_starts(n_starts=1000, use_cache=True)
        for n_clusters in n_cluster_list
    ]

    criteria = {
        "Expected complete data log likelihood": "e_complete_data_log_lik",
        "AIC": "aic",
        "BIC": "bic",
    }
    os.makedirs("figures", exist_ok=True)
    for label, attr in criteria.items():
        fig, ax = plt.subplots()
        ax.spines["right"].set_visible(False)
        ax.spines["top"].set_visible(False)
        values = [
            getattr(m, attr)(states=ztrain, observations=xtrain)
            for m in mdls
        ]
        ax.plot(
            n_cluster_list, values, "o-", color="#0072CE", linestyle="solid"
        )
        plt.xticks(ticks=n_cluster_list, labels=n_cluster_list)
        ax.set_xlabel("Number of clusters")
        ax.set_ylabel(label)
        plt.tight_layout()
        plt.savefig(
            os.path.join("figures", f"ADNI_elbow_plot_{attr.upper()}.pdf"),
            bbox_inches="tight",
            transparent=True,
        )
        print(f"{label}: {[round(float(vv), 1) for vv in values]}")

    for m in mdls:
        m.to_pickle()


if __name__ == "__main__":
    main()
