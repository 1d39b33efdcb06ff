#!/usr/bin/env python3
"""Posterior-weighted average cluster-trajectory figures for ADNI.

For each posterior written by the xval driver (the trajectory-mixture model
and the two GMM-initialised comparators) this renders two panels: the latent
amyloid-vs-gray-matter plane, and ADNI-Mem against gray-matter density.
Output filenames, axis labels/limits and arrow scales follow the reference
pipeline (reference posthoc/plot_posterior_trajectories_adni.py:23-68) so the
produced PDFs slot into the same downstream review; the rendering itself is
done by our HPD plot helper in utils.state_space.
"""

import itertools
import pathlib
import sys

import numpy as np
import pandas as pd

_HERE = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(_HERE.parent))

from multimodal_trajectory_modeling_tpu.utils import adni  # noqa: E402
from multimodal_trajectory_modeling_tpu.utils.state_space import (  # noqa: E402
    plot_weighted_means_2d_trajectories,
)

N_SPLITS = 10
N_CLUSTERS = 4
POSTERIOR_MODELS = ("mtm", "mtm_init", "gmm_init")

# Each panel: how to build the plotted (T, n, 2) values from the ADNI
# trajectories, plus the axis/arrow cosmetics pinned by the reference figures.
PANEL_SPECS = [
    dict(
        tag="posterior",
        values=lambda z, x: z,
        xlabel="β-amyloid burden (centiloid)",
        ylabel="Gray matter density",
        xlim=lambda z, x: (-50.0, 230.0),
        ylim=(-0.275, 0.025),
        arrow_width=0.5,
    ),
    dict(
        tag="gm_vs_adnimem_posterior",
        values=lambda z, x: np.stack((x[..., 0], z[..., -1]), axis=-1),
        xlabel="ADNI-Mem",
        ylabel="Gray matter density",
        xlim=lambda z, x: (
            np.nanmin(x[..., 0]) - 0.2,
            np.nanmax(x[..., 0]) + 0.2,
        ),
        ylim=(-0.275, 0.025),
        arrow_width=0.01,
    ),
]


def _posterior_weights(model_tag: str) -> np.ndarray:
    """Load the per-instance cluster posterior the xval driver wrote."""
    csv = _HERE / "results" / (
        f"ADNI_r7_xval{N_SPLITS}_{N_CLUSTERS}clusters_{model_tag}_post.csv"
    )
    return pd.read_csv(csv, index_col="id").values.astype(float)


def _figure_path(model_tag: str, panel_tag: str) -> pathlib.Path:
    figdir = _HERE.parent / "figures"
    figdir.mkdir(exist_ok=True)
    return figdir / (
        f"ADNI_r7_xval{N_SPLITS}_{N_CLUSTERS}cl_{model_tag}_{panel_tag}.pdf"
    )


def main():
    z, x, _d, _ids, _time = adni.get_trajectories()

    for model_tag, spec in itertools.product(POSTERIOR_MODELS, PANEL_SPECS):
        plot_weighted_means_2d_trajectories(
            weights=_posterior_weights(model_tag),
            values=spec["values"](z, x),
            colors=adni.cluster_colors,
            saveloc=_figure_path(model_tag, spec["tag"]),
            xlabel=spec["xlabel"],
            ylabel=spec["ylabel"],
            xlim=spec["xlim"](z, x),
            ylim=spec["ylim"],
            soft_assignment=True,
            arrow_width=spec["arrow_width"],
            # the most-advanced cluster's mean trajectory is cut after step 3
            # in the published figures
            truncate_after=[None, None, None, 3],
        )


if __name__ == "__main__":
    main()
