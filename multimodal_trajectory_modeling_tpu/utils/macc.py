"""MACC dataset adapter (reference ``util/util_macc.py``).

The MACC trajectories npz is *not shipped* (patient privacy —
reference README.md:138-140); code paths gate on its presence.
"""

from __future__ import annotations

import os

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

pd.options.display.float_format = "{:,.3f}".format

name = "MACC"
diagnosis_list = ["NCI", "CIND", "VCIND", "AD"]

cluster_colors = (
    "#0072CE",
    "#E87722",
    "#64A70B",
    "#93328E",
    "#A81538",
    "#4E5B31",
)

diagnosis_colors = tuple(
    np.flipud(
        np.array(plt.colormaps["cividis"].colors)[
            np.linspace(
                0, plt.colormaps["cividis"].N - 1, len(diagnosis_list)
            ).astype(int)
        ]
    )
)

_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def data_available() -> bool:
    return os.path.exists(os.path.join(_DATA_DIR, "macc-trajectories.npz"))


def get_data() -> tuple:
    """(z, x, d, mmse_cdrsum_cdrglobal, ell, ids, ages) — reference
    util_macc.py:40-55."""
    npz = np.load(
        os.path.join(_DATA_DIR, "macc-trajectories.npz"), allow_pickle=True
    )
    return tuple(
        npz[k]
        for k in ["z", "x", "d", "mmse_cdrsum_cdrglobal", "ell", "ids", "ages"]
    )


def get_final_diagnoses(diagnoses: np.ndarray) -> np.ndarray:
    """Final diagnosis per person; MACC pads with ``None``
    (reference util_macc.py:58-78)."""
    paths = [
        "->".join(traj).replace("->None", "")
        for traj in diagnoses.squeeze().transpose().astype(str).tolist()
    ]
    return np.array([p.split("->")[-1] for p in paths])


def get_annualized_mmse_changes() -> np.ndarray:
    """(MMSE_last − MMSE_first) / (age_last − age_first) per person
    (reference util_macc.py:81-92)."""
    *_, scores, ell, _, ages = get_data()
    out = []
    for i, li in enumerate(ell):
        out.append(
            (scores[li - 1, i, 0] - scores[0, i, 0])
            / (ages[li - 1, i] - ages[0, i])
        )
    return np.array(out)


def get_demographics(ids) -> pd.DataFrame:
    return pd.read_csv(
        os.path.join(_DATA_DIR, "macc-profiling.csv"), index_col="Harmy_ID"
    ).loc[np.asarray(ids).ravel()]


if __name__ == "__main__":
    if not data_available():
        print(f"{name} data not shipped (patient privacy); nothing to do.")
    else:
        z, x, d, _, length, ids, ages = get_data()
        print("lengths: ", dict(zip(*np.unique(length, return_counts=True))))
        finals = get_final_diagnoses(d).ravel()
        print(
            pd.Series(finals, name="diagnosis").value_counts().loc[diagnosis_list]
        )
