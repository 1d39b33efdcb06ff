"""Abstract component-model interface of the extended framework.

Reference semantics: framework_extended/state_space_model.py:14-41 — an
sklearn-style ABC holding an initial-state model, a state-transition model
and a measurement model, fit on ``(states, observations)`` tuples and
scored per-instance.  Subclasses (linear-Gaussian, kNN, hybrid) populate
the three sub-model slots and the data/data-hash bookkeeping.
"""

from __future__ import annotations

import abc

import numpy as np
import sklearn.base as skl_base

# sub-model + bookkeeping slots every component model carries
_COMPONENT_SLOTS = (
    "state_init",
    "state_model",
    "measurement_model",
    "data",
    "data_hash",
)


def resolve_pair(default, data):
    """Training pair when ``data`` is None, else the pair coerced 3-D —
    the shared data-resolution idiom of every component model's
    ``score``/``predict`` surface."""
    if data is None:
        return default
    return tuple(map(np.atleast_3d, data))


class StateSpaceModel(
    skl_base.BaseEstimator, skl_base.DensityMixin, metaclass=abc.ABCMeta
):
    """Abstract base class for a state-space component model."""

    def __init__(self):
        super().__init__()
        for slot in _COMPONENT_SLOTS:
            setattr(self, slot, None)

    def __str__(self):
        return "State space model"

    def fit(self, data: tuple[np.ndarray, np.ndarray]):
        """Fit on a ``(states, observations)`` tuple of T×n×dim arrays."""

    def score(self, data: tuple[np.ndarray, np.ndarray]):
        """Per-instance log-likelihoods on a ``(states, observations)``
        tuple."""

    @property
    def n_params(self):
        raise NotImplementedError
