"""Abstract component-model interface of the extended framework.

Reference: framework_extended/state_space_model.py:14-41 — an sklearn-style
ABC holding an initial-state model, a state-transition model and a
measurement model, fit on ``(states, observations)`` tuples and scored
per-instance.
"""

from __future__ import annotations

import abc

import numpy as np
import sklearn.base as skl_base


class StateSpaceModel(
    skl_base.BaseEstimator, skl_base.DensityMixin, metaclass=abc.ABCMeta
):
    """Abstract base class for a state-space component model."""

    def __init__(self):
        super().__init__()
        self.state_init = None
        self.state_model = None
        self.measurement_model = None
        self.data = None
        self.data_hash = None

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
