"""Generative Bayes classifier over state-space component models.

Reference: framework_extended/state_space_model_classifier.py:14-96 — one
component model per label class plus empirical class propensities; posterior
by Bayes rule.  Log-space throughout (softmax / logsumexp) for stability.
"""

from __future__ import annotations

import numpy as np
from sklearn import base as skl_base


class StateSpaceModelClassifier(
    skl_base.BaseEstimator, skl_base.DensityMixin, skl_base.ClassifierMixin
):
    """p(data | class) learned as a state-space model per class."""

    def __init__(self, component_model):
        super().__init__()
        self.component_model = component_model
        self.classes, self.n_classes = None, None
        self.propensities = None
        self.class_models = None
        self.data = None

    def fit(self, data: tuple[np.ndarray, np.ndarray], labels: np.ndarray):
        self.data = tuple(map(np.atleast_3d, data))
        states, measurements = data
        self.classes, counts = np.unique(labels, return_counts=True)
        self.n_classes = len(self.classes)
        self.propensities = counts / np.sum(counts)
        self.class_models = [self.component_model() for _ in self.classes]
        for i, c in enumerate(self.classes):
            self.class_models[i].fit(
                data=(states[:, labels == c], measurements[:, labels == c])
            )
        return self

    def _logits(self, data) -> np.ndarray:
        """(n, K) matrix of log propensity + per-class scores."""
        return np.column_stack(
            [
                np.log(self.propensities[i])
                + np.asarray(self.class_models[i].score(data=data), float)
                for i in range(self.n_classes)
            ]
        )

    def score(self, data: tuple[np.ndarray, np.ndarray] = None) -> float:
        """Σ_i log Σ_k π_k p(data_i | k) via logsumexp (reference
        classifier:46-63)."""
        if data is None:
            data = self.data
        else:
            data = tuple(map(np.atleast_3d, data))
        logits = self._logits(data)
        assert logits.shape[0] == data[0].shape[1]
        mx = logits.max(axis=1)
        return float(
            np.sum(mx + np.log(np.sum(np.exp(logits - mx[:, None]), axis=1)))
        )

    def predict_proba(
        self, data: tuple[np.ndarray, np.ndarray] = None
    ) -> np.ndarray:
        if data is None:
            data = self.data
        else:
            data = tuple(map(np.atleast_3d, data))
        logits = self._logits(data)
        shifted = logits - logits.max(axis=1, keepdims=True)
        pc = np.exp(shifted)
        pc /= np.sum(pc, axis=1, keepdims=True)
        assert pc.shape[0] == data[0].shape[1]
        assert np.all(pc >= 0.0) and np.allclose(np.sum(pc, axis=-1), 1.0)
        return pc

    def predict(
        self, data: tuple[np.ndarray, np.ndarray] = None
    ) -> np.ndarray:
        if data is None:
            data = self.data
        else:
            data = tuple(map(np.atleast_3d, data))
        preds = self.classes[np.argmax(self.predict_proba(data), axis=1)]
        assert preds.size == data[0].shape[1]
        return preds
