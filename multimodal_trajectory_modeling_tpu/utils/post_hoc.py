"""Cross-validated post-hoc helpers (reference ``util/util_post_hoc.py``):
CV residualization, logistic-regression AUCs and stratified CV metrics."""

from __future__ import annotations

import warnings

import numpy as np
import scipy.stats as sp_stats
import sklearn.linear_model as skl_lm
import sklearn.metrics as skl_mets
import sklearn.model_selection as skl_mdl_sel


def regressed_out_effect_cv(
    regressand: np.ndarray, effect: np.ndarray, model=None
):
    """Residuals of ``regressand`` after cross-validated removal of
    ``effect`` (reference util_post_hoc.py:17-38)."""
    if model is None:
        model = skl_lm.RidgeCV()
    fin = np.isfinite(np.column_stack([regressand, effect])).all(axis=1)
    if not fin.all():
        warnings.warn(f"Encountered {int((~fin).sum())} nans")
    preds = skl_mdl_sel.cross_val_predict(
        model, X=effect[fin], y=regressand[fin], n_jobs=-1, cv=5
    )
    resids = np.full_like(regressand, np.nan)
    # cross_val_predict may return (n,) where y was (n, 1)
    resids[fin] = regressand[fin] - np.reshape(
        preds, np.shape(regressand[fin])
    )
    return resids


def logit_cv_auc(X: np.ndarray, y: np.ndarray, cv: int = 5):
    """AUC of cross-validated LogisticRegressionCV predictions
    (reference util_post_hoc.py:41-57)."""
    fin = np.isfinite(np.column_stack([X, y])).all(axis=1)
    if (n_nan := int((~fin).sum())) > 0:
        warnings.warn(f"Dropping {n_nan} nans")
        X, y = X[fin], y[fin]
    preds = skl_mdl_sel.cross_val_predict(
        skl_lm.LogisticRegressionCV(scoring="roc_auc"),
        X=X,
        y=y,
        cv=cv,
        method="predict_proba",
        n_jobs=-1,
    )[:, 1]
    return skl_mets.roc_auc_score(y, preds)


def stratified_logit_cv_metrics(
    X: np.ndarray, y: np.ndarray, return_perfs: bool = False
):
    """Per-fold AUCs of a 10-fold stratified LogisticRegressionCV
    (reference util_post_hoc.py:60-80)."""
    pred_col = 0.0 * y
    fold_aucs = []
    splitter = skl_mdl_sel.StratifiedKFold(
        n_splits=10, shuffle=True, random_state=42
    )
    for train_idx, test_idx in splitter.split(X, y):
        pred_col[test_idx] = (
            skl_lm.LogisticRegressionCV()
            .fit(X=X[train_idx], y=y[train_idx])
            .predict_proba(X[test_idx])[:, 1][:, np.newaxis]
        )
        fold_aucs.append(
            skl_mets.roc_auc_score(y_true=y[test_idx], y_score=pred_col[test_idx])
        )
    perf = {
        "AUC": round(float(skl_mets.roc_auc_score(y_true=y, y_score=pred_col)), 4),
        "mean batch AUC": round(float(np.mean(fold_aucs)), 4),
        "std dev batch AUC": round(float(np.std(fold_aucs)), 4),
        "std err of the mean": round(float(sp_stats.sem(fold_aucs)), 4),
    }
    return fold_aucs if not return_perfs else (fold_aucs, perf)
