"""Compat shim → multimodal_trajectory_modeling_tpu.utils.post_hoc."""
if __name__ == "__main__":  # direct execution: repo root onto sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )

from multimodal_trajectory_modeling_tpu.utils.post_hoc import (  # noqa: F401
    logit_cv_auc,
    regressed_out_effect_cv,
    stratified_logit_cv_metrics,
)

if __name__ == "__main__":
    # Reference usage parity: the util_post_hoc.py:84-104 self-demo —
    # regress out a non-Gaussian effect, report OLS R² before/after and
    # a logit CV AUC (plain-numpy OLS; statsmodels is absent here).
    import numpy as np

    n = 1000
    rng = np.random.default_rng(0)
    X = rng.normal(size=n)
    t = np.square(rng.normal(size=n))  # non-gaussian noise
    Y = X + t
    Y_less_t = regressed_out_effect_cv(Y.reshape(-1, 1), t.reshape(-1, 1))

    def _ols_r2(y, x):
        Xd = np.column_stack([np.ones_like(x), x])
        resid = y - Xd @ np.linalg.lstsq(Xd, y, rcond=None)[0]
        return 1.0 - resid.var() / y.var()

    r2_before_regressing_out = _ols_r2(Y, X)
    r2_after_regressing_out = _ols_r2(np.ravel(Y_less_t), X)
    print(f"{r2_before_regressing_out=:.2f}")
    print(f"{r2_after_regressing_out=:.2f}")
    print(f"{logit_cv_auc(X.reshape(-1, 1), (Y > 0.5).astype(int))=:.2f}")
