#!/usr/bin/env python3
"""10-fold cross-validated inference on ADNI with label harmonization
across folds.

Behavioral equivalent of the reference driver (inference-adni-xval.py:
28-524): per fold — standardize hidden states on train, fit the 4-cluster
LG-SSM mixture (1000 starts, cached), relabel clusters by AD rate, score the
held-out fold under the full / snapshot / no-hidden / initial-visit input
variants, fit the supervised SSM classifier, fit a t=0 GaussianMixture
baseline, and write the results CSVs + posterior CSVs + per-fold train
tables used by the collate driver and the post-hoc stage.
"""

import gzip
import os
import pickle
import string
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

import numpy as np
import pandas as pd
import sklearn.mixture as skl_mix
import sklearn.model_selection as skl_mdl_sel
import tqdm as tq

from multimodal_trajectory_modeling_tpu.models import (
    MMLinGaussSS_marginalizable,
)
from multimodal_trajectory_modeling_tpu.models.classifier import (
    StateSpaceModelClassifier,
)
from multimodal_trajectory_modeling_tpu.models.linear_gaussian import (
    StateSpaceLinearGaussian,
)
from multimodal_trajectory_modeling_tpu.utils import adni as data
from multimodal_trajectory_modeling_tpu.utils import state_space as ssu

n_splits, n_clusters = 10, 4
alpha = 1.0
n_starts = int(os.environ.get("MTM_N_RESTARTS", "1000"))


def _letters(mdl, assignments):
    return np.array([mdl.correspondence[c] for c in assignments])


def _ordered_cluster_indices(mdl):
    return [
        mdl.inverse_correspondence[s]
        for s in string.ascii_uppercase[:n_clusters]
    ]


def main():
    z, x, d, ids, time = data.get_trajectories()
    z_dim = z.shape[-1]
    markers = np.concatenate([z, x], axis=-1)

    df_results = pd.DataFrame(
        index=pd.MultiIndex.from_arrays(
            [np.vstack(list(ids)).flatten(), np.vstack(list(time)).flatten()],
            names=["id", "time"],
        ),
        columns=[
            "split",
            "our_cluster",
            "our_cluster_snapshots",
            "our_cluster_snapshots_no_hidden",
            "our_cluster_no_hidden",
        ],
    ).assign(diagnosis=np.vstack(list(d)).flatten())

    post_cols = ["prob_" + s for s in string.ascii_uppercase[:n_clusters]]
    df_posterior = pd.DataFrame(index=ids[0].ravel(), columns=post_cols)
    df_init_post = df_posterior.copy()
    df_gmm = pd.DataFrame(index=ids[0].ravel(), columns=post_cols)

    dict_training_results = dict()

    splitter = skl_mdl_sel.KFold(
        n_splits=n_splits, shuffle=True, random_state=42
    )
    for i_split, (train_mask, test_mask) in tq.tqdm(
        enumerate(splitter.split(ids[0].ravel())),
        total=n_splits,
        desc="folds",
        position=1,
    ):
        dtrain, idtrain, timetrain = (
            d[:, train_mask],
            ids[:, train_mask],
            time[:, train_mask],
        )
        dtest, idtest, timetest = (
            d[:, test_mask],
            ids[:, test_mask],
            time[:, test_mask],
        )
        mtrain, mtest = markers[:, train_mask], markers[:, test_mask]
        ztrain, xtrain = z[:, train_mask], x[:, train_mask]
        ztest, xtest = z[:, test_mask], x[:, test_mask]

        df_results.loc[
            lambda df: df.index.get_level_values("id").isin(
                idtest.ravel().tolist()
            ),
            "split",
        ] = i_split

        # --- our mixture model -----------------------------------------
        mtrain_ours = mtrain.copy()
        mtrain_ours[:, :, :z_dim], std_params = ssu.standardize(
            mtrain_ours[:, :, :z_dim], return_params=True
        )
        mtest_ours = mtest.copy()
        mtest_ours[:, :, :z_dim] = ssu.standardize(
            mtest_ours[:, :, :z_dim], params=std_params
        )

        best_mdl = MMLinGaussSS_marginalizable(
            n_clusters=n_clusters,
            states=mtrain_ours[:, :, :z_dim],
            observations=mtrain_ours[:, :, z_dim:],
            init="k-means",
            alpha=alpha,
        ).train_with_multiple_random_starts(
            n_starts=n_starts, use_cache=True
        )
        data.set_model_correspondence(best_mdl, dtrain)
        best_mdl.to_pickle()

        ctrain = _letters(best_mdl, best_mdl.mle_cluster_assignment())

        assignments, probs, prenorm = best_mdl.mle_cluster_assignment(
            states=mtest_ours[:, :, :z_dim],
            observations=mtest_ours[:, :, z_dim:],
            return_probs=True,
            return_prenormalized_log_probs=True,
        )
        ctest_all = _letters(best_mdl, assignments)
        df_posterior.loc[idtest[0].ravel()] = probs[
            _ordered_cluster_indices(best_mdl)
        ].T

        _, probs0 = best_mdl.mle_cluster_assignment(
            states=ssu.mask_all_but_time_i(mtest_ours[..., :z_dim], 0),
            observations=ssu.mask_all_but_time_i(mtest_ours[..., z_dim:], 0),
            return_probs=True,
        )
        df_init_post.loc[idtest[0].ravel()] = probs0[
            _ordered_cluster_indices(best_mdl)
        ].T

        prob_c_all = prenorm[assignments, np.arange(assignments.size)]
        indextest_all = best_mdl.cluster_assignment_index(
            states=mtest_ours[:, :, :z_dim],
            observations=mtest_ours[:, :, z_dim:],
        )

        z_parc, x_parc = ssu.parcellate_arrays(
            mtest_ours[:, :, :z_dim], mtest_ours[:, :, z_dim:]
        )
        ctest_snapshots = _letters(
            best_mdl,
            best_mdl.mle_cluster_assignment(
                states=z_parc, observations=x_parc
            ),
        )
        indextest_snapshots = best_mdl.cluster_assignment_index(
            states=z_parc, observations=x_parc
        )
        ctest_snapshot_x = _letters(
            best_mdl,
            best_mdl.mle_cluster_assignment(
                states=np.nan * np.ones_like(z_parc), observations=x_parc
            ),
        )

        mtest_no_hidden = mtest_ours.copy()
        mtest_no_hidden[:, :, :z_dim] = np.nan
        ctest_no_hidden = _letters(
            best_mdl,
            best_mdl.mle_cluster_assignment(
                states=mtest_no_hidden[:, :, :z_dim],
                observations=mtest_no_hidden[:, :, z_dim:],
            ),
        )
        indextest_no_hidden = best_mdl.cluster_assignment_index(
            states=mtest_no_hidden[:, :, :z_dim],
            observations=mtest_no_hidden[:, :, z_dim:],
        )
        indextest_no_hidden_init = best_mdl.cluster_assignment_index(
            states=ssu.mask_all_but_time_i(mtest_no_hidden[:, :, :z_dim], 0),
            observations=ssu.mask_all_but_time_i(
                mtest_no_hidden[:, :, z_dim:], 0
            ),
        )

        # --- supervised classifier -------------------------------------
        clssfr = StateSpaceModelClassifier(
            component_model=StateSpaceLinearGaussian
        ).fit(
            data=(mtrain_ours[:, :, :z_dim], mtrain_ours[:, :, z_dim:]),
            labels=data.get_final_diagnoses(dtrain),
        )
        c_sprvsd = clssfr.predict(
            data=(mtest_ours[:, :, :z_dim], mtest_ours[:, :, z_dim:])
        )

        # --- GaussianMixture baseline on t=0 ---------------------------
        gmm_init = skl_mix.GaussianMixture(
            n_components=n_clusters,
            covariance_type="full",
            max_iter=1000,
            init_params="kmeans",
            random_state=42,
        )
        gmm_train_raw = gmm_init.fit_predict(
            np.concatenate([ztrain, xtrain], axis=-1)[0]
        )
        gmm_corr = dict(
            zip(
                np.argsort(
                    [
                        np.mean(
                            data.get_final_diagnoses(dtrain)[
                                gmm_train_raw == c
                            ]
                            == "AD"
                        )
                        for c in range(n_clusters)
                    ]
                ),
                string.ascii_uppercase,
            )
        )
        gmm_train_preds = np.array([gmm_corr[p] for p in gmm_train_raw])
        gmm_test_preds = np.array(
            [
                gmm_corr[p]
                for p in gmm_init.predict(
                    np.concatenate([ztest, xtest], axis=-1)[0]
                )
            ]
        )
        df_gmm.loc[idtest[0].ravel()] = gmm_init.predict_proba(
            np.concatenate([ztest, xtest], axis=-1)[0]
        )[:, sorted(gmm_corr.keys(), key=gmm_corr.__getitem__)]

        # --- store fold results ----------------------------------------
        df_train = pd.DataFrame(
            data={
                "idx": idtrain.ravel(),
                "time": timetrain.ravel(),
                "diagnosis": dtrain.ravel(),
            }
        ).set_index("idx")
        train_lookup = dict(zip(idtrain[0].ravel(), ctrain.ravel()))
        df_train["our_cluster"] = df_train.index.to_series().map(train_lookup)
        gmm_lookup = dict(zip(idtrain[0].ravel(), gmm_train_preds.ravel()))
        df_train["gmm_init"] = df_train.index.to_series().map(gmm_lookup)

        test_rows = df_results.split == i_split

        def put(col, values):
            lookup = dict(zip(idtest[0].ravel(), np.ravel(values)))
            df_results.loc[test_rows, col] = (
                df_results.loc[test_rows]
                .index.get_level_values("id")
                .to_series()
                .map(lookup)
                .values
            )

        put("our_cluster", ctest_all)
        put("prob_c_all", prob_c_all)
        put("our_index", indextest_all)
        put("our_cluster_no_hidden", ctest_no_hidden)
        put("our_index_no_hidden", indextest_no_hidden)
        put("our_index_no_hidden_init", indextest_no_hidden_init)
        put("supervised_classifier_predictions", c_sprvsd)
        put("gmm_init_predictions", gmm_test_preds)

        snap_index = list(
            zip(
                np.tile(idtest.ravel(), np.max(timetest) + 1),
                np.ravel(timetest),
            )
        )
        df_results.loc[snap_index, "our_cluster_snapshots"] = ctest_snapshots
        df_results.loc[snap_index, "our_index_snapshots"] = indextest_snapshots
        df_results.loc[snap_index, "our_cluster_snapshots_no_hidden"] = (
            ctest_snapshot_x
        )

        dict_training_results |= {i_split: df_train}

    os.makedirs("results", exist_ok=True)
    os.makedirs(os.path.join("posthoc", "results"), exist_ok=True)

    stem = f"ADNI_r7_xval{n_splits}_{n_clusters}clusters"
    df_results.astype({"split": int}).to_csv(
        os.path.join("results", f"{stem}_results.csv")
    )
    df_posterior.to_csv(
        os.path.join("posthoc", "results", f"{stem}_mtm_post.csv"),
        index_label="id",
    )
    df_init_post.to_csv(
        os.path.join("posthoc", "results", f"{stem}_mtm_init_post.csv"),
        index_label="id",
    )
    df_gmm.to_csv(
        os.path.join("posthoc", "results", f"{stem}_gmm_init_post.csv"),
        index_label="id",
    )
    with gzip.open(
        os.path.join("results", f"{stem}_results.p.gz"), "wb"
    ) as f:
        pickle.dump(dict_training_results, f)


if __name__ == "__main__":
    main()
