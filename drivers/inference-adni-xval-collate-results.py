#!/usr/bin/env python3
"""Collate the cross-validation outputs of ``inference-adni-xval.py``:
contingency/prevalence tables, label-stability crosstabs, mixed-effects
biomarker fits, trajectory and pie figures, prognostic AUC batches, and the
CSV exports consumed by the post-hoc statistics stage.

Behavioral equivalent of the reference driver
(inference-adni-xval-collate-results.py:40-1291); its expected-output block
(:1294-1507) is the parity target.  statsmodels ``mixedlm`` is replaced by
the in-repo random-intercept REML fitter (utils/lme.py).
"""

import glob
import gzip
import itertools
import os
import pickle
import string
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import matplotlib as mpl
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from multimodal_trajectory_modeling_tpu.utils import adni as data
from multimodal_trajectory_modeling_tpu.utils import lme
from multimodal_trajectory_modeling_tpu.utils import post_hoc as util_ph
from multimodal_trajectory_modeling_tpu.utils import state_space as st_sp

plt.rcParams["figure.autolayout"] = True
plt.rcParams["legend.loc"] = "upper right"
plt.rcParams["font.family"] = "serif"

pd.options.display.width = pd.options.display.max_colwidth = 79
pd.options.display.max_columns = 1000
pd.options.display.float_format = "{:,.3f}".format

rng = np.random.default_rng(seed=0)

n_splits, n_clusters = 10, 4
lme_add_ci = True

_LINESTYLES = (
    "solid",
    "dashdot",
    "dashed",
    "dotted",
    "densely dashdotted",
    "loosely dashdotted",
)


def _latest(pattern):
    return sorted(glob.glob(pattern), key=os.path.getmtime)[-1]


def _lme_scatter_figure(
    df_biomarkers, xcol, ycol, xlabel, ylabel, savename
):
    """Mixed-model fit of ``ycol ~ cluster * xcol`` with per-cluster affine
    overlays and Monte-Carlo CI bands (reference collate:602-787)."""
    res = lme.mixedlm(
        f"{ycol} ~ cluster * {xcol}",
        df_biomarkers,
        groups=df_biomarkers["ids"].to_numpy(),
    ).fit()
    fig, axs = plt.subplots(layout="constrained")
    axs.spines["right"].set_visible(False)
    axs.spines["top"].set_visible(False)
    color_of = dict(zip(string.ascii_uppercase, data.cluster_colors))
    df_biomarkers.assign(
        color=lambda df: df.cluster.map(color_of)
    ).plot.scatter(x=xcol, y=ycol, c="color", ax=axs)
    mn, mx = axs.get_xlim()
    for i, c in enumerate(string.ascii_uppercase[:n_clusters]):
        intercept = (
            res.params["Intercept"]
            if c == "A"
            else res.params[f"cluster[T.{c}]"]
        )
        slope = (
            res.params[xcol]
            if c == "A"
            else res.params[f"cluster[T.{c}]:{xcol}"]
        )
        axs.add_artist(
            mpl.lines.Line2D(
                [mn, mx],
                [intercept + mn * slope, intercept + mx * slope],
                color=data.cluster_colors[i],
                label=c,
                zorder=5,
                linestyle=_LINESTYLES[i],
            )
        )
        if lme_add_ci:
            n_mc, n_pts = 10000, 100
            intercept_bse = (
                res.bse["Intercept"]
                if c == "A"
                else res.bse[f"cluster[T.{c}]"]
            )
            slope_bse = (
                res.bse[xcol]
                if c == "A"
                else res.bse[f"cluster[T.{c}]:{xcol}"]
            )
            intercepts = rng.normal(
                loc=intercept, scale=intercept_bse, size=(n_mc, 1)
            )
            slopes = rng.normal(loc=slope, scale=slope_bse, size=(n_mc, 1))
            pts = np.linspace(mn, mx, n_pts).reshape(1, -1)
            q_lo_up = np.quantile(
                slopes * pts + intercepts, [0.275, 0.975], axis=0
            )
            axs.fill_between(
                x=pts.ravel(),
                y1=q_lo_up[0],
                y2=q_lo_up[1],
                alpha=0.15,
                color=data.cluster_colors[i],
            )
    axs.legend(fontsize="large")
    axs.set_xlabel(xlabel, fontsize="large")
    axs.set_ylabel(ylabel, fontsize="large")
    fig.savefig(savename, bbox_inches="tight", transparent=True)
    plt.close(fig)
    return res


def main():
    (z, x, d, ids, time, mmse, approx_age) = data.get_trajectories(
        return_mmse=True, return_approx_age=True
    )

    d_fin = data.get_final_diagnoses(d)
    df_fin = pd.DataFrame(
        data=d_fin, index=ids[0].ravel(), columns=["diagnosis"]
    )

    stem = f"ADNI_r7_xval{n_splits}_{n_clusters}clusters"
    df_results = pd.read_csv(
        _latest(os.path.join("results", f"{stem}_results.csv"))
    ).set_index("id")
    with gzip.open(
        _latest(os.path.join("results", f"{stem}_results.p.gz")), "rb"
    ) as f:
        d_tr = pickle.load(f)

    os.makedirs("figures", exist_ok=True)
    os.makedirs(os.path.join("posthoc", "results"), exist_ok=True)

    print(
        data.return_profiling_dataframe(ids[0])
        .assign(
            cluster=df_results.our_cluster.to_numpy()[: z[0].shape[0]],
            age=approx_age[0],
        )
        .groupby("cluster")
        .agg("mean")[["age", "is_female", "edu_yrs", "apoe4_pos"]]
    )

    splits_idx = pd.RangeIndex(stop=n_splits, name="split")
    clusters_idx = pd.CategoricalIndex(
        data=list(string.ascii_uppercase[:n_clusters]),
        name="cluster",
        ordered=True,
    )
    diagnoses_idx = pd.CategoricalIndex(
        data=data.diagnosis_list, name="diagnosis", ordered=True
    )

    def counts_frame(outer, inner):
        return pd.DataFrame(
            index=pd.MultiIndex.from_product([outer, inner]),
            columns=splits_idx,
        )

    tables = {
        key: counts_frame(clusters_idx, diagnoses_idx)
        for key in (
            "train",
            "test",
            "snapshot_test",
            "snapshot_initial_test",
            "snapshot_initial_nh_test",
            "snapshot_nh_test",
            "no_hidden_test",
        )
    }
    clusters_by_outcome_train = counts_frame(diagnoses_idx, clusters_idx)
    clusters_by_outcome_test = counts_frame(diagnoses_idx, clusters_idx)

    for i_split in range(n_splits):
        df_training_results = d_tr[i_split]
        df_train_final = (
            df_training_results.loc[lambda df: ~df.diagnosis.isnull()]
            .sort_values("time")
            .groupby(level=0)
            .last()
        )
        df_testing_results = df_results.loc[
            lambda df: (df.split == i_split) & (~df.diagnosis.isnull())
        ]
        df_test_final = (
            df_testing_results.sort_values("time").groupby(level=0).last()
        )
        assert (
            df_test_final.join(df_fin, rsuffix="_")
            .assign(ok=lambda df: df.diagnosis == df.diagnosis_)["ok"]
            .all()
        )
        df_test_initial = (
            df_testing_results.sort_values("time")
            .groupby(level=0)
            .first()
            .drop(columns="diagnosis")
            .join(df_fin)
        )

        def outcomes_by_col(col, df):
            assert col in df.columns.to_list()
            return (
                df.groupby([col, "diagnosis"])
                .agg(dx_cts=("diagnosis", "count"))
                .reset_index()
                .pivot(index=col, columns="diagnosis", values="dx_cts")
                .fillna(0)
            )

        def col_by_outcome(col, df):
            assert col in df.columns.to_list()
            return (
                df.groupby(["diagnosis", col])
                .agg(dx_cts=(col, "count"))
                .reset_index()
                .pivot(index="diagnosis", columns=col, values="dx_cts")
                .fillna(0)
                .apply(lambda row: row / np.sum(row), axis=1)
            )

        tables["train"].loc[:, i_split] = outcomes_by_col(
            "our_cluster", df_train_final
        ).stack()
        tables["test"].loc[:, i_split] = outcomes_by_col(
            "our_cluster", df_test_final
        ).stack()
        tables["snapshot_test"].loc[:, i_split] = outcomes_by_col(
            "our_cluster_snapshots", df_test_final
        ).stack()
        tables["snapshot_initial_test"].loc[:, i_split] = outcomes_by_col(
            "our_cluster_snapshots", df_test_initial
        ).stack()
        tables["snapshot_nh_test"].loc[:, i_split] = outcomes_by_col(
            "our_cluster_snapshots_no_hidden", df_test_final
        ).stack()
        tables["snapshot_initial_nh_test"].loc[:, i_split] = outcomes_by_col(
            "our_cluster_snapshots_no_hidden", df_test_initial
        ).stack()
        tables["no_hidden_test"].loc[:, i_split] = outcomes_by_col(
            "our_cluster_no_hidden", df_test_final
        ).stack()
        clusters_by_outcome_train.loc[:, i_split] = col_by_outcome(
            "our_cluster", df_train_final
        ).stack()
        clusters_by_outcome_test.loc[:, i_split] = col_by_outcome(
            "our_cluster", df_test_final
        ).stack()

    def summed(key, name):
        # astype(float): the pre-allocated frames are object-dtype, which
        # pandas 3's numeric_only sum would silently drop
        return (
            tables[key]
            .fillna(0.0)
            .astype(float)
            .assign(**{name: lambda df: df.sum(axis=1, numeric_only=True)})[
                [name]
            ]
        )

    outcomes_sum = (
        pd.concat(
            [
                summed("test", "ours_test"),
                summed("no_hidden_test", "ours_testnh"),
                summed("snapshot_initial_test", "ours_testsnapshotsinit"),
                summed(
                    "snapshot_initial_nh_test", "ours_testsnapshotsinitnh"
                ),
                summed("snapshot_test", "ours_testsnapshots"),
                summed("snapshot_nh_test", "ours_testsnapshotsnh"),
            ],
            axis=1,
        )
        .pipe(
            lambda df: df.set_axis(
                pd.MultiIndex.from_tuples(
                    [tuple(c.split("_")) for c in df.columns]
                ),
                axis=1,
            )
        )
        .loc[lambda df: df.index.get_level_values(1) != "MCI_tbd"]
    )
    assert (outcomes_sum.sum(axis=0) == 571).all()

    print("outcomes by cluster")
    print(outcomes_sum.groupby(level=0).apply(lambda g: g / g.sum()))
    print("clusters by approach")
    print(
        outcomes_sum.groupby(level=0).sum().apply(lambda g: g / g.sum(axis=0))
    )

    print("population-level cluster prevalences")
    print(
        pd.concat(
            [
                df_results.loc[lambda df: df.time == 0, [c]]
                .join(df_fin)
                .groupby([c])
                .agg(ct=("diagnosis", "count"))
                .apply(lambda g: g / g.sum())
                .rename(columns={"ct": c})
                for c in (
                    "our_cluster",
                    "our_cluster_snapshots",
                    "gmm_init_predictions",
                )
            ],
            axis=1,
        )
    )

    print("diagnostic outcomes by cluster")
    print(
        pd.concat(
            [
                df_results.loc[lambda df: df.time == 0, [c]]
                .join(df_fin)
                .groupby([c, "diagnosis"])
                .agg(ct=("diagnosis", "count"))
                .apply(lambda g: g / g.sum())
                .rename(columns={"ct": c})
                for c in (
                    "our_cluster",
                    "our_cluster_snapshots",
                    "gmm_init_predictions",
                )
            ],
            axis=1,
        ).pipe(
            lambda df: df.loc[
                sorted(
                    df.index,
                    key=lambda t: (t[0], data.diagnosis_list.index(t[1])),
                )
            ]
        )
    )

    data.plot_2d_trajectories(
        model=None,
        savename=os.path.join(
            "figures",
            f"ADNI_r7_xval{n_splits}_our_model_plot{n_clusters}_results.pdf",
        ),
        title="",
        states=z,
        inferred_clusters=df_results.our_cluster.to_numpy()[: z[0].shape[0]],
        xlabel="β-amyloid burden (centiloid)",
    )
    data.plot_2d_trajectories(
        model=None,
        savename=os.path.join(
            "figures",
            f"ADNI_r7_xval{n_splits}_our_model_plot"
            f"{n_clusters}_results_gm_vs_adnimem.pdf",
        ),
        title="",
        states=np.stack((x[..., 0], z[..., -1]), axis=-1),
        inferred_clusters=df_results.our_cluster.to_numpy()[: z[0].shape[0]],
        xlabel="ADNI-Mem",
        xlim=(np.nanmin(x[..., 0]) - 0.2, np.nanmax(x[..., 0]) + 0.2),
        ylabel="Gray matter density",
        arrow_width=0.01,
    )

    final_id_ti = (
        df_results.loc[lambda df: ~df.diagnosis.isnull()]
        .sort_values("time")
        .groupby(level=0)
        .last()
        .set_index("time", append=True)
        .index
    )

    def stability(ct):
        return ct.values.diagonal().sum() / ct.values.sum()

    print("Our cluster vs. Our snapshot final")
    snapshot_xt_fin = pd.crosstab(
        df_results.set_index("time", append=True).loc[final_id_ti].our_cluster,
        df_results.set_index("time", append=True)
        .loc[final_id_ti]
        .our_cluster_snapshots,
    )
    print(snapshot_xt_fin)
    print("{0:.3f} maintain labels".format(stability(snapshot_xt_fin)))

    print("Our cluster vs. Our snapshot init")
    snapshot_xt_ini = pd.crosstab(
        df_results.loc[lambda df: df.time == 0].our_cluster,
        df_results.loc[lambda df: df.time == 0].our_cluster_snapshots,
    )
    print(snapshot_xt_ini)
    print("{0:.3f} maintain labels".format(stability(snapshot_xt_ini)))

    print("Ours using all data vs. missing hidden data")
    no_h_xt = pd.crosstab(
        df_results.groupby(level=0).first().our_cluster,
        df_results.groupby(level=0).first().our_cluster_no_hidden,
    )
    print(no_h_xt)
    print("{0:.3f} maintain labels".format(stability(no_h_xt)))
    diag_pm1 = (
        no_h_xt.values.diagonal().sum()
        + no_h_xt.values.diagonal(offset=1).sum()
        + no_h_xt.values.diagonal(offset=-1).sum()
    )
    print(
        "{0:.3f} maintain labels or move 1 label".format(
            diag_pm1 / no_h_xt.values.sum()
        )
    )
    n_movers = no_h_xt.values.sum() - no_h_xt.values.diagonal().sum()
    n_move_1 = (
        no_h_xt.values.diagonal(offset=1).sum()
        + no_h_xt.values.diagonal(offset=-1).sum()
    )
    print(
        "{0:.3f} of those that do move, move only one label away".format(
            n_move_1 / n_movers
        )
    )

    for title, col in (
        ("Our cluster vs. GMM init preds", "our_cluster"),
        ("Our cluster init vs. GMM init preds", "our_cluster_snapshots"),
    ):
        print(title)
        ct = pd.crosstab(
            df_results.loc[lambda df: df.time == 0][col],
            df_results.loc[lambda df: df.time == 0].gmm_init_predictions,
        )
        print(ct)
        print("{0:.3f} maintain labels".format(stability(ct)))
        lower = np.tril(ct.values, -1).sum()
        upper = np.triu(ct.values, 1).sum()
        print(
            "of those that move, {0:.3f} are lower triangle".format(
                lower / (lower + upper)
            )
        )

    pd.crosstab(
        df_results.loc[lambda df: df.time == 0].gmm_init_predictions.values,
        d_fin,
        rownames=["cluster"],
    ).reset_index().to_csv(
        os.path.join("posthoc", "results", "contingency_table_gmm_init.csv"),
        index=False,
    )

    st_sp.plot_metric_vs_clusters_over_time(
        metric=mmse[:, :, 0],
        assignments=df_results.our_cluster.to_numpy()[: z[0].shape[0]],
        metric_name="MMSE",
        savename=os.path.join(
            "figures",
            f"ADNI_r7_xval10_{n_clusters}clusterwise_MMSE_o_time.pdf",
        ),
        title="",
        xticks=np.arange(0, 2 * z.shape[0], 2),
        xlabel="Time (years)",
        legend_loc="upper right",
        colors=data.cluster_colors,
    )

    cs = df_results.our_cluster.to_numpy()[: z[0].shape[0]]
    st_sp.pie(
        assignments=cs,
        savename=os.path.join(
            "figures", f"ADNI_r7_xval10_{n_clusters}_overall_pie_all.pdf"
        ),
        colors=data.cluster_colors,
    )
    st_sp.pie(
        assignments=df_fin.values.ravel(),
        savename=os.path.join(
            "figures", f"ADNI_r7_xval10_{n_clusters}_overall_pie_all_dx.pdf"
        ),
        colors=data.diagnosis_colors,
        cluster_ordering=data.diagnosis_list,
    )
    st_sp.pies_by_cluster(
        savename=os.path.join(
            "figures", f"ADNI_r7_xval10_{n_clusters}_pie_charts_all.pdf"
        ),
        categories=df_fin.values.ravel(),
        halo_colors=data.cluster_colors,
        category_ordering=data.diagnosis_list,
        clusters=cs,
        slice_colors=data.diagnosis_colors,
        legend_anchor=(1.75 + 0.25 * int(n_clusters == 3), 1),
        fig_length=6.0,
        fig_width=3.0,
    )
    st_sp.pies_by_cluster(
        savename=os.path.join(
            "figures", f"ADNI_r7_xval10_{n_clusters}_pie_charts_all_dx.pdf"
        ),
        categories=cs,
        halo_colors=data.diagnosis_colors,
        clusters=df_fin.values.ravel(),
        cluster_ordering=data.diagnosis_list,
        slice_colors=data.cluster_colors,
        legend_anchor=(1.75 + 0.25 * int(n_clusters == 3), 1),
        fig_length=6.0,
        fig_width=3.0,
    )

    df_biomarkers = pd.DataFrame(
        data={
            "ids": ids[:-1].ravel(),
            "amyl_prev": z[:-1, :, 0].ravel(),
            "gm_diff": np.diff(z[..., -1], axis=0).ravel(),
            "moca_diff": np.diff(x[..., -1], axis=0).ravel(),
            "adni_mem_diff": np.diff(x[..., 0], axis=0).ravel(),
            "cluster": df_results.our_cluster[: ids[:-1].size].to_numpy(),
            "age": approx_age[:-1].ravel(),
        }
    ).loc[lambda df: ~df.isna().any(axis=1)]

    _lme_scatter_figure(
        df_biomarkers,
        xcol="amyl_prev",
        ycol="gm_diff",
        xlabel="β-amyloid burden (centiloid)",
        ylabel="Grey matter density change",
        savename=os.path.join(
            "figures", f"gm_diff_vs_amyloid_{n_clusters}c_affine.pdf"
        ),
    )
    _lme_scatter_figure(
        df_biomarkers,
        xcol="gm_diff",
        ycol="adni_mem_diff",
        xlabel="Grey matter density change",
        ylabel="Change in ADNI-Mem",
        savename=os.path.join(
            "figures", f"adni_mem_diff_vs_gm_diff_{n_clusters}c_affine.pdf"
        ),
    )

    df_results0 = df_results.assign(
        mmse=mmse.ravel(),
        age=approx_age.ravel(),
        amyloid=z[..., 0].ravel(),
        gm=z[..., 1].ravel(),
        adni_mem=x[..., 0].ravel(),
        adni_ef=x[..., 1].ravel(),
        adas13=x[..., 2].ravel(),
        moca=x[..., 3].ravel(),
    ).pipe(
        lambda full: full.join(
            full.loc[lambda df: df.time == 0].assign(
                mmse_init=lambda df: df.mmse,
                age_init=lambda df: df.age,
                amyloid_init=lambda df: df.amyloid,
                gm_init=lambda df: df.gm,
                adni_mem_init=lambda df: df.adni_mem,
                adni_ef_init=lambda df: df.adni_ef,
                adas13_init=lambda df: df.adas13,
                moca_init=lambda df: df.moca,
                our_index_snapshot_init=lambda df: df.our_index_snapshots,
                our_cluster_snapshot_init=lambda df: df.our_cluster_snapshots,
            )[
                [
                    "mmse_init",
                    "age_init",
                    "amyloid_init",
                    "gm_init",
                    "adni_mem_init",
                    "adni_ef_init",
                    "adas13_init",
                    "moca_init",
                    "our_index_snapshot_init",
                    "our_cluster_snapshot_init",
                ]
            ]
        )
        # the reference environment's pandas (1.4) regrouped rows by the
        # duplicated id index during this join, leaving df_results0
        # id-major (all of a participant's visits contiguous); modern
        # pandas preserves the time-major left order.  The downstream
        # mmse age adjustment is an unshuffled 5-fold cross_val_predict,
        # so the published LME table (posthoc/lme_mmse_adni.R comments:
        # REML criterion 6015.3, interaction F=64.127) depends on this
        # exact ordering — reproduce it.
        .sort_index(kind="stable")
    )
    df_final = (
        df_results0.assign(years=lambda df: 2 * df.time)
        .set_index("time", append=True)
        .loc[final_id_ti]
        .assign(
            ann_mmse_change=lambda df: (df.mmse - df.mmse_init) / df.years,
            ann_mmse_change_age_adjusted=(
                lambda df: util_ph.regressed_out_effect_cv(
                    df.ann_mmse_change.values.reshape(-1, 1),
                    df.age_init.values.reshape(-1, 1),
                )
            ),
        )
    )

    drop_outliers = True
    ycol = "ann_mmse_change_age_adjusted"
    yname = "Annualized MMSE change (age adjusted)"
    for xcol, xname in {
        "mmse_init": "MMSE",
        "moca_init": "MoCA",
        "our_index_snapshot_init": "MTM-derived index",
    }.items():
        in_col = df_final[xcol].values
        out_col = df_final[ycol].values
        is_not_outlier = np.abs(
            in_col - np.nanmean(in_col, axis=0, keepdims=True)
        ) < 3 * np.nanstd(in_col, axis=0, keepdims=True)
        is_finite = np.all(
            np.isfinite(np.column_stack([in_col, out_col])), axis=1
        )
        keep = np.logical_and(
            is_finite, is_not_outlier if drop_outliers else True
        )
        print(
            "{:.2f} kept (μ={:.2f}, σ={:.2f})".format(
                keep.astype(int).mean(),
                in_col[keep].mean(),
                in_col[keep].std(),
            )
        )
        fig, ax = plt.subplots(layout="constrained")
        ax.spines["right"].set_visible(False)
        ax.spines["top"].set_visible(False)
        sns.regplot(
            data=df_final[keep],
            x=xcol,
            y=ycol,
            ax=ax,
            color="black",
            scatter=False,
        )
        for i, c in enumerate(string.ascii_uppercase[:n_clusters]):
            df_c = df_final[keep].loc[
                lambda df: df.our_cluster_snapshot_init == c
            ]
            ax.scatter(
                df_c[xcol].values,
                df_c[ycol].values,
                color=data.cluster_colors[i],
                marker=("o", "v", "^", "s", "+", "x")[i],
                label=f"cluster {c}",
                s=2,
                alpha=0.9,
            )
        ax.set_xlabel(f"{xname} (at baseline)", fontsize="large")
        ax.set_ylabel(yname, fontsize="large")
        ax.legend(fontsize="large", loc="lower right")
        fig.savefig(
            os.path.join(
                "figures",
                "{}_vs_{}_bl_{}c{}.pdf".format(
                    ycol,
                    xcol,
                    n_clusters,
                    "_no_outliers" if drop_outliers else "",
                ),
            ),
            transparent=True,
        )
        plt.close(fig)

    # exports for the post-hoc stage
    df_biomarkers.to_csv(
        os.path.join(
            "posthoc", "results", "biomarkers_by_cluster_over_time.csv"
        )
    )
    df_final.to_csv(os.path.join("posthoc", "results", "prognostics_all.csv"))

    df_results0.rename(columns={"our_cluster": "cluster"}).assign(
        time_in_years=lambda df: 2 * df.time
    )[["time_in_years", "mmse", "age", "cluster"]].loc[
        lambda df: ~df.isna().any(axis=1)
    ].assign(
        mmse_age_adjusted=lambda df: util_ph.regressed_out_effect_cv(
            df.mmse.values.reshape(-1, 1), df.age.values.reshape(-1, 1)
        )
    ).to_csv(
        os.path.join("posthoc", "results", "mmse_by_cluster_over_time.csv")
    )
    pd.pivot(
        outcomes_sum[("ours", "test")].reset_index(),
        index="cluster",
        columns="diagnosis",
        values=("ours", "test"),
    ).to_csv(
        os.path.join("posthoc", "results", "contingency_table_ours_test.csv")
    )

    df_results0.loc[lambda df: df.time == 0].join(
        pd.read_csv(
            os.path.join(
                os.path.dirname(data.__file__),
                os.pardir,
                "data",
                "adni-profiling.csv",
            )
        ).set_index("RID")
    )[
        [
            "our_index_snapshot_init",
            "amyloid_init",
            "gm_init",
            "adni_ef_init",
            "adas13_init",
            "moca_init",
            "adni_mem_init",
            "age_init",
            "ad_outcome",
            "days_to_ad_or_last_obs",
        ]
    ].to_csv(
        os.path.join("posthoc", "results", "survival_modelling_data.csv")
    )

    print("-" * 79, "Clusters by diagnosis", sep="\n")
    c = ("ours", "test")
    contingency = pd.pivot(
        outcomes_sum[c].reset_index(),
        index="cluster",
        columns="diagnosis",
        values=c,
    )
    print(
        contingency.div(contingency.sum(axis=0), axis=1)[data.diagnosis_list]
    )

    cog_init = [
        "adni_mem_init",
        "adni_ef_init",
        "moca_init",
        "adas13_init",
        "mmse_init",
    ]
    bio_init = ["amyloid_init", "gm_init"]

    df_final_prog = (
        df_final[
            ["our_index_snapshot_init"] + cog_init + bio_init + ["diagnosis"]
        ]
        .loc[lambda df: ~df.isna().any(axis=1)]
        .reset_index("time")
        .join(
            data.return_profiling_dataframe(ids[0])[
                ["ad_outcome", "days_to_ad_or_last_obs"]
            ]
        )
    )

    batch_aucs_by_feature = {
        tuple(nm[:6] for nm in c_list): util_ph.stratified_logit_cv_metrics(
            df_final_prog[c_list].values,
            df_final_prog[["diagnosis"]]
            .apply(lambda s: s == "AD")
            .astype(int)
            .values,
        )
        for c_list in [
            ["our_index_snapshot_init"],
            bio_init,
            *map(list, itertools.product(bio_init, cog_init)),
        ]
    }
    pd.DataFrame.from_dict(
        batch_aucs_by_feature, orient="index"
    ).stack().to_frame().reset_index().set_axis(
        ["feature", "batch", "auc"], axis=1
    ).to_csv(
        os.path.join(
            "posthoc", "results", "paired_prognostic_aucs_from_baseline_meas.csv"
        ),
        index=False,
    )

    print("Cluster assignment rates (training)")
    tr_cl = tables["train"].groupby(level=0).sum().apply(
        lambda g: g / g.sum()
    )
    print(tr_cl)
    tr_cl.to_csv(os.path.join("results", "cluster_rates_training.csv"))

    print("Outcomes by cluster (training)")
    tr_out_x_cl = (
        tables["train"].fillna(0.0).groupby(level=0).apply(lambda g: g / g.sum())
    )
    print(tr_out_x_cl)
    tr_out_x_cl.to_csv(
        os.path.join("results", "outcomes_by_cluster_training.csv")
    )

    print("Conversion rate pivots for ours vs. GMM @ baseline")
    xt = (
        df_results.loc[
            lambda df: df.time == 0,
            ["our_cluster_snapshots", "gmm_init_predictions", "our_cluster"],
        ]
        .join(pd.DataFrame(index=ids[0].ravel(), data={"final_dx": d_fin}))
        .assign(fin_AD=lambda df: (df.final_dx == "AD").astype(int))
    )
    for c in ["our_cluster", "our_cluster_snapshots"]:
        print(
            xt.groupby([c, "gmm_init_predictions"])
            .agg(AD_rate=("fin_AD", "mean"))
            .reset_index()
            .pivot(columns="gmm_init_predictions", index=c, values="AD_rate")
            .fillna(0.0)
        )

    print("Clusters by trajectory length")
    print(
        df_final.reset_index()
        .assign(length=lambda df: df.time + 1)
        .groupby(["length", "our_cluster"])
        .agg(ct=("length", "count"))
        .reset_index()
        .pivot(index="our_cluster", columns="length", values="ct")
    )

    # training-run assignment stability histograms
    tr_cl = pd.concat(
        [
            df_i.loc[lambda g: g.time == 0, "our_cluster"]
            for df_i in d_tr.values()
        ],
        axis=1,
    ).fillna("X")
    hist_cl = np.column_stack(
        [
            np.sum(tr_cl.values == s, axis=1)
            for s in string.ascii_uppercase[:n_clusters]
        ]
    )
    assert np.all(np.sum(hist_cl, axis=1) == n_splits - 1)

    tr_te = tr_cl.join(
        df_results.loc[lambda g: g.time == 0, ["our_cluster"]].rename(
            columns={"our_cluster": "test"}
        )
    )
    for c in string.ascii_uppercase[:n_clusters]:
        tr_c = tr_te.loc[lambda g: g.test == c].drop(columns="test")
        ct_c = np.sum(tr_c.values == c, axis=1)
        fig, ax = plt.subplots()
        ax.hist(
            ct_c, bins=np.arange(-0.5, 10.5), density=True, color="black"
        )
        ax.set_xticks(np.arange(10))
        ax.set_ylim((0, 1))
        ax.spines["right"].set_visible(False)
        ax.spines["top"].set_visible(False)
        ax.set_xlabel(
            f"Cluster {c} assignment (number of training runs)",
            fontsize="large",
        )
        ax.set_ylabel("Frequency", fontsize="large")
        plt.savefig(
            os.path.join(
                "figures", f"ADNI_r7_xval{n_splits}_tr_te_cl_{c}_hist.pdf"
            )
        )
        plt.close(fig)


if __name__ == "__main__":
    main()
