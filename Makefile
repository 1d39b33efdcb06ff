# Experiment pipeline (mirrors the reference Makefile:20-43).
#
# `make experiments` runs the four ADNI drivers; `make statistics` runs the
# post-hoc stage (Python implementations of the reference's Python + R
# scripts).  Use MTM_N_RESTARTS to trade fidelity for speed (the reference
# protocol is 1000 restarts; results are cached by content hash under tmp/).

run-python := python3

experiments: $(wildcard drivers/*.py)
	$(run-python) drivers/model-selection.py
	$(run-python) drivers/inference-adni-xval.py
	$(run-python) drivers/inference-adni-xval-collate-results.py
	$(run-python) drivers/inference-adni-trajectories-nonlinear.py
	# $(run-python) drivers/inference-train-adni-test-macc.py  # data not shipped

statistics: $(wildcard posthoc/*.py)
	$(run-python) posthoc/lme_biomarkers_adni.py
	$(run-python) posthoc/lme_mmse_adni.py
	# $(run-python) posthoc/lme_mmse_macc.py  # data not shipped
	$(run-python) posthoc/contingency_tbl_comp_gmm_adni.py
	$(run-python) posthoc/prognostic_auc_comp_adni.py
	$(run-python) posthoc/prognostic_survival_models_adni.py
	$(run-python) posthoc/prognostic_lm_adni.py
	$(run-python) posthoc/prognostic_lm_comp_adni.py
	$(run-python) posthoc/prognostic_conc_comp_adni_multiv.py
	$(run-python) posthoc/prognostic_corr_adni.py
	$(run-python) posthoc/plot_posterior_trajectories_adni.py

test:
	$(run-python) -m pytest tests/ -x -q

# quick developer lane: single-process, deselects the slow end-to-end
# protocol smokes (driver subprocesses, multistart pools) — <5 min
test-quick:
	$(run-python) -m pytest tests/ -q -m "not slow"

# two concurrent single-process shards: halves the wall time and keeps
# each process's XLA compile-state footprint low (a single process
# accumulates enough CPU executables to segfault late compiles; the
# conftest cache-clearing fixture also guards this)
test-fast:
	@$(run-python) -m pytest tests/test_ops_gaussian.py tests/test_ops_moments.py tests/test_ops_regression.py tests/test_ops_markov.py tests/test_ops_kalman.py tests/test_markov_multi.py tests/test_pallas_estep.py tests/test_pallas_mstep.py tests/test_parallel.py tests/test_native.py tests/test_posthoc_stats.py tests/test_statespace_api.py tests/test_extended_framework.py tests/test_api_parity.py tests/test_markov_ooc.py -q & \
	$(run-python) -m pytest tests/test_em_engine.py tests/test_mixture_api.py tests/test_adapters.py tests/test_checkpoint_trace.py tests/test_drivers_smoke.py tests/test_lme.py tests/test_survival.py tests/test_property_random.py -q; \
	wait

bench:
	$(run-python) bench.py

# shared-line audit vs the read-only reference tree (fails >50% on any file)
audit:
	$(run-python) tools/similarity_audit.py

clean:
	-rm -rf figures/
	-rm -rf results/
	-rm -rf posthoc/results/

all: experiments statistics
.PHONY: all statistics experiments test bench clean
.DEFAULT: all
