"""Opt-in dual-scale certification sweep (VERDICT r4 #8).

Re-certifies EVERY registered query against its DuckDB oracle at BOTH
sf0.01 (the driver's CORRECTNESS scale) and sf0.1 (the bench scale) in
one reproducible command:

    python -m pytest -m dualscale -q

Deselected by default (``addopts = -m "not dualscale"`` in
pyproject.toml) because the full sweep is 2 x ~117 oracle comparisons
(~10-15 min); the per-round driver gate plus test_oracle_parity.py at
sf0.001 remain the always-on checks. This sweep exists so the
"116/116 certified at both scales" claim is a command, not a NOTES
assertion.
"""

from __future__ import annotations

import pytest

from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
from tests.oracle import run_parity

queries()  # populate submodule registries before parametrize collection

SCALES = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.dualscale
@pytest.mark.parametrize("scale_dir", SCALES, ids=["sf0.01", "sf0.1"])
@pytest.mark.parametrize("name", [n for n, q in REGISTRY.items() if q.oracle])
def test_query_matches_oracle_at_scale(spark, scale_dir, name):
    failures = run_parity(spark, scale_dir, [name])
    assert not failures, failures
