"""The primary correctness gate: every registered query hash-matches its
DuckDB oracle (SURVEY.md §5 test plan item 1), mimicking the driver's
CORRECTNESS_r{N}.json check locally at sf0.001.
"""

from __future__ import annotations

import pytest

from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
from tests.oracle import run_parity

queries()  # populate submodule registries before parametrize collection


@pytest.mark.parametrize("name", [n for n, q in REGISTRY.items() if q.oracle])
def test_query_matches_oracle(spark, sf_dir, name):
    failures = run_parity(spark, sf_dir, [name])
    assert not failures, failures


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and have a stable schema."""
    for name, q in REGISTRY.items():
        if q.oracle:
            continue
        df = q.fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
