"""Pre-driver correctness gate: run EVERY registered query against its
DuckDB oracle at sf0.001 with the same compare the driver applies."""

from __future__ import annotations

import pytest

from week5_datingnlp_big_data_spark.registry import ORACLE, QUERIES

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, duck, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
