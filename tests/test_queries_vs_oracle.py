"""Differential tests: every registered query vs its DuckDB oracle.

One parametrized test per SURVEY.md §2 key — the same comparison the
driver's t2 runs (row-count + schema-name + order-insensitive values),
at sf0.001 by default for iteration speed (HJA_TEST_SF_DIR overrides).
Rows-only keys (no oracle) are checked by their stronger self-checks in
dedicated test modules; here we at least materialize them.
"""

from __future__ import annotations

import pytest

from hadoop_job_analyzer_spark.oracle_check import compare
from hadoop_job_analyzer_spark.registry import oracle_sql, queries

KEYS = sorted(queries())
ORACLES = oracle_sql()


@pytest.mark.parametrize("key", KEYS)
def test_query_matches_oracle(spark, sf_dir, key):
    df = queries()[key](spark, sf_dir)
    sql = ORACLES.get(key)
    if sql is None:
        n = df.count()
        assert n >= 0, f"{key}: query failed to produce a result"
    else:
        compare(df, sql, sf_dir, key)
