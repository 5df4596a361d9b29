"""Fixture-drift guard (VERDICT r2 #9): load_table must yield the pinned
dtypes for every table at every sf dir present.

Round 2 shipped red because the driver regenerated events.parquet with
ts as timestamp[us] (was timestamp[ns]) and the unconditional ns→µs
recipe in load_table crashed 48/177 keys. This test makes the next
silent testdata regeneration fail ONE cheap test instead of 48 queries.
"""

from __future__ import annotations

import os

import pytest

from hadoop_job_analyzer_spark.catalog import COLUMNS, TABLES, load_table

SF_ROOT = "/root/testdata"

# Pinned post-load dtypes (Spark simpleString). events.ts must land as
# session-TZ timestamp regardless of which fixture generation is on disk.
PINNED: dict[str, dict[str, str]] = {
    "region": {'r_regionkey': 'int', 'r_name': 'string'},
    "nation": {'n_nationkey': 'int', 'n_name': 'string', 'n_regionkey': 'int'},
    "customer": {'c_custkey': 'bigint', 'c_name': 'string', 'c_nationkey': 'int', 'c_acctbal': 'double', 'c_mktsegment': 'string'},
    "supplier": {'s_suppkey': 'bigint', 's_name': 'string', 's_nationkey': 'int', 's_acctbal': 'double'},
    "part": {'p_partkey': 'bigint', 'p_name': 'string', 'p_brand': 'string', 'p_type': 'string', 'p_size': 'int', 'p_retailprice': 'double'},
    "orders": {'o_orderkey': 'bigint', 'o_custkey': 'bigint', 'o_orderstatus': 'string', 'o_totalprice': 'double', 'o_orderdate': 'timestamp_ntz', 'o_orderpriority': 'string'},
    "lineitem": {'l_orderkey': 'bigint', 'l_partkey': 'bigint', 'l_suppkey': 'bigint', 'l_linenumber': 'int', 'l_quantity': 'double', 'l_extendedprice': 'double', 'l_discount': 'double', 'l_tax': 'double', 'l_returnflag': 'string', 'l_linestatus': 'string', 'l_shipdate': 'timestamp_ntz'},
    "events": {'event_id': 'bigint', 'ts': 'timestamp', 'user_id': 'bigint', 'event_type': 'string', 'value': 'double', 'props': 'string'},
    "documents": {'doc_id': 'bigint', 'text': 'string', 'lang': 'string', 'source': 'string', 'n_chars': 'bigint'},
    "embeddings": {'vec_id': 'bigint', 'embedding': 'array<float>', 'label': 'int'},
}


def _sf_dirs() -> list[str]:
    if not os.path.isdir(SF_ROOT):
        return []
    return sorted(
        os.path.join(SF_ROOT, d)
        for d in os.listdir(SF_ROOT)
        if d.startswith("sf") and os.path.isdir(os.path.join(SF_ROOT, d))
    )


@pytest.mark.parametrize("table", TABLES)
def test_pinned_dtypes_every_sf(spark, table):
    assert set(PINNED[table]) == set(COLUMNS[table])
    dirs = _sf_dirs()
    assert dirs, f"no sf dirs under {SF_ROOT}"
    for sf_dir in dirs:
        df = load_table(spark, sf_dir, table)
        got = dict(df.dtypes)
        assert got == PINNED[table], f"{table} at {sf_dir}: {got}"


def test_events_ts_values_sane(spark):
    """ts must decode to the 2024 fixture window, not 1970 (a wrong
    ns/µs recipe lands decades off — value-level guard, not just dtype)."""
    from pyspark.sql import functions as F

    df = load_table(spark, f"{SF_ROOT}/sf0.001", "events")
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert row["lo"].year == 2024, row
    assert row["hi"].year in (2024, 2025), row
