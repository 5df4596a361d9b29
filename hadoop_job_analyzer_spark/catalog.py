"""Table catalog: pinned loading of the driver-generated parquet tables.

Reference analog: the ingest layer of the reference tool (it harvested
job metadata from the JobTracker HTTP API; SURVEY.md §0.1 [R-M]). Here
ingest is columnar parquet scans — Spark's vectorized reader with
predicate pushdown and column pruning supplied by Catalyst.

The one genuine ingest gap Spark does not handle natively: events.ts is
parquet timestamp[ns]; with ``spark.sql.legacy.parquet.nanosAsLong=true``
it arrives as a long of epoch-nanoseconds and we convert with INTEGER
division to microseconds (SURVEY.md §0.2 — float division corrupts the
low bits: epoch-ns exceeds double's 53-bit exact range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Stable column order per table (SURVEY.md §1.2, verified schemas).
COLUMNS: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with stable column order; events gets the ns→µs recipe."""
    if name not in COLUMNS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts arrives as long epoch-ns (nanosAsLong). Integer-divide to µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.select(*COLUMNS[name])
