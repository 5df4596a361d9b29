"""Category F — sorts / limits / top-k (SURVEY.md §2.F).

Reference analog: output ordering and top-N reports [R-M]. The
driver's value-hash is order-insensitive, so ORDER BY semantics are
materialized as a row_number() COLUMN (§5.3.4) — the rank itself is
the tested value. Every limit carries a full tiebreak, otherwise the
result set is nondeterministic under parallelism.

Scale: global orderBy is a range-partitioned shuffle (sampled
boundaries) — fine for final outputs; top-k uses TakeOrderedAndProject
(per-partition heaps, no full sort) when orderBy+limit are adjacent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._common import distributed_rank, dsum, o_dsum


@query(
    "sort_multi_null",
    oracle="""
SELECT s_suppkey,
       nullable_bal,
       ROW_NUMBER() OVER (
         ORDER BY nullable_bal DESC NULLS LAST, s_suppkey ASC
       ) AS sort_pos
FROM (
  SELECT s_suppkey,
         CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS nullable_bal
  FROM supplier
)
""",
)
def sort_multi_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULL placement, order captured as a column.

    Spark default asc = NULLS FIRST, DuckDB = NULLS LAST — always explicit.
    The position column is a DISTRIBUTED rank (range partition + local
    windows + broadcast offsets, _common.distributed_rank) — a global
    ORDER BY row_number would single-partition the whole table; the
    null-placement semantics ride through the range partitioner's
    SortOrder unchanged.
    """
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("s_acctbal"))
        .alias("nullable_bal"),
    )
    return distributed_rank(
        s,
        F.col("nullable_bal").desc_nulls_last(),
        F.col("s_suppkey").asc(),
        out_col="sort_pos",
    ).withColumn("sort_pos", F.col("sort_pos").cast("int"))


@query(
    "limit_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with full tiebreak — compiles to TakeOrderedAndProject
    (per-partition heap + driver merge; no full-data sort at any scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "distinct_values",
    oracle="""
SELECT event_type,
       ROW_NUMBER() OVER (ORDER BY event_type) AS pos
FROM (SELECT DISTINCT event_type FROM events)
""",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted dimension inventory (the reference's dimension discovery)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type")
        .distinct()
        .withColumn("pos", F.row_number().over(Window.orderBy("event_type")))
    )


@query(
    "sort_pagination_page2",
    oracle=f"""
SELECT c_custkey, {o_dsum('o_totalprice')} AS total_spend
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10 OFFSET 10
""",
)
def sort_pagination_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyset-style pagination: PAGE 2 (rows 11-20) of
    the customer spend leaderboard via ORDER BY + OFFSET/LIMIT — the
    result-serving verb every API layer needs, with the two rules that
    make pages stable under re-execution: a TOTAL order (exact-decimal
    spend DESC, then unique custkey) and exact sums (a float sum could
    reorder equal-spend customers between pages on different runs).

    Spark executes offset+limit as a TakeOrdered of the first
    offset+limit rows (per-partition top-(o+l) + driver merge of
    #partitions × 20 rows) — fine for bounded page depth; deep
    pagination at 100 TB switches to keyset continuation (WHERE
    (spend, key) < last_seen), which this total order makes possible.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(dsum("o_totalprice").alias("total_spend"))
    )
    return (
        spend.orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .offset(10)
        .limit(10)
    )
