"""Category B — projection / filter / predicates (SURVEY.md §2.B).

Reference analog: the time-window/status filters and metric derivation
the reference applied per job record in Python [R-M]. Expressed
declaratively, every predicate here is pushed into the parquet scan by
Catalyst (PushedFilters), so at 100 TB only matching row groups are
decoded — the opposite of the reference's fetch-everything-then-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "project_compute",
    oracle="""
SELECT l_orderkey,
       l_linenumber AS line_no,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + rename + derived column (per-row double math is
    IEEE-identical across engines — no rounding needed without aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@query(
    "filter_range_date",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
""",
)
def filter_range_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window filter (the reference's submit-time window [R-M])."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 23:59:59").cast("timestamp"),
        )
    )


@query(
    "filter_in_set",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership filter (the reference's status whitelist [R-M])."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderpriority", "o_orderstatus").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%widget%' AND p_type LIKE 'ECO%'
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern matching (contains + prefix)."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_type").where(
        F.col("p_name").like("%widget%") & F.col("p_type").like("ECO%")
    )


@query(
    "filter_rlike",
    oracle=r"""
SELECT doc_id, lang
FROM documents
WHERE regexp_matches(text, '\b(join|merge)\b.*\bscan\b')
""",
)
def filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate over documents.text.

    Pattern kept in the RE2 ∩ java.util.regex common subset (no
    lookaround/backrefs) — DuckDB is RE2, Spark is java.util.regex.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang").where(F.col("text").rlike(r"\b(join|merge)\b.*\bscan\b"))


@query(
    "filter_null_logic",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       (NULLIF(o_orderstatus, 'P') IS NULL) AS is_pending
FROM orders
WHERE NULLIF(o_orderstatus, 'F') IS NOT NULL
""",
)
def filter_null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic over derived NULLs (missing conf keys [R-M])."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.where(F.nullif(F.col("o_orderstatus"), F.lit("F")).isNotNull())
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
            status_or_null.isNull().alias("is_pending"),
        )
    )


@query(
    "filter_bool_combo",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice > 150000.0)
   OR (NOT (o_orderpriority IN ('1-URGENT', '2-HIGH')) AND o_orderstatus = 'F')
""",
)
def filter_bool_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT combination with grouping parens."""
    o = load_table(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000.0)) | (
        (~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")) & (F.col("o_orderstatus") == "F")
    )
    return o.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice").where(cond)


@query(
    "filter_outlier_p99",
    oracle="""
SELECT event_id, event_type, value, ROUND(p99, 6) AS p99
FROM (
  SELECT event_id, event_type, value,
         QUANTILE_CONT(value, 0.99) OVER (PARTITION BY event_type) AS p99
  FROM events
)
WHERE value > p99
""",
)
def filter_outlier_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p99 outlier isolation — the tail-trimming cleanup
    stage (latency spikes, corrupt readings) done relative to each
    group's own distribution, not a global constant. The quantile is
    a window aggregate over the type partition: one shuffle on
    event_type, every row compared against its group's threshold in
    the same pass (no second scan, no join back). Rounded per the
    float policy — both engines linear-interpolate the quantile.
    At 100 TB with many groups the exact per-group sort gives way to
    approx_percentile, same plan shape.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    p99 = F.percentile("value", F.lit(0.99)).over(w)
    return (
        ev.select("event_id", "event_type", "value", p99.alias("p99_raw"))
        .where(F.col("value") > F.col("p99_raw"))
        .select("event_id", "event_type", "value", F.round("p99_raw", 6).alias("p99"))
    )


@query(
    "filter_exists_subquery",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
AND c_acctbal > 0
""",
)
def filter_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS predicate through the SQL surface — the query
    users of the reference would write verbatim; Catalyst rewrites the
    subquery to a left-semi join (same plan as join_left_semi's
    DataFrame form — syntax vs plan, like join_lateral_topk). Both
    engines run the identical SQL text.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        AND c_acctbal > 0
        """
    )


_BLOCK_PATTERNS = {
    "contact": "(call|email) (us|me)",
    "promo": "(buy|sale|discount|offer)",
    "nav_boiler": "(click here|next page|previous page)",
}


@query(
    "filter_blocklist_regex",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {', '.join(
         f"CAST(SUM(CASE WHEN regexp_matches(text, '{p}') THEN 1 ELSE 0 END) AS BIGINT) AS n_{name}"
         for name, p in _BLOCK_PATTERNS.items())},
       CAST(SUM(CASE WHEN {' OR '.join(f"regexp_matches(text, '{p}')" for p in _BLOCK_PATTERNS.values())}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       ROUND(CAST(SUM(CASE WHEN {' OR '.join(f"regexp_matches(text, '{p}')" for p in _BLOCK_PATTERNS.values())}
                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS block_rate
FROM documents
GROUP BY source
""",
)
def filter_blocklist_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-blocklist audit: per source, how many docs trip each of
    three blocklist patterns (contact-bait, promo spam, navigation
    boilerplate) and the combined block rate — the rule-based filter
    stage every crawl pipeline runs before model-based quality scoring
    (text_quality), reported per-pattern so rule owners see which rule
    does the work.

    All patterns stay in the Java∩RE2∩DuckDB regex common subset
    (alternation + literal spaces — no lookarounds, no backrefs; the
    scan_text_log_regex discipline). One scan, N+1 conditional
    aggregates, map-side partials — adding a rule adds a codegen'd
    rlike, not a pass over the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    hits = {name: F.col("text").rlike(p) for name, p in _BLOCK_PATTERNS.items()}
    any_hit = None
    for c in hits.values():
        any_hit = c if any_hit is None else (any_hit | c)
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    n = F.count(F.lit(1))
    return d.groupBy("source").agg(
        n.alias("n_docs"),
        *[cnt(c).alias(f"n_{name}") for name, c in hits.items()],
        cnt(any_hit).alias("n_blocked"),
        F.round(cnt(any_hit).cast("double") / n, 6).alias("block_rate"),
    )
