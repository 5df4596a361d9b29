"""Category G — set operations (SURVEY.md §2.G).

Reference analog: merging poll batches of job records [R-M]; the
distinct variants are Spark aggregates under the hood (union+distinct
= one shuffle on all columns), intersect/except compile to left-semi /
left-anti joins — no dedicated physical operator needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "set_union_all",
    oracle="""
SELECT event_id, event_type, user_id FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type, user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two filtered batches (no shuffle — just concatenated partitions)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    return ev.where(F.col("event_type") == "click").unionByName(
        ev.where(F.col("event_type") == "purchase")
    )


@query(
    "set_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'signup'
UNION
SELECT user_id FROM events WHERE event_type = 'error'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicated union (one shuffle on the full row)."""
    ev = load_table(spark, sf_dir, "events")
    signup = ev.where(F.col("event_type") == "signup").select("user_id")
    error = ev.where(F.col("event_type") == "error").select("user_id")
    return signup.union(error).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'signup'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both signed up and purchased (SQL INTERSECT = distinct semantics)."""
    ev = load_table(spark, sf_dir, "events")
    signup = ev.where(F.col("event_type") == "signup").select("user_id")
    purchase = ev.where(F.col("event_type") == "purchase").select("user_id")
    return signup.intersect(purchase)


@query(
    "set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who click but never purchase (SQL EXCEPT = distinct semantics;
    Spark's ``subtract``/``exceptAll`` distinction mirrors EXCEPT vs EXCEPT ALL)."""
    ev = load_table(spark, sf_dir, "events")
    click = ev.where(F.col("event_type") == "click").select("user_id")
    purchase = ev.where(F.col("event_type") == "purchase").select("user_id")
    return click.subtract(purchase)


_SCD_BUCKET = (
    "('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 10"
)


@query(
    "merge_scd2",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer
), changes AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS new_bal
  FROM dim WHERE {_SCD_BUCKET} = 0
), inserts AS (
  SELECT c_custkey + 1000000 AS c_custkey, 'NEW ' || c_name AS c_name,
         c_acctbal + 0.5 AS c_acctbal
  FROM dim WHERE {_SCD_BUCKET} = 1
)
SELECT d.c_custkey, d.c_name, d.c_acctbal, 1 AS version, 1 AS is_current
FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM changes)
UNION ALL
SELECT d.c_custkey, d.c_name, d.c_acctbal, 1 AS version, 0 AS is_current
FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM changes)
UNION ALL
SELECT c_custkey, c_name, new_bal, 2 AS version, 1 AS is_current FROM changes
UNION ALL
SELECT c_custkey, c_name, c_acctbal, 1 AS version, 1 AS is_current FROM inserts
""",
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO, SCD-type-2 flavor, as pure DataFrame algebra: apply
    a deterministic change batch (10% balance updates, 10% new
    customers — md5-bucket selected; the deltas are exact-in-double
    (+100.0, +0.5 = integer/power-of-two shifts) so no rounding policy
    is needed — ROUND(x/2, 2) here landed on half-cent ties the two
    engines break differently, the exact failure _common.DEC warns of) to the customer dimension,
    producing history-preserving output: unchanged rows stay current,
    superseded rows close (is_current=0), new versions open (v2), and
    inserts arrive at v1 — the dimension-maintenance verb warehouse
    pipelines run nightly, without requiring a table format with
    native MERGE (the same plan feeds Delta/Iceberg writers when one
    is attached).

    Shuffle shape: one anti-join and one semi-join against the change
    keyset (broadcast — change batches are small relative to the
    dimension by construction) plus two map-only legs, unioned. At
    100 TB the dim never shuffles: every leg is either map-only or a
    broadcast probe.
    """
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    b = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10
    )
    changes = dim.where(b == 0).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("new_bal")
    )
    inserts = dim.where(b == 1).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + 0.5).alias("c_acctbal"),
    )
    ckeys = changes.select("c_custkey")
    unchanged = dim.join(F.broadcast(ckeys), "c_custkey", "left_anti").select(
        "c_custkey", "c_name", "c_acctbal", F.lit(1).alias("version"), F.lit(1).alias("is_current")
    )
    closed = dim.join(F.broadcast(ckeys), "c_custkey", "left_semi").select(
        "c_custkey", "c_name", "c_acctbal", F.lit(1).alias("version"), F.lit(0).alias("is_current")
    )
    opened = changes.select(
        "c_custkey", "c_name", F.col("new_bal").alias("c_acctbal"),
        F.lit(2).alias("version"), F.lit(1).alias("is_current"),
    )
    arrived = inserts.select(
        "c_custkey", "c_name", "c_acctbal", F.lit(1).alias("version"), F.lit(1).alias("is_current")
    )
    return unchanged.unionByName(closed).unionByName(opened).unionByName(arrived)


@query(
    "set_except_all",
    oracle="""
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'click')
EXCEPT ALL
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each user_id survives (clicks −
    views) times, not merely "clicked and never viewed" (the distinct-
    semantics set_except). The multiplicity-aware difference is its
    own physical operator (left-anti with counters, not a distinct);
    surfaced because multiset accounting (e.g. imbalance of paired
    events) needs it and dedup-style EXCEPT silently corrupts it.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    return clicks.exceptAll(views)


@query(
    "set_intersect_all",
    oracle="""
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'click')
INTERSECT ALL
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics twin: each user_id appears
    min(clicks, views) times (matched-pair capacity per user)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    return clicks.intersectAll(views)


@query(
    "set_symmetric_diff",
    oracle="""
SELECT 'only_F' AS side, o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT 'only_O' AS side, o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
""",
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with a side marker: customers exclusive to
    the F population vs exclusive to the O population — the two-sided
    churn/drift report (who appears in snapshot A xor snapshot B) that
    a single EXCEPT only answers half of. Each leg is a distinct +
    except (hash-partitioned on the key, partial-agg'd); the union is
    free (no shuffle). Completes the set-op family's algebra alongside
    union/intersect/except/*_all.
    """
    orders = load_table(spark, sf_dir, "orders")
    f_side = orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_side = orders.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    only_f = f_side.exceptAll(o_side).select(
        F.lit("only_F").alias("side"), "o_custkey"
    )
    only_o = o_side.exceptAll(f_side).select(
        F.lit("only_O").alias("side"), "o_custkey"
    )
    return only_f.unionByName(only_o)


@query(
    "set_union_byname_evolution",
    oracle="""
WITH v1 AS (
  SELECT event_id, event_type, value, NULL::VARCHAR AS props, 1 AS schema_ver
  FROM events WHERE event_id % 2 = 0
), v2 AS (
  SELECT event_id, event_type, NULL::DOUBLE AS value, props, 2 AS schema_ver
  FROM events WHERE event_id % 2 = 1
), unioned AS (
  SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2
)
SELECT event_type, CAST(schema_ver AS INTEGER) AS schema_ver,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(value) AS BIGINT) AS n_with_value,
       CAST(COUNT(props) AS BIGINT) AS n_with_props
FROM unioned
GROUP BY event_type, schema_ver
""",
)
def set_union_byname_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two generations of the events feed —
    v1 carries `value` but predates `props`, v2 dropped `value` and
    added `props` — combined by COLUMN NAME with absent columns as
    NULL (`unionByName(allowMissingColumns=True)`), then audited per
    (type, generation). This is the daily reality of long-lived
    pipelines: positional UNION silently mis-aligns evolved schemas;
    by-name union is the only safe verb, and the null-population
    counts here are the audit that catches a generation gone wrong.

    Both legs prune to their own columns at the scan; the union is a
    plan-level concat (no shuffle) feeding one partial-agg'd rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.where(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", "value", F.lit(1).alias("schema_ver")
    )
    v2 = ev.where(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", "props", F.lit(2).alias("schema_ver")
    )
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return unioned.groupBy("event_type", "schema_ver").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_with_value"),
        F.count("props").alias("n_with_props"),
    )


@query(
    "join_scd2_pointintime",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey, c_acctbal FROM customer
), changes AS (
  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
  FROM dim WHERE {_SCD_BUCKET} = 0
), scd AS (
  SELECT d.c_custkey, d.c_acctbal, 1 AS version,
         DATE '1992-01-01' AS valid_from, DATE '9999-12-31' AS valid_to
  FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM changes)
  UNION ALL
  SELECT d.c_custkey, d.c_acctbal, 1 AS version,
         DATE '1992-01-01', DATE '1995-01-01'
  FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM changes)
  UNION ALL
  SELECT c_custkey, new_bal, 2 AS version, DATE '1995-01-01', DATE '9999-12-31'
  FROM changes
)
SELECT s.version,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_custkeys,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_spend,
       ROUND(CAST(SUM(CAST(s.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*), 4) AS avg_bal_at_order
FROM orders o
JOIN scd s ON s.c_custkey = o.o_custkey
          AND o.o_orderdate >= s.valid_from AND o.o_orderdate < s.valid_to
GROUP BY s.version
""",
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD-type-2 dimension — the read
    side of merge_scd2's write verb: each order joins the dimension
    VERSION that was valid on its order date (validity windows: the
    changed 10% flip from v1 to v2 on 1995-01-01; everyone else is v1
    forever), then rolls up per version — "what did the customer look
    like WHEN the fact happened", the question SCD2 exists to answer.

    Plan shape: the validity predicate is a residual filter on an
    EQUI hash join (custkey) — never a range-only join — so at 100 TB
    the fact side streams through one hash probe; the dimension's
    ~1.1 rows/key never blow up the build side. avg balance follows
    the exact-decimal-sum / bigint-count division discipline
    (AVG over c_acctbal's 2-dp values is exact in decimal on both
    engines, rounded once).
    """
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    b = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10
    )
    changes = dim.where(b == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("new_bal")
    )
    ckeys = changes.select("c_custkey")
    d0 = F.lit("1992-01-01").cast("date")
    d1 = F.lit("1995-01-01").cast("date")
    d9 = F.lit("9999-12-31").cast("date")
    scd = (
        dim.join(F.broadcast(ckeys), "c_custkey", "left_anti")
        .select("c_custkey", "c_acctbal", F.lit(1).alias("version"),
                d0.alias("valid_from"), d9.alias("valid_to"))
        .unionByName(
            dim.join(F.broadcast(ckeys), "c_custkey", "left_semi").select(
                "c_custkey", "c_acctbal", F.lit(1).alias("version"),
                d0.alias("valid_from"), d1.alias("valid_to"))
        )
        .unionByName(
            changes.select(
                "c_custkey", F.col("new_bal").alias("c_acctbal"),
                F.lit(2).alias("version"), d1.alias("valid_from"), d9.alias("valid_to"))
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    joined = o.join(
        scd,
        (o.o_custkey == scd.c_custkey)
        & (o.o_orderdate >= scd.valid_from)
        & (o.o_orderdate < scd.valid_to),
    )
    return joined.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("sum_spend"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_bal_at_order"),
    )
