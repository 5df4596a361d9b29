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
