"""Shared helpers enforcing the float hash-match policy (SURVEY.md §5.3).

Double aggregation is order-dependent under parallelism, so raw double
sums never hash-match across engines. Policy:

- money-like sums: cast each addend to DECIMAL(38,4) *before* summing in
  BOTH engines (decimal addition is exact and associative), then cast
  the total to DOUBLE (deterministic conversion) so schemas stay simple;
- averages: exact decimal sum cast to double, divided by the bigint
  count — identical IEEE division in both engines;
- stddev/corr/cosine and other intrinsically-float results: round to a
  precision where cross-engine ulp noise cannot flip the rounded value.

The DuckDB oracle text must mirror these exactly; see each operator's
oracle string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6, NOT 4: derived money values like price*(1-disc)*(1+tax) of
# 2-dp inputs have up to 6 true decimal places. Casting a double to a
# decimal whose scale is LOWER than the value's true scale lands exactly
# on rounding ties (~10% of rows), which the engines break differently;
# with scale ≥ true scale the nearest-decimal rounding is unambiguous
# (the double sits ~1e-10 off the exact decimal, never halfway).
DEC = "decimal(38,6)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str) -> Column:
    """Exact sum: decimal-cast addends, double-cast total."""
    return F.sum(dec(col)).cast("double")


# Oracle-side (DuckDB) SQL fragments mirroring dec()/dsum().
def o_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


# --- Fast exact sums -------------------------------------------------
#
# Spark's decimal(38,_) aggregation accumulates through JVM BigDecimal
# (~6x a double sum; measured 2.2s vs 0.34s on 600k cached rows).
# Same exact values, JVM-primitive speed: sum the addends as UNSCALED
# int64 (value * 1e6 rounded to nearest — identical to the decimal(38,6)
# cast because policy addends never land on rounding ties; see DEC note),
# then unscale through an exact decimal division at the very end.
#
# Overflow discipline (the 100 TB story):
#   - `lsum` (single-level long sum) is exact only while a GROUP total
#     stays under 2^63/1e6 ~ 9.2e12 — use it when rows-per-group is
#     structurally bounded (e.g. lineitems per order), any table size.
#   - For unbounded groups, two-level: per-(group, partition) long
#     partials (partition row counts are bounded by split size, so
#     partials can't overflow), then a decimal(38,0) combine over the
#     tiny #groups x #partitions partial set. See agg_group_pricing.
SCALE = 1_000_000


def ulong(col: Column | str) -> Column:
    """Addend as unscaled int64: floor(x*1e6 + 0.5) == decimal(38,6) cast
    (pure double ops — F.round's per-value BigDecimal is the slow path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * SCALE + F.lit(0.5)).cast("long")


def unscale(sum_col: Column) -> Column:
    """Unscaled int64 total -> exact decimal(38,6) -> double (one rounding,
    bit-identical to DuckDB's CAST(SUM(DECIMAL) AS DOUBLE))."""
    return (sum_col.cast("decimal(38,0)") / SCALE).cast("double")


def lsum(col: Column | str) -> Column:
    """Exact money sum for BOUNDED groups (single shuffle, long-typed)."""
    return unscale(F.sum(ulong(col)))


# --- Shuffle-before-explode ------------------------------------------
#
# Explode-then-aggregate pipelines keyed by a row id (shingling,
# gramming, tokenizing) should shuffle the COMPACT row, not the exploded
# stream: hash(doc_id) partitioning established before the explode
# satisfies every downstream groupBy/distinct clustered on doc_id(+x),
# so the heavy map work runs fully parallel and the aggregations compile
# with zero further exchanges. Explicit N (from shuffle.partitions) is
# deliberate: AQE coalesces small implicit shuffles to 1 partition
# (64 MB advisory), which serialized 1.45 M md5s + a SortAggregate sort
# onto one thread (measured 9x on text_fingerprint at sf0.1).


def spread(df, *cols):
    """Repartition by key cols, explicit-N (AQE-coalesce-proof)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols)


# --- Distributed global rank -----------------------------------------
#
# ROW_NUMBER() OVER (ORDER BY ...) with no PARTITION BY funnels the whole
# input through ONE partition — the textbook scale-killer. This is the
# replacement: a global rank whose only single-partition step touches
# #partitions rows (32 longs), everything else parallel and JVM-side.
#
#   1. range-partition by the sort key (total order across partitions;
#      unique sort keys => deterministic placement);
#   2. local row_number per range partition (parallel windows);
#   3. prefix-sum the per-partition counts (a #partitions-row window)
#      and broadcast-join the offsets back;
#   4. global rank = offset + local rank.
#
# The input is persisted so the two consumers (counts, local ranks) see
# the SAME range boundaries — RangePartitioner samples, and divergent
# boundaries between the branches would corrupt ranks.


def distributed_rank(df, *sort_cols, out_col: str = "rn"):
    """Global 1-based row_number over sort_cols with no global funnel."""
    from pyspark.sql import Window

    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(tpersist)
    )
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*sort_cols))
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        ranged.withColumn("_local", local)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )


def tpersist(df):
    """Persist an operator-internal multi-consumer frame and register it
    with session.release_transient_caches() (r17 hygiene, VERDICT r16
    #7). Drop-in for ``.persist()`` via ``.transform(tpersist)``; use it
    for every cache whose consuming action runs caller-side (so the
    operator itself can never unpersist — see session.py's registry
    note). Caches released in-operator (eager_release, explicit
    unpersist after a localCheckpoint) don't need it."""
    from .. import session

    return session.track_transient_cache(df.persist())


def eager_release(result, *cached):
    """Materialize a METADATA-SIZED result, release builder caches, and
    return the rows as a local-relation DataFrame (r8, VERDICT r7 #5).

    Closes the session-lifetime-persist caveat with code instead of
    documentation: operators whose plan persists an intermediate for
    multiple consumers previously could not ``unpersist()`` — the action
    runs caller-side, after the operator returns — so the cached blocks
    lived until session teardown. Running the single job here (cache
    hot for every consumer) and re-wrapping the rows as a local relation
    leaves ZERO persistent RDDs behind (pinned by
    tests/test_plans.py::test_unpersist_discipline_no_lingering_blocks).

    ONLY for results bounded by dimension cardinality (grouped-by-type
    drift scores, 1-row funnels): the collect is O(#groups), never
    O(data). Large results keep the lazy/checkpoint patterns per the
    measured persist-vs-checkpoint policy (BASELINE.md r7 A/B).

    BENCH CAVEAT: this moves ALL execution into DataFrame construction
    time — the returned frame is a local relation whose action is ~0s.
    bench.py's default run_once times execution only, so any
    eager_release-backed key added to bench HEADLINE must ALSO go into
    bench.CONSTRUCTION_TIMED or it silently benches at ~0s (the exact
    BENCH_r04/r05 `documents` artifact). bench.py carries the matching
    note at CONSTRUCTION_TIMED.
    """
    spark = result.sparkSession
    rows = result.collect()
    for c in cached:
        # blocking: the no-lingering-blocks test snapshots the persistent-RDD
        # registry right after return; the default async unpersist leaves a
        # removal race under load.
        c.unpersist(blocking=True)
    return spark.createDataFrame(rows, schema=result.schema)
