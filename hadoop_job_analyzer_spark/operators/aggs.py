"""Category D — aggregations (SURVEY.md §2.D).

This is the reference's core capability: its entire "engine" was a
per-dimension-tuple sum/count in a Python dict over flattened job
records (SURVEY.md §3.1 [R-M], upstream:hadoop-job-analyzer). Here each
projection/aggregation is a Catalyst ``Aggregate`` — partial (map-side)
HashAggregate → shuffle on the group keys → final HashAggregate, with
whole-stage codegen and AQE partition coalescing. GROUPING SETS /
ROLLUP / CUBE compute *several* of the reference's "crossections" in a
single pass (one Expand + one shuffle) instead of the reference's one
full pass per projection spec.

Scale notes (100 TB): partial aggregation bounds shuffle volume by
(#groups × #partitions), not input rows; low-cardinality group keys
(returnflag, status, priority) make these shuffles tiny at any scale.
countDistinct expands rows (Expand) before the two-phase agg — for
high-cardinality distincts at scale prefer approx_count_distinct (HLL,
constant memory), which is also declared here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._common import dec, distributed_rank, dsum, eager_release, o_dsum, ulong, unscale


@query(
    "agg_global",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {o_dsum('l_quantity')} AS sum_qty,
       {o_dsum('l_quantity')} / COUNT(*) AS avg_qty,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped totals over lineitem (the reference's grand-total metrics)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_group_pricing",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       {o_dsum('l_quantity')} AS sum_qty,
       {o_dsum('l_extendedprice')} AS sum_base_price,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {o_dsum('l_quantity')} / COUNT(*) AS avg_qty,
       {o_dsum('l_extendedprice')} / COUNT(*) AS avg_price,
       {o_dsum('l_discount')} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_group_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — TPC-H-Q1-shaped pricing summary.

    The canonical "crossection" aggregation of the reference (dimension
    tuple → many summed metrics). Exact money sums via the two-level
    unscaled-int64 scheme (_common.py): per-(group, partition) long
    partials in whole-stage codegen, then a decimal combine over the
    ~#groups x #partitions partial rows. Group cardinality is ~4, so
    both shuffles move a few KB regardless of input scale, and the
    decimal slow path touches only the tiny partial set (5x measured
    speedup over straight decimal(38,6) accumulation, identical values).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    partial = (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum(ulong("l_quantity")).alias("_qty"),
            F.sum(ulong("l_extendedprice")).alias("_base"),
            F.sum(ulong(disc_price)).alias("_disc_price"),
            F.sum(ulong(charge)).alias("_charge"),
            F.sum(ulong("l_discount")).alias("_disc"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    tot = lambda c: F.sum(F.col(c).cast("decimal(38,0)"))  # noqa: E731
    n = F.sum("_n")
    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        unscale(tot("_qty")).alias("sum_qty"),
        unscale(tot("_base")).alias("sum_base_price"),
        unscale(tot("_disc_price")).alias("sum_disc_price"),
        unscale(tot("_charge")).alias("sum_charge"),
        (unscale(tot("_qty")) / n).alias("avg_qty"),
        (unscale(tot("_base")) / n).alias("avg_price"),
        (unscale(tot("_disc")) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (the reference's unique-user counters)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= GREATEST(2, 0.05 * COUNT(DISTINCT user_id)) AS within_5pct
FROM events
GROUP BY event_type
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per event type — the 100 TB path
    for distinct counting: constant memory per group vs countDistinct's
    row expansion.

    Round-6 reshape (VERDICT r5 task #3): HLL sketches differ across
    engines by design, so instead of emitting the raw estimate (which
    only a rows-only check could grade) the key emits the exact count
    plus a ``within_5pct`` verdict comparing EACH ENGINE'S OWN sketch
    estimate against its own exact count under the same max(2, 5%)
    tolerance — a deterministic boolean both engines agree on, making
    the key hash-gradeable while still exercising the sketch path.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    ).select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx") - F.col("n_users_exact"))
            <= F.greatest(F.lit(2.0), 0.05 * F.col("n_users_exact"))
        ).alias("within_5pct"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {o_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several of the reference's projection specs in ONE pass.

    The reference looped over projection specs, re-aggregating the whole
    job list once per spec [R-M]; GROUPING SETS is the Spark-native
    upgrade — one Expand node replicates each row once per grouping set,
    then a single shuffle+aggregate computes all three projections.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("hja_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM hja_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {o_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical crossection: status → status×priority → grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {o_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "agg_having",
    oracle=f"""
SELECT user_id, {o_dsum('value')} AS total_value, COUNT(*) AS n_events
FROM events
GROUP BY user_id
HAVING CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) > 500.0
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups over an alerting threshold (post-aggregation filter)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(dsum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .where(F.col("total_value") > 500.0)
    )


@query(
    "agg_conditional",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       {o_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")} AS urgent_price,
       {o_dsum("CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN o_totalprice ELSE 0 END")} AS low_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (per-status counters of the reference)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    low = F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(urgent).alias("n_urgent"),
        F.sum(dec(F.when(urgent, F.col("o_totalprice")).otherwise(F.lit(0.0))))
        .cast("double")
        .alias("urgent_price"),
        F.sum(dec(F.when(low, F.col("o_totalprice")).otherwise(F.lit(0.0))))
        .cast("double")
        .alias("low_price"),
    )


@query(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_discount), 6) AS sd_disc,
       ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
       ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_price_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded per the float policy (§5.3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
    )


@query(
    "agg_minmax_by",
    oracle="""
SELECT o_orderstatus, max_key AS top_orderkey, min_key AS bottom_orderkey
FROM (
  SELECT o_orderstatus,
         FIRST(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS max_key,
         FIRST(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS min_key
  FROM orders
  GROUP BY o_orderstatus
)
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min per status ("which job was worst") with full tiebreak.

    max_by on a (price, key) struct makes ties deterministic — plain
    max_by(key, price) is nondeterministic under duplicate prices.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("top_orderkey"),
        F.min_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("bottom_orderkey"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT user_id,
       STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types
FROM events
GROUP BY user_id
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sorted distinct event-type list (collect_list order is
    nondeterministic → always sort_array; §5.3.6). Rendered as a
    comma-joined string: the driver's pandas canonicalizer cannot hash
    a raw ARRAY cell (ndarray), so the list is materialized as text on
    both sides (array_join ↔ STRING_AGG)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types")
    )


@query(
    "agg_percentile_exact",
    oracle="""
SELECT o_orderstatus,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS p50,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 2) AS p90
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (latency-percentile analog).

    Exact percentile requires a per-group sort — fine for bounded group
    counts; at 100 TB with many groups prefer approx_percentile (KLL/GK
    sketch, mergeable, constant memory).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot_wide",
    oracle=f"""
SELECT user_id,
       {', '.join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
""",
)
def agg_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pivot VERB (long→wide): per-user event counts, one column
    per event type — `groupBy().pivot(col, values)` with the value
    list PINNED (passing explicit values skips the extra
    distinct-collection pass Spark otherwise runs, and makes the
    output schema deterministic — both essential at 100 TB where the
    pivot column could have stragglers). Nulls from absent
    combinations are coalesced to 0 to match the relational
    conditional-agg equivalent the oracle states. One shuffle on
    user_id; the pivot is map-side conditional counting underneath.
    """
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(
        F.count(F.lit(1))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@query(
    "agg_unpivot_melt",
    oracle=f"""
SELECT user_id, event_type, COUNT(*) AS n
FROM events
WHERE event_type IN ({', '.join(f"'{t}'" for t in _EVENT_TYPES)})
GROUP BY user_id, event_type
""",
)
def agg_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unpivot VERB (wide→long): melt the pivoted per-user counts
    back to (user_id, event_type, n) rows via DataFrame.unpivot —
    dropping the zero fills — and land exactly back on the plain
    groupBy distribution (the oracle). Pivot ∘ unpivot == identity is
    the roundtrip guarantee reshaping pipelines rely on; unpivot
    itself is a zero-shuffle row expansion (an Expand node), so the
    only exchange in the whole plan is the pivot's groupBy.
    """
    wide = agg_pivot_wide(spark, sf_dir)
    long = wide.unpivot(
        ids=["user_id"], values=_EVENT_TYPES, variableColumnName="event_type", valueColumnName="n"
    )
    return long.where(F.col("n") > 0)


@query(
    "agg_bool_count_if",
    oracle="""
SELECT event_type,
       BOOL_AND(value >= 0) AS all_nonneg,
       BOOL_OR(value > 99) AS any_gt99,
       COUNT(*) FILTER (WHERE value > 50) AS n_gt50
FROM events
GROUP BY event_type
""",
)
def agg_bool_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: every/any/count_if per group — the
    assertion-style aggregates monitoring queries are built from
    ("did ANY reading exceed the limit", "are ALL values sane",
    "how many crossed the threshold"). Pure map-side partials; the
    boolean lattice combines associatively, so these are the
    cheapest aggregates in the engine."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_gt99"),
        F.count_if(F.col("value") > 50).alias("n_gt50"),
    )


@query(
    "agg_string_concat_ordered",
    oracle="""
SELECT o_orderpriority,
       STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / STRING_AGG): the distinct
    statuses per priority as one sorted comma-joined string — the
    report-friendly rendering of a small set-valued aggregate.
    Determinism requires BOTH distinct and an explicit order (an
    unordered string_agg differs run to run — worse, differs per
    partitioning); Spark spells it array_sort(collect_set) +
    array_join, which also shows the collect-then-render shape stays
    bounded: only set-valued (small-cardinality) columns belong here.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_regr_slope_grouped",
    oracle="""
WITH xy AS (
  SELECT event_type,
         -- FLOOR matches Spark's truncating timestamp→long cast;
         -- raw epoch keeps µs fractions and the regression's
         -- cancellation amplifies that 1e-11 into a 1e-6 slope flip
         CAST(FLOOR(date_part('epoch', ts)) AS DOUBLE) / 86400 AS x,
         value AS y
  FROM events
), sums AS (
  SELECT event_type,
         COUNT(*) AS m,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
  FROM xy GROUP BY event_type
)
SELECT event_type, m AS n_points,
       ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS slope_per_day
FROM sums
""",
)
def agg_regr_slope_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: each event type's value drift in
    units/day over the month — regr_slope as five decimal-grid-exact
    sums per group plus one closed-form expression (the zipf-fit
    pattern, grouped). The trend-detection aggregate monitoring
    dashboards plot; a genuinely distributed regression (map-side
    partials, one shuffle of 5 numbers per group) at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("ts").cast("long").cast("double") / 86400).alias("x")
    xy = ev.select("event_type", x, F.col("value").alias("y"))
    g = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")
    sums = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        g(F.col("x")).alias("sx"),
        g(F.col("y")).alias("sy"),
        g(F.col("x") * F.col("y")).alias("sxy"),
        g(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "event_type", F.col("m").alias("n_points"), F.round(slope, 6).alias("slope_per_day")
    )


_TYPE_BITS = {"click": 1, "view": 2, "purchase": 4, "signup": 8, "error": 16}


@query(
    "agg_bitmap_types",
    oracle=f"""
SELECT user_id,
       BIT_OR(CASE event_type {' '.join(f"WHEN '{t}' THEN {b}" for t, b in _TYPE_BITS.items())} END)
         AS type_bitmap,
       BIT_AND(CASE event_type {' '.join(f"WHEN '{t}' THEN {b}" for t, b in _TYPE_BITS.items())} END)
         AS only_type_or_zero,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def agg_bitmap_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates: each user's event-type BITMAP (bit_or of
    per-type flags — the compact "which capabilities/types has this
    entity touched" set representation bitmap indexes build on) and
    its bit_and dual (non-zero only for single-type users). Bitmaps
    combine associatively bit-by-bit, so these aggregate map-side like
    counts but carry SET information in 8 bytes per entity —
    dramatically cheaper than collect_set at 100 TB entity counts.
    """
    ev = load_table(spark, sf_dir, "events")
    flag = F.coalesce(
        *[F.when(F.col("event_type") == t, F.lit(b)) for t, b in _TYPE_BITS.items()]
    )
    return ev.groupBy("user_id").agg(
        F.bit_or(flag).alias("type_bitmap"),
        F.bit_and(flag).alias("only_type_or_zero"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_gini_user_activity",
    oracle="""
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), ranked AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i FROM per_user
), sums AS (
  SELECT COUNT(*) AS m, CAST(SUM(n) AS BIGINT) AS tot, SUM(i * n) AS iw FROM ranked
)
SELECT m AS n_users, tot AS n_events,
       ROUND(CAST(2 * iw AS DOUBLE) / (m * tot) - CAST(m + 1 AS DOUBLE) / m, 6) AS gini
FROM sums
""",
)
def agg_gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts — the traffic-
    concentration index (0 = uniform usage, →1 = a few users generate
    everything); capacity planning and abuse detection both read it.
    Computed by the sorted-rank formula G = 2Σ(i·xᵢ)/(m·Σx) − (m+1)/m:
    every sum is EXACT integer arithmetic (ranks × counts), so the
    only float ops are two final divisions — identical in both
    engines, rounded once. The rank is a DISTRIBUTED row_number
    (range-partition + local rank + broadcast offsets, _common.
    distributed_rank) — a global ORDER BY window would funnel every
    user through one partition, the one plan shape this engine bans
    at billion-user scale.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = distributed_rank(per_user, F.col("n").asc(), F.col("user_id").asc(), out_col="i")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("n").alias("tot"),
        F.sum(F.col("i") * F.col("n")).alias("iw"),
    )
    gini = (2 * F.col("iw")).cast("double") / (F.col("m") * F.col("tot")) - (
        F.col("m") + 1
    ).cast("double") / F.col("m")
    return sums.select(
        F.col("m").alias("n_users"),
        F.col("tot").alias("n_events"),
        F.round(gini, 6).alias("gini"),
    )


@query(
    "agg_mode_exact",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, k_value, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cnt DESC, k_value ASC NULLS LAST) AS rn
  FROM counts
)
SELECT event_type, k_value AS modal_k, cnt AS n_occurrences
FROM ranked WHERE rn = 1
""",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode per group with a DETERMINISTIC tie-break (highest
    count, then smallest value) — what the built-in `mode()` cannot
    promise (its ties are arbitrary, so it can never hash-match an
    oracle). The dominant-value report every profiler runs.

    Two-phase: count (group, value) pairs — partial-agg'd, shuffle is
    #distinct-pairs not rows — then pick rank 1 per group with a window
    PARTITIONED by group (parallel; never a global window). At 100 TB
    the pair-count table is the only shuffled state.

    NULL k_value (props without '$.k') sorts LAST explicitly on both
    sides — Spark's asc() default is NULLS FIRST but DuckDB's ASC is
    NULLS LAST, so engine defaults would pick different modal rows if a
    NULL group ever tied for rank 1 (the repo's explicit-null-placement
    policy, see sort_multi_null).
    """
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        )
        .groupBy("event_type", "k_value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("k_value").asc_nulls_last()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("k_value").alias("modal_k"),
            F.col("cnt").alias("n_occurrences"),
        )
    )


@query(
    "agg_moments_skew",
    oracle="""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS s3
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND(s1 / n, 6) AS mean_value,
       ROUND((s2 / n - (s1/n) * (s1/n)), 6) AS var_pop,
       ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
             / POWER(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skewness_pop
FROM s
""",
)
def agg_moments_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics (population variance + skewness) from
    raw power sums — the distribution-shape profiler for metric
    columns (burst asymmetry, long-tail detection). Built-in
    skewness()/kurtosis() can never hash-match across engines (sample
    vs population definitions differ and their streaming accumulators
    round differently), so the moments are assembled from Σx, Σx², Σx³
    — each summed EXACTLY on the decimal grid (2-dp inputs ⇒ x³ has 6
    true decimals, within DECIMAL(38,6)) — and the closed forms are
    then identical IEEE double expressions in both engines, rounded
    once. Partial-agg shuffle state is 4 numbers per group at any
    scale — the moment-sketch discipline.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(v)).cast("double").alias("s1"),
        F.sum(dec(v * v)).cast("double").alias("s2"),
        F.sum(dec(v * v * v)).cast("double").alias("s3"),
    )
    n, s1, s2, s3 = F.col("n"), F.col("s1"), F.col("s2"), F.col("s3")
    mu = s1 / n
    var = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    return s.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean_value"),
        F.round(var, 6).alias("var_pop"),
        F.round(m3 / F.pow(var, 1.5), 6).alias("skewness_pop"),
    )


@query(
    "agg_weighted_median",
    oracle="""
WITH w AS (
  SELECT lang, n_chars, doc_id,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n_chars) OVER (PARTITION BY lang) AS tot
  FROM documents
)
SELECT lang,
       CAST(MIN(n_chars) AS BIGINT) AS mass_median_chars,
       CAST(MIN(tot) AS BIGINT) AS total_chars
FROM w WHERE 2 * cum >= tot GROUP BY lang
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted (mass) median per group: the n_chars value at
    which cumulative character mass crosses half the group's total —
    "half the corpus's bytes live in docs at most this long", the
    size-planning statistic an unweighted median gets wrong when doc
    lengths are heavy-tailed (most DOCS are short, most BYTES are not).

    All integer arithmetic (no float policy needed). r10 plan: the
    per-DOC window ran over doc-mass rows in ≤ #langs (5) partitions —
    the low-cardinality-window cap the r10 parallelism audit hunted.
    The crossing VALUE depends only on per-(lang, n_chars) mass, so the
    rows are pre-aggregated into cells first (map-side partial — the
    shuffle carries ~distinct lengths per lang, not docs) and the
    cumulative window runs over CELLS: exactness because the per-row
    cum at the end of cell v equals the cell cum, so a mid-cell
    crossing still makes v the minimal qualifying cell (hash-equal at
    sf0.01/sf0.1/x64/x256; 1.31 → 0.73 s at x256 docs where the
    window input collapses 1.28 M → ~2 k rows). The 5-way cap now
    binds a metadata-sized sort only.
    """
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "n_chars").agg(F.sum("n_chars").alias("mass"))
    wc = Window.partitionBy("lang").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("lang")
    w = cells.select(
        "lang",
        "n_chars",
        F.sum("mass").over(wc).alias("cum"),
        F.sum("mass").over(wt).alias("tot"),
    )
    return (
        w.where(2 * F.col("cum") >= F.col("tot"))
        .groupBy("lang")
        .agg(
            F.min("n_chars").alias("mass_median_chars"),
            F.min("tot").alias("total_chars"),
        )
    )


@query(
    "agg_dow_hour_heatmap",
    oracle="""
SELECT CAST((CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) // 86400 + 4) % 7 AS INTEGER) AS dow,
       CAST(date_part('hour', ts) AS INTEGER) AS hour_of_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
)
def agg_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day traffic matrix (≤168 cells) — the
    capacity/anomaly heatmap every log dashboard opens with.

    Day-of-week is computed ARITHMETICALLY ((epoch_day + 4) % 7, so
    0=Sunday: epoch day 0 = Thursday 1970-01-01 → 4, and Sunday
    1970-01-04 → 0) instead of via the engines' dayofweek() — Spark's origin
    is 1=Sunday, DuckDB's 0=Sunday, the §5.3.7 trap this dodges by
    construction. Epoch seconds are FLOORed before the day division on
    both sides (the truncate-vs-round cast trap fixed in
    win_trailing_hour). Constant-size group state: 168 cells regardless
    of input scale, the ideal partial-agg shape.
    """
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.expr("cast(ts as long) div 86400")
    return (
        ev.groupBy(
            ((epoch_day + 4) % 7).cast("int").alias("dow"),
            F.hour("ts").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "agg_multi_distinct",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS n_distinct_lengths,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
FROM documents
GROUP BY source
""",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE distinct-counts over DIFFERENT columns in one aggregation
    (+ a plain count) — the cardinality dashboard per source, and the
    query shape that exercises Catalyst's Expand-based multi-distinct
    rewrite: each input row fans out once per distinct column with a
    grouping id, so all three distinct sets deduplicate inside ONE
    shuffle instead of three self-joined scans (a plan guard pins the
    Expand node). At 100 TB the ×3 expand trades shuffle volume for
    single-scan semantics — the alternative (three separate jobs)
    re-reads the fact table; the sketch alternative is
    sketch_hll_mergeable's shape when estimates suffice.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("n_chars").alias("n_distinct_lengths"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
    )


@query(
    "agg_theil_index",
    oracle="""
WITH ua AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(x) AS BIGINT) AS n_events,
       ROUND(SUM(CAST(x AS DOUBLE) * LN(CAST(x AS DOUBLE))) / CAST(SUM(x) AS DOUBLE)
             - LN(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6) AS theil_t
FROM ua GROUP BY event_type
""",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of per-user activity, per event type —
    the log-based concentration companion to agg_gini_user_activity
    (Gini needs a rank, Theil doesn't: T = Σ(x·ln x)/Σx − ln(Σx/n) is
    a pure two-level aggregation). Zero inequality ⇒ 0; all activity
    on one user ⇒ ln n. The per-(type,user) counts are exact integers;
    the only float work is one ln per user and a final closed form, so
    both shuffles are partial-agg'd and the group state is 3 numbers —
    flat to any corpus size. ROUND(...,6) absorbs the ~1e-11 cross-
    engine accumulation-order noise of the Σ x·ln x double sum
    (_common.py policy for intrinsically-float aggregates).
    """
    ev = load_table(spark, sf_dir, "events")
    ua = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("x"))
    xd = F.col("x").cast("double")
    return ua.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("n_events"),
        F.round(
            F.sum(xd * F.log(xd)) / F.sum("x").cast("double")
            - F.log(F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")),
            6,
        ).alias("theil_t"),
    )


@query(
    "agg_percentile_approx_verdict",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
       approx_quantile(value, 0.95) BETWEEN quantile_cont(value, 0.90)
                                        AND quantile_cont(value, 0.99)
         AS within_band
FROM events
GROUP BY event_type
""",
)
def agg_percentile_approx_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE approx-percentile scale path, finally first-class: every
    exact-percentile key in this repo carries a docstring caveat
    ("switch to approx_percentile's mergeable sketch at 100 TB") — this
    key exercises that path and grades it with the own-sketch-verdict
    pattern the r6 reshape introduced (agg_approx_distinct): each
    engine emits the exact p95 (hash-matched) plus a boolean holding
    ITS OWN sketch estimate (Spark: percentile_approx / KLL-style GK;
    DuckDB: approx_quantile / t-digest) inside the true [p90, p99]
    VALUE BAND of its own data. A rank-band criterion, not a relative
    error: t-digest's worst case at small groups was measured at 3.3%
    relative error (sf0.001, ~200 rows/group), so a fixed 2% bar flips
    with fixture size, while "the sketch's p95 ranks between the true
    p90 and p99" is the SLA-meaningful statement and holds from 200
    rows to any corpus size. The sketches differ by design; the
    verdicts agree.

    Scale story: exact percentiles sort each group; the approx sketch
    is constant-memory, map-side mergeable state per group — the ONLY
    viable shape once a group no longer fits an executor.
    """
    ev = load_table(spark, sf_dir, "events")
    exact = F.expr("percentile(value, 0.95)")
    approx = F.percentile_approx("value", F.lit(0.95), F.lit(10000))
    return ev.groupBy("event_type").agg(
        F.round(exact, 6).alias("p95_exact"),
        (
            (approx >= F.expr("percentile(value, 0.90)"))
            & (approx <= F.expr("percentile(value, 0.99)"))
        ).alias("within_band"),
    )


_PSI_BINS = 10
_KS_BINS = 256


@query(
    "agg_psi_drift",
    oracle=f"""
WITH rng AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
), t AS (
  SELECT event_type,
         LEAST(CAST(FLOOR((value - rng.mn) / ((rng.mx - rng.mn) / {_PSI_BINS}.0)) AS INT),
               {_PSI_BINS - 1}) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events, rng GROUP BY 1, 2
), grid AS (
  SELECT et.event_type, gb.bin
  FROM (SELECT DISTINCT event_type FROM events) et,
       (SELECT UNNEST(generate_series(0, {_PSI_BINS - 1})) AS bin) gb
), f AS (
  SELECT g.event_type, g.bin, COALESCE(t.n, 0) AS n
  FROM grid g LEFT JOIN t ON t.event_type = g.event_type AND t.bin = g.bin
), tot AS (
  SELECT bin, CAST(SUM(n) AS BIGINT) AS gn FROM f GROUP BY bin
), per AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn FROM f GROUP BY event_type
), alln AS (
  SELECT CAST(SUM(n) AS BIGINT) AS all_n FROM f
)
SELECT f.event_type,
       per.tn AS n_events,
       ROUND(SUM(
         ((f.n + 0.5) / (per.tn + {_PSI_BINS} * 0.5)
          - (tot.gn + 0.5) / (alln.all_n + {_PSI_BINS} * 0.5))
         * LN(((f.n + 0.5) / (per.tn + {_PSI_BINS} * 0.5))
              / ((tot.gn + 0.5) / (alln.all_n + {_PSI_BINS} * 0.5)))
       ), 6) AS psi
FROM f JOIN tot USING (bin) JOIN per USING (event_type) CROSS JOIN alln
GROUP BY 1, 2
""",
)
def agg_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each event type's value distribution
    vs the global mix — THE standard ML-ops drift score (<0.1 stable,
    0.1-0.25 shifting, >0.25 drifted), here over 10 fixed-width
    bins with Laplace 0.5-smoothing so empty bins are well-defined at any
    fixture size (deterministic in both engines; no data-dependent
    decile boundaries to disagree on).

    Scale shape: one global min/max (metadata broadcast), one binning
    map, one (type, bin) partial-agg'd count — <= #types x 10 cells of
    shuffle state at any corpus size; the PSI fold is a fixed chain of
    IEEE ops over exact integers, rounded once. The per-type ln sum has
    ≤10 terms so accumulation order cannot move the 6th decimal.
    """
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / _PSI_BINS))
            .cast("int"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )
    t = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin")))
    )
    f = grid.join(t, ["event_type", "bin"], "left").select(
        "event_type", "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    # Three consumers: per-bin totals, per-type totals, the fold. The cached
    # relation is #types x 10 bin-count rows (metadata-sized). r8: the
    # fold runs eagerly via eager_release (result = #types rows) so the
    # cache is released here instead of living until session teardown
    # (VERDICT r7 #5 — the caveat closed with code).
    f = f.persist()
    tot = f.groupBy("bin").agg(F.sum("n").alias("gn"))
    per = f.groupBy("event_type").agg(F.sum("n").alias("tn"))
    alln = f.agg(F.sum("n").alias("all_n"))
    smooth = _PSI_BINS * 0.5
    p = (F.col("n") + 0.5) / (F.col("tn") + smooth)
    q = (F.col("gn") + 0.5) / (F.col("all_n") + smooth)
    res = (
        f.join(tot, "bin")
        .join(per, "event_type")
        .crossJoin(F.broadcast(alln))
        .groupBy("event_type", F.col("tn").alias("n_events"))
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))
    )
    return eager_release(res, f)


@query(
    "agg_ks_binned_drift",
    oracle=f"""
WITH rng AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
), t AS (
  SELECT event_type,
         LEAST(CAST(FLOOR((value - rng.mn) / ((rng.mx - rng.mn) / {_KS_BINS}.0)) AS INT),
               {_KS_BINS - 1}) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events, rng GROUP BY 1, 2
), grid AS (
  SELECT et.event_type, gb.bin
  FROM (SELECT DISTINCT event_type FROM events) et,
       (SELECT UNNEST(generate_series(0, {_KS_BINS - 1})) AS bin) gb
), f AS (
  SELECT g.event_type, g.bin, COALESCE(t.n, 0) AS n
  FROM grid g LEFT JOIN t ON t.event_type = g.event_type AND t.bin = g.bin
), c AS (
  SELECT event_type, bin, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tn
  FROM f
), g AS (
  SELECT bin,
         CAST(SUM(n) AS BIGINT) AS gn
  FROM f GROUP BY bin
), gc AS (
  SELECT bin,
         CAST(SUM(gn) OVER (ORDER BY bin) AS BIGINT) AS gcum,
         CAST(SUM(gn) OVER () AS BIGINT) AS all_n
  FROM g
)
SELECT c.event_type,
       c.tn AS n_events,
       ROUND(MAX(ABS(CAST(c.cum AS DOUBLE) / c.tn
                     - CAST(gc.gcum AS DOUBLE) / gc.all_n)), 6) AS ks_d
FROM c JOIN gc USING (bin)
GROUP BY 1, 2
""",
)
def agg_ks_binned_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov distance between each event
    type's value distribution and the global mix: D = max over the
    256-bin grid of |CDF_type − CDF_global| — the
    distribution-shape drift detector that complements PSI's
    mass-reallocation score (KS is sensitive to WHERE mass moved, PSI
    to how much). Binned deliberately: exact KS needs a rank over every
    value (a global-sort shape); the 256-bin CDF bounds the
    error at 1/256 while keeping ALL state <= #types x 256
    integer cells — partial-agg'd, mergeable, flat at any corpus size.
    Both cumsum windows run over the bounded bin grid (<=256 rows
    per partition — the whitelisted calendar/grid window class), never
    over data rows. MAX of exact-integer-ratio differences is
    accumulation-order-free, rounded once.
    """
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / _KS_BINS))
            .cast("int"),
            F.lit(_KS_BINS - 1),
        ).alias("bin"),
    )
    t = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(spark.range(_KS_BINS).select(F.col("id").cast("int").alias("bin")))
    )
    f = grid.join(t, ["event_type", "bin"], "left").select(
        "event_type", "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    # Two consumers: per-type CDF and the global CDF; #types x 20 rows cached.
    # r8: eager fold + cache release, same pattern as agg_psi_drift.
    f = f.persist()
    w_t = Window.partitionBy("event_type").orderBy("bin")
    c = f.select(
        "event_type",
        "bin",
        F.sum("n").over(w_t).alias("cum"),
        F.sum("n").over(Window.partitionBy("event_type")).alias("tn"),
    )
    g = f.groupBy("bin").agg(F.sum("n").alias("gn"))
    w_g = Window.orderBy("bin")
    gc = g.select(
        "bin",
        F.sum("gn").over(w_g).alias("gcum"),
        F.sum("gn").over(Window.partitionBy()).alias("all_n"),
    )
    res = (
        c.join(gc, "bin")
        .groupBy("event_type", F.col("tn").alias("n_events"))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum").cast("double") / F.col("tn")
                        - F.col("gcum").cast("double") / F.col("all_n")
                    )
                ),
                6,
            ).alias("ks_d")
        )
    )
    return eager_release(res, f)


@query(
    "agg_winsorized_mean",
    oracle="""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(b.lo, 6) AS p05,
       ROUND(b.hi, 6) AS p95,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi) AS DECIMAL(38,6)))
                  AS DOUBLE) / COUNT(*), 6) AS winsorized_mean,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6)
         AS raw_mean
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type, b.lo, b.hi
""",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type (values clamped to the group's own
    [p05, p95] before averaging), reported beside the raw mean — the
    robust-location staple that makes corrupted-tail metrics readable
    (one 1e9 outlier moves a raw mean arbitrarily; it moves the
    winsorized mean by at most p95−p05 weight). The p05/p95 bounds are
    exact per-group percentiles (bounded group count — the
    agg_percentile_exact discipline; at 100 TB swap in the
    agg_percentile_approx_verdict sketch bounds).

    Two-pass shape: percentile agg to ≤#types rows (broadcast back),
    then one clamp map + decimal-exact sum — both aggregations
    partial-agg'd, the join a broadcast, no second full shuffle. The
    clamped addends follow the decimal(38,6) policy; the interpolated
    bounds appear as addends only for clamped rows (≤10% of each
    group, one distinct value per side).
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    n = F.count(F.lit(1))
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            n.alias("n_events"),
            F.round(F.first("lo"), 6).alias("p05"),
            F.round(F.first("hi"), 6).alias("p95"),
            F.round(dsum(clamped) / n, 6).alias("winsorized_mean"),
            F.round(dsum("value") / n, 6).alias("raw_mean"),
        )
    )
