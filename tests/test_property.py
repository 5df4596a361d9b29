"""Property-based differential tests (SURVEY.md §5.4): hypothesis
composes random filter+group-by queries over lineitem from a small
algebra; the SAME spec renders to a DataFrame expression and to SQL,
and the two engines must agree exactly.

This catches classes of bugs the fixed 140-key inventory can't: an
operator pair that interacts badly (e.g. a filter pushed below the
wrong join of predicates, NULL semantics on a boundary constant) shows
up as a differential mismatch on some generated example. Derandomized
so CI is stable; aggregates are integral-exact (count + sum of
integral-double quantities), so no float policy is needed.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.oracle_check import compare

SF_DIR = "/root/testdata/sf0.001"

# Predicate algebra: (column, op, value) triples rendered both ways.
_PREDICATES = [
    ("l_quantity", "<=", lambda d: d.draw(st.integers(1, 50))),
    ("l_quantity", ">", lambda d: d.draw(st.integers(0, 49))),
    ("l_linenumber", "<=", lambda d: d.draw(st.integers(1, 7))),
    ("l_orderkey", "%", lambda d: d.draw(st.integers(2, 7))),  # modulo bucket
    ("l_returnflag", "=", lambda d: d.draw(st.sampled_from(["A", "N", "R"]))),
    ("l_linestatus", "=", lambda d: d.draw(st.sampled_from(["F", "O"]))),
]

_GROUP_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]


class _Draw:
    def __init__(self, data):
        self._data = data

    def draw(self, strat):
        return self._data.draw(strat)


def _render(pred_ix: int, val) -> tuple:
    col, op, _ = _PREDICATES[pred_ix]
    if op == "%":
        return (F.col(col) % val == 0, f"{col} % {val} = 0")
    if op == "=":
        return (F.col(col) == val, f"{col} = '{val}'")
    if op == "<=":
        return (F.col(col) <= val, f"{col} <= {val}")
    return (F.col(col) > val, f"{col} > {val}")


@settings(max_examples=12, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_filter_group_agrees(spark_prop, data):
    d = _Draw(data)
    n_preds = d.draw(st.integers(1, 2))
    pred_ixs = d.draw(
        st.lists(st.integers(0, len(_PREDICATES) - 1), min_size=n_preds, max_size=n_preds, unique=True)
    )
    keys = d.draw(
        st.lists(st.sampled_from(_GROUP_KEYS), min_size=1, max_size=2, unique=True)
    )
    rendered = [_render(ix, _PREDICATES[ix][2](d)) for ix in pred_ixs]

    li = load_table(spark_prop, SF_DIR, "lineitem")
    cond = rendered[0][0]
    for c, _ in rendered[1:]:
        cond = cond & c
    sdf = (
        li.where(cond)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )
    sql = (
        f"SELECT {', '.join(keys)}, COUNT(*) AS n, SUM(l_quantity) AS sum_qty "
        f"FROM lineitem WHERE {' AND '.join(s for _, s in rendered)} "
        f"GROUP BY {', '.join(keys)}"
    )
    compare(sdf, sql, SF_DIR, f"prop[{sql[:80]}]")


@pytest.fixture(scope="module")
def spark_prop(spark):
    # reuse the session fixture; named separately so hypothesis's
    # function-scoped-fixture health check doesn't fire on `spark`
    return spark


@settings(max_examples=10, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_date_range_agrees_and_complements(spark_prop, data):
    """SURVEY §5.4's promised date-range property, both halves:
    (a) differential — a random [lo, hi) shipdate filter + count/sum
    agrees with DuckDB; (b) complement — count(range) +
    count(NOT range) + count(null) == count(*) inside Spark, which
    catches boundary/NULL-semantics bugs no fixed key exercises."""
    d = _Draw(data)
    lo_off = d.draw(st.integers(0, 2000))
    width = d.draw(st.integers(1, 1200))
    lo = f"1995-01-01"
    sdf_lo = F.to_timestamp(F.lit(lo)) + F.expr(f"interval {lo_off} days")
    sdf_hi = F.to_timestamp(F.lit(lo)) + F.expr(f"interval {lo_off + width} days")

    li = load_table(spark_prop, SF_DIR, "lineitem")
    in_range = (F.col("l_shipdate") >= sdf_lo) & (F.col("l_shipdate") < sdf_hi)
    sdf = li.where(in_range).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    # CAST the total: DuckDB's SUM over BIGINT widens to HUGEINT, which
    # lands in pandas as float64 and fails the dtype-strict comparator.
    sql = (
        "SELECT COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
        f"+ INTERVAL {lo_off} DAY AND l_shipdate < TIMESTAMP '1995-01-01' "
        f"+ INTERVAL {lo_off + width} DAY"
    )
    compare(sdf, sql, SF_DIR, f"prop-date[{lo_off}+{width}]")

    total = li.count()
    n_in = li.where(in_range).count()
    n_out = li.where(~in_range).count()
    n_null = li.where(F.col("l_shipdate").isNull()).count()
    assert n_in + n_out + n_null == total, (
        f"complement violated: {n_in} + {n_out} + {n_null} != {total}"
    )


@settings(max_examples=8, deadline=None, derandomize=True)
@given(data=st.data())
def test_rollup_level_totals_equal_grand_total(spark_prop, data):
    """SURVEY §5.4's rollup invariant: for random group keys, the sum of
    counts over each rollup LEVEL equals the grand total, and the
    all-null super-aggregate row IS the grand total — pinning the
    grouping-set semantics the agg_rollup/agg_cube keys rely on."""
    d = _Draw(data)
    keys = d.draw(
        st.lists(st.sampled_from(_GROUP_KEYS), min_size=1, max_size=3, unique=True)
    )
    li = load_table(spark_prop, SF_DIR, "lineitem")
    total = li.count()
    rolled = (
        li.rollup(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .collect()
    )
    # one level per distinct grouping id; each must sum to the total
    levels: dict[int, int] = {}
    for r in rolled:
        levels[r["gid"]] = levels.get(r["gid"], 0) + r["n"]
    assert set(levels) == {2**i - 1 for i in range(len(keys) + 1)}, levels
    for gid, s in levels.items():
        assert s == total, f"rollup level gid={gid} sums to {s} != {total}"


# --- join algebra (VERDICT r9 task #8) -------------------------------------
# Random (join-type × side-filter × group) specs rendered to BOTH engines.
# The join types are parametrized (not drawn) so every type is GUARANTEED
# exercised each run — a derandomized draw could happen to skip one.

_ORDERS_PREDICATES = [
    ("o_orderstatus", "=", lambda d: d.draw(st.sampled_from(["F", "O", "P"]))),
    ("o_totalprice", "<=", lambda d: d.draw(st.integers(1000, 400000))),
    ("o_orderkey", "%", lambda d: d.draw(st.integers(2, 7))),
]


def _render_orders(pred_ix: int, val) -> tuple:
    col, op, _ = _ORDERS_PREDICATES[pred_ix]
    if op == "%":
        return (F.col(col) % val == 0, f"{col} % {val} = 0")
    if op == "=":
        return (F.col(col) == val, f"{col} = '{val}'")
    return (F.col(col) <= val, f"{col} <= {val}")


@pytest.mark.parametrize("jt", ["inner", "left", "right", "full"])
@settings(max_examples=4, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_join_filter_agrees(spark_prop, jt, data):
    """Differential join algebra: lineitem ⋈ orders under a random filter
    on EACH side, grouped on a (possibly NULL-holding, for right/full)
    left-table key. Catches operator-interaction bugs the fixed inventory
    can't: a filter pushed through the wrong side of an outer join changes
    the unmatched-row population, and COUNT(o_orderkey) vs COUNT(*) pins
    exactly the null-extension semantics per join type."""
    d = _Draw(data)
    l_ix = d.draw(st.integers(0, len(_PREDICATES) - 1))
    r_ix = d.draw(st.integers(0, len(_ORDERS_PREDICATES) - 1))
    lcond, lsql = _render(l_ix, _PREDICATES[l_ix][2](d))
    rcond, rsql = _render_orders(r_ix, _ORDERS_PREDICATES[r_ix][2](d))

    li = load_table(spark_prop, SF_DIR, "lineitem").where(lcond)
    od = load_table(spark_prop, SF_DIR, "orders").where(rcond)
    joined = li.join(od, li["l_orderkey"] == od["o_orderkey"], how=jt)
    sdf = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_orderkey").alias("n_l"),
        F.count("o_orderkey").alias("n_o"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    sql = (
        "SELECT l_returnflag, COUNT(*) AS n, "
        "COUNT(l_orderkey) AS n_l, COUNT(o_orderkey) AS n_o, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        f"FROM (SELECT * FROM lineitem WHERE {lsql}) "
        f"{jt.upper()} JOIN (SELECT * FROM orders WHERE {rsql}) "
        "ON l_orderkey = o_orderkey GROUP BY l_returnflag"
    )
    compare(sdf, sql, SF_DIR, f"prop-join[{jt}|{lsql}|{rsql}]")


@pytest.mark.parametrize("jt", ["semi", "anti"])
@settings(max_examples=4, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_semi_anti_join_agrees(spark_prop, jt, data):
    """Existence-join half of the algebra: Spark left_semi/left_anti vs
    the EXISTS / NOT EXISTS rendering (the canonical ANSI equivalent the
    filter_exists_subquery key also uses). The right-side filter matters
    here in the opposite way to outer joins: it shrinks the existence
    set, flipping rows between the semi and anti populations."""
    d = _Draw(data)
    l_ix = d.draw(st.integers(0, len(_PREDICATES) - 1))
    r_ix = d.draw(st.integers(0, len(_ORDERS_PREDICATES) - 1))
    lcond, lsql = _render(l_ix, _PREDICATES[l_ix][2](d))
    rcond, rsql = _render_orders(r_ix, _ORDERS_PREDICATES[r_ix][2](d))

    li = load_table(spark_prop, SF_DIR, "lineitem").where(lcond)
    od = load_table(spark_prop, SF_DIR, "orders").where(rcond)
    joined = li.join(od, li["l_orderkey"] == od["o_orderkey"], how=f"left_{jt}")
    sdf = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    neg = "NOT " if jt == "anti" else ""
    sql = (
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        f"FROM lineitem l WHERE ({lsql}) AND {neg}EXISTS ("
        f"  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey"
        f"  AND ({rsql})) "
        "GROUP BY l_returnflag"
    )
    compare(sdf, sql, SF_DIR, f"prop-{jt}[{lsql}|{rsql}]")


# --- sessionization gap algebra (r10) ---------------------------------------
# The win_sessionize rewrite rests on a translation claim: for ANY gap G,
# Spark's session_window over second-truncated ts with gapDuration G
# (merge-on-touch) equals the gaps-and-islands rule "new session iff
# truncated-second diff > G". The registered key pins G=1800; this
# property pins the TRANSLATION across random gaps, rendered to both
# engines ON events (not lineitem — the ts-bearing table).


@settings(max_examples=8, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_gap_sessionization_agrees(spark_prop, data):
    from pyspark.sql import Window

    d = _Draw(data)
    gap = d.draw(st.integers(60, 7200))
    ev = load_table(spark_prop, SF_DIR, "events")
    sess = (
        ev.groupBy(
            "user_id",
            F.session_window(
                F.col("ts").cast("long").cast("timestamp"), f"{gap} seconds"
            ).alias("_win"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_win")
    )
    wu = Window.partitionBy("user_id").orderBy("session_start")
    sdf = sess.select(
        "user_id",
        F.row_number().over(wu).cast("bigint").alias("session_idx"),
        "session_start",
        "n_events",
    )
    sql = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > {gap}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_idx
"""
    compare(sdf, sql, SF_DIR, f"prop-session-gap[{gap}s]")


@settings(max_examples=8, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_gap_bucket_chain_agrees(spark_prop, data):
    """The r11 bucket-chain claim, pinned across RANDOM gaps: for ANY
    gap G, grouping events into fixed G-second buckets can never split
    a session inside a bucket (in-bucket consecutive truncated-second
    diffs are < G), and chaining bucket summaries on
    trunc(min_ts) − trunc(prev_max_ts) ≤ G reproduces the event-level
    gaps-and-islands rule exactly (the boundary difference IS the
    consecutive-event gap; trunc of a min == min of truncs). Same
    oracle as the session_window translation property above."""
    from pyspark.sql import Window

    d = _Draw(data)
    gap = d.draw(st.integers(60, 7200))
    ev = load_table(spark_prop, SF_DIR, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("long") / F.lit(gap)).alias("_bkt"),
        "ts",
    )
    buckets = ev.groupBy("user_id", "_bkt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("ts").alias("_min_ts"),
        F.max("ts").alias("_max_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("_bkt")
    flagged = buckets.select(
        "user_id",
        "_bkt",
        "_n",
        "_min_ts",
        F.when(
            F.col("_min_ts").cast("long") - F.lag("_max_ts").over(w).cast("long")
            <= gap,
            0,
        ).otherwise(1).alias("_new"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        flagged.withColumn("_isl", F.sum("_new").over(w_run))
        .groupBy("user_id", "_isl")
        .agg(F.min("_min_ts").alias("session_start"), F.sum("_n").alias("n_events"))
    )
    wu = Window.partitionBy("user_id").orderBy("session_start")
    sdf = sess.select(
        "user_id",
        F.row_number().over(wu).cast("bigint").alias("session_idx"),
        "session_start",
        "n_events",
    )
    sql = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > {gap}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_idx
"""
    compare(sdf, sql, SF_DIR, f"prop-bucket-chain-gap[{gap}s]")


# --- collapse-identical-texts algebra (r12) ----------------------------------
# The text_wordcount reshape rests on a multiset identity: collapsing
# duplicate documents to (text, copies) and summing copies per exploded
# token equals counting tokens over the raw corpus — for ANY corpus,
# any duplication profile, including empty strings (split('', ' ') is
# [''] in both plans). The registered key pins the fixture corpus via
# the DuckDB oracle; this property pins the PLAN equivalence on random
# dup-heavy corpora the fixtures don't contain.


@settings(max_examples=8, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_corpus_collapse_wordcount_agrees(spark_prop, data):
    d = _Draw(data)
    vocab = ["alpha", "beta", "gamma", "", "x1", "yy"]
    n_distinct = d.draw(st.integers(1, 8))
    texts = [
        " ".join(
            d.draw(st.sampled_from(vocab))
            for _ in range(d.draw(st.integers(0, 6)))
        )
        for _ in range(n_distinct)
    ]
    # duplication profile: each distinct text appears 1..7 times
    rows = []
    doc_id = 0
    for t in texts:
        for _ in range(d.draw(st.integers(1, 7))):
            rows.append((doc_id, t))
            doc_id += 1
    docs = spark_prop.createDataFrame(rows, "doc_id bigint, text string")

    naive = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    collapsed = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("copies"))
        .select(F.explode(F.split("text", " ")).alias("token"), "copies")
        .groupBy("token")
        .agg(F.sum("copies").alias("n"))
    )
    a = sorted(map(tuple, naive.collect()))
    b = sorted(map(tuple, collapsed.collect()))
    assert a == b, f"collapse != naive on {rows!r}"


# --- epoch-arithmetic truncation identity (r12) -------------------------------
# The bench events_hourly twin replaces date_trunc('hour', ts) with
# (secs - pmod(secs, 3600)).cast(timestamp). Under the session's pinned
# UTC zone these are the same function on ALL of time — including
# pre-1970 timestamps, where a naive % (remainder, sign-following)
# would round toward zero instead of flooring; pmod's non-negative
# remainder keeps the floor. Pinned on random epochs, both signs.


@settings(max_examples=8, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_epoch_arith_trunc_equals_date_trunc(spark_prop, data):
    d = _Draw(data)
    epochs = [
        d.draw(st.integers(-2_000_000_000, 2_000_000_000)) for _ in range(40)
    ]
    df = spark_prop.createDataFrame([(e,) for e in epochs], "secs bigint").select(
        F.col("secs").cast("timestamp").alias("ts")
    )
    secs = F.col("ts").cast("long")
    both = df.select(
        F.date_trunc("hour", "ts").alias("a"),
        (secs - F.pmod(secs, F.lit(3600))).cast("timestamp").alias("b"),
    )
    bad = both.where(~F.col("a").eqNullSafe(F.col("b"))).collect()
    assert not bad, f"arith trunc != date_trunc on {bad[:5]}"
