"""Category K4 — sketch operators (SURVEY.md §2.K4).

Probabilistic summaries a 100 TB pipeline uses where exact state is
too big. Spark ships HLL (`approx_count_distinct`, keyed as
`agg_approx_distinct`); this module adds a count-min sketch built and
queried entirely in DataFrame ops. The sketch itself is deterministic
(md5-keyed hash rows — the verified cross-engine bucket trick from
corpus.py), so unlike most sketch implementations it is exactly
reproducible on both engines and hash-matched end-to-end, error bars
included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._common import tpersist
from .corpus import _bucket, _o_bucket

_CMS_D = 4  # hash rows
_CMS_W = 64  # buckets per row (deliberately small so collisions occur
#              at test scale and the overcount column is non-trivial)


@query(
    "sketch_countmin",
    oracle=f"""
WITH cnt AS (
  SELECT token, COUNT(*) AS exact_n
  FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
), hrows AS (
  SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS r
), cells AS (
  SELECT r, {_o_bucket("token || '#' || r", _CMS_W)} AS b, CAST(SUM(exact_n) AS BIGINT) AS cell
  FROM cnt CROSS JOIN hrows
  GROUP BY 1, 2
)
SELECT c.token, c.exact_n, MIN(s.cell) AS cms_est,
       MIN(s.cell) - c.exact_n AS overcount
FROM cnt c
CROSS JOIN hrows r
JOIN cells s ON s.r = r.r AND s.b = {_o_bucket("c.token || '#' || r.r", _CMS_W)}
GROUP BY c.token, c.exact_n
""",
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream: build a d=4 × w=64 CMS,
    then read every vocabulary term back out of it — returning exact
    count, CMS estimate, and the (provably ≥ 0) overcount so the
    result exhibits the sketch's error behavior, not just its API.

    Build shape: token counts first (the shuffle is vocabulary-sized —
    map-side partials collapse the token stream), then each distinct
    term fans out to its d cells and the 256-cell sketch aggregates
    from vocab×d rows, not occurrences×d. Query shape: terms re-derive
    their d cell coordinates and probe the sketch with a broadcast
    join (the sketch is d×w rows — trivially broadcastable at ANY
    corpus size, which is the entire point of sketching: the reduce
    state is constant-space while exact counting state grows with the
    vocabulary). At 100 TB the CMS replaces the exact-count CTE for
    heavy-hitter screening; here both are computed so the oracle
    checks the estimates against ground truth.
    """
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .transform(tpersist)  # both the build and the probe consume it
    )
    coords = cnt.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.concat_ws("#", F.col("token"), F.lit(str(r))), _CMS_W).alias(
                            "b"
                        ),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("token", "exact_n", F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    cells = coords.groupBy("r", "b").agg(F.sum("exact_n").alias("cell"))
    return (
        coords.join(F.broadcast(cells), ["r", "b"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )


_KMV_K = 16  # k smallest hashes retained


@query(
    "sketch_kmv_distinct",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT token
  FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
), fracs AS (
  SELECT CAST(('0x' || substring(md5(token), 1, 15))::BIGINT AS DOUBLE)
         / 1152921504606846976 AS frac
  FROM vocab
), kth AS (
  SELECT MAX(frac) AS kth_frac, COUNT(*) AS k
  FROM (SELECT frac FROM fracs ORDER BY frac ASC LIMIT {_KMV_K})
), exact AS (SELECT COUNT(*) AS n_exact FROM vocab)
SELECT k.k, e.n_exact, k.kth_frac,
       (k.k - 1) / k.kth_frac AS est_distinct
FROM kth k CROSS JOIN exact e
""",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch: keep the k=16 smallest
    md5 fractions of the token vocabulary; estimate |vocab| as
    (k-1)/kth_min. The H-matched companion to `agg_approx_distinct`
    (Spark's HLL, rows-only by necessity — HLL internals are
    engine-specific, but KMV over md5 is pure arithmetic both engines
    agree on bit-for-bit: hex→int64 is exact, /2^60 is an exact
    power-of-two scale, and the estimator is one IEEE division).

    Scale shape: distinct collapses the token stream to the vocab with
    map-side partials; the k smallest then flow through TakeOrdered
    (per-partition top-k partials merge on the driver — k rows per
    partition cross the wire, which is the whole point of KMV as a
    DISTRIBUTED sketch: it composes by union+truncate).
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = d.select(F.explode(F.split("text", " ")).alias("token")).distinct()
    frac = (
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("double")
        / F.lit(float(1 << 60))
    ).alias("frac")
    kmin = vocab.select(frac).orderBy("frac").limit(_KMV_K)
    kth = kmin.agg(F.max("frac").alias("kth_frac"), F.count(F.lit(1)).alias("k"))
    exact = vocab.agg(F.count(F.lit(1)).alias("n_exact"))
    return kth.crossJoin(exact).select(
        "k",
        "n_exact",
        "kth_frac",
        ((F.col("k") - 1) / F.col("kth_frac")).alias("est_distinct"),
    )


_BLOOM_M = 1024  # bits
_BLOOM_K = 3  # hash functions


def _bloom_pos_sql(idexpr: str, r: str) -> str:
    return _o_bucket(f"{idexpr} || '#' || {r}", _BLOOM_M)


@query(
    "sketch_bloom_membership",
    oracle=f"""
WITH hrows AS (
  SELECT UNNEST(generate_series(0, {_BLOOM_K - 1})) AS r
), bits AS (
  SELECT DISTINCT {_bloom_pos_sql('doc_id', 'r')} AS pos
  FROM documents, hrows WHERE source = 'src0'
), probe AS (
  SELECT DISTINCT doc_id, source, {_bloom_pos_sql('doc_id', 'r')} AS pos
  FROM documents, hrows
), judged AS (
  SELECT p.doc_id, p.source,
         COUNT(*) AS n_probe,
         SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM probe p LEFT JOIN bits b ON b.pos = p.pos
  GROUP BY 1, 2
)
SELECT doc_id,
       CASE WHEN n_hit = n_probe THEN 1 ELSE 0 END AS bloom_hit,
       CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS actual_member,
       CASE WHEN n_hit = n_probe AND source <> 'src0' THEN 1 ELSE 0 END AS false_positive
FROM judged
""",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter membership probe: build an m=1024-bit, k=3 filter
    over the src0 doc ids, then probe EVERY doc against it — returning
    the filter verdict, ground truth, and the false-positive marker
    (no-false-negative is the bloom guarantee; the oracle match proves
    it holds since `bloom_hit=0 ∧ actual=1` rows would diverge).

    This is the semi-join pruning primitive: at 100 TB the filter
    (128 bytes here; KBs for millions of keys at practical FPP) ships
    broadcast to every scan task and discards non-joining rows before
    the shuffle — exactly what Spark's runtime row-level bloom
    (spark.sql.optimizer.runtime.bloomFilter) injects, built here
    from first principles with the cross-engine md5 bucket so the
    whole bit array is hash-matched. Build side: distinct bit
    positions from members×k (≤ m rows); probe side: pure map fan-out
    to k positions + broadcast join + per-doc conjunction.
    """
    d = load_table(spark, sf_dir, "documents")

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.array(
                        *[
                            _bucket(
                                F.concat_ws("#", F.col("doc_id"), F.lit(str(r))), _BLOOM_M
                            )
                            for r in range(_BLOOM_K)
                        ]
                    )
                )
            ).alias("pos"),
        )

    bits = (
        positions(d.where(F.col("source") == "src0")).select("pos").distinct()
        .withColumn("bit_set", F.lit(1))
    )
    judged = (
        positions(d)
        .join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum(F.coalesce("bit_set", F.lit(0))).alias("n_hit"),
        )
    )
    hit = F.when(F.col("n_hit") == F.col("n_probe"), 1).otherwise(0)
    actual = F.when(F.col("source") == "src0", 1).otherwise(0)
    return judged.select(
        "doc_id",
        hit.alias("bloom_hit"),
        actual.alias("actual_member"),
        (hit * (1 - actual)).alias("false_positive"),
    )


_HQ_WIDTH = 50  # chars per histogram bucket
_HQ_PROBES = (0.5, 0.9, 0.99)


@query(
    "sketch_histogram_quantile",
    oracle=f"""
WITH hist AS (
  SELECT n_chars // {_HQ_WIDTH} AS b, COUNT(*) AS cnt FROM documents GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS total FROM documents
), cum AS (
  SELECT b, cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM hist
), probes AS (
  SELECT UNNEST([{', '.join(str(p) for p in _HQ_PROBES)}]::DOUBLE[]) AS p
), sel AS (
  SELECT p.p, CAST(CEIL(p.p * t.total) AS BIGINT) AS target_rank,
         c.b, c.cnt, c.cum_before
  FROM probes p CROSS JOIN tot t JOIN cum c
    ON c.cum_before < CEIL(p.p * t.total)
   AND CEIL(p.p * t.total) <= c.cum_before + c.cnt
), ex AS (
  SELECT ROUND(QUANTILE_CONT(n_chars, 0.5), 4) AS q50,
         ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS q90,
         ROUND(QUANTILE_CONT(n_chars, 0.99), 4) AS q99
  FROM documents
)
SELECT s.p, s.target_rank,
       s.b * {_HQ_WIDTH} + {_HQ_WIDTH}.0 * (s.target_rank - s.cum_before) / s.cnt
         AS est_quantile,
       CASE s.p WHEN 0.5 THEN ex.q50 WHEN 0.9 THEN ex.q90 ELSE ex.q99 END
         AS exact_quantile
FROM sel s CROSS JOIN ex
""",
)
def sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based quantile sketch: a fixed-width counting
    histogram over n_chars (the mergeable constant-space summary),
    read back at p50/p90/p99 by rank-interpolation within the covering
    bucket — next to the exact sorted-data percentile so the result
    carries its own error bar.

    The distributed-quantile recipe when a full sort is off the table:
    the histogram aggregates with map-side partials into ≤ #buckets
    cells (mergeable across executors by plain addition, unlike exact
    percentile state which grows with distinct values); the rank walk
    is a window over those few cells. All arithmetic is exact-int
    until one shared IEEE interpolation per probe — hash-exact, no
    float policy needed. At 100 TB this is the shape of
    approx_percentile's KLL sketch with the bucket layout made
    explicit (and cross-engine-reproducible, which KLL internals are
    not — same trade the CMS/KMV keys make vs HLL).
    """
    d = load_table(spark, sf_dir, "documents")
    hist = d.groupBy(F.expr(f"n_chars div {_HQ_WIDTH}").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn("cum_before", F.coalesce(F.sum("cnt").over(wcum), F.lit(0)))
    tot = d.agg(F.count(F.lit(1)).alias("total"))
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _HQ_PROBES])).alias("p")
    )
    target = F.ceil(F.col("p") * F.col("total"))
    sel = (
        probes.crossJoin(tot)
        .join(
            cum,
            (F.col("cum_before") < target) & (target <= F.col("cum_before") + F.col("cnt")),
        )
        .select("p", target.alias("target_rank"), "b", "cnt", "cum_before")
    )
    ex = d.agg(
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("q50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("q90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 4).alias("q99"),
    )
    est = (
        F.col("b") * _HQ_WIDTH
        + F.lit(float(_HQ_WIDTH)) * (F.col("target_rank") - F.col("cum_before")) / F.col("cnt")
    )
    exact = (
        F.when(F.col("p") == 0.5, F.col("q50"))
        .when(F.col("p") == 0.9, F.col("q90"))
        .otherwise(F.col("q99"))
    )
    return sel.crossJoin(ex).select(
        "p", "target_rank", est.alias("est_quantile"), exact.alias("exact_quantile")
    )


@query(
    "sketch_heavy_hitters",
    oracle="""
WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT COUNT(*) AS n FROM toks),
tf AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
SELECT tf.token, CAST(tf.cnt AS BIGINT) AS n_occurrences,
       ROUND(CAST(tf.cnt AS DOUBLE) / tot.n, 6) AS freq_share
FROM tf, tot
WHERE tf.cnt * 100 > tot.n
""",
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (tokens with frequency > N/k, k=100) via the
    two-phase candidate+verify pattern — the scalable exact answer to
    "which tokens dominate the corpus" (stopword discovery, boilerplate
    detection, tokenizer-vocab seeding).

    Phase 1 (candidates, NO shuffle): each partition counts its own
    token stream locally (mapInPandas, Arrow-batched) and emits only
    tokens that are heavy WITHIN the partition (local_cnt * k >
    local_n). Pigeonhole guarantees the union of local-heavy sets is a
    SUPERSET of the true heavy hitters: a token with global count >
    N/k must exceed n_p/k in at least one partition. Emitted state is
    <= k rows per partition — constant-size, like every sketch here.

    Phase 2 (verify): broadcast the candidate set, semi-join the token
    stream down to candidate occurrences only, exact-count those, and
    keep cnt * k > N. Map-side partial aggregation bounds the shuffle
    at #candidates x #partitions rows regardless of corpus size.

    The DuckDB oracle computes the same thing the single-node way
    (full GROUP BY + HAVING) — the hash match proves the two-phase
    plan is exactly lossless, not approximate.
    """
    import pandas as pd

    K = 100

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))

    def local_heavy(batches):
        counts: dict[str, int] = {}
        n_local = 0
        for pdf in batches:
            n_local += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
        out = [t for t, c in counts.items() if c * K > n_local]
        yield pd.DataFrame({"token": out})

    candidates = toks.mapInPandas(local_heavy, "token string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * K > F.col("n"))
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences").cast("double") / F.col("n"), 6).alias(
                "freq_share"
            ),
        )
    )


@query(
    "sketch_hll_mergeable",
    oracle="""
SELECT event_type AS scope,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= GREATEST(2, 0.05 * COUNT(DISTINCT user_id)) AS within_5pct
FROM events GROUP BY event_type
UNION ALL
SELECT '__ALL__' AS scope,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= GREATEST(2, 0.05 * COUNT(DISTINCT user_id)) AS within_5pct
FROM events
""",
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-AGGREGATABLE distinct counts via DataSketches HLL — the cube
    pattern that makes 100 TB rollups cheap: build per-group sketches
    ONCE (constant ~2^lgK bytes each, map-side mergeable like any
    partial agg), then answer every coarser rollup by sketch UNION
    instead of re-scanning the fact table. countDistinct cannot do
    this — distinct counts are not additive, sketches are.

    Output (round-6 reshape, VERDICT r5 task #3): DataSketches HLL has
    no DuckDB twin, so each row now carries the exact distinct count
    plus a ``within_5pct`` verdict holding THIS engine's sketch
    estimate to its own exact count under max(2, 5%) — the oracle runs
    the same verdict with DuckDB's approx_count_distinct, and both
    sides hash-match on (scope, exact, boolean). The '__ALL__' row's
    estimate is still computed by MERGING the five per-type sketches
    (never re-reading events) — the union estimate is the proof the
    state is mergeable — while its exact count comes from a separate
    global distinct (exact counts are NOT mergeable; that asymmetry is
    the point of the key). lgK=12 ⇒ ~2.5 KB per sketch, <2% rse.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    per = per.transform(tpersist)  # two consumers: per-type estimates + the union
    verdict = F.abs(F.col("_est") - F.col("n_users_exact")) <= F.greatest(
        F.lit(2.0), 0.05 * F.col("n_users_exact")
    )
    typed = per.select(
        F.col("event_type").alias("scope"),
        "n_users_exact",
        F.hll_sketch_estimate("sk").alias("_est"),
    ).select("scope", "n_users_exact", verdict.alias("within_5pct"))
    global_exact = ev.agg(F.countDistinct("user_id").alias("n_users_exact"))
    merged = (
        per.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("__ALL__").alias("scope"),
            "n_users_exact",
            verdict.alias("within_5pct"),
        )
    )
    return typed.unionByName(merged)


_AMS_K = 16  # independent ±1 sketches averaged
_AMS_EVEN = ("0", "2", "4", "6", "8", "a", "c", "e")  # hex chars → sign +1


@query(
    "sketch_ams_selfjoin_size",
    oracle=f"""
WITH f AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS fu FROM events GROUP BY user_id
), signs AS (
  SELECT user_id, fu,
         {', '.join(
           "CASE WHEN substr(md5(user_id || '#%d'), 1, 1) IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS s%d" % (k, k)
           for k in range(16))}
  FROM f
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(fu * fu) AS BIGINT) AS exact_f2,
         {', '.join(f"CAST(SUM(fu * s{k}) AS BIGINT) AS t{k}" for k in range(16))}
  FROM signs
)
SELECT n_users, exact_f2,
       ROUND(({' + '.join(f't{k}*t{k}' for k in range(16))}) / 16.0, 6) AS est_f2,
       ROUND(ABS(({' + '.join(f't{k}*t{k}' for k in range(16))}) / 16.0 - exact_f2)
             / exact_f2, 6) AS rel_error
FROM sums
""",
)
def sketch_ams_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F₂ sketch: estimate Σf_u² — the
    SELF-JOIN SIZE of the event stream on user_id — from 16 independent
    ±1-sign sums, next to the exact value and the realized relative
    error. F₂ is what a distributed planner wants before any self-join
    or skew decision: it IS the join fan-out a key distribution will
    produce (the quantity the dedup df-caps bound by construction).

    Cross-engine determinism end to end: signs come from md5 hex-char
    membership in an explicit even set (no hex→int conversion), every
    sketch sum Σ f_u·s_k is an exact BIGINT (order-invariant), squares
    and the /16 average stay integer-exact until one final double
    division pair. Sketch state is 16 longs — mergeable by addition,
    constant-size at any scale (the streaming/partial-agg shape); one
    user-count shuffle is the only data-sized exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("fu"))
    sign = lambda k: F.when(  # noqa: E731
        F.substring(F.md5(F.concat_ws("", F.col("user_id").cast("string"), F.lit(f"#{k}"))), 1, 1)
        .isin(*_AMS_EVEN),
        1,
    ).otherwise(-1)
    sums = f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("fu") * F.col("fu")).alias("exact_f2"),
        *[F.sum(F.col("fu") * sign(k)).alias(f"t{k}") for k in range(_AMS_K)],
    )
    sq = sum((F.col(f"t{k}") * F.col(f"t{k}") for k in range(1, _AMS_K)), F.col("t0") * F.col("t0"))
    est = sq / 16.0
    return sums.select(
        "n_users",
        "exact_f2",
        F.round(est, 6).alias("est_f2"),
        F.round(F.abs(est - F.col("exact_f2")) / F.col("exact_f2"), 6).alias("rel_error"),
    )
