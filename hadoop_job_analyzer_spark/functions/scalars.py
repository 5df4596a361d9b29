"""Category H — scalar function families (SURVEY.md §2.H).

Reference analog: the string/regex/JSON munging the reference did per
job record in Python (framework-name extraction, conf parsing, time
dims [R-M]). Every function here is a built-in Catalyst expression —
JVM-side, inside whole-stage codegen; no Python in the hot path.

Cross-dialect traps handled per §5.3.7: dayofweek origin (avoided),
datediff argument order, double→int cast (Spark truncates, DuckDB
rounds — always explicit trunc), NULL sort defaults, libm functions
(ln/power rounded to 6), ceil/floor return types (Spark LONG vs
DuckDB DOUBLE — cast both to BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.scans import _JOBS_DUCK_COLS, _JOBS_JSONL
from ..registry import query
from ..sources.fixtures import ensure_jobs_jsonl


@query(
    "fn_string_basic",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       LOWER(c_mktsegment) AS seg_lower,
       LENGTH(c_name) AS name_len,
       TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       SUBSTR(c_name, 1, 8) AS name_prefix,
       CONCAT(c_mktsegment, ':', c_name) AS seg_name
FROM customer
""",
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/upper/lower/length/trim/lpad/substr (name munging [R-M])."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
    )


@query(
    "fn_string_split",
    oracle="""
SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
FROM documents
""",
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode → one row per token (tokenizing job names [R-M])."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))


@query(
    "fn_regexp_extract",
    oracle=r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS extracted_id,
       regexp_replace(c_name, '^Customer#0*', '') AS short_id,
       regexp_matches(c_name, '#0{3,}') AS has_triple_zero
FROM customer
""",
)
def fn_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE framework-plugin capability [R-M]: derive a stable logical id
    from a formatted name via regex group extraction."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("extracted_id"),
        F.regexp_replace("c_name", r"^Customer#0*", "").alias("short_id"),
        F.col("c_name").rlike(r"#0{3,}").alias("has_triple_zero"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256
FROM documents
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5/sha256 hex digests — byte-identical across engines (verified),
    the cross-engine-deterministic hash family used for dedup keys."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "fn_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter
FROM orders
""",
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter time dimensions [R-M].

    dayofweek deliberately avoided: Spark origin 1=Sunday vs DuckDB
    0=Sunday (§5.3.7)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )


@query(
    "fn_date_trunc",
    oracle="""
SELECT event_id,
       date_trunc('hour', ts) AS ts_hour,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day,
       time_bucket(INTERVAL 15 MINUTE, ts) AS ts_15min
FROM events
""",
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hour/day truncation + 15-minute buckets (time-series dims [R-M]).

    15-min bucket = epoch-seconds integer-div trick, matching DuckDB's
    time_bucket (both anchor at the Unix epoch).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_trunc("day", "ts").alias("ts_day"),
        F.timestamp_seconds(F.expr("cast(ts as long) div 900 * 900")).alias("ts_15min"),
    )


@query(
    "fn_date_arith",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS days_since_95,
       CAST(l_shipdate AS DATE) + 30 AS ship_plus_30d,
       CAST(CAST(l_shipdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS ship_plus_2mo
FROM lineitem
""",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / date_add / add_months (durations [R-M]).

    Argument-order trap: Spark datediff(end, start) = DuckDB
    date_diff('day', start, end). The derived dates are returned as
    midnight TIMESTAMPs: Spark DATE reaches the driver's pandas
    canonicalizer as datetime.date objects while DuckDB DATE becomes
    datetime64 — equal values, mismatched representation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_add(F.col("l_shipdate"), 30).cast("timestamp").alias("ship_plus_30d"),
        F.add_months(F.col("l_shipdate"), 2).cast("timestamp").alias("ship_plus_2mo"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       SQRT(l_extendedprice) AS price_sqrt,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(POWER(l_quantity, 2), 6) AS qty_sq,
       ((l_partkey % 7) + 7) % 7 AS pk_mod7
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/power/pmod (metric math).

    sqrt is IEEE-correctly-rounded (exact cross-engine); ln/power are
    libm-dependent → rounded to 6. ROUND(x,1) of 2-dp money values
    never lands on a tie (see _common.py scale note)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.pmod("l_partkey", F.lit(7)).alias("pk_mod7"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 200000 THEN 'large'
            WHEN o_totalprice >= 100000 THEN 'medium'
            WHEN o_totalprice >= 25000 THEN 'small'
            ELSE 'tiny' END AS size_band,
       GREATEST(o_totalprice, 50000.0) AS floor_50k,
       LEAST(o_totalprice, 250000.0) AS cap_250k,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm
FROM orders
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE ladder + greatest/least + coalesce/nullif (status classification [R-M])."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p >= 200000, "large")
        .when(p >= 100000, "medium")
        .when(p >= 25000, "small")
        .otherwise("tiny")
        .alias("size_band"),
        F.greatest(p, F.lit(50000.0)).alias("floor_50k"),
        F.least(p, F.lit(250000.0)).alias("cap_250k"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    )


@query(
    "fn_cast",
    oracle=r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, '(\d+)', 1) AS INTEGER) AS id_from_string,
       CAST(c_custkey AS VARCHAR) AS key_str,
       CAST(c_custkey AS DOUBLE) AS key_dbl,
       CAST(TRUNC(c_acctbal) AS INTEGER) AS bal_int,
       TRY_CAST(c_mktsegment AS INTEGER) AS seg_as_int,
       TRY_CAST('2024-01-15 12:30:00' AS TIMESTAMP) AS ts_lit
FROM customer
""",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. failure→NULL via try_cast (string-typed conf values [R-M]).

    double→int trap: Spark CAST truncates toward zero, DuckDB CAST
    rounds — both sides go through an explicit trunc."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).cast("int").alias("id_from_string"),
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_custkey").cast("double").alias("key_dbl"),
        F.expr("CAST(c_acctbal AS INT)").alias("bal_int"),
        F.expr("TRY_CAST(c_mktsegment AS INT)").alias("seg_as_int"),
        F.expr("TRY_CAST('2024-01-15 12:30:00' AS TIMESTAMP)").alias("ts_lit"),
    )


@query(
    "fn_array_basic",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       embedding[1] AS first_elem,
       embedding[64] AS last_elem,
       embedding[1:3][1] AS head_1,
       embedding[1:3][2] AS head_2,
       embedding[1:3][3] AS head_3
FROM embeddings
""",
)
def fn_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice on the embedding vector column [D].

    element_at is 1-based in both engines; parquet float32 values
    compare exactly (no arithmetic performed). The slice result is
    projected element-wise (head_1..head_3) instead of returned as a
    raw ARRAY cell, which the driver's pandas canonicalizer cannot
    hash (ndarray)."""
    e = load_table(spark, sf_dir, "embeddings")
    head3 = F.slice("embedding", 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        F.element_at(head3, 1).alias("head_1"),
        F.element_at(head3, 2).alias("head_2"),
        F.element_at(head3, 3).alias("head_3"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
SELECT vec_id,
       ROUND(list_dot_product(embedding, embedding), 4) AS norm_sq,
       ROUND(list_aggregate(list_transform(embedding, x -> CAST(ABS(x) AS DOUBLE)), 'max'), 6) AS max_abs,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""",
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/aggregate lambdas — vector math without UDFs [D].

    The dot product runs as a fused JVM expression (no Python); this is
    the built-in path the similarity keys (§2.K) build on."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.zip_with("embedding", "embedding", lambda a, b: (a * b).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("norm_sq"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: F.abs(x).cast("double"))), 6
        ).alias("max_abs"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "fn_json",
    oracle="""
SELECT k_value, COUNT(*) AS n_events
FROM (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
  FROM events
)
GROUP BY k_value
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + group by it (JSON conf parsing [R-M])."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k_value"))
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "fn_map_ops",
    oracle=f"""
SELECT job_id,
       'hdfs_bytes_read,hdfs_bytes_written,map_input_records,spilled_records'
         AS counter_names,
       counters.hdfs_bytes_read AS hdfs_read,
       CAST(4 AS INTEGER) AS n_counters,
       CAST(counters.hdfs_bytes_read + counters.hdfs_bytes_written
            + counters.map_input_records + counters.spilled_records AS BIGINT)
         AS counter_total
FROM read_json('{_JOBS_JSONL}', format='newline_delimited', columns={_JOBS_DUCK_COLS})
""",
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface over the jobs fixture's counters (§1.1 counters map).

    The open-ended conf/counters maps of the reference land as MapType
    columns; this key exercises keys/values/lookup/size. Oracle: DuckDB
    reads counters as a fixed STRUCT (the generator always emits the
    same 4 keys) and computes the dynamic map results as static struct
    expressions; tests additionally compare against the generator records.
    """
    path = ensure_jobs_jsonl()
    schema = (
        "job_id STRING, user STRING, framework STRING, status STRING, "
        "submit_ts TIMESTAMP, duration_ms BIGINT, map_tasks INT, reduce_tasks INT, "
        "counters MAP<STRING, BIGINT>"
    )
    jobs = spark.read.schema(schema).json(path)
    return jobs.select(
        "job_id",
        F.array_join(F.sort_array(F.map_keys("counters")), ",").alias("counter_names"),
        F.element_at(F.col("counters"), "hdfs_bytes_read").alias("hdfs_read"),
        F.size("counters").alias("n_counters"),
        F.aggregate(F.map_values("counters"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "counter_total"
        ),
    )


@query(
    "fn_variant_semistructured",
    oracle="""
SELECT k_value, COUNT(*) AS n_events
FROM (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
  FROM events
)
GROUP BY k_value
""",
)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT path for semi-structured data: props parses
    ONCE into the binary variant encoding (`parse_json`), then typed
    extraction (`variant_get`) — versus fn_json's per-access string
    re-parse (`get_json_object`). Same result as the string path (the
    oracle is identical SQL), different physical story: at 100 TB a
    props column accessed by k fields parses k times as strings but
    once as variant, and variant's binary form pushes through shuffles
    without re-serialization. This is the modern answer to the
    reference's open-ended JSON conf blobs.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.parse_json("props").alias("v"))
        .select(F.variant_get("v", "$.k", "int").alias("k_value"))
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "fn_levenshtein_fuzzy",
    oracle="""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
WHERE a.c_custkey <= 60 AND b.c_custkey <= 60
  AND levenshtein(a.c_name, b.c_name) <= 2
""",
)
def fn_levenshtein_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: near-identical customer-name pairs by
    Levenshtein distance ≤ 2 (both engines implement the identical
    unit-cost edit distance) — the record-linkage primitive for dirty
    dimension data. The candidate scope is bounded (first 60 keys)
    because edit distance has no index: production record linkage
    blocks candidates first (phonetic keys, q-gram LSH — this
    engine's minhash machinery) and runs the quadratic distance only
    within blocks; the cap stands in for that blocking step.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 60)
    a = c.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"))
    b = c.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .where(dist <= 2)
        .select("key_a", "key_b", dist.alias("edit_dist"))
    )


@query(
    "fn_try_arithmetic",
    oracle="""
SELECT event_id,
       value / NULLIF(value - value, 0) AS div_by_zero_is_null,
       CASE WHEN value >= 0 THEN SQRT(value) END AS safe_sqrt,
       TRY_CAST(props AS DOUBLE) AS bad_cast_is_null
FROM events
WHERE event_id <= 1000
""",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: try_divide / conditional sqrt /
    try_cast turn the would-be runtime errors of dirty data (division
    by zero, domain errors, unparseable strings) into NULLs — the
    difference between a 100 TB job that completes with a null-rate
    metric and one that dies at hour nine on a single bad row. Spark's
    try_* family maps to NULLIF/CASE/TRY_CAST guards in ANSI SQL.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("value") - F.col("value")).alias(
            "div_by_zero_is_null"
        ),
        F.when(F.col("value") >= 0, F.sqrt("value")).alias("safe_sqrt"),
        F.expr("try_cast(props AS DOUBLE)").alias("bad_cast_is_null"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT event_id,
       event_id & 255 AS low_byte,
       CAST(event_id << 2 AS BIGINT) AS shifted_left,
       event_id >> 3 AS shifted_right,
       xor(event_id, 6148914691236517205) AS xored,
       ~event_id AS inverted,
       CAST(bit_count(event_id) AS INTEGER) AS popcount
FROM events
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (&, <<, >>, xor, ~, popcount) — the bit
    twiddling that id-packing, bitmap indexes, and hash mixing are made
    of. All JVM codegen expressions; DuckDB mirrors each operator
    exactly on int64, so the match pins two's-complement semantics
    (including ~ on signed values) across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftleft(F.col("event_id"), 2).alias("shifted_left"),
        F.shiftright(F.col("event_id"), 3).alias("shifted_right"),
        F.col("event_id").bitwiseXOR(F.lit(6148914691236517205)).alias("xored"),
        F.bitwise_not(F.col("event_id")).alias("inverted"),
        F.bit_count(F.col("event_id")).alias("popcount"),
    )


@query(
    "fn_url_parse",
    oracle=f"""
WITH j AS (
  SELECT job_id, "user", framework, status,
         'https://' || framework || '.example.org/jobs/' || job_id ||
         '?user=' || "user" || '&st=' || status AS url
  FROM read_json('{_JOBS_JSONL}', format='newline_delimited', columns={_JOBS_DUCK_COLS})
)
SELECT job_id, url,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]user=([^&#]*)', 1) AS q_user,
       regexp_extract(url, '[?&]st=([^&#]*)', 1) AS q_status
FROM j
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (host / path / query-param extraction) — the link
    featurizer every crawl pipeline runs (domain-level dedup rates,
    per-site quality priors, tracker stripping all start here). URLs
    are constructed deterministically from the jobs fixture so both
    engines parse identical strings: Spark uses the BUILT-IN
    `parse_url` (JVM java.net parsing, codegen), while the oracle
    re-derives each part with dialect-shared regexes — the match pins
    parse_url's host/path/query semantics to their regex definitions.
    Pure map at any scale.
    """
    path = ensure_jobs_jsonl()
    schema = (
        "job_id STRING, user STRING, framework STRING, status STRING, "
        "submit_ts TIMESTAMP, duration_ms BIGINT, map_tasks INT, reduce_tasks INT, "
        "counters MAP<STRING, BIGINT>"
    )
    jobs = spark.read.schema(schema).json(path)
    url = F.concat(
        F.lit("https://"),
        F.col("framework"),
        F.lit(".example.org/jobs/"),
        F.col("job_id"),
        F.lit("?user="),
        F.col("user"),
        F.lit("&st="),
        F.col("status"),
    )
    u = jobs.select("job_id", url.alias("url"))
    return u.select(
        "job_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("user")).alias("q_user"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("st")).alias("q_status"),
    )


@query(
    "fn_trig",
    oracle="""
SELECT p_partkey,
       ROUND(SIN(p_size * PI() / 180), 6) AS sin_size,
       ROUND(COS(p_size * PI() / 180), 6) AS cos_size,
       ROUND(ATAN2(p_size, p_retailprice), 6) AS angle,
       ROUND(DEGREES(ATAN2(p_size, p_retailprice)), 6) AS angle_deg,
       ROUND(RADIANS(p_size), 6) AS size_rad
FROM part
""",
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family (sin/cos/atan2/degrees/radians) — the
    geo-distance and cyclical-feature math (hour-of-day encodings,
    haversine legs). libm results differ across engines in the last
    ulp, so everything is rounded to 6 per the §5.3 float policy; the
    inputs (int sizes, 2-dp prices) are exactly representable, making
    the pre-round values agree to ~1e-15.
    """
    p = load_table(spark, sf_dir, "part")
    deg = F.col("p_size") * F.lit(3.141592653589793) / 180
    return p.select(
        "p_partkey",
        F.round(F.sin(deg), 6).alias("sin_size"),
        F.round(F.cos(deg), 6).alias("cos_size"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice")), 6).alias("angle"),
        F.round(F.degrees(F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice"))), 6).alias("angle_deg"),
        F.round(F.radians(F.col("p_size").cast("double")), 6).alias("size_rad"),
    )


@query(
    "fn_base64_roundtrip",
    oracle="""
SELECT doc_id,
       CAST(length(to_base64(encode(text))) AS BIGINT) AS b64_len,
       md5(to_base64(encode(text))) AS b64_md5,
       CAST(CASE WHEN decode(from_base64(to_base64(encode(text)))) = text
                 THEN 1 ELSE 0 END AS INTEGER) AS roundtrip_ok,
       CAST(octet_length(from_hex(md5(text))) AS INTEGER) AS md5_bytes_len
FROM documents
""",
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-encoding family: base64 encode → decode → byte-exact
    round trip of the text column, plus hex decode of the md5 digest —
    the wire-format layer (payload columns in JSON/Avro envelopes,
    digest storage) exercised end to end.

    Cross-engine: Spark's base64() emits MIME-CHUNKED output (CRLF
    every 76 chars) while DuckDB's to_base64() is unchunked RFC 4648 —
    the newline strip normalizes Spark to the canonical form, after
    which the encoded STRING (hashed here) matches byte-for-byte, not
    just the decoded result; the round-trip flag re-decodes and
    compares against the original.
    Pure per-row codegen projection — no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    # Spark's base64() is MIME-chunked (CRLF every 76 chars, a JVM
    # Base64.getMimeEncoder artifact); DuckDB's to_base64 is unchunked
    # RFC 4648. Strip the breaks so the encoded STRING matches too.
    b64 = F.regexp_replace(F.base64(F.col("text").cast("binary")), "[\r\n]", "")
    back = F.unbase64(b64).cast("string")
    return d.select(
        "doc_id",
        F.length(b64).cast("long").alias("b64_len"),
        F.md5(b64).alias("b64_md5"),
        F.when(back == F.col("text"), 1).otherwise(0).cast("int").alias("roundtrip_ok"),
        F.length(F.unhex(F.md5("text"))).cast("int").alias("md5_bytes_len"),
    )
