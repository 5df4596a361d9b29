"""Category K3 — corpus-construction operators (SURVEY.md §2.K3).

The stages that turn a raw crawl into a training corpus, downstream of
the K/K2 featurizers and dedup: deterministic sampling and data mixing,
train/val/test splitting, benchmark decontamination, sequence packing,
stopword scrubbing, and applying dedup verdicts to produce the final
corpus. All are pure built-in-expression pipelines hash-matched against
DuckDB oracles.

Determinism rules (shared with llm.py/textops.py):

- "Random" sampling is md5-keyed: bucket = first 15 hex chars of
  md5(doc_id) → int64 (Spark ``conv(h,16,10)`` == DuckDB
  ``('0x'||h)::BIGINT``, verified in textops) mod 100. Reproducible
  across engines, runs, AND cluster sizes — the property a production
  pipeline actually wants from its sampler (re-runs select the same
  rows; adding executors doesn't change the sample), which
  ``df.sample()``/TABLESAMPLE cannot give.
- All counts/ratios stay in integer math until a final exact cast.

Scale notes are per-operator; the common theme is that every one of
these is either a pure map (sampling, splitting, scrubbing) that
pipelines into the scan with full predicate pushdown, or a single
bounded shuffle (packing: one per-stratum window; decon: one join on
gram hashes with a broadcastable benchmark side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._common import spread, tpersist
from . import textops  # noqa: F401 — _health_oracle composes textops'
# registered oracle SQL at import time; the registry's module order
# guarantees textops-first, but a DIRECT import of corpus (tests, A/B
# scripts) bypasses it — this import makes corpus self-sufficient (the
# r11 trap: `from operators.quality import <twin>` in a fresh process
# died with KeyError text_zipf_fit).
from .llm import MINHASH_PAIRS_ORACLE
from .neardup import dedup_components

# --------------------------------------------------------- hash sampling

# Per-language keep rates (percent) — a data-mixing config: downsample
# the over-represented language, keep the rest.
_RATES = {"en": 25, "de": 50, "es": 50, "fr": 50, "zh": 75}
_DEFAULT_RATE = 100


def _bucket(col: Column, mod: int) -> Column:
    """Deterministic uniform bucket in [0, mod) from any int/string col."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return h % mod


def _o_bucket(expr: str, mod: int) -> str:
    return f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT % {mod}"


_O_RATE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _RATES.items()
) + f" ELSE {_DEFAULT_RATE} END"


@query(
    "sample_hash_stratified",
    oracle=f"""
SELECT doc_id, lang, source, {_o_bucket('doc_id', 100)} AS bucket
FROM documents
WHERE {_o_bucket('doc_id', 100)} < {_O_RATE}
""",
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsample with per-language keep rates (data mixing).

    keep iff md5-bucket(doc_id) < rate(lang). A pure map-side filter:
    no shuffle, no state, pipelines into the parquet scan, and the
    selection is stable under re-runs and repartitioning — at 100 TB
    this is a zero-cost pushdown stage in front of everything else,
    and changing the mixture weights re-selects a superset/subset of
    the previous sample (nested samples: rate 25 ⊂ rate 50), which is
    how mixture-ablation corpora are built without re-shuffling data.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    return (
        d.withColumn("bucket", _bucket(F.col("doc_id"), 100))
        .where(F.col("bucket") < rate)
        .select("doc_id", "lang", "source", "bucket")
    )


@query(
    "sample_fixed_per_stratum",
    oracle="""
SELECT doc_id, lang, samp_rank FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS samp_rank
  FROM documents
)
WHERE samp_rank <= 20
""",
)
def sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample per stratum: exactly k=20 docs per
    language, the docs with the 20 smallest md5(doc_id) values.

    Hash-ordering makes "reservoir sampling" a deterministic top-k:
    uniform over the stratum, reproducible, and mergeable — per-
    partition top-20s combine to the global top-20, so Spark computes
    it with partial TakeOrdered partials, never materializing a full
    sort. At 100 TB: one shuffle of ≤ k rows per partition per
    stratum. (A true reservoir needs sequential state; hash-top-k is
    the order-free equivalent used in distributed samplers.)
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("samp_rank", F.row_number().over(w))
        .where(F.col("samp_rank") <= 20)
    )


# ------------------------------------------------------ train/test split


@query(
    "split_train_test",
    oracle=f"""
SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM (SELECT lang, n_chars, {_o_bucket('doc_id', 100)} AS b FROM documents)
GROUP BY 1, 2
""",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment + per-split stats.

    Same md5-bucket primitive as the sampler, so membership is a pure
    function of doc_id: any job (training, eval, decontamination) can
    recompute the split locally without a membership table or a join —
    the property that matters at 100 TB, where a split-assignment JOIN
    would be a full-corpus shuffle but this is a free map expression.
    Stats aggregate with map-side partials into 15 groups.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 90, F.lit("train")).when(b < 95, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
    )


# -------------------------------------------------------- decontamination

_DECON_N = 5  # gram width


def _grams(d: DataFrame, n: int) -> DataFrame:
    """doc_id → exploded DISTINCT n-word grams (built-in lambdas only).

    Same materialize-tokens-first + spread-before-explode shape as
    llm._shingles (see its docstring for why); distinct-per-doc here
    because decon counts each shared gram once.
    """
    toks = spread(d, "doc_id").select("doc_id", F.split(F.col("text"), " ").alias("t"))
    idx = F.when(F.size("t") >= n, F.sequence(F.lit(1), F.size("t") - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("t"), i + j) for j in range(n)]),
    )
    return toks.select("doc_id", F.explode(F.array_distinct(gram)).alias("gram"))


_O_GRAMS = f"""
  SELECT DISTINCT doc_id, source,
         concat_ws(' ', {', '.join(f't[i+{j}]' for j in range(_DECON_N))}) AS gram
  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       UNNEST(CASE WHEN len(t) >= {_DECON_N}
                   THEN generate_series(1, len(t)-{_DECON_N - 1}) ELSE [] END) AS u(i)
"""


@query(
    "decon_ngram_overlap",
    oracle=f"""
WITH grams AS ({_O_GRAMS}),
bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
train AS (SELECT doc_id, gram FROM grams WHERE source <> 'src0'),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shared_grams
  FROM train t JOIN bench b ON t.gram = b.gram
  GROUP BY t.doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id)
SELECT h.doc_id, h.n_shared_grams, tot.n_grams,
       CASE WHEN h.n_shared_grams * 10 >= tot.n_grams THEN 1 ELSE 0 END AS is_contaminated
FROM hits h JOIN tot USING (doc_id)
""",
)
def decon_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing 5-gram
    spans with the held-out set (source='src0' stands in for the
    benchmark suite), with a 10%-of-grams contamination threshold.

    The standard n-gram decon pipeline (GPT-3 appendix-C shape):
    distinct 5-grams per doc on both sides, inner join train grams
    against the benchmark gram SET, count hits per doc. Threshold
    math stays in integers (n_shared*10 >= n_grams) — no float, no
    rounding policy needed. Shuffle shape at 100 TB: the benchmark
    side is ~fixed-size (eval suites are MBs, not TBs) → Spark
    broadcast-joins it automatically under AQE size stats; the train
    side streams through map-side, so decon costs one scan plus a
    per-doc count. The gram join key at scale would be md5(gram)
    (32 bytes bounded) rather than the raw span; kept raw here to
    keep the oracle dialect-free, noted for the 100 TB plan.
    """
    d = load_table(spark, sf_dir, "documents")
    # Filter by source BEFORE gramming: each leg's predicate pushes down
    # to its scan and no join is needed to recover `source` afterwards
    # (first cut joined the gram stream back to documents for the source
    # column — 10-exchange plan; this shape has 3).
    bench = (
        _grams(d.where(F.col("source") == "src0").select("doc_id", "text"), _DECON_N)
        .select("gram")
        .distinct()
    )
    train = _grams(d.where(F.col("source") != "src0").select("doc_id", "text"), _DECON_N)
    # spread established partitioning on doc_id; the per-doc total is
    # exchange-free, and both consumers share the persisted gram stream.
    train = train.transform(tpersist)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return hits.join(tot, "doc_id").select(
        "doc_id",
        "n_shared_grams",
        "n_grams",
        F.when(F.col("n_shared_grams") * 10 >= F.col("n_grams"), 1)
        .otherwise(0)
        .alias("is_contaminated"),
    )


# -------------------------------------------------------- sequence packing

_PACK_CAP = 2048  # tokens per packed sequence bin


@query(
    "pack_sequences",
    oracle=f"""
WITH sized AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), offs AS (
  SELECT lang, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_off
  FROM sized
)
SELECT lang, CAST(start_off // {_PACK_CAP} AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM offs
GROUP BY lang, start_off // {_PACK_CAP}
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate each language's docs in doc_id
    order into a token stream and cut it into 2048-token bins; report
    per-bin doc count, token mass, and doc range.

    bin = start-offset // capacity (offset packing: a doc belongs to
    the bin its first token lands in) — the deterministic, shuffle-
    friendly packing used when documents stream in a fixed order, as
    opposed to bin-packing heuristics that need global state. One
    window (running sum per stratum) + one partial agg. At 100 TB the
    per-stratum ORDER BY is the real cost: Spark range-partitions
    within lang for the window sort; production packers do exactly
    this per input shard rather than globally (the order just has to
    be *fixed*, not *global*), which drops the sort to per-partition.
    """
    d = load_table(spark, sf_dir, "documents")
    sized = d.select("lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sized.withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        offs.groupBy("lang", (F.col("start_off") / _PACK_CAP).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# -------------------------------------------------------- stopword scrub

_STOPWORDS = ("a", "the")


@query(
    "text_remove_stopwords",
    oracle=f"""
WITH cleaned AS (
  SELECT doc_id,
         string_split(text, ' ') AS t,
         list_filter(string_split(text, ' '),
                     x -> x NOT IN ({', '.join(repr(s) for s in _STOPWORDS)})) AS kept
  FROM documents
)
SELECT doc_id,
       len(t) AS n_before,
       len(kept) AS n_after,
       md5(array_to_string(kept, ' ')) AS clean_hash
FROM cleaned
""",
)
def text_remove_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword scrub: drop stoplist tokens, return before/after token
    counts and the md5 of the cleaned text (the hash proves the full
    reconstructed string matches the oracle byte-for-byte without
    shipping megabytes of text through the comparison).

    Pure map over array built-ins (split → filter → array_join) —
    whole-stage-codegen'd, zero shuffle, scales embarrassingly. The
    cleaning transform every pipeline runs before tokenization; the
    same filter-lambda shape extends to boilerplate line removal.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    kept = F.filter(t, lambda x: ~x.isin(*_STOPWORDS))
    return d.select(
        "doc_id",
        F.size(t).alias("n_before"),
        F.size(kept).alias("n_after"),
        F.md5(F.array_join(kept, " ")).alias("clean_hash"),
    )


# ------------------------------------------------- apply dedup verdicts


@query(
    "corpus_dedup_apply",
    oracle=f"""
WITH RECURSIVE pairs AS (
{MINHASH_PAIRS_ORACLE}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
), comp AS (
  SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src
)
SELECT d.lang, d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN d.doc_id = c.component THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN d.doc_id = c.component THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN d.doc_id = c.component THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_kept
FROM documents d JOIN comp c USING (doc_id)
GROUP BY d.lang, d.source
""",
)
def corpus_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply near-dup verdicts to the corpus: per lang×source, how many
    docs survive keeper-selection (doc == its component representative)
    and how much text mass is kept — the accounting report every dedup
    run ends with, and the stage that turns dedup_components' labels
    into the actual filtered corpus.

    One equi-join of the label table (doc_id, component — two bigints)
    back to documents, then a 100-group partial agg. At 100 TB the
    label table is ~16 bytes/doc; it joins either broadcast (labels of
    a 1 B-doc corpus ≈ 16 GB → shuffle) or sort-merge on doc_id, and
    the heavy side streams map-side. Reuses dedup_components verbatim
    (same iterative propagation), so the two keys cannot drift.
    """
    labels = dedup_components(spark, sf_dir).select("doc_id", "component")
    d = load_table(spark, sf_dir, "documents")
    kept = F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0)
    return (
        d.join(labels, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.sum(1 - kept).alias("n_removed"),
            F.sum(F.col("n_chars") * kept).alias("chars_kept"),
        )
    )


@query(
    "corpus_pipeline_e2e",
    oracle=f"""
WITH base AS (
  SELECT doc_id, text, lang, source, n_chars,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), q AS (
  SELECT * FROM base WHERE n_chars BETWEEN 50 AND 2000 AND n_tokens >= 10
), mixed AS (
  SELECT * FROM q WHERE {_o_bucket('doc_id', 100)} < {_O_RATE}
), dd AS (
  SELECT * FROM mixed
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), bgrams AS (
  SELECT DISTINCT concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS gram
  FROM (SELECT string_split(text, ' ') AS t FROM documents WHERE source = 'src0'),
       UNNEST(CASE WHEN len(t) >= 5 THEN generate_series(1, len(t)-4) ELSE [] END) AS u(i)
), tgrams AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM dd WHERE source <> 'src0'),
       UNNEST(CASE WHEN len(t) >= 5 THEN generate_series(1, len(t)-4) ELSE [] END) AS u(i)
), tot AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM tgrams GROUP BY 1
), hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shared
  FROM tgrams t JOIN bgrams b USING (gram) GROUP BY 1
), contam AS (
  SELECT h.doc_id FROM hits h JOIN tot USING (doc_id)
  WHERE h.n_shared * 10 >= tot.n_grams
), clean AS (
  SELECT * FROM dd
  WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM contam)
)
SELECT CASE WHEN {_o_bucket('doc_id', 100)} < 90 THEN 'train'
            WHEN {_o_bucket('doc_id', 100)} < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM clean
GROUP BY 1, 2
""",
)
def corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP corpus build — the full training-data pipeline in one
    declarative plan: quality filter → language-mixing downsample →
    exact dedup (keep min doc_id per content hash) → benchmark
    decontamination (drop docs sharing ≥10% of 5-grams with the src0
    held-out set) → train/val/test split → per-split accounting.

    Every stage reuses the primitives its standalone key verifies
    (md5-bucket sampling/splitting, content-hash dedup, distinct-gram
    overlap), composed as ONE DataFrame expression — Catalyst sees the
    whole pipeline, so the quality+mixing predicates fuse into the
    scan, the dedup window and the gram explode operate on the already-
    thinned stream, and nothing materializes between stages. That
    composition (filter early, dedup before the expensive gram stage,
    broadcast the benchmark) is exactly the stage ordering a 100 TB
    corpus build wants; at that scale each arrow stays the same plan,
    only the persist/checkpoint boundaries between pipeline RUNS would
    be added (each stage's output is also a natural parquet sink).
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.withColumn("n_tokens", F.size(F.split("text", " ")))
    q = base.where(
        F.col("n_chars").between(50, 2000) & (F.col("n_tokens") >= 10)
    )
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    mixed = q.where(_bucket(F.col("doc_id"), 100) < rate)
    # r17 reshape (guide §2.3 "aggregate before you shuffle"): the exact
    # dedup keeps the min-doc_id row per content hash. The r16 shape was
    # a row_number window over md5(text) — a full shuffle of every
    # surviving row plus a per-partition SORT just to pick rank 1. min_by
    # over the whole row is the same selection (doc_id is unique, so the
    # ordering is total and the winner identical) as ONE HashAggregate:
    # partial agg keeps one candidate row per distinct text per map
    # partition, so the exchange carries ~distinct texts instead of the
    # corpus and the sort disappears. The aggregation buffer holds a
    # single row (text ≤ 2000 chars here — the quality filter runs
    # first), never a posting list. Hash-equal to the window shape by
    # construction; pinned by tests/test_r17_opt.py.
    dd = (
        mixed.groupBy(F.md5("text").alias("_tk"))
        .agg(F.min_by(F.struct(*mixed.columns), F.col("doc_id")).alias("_r"))
        .select("_r.*")
    )
    bench = (
        _grams(d.where(F.col("source") == "src0").select("doc_id", "text"), _DECON_N)
        .select("gram")
        .distinct()
    )
    train = dd.where(F.col("source") != "src0")
    tg = _grams(train.select("doc_id", "text"), _DECON_N).transform(tpersist)
    tot = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        tg.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    contam = (
        hits.join(tot, "doc_id")
        .where(F.col("n_shared") * 10 >= F.col("n_grams"))
        .select("doc_id")
    )
    clean = train.join(contam, "doc_id", "left_anti")
    b = _bucket(F.col("doc_id"), 100)
    split = F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    return (
        clean.select(split.alias("split"), "lang", "n_chars", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


@query(
    "assign_contiguous_ids",
    oracle="""
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS new_id
FROM documents
""",
)
def assign_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign contiguous ids 0..N-1 to the corpus in a deterministic
    (md5-shuffled) order — the renumbering step when corpora merge or
    a new crawl lands, done the way it scales: NOT a global
    row_number window (that is a single-partition sort — the one plan
    shape this engine bans), but the textbook three-step:

    1. range-partition by the sort key (each partition owns a
       contiguous key range, sorted within — a distributed sort);
    2. count rows per partition (32 longs to the driver — the
       documented exception to no-collect, like the iterative keys'
       convergence counts);
    3. broadcast the prefix-sum offsets; each partition numbers its
       rows offset+0,1,2… in a mapPartitions pass (category (c) of
       the custom-operator ladder — per-partition imperative logic
       that genuinely cannot express as DataFrame ops).

    The oracle is the single-node formulation (global ROW_NUMBER);
    identical output, opposite physical plan — that contrast is the
    point of the key.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("k")
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = d.repartitionByRange(n_parts, "k", "doc_id").sortWithinPartitions("k", "doc_id")
    sizes = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_pid = {r["pid"]: r["n"] for r in sizes}
    offsets, acc = {}, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    def number(pid: int, it):
        base = b_offsets.value[pid]
        for i, row in enumerate(it):
            yield (row["doc_id"], base + i)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("new_id", LongType())]
    )
    return spark.createDataFrame(
        ranged.rdd.mapPartitionsWithIndex(number, preservesPartitioning=True), schema
    )


def _health_oracle() -> str:
    from ..registry import _ORACLES

    return f"""
WITH zipf AS (
{_ORACLES["text_zipf_fit"]}
), base AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT md5(text)) AS n_unique_texts,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents
), tf AS (
  SELECT token, COUNT(*) AS n
  FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tf),
ent AS (
  SELECT CAST(SUM(CAST(
           -(CAST(tf.n AS DOUBLE) / t.total) * LN(CAST(tf.n AS DOUBLE) / t.total)
         AS DECIMAL(38,12))) AS DOUBLE) AS entropy_nats,
         MAX(t.total) AS total_tokens
  FROM tf CROSS JOIN tot t
)
SELECT b.n_docs, b.n_langs, b.total_chars, e.total_tokens,
       CAST(b.n_docs - b.n_unique_texts AS DOUBLE) / b.n_docs AS exact_dup_rate,
       e.entropy_nats, z.zipf_slope
FROM base b CROSS JOIN ent e CROSS JOIN zipf z
"""


@query("corpus_health_report", oracle=_health_oracle())
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus dashboard: size (docs/langs/chars/tokens),
    exact-duplicate rate, token entropy, and Zipf slope — the summary
    a data-quality review reads before anything trains on a snapshot.
    Composes the verified standalone statistics (zipf via its key and
    oracle text; entropy/dup-rate as their canonical expressions) into
    one cross-joined row of scalar aggregates — every component is a
    full-corpus reduce with constant-size output, so the report costs
    one pass over documents at any scale.
    """
    from .llm import dedup_exact  # noqa: F401  (family documented; not re-run)
    from .textops import text_zipf_fit

    d = load_table(spark, sf_dir, "documents")
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.sum("n_chars").alias("total_chars"),
    )
    tf = (
        spread(d, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tf.agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    ent = tf.crossJoin(F.broadcast(tot)).agg(
        F.sum((-p * F.log(p)).cast("decimal(38,12)")).cast("double").alias("entropy_nats"),
        F.max("total").alias("total_tokens"),
    )
    zipf = text_zipf_fit(spark, sf_dir).select("zipf_slope")
    return (
        base.crossJoin(ent)
        .crossJoin(zipf)
        .select(
            "n_docs",
            "n_langs",
            "total_chars",
            "total_tokens",
            (
                (F.col("n_docs") - F.col("n_unique_texts")).cast("double") / F.col("n_docs")
            ).alias("exact_dup_rate"),
            "entropy_nats",
            "zipf_slope",
        )
    )


@query(
    "corpus_snapshot_diff",
    oracle=f"""
WITH a AS (
  SELECT doc_id, lang, md5(text) AS h FROM documents
), b AS (
  SELECT doc_id, lang,
         CASE WHEN {_o_bucket('doc_id', 100)} = 1 THEN md5(text || ' v2') ELSE md5(text) END AS h
  FROM documents
  WHERE {_o_bucket('doc_id', 100)} <> 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, lang, md5(text) AS h
  FROM documents WHERE {_o_bucket('doc_id', 100)} = 2
)
SELECT COALESCE(a.lang, b.lang) AS lang,
       CAST(SUM(CASE WHEN a.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN b.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL AND a.h <> b.h
                THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL AND a.h = b.h
                THEN 1 ELSE 0 END) AS BIGINT) AS n_same
FROM a FULL JOIN b ON a.doc_id = b.doc_id
GROUP BY COALESCE(a.lang, b.lang)
""",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot diff: old corpus vs a deterministic 'next crawl'
    (10% of docs dropped, 10% re-crawled with changed content, 10%
    arriving new) → per-language added/removed/changed/unchanged
    accounting — the report every recurring ingestion produces before
    downstream jobs decide what to reprocess.

    Content identity travels as md5 (32 bytes), never full text: the
    full-outer join carries (id, lang, hash) only, so diffing two
    100 TB snapshots shuffles GBs, not the corpora. Incremental
    reprocessing (run dedup/decon only on added∪changed) is the
    optimization this report unlocks.
    """
    d = load_table(spark, sf_dir, "documents")
    bkt = _bucket(F.col("doc_id"), 100)
    a = d.select("doc_id", "lang", F.md5("text").alias("h"))
    b_kept = d.where(bkt != 0).select(
        "doc_id",
        "lang",
        F.when(bkt == 1, F.md5(F.concat(F.col("text"), F.lit(" v2"))))
        .otherwise(F.md5("text"))
        .alias("h"),
    )
    b_new = d.where(bkt == 2).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "lang", F.md5("text").alias("h")
    )
    b = b_kept.unionByName(b_new)
    aj = a.select(
        F.col("doc_id").alias("a_id"), F.col("lang").alias("a_lang"), F.col("h").alias("a_h")
    )
    bj = b.select(
        F.col("doc_id").alias("b_id"), F.col("lang").alias("b_lang"), F.col("h").alias("b_h")
    )
    j = aj.join(bj, aj.a_id == bj.b_id, "full")
    return j.groupBy(F.coalesce("a_lang", "b_lang").alias("lang")).agg(
        F.sum(F.when(F.col("a_id").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("b_id").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(
            F.when(
                F.col("a_id").isNotNull()
                & F.col("b_id").isNotNull()
                & (F.col("a_h") != F.col("b_h")),
                1,
            ).otherwise(0)
        ).alias("n_changed"),
        F.sum(
            F.when(
                F.col("a_id").isNotNull()
                & F.col("b_id").isNotNull()
                & (F.col("a_h") == F.col("b_h")),
                1,
            ).otherwise(0)
        ).alias("n_same"),
    )


@query(
    "split_kfold",
    oracle=f"""
WITH folded AS (
  SELECT doc_id, lang, n_chars, {_o_bucket('doc_id', 5)} AS fold
  FROM documents
)
SELECT fold, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(DISTINCT lang) AS n_langs,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM folded GROUP BY fold
""",
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k=5) by content-stable hash —
    the cross-validation / sharded-eval split that must be REPRODUCIBLE
    across engines, runs, and cluster sizes (md5-derived bucket, no
    RNG, no row order dependence; the same discipline as
    split_train_test). Output is the per-fold balance report (doc
    count, char mass, language spread) a split is audited by; the
    assignment itself is the same _bucket(doc_id, 5) expression both
    engines compute. Pure map + 5-group partial agg at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    folded = d.select(
        "doc_id", "lang", "n_chars", _bucket(F.col("doc_id"), 5).alias("fold")
    )
    return folded.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# Target language mix for rebalancing, integer percents summing to 100.
# en is oversupplied in the corpus (~43%), so it gets downsampled; the
# scarce languages bound the achievable total.
_MIX_TARGET = {"en": 40, "zh": 20, "de": 15, "fr": 15, "es": 10}

_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_TARGET.items())


@query(
    "corpus_mix_rebalance",
    oracle=f"""
WITH tgt AS (
  SELECT * FROM (VALUES {_MIX_VALUES}) AS t(lang, w)
), counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), s AS (
  SELECT MIN((n * 100) // w) AS scale FROM counts JOIN tgt USING (lang)
), quota AS (
  SELECT tgt.lang, (s.scale * tgt.w) // 100 AS k FROM tgt, s
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r
  FROM documents
)
SELECT doc_id, lang FROM ranked JOIN quota USING (lang) WHERE r <= k
""",
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing rebalance: subsample each language to hit a target
    mix (en 40 / zh 20 / de 15 / fr 15 / es 10 %) at the largest total
    the scarcest language allows — the Pile/Dolma-style mixture-weight
    step between dedup and packing.

    The quota math is ALL integer (scale = min_l ⌊100·n_l/w_l⌋, then
    k_l = ⌊scale·w_l/100⌋), so both engines agree exactly — no float
    share ever computed. Selection inside a language is the md5
    hash-order top-k (the same deterministic "uniform" device as
    sample_fixed_per_stratum), a per-stratum window that Spark serves
    with partial TakeOrdered state, never a global sort. Two passes at
    scale: one partial-agg'd count per lang (broadcast back), one
    rank-filter — both shuffles carry compact state.
    """
    d = load_table(spark, sf_dir, "documents")
    tgt = spark.createDataFrame(
        [(k, v) for k, v in _MIX_TARGET.items()], "lang string, w int"
    )
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    s = (
        counts.join(tgt, "lang")
        .select(F.expr("(n * 100) div w").alias("cap"))
        .agg(F.min("cap").alias("scale"))
    )
    quota = tgt.crossJoin(F.broadcast(s)).select(
        "lang", F.expr("(scale * w) div 100").alias("k")
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("r", F.row_number().over(w_rank))
        .join(F.broadcast(quota), "lang")
        .where(F.col("r") <= F.col("k"))
        .select("doc_id", "lang")
    )


@query(
    "decon_exact_doc",
    oracle="""
WITH bench AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE source = 'src0'
), train AS (
  SELECT lang, md5(text) AS h FROM documents WHERE source <> 'src0'
)
SELECT t.lang,
       COUNT(*) AS n_train,
       CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS contamination_rate
FROM train t LEFT JOIN bench b ON b.h = t.h
GROUP BY t.lang
""",
)
def decon_exact_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-hash decontamination report: per language, how many train
    docs (source ≠ src0) are byte-identical to a benchmark doc (src0),
    by md5(text) match — the cheap first decon pass run before the
    n-gram overlap scan (decon_ngram_overlap catches paraphrase/subset
    leakage; this catches verbatim copies at hash-join cost).

    The benchmark hash set is distinct-compact and BROADCAST; the train
    side streams map-side past it (left join + conditional count) —
    at 100 TB the fact side never shuffles for the membership test,
    and the per-lang rollup is partial-agg'd. 32-byte identities,
    never full text, cross the wire.
    """
    d = load_table(spark, sf_dir, "documents")
    bench = (
        d.where(F.col("source") == "src0")
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = d.where(F.col("source") != "src0").select("lang", F.md5("text").alias("h"))
    joined = train.join(F.broadcast(bench), "h", "left")
    n_cont = F.sum(F.coalesce("_hit", F.lit(0)))
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_train"),
        n_cont.alias("n_contaminated"),
        F.round(n_cont.cast("double") / F.count(F.lit(1)), 6).alias("contamination_rate"),
    )


_EPOCH_CAP = 4  # max repetition epochs (the "don't repeat past ~4" rule)
_EPOCH_ALPHA = 0.5  # temperature exponent, mirrors corpus_temperature_weights


@query(
    "corpus_epoch_plan",
    oracle=f"""
WITH counts AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
), powered AS (
  SELECT lang, n_docs, n_chars,
         CAST(POW(n_chars, {_EPOCH_ALPHA}) AS DECIMAL(28,10)) AS w,
         SUM(CAST(POW(n_chars, {_EPOCH_ALPHA}) AS DECIMAL(28,10))) OVER () AS tot_w,
         SUM(n_chars) OVER () AS budget
  FROM counts
)
SELECT lang, n_docs, n_chars,
       ROUND(CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS sample_weight,
       CAST(FLOOR(budget * (CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE))) AS BIGINT) AS target_chars,
       CAST(LEAST({_EPOCH_CAP}, CAST(CEIL(
         FLOOR(budget * (CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE))) / n_chars
       ) AS BIGINT)) AS BIGINT) AS epochs,
       CAST(LEAST(
         CAST(FLOOR(budget * (CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE))) AS BIGINT),
         LEAST({_EPOCH_CAP}, CAST(CEIL(
           FLOOR(budget * (CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE))) / n_chars
         ) AS BIGINT)) * n_chars
       ) AS BIGINT) AS planned_chars
FROM powered
""",
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/repetition plan for a temperature-rebalanced mix: per
    language, how many epochs (repetitions, capped at 4) of its char
    mass the sampled corpus needs to hit its temperature-weighted
    target share of the total char budget — the concrete sampling plan
    a trainer executes (corpus_temperature_weights computes the mix;
    this key turns it into integer repetition counts + the planned
    char mass after the cap truncates unreachable targets).

    Numeric discipline: n^α is quantized to DECIMAL(28,10) before the
    normalizing sum (order-invariant), each ratio is one IEEE double
    division, and all downstream arithmetic is integer (floor/ceil/
    least on bigints) — no accumulated float anywhere. One partial-agg
    count shuffle to #langs cells; the share window runs over ≤#langs
    rows (metadata-sized).
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    powered = counts.select(
        "lang",
        "n_docs",
        "n_chars",
        F.pow("n_chars", F.lit(_EPOCH_ALPHA)).cast("decimal(28,10)").alias("w"),
    )
    tot_w = F.sum("w").over(Window.partitionBy()).cast("double")
    budget = F.sum("n_chars").over(Window.partitionBy())
    weight = F.col("w").cast("double") / tot_w
    target = F.floor(budget * weight).cast("long")
    epochs = F.least(
        F.lit(_EPOCH_CAP).cast("long"),
        F.ceil(target.cast("double") / F.col("n_chars")).cast("long"),
    )
    return powered.select(
        "lang",
        "n_docs",
        "n_chars",
        F.round(weight, 6).alias("sample_weight"),
        target.alias("target_chars"),
        epochs.alias("epochs"),
        F.least(target, epochs * F.col("n_chars")).cast("long").alias("planned_chars"),
    )


_WS_K = 64  # sample size
_WS_SALT = "#wsample"
_WS_DENOM = 4503599627370496.0  # 2^52 — 13 hex chars fit exactly in a double


@query(
    "sample_weighted_es",
    oracle=f"""
WITH k AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
         POW(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_WS_SALT}'), 1, 13))
                  AS BIGINT) / {_WS_DENOM},
             1.0 / n_chars) AS es_key
  FROM documents
)
SELECT doc_id, lang, weight, ROUND(es_key, 6) AS es_key
FROM k ORDER BY k.es_key DESC, doc_id ASC LIMIT {_WS_K}
""",
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement, deterministic: the
    Efraimidis-Spirakis one-pass scheme — each doc draws u from a hash
    (md5 fraction, the repo's reproducible-uniform discipline) and keeps
    key u^(1/w); the top-k keys ARE a weighted sample without
    replacement (P[doc first] = w_i/Σw). This is how a corpus mix
    up-weights high-quality documents (w = n_chars here as the quality
    stand-in) while staying reproducible across engines, cluster sizes,
    and reruns — rand()-based weighted sampling is none of those, and
    the hash-stratified keys (sample_hash_stratified) can only do
    UNWEIGHTED rates.

    Scale shape: the key is one codegen expression per row (md5 → 52-bit
    fraction → one pow); top-k is TakeOrdered (per-partition heaps, a
    k-row driver merge) — no sort, no shuffle of the corpus. At 100 TB
    this is the exact one-pass weighted reservoir, sharded for free.
    The emitted es_key is rounded to 6 dp; ordering uses the UNROUNDED
    key with a doc_id tiebreak (cross-engine pow noise is ~1e-16 —
    boundary flips would need two keys within an ulp).
    """
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_WS_SALT))), 1, 13), 16, 10).cast("double") / F.lit(_WS_DENOM)
    es_key = F.pow(u, 1.0 / F.col("n_chars"))
    return (
        d.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("weight"),
            es_key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), F.col("doc_id").asc())
        .limit(_WS_K)
        .select("doc_id", "lang", "weight", F.round("_k", 6).alias("es_key"))
    )
