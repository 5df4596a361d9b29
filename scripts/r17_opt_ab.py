#!/usr/bin/env python
"""r17 optimization A/B: r16 (HEAD-at-round-open, commit dba7e69)
implementations vs the r17 reshapes, interleaved in ONE session so box
throttle hits both legs equally (the r16 protocol — the r17 round-open
anchor read duckdb_control 1.78x its frozen baseline, so solo walls are
not comparable; same-session ratios are).

The `before` legs are verbatim copies of the r16 operator bodies (from
the round-open tree). Both legs run to the noop sink; iterative keys
time construction+execution (bench.py CONSTRUCTION_TIMED rule).
Protocol: one untimed warm pass per leg, then N alternating timed
rounds (default 3), median reported.

Usage: python scripts/r17_opt_ab.py [--sf-dir D] [--rounds N] [--keys k1,k2]
Writes JSON to stdout (one line) — redirect to verification/.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.operators._common import spread
from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark

# ----------------------------------------------------------------- r16 legs
# Verbatim r16 bodies (round-open tree). Kept minimal: only what the leg
# needs, no @query registration (these are measurement twins, not keys).

_KM_K, _KM_ROUNDS = 8, 3
_N_HASHES, _BAND_ROWS, _BUCKET_CAP = 16, 2, 64
_JACCARD_MAX_DF = 5
_CONTAIN_MIN = 0.6


def _r16_km_snap(c):
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(38,12)")


def _r16_km_sum_snap(arr):
    return F.aggregate(
        arr,
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, t: (acc + t).cast("decimal(30,12)"),
    ).cast("double")


def _r16_km_dot(a, b):
    return _r16_km_sum_snap(F.zip_with(a, b, lambda x, y: (x * y).cast("decimal(25,12)")))


def _r16_km_onerow(per_cent):
    with_n = per_cent.withColumn(
        "cn2", _r16_km_sum_snap(F.transform("cvec", lambda c: (c * c).cast("decimal(25,12)")))
    )
    return with_n.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("cen_id", "cvec", "cn2"))).alias("cb")
    )


def _r16_km_inputs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    vecs = (
        spread(e, "vec_id")
        .select("vec_id", v.alias("_v"))
        .withColumn(
            "_vn2",
            _r16_km_sum_snap(F.transform("_v", lambda x: (x * x).cast("decimal(25,12)"))),
        )
        .persist()
    )
    cb0 = _r16_km_onerow(
        vecs.where(F.col("vec_id") < _KM_K).select(
            F.col("vec_id").alias("cen_id"), F.col("_v").alias("cvec")
        )
    )
    return vecs, cb0


def _r16_km_assign(vecs, cb):
    best = F.array_min(
        F.transform(
            "cb",
            lambda c: F.struct(
                (
                    -F.round(
                        _r16_km_dot(F.col("_v"), c["cvec"]) / F.sqrt(F.col("_vn2") * c["cn2"]),
                        6,
                    )
                ).alias("nc"),
                c["cen_id"].alias("cen_id"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(cb))
        .withColumn("_best", best)
        .select(
            "vec_id",
            "_v",
            F.col("_best.cen_id").alias("cen_id"),
            (-F.col("_best.nc")).alias("cos"),
        )
    )


def _r16_km_recenter(asg):
    per_cent = (
        asg.select("cen_id", F.posexplode("_v").alias("_p", "x"))
        .groupBy("cen_id", "_p")
        .agg((F.sum(_r16_km_snap("x")).cast("double") / F.count(F.lit(1))).alias("c"))
        .groupBy("cen_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )
    )
    return _r16_km_onerow(per_cent)


def r16_emb_kmeans_iterative(spark, sf_dir):
    vecs, cb = _r16_km_inputs(spark, sf_dir)
    asg = None
    for rnd in range(_KM_ROUNDS):
        asg = _r16_km_assign(vecs, cb)
        if rnd < _KM_ROUNDS - 1:
            cb = _r16_km_recenter(asg).localCheckpoint(eager=True)
        else:
            asg = asg.localCheckpoint(eager=True)
    vecs.unpersist()
    return asg.select("vec_id", "cen_id", F.col("cos").alias("cosine"))


def r16_text_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    texts = d.groupBy(F.md5("text").alias("_tkey")).agg(
        F.first("text").alias("text")
    ).repartition(n)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - 7),
        lambda i: F.md5(F.col("text").substr(i, F.lit(8))),
    )
    fp = texts.select(
        "_tkey",
        grams.alias("_g"),
    ).select(
        "_tkey",
        F.array_min("_g").alias("fp_min"),
        F.array_max("_g").alias("fp_max"),
        F.size(F.array_distinct("_g")).cast("bigint").alias("n_distinct_grams"),
        F.conv(F.substring(F.array_min("_g"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fingerprint64"),
    )
    return (
        d.select("doc_id", F.md5("text").alias("_tkey"))
        .join(fp, "_tkey")
        .select("doc_id", "fp_min", "fp_max", "n_distinct_grams", "fingerprint64")
    )


_RATES = {"en": 25, "de": 50, "es": 50, "fr": 50, "zh": 75}
_DEFAULT_RATE = 100
_DECON_N = 5


def _r16_bucket(col, mod):
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return h % mod


def _r16_grams(d, n):
    toks = spread(d, "doc_id").select("doc_id", F.split(F.col("text"), " ").alias("t"))
    idx = F.when(F.size("t") >= n, F.sequence(F.lit(1), F.size("t") - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("t"), i + j) for j in range(n)]),
    )
    return toks.select("doc_id", F.explode(F.array_distinct(gram)).alias("gram"))


def r16_corpus_pipeline_e2e(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    base = d.withColumn("n_tokens", F.size(F.split("text", " ")))
    q = base.where(F.col("n_chars").between(50, 2000) & (F.col("n_tokens") >= 10))
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(_DEFAULT_RATE),
    )
    mixed = q.where(_r16_bucket(F.col("doc_id"), 100) < rate)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dd = (
        mixed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    bench = (
        _r16_grams(d.where(F.col("source") == "src0").select("doc_id", "text"), _DECON_N)
        .select("gram")
        .distinct()
    )
    train = dd.where(F.col("source") != "src0")
    tg = _r16_grams(train.select("doc_id", "text"), _DECON_N).persist()
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
    b = _r16_bucket(F.col("doc_id"), 100)
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


def _r16_rare_shingle_index(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    idx = F.when(F.size("t") >= 3, F.sequence(F.lit(1), F.size("t") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    hs = F.transform(
        F.array_distinct(sh),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    return (
        toks.select("doc_id", F.explode(hs).alias("h"))
        .withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .where(F.col("_df") <= _JACCARD_MAX_DF)
        .drop("_df")
        .persist()
    )


def r16_dedup_containment(spark, sf_dir):
    rsh = _r16_rare_shingle_index(spark, sf_dir)
    sizes = rsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = rsh.select(F.col("doc_id").alias("doc_a"), "h")
    b = rsh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        a.join(b, ["h"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont = F.col("n_inter").cast("double") / F.least(F.col("na"), F.col("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(cont >= _CONTAIN_MIN)
        .select("doc_a", "doc_b", "n_inter", F.round(cont, 6).alias("containment"))
    )


def _r16_shingles(d):
    toks = spread(d, "doc_id").select("doc_id", F.split(F.col("text"), " ").alias("t"))
    idx = F.when(F.size("t") >= 3, F.sequence(F.lit(1), F.size("t") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    return toks.select("doc_id", F.explode(sh).alias("shingle"))


def _r16_minhash_sigs(shingles):
    return shingles.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(s))))).alias(f"mh{s}")
            for s in range(_N_HASHES)
        ]
    )


def _r16_band_rows(minhash):
    band_sigs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{s}") for s in range(b * _BAND_ROWS, (b + 1) * _BAND_ROWS)]
                )
            ).alias("sig"),
        )
        for b in range(_N_HASHES // _BAND_ROWS)
    ]
    return minhash.select("doc_id", F.explode(F.array(*band_sigs)).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("band_sig")
    )


def _r16_lsh_pairs(minhash):
    bands = _r16_band_rows(minhash)
    cap_w = Window.partitionBy("band", "band_sig").orderBy("doc_id")
    bands = (
        bands.withColumn("_rn", F.row_number().over(cap_w))
        .where(F.col("_rn") <= _BUCKET_CAP)
        .drop("_rn")
        .persist()
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("band").alias("band_a"), F.col("band_sig").alias("sig_a")
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("band_sig").alias("sig_b")
    )
    return (
        a.join(b, (a.band_a == b.band_b) & (a.sig_a == b.sig_b) & (a.doc_a < b.doc_b))
        .select("doc_a", "doc_b")
        .distinct()
    )


def r16_dedup_near_minhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return _r16_lsh_pairs(_r16_minhash_sigs(_r16_shingles(d)))


def r16_dedup_near_minhash_full(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bands = _r16_band_rows(_r16_minhash_sigs(_r16_shingles(d))).persist()
    bw = Window.partitionBy("band", "band_sig").orderBy("doc_id")
    capped = (
        bands.withColumn("_rn", F.row_number().over(bw))
        .where(F.col("_rn") <= _BUCKET_CAP)
        .drop("_rn")
    )
    a = capped.select(
        F.col("doc_id").alias("doc_a"), F.col("band").alias("band_a"), F.col("band_sig").alias("sig_a")
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("band_sig").alias("sig_b")
    )
    cpairs = a.join(
        b, (a.band_a == b.band_b) & (a.sig_a == b.sig_b) & (a.doc_a < b.doc_b)
    ).select("doc_a", "doc_b")
    rep = (
        bands.withColumn("_min", F.min("doc_id").over(Window.partitionBy("band", "band_sig")))
        .where(F.col("doc_id") > F.col("_min"))
        .select(F.col("_min").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return cpairs.unionByName(rep).distinct()


def _r16_min_label_components(spark, sf_dir, pairs):
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .persist()
    )
    labels = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("doc_id").alias("component"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(20):
        nbr = (
            edges.join(labels, edges["a"] == labels["doc_id"])
            .select(F.col("b").alias("doc_id"), "component")
            .groupBy("doc_id")
            .agg(F.min("component").alias("nbr_comp"))
        )
        stepped = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
            ).alias("component"),
        )
        if rnd >= 1:
            ptr = labels.select(
                F.col("doc_id").alias("c_id"), F.col("component").alias("c_comp")
            )
            jumped = stepped.join(
                ptr, stepped["component"] == ptr["c_id"], "left"
            ).select(
                "doc_id",
                "_old",
                F.coalesce(F.col("c_comp"), F.col("component")).alias("component"),
            )
            checkpointed = jumped.localCheckpoint(eager=True)
        else:
            checkpointed = stepped.localCheckpoint(eager=True)
        changed = checkpointed.where(F.col("component") < F.col("_old")).count()
        labels = checkpointed.drop("_old")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        "doc_id",
        "component",
        F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0).alias("is_keeper"),
    )


def r16_dedup_components_full(spark, sf_dir):
    pairs = r16_dedup_near_minhash_full(spark, sf_dir)
    return _r16_min_label_components(spark, sf_dir, pairs)


BEFORE = {
    "emb_kmeans_iterative": r16_emb_kmeans_iterative,
    "text_fingerprint": r16_text_fingerprint,
    "corpus_pipeline_e2e": r16_corpus_pipeline_e2e,
    "dedup_containment": r16_dedup_containment,
    "dedup_near_minhash": r16_dedup_near_minhash,
    "dedup_near_minhash_full": r16_dedup_near_minhash_full,
    "dedup_components_full": r16_dedup_components_full,
}

# keys whose construction runs eager jobs: time construction + execution
CONSTRUCTION_TIMED = {"emb_kmeans_iterative", "dedup_components_full"}


def run_once(fn, spark, sf_dir, include_construction):
    if include_construction:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    keys = list(BEFORE) if not args.keys else args.keys.split(",")
    spark = get_spark("hja-r17-opt-ab")
    reg = queries()
    # warm base tables like bench.py does
    for t in ("documents", "embeddings"):
        try:
            load_table(spark, args.sf_dir, t).cache().count()
        except Exception:
            pass

    out = {"sf_dir": args.sf_dir, "rounds": args.rounds, "keys": {}}
    for k in keys:
        inc = k in CONSTRUCTION_TIMED
        before_fn, after_fn = BEFORE[k], reg[k]
        spark.sparkContext.setJobDescription(f"warm:{k}")
        run_once(before_fn, spark, args.sf_dir, inc)
        run_once(after_fn, spark, args.sf_dir, inc)
        bt, at = [], []
        for r in range(args.rounds):
            spark.sparkContext.setJobDescription(f"ab:{k}:round{r}:before")
            bt.append(run_once(before_fn, spark, args.sf_dir, inc))
            spark.sparkContext.setJobDescription(f"ab:{k}:round{r}:after")
            at.append(run_once(after_fn, spark, args.sf_dir, inc))
        b, a = statistics.median(bt), statistics.median(at)
        out["keys"][k] = {
            "before_runs": [round(x, 4) for x in bt],
            "after_runs": [round(x, 4) for x in at],
            "before_median": round(b, 4),
            "after_median": round(a, 4),
            "speedup": round(b / a, 3) if a > 0 else None,
        }
        print(f"[ab] {k}: before={b:.3f}s after={a:.3f}s speedup={b/a:.2f}x", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
