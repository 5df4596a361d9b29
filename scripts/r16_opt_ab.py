#!/usr/bin/env python
"""r16 optimization A/B: r15 (HEAD-at-round-open) implementations vs the
r16 reshapes, interleaved in ONE session so box throttle hits both legs
equally (the same-session discipline of fingerprint_ab.py; the r16 box
ran the whole session with duckdb_control 1.4-2.2x its frozen baseline,
so solo before/after walls are not comparable).

The `before` legs are verbatim copies of the r15 operator bodies (from
the round-open tree, commit f3a08f9). Both legs run to the noop sink;
iterative keys time construction+execution (bench.py CONSTRUCTION_TIMED
rule). Protocol: one untimed warm pass per leg, then N alternating
timed rounds (default 3), median reported.

Usage: python scripts/r16_opt_ab.py [--sf-dir D] [--rounds N] [--keys k1,k2]
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

# ----------------------------------------------------------------- r15 legs
# Verbatim r15 bodies (round-open tree). Kept minimal: only what the leg
# needs, no @query registration (these are measurement twins, not keys).


def _r15_km_snap(c):
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(38,12)")


def r15_emb_kmeans_iterative(spark, sf_dir):
    _KM_K, _KM_ROUNDS = 8, 3
    e = load_table(spark, sf_dir, "embeddings")
    ex = (
        spread(e, "vec_id")
        .select("vec_id", F.posexplode("embedding").alias("pos", "xf"))
        .select("vec_id", (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x"))
        .persist()
    )
    vnorm = ex.groupBy("vec_id").agg(
        F.sum(_r15_km_snap(F.col("x") * F.col("x"))).cast("double").alias("vn2")
    ).persist()
    cents = ex.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cen_id"), "i", F.col("x").alias("c")
    )

    def assign(cents):
        cn = cents.groupBy("cen_id").agg(
            F.sum(_r15_km_snap(F.col("c") * F.col("c"))).cast("double").alias("cn2")
        )
        cos = (
            ex.join(F.broadcast(cents), "i")
            .groupBy("vec_id", "cen_id")
            .agg(F.sum(_r15_km_snap(F.col("x") * F.col("c"))).cast("double").alias("dot"))
            .join(vnorm, "vec_id")
            .join(F.broadcast(cn), "cen_id")
            .select(
                "vec_id",
                "cen_id",
                F.round(F.col("dot") / F.sqrt(F.col("vn2") * F.col("cn2")), 6).alias("cos"),
            )
        )
        return (
            cos.groupBy("vec_id")
            .agg(F.min(F.struct((-F.col("cos")).alias("nc"), F.col("cen_id"))).alias("m"))
            .select("vec_id", F.col("m.cen_id").alias("cen_id"), (-F.col("m.nc")).alias("cos"))
        )

    asg = None
    for rnd in range(_KM_ROUNDS):
        asg = assign(cents)
        if rnd < _KM_ROUNDS - 1:
            cents = (
                asg.join(ex, "vec_id")
                .groupBy("cen_id", "i")
                .agg((F.sum(_r15_km_snap("x")).cast("double") / F.count(F.lit(1))).alias("c"))
                .localCheckpoint(eager=True)
            )
        else:
            asg = asg.localCheckpoint(eager=True)
    ex.unpersist()
    vnorm.unpersist()
    return asg.select("vec_id", "cen_id", F.col("cos").alias("cosine"))


def r15_text_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    texts = d.groupBy(F.md5("text").alias("_tkey")).agg(
        F.first("text").alias("text")
    ).repartition(n)
    raw = texts.select(
        "_tkey",
        "text",
        F.explode(F.expr("sequence(1, length(text) - 7)")).alias("i"),
    ).select("_tkey", F.expr("md5(substr(text, i, 8))").alias("gram_md5"))
    pairs = spread(raw, "_tkey", "gram_md5").groupBy("_tkey", "gram_md5").agg(
        F.lit(1).alias("_one")
    )
    fp = pairs.groupBy("_tkey").agg(
        F.min("gram_md5").alias("fp_min"),
        F.max("gram_md5").alias("fp_max"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.conv(F.substring(F.min("gram_md5"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fingerprint64"),
    )
    return (
        d.select("doc_id", F.md5("text").alias("_tkey"))
        .join(fp, "_tkey")
        .select("doc_id", "fp_min", "fp_max", "n_distinct_grams", "fingerprint64")
    )


def r15_text_tfidf(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    tf = (
        spread(d, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    score = F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token").asc())
    out = (
        tf.join(df, "token")
        .select("doc_id", "token", score.alias("score"))
        .withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= 3)
    )
    return out


def r15_text_dup_gram_mass(spark, sf_dir):
    _DUPMASS_N = 5
    d = load_table(spark, sf_dir, "documents")
    toks = spread(d.select("doc_id", "lang", "text"), "doc_id").select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("t")
    )
    n = _DUPMASS_N
    idx = F.when(F.size("t") >= n, F.sequence(F.lit(1), F.size("t") - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(F.col("t"), i + j) for j in range(n)])
    )
    occ = toks.select("doc_id", "lang", F.explode(gram).alias("gram")).persist()
    df_counts = occ.groupBy("gram").agg(F.countDistinct("doc_id").alias("n_docs_gram"))
    per_doc = (
        occ.join(df_counts, "gram")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.sum(F.when(F.col("n_docs_gram") > 1, 1).otherwise(0)).alias("n_dup_occ"),
        )
    )
    out = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_occ").alias("total_gram_occ"),
        F.sum("n_dup_occ").alias("dup_gram_occ"),
        F.round(F.sum("n_dup_occ") / F.sum("n_occ").cast("double"), 6).alias("dup_mass"),
        F.sum(F.when(F.col("n_dup_occ") * 2 > F.col("n_occ"), 1).otherwise(0)).alias(
            "n_docs_majority_dup"
        ),
    )
    return out


def r15_dedup_components_full(spark, sf_dir):
    from hadoop_job_analyzer_spark.catalog import load_table as _lt
    from hadoop_job_analyzer_spark.operators.llm import dedup_near_minhash_full

    pairs = dedup_near_minhash_full(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .persist()
    )
    labels = (
        _lt(spark, sf_dir, "documents")
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
        if rnd >= 2:
            sck = stepped.localCheckpoint(eager=True)
            ptr = sck.select(
                F.col("doc_id").alias("c_id"), F.col("component").alias("c_comp")
            )
            jumped = sck.join(ptr, sck["component"] == ptr["c_id"], "left").select(
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


def r15_text_edit_distance_join(spark, sf_dir):
    from hadoop_job_analyzer_spark.operators.neardup import (
        _ED_BLOCK_CHARS,
        _ED_CAP,
        _ED_MAX_DIST,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", F.length("text").alias("n")
    )
    b = d.withColumn("bkt", F.floor(F.col("n") / _ED_BLOCK_CHARS).cast("long"))
    w = Window.partitionBy("lang", "bkt").orderBy("doc_id")
    capped = (
        b.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= _ED_CAP).drop("rn")
    )  # r15: NOT persisted — both join legs replay the window subtree
    left = capped.select(
        "lang",
        F.col("bkt").alias("bkt_a"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("pbkt"),
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.col("n").alias("n_a"),
    )
    right = capped.select(
        "lang", F.col("bkt").alias("pbkt"), F.col("doc_id").alias("id_b"),
        F.col("text").alias("text_b"), F.col("n").alias("n_b"),
    )
    pairs = left.join(right, ["lang", "pbkt"]).where(
        (F.col("pbkt") > F.col("bkt_a")) | (F.col("id_a") < F.col("id_b"))
    )
    dist = F.levenshtein("text_a", "text_b", _ED_MAX_DIST)
    return (
        pairs.withColumn("edit_dist", dist.cast("long"))
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _ED_MAX_DIST))
        .select(
            "lang",
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "edit_dist",
            F.round(
                1.0 - F.col("edit_dist").cast("double") / F.greatest("n_a", "n_b").cast("double"),
                6,
            ).alias("edit_sim"),
        )
    )


def _r15_rare_index(spark, sf_dir):
    from hadoop_job_analyzer_spark.operators.llm import _shingles
    from hadoop_job_analyzer_spark.operators.neardup import _JACCARD_MAX_DF

    return (
        _shingles(load_table(spark, sf_dir, "documents"))
        .distinct()
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h"),
        )
        .withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .where(F.col("_df") <= _JACCARD_MAX_DF)
        .drop("_df")
        .persist()
    )


def r15_dedup_ngram_jaccard(spark, sf_dir):
    from hadoop_job_analyzer_spark.operators.neardup import _JACCARD_MIN

    rsh = _r15_rare_index(spark, sf_dir)
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
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= _JACCARD_MIN)
        .select("doc_a", "doc_b", "n_inter", F.round(jac, 6).alias("jaccard"))
    )


BEFORE = {
    "emb_kmeans_iterative": r15_emb_kmeans_iterative,
    "text_fingerprint": r15_text_fingerprint,
    "text_tfidf": r15_text_tfidf,
    "text_dup_gram_mass": r15_text_dup_gram_mass,
    "dedup_components_full": r15_dedup_components_full,
    "text_edit_distance_join": r15_text_edit_distance_join,
    "dedup_ngram_jaccard": r15_dedup_ngram_jaccard,
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--keys", default=",".join(BEFORE))
    args = ap.parse_args()

    spark = get_spark("hja-r16-opt-ab")
    reg = queries()
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    rec: dict = {"sf_dir": args.sf_dir, "rounds": args.rounds, "keys": {}}
    for k in keys:
        inc = k in CONSTRUCTION_TIMED
        legs = {"before": BEFORE[k], "after": reg[k]}
        # one untimed warm pass per leg (page cache, codegen JIT)
        for fn in legs.values():
            run_once(fn, spark, args.sf_dir, inc)
        walls: dict[str, list[float]] = {"before": [], "after": []}
        for _ in range(args.rounds):
            for leg, fn in legs.items():
                walls[leg].append(run_once(fn, spark, args.sf_dir, inc))
        b = statistics.median(walls["before"])
        a = statistics.median(walls["after"])
        rec["keys"][k] = {
            "before_median": round(b, 4),
            "after_median": round(a, 4),
            "speedup": round(b / a, 2) if a > 0 else None,
            "before_runs": [round(x, 4) for x in walls["before"]],
            "after_runs": [round(x, 4) for x in walls["after"]],
        }
        print(f"# {k}: before {b:.3f}s after {a:.3f}s ({b / a:.2f}x)", file=sys.stderr)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
