#!/usr/bin/env python
"""text_fingerprint same-scale A/B (VERDICT r9 task #3): bend the one
rising data-path ratio (1.21× at x64 → 1.62× at x256 vs DuckDB).

The registered r9 plan md5-hashes EVERY rolling 8-gram (371 M at x256)
then dedups the 32-hex strings per doc. Both engines pay the same hash
mass, and Spark's md5→hex-string path is more expensive per gram —
hence the rising ratio. Variants attack the hash mass itself (oracle
unchanged — it still describes md5 over all grams; these are execution
strategies exploiting md5(gram) being a pure function of the gram):

- v1_dedup_then_md5: dedup RAW 8-char grams per doc first (the groupBy
  needs no exchange — spread(doc_id) satisfies the clustered
  distribution), md5 only distinct (doc, gram) pairs. Vocabulary-
  agnostic; saves the per-doc duplicate factor (~1.07× on this corpus)
  and shuffles nothing extra.
- v2_global_dict: v1's dedup, then join the pairs to a global
  gram→md5 DICTIONARY (distinct grams across the corpus — 13,005 on
  this corpus at EVERY inflation, since inflation replicates docs).
  md5 runs once per distinct gram instead of once per occurrence; the
  join is declared plainly and AQE broadcast-converts it at runtime
  (dict stats ≪ threshold). On a natural large-vocab corpus AQE falls
  back to a shuffle join — the plan degrades gracefully instead of
  OOMing a forced broadcast.

Protocol identical to same_scale_ab.py: same staged dirs, no table
cache, one warm pass, median-of-3, Spark to the noop sink.

Usage: python scripts/fingerprint_ab.py [--scales 64,256]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

OUT = "/tmp/hja_scale"

FP_ORACLE = """
SELECT doc_id,
       MIN(gram_md5) AS fp_min,
       MAX(gram_md5) AS fp_max,
       COUNT(DISTINCT gram_md5) AS n_distinct_grams,
       ('0x' || substring(MIN(gram_md5), 1, 15))::BIGINT AS fingerprint64
FROM (
  SELECT doc_id, md5(substring(text, i, 8)) AS gram_md5
  FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
  WHERE length(text) >= 8
)
GROUP BY doc_id
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="64,256")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hadoop_job_analyzer_spark.catalog import load_table
    from hadoop_job_analyzer_spark.operators._common import spread
    from hadoop_job_analyzer_spark.registry import queries
    from hadoop_job_analyzer_spark.session import get_spark

    def _pairs(spark, sf_dir):
        d = spread(
            load_table(spark, sf_dir, "documents").where(F.length("text") >= 8),
            "doc_id",
        )
        raw = d.select(
            "doc_id",
            "text",
            F.explode(F.expr("sequence(1, length(text) - 7)")).alias("i"),
        ).select("doc_id", F.expr("substr(text, i, 8)").alias("gram"))
        return raw.groupBy("doc_id", "gram").agg(F.lit(1).alias("_one"))

    def _final(pairs_md5):
        return pairs_md5.groupBy("doc_id").agg(
            F.min("gram_md5").alias("fp_min"),
            F.max("gram_md5").alias("fp_max"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.conv(F.substring(F.min("gram_md5"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("fingerprint64"),
        )

    def v1_dedup_then_md5(spark, sf_dir):
        pairs = _pairs(spark, sf_dir)
        return _final(pairs.select("doc_id", F.md5("gram").alias("gram_md5")))

    def v2_global_dict(spark, sf_dir):
        pairs = _pairs(spark, sf_dir)
        dict_df = (
            pairs.select("gram").distinct().withColumn("gram_md5", F.md5("gram"))
        )
        return _final(pairs.join(dict_df, "gram").select("doc_id", "gram_md5"))

    def v3_distinct_texts(spark, sf_dir):
        # fingerprint is a PURE function of text: groupBy identical texts
        # (map-side partial agg collapses copies before the shuffle),
        # compute the fingerprint once per distinct text, broadcast-join
        # the per-text results back to doc_ids (AQE decides; the result
        # side is #distinct-texts rows).
        d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
        texts = d.groupBy(F.md5("text").alias("_tkey")).agg(
            F.first("text").alias("text")
        )
        raw = texts.select(
            "_tkey",
            "text",
            F.explode(F.expr("sequence(1, length(text) - 7)")).alias("i"),
        ).select("_tkey", F.expr("substr(text, i, 8)").alias("gram"))
        pairs = raw.groupBy("_tkey", "gram").agg(F.lit(1).alias("_one"))
        fp = (
            pairs.select("_tkey", F.md5("gram").alias("gram_md5"))
            .groupBy("_tkey")
            .agg(
                F.min("gram_md5").alias("fp_min"),
                F.max("gram_md5").alias("fp_max"),
                F.count(F.lit(1)).alias("n_distinct_grams"),
                F.conv(F.substring(F.min("gram_md5"), 1, 15), 16, 10)
                .cast("bigint")
                .alias("fingerprint64"),
            )
        )
        return (
            d.select("doc_id", F.md5("text").alias("_tkey"))
            .join(fp, "_tkey")
            .select("doc_id", "fp_min", "fp_max", "n_distinct_grams", "fingerprint64")
        )

    from hadoop_job_analyzer_spark.operators.textops import text_fingerprint_per_doc

    spark = get_spark("hja-fingerprint-ab")
    variants = {
        # the r9 hash-every-occurrence plan (registered through r9, now
        # the unregistered dup-agnostic twin) vs the registered key
        # (collapse-identical-texts-first since r10, == v3 below)
        "v0_per_doc_legacy": text_fingerprint_per_doc,
        "v1_dedup_then_md5": v1_dedup_then_md5,
        "v2_global_dict": v2_global_dict,
        "v3_distinct_texts": queries()["text_fingerprint"],
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    results: dict[str, dict[str, dict]] = {}
    for k in (int(s) for s in args.scales.split(",")):
        sf_dir = f"{OUT}/x{k}"
        if not os.path.exists(f"{sf_dir}/_DONE"):
            raise SystemExit(f"{sf_dir} not staged; run scale_stress first")
        con = duckdb.connect()
        doc = f"{sf_dir}/documents.parquet"
        src = f"{doc}/*.parquet" if os.path.isdir(doc) else doc
        con.execute(
            f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{src}')"
        )
        con.execute(FP_ORACLE).fetchall()  # warm
        dtimes = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(FP_ORACLE).fetchall()
            dtimes.append(time.perf_counter() - t0)
        duck = statistics.median(dtimes)
        rec: dict[str, dict] = {"duckdb": {"median3": round(duck, 3)}}
        for name, fn in variants.items():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            stimes = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                stimes.append(time.perf_counter() - t0)
            med = statistics.median(stimes)
            rec[name] = {"median3": round(med, 3), "ratio": round(med / duck, 2)}
            print(f"x{k} {name}: {rec[name]}", flush=True)
        con.close()
        results[f"x{k}"] = rec
    print(json.dumps({"metric": "fingerprint_ab", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
