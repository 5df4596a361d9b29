#!/usr/bin/env python
"""Settle dedup_containment (VERDICT r16 #5): a NON-degenerate at-scale
A/B of the r16 shared in-row rare-shingle index vs the r15 string-keyed
distinct-agg index, on this key specifically.

Why a dedicated staging: scale_stress duplication copies documents
verbatim, so every shingle's df multiplies by the inflation factor and
the df≤5 rarity filter empties the index — the ×64 A/B was degenerate
for the jaccard/containment family (scale_stress.py:165, VERDICT r16).
Here each copy k suffixes EVERY token with `_k`, so copies occupy
disjoint shingle spaces: the per-copy df distribution (hence the rarity
filter's selectivity and the self-join fan-out) is preserved exactly
while document volume scales ×K — the corpus behaves like K independent
sf0.1 corpora in one table, which is precisely the non-degenerate
inflation the judge asked for.

Usage: python scripts/r17_containment_ab.py [--k 16] [--rounds 3]
Writes JSON to stdout — redirect to verification/.
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

from hadoop_job_analyzer_spark.catalog import load_table, table_path
from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/hja_scale"


def stage(spark, k: int) -> str:
    out_dir = f"{OUT}/saltdoc_x{k}"
    if os.path.exists(f"{out_dir}/_DONE"):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    raw = spark.read.parquet(table_path(SRC, "documents"))
    off = raw.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(k):
        salted = (
            raw.withColumn("doc_id", F.col("doc_id") + F.lit(i * off))
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"_{i}")),
                    ),
                ),
            )
        )
        parts.append(salted)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    open(f"{out_dir}/_DONE", "w").close()
    return out_dir


# --- r15 leg: string-keyed distinct-agg index (verbatim r15 shape) ----


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


def r15_dedup_containment(spark, sf_dir):
    from hadoop_job_analyzer_spark.operators.neardup import _CONTAIN_MIN

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
    cont = F.col("n_inter").cast("double") / F.least(F.col("na"), F.col("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(cont >= _CONTAIN_MIN)
        .select("doc_a", "doc_b", "n_inter", F.round(cont, 6).alias("containment"))
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("r17-containment-ab")
    sf_dir = stage(spark, args.k)
    d = load_table(spark, sf_dir, "documents").cache()
    n_docs = d.count()

    # non-degeneracy probe: the rarity filter must KEEP rows at scale
    from hadoop_job_analyzer_spark.operators.neardup import _rare_shingle_index

    idx_rows = _rare_shingle_index(spark, sf_dir).count()

    after_fn = queries()["dedup_containment"]
    pairs_after = after_fn(spark, sf_dir).count()

    bt, at = [], []
    noop(r15_dedup_containment(spark, sf_dir))
    noop(after_fn(spark, sf_dir))
    for r in range(args.rounds):
        spark.sparkContext.setJobDescription(f"cont-ab:r{r}:before")
        t0 = time.perf_counter()
        noop(r15_dedup_containment(spark, sf_dir))
        bt.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"cont-ab:r{r}:after")
        t0 = time.perf_counter()
        noop(after_fn(spark, sf_dir))
        at.append(time.perf_counter() - t0)
    b, a = statistics.median(bt), statistics.median(at)
    print(
        json.dumps(
            {
                "staging": sf_dir,
                "k": args.k,
                "n_docs": n_docs,
                "rare_index_rows": idx_rows,
                "containment_pairs": pairs_after,
                "before_runs": [round(x, 4) for x in bt],
                "after_runs": [round(x, 4) for x in at],
                "before_median": round(b, 4),
                "after_median": round(a, 4),
                "speedup_r16_index_vs_r15": round(b / a, 3) if a else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
