#!/usr/bin/env python
"""Core-scaling evidence at a usable SF (VERDICT r16 #9): the driver's
8-vs-32-core block at sf0.1 is floor-bound (23/45 keys ran as fast or
faster on 8 cores), so parallelism evidence must come from the ×64
staging. This times the heaviest keys on the ×64 inflation at the
CURRENT core count — run it twice, SPARK_GRAFT_CPUS=32 then =8, and
compare records (one process per core count: master is local[$CPUS]).

The jaccard/containment family is degenerate at plain ×64 (duplication
pushes every shingle past the df≤5 filter); those two keys run on the
token-salted saltdoc_x16 staging instead (r17_containment_ab.stage).

Usage: SPARK_GRAFT_CPUS=8 python scripts/r17_core_scaling.py
Writes one JSON line to stdout — redirect to verification/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark

X64 = "/tmp/hja_scale/x64"

KEYS_X64 = [
    "dedup_components_full",
    "emb_kmeans_iterative",
    "agg_session_bounce_rate",
    "dedup_near_minhash_full",
    "decon_near_minhash",
    "text_dup_gram_mass",
    "corpus_pipeline_e2e",
    "text_edit_distance_join",
    "text_fingerprint",
]
# dedup_simhash is quadratic under verbatim duplication (identical docs
# share simhashes and its 8-bit bands carry NO bucket cap — the same
# reason scale_stress excludes it), so it runs on the token-salted
# staging with the jaccard family instead.
KEYS_SALT = ["dedup_ngram_jaccard", "dedup_containment", "dedup_simhash"]

CONSTRUCTION_TIMED = {
    "dedup_components_full",
    "emb_kmeans_iterative",
    "agg_session_bounce_rate",
}


def run_once(fn, spark, sf_dir, inc):
    if inc:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())))
    spark = get_spark("r17-core-scaling")
    from scripts.r17_containment_ab import stage  # noqa: E402

    salt_dir = stage(spark, 16)
    reg = queries()
    for t in ("documents", "embeddings", "events"):
        try:
            load_table(spark, X64, t).cache().count()
        except Exception:
            pass
    out = {"cpus": cpus, "x64_dir": X64, "salt_dir": salt_dir, "queries": {}}
    for key, sf_dir in [(k, X64) for k in KEYS_X64] + [(k, salt_dir) for k in KEYS_SALT]:
        fn = reg[key]
        inc = key in CONSTRUCTION_TIMED
        spark.sparkContext.setJobDescription(f"scal:{key}")
        runs = [run_once(fn, spark, sf_dir, inc) for _ in range(3)]
        out["queries"][key] = round(min(runs[:2]), 4)
        print(f"[scal c{cpus}] {key}: {out['queries'][key]}s {[round(r,3) for r in runs]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
