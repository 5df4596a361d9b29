#!/usr/bin/env python
"""Solo A/B of the BENCH_r07 in-suite delta keys (VERDICT r7 task #2).

Four keys moved 1.4-2.9x in the r6->r7 driver bench with zero plan-relevant
code change; the judge asked for one isolated session, min-of-2 warm each,
to convert "probably load" into a measurement. Protocol matches bench.py
exactly (same warm caches, same noop-sink timing, same construction-timing
rule for dedup_components_full), run SOLO with nothing else on the box.

Usage: python scripts/solo_ab_r8.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from hadoop_job_analyzer_spark.catalog import load_table
from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark

KEYS = [
    "text_fingerprint",
    "dedup_embedding",
    "dedup_components_full",
    "events_hourly",
]


def main() -> None:
    spark = get_spark("hja-solo-ab-r8")
    reg = queries()
    basket = {k: reg[k] for k in KEYS if k in reg}
    basket["events_hourly"] = bench.events_hourly

    for t in bench.CACHE_TABLES:
        load_table(spark, bench.SF_DIR, t).cache().count()
    bench.run_once(reg["agg_group_pricing"], spark)  # untimed scheduler warm

    out: dict[str, dict[str, float]] = {}
    for name in KEYS:
        fn = basket[name]
        inc = name in bench.CONSTRUCTION_TIMED
        runs = [bench.run_once(fn, spark, include_construction=inc) for _ in range(3)]
        out[name] = {
            "min2": round(min(runs[:2]), 4),
            "median3": round(sorted(runs)[1], 4),
            "runs": [round(r, 4) for r in runs],
        }
    print(json.dumps({"metric": "solo_ab_r8", "sf_dir": bench.SF_DIR, "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()
