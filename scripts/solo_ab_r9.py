#!/usr/bin/env python
"""Solo A/B of the two BENCH_r08 deltas the r8 basket missed (VERDICT r8 #1).

`emb_pca_top_component` (0.35 -> 1.42 s, 4.1x) and `emb_kmeans_iterative`
(2.07 -> 5.05 s, 2.4x) regressed in the r8 driver bench on untouched code
and were not in scripts/solo_ab_r8.py's basket. The judge's own solo probe
cleared pca as load but measured kmeans at 3.7-3.8 s warm vs its documented
r7 band of 1.76-2.07 s. This probe extends the protocol the way
dedup_components_full was adjudicated in r8: SIX warm runs per key (not
min-of-2) so a deep-warm plateau is visible as a descending-then-flat run
sequence rather than folded into a single min.

Protocol matches bench.py exactly: same cached tables, same construction
timing (both keys are in bench.CONSTRUCTION_TIMED — their driver-looped
rounds run eagerly inside fn()), same noop sink. Run SOLO with nothing
else on the box.

Usage: python scripts/solo_ab_r9.py   (prints one JSON line)
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
    "emb_pca_top_component",
    "emb_kmeans_iterative",
]
RUNS = 6


def main() -> None:
    spark = get_spark("hja-solo-ab-r9")
    reg = queries()

    for t in bench.CACHE_TABLES:
        load_table(spark, bench.SF_DIR, t).cache().count()
    bench.run_once(reg["agg_group_pricing"], spark)  # untimed scheduler warm

    out: dict[str, dict[str, object]] = {}
    for name in KEYS:
        fn = reg[name]
        inc = name in bench.CONSTRUCTION_TIMED
        runs = [
            bench.run_once(fn, spark, include_construction=inc) for _ in range(RUNS)
        ]
        out[name] = {
            "min2": round(min(runs[:2]), 4),
            "median3": round(sorted(runs[:3])[1], 4),
            "plateau_min": round(min(runs), 4),
            "runs": [round(r, 4) for r in runs],
        }
    print(json.dumps({"metric": "solo_ab_r9", "sf_dir": bench.SF_DIR, "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()
