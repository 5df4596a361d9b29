#!/usr/bin/env python
"""Dump `explain("formatted")` for named registry keys to plans/<tag>/.

The optimization rounds' evidence contract: for every query touched in
round N, commit `plans/rN/<key>_before.txt` and `..._after.txt` so the
judge can check plan claims (Exchange counts, join strategies, pushed
filters) without running Spark.

Usage:
    python scripts/dump_plans.py <tag> <suffix> [key ...]
e.g.
    python scripts/dump_plans.py r16 before emb_kmeans_iterative text_fingerprint

With no keys, dumps every bench HEADLINE key (+ events_hourly).
Construction-eager keys (iterative loops) execute their rounds during
construction; their dumps show the FINAL returned frame's plan, which is
the part the noop sink executes — the per-round subtrees are asserted by
tests/test_plans.py instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("hja-dump-plans")
    reg = queries()
    for k in keys:
        df = reg[k](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {k} @ {SF_DIR} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
