#!/usr/bin/env python
"""win_sessionize same-scale A/B (VERDICT r9 task #1, swap landed r10):
the session_window single-merge formulation — REGISTERED as
win_sessionize since r10 — vs the legacy lag->running-sum double-window
chain (operators/windows.py:win_sessionize_double_window, kept
unregistered as the baseline and pinned hash-equal in test_wave19.py),
against DuckDB's two-window oracle, on the SAME staged x64/x256 dirs —
the same symmetric protocol as same_scale_ab.py (no table cache, one
warm pass, median-of-3, Spark to the noop sink).

Context: the legacy chain sat at 2.54x DuckDB at x256 (the only
genuinely data-path-bound key above the 2x criterion in r9); the
registered session_window plan replaces the event-row sort+two-window
pass with one PARTIALLY-AGGREGATING session merge (map-side fragment
combine before the shuffle) plus a row_number over per-SESSION rows
(measured 0.97x at x256, r10). Column pruning is NOT a candidate: the
legacy plan's ReadSchema is already struct<event_id,ts,user_id>
(checked r10), so there is nothing to narrow.

Usage: python scripts/sessionize_ab.py [--scales 64,256]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="64,256")
    args = ap.parse_args()

    from hadoop_job_analyzer_spark.registry import queries
    from hadoop_job_analyzer_spark.session import get_spark

    reg = queries()  # load modules in registry order before direct imports
    from hadoop_job_analyzer_spark.operators.windows import (
        SESSIONIZE_ORACLE,
        win_sessionize_bucket_chain,
        win_sessionize_double_window,
    )

    spark = get_spark("hja-sessionize-ab")
    variants = {
        # the legacy chain (registered through r9) vs the registered key
        # (session_window formulation since r10) vs the r11 bucket-chain
        # candidate (all-primitive hash agg, no event-level sort)
        "v0_double_window": win_sessionize_double_window,
        "v2_session_window": reg["win_sessionize"],
        "v3_bucket_chain": win_sessionize_bucket_chain,
    }

    results: dict[str, dict[str, dict]] = {}
    for k in (int(s) for s in args.scales.split(",")):
        sf_dir = f"{OUT}/x{k}"
        if not os.path.exists(f"{sf_dir}/_DONE"):
            raise SystemExit(f"{sf_dir} not staged; run scale_stress first")
        con = duckdb.connect()
        ev = f"{sf_dir}/events.parquet"
        src = f"{ev}/*.parquet" if os.path.isdir(ev) else ev
        con.execute(
            f"CREATE OR REPLACE VIEW events AS SELECT * FROM read_parquet('{src}')"
        )
        con.execute(SESSIONIZE_ORACLE).fetchall()  # warm
        dtimes = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(SESSIONIZE_ORACLE).fetchall()
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
        con.close()
        results[f"x{k}"] = rec
        print(f"x{k}: {rec}", flush=True)
    print(json.dumps({"metric": "sessionize_ab", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
