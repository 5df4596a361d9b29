#!/usr/bin/env python
"""Bounded-dedup eviction dial (VERDICT r9 task #4): sweep the
dropDuplicatesWithinWatermark horizon at usershift x64/x256 and record
wall + retained state + eviction counts, next to the UNBOUNDED
stream_dedup baseline — answering "where does bounded state start
paying for itself?".

Protocol: the same single-batch availableNow drain as every Axis
measurement in this repo (stream_scale.py) — the watermark starts at 0
so no input is ever late-dropped and the twin stays hash-equal to the
unbounded key; eviction happens at batch COMMIT with the final
watermark, which is exactly where the r9 A/B located the bounded twin's
45.5 s vs 29.9 s premium. State store: whatever get_spark pins —
RocksDB since r10 (session.py), recorded in the JSON so the provider is
part of the evidence.

Per (scale, horizon) we record:
- wall            full fn() wall
- rows_out        memory-sink rows (must equal the unbounded key's 5)
- state_rows      SUM over stateOperators of numRowsTotal (post-commit,
                  i.e. post-eviction retained state)
- state_mb        same, memoryUsedBytes
- rows_removed    SUM of numRowsRemoved — the commit-time eviction count
- rows_updated    SUM of numRowsUpdated — state writes (bookkeeping mass)

Usage: python scripts/dedup_wm_tradeoff.py [--scales 64,256]
       [--wms "30 minutes,2 hours,8 hours"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/hja_scale"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="64,256")
    ap.add_argument("--wms", default="30 minutes,2 hours,8 hours")
    args = ap.parse_args()

    from hadoop_job_analyzer_spark.registry import queries
    from hadoop_job_analyzer_spark.session import get_spark
    from hadoop_job_analyzer_spark.streaming import streams as S

    spark = get_spark("hja-dedup-wm")
    provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "(default-hdfs)"
    )
    reg = queries()
    results: dict[str, dict[str, dict]] = {}
    for k in (int(s) for s in args.scales.split(",")):
        sf_dir = f"{OUT}/usershift_x{k}"
        if not os.path.exists(f"{sf_dir}/_DONE"):
            raise SystemExit(f"{sf_dir} not staged; run stream_scale first")

        def drain(label: str, fn) -> dict:
            S.LAST_PROGRESS.pop("stream_dedup", None)
            S.LAST_PROGRESS.pop("stream_dedup_within_watermark", None)
            t0 = time.perf_counter()
            out = fn()
            rows_out = out.count()
            wall = round(time.perf_counter() - t0, 3)
            prog = S.LAST_PROGRESS.get(
                "stream_dedup_within_watermark"
            ) or S.LAST_PROGRESS.get("stream_dedup") or {}
            ops = prog.get("stateOperators")
            rec = {
                "wall": wall,
                "rows_out": rows_out,
                "state_rows": sum((o.get("numRowsTotal") or 0) for o in ops)
                if ops
                else None,
                "state_mb": round(
                    sum((o.get("memoryUsedBytes") or 0) for o in ops) / 1e6, 1
                )
                if ops
                else None,
                "rows_removed": sum((o.get("numRowsRemoved") or 0) for o in ops)
                if ops
                else None,
                "rows_updated": sum((o.get("numRowsUpdated") or 0) for o in ops)
                if ops
                else None,
            }
            results.setdefault(f"x{k}", {})[label] = rec
            print(f"x{k} {label}: {rec}", flush=True)
            return rec

        drain("unbounded", lambda: reg["stream_dedup"](spark, sf_dir))
        for wm in args.wms.split(","):
            drain(
                wm,
                lambda wm=wm: S.stream_dedup_within_watermark_wm(spark, sf_dir, wm),
            )
    print(
        json.dumps(
            {
                "metric": "dedup_wm_tradeoff",
                "state_store": provider,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
