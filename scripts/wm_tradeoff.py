#!/usr/bin/env python
"""Watermark-vs-state tradeoff for the stream-stream join (VERDICT r8 #3).

`stream_stream_join` is the one super-linear streaming key (549 MB join
state at x64 on the duplication axis); its docstring claims the 100 TB
fix is tuning the watermark bound. This harness measures that claim:
drain the same backlog through `stream_stream_join_wm` at several
watermark settings and record, per (scale, watermark):

- ``state_rows`` / ``state_mb``   final stateOperators totals (the
                                  bound the watermark is supposed to set)
- ``rows_out``                    matches emitted (a tighter watermark
                                  may drop late rows — the correctness
                                  side of the dial)
- ``dropped``                     numRowsDroppedByWatermark (the same
                                  late-drop counter the existing
                                  stream_late_data test pins)
- ``wall``                        drain wall, for the cost story

Reuses the staged /tmp/hja_scale dirs (scale_stress.inflate). Run solo.

Usage: python scripts/wm_tradeoff.py [--scales 16,64] \
           [--watermarks "10 minutes,1 hour,4 hours"]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_job_analyzer_spark.session import get_spark
from hadoop_job_analyzer_spark.streaming import streams as S

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/hja_scale"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="16,64")
    ap.add_argument("--watermarks", default="10 minutes,1 hour,4 hours")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    wms = [w.strip() for w in args.watermarks.split(",")]

    spark = get_spark("hja-wm-tradeoff")
    results: dict[str, dict[str, dict]] = {}
    for k in scales:
        sf_dir = SRC if k == 1 else f"{OUT}/x{k}"
        if sf_dir != SRC and not os.path.exists(f"{sf_dir}/_DONE"):
            from scale_stress import inflate

            inflate(spark, k)
        for wm in wms:
            S.LAST_PROGRESS.pop("stream_stream_join", None)
            t0 = time.perf_counter()
            out = S.stream_stream_join_wm(spark, sf_dir, wm)
            rows_out = out.count()
            wall = round(time.perf_counter() - t0, 3)
            prog = S.LAST_PROGRESS.get("stream_stream_join") or {}
            # None (not 0) when no progress was recorded — a missing
            # stateOperators entry must not masquerade as a measured
            # zero-state point in the published curve (ADVICE r9).
            ops_list = prog.get("stateOperators")
            rec = {
                "wall": wall,
                "rows_out": rows_out,
                "state_rows": sum((o.get("numRowsTotal") or 0) for o in ops_list)
                if ops_list
                else None,
                "state_mb": round(
                    sum((o.get("memoryUsedBytes") or 0) for o in ops_list) / 1e6, 1
                )
                if ops_list
                else None,
                "dropped": sum(
                    (o.get("numRowsDroppedByWatermark") or 0) for o in ops_list
                )
                if ops_list
                else None,
                "batches": prog.get("batchId"),
            }
            results.setdefault(f"x{k}", {})[wm] = rec
            print(f"x{k} wm={wm!r}: {rec}", flush=True)
    print(json.dumps({"metric": "wm_tradeoff", "base": SRC, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
