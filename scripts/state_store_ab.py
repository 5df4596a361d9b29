#!/usr/bin/env python
"""State-store A/B for the session-window family (r9 depth program).

The Axis-2 curves show the session family carrying the surface's largest
streaming state (~2 GB heap at usershift x64, one row per open session).
The production answer once state outgrows executor heap is
RocksDBStateStoreProvider (off-heap native); this probe measures the
same drain under both providers at the biggest staged scales.

Differences from scripts/stream_scale.py, both deliberate:

- **noop sink, not the memory sink.** The registered key drains to a
  memory sink because the correctness contract hashes driver-side rows;
  at usershift x256 the complete-mode output is 24.4 M session rows and
  the memory sink's driver collect dies on spark.driver.maxResultSize
  (measured: "serialized results of 18 tasks (1078.5 MiB) > 1024.0 MiB")
  — a SINK limit, not a state-store one. Production unbounded-output
  streams target distributed sinks (run_to_memory's documented
  boundary), so the A/B drains the identical stateful pipeline
  (read_events_stream -> 2 h watermark -> 30 min session_window
  groupBy user -> count, complete mode) into `noop`.
- **fresh SparkSession per (store, scale)**: the provider conf is read
  per query, but a shared session would let the first store's JVM heap
  history (GC pressure, codegen caches) leak into the second's wall.

Usage: python scripts/state_store_ab.py [--scales 64,256]
       [--stores hdfs,rocksdb]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OUT = "/tmp/hja_scale"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def drain_session_window(spark, sf_dir: str) -> dict:
    """The registered stream_session_window pipeline, drained to noop."""
    from hadoop_job_analyzer_spark.streaming.streams import read_events_stream

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "win.start", "win.end", "n_events")
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    p = q.lastProgress or {}
    ops = p.get("stateOperators") or []
    return {
        "state_rows": sum((o.get("numRowsTotal") or 0) for o in ops),
        "state_mb": round(
            sum((o.get("memoryUsedBytes") or 0) for o in ops) / 1e6, 1
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="64,256")
    ap.add_argument("--stores", default="hdfs,rocksdb")
    args = ap.parse_args()

    from hadoop_job_analyzer_spark.session import get_spark

    results: dict[str, dict[str, dict]] = {}
    for store in args.stores.split(","):
        for k in (int(s) for s in args.scales.split(",")):
            sf_dir = f"{OUT}/usershift_x{k}"
            if not os.path.exists(f"{sf_dir}/_DONE"):
                raise SystemExit(f"{sf_dir} not staged; run stream_scale first")
            spark = get_spark(f"hja-state-ab-{store}-x{k}")
            # get_spark defaults to rocksdb (session.py r10); pin BOTH arms
            # explicitly so the hdfs arm measures the heap store.
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                ROCKSDB
                if store == "rocksdb"
                else "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider",
            )
            t0 = time.perf_counter()
            rec = drain_session_window(spark, sf_dir)
            rec["wall"] = round(time.perf_counter() - t0, 3)
            spark.stop()
            results.setdefault(store, {})[f"x{k}"] = rec
            print(f"{store} x{k}: {rec}", flush=True)
    print(json.dumps({"metric": "state_store_ab", "results": results}))


if __name__ == "__main__":
    main()
