#!/usr/bin/env python
"""Streaming scale curves: drain the inflated events backlog through every
availableNow streaming key and record wall, input rows, throughput, and
state-store growth (r8 — the streaming family was the one family with
correctness coverage but no measured scale story).

Uses the same staged inflation dirs as scale_stress.py (/tmp/hja_scale/xK).
NOTE the default inflation shifts only event_id, so the default program
measures the DUPLICATION-MASS axis: input grows kx while user/session/
window cardinality — hence state-store rows — stays constant (walls should
stay near-flat; that is the partial-aggregation story). Pass --shift-users
to stage usershift_xK dirs (user_id shifted per copy) and measure the
STATE axis instead: state rows grow kx — the state-store-hostile
direction. Run both; they answer different 100 TB questions. The drain runs the REGISTRY functions
unmodified: file-source listing, watermarks, state stores, memory sink —
the whole contract path. Per key we record:

- ``wall``      full fn() wall (includes each key's own staging, e.g.
                stream_custom_sessionize's two-file split write)
- ``rows_in``   events rows in the backlog (throughput denominator)
- ``rows_out``  result rows landed in the memory sink
- ``state_rows`` / ``state_mb`` / ``batches``  from the final
                StreamingQueryProgress (streams.LAST_PROGRESS) — the
                numbers a cluster operator watches for state growth

Excluded keys, by design: ``stream_late_data`` (its two-run restored-
watermark choreography is a semantics demo, not a throughput path) and
``stream_foreach_batch`` (driver-side accumulator demo).

Usage: python scripts/stream_scale.py [--scales 1,4,16,64] [--queries a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark
from hadoop_job_analyzer_spark.streaming import streams as S

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/hja_scale"

STREAM_KEYS = [
    "stream_file_source",
    "stream_tumbling",
    "stream_sliding",
    "stream_windowed_apdex",
    "stream_session_window",
    "stream_dedup",
    "stream_dedup_within_watermark",
    "stream_near_dedup_norm",
    "stream_static_join",
    "stream_stream_join",
    "stream_stateful_counter",
    "stream_custom_sessionize",
    "ops_stream_session_report",
]


# Keys whose stream source is the documents table (throughput denominator).
DOC_KEYS = {"stream_near_dedup_norm"}

# Unregistered execution twins (SURVEY §2 surface frozen): measured here so
# their scale behavior is recorded next to the registered keys they shadow.
EXTRA_FUNCS = {
    "stream_dedup_within_watermark": S.stream_dedup_within_watermark,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16,64")
    ap.add_argument("--queries", default="", help="comma-separated subset")
    ap.add_argument(
        "--shift-users",
        action="store_true",
        help="stage/use the user-shifted dirs (state grows kx)",
    )
    ap.add_argument(
        "--state-store",
        default="hdfs",
        choices=["hdfs", "rocksdb"],
        help="state store provider: the default HDFSBackedStateStore "
        "(JVM-heap maps) or RocksDBStateStoreProvider (off-heap native — "
        "the production choice once state outgrows executor heap)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    basket = [
        k for k in STREAM_KEYS if not args.queries or k in args.queries.split(",")
    ]
    prefix = "usershift_" if args.shift_users else ""

    spark = get_spark("hja-stream-scale")
    # get_spark now DEFAULTS to rocksdb (session.py r10); set the provider
    # explicitly for BOTH arms so --state-store hdfs really measures the
    # heap store rather than silently inheriting the new default.
    if args.state_store == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    else:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
        )
    reg = queries()
    results: dict[str, dict[int, dict]] = {k: {} for k in basket}
    for k in scales:
        sf_dir = SRC if (k == 1 and not prefix) else f"{OUT}/{prefix}x{k}"
        if sf_dir != SRC and not os.path.exists(f"{sf_dir}/_DONE"):
            from scale_stress import inflate  # stages + caches the dir

            inflate(spark, k, shift_users=args.shift_users)
        rows_in_by_table = {
            t: spark.read.parquet(f"{sf_dir.rstrip('/')}/{t}.parquet").count()
            for t in ("events", "documents")
        }
        for key in basket:
            rows_in = rows_in_by_table["documents" if key in DOC_KEYS else "events"]
            S.LAST_PROGRESS.pop(key, None)
            t0 = time.perf_counter()
            out = (reg.get(key) or EXTRA_FUNCS[key])(spark, sf_dir)
            rows_out = out.count()
            wall = round(time.perf_counter() - t0, 3)
            prog = S.LAST_PROGRESS.get(key) or {}
            # SUM across stateOperators, don't read [0] (r9 fix): chained
            # stateful plans (stream_dedup = dropDuplicates THEN a
            # complete-mode agg) report one entry per operator, and [0]
            # was the downstream 5-row agg — hiding the dedup operator's
            # real id-keyed state. The r8 Axis-1 numbers for the two
            # dedup keys under-reported state for exactly this reason.
            ops_list = prog.get("stateOperators") or []
            rec = {
                "wall": wall,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "rows_per_sec": round(rows_in / wall),
                "state_rows": sum((o.get("numRowsTotal") or 0) for o in ops_list)
                if ops_list
                else None,
                "state_mb": round(
                    sum((o.get("memoryUsedBytes") or 0) for o in ops_list) / 1e6, 1
                ),
                "state_ops": [o.get("numRowsTotal") for o in ops_list],
                "batches": prog.get("batchId"),
            }
            results[key][k] = rec
            print(f"x{k} {key}: {wall}s in={rows_in} out={rows_out} "
                  f"state_rows={rec['state_rows']} state_mb={rec['state_mb']}",
                  flush=True)
    print(json.dumps({
        "metric": "stream_scale",
        "base": SRC,
        "mode": "usershift" if prefix else "dup-mass",
        "state_store": args.state_store,
        "results": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
