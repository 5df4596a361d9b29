#!/usr/bin/env python
"""Per-round Carbon emit-path verification (VERDICT r12 task #5).

The `HJA_CARBON_TARGET` leg of `ops_stream_session_report` is
env-flag-gated: no driver round or oracle sweep ever sets the flag, so
the executor-side socket push could silently rot while every gate stays
green. This script exercises it once per round, driver-shaped (fresh
engine session, sf0.01, loopback listener), and emits a small JSON
artifact (`verification/r{N}_carbon_emit.json`) asserting:

- wire bytes == renderer lines: the Graphite plaintext lines received
  over TCP are exactly the report frame's `line` column — SET-equal,
  not multiset-equal, because the push is documented at-least-once
  (Carbon relays dedup by (path, ts) last-write-wins; a Spark task
  retry or speculative re-send legitimately duplicates a partition's
  lines on the wire). Duplicates are counted and recorded, not failed;
- executor-side: the push happens via `foreachPartition` on the
  executors — one connection per non-empty partition, so >= 1
  connections is the distributed-send signature (a driver-side collect
  would also show 1; the loopback TEST in test_streaming.py pins the
  foreachPartition shape, this artifact pins that the path still runs);
- the returned frame is byte-identical with the flag on and off (the
  oracle grades the same frame either way).

Usage: python scripts/carbon_emit_check.py <round> [sf_dir]
Writes verification/r{round}_carbon_emit.json and prints it.
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(
            "usage: python scripts/carbon_emit_check.py <round> [sf_dir]"
        )
    rnd = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from hadoop_job_analyzer_spark.registry import queries
    from hadoop_job_analyzer_spark.session import get_spark

    spark = get_spark("hja-carbon-emit-check")
    fn = queries()["ops_stream_session_report"]

    received: list[bytes] = []
    srv = socket.create_server(("127.0.0.1", 0))
    srv.settimeout(0.5)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve() -> None:
        # drain-then-exit (r12): a connection still in the listen backlog
        # when the driver finishes must be served, not dropped
        while True:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                if stop.is_set():
                    break
                continue
            with conn:
                chunks = []
                while True:
                    b = conn.recv(65536)
                    if not b:
                        break
                    chunks.append(b)
                received.append(b"".join(chunks))

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    os.environ["HJA_CARBON_TARGET"] = f"127.0.0.1:{port}"
    try:
        flagged_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        os.environ.pop("HJA_CARBON_TARGET", None)
        stop.set()
        t.join(timeout=10)
        listener_hung = t.is_alive()
        srv.close()
    plain_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))

    # a hung listener (a connection that never closed) means `received`
    # is partial AND still being mutated — grade nothing from it
    wire = "" if listener_hung else b"".join(received).decode("utf-8")
    wire_lines = wire.strip("\n").split("\n") if wire else []
    report_lines = sorted(r[3] for r in flagged_rows)  # column order: ..., line

    out = {
        "metric": "carbon_emit_check",
        "round": rnd,
        "sf_dir": sf_dir,
        "listener_hung": listener_hung,
        "n_report_lines": len(report_lines),
        "n_wire_lines": len(wire_lines),
        "n_wire_duplicates": len(wire_lines) - len(set(wire_lines)),
        "n_connections": len(received),
        "newline_framed": wire.endswith("\n") if wire else False,
        # SET equality on BOTH sides (ADVICE r13 #1): the emit contract
        # is at-least-once with relay-side dedup, so duplicates are legal
        # ON THE WIRE and must not fail the wire compare. The RENDERER
        # frame is different: it is a deterministic projection of the
        # flagged report rows, so a duplicated report line there is a
        # renderer bug, not an at-least-once artifact — which is why
        # `report_lines_unique` stays in the pass conjunction below as
        # its own named check (ADVICE r14: the two properties answer to
        # different contracts).
        "wire_equals_renderer": set(wire_lines) == set(report_lines),
        "report_lines_unique": len(report_lines) == len(set(report_lines)),
        "flag_off_frame_identical": flagged_rows == plain_rows,
    }
    out["pass"] = bool(
        not listener_hung
        and report_lines
        and out["wire_equals_renderer"]
        and out["report_lines_unique"]
        and out["newline_framed"]
        and out["flag_off_frame_identical"]
        and len(received) >= 1
    )
    path = os.path.join(REPO, "verification", f"r{rnd}_carbon_emit.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    if not out["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
