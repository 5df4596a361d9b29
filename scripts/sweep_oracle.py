"""Run every registered key through the driver-emulating comparator.

Usage: python scripts/sweep_oracle.py [--log FILE] [sf_dir] [key_substring ...]

Prints one line per key (PASS / FAIL / CRASH / rows-only) and a summary;
exit code 1 if anything failed. This is the pre-driver gate: a clean
sweep at sf0.01 should mean a clean CORRECTNESS_r{N}.json.

`--log FILE` additionally writes every per-key line + the summary to
FILE directly (line-buffered, stdout/stderr never interleaved into it).
VERDICT r15 "What's wrong": the committed r15_sweep_sf0.1.log was
captured with `2>&1` and lost 71 of 293 per-key PASS lines to
interleaved FutureWarnings from Spark workers — committed sweep
artifacts must come from --log, not from shell redirection of the
mixed stream.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from hadoop_job_analyzer_spark.oracle_check import check_hashable, compare
from hadoop_job_analyzer_spark.registry import oracle_sql, queries
from hadoop_job_analyzer_spark.session import get_spark


def main() -> int:
    argv = sys.argv[1:]
    log_path = None
    if "--log" in argv:
        i = argv.index("--log")
        log_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    pats = argv[1:]
    logf = open(log_path, "w", buffering=1) if log_path else None

    def emit(line: str) -> None:
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")

    spark = get_spark("sweep")
    qs, os_ = queries(), oracle_sql()
    keys = [k for k in qs if not pats or any(p in k for p in pats)]
    fails: list[str] = []
    for k in keys:
        t0 = time.time()
        try:
            df = qs[k](spark, sf_dir)
            if k in os_:
                compare(df, os_[k], sf_dir, k)
                status = "PASS"
            else:
                check_hashable(df, k)
                status = "rows-only-ok"
        except AssertionError as e:
            status = f"FAIL {str(e)[:400]}"
            fails.append(k)
        except Exception:
            status = f"CRASH {traceback.format_exc(limit=3)[-400:]}"
            fails.append(k)
        emit(f"{k:36s} {time.time()-t0:6.2f}s  {status}")
    emit(f"\n{len(keys) - len(fails)}/{len(keys)} ok; fails: {fails}")
    if logf:
        logf.close()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
