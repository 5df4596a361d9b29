"""Run every registered key through the driver-emulating comparator.

Usage: python scripts/sweep_oracle.py [sf_dir] [key_substring ...]

Prints one line per key (PASS / FAIL / CRASH / rows-only) and a summary;
exit code 1 if anything failed. This is the pre-driver gate: a clean
sweep at sf0.01 should mean a clean CORRECTNESS_r{N}.json.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    pats = sys.argv[2:]
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
        print(f"{k:36s} {time.time()-t0:6.2f}s  {status}", flush=True)
    print(f"\n{len(keys) - len(fails)}/{len(keys)} ok; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
