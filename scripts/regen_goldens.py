#!/usr/bin/env python
"""Regenerate the flagship golden files (tests/golden/*.csv).

Run ONLY when a flagship's semantics intentionally change; the diff of
the golden file then documents the change for review. Normalization
matches tests/test_golden.py: columns sorted by name, floats rounded
to 6, rows sorted lexicographically.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_job_analyzer_spark.registry import queries
from hadoop_job_analyzer_spark.session import get_spark
from tests.test_golden import GOLDEN_KEYS, GOLDEN_DIR, SF_DIR, normalize

def main() -> None:
    spark = get_spark("regen-goldens")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for key in GOLDEN_KEYS:
        rows = normalize(queries()[key](spark, SF_DIR))
        path = os.path.join(GOLDEN_DIR, f"{key}.csv")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"wrote {path} ({len(rows)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
