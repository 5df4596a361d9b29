"""Shared paired-measurement protocol for the engine A/B scripts.

One implementation (r12 self-review: same_scale_ab.py and
floor_crossover.py had diverging copies) of the r10/r11 protocol:
N rounds of (one DuckDB run, one Spark run) with engine order SWAPPED
on odd rounds (r11 ADVICE — a fixed order lands any systematic
carryover on the same engine in every ratio), each round yielding a
paired ratio s_i/d_i measured seconds apart so the cross-session
DuckDB denominator swing cannot enter a ratio. Emits the medians, the
paired ratios, and a within-session max/min spread per engine — a
paired ratio is only as trustworthy as its spread is tight.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable


def paired_rounds(
    run_duck: Callable[[], None],
    run_spark: Callable[[], None],
    rounds: int = 3,
) -> dict:
    dtimes: list[float] = []
    stimes: list[float] = []
    for rnd in range(rounds):
        def time_duck() -> None:
            t0 = time.perf_counter()
            run_duck()
            dtimes.append(time.perf_counter() - t0)

        def time_spark() -> None:
            t0 = time.perf_counter()
            run_spark()
            stimes.append(time.perf_counter() - t0)

        first, second = (time_duck, time_spark) if rnd % 2 == 0 else (
            time_spark, time_duck)
        first()
        second()
    paired = [round(s / d, 2) for s, d in zip(stimes, dtimes)]
    return {
        "duckdb_median3": round(statistics.median(dtimes), 3),
        "spark_median3": round(statistics.median(stimes), 3),
        "ratio": round(statistics.median(stimes) / statistics.median(dtimes), 2),
        "paired_ratios": paired,
        "paired_ratio_median": round(sorted(paired)[len(paired) // 2], 2),
        "within_session_spread": {
            "duckdb_maxmin": round(max(dtimes) / min(dtimes), 2),
            "spark_maxmin": round(max(stimes) / min(stimes), 2),
        },
    }
