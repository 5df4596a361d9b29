"""Unit tests for the shared paired-measurement protocol
(scripts/_ab_common.py) — the harness every engine A/B record since r12
is produced by. No Spark/DuckDB involved: the callables are fakes, so
these pin the PROTOCOL (warm-up count, order swap, raw-time emission,
ratio arithmetic), not engine behavior.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._ab_common import paired_rounds


def _fake_pair():
    """Two fake engines writing an interleaved call log."""
    log: list[str] = []

    def duck() -> None:
        log.append("d")

    def spark() -> None:
        log.append("s")

    return log, duck, spark


def test_warm_runs_precede_timed_rounds_and_default_to_two():
    log, duck, spark = _fake_pair()
    rec = paired_rounds(duck, spark)
    # 2 warm pairs (d s d s), then 3 timed rounds of one call each
    assert log[:4] == ["d", "s", "d", "s"]
    assert rec["warm_runs"] == 2
    assert len(log) == 4 + 6


def test_engine_order_swaps_on_odd_rounds():
    log, duck, spark = _fake_pair()
    rec = paired_rounds(duck, spark, rounds=4, warm_runs=0)
    # round 0: duck first; round 1: spark first; alternating
    assert log == ["d", "s", "s", "d", "d", "s", "s", "d"]
    assert rec["round_order"] == [
        "duck_first", "spark_first", "duck_first", "spark_first"]


def test_raw_times_emitted_per_round_and_consistent_with_ratios():
    import time

    def duck() -> None:
        time.sleep(0.02)

    def spark() -> None:
        time.sleep(0.03)

    rec = paired_rounds(duck, spark, rounds=3, warm_runs=1)
    assert len(rec["duckdb_times"]) == 3
    assert len(rec["spark_times"]) == 3
    # every paired ratio must track its round's raw quotient — raw
    # times are the decomposition the medians can't provide, so they
    # must be the SAME measurements, not a re-run (tolerance covers
    # the 2-dp ratio rounding + 3-dp time rounding only)
    for s, d, r in zip(rec["spark_times"], rec["duckdb_times"],
                       rec["paired_ratios"]):
        assert abs(s / d - r) < 0.15
    # spread fields derive from the same raw lists
    assert rec["within_session_spread"]["duckdb_maxmin"] >= 1.0
    assert rec["within_session_spread"]["spark_maxmin"] >= 1.0


def test_median_fields_match_raw_lists():
    import statistics

    _, duck, spark = _fake_pair()
    rec = paired_rounds(duck, spark, rounds=5, warm_runs=0)
    assert rec["duckdb_median3"] == round(
        statistics.median(rec["duckdb_times"]), 3)
    assert rec["spark_median3"] == round(
        statistics.median(rec["spark_times"]), 3)
    assert rec["paired_ratio_median"] == sorted(
        rec["paired_ratios"])[len(rec["paired_ratios"]) // 2]
