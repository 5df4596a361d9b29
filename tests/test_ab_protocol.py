"""Unit tests for the shared paired-measurement protocol
(scripts/_ab_common.py) — the harness every engine A/B record since r12
is produced by. No Spark/DuckDB involved: the callables are fakes, so
these pin the PROTOCOL (warm-up count, order swap, raw-time emission,
ratio arithmetic), not engine behavior.
"""

from __future__ import annotations

import os
import sys

import pytest

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
    assert rec["paired_ratio_median"] == round(
        statistics.median(rec["paired_ratios"]), 2)


def test_median_fields_even_round_count():
    """ADVICE r12: for even round counts sorted()[n//2] is the
    upper-middle element, not the median — paired_ratio_median must be
    the true (interpolated) median for rounds=4 too."""
    import statistics

    _, duck, spark = _fake_pair()
    rec = paired_rounds(duck, spark, rounds=4, warm_runs=0)
    assert len(rec["paired_ratios"]) == 4
    assert rec["paired_ratio_median"] == round(
        statistics.median(rec["paired_ratios"]), 2)
    assert rec["duckdb_median3"] == round(
        statistics.median(rec["duckdb_times"]), 3)
    assert rec["spark_median3"] == round(
        statistics.median(rec["spark_times"]), 3)


def test_solo_blocks_never_interleave_and_duck_block_first():
    """VERDICT r12 task #2: the solo-block protocol exists so no measured
    DuckDB run ever follows a Spark run — the whole point, given the
    measured ~1.7x Spark-to-DuckDB within-session carryover."""
    from scripts._ab_common import solo_blocks

    log, duck, spark = _fake_pair()
    rec = solo_blocks(duck, spark, rounds=3, warm_runs=2)
    # one uninterrupted duck block (2 warm + 3 timed), then spark's
    assert log == ["d"] * 5 + ["s"] * 5
    assert rec["block_order"] == ["duckdb", "spark"]
    assert len(rec["duckdb_solo_times"]) == 3
    assert len(rec["spark_solo_times"]) == 3


def test_solo_block_medians_and_spread_derive_from_raw_lists():
    import statistics
    import time

    from scripts._ab_common import solo_blocks

    def duck() -> None:
        time.sleep(0.02)

    def spark() -> None:
        time.sleep(0.03)

    rec = solo_blocks(duck, spark, rounds=4, warm_runs=1)
    # ADVICE r15 #2: the stored median is round(median(RAW), 3) while
    # the stored times are themselves rounded; an even rounds count
    # averages two middle values, so the two can differ by 0.0005 —
    # compare with abs tolerance 1e-3, not equality.
    assert rec["duckdb_solo_median"] == pytest.approx(
        statistics.median(rec["duckdb_solo_times"]), abs=1e-3)
    assert rec["spark_solo_median"] == pytest.approx(
        statistics.median(rec["spark_solo_times"]), abs=1e-3)
    assert rec["solo_ratio"] > 1.0  # 30ms vs 20ms sleeps
    assert rec["within_block_spread"]["duckdb_maxmin"] >= 1.0


def test_quoted_ratio_takes_less_favorable_number():
    """The BASELINE.md quoting rule as code: where paired and solo-block
    disagree, quote the ratio LESS favorable to this engine (the larger
    one); without a solo block the paired median stands."""
    from scripts._ab_common import quoted_ratio

    paired = {"paired_ratio_median": 0.38}
    assert quoted_ratio(paired, None) == (0.38, "paired")
    # the r12 join_star shape: paired flattered by carryover, solo honest
    assert quoted_ratio(paired, {"solo_ratio": 1.7}) == (1.7, "solo_block")
    # solo can also be the more favorable one; paired must then stand
    assert quoted_ratio({"paired_ratio_median": 1.2},
                        {"solo_ratio": 0.9}) == (1.2, "paired")

def test_reduced_slow_leg_shape_and_arithmetic():
    """r15 slow-leg fast path: one more (already-warm) DuckDB run, then a
    Spark solo block — duck never follows spark, and the record carries
    the paired-compatible field names so quoted_ratio/solo-escalation
    logic reads it unchanged."""
    import statistics
    import time

    from scripts._ab_common import reduced_slow_leg

    log: list[str] = []

    def duck() -> None:
        log.append("d")
        time.sleep(0.03)

    def spark() -> None:
        log.append("s")
        time.sleep(0.01)

    rec = reduced_slow_leg(duck, spark, probe_wall=123.4, rounds=3,
                           warm_runs=2)
    # one duck run, then spark's block (2 warm + 3 timed) — never interleaved
    assert log == ["d"] + ["s"] * 5
    assert rec["protocol"] == "reduced_slow_leg"
    assert rec["duckdb_probe_wall"] == 123.4
    assert len(rec["duckdb_times"]) == 1
    assert len(rec["spark_times"]) == 3
    assert rec["spark_median3"] == round(
        statistics.median(rec["spark_times"]), 3)
    # ratio fields mirror the single quotient; spread reads as tight so
    # the solo-escalation trigger can't fire on an undefined spread
    assert rec["paired_ratio_median"] == rec["ratio"]
    assert rec["paired_ratios"] == [rec["ratio"]]
    assert rec["within_session_spread"]["duckdb_maxmin"] == 1.0
    assert rec["ratio"] < 1.0  # 10ms spark vs 30ms duck


def test_duck_probe_interrupts_and_leaves_connection_reusable():
    """r15 watchdog: an oracle that exceeds the cap is interrupted
    mid-run (dnf=True) and the connection stays usable; a fast oracle
    passes through untouched (dnf=False). Pins the real con.interrupt()
    path — the first r15 A/B attempt had to be killed by hand when an
    uncapped DuckDB leg hit 59 GiB RSS."""
    import duckdb

    from scripts.same_scale_ab import duck_probe

    con = duckdb.connect()
    slow = lambda: con.execute(  # noqa: E731
        "SELECT count(*) FROM range(100000) a, range(1000000) b "
        "WHERE (a.range * b.range) % 7 = 3").fetchall()
    wall, dnf = duck_probe(con, slow, cap_s=1.0)
    assert dnf and wall >= 0.95
    assert con.execute("SELECT 1").fetchone()[0] == 1  # reusable
    fast = lambda: con.execute("SELECT 1").fetchall()  # noqa: E731
    wall, dnf = duck_probe(con, fast, cap_s=5.0)
    assert not dnf and wall < 1.0


def test_duck_probe_reraises_real_errors():
    """A genuine query error (not the watchdog) must propagate — the
    threading.Event set by the watchdog callback (ADVICE r15 #1)
    distinguishes an interrupt from a real error, regardless of when
    the error is raised."""
    import duckdb

    from scripts.same_scale_ab import duck_probe

    con = duckdb.connect()
    bad = lambda: con.execute("SELECT * FROM no_such_table").fetchall()  # noqa: E731
    with pytest.raises(duckdb.Error):
        duck_probe(con, bad, cap_s=30.0)


def test_duck_probe_reraises_real_error_near_cap():
    """ADVICE r15 #1 regression: a real error raised after 95% of the
    cap used to be misclassified as a watchdog DNF by the old
    wall-clock heuristic. With the Event flag it must still re-raise —
    only an actual watchdog interrupt records a DNF."""
    import time as _time

    import duckdb

    from scripts.same_scale_ab import duck_probe

    con = duckdb.connect()

    def late_error() -> None:
        _time.sleep(2.9)  # > 0.95 * cap, before the 3.0 s watchdog
        con.execute("SELECT * FROM no_such_table").fetchall()

    with pytest.raises(duckdb.Error):
        duck_probe(con, late_error, cap_s=3.0)
    # and the connection has no latched interrupt pending
    assert con.execute("SELECT 1").fetchone()[0] == 1
