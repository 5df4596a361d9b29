"""Shared paired-measurement protocol for the engine A/B scripts.

One implementation (r12 self-review: same_scale_ab.py and
floor_crossover.py had diverging copies) of the r10/r11 protocol:
N rounds of (one DuckDB run, one Spark run) with engine order SWAPPED
on odd rounds (r11 ADVICE — a fixed order lands any systematic
carryover on the same engine in every ratio), each round yielding a
paired ratio s_i/d_i measured seconds apart so the cross-session
DuckDB denominator swing cannot enter a ratio. Emits the medians, the
paired ratios, the RAW per-round times with each round's engine order
(r12 redraw lesson: medians alone cannot decompose an ordering effect
after the fact), and a within-session max/min spread per engine — a
paired ratio is only as trustworthy as its spread is tight.

Warm-up lives here too, and defaults to TWO runs per engine: the r12
join_star adjudication (verification/r12_same_scale_ab_redraw.json)
measured DuckDB's first post-warm run still 1.4-2x above its
steady state on GB-scale inputs — one warm run under-warms its buffer
state, and an under-warmed first round lands asymmetrically on
whichever engine runs first.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable


def paired_rounds(
    run_duck: Callable[[], None],
    run_spark: Callable[[], None],
    rounds: int = 3,
    warm_runs: int = 2,
) -> dict:
    for _ in range(warm_runs):
        run_duck()
        run_spark()
    dtimes: list[float] = []
    stimes: list[float] = []
    order: list[str] = []
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
        order.append("duck_first" if rnd % 2 == 0 else "spark_first")
        first()
        second()
    paired = [round(s / d, 2) for s, d in zip(stimes, dtimes)]
    return {
        "duckdb_median3": round(statistics.median(dtimes), 3),
        "spark_median3": round(statistics.median(stimes), 3),
        "ratio": round(statistics.median(stimes) / statistics.median(dtimes), 2),
        "paired_ratios": paired,
        # statistics.median, not sorted()[n//2] (ADVICE r12): for even
        # round counts the latter is the upper-middle element, biasing
        # the headline ratio high or low by half a gap.
        "paired_ratio_median": round(statistics.median(paired), 2),
        "duckdb_times": [round(t, 3) for t in dtimes],
        "spark_times": [round(t, 3) for t in stimes],
        "round_order": order,
        "warm_runs": warm_runs,
        "within_session_spread": {
            "duckdb_maxmin": round(max(dtimes) / min(dtimes), 2),
            "spark_maxmin": round(max(stimes) / min(stimes), 2),
        },
    }


def solo_blocks(
    run_duck: Callable[[], None],
    run_spark: Callable[[], None],
    rounds: int = 3,
    warm_runs: int = 2,
) -> dict:
    """Solo-block medians (VERDICT r12 task #2, automating the r12
    adjudication protocol): each engine measured in an UNINTERRUPTED
    block of consecutive runs, DuckDB's block first, so the measured
    ~1.7x Spark-to-DuckDB within-session carryover
    (verification/r12_heavy3_protocol_adjudication.json) cannot inflate
    a DuckDB denominator — every measured DuckDB run follows only other
    DuckDB runs. Each block opens with its own warm runs, which also
    absorb any residue of whatever ran before the block started.

    This is the companion to paired_rounds, not a replacement: paired
    ratios cancel cross-session drift, solo blocks cancel within-session
    carryover. Where the two disagree on a heavy row, BASELINE.md's
    quoting rule takes the number LESS favorable to this engine
    (quoted_ratio in same_scale_ab.py)."""

    def block(run: Callable[[], None]) -> list[float]:
        for _ in range(warm_runs):
            run()
        times: list[float] = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return times

    dtimes = block(run_duck)
    stimes = block(run_spark)
    dmed = statistics.median(dtimes)
    smed = statistics.median(stimes)
    return {
        "duckdb_solo_median": round(dmed, 3),
        "spark_solo_median": round(smed, 3),
        "solo_ratio": round(smed / dmed, 2),
        "duckdb_solo_times": [round(t, 3) for t in dtimes],
        "spark_solo_times": [round(t, 3) for t in stimes],
        "block_order": ["duckdb", "spark"],
        "warm_runs": warm_runs,
        "within_block_spread": {
            "duckdb_maxmin": round(max(dtimes) / min(dtimes), 2),
            "spark_maxmin": round(max(stimes) / min(stimes), 2),
        },
    }


def reduced_slow_leg(
    run_duck: Callable[[], None],
    run_spark: Callable[[], None],
    probe_wall: float,
    rounds: int = 3,
    warm_runs: int = 2,
) -> dict:
    """Reduced protocol for keys whose DuckDB leg is minutes long (r15:
    the full paired protocol re-runs the slow leg 8 times — ~45 min of
    box time on `dedup_near_minhash`'s 335 s oracle — to refine a ratio
    that is 0.04x, where the 8-run precision buys nothing: the 2x
    criterion is decided by keys NEAR the line, and a >80 s DuckDB leg
    against single-digit Spark walls cannot be near it). One more
    DuckDB run (the probe already warmed its buffers; quoting the COLD
    probe itself would overstate the DuckDB wall and flatter the ratio
    — the r12 under-warm lesson, applied in reverse) + a standard
    Spark solo block. The caller must escalate back to the full paired
    protocol if the resulting ratio lands anywhere precision matters
    (same_scale_ab escalates on (0.5, 2.5))."""
    t0 = time.perf_counter()
    run_duck()
    dwall = time.perf_counter() - t0
    for _ in range(warm_runs):
        run_spark()
    stimes: list[float] = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        run_spark()
        stimes.append(time.perf_counter() - t0)
    smed = statistics.median(stimes)
    return {
        "protocol": "reduced_slow_leg",
        "duckdb_probe_wall": round(probe_wall, 3),
        "duckdb_median3": round(dwall, 3),  # single warm run, field name kept for the record shape
        "spark_median3": round(smed, 3),
        "ratio": round(smed / dwall, 2),
        "paired_ratios": [round(smed / dwall, 2)],
        "paired_ratio_median": round(smed / dwall, 2),
        "duckdb_times": [round(dwall, 3)],
        "spark_times": [round(t, 3) for t in stimes],
        "round_order": ["duck_block_then_spark_block"],
        "warm_runs": warm_runs,
        "within_session_spread": {
            # single duck run: spread undefined, recorded as 1.0 so the
            # solo-escalation trigger reads it as tight (the protocol is
            # already block-shaped, there is nothing to escalate to)
            "duckdb_maxmin": 1.0,
            "spark_maxmin": round(max(stimes) / min(stimes), 2),
        },
    }


def quoted_ratio(paired_rec: dict, solo_rec: dict | None) -> tuple[float, str]:
    """The BASELINE.md quoting rule as code: where paired and solo-block
    protocols disagree, quote the ratio LESS favorable to this engine
    (the larger one). Returns (ratio, which-protocol-it-came-from)."""
    if solo_rec is None:
        return paired_rec["paired_ratio_median"], "paired"
    if solo_rec["solo_ratio"] > paired_rec["paired_ratio_median"]:
        return solo_rec["solo_ratio"], "solo_block"
    return paired_rec["paired_ratio_median"], "paired"
