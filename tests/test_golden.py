"""Golden-file regression tests (SURVEY.md §5.4): flagship outputs at
sf0.001 pinned as committed CSVs — catches silent semantic drift with
no DuckDB (or any second engine) in the loop, e.g. a refactor that
changes a tiebreak, a constant, or a default.

Regenerate deliberately with scripts/regen_goldens.py; the golden diff
then documents the semantic change for review.
"""

from __future__ import annotations

import os

from hadoop_job_analyzer_spark.registry import queries

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SF_DIR = "/root/testdata/sf0.001"

# Flagships: one per major surface (pricing agg, sessionization, the
# composed corpus pipeline, iterative graph, LSH dedup, sketch).
GOLDEN_KEYS = [
    "agg_group_pricing",
    "win_sessionize",
    "corpus_pipeline_e2e",
    "graph_pagerank",
    "dedup_near_minhash",
    "sketch_countmin",
]


def normalize(df) -> list[str]:
    """Engine-independent canonical form: columns sorted by name,
    floats rounded to 6 (abs(x) to fold -0.0), rows sorted."""
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        cells = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0:
                    v = 0.0
                cells.append(f"{v!r}")
            else:
                cells.append(str(v))
        rows.append("\x1f".join(cells))
    return sorted(rows)


def test_goldens_exist():
    missing = [k for k in GOLDEN_KEYS if not os.path.exists(os.path.join(GOLDEN_DIR, f"{k}.csv"))]
    assert not missing, f"missing goldens (run scripts/regen_goldens.py): {missing}"


import pytest


@pytest.mark.parametrize("key", GOLDEN_KEYS)
def test_flagship_matches_golden(spark, key):
    path = os.path.join(GOLDEN_DIR, f"{key}.csv")
    if not os.path.exists(path):
        pytest.skip(f"golden for {key} not generated yet")
    with open(path) as f:
        want = [line for line in f.read().splitlines() if line]
    got = normalize(queries()[key](spark, SF_DIR))
    assert got == want, (
        f"{key}: output drifted from golden ({len(got)} vs {len(want)} rows) — "
        "if intentional, regenerate via scripts/regen_goldens.py and review the diff"
    )
