"""Registry contract guards (SURVEY.md §2 + driver sampling).

Two structural properties the rest of the test suite assumes:

1. SURVEY.md §2's declared key inventory == ``registry.queries()`` ==
   ``__spark_entry__.queries()`` — the binding coverage contract, both
   directions.
2. The driver's correctness gate samples the FIRST 50 registration keys.
   Rounds 1-3 only ever sampled 52 distinct keys (scans/filters/joins +
   12 aggs); round 4 rotated ``registry._OP_MODULES`` so the 50-key
   window lands entirely on previously-unsampled surface. This test pins
   that rotation so a refactor can't silently undo it.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _survey_keys() -> set[str]:
    text = (REPO / "SURVEY.md").read_text()
    start = text.index("## 2. Operator inventory")
    end = text.index("## 3. Query lifecycle")
    body = text[start:end]
    # Keys appear as the first cell of inventory table rows: | `key` | ...
    return set(re.findall(r"^\| `([a-z0-9_]+)` \|", body, flags=re.M))


def test_survey_matches_registry_both_directions():
    from hadoop_job_analyzer_spark import registry

    reg = set(registry.queries())
    survey = _survey_keys()
    assert survey - reg == set(), f"SURVEY declares unimplemented keys: {sorted(survey - reg)}"
    assert reg - survey == set(), f"registry keys missing from SURVEY §2: {sorted(reg - survey)}"


def test_entry_module_reexports_registry():
    import __spark_entry__ as entry

    from hadoop_job_analyzer_spark import registry

    assert set(entry.queries()) == set(registry.queries())
    assert set(entry.oracle_sql()) == set(registry.oracle_sql())


def test_oracle_keys_subset_of_queries():
    from hadoop_job_analyzer_spark import registry

    assert set(registry.oracle_sql()) <= set(registry.queries())


def test_first_50_registration_keys_previously_unsampled():
    """The driver hard-verifies only the first 50 keys of queries().

    Keep the rotation honest: none of the round-4 window keys may come
    from the set already sampled in CORRECTNESS_r01-r03 (52 keys).
    """
    from hadoop_job_analyzer_spark import registry

    sampled: set[str] = set()
    for rnd in (1, 2, 3):
        path = REPO / f"CORRECTNESS_r0{rnd}.json"
        if path.exists():
            sampled |= set(json.loads(path.read_text()))
    assert sampled, "historic CORRECTNESS files missing — cannot check rotation"
    first50 = list(registry.queries())[:50]
    overlap = [k for k in first50 if k in sampled]
    assert overlap == [], f"rotation regressed; resampling already-verified keys: {overlap}"
