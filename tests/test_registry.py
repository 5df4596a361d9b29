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


def test_first_50_registration_keys_follow_rotation_policy():
    """The driver hard-verifies only the first 50 keys of queries().

    Round-6 rotation (policy documented at registry.py's window block):
    the window is 44 keys never sampled in CORRECTNESS_r01-r05 (fn_*,
    stream_*, udf/udtf pools), the 3 keys whose output was reshaped this
    round from rows-only to hash-gradeable (they carry prior driver rows
    but never a hash verdict, and their shape changed — policy rule 2),
    and the 3 keys brand-new in round 6 (policy rule 2).
    """
    from hadoop_job_analyzer_spark import registry

    sampled: set[str] = set()
    for rnd in (1, 2, 3, 4, 5):
        path = REPO / f"CORRECTNESS_r0{rnd}.json"
        if path.exists():
            sampled |= set(json.loads(path.read_text()))
    assert sampled, "historic CORRECTNESS files missing — cannot check rotation"
    first50 = list(registry.queries())[:50]
    assert len(first50) == 50
    reshaped_r6 = {"agg_approx_distinct", "sketch_hll_mergeable", "emb_pca_top_component"}
    assert reshaped_r6 <= set(first50), "reshaped keys must face the external gate"
    new_r6 = {"join_q7_volume_shipping", "agg_theil_index", "text_edit_distance_join"}
    assert new_r6 <= set(first50), "new r6 keys must face the external gate"
    overlap = [k for k in first50 if k in sampled and k not in reshaped_r6]
    assert overlap == [], f"rotation regressed; resampling already-verified keys: {overlap}"


def test_window_order_matches_pinned_list():
    """queries() and oracle_sql() must present the pinned window first and
    agree on ordering — the driver samples queries()'s insertion order."""
    from hadoop_job_analyzer_spark import registry

    qkeys = list(registry.queries())
    assert tuple(qkeys[:50]) == registry._R6_WINDOW
    okeys = [k for k in registry.oracle_sql() if k in set(registry._R6_WINDOW)]
    assert okeys == [k for k in registry._R6_WINDOW if k in set(okeys)]
