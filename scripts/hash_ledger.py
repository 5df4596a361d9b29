#!/usr/bin/env python
"""Driver-hash recency ledger (VERDICT r8 task #5 / "What's missing" #3).

For every registered key, prints:
  - the most recent round whose CORRECTNESS_r0N.json recorded a
    driver hash PASS for the key (the external signal's age), and
  - the last git commit that touched the key's implementing FILE
    (file-level granularity: a commit touching any operator in the
    module counts as a touch — coarse, but it bounds staleness from
    the safe side: a key flagged "code newer than its driver hash"
    may be a false positive, never a false negative).

Keys whose implementing file changed AFTER their last driver hash are
the rotation candidates; the window promotion policy (registry.py)
rotates the next driver window onto the 50 keys with the OLDEST driver
hash (ties broken by registration order), which this script emits as a
ready-to-paste tuple.

Usage: python scripts/hash_ledger.py [--window]
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent

from hadoop_job_analyzer_spark.registry import queries  # noqa: E402


def last_driver_round() -> dict[str, int]:
    out: dict[str, int] = {}
    # Glob rather than a fixed range(1, 20) so rounds >= 20 are never
    # silently ignored (ADVICE r9). Sorted ascending so later rounds win.
    paths = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )
    for path in paths:
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        data = json.loads(path.read_text())
        for key, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                out[key] = rnd
    return out


def impl_file(fn) -> str:
    target = getattr(fn, "__wrapped__", fn)
    path = pathlib.Path(target.__code__.co_filename)
    return str(path.relative_to(REPO))


def last_touch(path: str, cache: dict[str, str]) -> str:
    if path not in cache:
        res = subprocess.run(
            ["git", "log", "-1", "--format=%h %cs", "--", path],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        cache[path] = res.stdout.strip() or "?"
    return cache[path]


def main() -> None:
    # RAW registration order (_QUERIES insertion), not the window-ordered
    # queries() view — the window tie-break must not depend on the window
    # itself (r10: a key promoted into the window head would otherwise
    # jump the registration-order queue for the NEXT window too)
    import hadoop_job_analyzer_spark.registry as _r

    queries()  # force module load
    reg = dict(_r._QUERIES)
    hashed = last_driver_round()
    touch_cache: dict[str, str] = {}
    rows = []
    for key, fn in reg.items():
        f = impl_file(fn)
        rows.append((hashed.get(key, 0), key, f, last_touch(f, touch_cache)))

    if "--window" in sys.argv:
        # The 50 stalest by driver-hash round; ties keep registration order
        # (rows is built in registration order and sorted stably).
        stalest = sorted(rows, key=lambda r: r[0])[:50]
        print("_R9_WINDOW = (")
        for rnd, key, _, _ in stalest:
            print(f'    "{key}",  # last driver hash r{rnd}')
        print(")")
        return

    print(f"{'key':42s} {'hash':>5s}  {'impl file':46s} last file touch")
    for rnd, key, f, t in sorted(rows):
        print(f"{key:42s} r{rnd:<4d}  {f:46s} {t}")


if __name__ == "__main__":
    main()
