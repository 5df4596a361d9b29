"""Driver-emulating differential checker: Spark query vs DuckDB oracle.

Replicates the driver's t2 comparison so hash mismatches are caught
locally at sf0.001/sf0.01 before the driver sees them. The driver
converts BOTH sides to pandas (Spark ``toPandas()``, DuckDB ``.df()``),
sorts columns by name, sorts rows, and value-hashes — so dtype
*representation* matters, not just Python-level equality:

- DuckDB ``SUM(BIGINT)`` is HUGEINT → pandas float64 (``42.0``), while
  Spark's bigint sum is int64 (``42``) → hash mismatch. Oracles must
  ``CAST(... AS BIGINT)``.
- Spark DATE → object column of ``datetime.date``; DuckDB DATE →
  datetime64 — mismatch. Return TIMESTAMP (or ISO strings) on both sides.
- ARRAY/MAP output cells (ndarray/dict) crash the driver's
  canonicalizer (pandas factorize: unhashable type). Stringify them.

Round-1 shipped 23 latent failures because the old comparator used
``fetchall()`` (HUGEINT → Python int → falsely matched Spark). This
module is therefore deliberately dtype-strict: int-vs-float and
date-vs-timestamp representation differences FAIL here even though the
values are numerically equal.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from .catalog import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


class CanonCrash(AssertionError):
    """Output contains cells the driver's canonicalizer cannot hash."""


def _cell(v: Any, key: str, col: str) -> Any:
    """Canonicalize ONE pandas cell to a tagged, type-faithful token.

    int and float are DIFFERENT tags even for equal values (the driver
    hashes 42 and 42.0 differently). datetime.date and Timestamp are
    DIFFERENT tags. Unhashable cells (dict/ndarray/list) raise
    CanonCrash — the driver dies on them, so we must too.
    """
    if v is None:
        return None
    if isinstance(v, (np.ndarray, list, tuple, dict, set)):
        raise CanonCrash(
            f"[{key}] col {col!r}: cell of type {type(v).__name__} would crash "
            f"the driver's canonicalizer (unhashable). Stringify with "
            f"array_join/to_json on BOTH sides."
        )
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "nan")
        if f == 0.0:
            return ("f", 0.0)  # collapse -0.0 / +0.0
        return ("f", f)
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("ts", v.isoformat())
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        # A date OBJECT (Spark DATE via toPandas) — distinct from the
        # datetime64 a DuckDB DATE becomes. Tag differently on purpose.
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    if isinstance(v, str):
        return ("s", v)
    return ("s", str(v))


_KIND_NORM = {"u": "i"}  # unsigned ints compare as ints


def _dtype_kinds(pdf: pd.DataFrame) -> dict[str, str]:
    return {c: _KIND_NORM.get(pdf[c].dtype.kind, pdf[c].dtype.kind) for c in pdf.columns}


def _canon_rows(pdf: pd.DataFrame, key: str, side: str) -> list[tuple]:
    cols = list(pdf.columns)
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        row = []
        for col, v in zip(cols, tup):
            # pandas NaT/NaN scalars for missing values
            if v is pd.NaT:
                row.append(None)
                continue
            row.append(_cell(v, f"{key}:{side}", col))
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, repr(x)) for x in r))
    return rows


def to_pandas_pair(spark_df, sql: str, sf_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Both sides exactly as the driver materializes them."""
    s_pdf = spark_df.toPandas()
    con = duck_connect(sf_dir)
    try:
        d_pdf = con.execute(sql).df()
    finally:
        con.close()
    return s_pdf, d_pdf


def check_hashable(spark_df, key: str = "?") -> None:
    """Rows-only keys still get canonicalized by the driver — their output
    must not contain dict/ndarray cells or the driver records a crash."""
    pdf = spark_df.toPandas()
    _canon_rows(pdf, key, "spark")


def compare(spark_df, sql: str, sf_dir: str, key: str = "?") -> None:
    """Raise AssertionError with a diff preview on any mismatch."""
    s_pdf, d_pdf = to_pandas_pair(spark_df, sql, sf_dir)

    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"[{key}] column mismatch: spark={sorted(s_pdf.columns)} "
        f"duckdb={sorted(d_pdf.columns)}"
    )
    s_pdf = s_pdf[sorted(s_pdf.columns)]
    d_pdf = d_pdf[sorted(d_pdf.columns)]

    assert len(s_pdf) == len(d_pdf), (
        f"[{key}] row count: spark={len(s_pdf)} duckdb={len(d_pdf)}"
    )

    # Pandas dtype-kind parity: this is what the old fetchall() comparator
    # could not see, and what actually decides the driver's hash.
    sk, dk = _dtype_kinds(s_pdf), _dtype_kinds(d_pdf)
    kind_diffs = {c: (sk[c], dk[c]) for c in s_pdf.columns if sk[c] != dk[c]}
    if kind_diffs:
        raise AssertionError(
            f"[{key}] pandas dtype-kind mismatch (spark_kind, duck_kind): "
            f"{kind_diffs} — dtypes spark={dict(s_pdf.dtypes.astype(str))} "
            f"duck={dict(d_pdf.dtypes.astype(str))}"
        )

    s_norm = _canon_rows(s_pdf, key, "spark")
    d_norm = _canon_rows(d_pdf, key, "duck")

    if s_norm != d_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ][:5]
        msg = [
            f"[{key}] value mismatch ({len(s_norm)} rows, cols={list(s_pdf.columns)})"
        ]
        for i, a, b in diffs:
            msg.append(f"  row {i}: spark={a}")
            msg.append(f"  row {i}: duck ={b}")
        raise AssertionError("\n".join(msg))
