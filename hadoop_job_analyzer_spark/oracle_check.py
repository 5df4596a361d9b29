"""Driver-emulating differential checker: Spark query vs DuckDB oracle.

Replicates the driver's t2 comparison (row-count + schema + order-
insensitive value compare) so hash mismatches are caught locally at
sf0.001/sf0.01 before the driver sees them. Columns are sorted by NAME
before comparing (the driver does the same — column names must match
between queries() and oracle_sql()).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import Any

import duckdb

from .catalog import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell value to a cross-engine-comparable form."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        # Compare decimals by exact numeric value, independent of scale repr.
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if v == 0.0:
            return ("f", 0.0)  # collapse -0.0 / +0.0
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    return ("s", str(v))


def _sortable(row: tuple) -> tuple:
    return tuple((x is None, repr(x)) for x in row)


def compare(spark_df, sql: str, sf_dir: str, key: str = "?") -> None:
    """Raise AssertionError with a diff preview on any mismatch."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{key}] column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{key}] row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_perm = [s_cols.index(c) for c in sorted(s_cols)]
    d_perm = [d_cols.index(c) for c in sorted(d_cols)]
    del order

    s_norm = sorted(
        (tuple(_norm(r[i]) for i in s_perm) for r in s_rows), key=_sortable
    )
    d_norm = sorted(
        (tuple(_norm(r[i]) for i in d_perm) for r in d_rows), key=_sortable
    )

    if s_norm != d_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ][:5]
        msg = [f"[{key}] value mismatch ({len(s_norm)} rows, cols={sorted(s_cols)})"]
        for i, a, b in diffs:
            msg.append(f"  row {i}: spark={a}")
            msg.append(f"  row {i}: duck ={b}")
        raise AssertionError("\n".join(msg))
