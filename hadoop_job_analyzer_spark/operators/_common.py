"""Shared helpers enforcing the float hash-match policy (SURVEY.md §5.3).

Double aggregation is order-dependent under parallelism, so raw double
sums never hash-match across engines. Policy:

- money-like sums: cast each addend to DECIMAL(38,4) *before* summing in
  BOTH engines (decimal addition is exact and associative), then cast
  the total to DOUBLE (deterministic conversion) so schemas stay simple;
- averages: exact decimal sum cast to double, divided by the bigint
  count — identical IEEE division in both engines;
- stddev/corr/cosine and other intrinsically-float results: round to a
  precision where cross-engine ulp noise cannot flip the rounded value.

The DuckDB oracle text must mirror these exactly; see each operator's
oracle string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6, NOT 4: derived money values like price*(1-disc)*(1+tax) of
# 2-dp inputs have up to 6 true decimal places. Casting a double to a
# decimal whose scale is LOWER than the value's true scale lands exactly
# on rounding ties (~10% of rows), which the engines break differently;
# with scale ≥ true scale the nearest-decimal rounding is unambiguous
# (the double sits ~1e-10 off the exact decimal, never halfway).
DEC = "decimal(38,6)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str) -> Column:
    """Exact sum: decimal-cast addends, double-cast total."""
    return F.sum(dec(col)).cast("double")


# Oracle-side (DuckDB) SQL fragments mirroring dec()/dsum().
def o_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
