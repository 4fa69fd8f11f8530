"""Hash-stable aggregate builders (Spark Column + DuckDB SQL twins).

The driver verifies every query by order-insensitive VALUE HASH against
a DuckDB oracle (``__spark_entry__.py`` docstring). Double-precision
sums are not associative, so a plain ``SUM(double)`` can differ between
Spark's partial/final aggregation and DuckDB's scan order by a few
ULPs — enough to break the hash. Convention used by every query here:

- **Sums** go through ``DECIMAL(38,10)``: the double→decimal cast is a
  deterministic rounding of the exact binary value, and decimal
  addition is exact and associative, so both engines produce the
  identical decimal; the final cast back to double is correctly
  rounded in both. Engine-agnostic by construction.
- **Averages** = exact-decimal sum (as double) / count — one IEEE
  division, bit-identical in both engines.
- **Std/variance** are derived from exact sums with the *same* double
  expression on both sides (sqrt(max(0, s2/n − (s1/n)²))) — IEEE ops
  are correctly rounded, so bit-identical.
- **Transcendentals** (exp/atan2/…) are not correctly rounded in
  either engine → round scalar outputs to 6 dp on both sides.

This costs one decimal conversion per row in the aggregate — negligible
against shuffle cost at 100 TB — and buys bit-exact reproducibility,
which a production pipeline wants anyway (re-runs hash-identical).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dec_to_double(c: Column) -> Column:
    # decimal → string → double: string parsing is correctly rounded in
    # both engines, whereas DuckDB's direct decimal→double cast
    # (int128 * 1e-scale) is not. Keeps the hash engine-agnostic.
    return c.cast("string").cast("double")


def dsum(col: Column | str) -> Column:
    """Engine-agnostic sum of a double column (exact decimal path)."""
    return _dec_to_double(F.sum(_c(col).cast(DEC)))


def davg(col: Column | str) -> Column:
    """Engine-agnostic mean: exact sum / non-null count."""
    return dsum(col) / F.count(_c(col))


def dstd_pop(col: Column | str) -> Column:
    """Engine-agnostic population stddev from exact sums."""
    c = _c(col)
    n = F.count(c).cast("double")
    s1 = dsum(c)
    s2 = _dec_to_double(F.sum((c * c).cast(DEC)))
    m = s1 / n
    return F.sqrt(F.greatest(s2 / n - m * m, F.lit(0.0)))


def dvar_pop(col: Column | str) -> Column:
    c = _c(col)
    n = F.count(c).cast("double")
    s1 = dsum(c)
    s2 = _dec_to_double(F.sum((c * c).cast(DEC)))
    m = s1 / n
    return F.greatest(s2 / n - m * m, F.lit(0.0))


# --- DuckDB SQL twins (must mirror the expressions above exactly) ---


def sql_dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def sql_dstd_pop(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s1 = sql_dsum(expr)
    s2 = sql_dsum(f"({expr}) * ({expr})")
    m = f"({s1} / {n})"
    return f"SQRT(GREATEST({s2} / {n} - {m} * {m}, 0.0))"


def sql_dvar_pop(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s1 = sql_dsum(expr)
    s2 = sql_dsum(f"({expr}) * ({expr})")
    m = f"({s1} / {n})"
    return f"GREATEST({s2} / {n} - {m} * {m}, 0.0)"
