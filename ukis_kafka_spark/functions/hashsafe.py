"""Hash-parity numeric helpers (SURVEY.md §2.2 rounding rules).

The driver compares Spark results against DuckDB via an
order-insensitive value-hash, so every derived double must be
*bit-identical* across the two engines.  Double summation is
order-dependent (partitioned partial aggregation vs sequential scan),
so any SUM/AVG over doubles is computed in exact decimal space:

- per-row arithmetic stays in IEEE double (deterministic and identical
  across engines for the same input bits),
- the per-row result is cast to ``DECIMAL(28,10)`` (safe for
  magnitudes < 1e17; rounding error of a double < 1e6 is « 0.5e-10 so
  both engines land on the same decimal),
- the SUM over decimals is exact and order-independent,
- the final value is cast straight back to double (correctly rounded,
  hence bit-identical in both engines).

Never ROUND a result: the corpus values are intrinsically 2–6 dp, so
decimal rounding hits exact ``.5`` ties where Spark (HALF_UP) and
DuckDB disagree. Casting an exact decimal to double has no ties.

At 100 TB this costs nothing extra: Spark's decimal sum is still a
hash aggregate with map-side partial aggregation; only the accumulator
type changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,10)"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(c: Column | str) -> Column:
    """Order-independent sum of a double column (exact decimal space)."""
    return F.sum(_c(c).cast(DEC))


def money_sum(c: Column | str) -> Column:
    """Exact, order-independent sum of a double column, as double."""
    return exact_sum(c).cast("double")


def exact_avg(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum cast to double, then a
    single double division — bit-identical in both engines."""
    return exact_sum(c).cast("double") / F.count(F.lit(1))


def oracle_exact_sum(expr: str) -> str:
    """DuckDB twin of :func:`exact_sum`."""
    return f"SUM(CAST({expr} AS DECIMAL(28,10)))"


def oracle_money_sum(expr: str) -> str:
    # Via VARCHAR: DuckDB 1.0's direct DECIMAL→DOUBLE cast is not
    # correctly rounded (hugeint / 10^scale in float space); string
    # parsing is, and matches Spark's BigDecimal.doubleValue exactly.
    return f"CAST(CAST({oracle_exact_sum(expr)} AS VARCHAR) AS DOUBLE)"


def oracle_exact_avg(expr: str) -> str:
    return f"({oracle_money_sum(expr)} / COUNT(*))"
