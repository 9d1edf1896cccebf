"""Column-expression helpers.

Parity-critical numeric policy (SURVEY.md §6/§8.3): double summation is
order-dependent, and Spark's partial/final aggregation order differs from
DuckDB's — so *sums of measures are computed in DECIMAL* (exact, associative)
and only cast back to DOUBLE in the final projection, where both engines
produce bit-identical values. Averages of bounded values are rounded to 6
decimals instead (error ~1e-12 << 1e-6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Enough integer digits for 100 TB-scale sums of 2-decimal measures.
MONEY_DECIMAL = "decimal(30,6)"


def money(col: Column | str) -> Column:
    """Cast a double measure to exact decimal before summation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY_DECIMAL)


def exact_sum(col: Column | str, alias: str) -> Column:
    """SUM in decimal, emitted as double — deterministic across engines.

    DuckDB oracle counterpart:
    ``CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS alias``.
    """
    return F.sum(money(col)).cast("double").alias(alias)
