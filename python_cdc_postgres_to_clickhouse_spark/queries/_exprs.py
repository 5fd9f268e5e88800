"""Expression helpers shared by declared queries.

The oracle harness hashes raw values, so floating-point aggregation must be
deterministic and engine-identical. Doubles summed in arbitrary order are
neither; DECIMAL sums are both. Inputs here are money-like doubles with ≤2
fractional digits, so casting to DECIMAL(18,6) is lossless, the sum is exact
on both engines, and the final cast back to DOUBLE picks the same nearest
double on both sides.

At 100 TB these decimal aggregations remain map-side-combinable hash
aggregates (partial_sum over decimal is supported by Tungsten); the cast adds
no shuffle and keeps whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark decimal(18,6) * decimal(18,6) → decimal(37,12): exact, no overflow for
# money magnitudes at any realistic scale; sum widens precision to 38.
DEC = "decimal(18,6)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum ÷ count, divided as doubles.

    Spark's and DuckDB's decimal *division* rounding rules differ, so do the
    division in double space where IEEE754 guarantees identical results for
    identical inputs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c).cast("double")).alias(alias)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal at scale 6.

    The product of a 2-decimal price and 2-decimal discount factor has ≤4
    fractional digits, so the rescale from the engines' (37,12) product type
    back to scale 6 is lossless. Keeping the summed scale at 6 matters:
    DuckDB casts DECIMAL→DOUBLE through its hugeint representation, which
    loses bits once value×10^scale exceeds 2^53 — at scale 6 the sums stay
    exactly representable and both engines round identically.
    """
    return (dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))).cast(DEC)


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal
    at scale 6 (≤6 fractional digits: 2 price + 2 disc + 2 tax)."""
    f = (F.lit(1).cast(DEC) - dec("l_discount")) * (F.lit(1).cast(DEC) + dec("l_tax"))
    return (dec("l_extendedprice") * f).cast(DEC)


# SQL-side equivalents (DuckDB syntax == ANSI here).
SQL_DEC = "DECIMAL(18,6)"

# DuckDB equivalent of textstats.normalized() — the two MUST stay in
# lockstep or every text-query oracle desynchronizes from the Spark side.
SQL_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
SQL_DISC_PRICE = (
    f"CAST(CAST(l_extendedprice AS {SQL_DEC}) * "
    f"(CAST(1 AS {SQL_DEC}) - CAST(l_discount AS {SQL_DEC})) AS {SQL_DEC})"
)
SQL_CHARGE = (
    f"CAST(CAST(l_extendedprice AS {SQL_DEC}) * "
    f"((CAST(1 AS {SQL_DEC}) - CAST(l_discount AS {SQL_DEC})) * "
    f"(CAST(1 AS {SQL_DEC}) + CAST(l_tax AS {SQL_DEC}))) AS {SQL_DEC})"
)


def sql_dsum(inner: str, alias: str) -> str:
    return f"CAST(SUM(CAST({inner} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(inner: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({inner} AS {SQL_DEC})) AS DOUBLE)"
        f" / CAST(COUNT({inner}) AS DOUBLE) AS {alias}"
    )
