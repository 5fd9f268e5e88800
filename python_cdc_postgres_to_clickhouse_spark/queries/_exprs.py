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


# Sized casts for the hot product expressions: a (18,6)×(18,6) product is
# (37,12) — BigDecimal-backed on Spark, hugeint on DuckDB. Sizing the casts
# to the data domain (TPC-H extendedprice < 10^7 → (9,2); discount/tax ≤ 1 →
# (4,2)) keeps every intermediate ≤ precision 18 → compact-long arithmetic on
# both engines. Values are identical either way (all steps exact); measured
# ~20% off TPC-H Q1 wall time at sf0.1.
P92 = "decimal(9,2)"
F42 = "decimal(4,2)"


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal at scale 6.

    (9,2)×(5,2) → (15,4), long-backed; the rescale to scale 6 is lossless
    (the true product has ≤4 fractional digits). Keeping the summed scale
    at 6 matters: DuckDB casts DECIMAL→DOUBLE through its hugeint
    representation, which loses bits once value×10^scale exceeds 2^53 — at
    scale 6 the sums stay exactly representable and both engines round
    identically.
    """
    factor = F.lit(1).cast(F42) - F.col("l_discount").cast(F42)
    return (F.col("l_extendedprice").cast(P92) * factor).cast(DEC)


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal
    at scale 6 (≤6 fractional digits: 2 price + 2 disc + 2 tax).
    The (5,2)×(5,2) factor product is cast to (7,4) — lossless, its true
    value has ≤4 fractional digits and is < 10 — so the final multiply is
    (9,2)×(7,4) → (17,6), still long-backed."""
    f = (
        (F.lit(1).cast(F42) - F.col("l_discount").cast(F42))
        * (F.lit(1).cast(F42) + F.col("l_tax").cast(F42))
    ).cast("decimal(7,4)")
    return (F.col("l_extendedprice").cast(P92) * f).cast(DEC)


# SQL-side equivalents (DuckDB syntax == ANSI here).
SQL_DEC = "DECIMAL(18,6)"

# DuckDB equivalent of textstats.normalized() — the two MUST stay in
# lockstep or every text-query oracle desynchronizes from the Spark side.
SQL_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
SQL_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) "
    f"AS {SQL_DEC})"
)
SQL_CHARGE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * "
    "CAST((CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * "
    "(CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(7,4)) "
    f"AS {SQL_DEC})"
)


def sql_dsum(inner: str, alias: str) -> str:
    return f"CAST(SUM(CAST({inner} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(inner: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({inner} AS {SQL_DEC})) AS DOUBLE)"
        f" / CAST(COUNT({inner}) AS DOUBLE) AS {alias}"
    )
