"""Second-wave relational coverage: explode/TF counts, JSON maps, global
aggregates, classic TPC-H shapes adapted to the fixture schema, exact
moment-derived covariance/correlation, lateral subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import tokens
from ..registry import query
from ..tables import load_tables
from ._exprs import SQL_DISC_PRICE, disc_price, sql_dsum, SQL_NORM



@query(
    "m_token_tf_topn",
    oracle=f"""
    SELECT token, n FROM (
      SELECT token, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rn
      FROM (SELECT unnest(string_split({SQL_NORM}, ' ')) AS token FROM documents) t
      GROUP BY token) ranked
    WHERE rn <= 20
    """,
    tags=("ext", "text", "explode"),
)
def m_token_tf_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies via explode + groupBy, top 20 (X4 tf counts).
    At scale: explode is a narrow op; the count is a two-phase hash agg on
    the token — classic word-count, shuffle carries (token, partial_count)."""
    t = load_tables(spark, sf_dir)
    tf = (
        t["documents"]
        .select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return tf.orderBy(F.desc("n"), F.asc("token")).limit(20).select("token", "n")


@query(
    "m_json_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           (json_extract_string(props, '$.missing') IS NULL) AS missing_is_null
    FROM events WHERE event_id % 13 = 0
    """,
    tags=("scalar", "json", "map"),
)
def m_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → MapType: parse props into a map, list its keys, extract
    values, handle absent paths (SURVEY §2.4 map/JSON row)."""
    t = load_tables(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return (
        t["events"]
        .filter(F.col("event_id") % 13 == 0)
        .select(
            "event_id",
            F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
            F.element_at(m, "k").cast("long").alias("k_value"),
            F.element_at(m, "missing").isNull().alias("missing_is_null"),
        )
    )


@query(
    "m_global_agg_revenue",
    oracle=f"""
    SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      AND l_shipdate >= TIMESTAMP '1997-01-01'
    """,
    tags=("agg",),
)
def m_global_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filters into one global aggregate (no
    grouping — the entire table reduces to one row; partial aggregation
    makes the shuffle a single partial-state row per task)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "m_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
      SELECT l_orderkey,
             CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
             o_orderdate, o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) DESC,
                                l_orderkey) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority) t
    WHERE rn <= 10
    """,
    tags=("join", "topk"),
)
def m_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides, revenue per order,
    global top-10 (exact decimal revenue makes the ranking deterministic)."""
    t = load_tables(spark, sf_dir)
    agg = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    return (
        agg.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# Decimal scales are sized to the data (2-decimal values): DuckDB multiplies
# DECIMAL(≤18) pairs in int64 — (8,2)×(12,2) keeps every intermediate far
# below overflow — and all sums stay under 2^53 at their scale, so the
# DECIMAL→DOUBLE cast is exact on both engines. price² is excluded: its sum
# exceeds 2^53 at any lossless scale (see SCALE.md float-determinism notes).
COVAR_SQL = f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         {sql_dsum('l_quantity', 'sx')},
         {sql_dsum('l_extendedprice', 'sy')},
         {sql_dsum('l_discount', 'sd')},
         CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))
              AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)))
              AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_discount AS DECIMAL(8,2)))
              AS DOUBLE) AS sxd,
         CAST(SUM(CAST(l_discount AS DECIMAL(8,2)) * CAST(l_discount AS DECIMAL(8,2)))
              AS DOUBLE) AS sdd
  FROM lineitem
)
SELECT n,
       (sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS covar_samp_qty_price,
       (sxd - sx * sd / CAST(n AS DOUBLE))
         / (sqrt(sxx - sx * sx / CAST(n AS DOUBLE)) * sqrt(sdd - sd * sd / CAST(n AS DOUBLE)))
         AS corr_qty_disc
FROM s
"""


@query("m_covar_corr", oracle=COVAR_SQL, tags=("agg", "stats"))
def m_covar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance/correlation derived from exact decimal moments — the
    deterministic replacement for native covar_samp/corr (whose float
    accumulation is order- and engine-dependent). One pass, map-side
    combinable, same formula text on both engines → identical doubles."""
    t = load_tables(spark, sf_dir)
    d82 = lambda c: F.col(c).cast("decimal(8,2)")  # noqa: E731
    d18 = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    s = t["lineitem"].agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d18("l_quantity")).cast("double").alias("sx"),
        F.sum(d18("l_extendedprice")).cast("double").alias("sy"),
        F.sum(d18("l_discount")).cast("double").alias("sd"),
        F.sum(d82("l_quantity") * F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sxy"),
        F.sum(d82("l_quantity") * d82("l_quantity")).cast("double").alias("sxx"),
        F.sum(d82("l_quantity") * d82("l_discount")).cast("double").alias("sxd"),
        F.sum(d82("l_discount") * d82("l_discount")).cast("double").alias("sdd"),
    )
    n_d = F.col("n").cast("double")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n_d) / (F.col("n") - 1).cast("double")
    corr = (F.col("sxd") - F.col("sx") * F.col("sd") / n_d) / (
        F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / n_d)
        * F.sqrt(F.col("sdd") - F.col("sd") * F.col("sd") / n_d)
    )
    return s.select(
        "n",
        cov.alias("covar_samp_qty_price"),
        corr.alias("corr_qty_disc"),
    )


@query(
    "m_unpivot",
    oracle=f"""
    SELECT l_returnflag, metric,
           {sql_dsum('val', 'total')}
    FROM (
      SELECT l_returnflag, 'qty' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount' AS metric, l_discount AS val FROM lineitem
    ) u GROUP BY l_returnflag, metric
    """,
    tags=("setop", "unpivot"),
)
def m_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack(), then aggregate per metric —
    completes the pivot/unpivot pair (SURVEY §2.4)."""
    t = load_tables(spark, sf_dir)
    long = t["lineitem"].selectExpr(
        "l_returnflag",
        "stack(2, 'qty', l_quantity, 'discount', l_discount) AS (metric, val)",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.sum(F.col("val").cast("decimal(18,6)")).cast("double").alias("total")
    )


@query(
    "m_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "join"),
)
def m_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped >60 days
    after the order date, counted per priority (correlated EXISTS with a
    cross-table predicate → left-semi join after decorrelation)."""
    t = load_tables(spark, sf_dir)
    late_lines = t["lineitem"].select("l_orderkey", "l_shipdate")
    orders = t["orders"]
    matched = orders.join(
        late_lines,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


@query(
    "m_salted_agg",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('l_quantity', 'sum_qty')},
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew"),
)
def m_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: only 3 group keys means a plain groupBy
    funnels a third of the table into each final reducer; the salted
    two-phase spreads each key over n_salts partial reducers first. Oracle
    is the plain GROUP BY — results must be identical (decimal sums are
    associative, so the extra merge step is lossless)."""
    from ..operators.skew import salted_agg

    t = load_tables(spark, sf_dir)
    return salted_agg(
        t["lineitem"],
        keys=["l_returnflag"],
        partial_aggs=[
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_p_qty"),
            F.count(F.lit(1)).alias("_p_n"),
        ],
        final_aggs=[
            F.sum("_p_qty").cast("double").alias("sum_qty"),
            F.sum("_p_n").alias("n"),
        ],
        n_salts=16,
    )


@query(
    "m_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "string"),
)
def m_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: sort_array(collect_list) + array_join —
    deterministic regardless of row arrival order (a bare collect_list is
    partition-order-dependent and would never hash-match)."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
    )


MEDIAN_SQL = """
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
  FROM customer
)
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS median_acctbal,
       MAX(cnt) AS n_customers
FROM ranked
WHERE rn IN (floor((cnt + 1) / 2), floor((cnt + 2) / 2))
GROUP BY c_mktsegment
"""


@query("m_median_exact", oracle=MEDIAN_SQL, tags=("agg", "stats"))
def m_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median without interpolation arithmetic: pick the middle
    element(s) by row_number and average them in decimal — native
    percentile/median interpolation formulas differ between engines at the
    ulp level, element selection cannot. floor((n+1)/2) / floor((n+2)/2)
    are the lower/upper middles for both parities (`/` is float division
    in both dialects, hence the explicit floor)."""
    load_tables(spark, sf_dir)
    return spark.sql(MEDIAN_SQL)


@query(
    "m_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket,
           COUNT(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM orders GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def m_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor division (deterministic: floor of an
    IEEE double division is engine-identical), capped top bucket."""
    t = load_tables(spark, sf_dir)
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "m_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS volume
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
        AND n1.n_nationkey <> n2.n_nationkey
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join",),
)
def m_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume — the same dimension
    (nation) joined twice under different roles, grouped by the pair.
    Both nation sides broadcast (fixed-size dim at any scale)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (F.col("n1_key") < 5) & (F.col("n2_key") < 5)
            & (F.col("n1_key") != F.col("n2_key"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(disc_price()).cast("double").alias("volume"))
    )


@query(
    "m_disjunctive_bands",
    oracle=f"""
    SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type LIKE 'PROMO%' AND l_discount >= 0.08)
    """,
    tags=("join", "predicate"),
)
def m_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive band predicates across
    both join sides — exercises CNF conversion / partial pushdown (each
    disjunct's single-table conjuncts can still prune its own scan)."""
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (F.col("p_type").like("PROMO%") & (F.col("l_discount") >= 0.08))
    )
    return joined.filter(cond).agg(
        F.sum(disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


LATERAL_SQL = """
SELECT c_custkey, c_name, best.o_orderkey AS best_orderkey,
       best.o_totalprice AS best_price
FROM customer,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 1
) AS best
WHERE c_custkey % 4 = 0
"""


@query("m_lateral_top_order", oracle=LATERAL_SQL, tags=("subquery", "lateral"))
def m_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's single best order.
    Catalyst decorrelates to a window/aggregate join (DecorrelateInnerQuery)
    — no per-row execution."""
    load_tables(spark, sf_dir)
    return spark.sql(LATERAL_SQL)
