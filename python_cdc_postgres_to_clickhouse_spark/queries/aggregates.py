"""Aggregation surface (SURVEY.md §2.4): group-by aggregates, distinct,
approx-distinct, conditional agg, rollup/cube/grouping sets, having, pivot,
moment statistics.

All money sums go through exact DECIMAL accumulation (see _exprs) so the
oracle hash is bit-stable. Every aggregate here is map-side combinable
(partial hash agg) — at 100 TB the shuffle carries only per-group partial
states, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_tables
from ._exprs import davg, dec, dsum, sql_davg, sql_dsum


@query(
    "a_groupby_orders",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')},
           {sql_davg('o_totalprice', 'avg_price')},
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def a_groupby_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basic group-by with count/sum/avg/min/max."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
            davg("o_totalprice", "avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "a_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting (expand + two-phase agg under the hood)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
    )


@query("a_approx_distinct", tags=("agg", "approx"))
def a_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    distinct (no expand, constant memory per group). No SQL oracle: HLL
    estimates are implementation-specific; tests assert relative error
    against the exact count instead (tests/test_aggregates.py)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        )
    )


@query("a_approx_quantiles", tags=("agg", "approx"))
def a_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch) — the 100 TB
    substitute for exact percentiles (mergeable sketch, no full sort). No
    SQL oracle: sketch boundaries are implementation-specific; relative
    error vs the exact median is asserted in tests/test_aggregates.py."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
            F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
        )
    )


@query(
    "a_argmax",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice * 10000000000 + o_orderkey) AS top_orderkey,
           arg_min(o_orderkey, o_totalprice * 10000000000 + o_orderkey) AS bottom_orderkey,
           MAX(o_totalprice) AS top_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def a_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregates): which order, not just which
    value. Plain max_by is nondeterministic under value ties, so the
    ordering key folds in the unique orderkey (price×10^10 + key stays
    exactly representable: < 2^53)."""
    t = load_tables(spark, sf_dir)
    okey = F.col("o_totalprice") * F.lit(10_000_000_000) + F.col("o_orderkey")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", okey).alias("top_orderkey"),
            F.min_by("o_orderkey", okey).alias("bottom_orderkey"),
            F.max("o_totalprice").alias("top_price"),
        )
    )


@query(
    "a_conditional",
    oracle=f"""
    SELECT l_linestatus,
           {sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END", 'returned_qty')},
           {sql_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice END", 'discounted_price')},
           COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS n_taxfree
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg",),
)
def a_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: sum(CASE WHEN …), count-if."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_linestatus")
        .agg(
            F.sum(
                dec(F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0))
            )
            .cast("double")
            .alias("returned_qty"),
            F.sum(dec(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))))
            .cast("double")
            .alias("discounted_price"),
            F.count(F.when(F.col("l_tax") == 0, F.lit(1))).alias("n_taxfree"),
        )
    )


@query(
    "a_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag, flag+status, grand total)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


@query(
    "a_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
    )


ROLLUP_GROUPING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("a_rollup_grouping", oracle=ROLLUP_GROUPING_SQL, tags=("agg",))
def a_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers — the standard way to tell a
    subtotal row's NULL apart from a genuine NULL grouping value."""
    load_tables(spark, sf_dir)
    return spark.sql(ROLLUP_GROUPING_SQL)


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("a_grouping_sets", oracle=GROUPING_SETS_SQL, tags=("agg",))
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same dialect as the oracle)."""
    load_tables(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


@query(
    "a_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    tags=("agg",),
)
def a_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "a_stats_moments",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_quantity * l_quantity', 'sum_qty_sq')},
           {sql_dsum('l_discount', 'sum_disc')},
           {sql_dsum('l_discount * l_discount', 'sum_disc_sq')}
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def a_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic moment statistics: exact decimal Σx and Σx² (variance/
    stddev derive from these driver-side; native stddev_samp is float-order
    nondeterministic and engine-specific, so the *moments* are the stable
    oracle surface). Squares of ≤2-decimal inputs have ≤4 fractional digits
    → scale-6 decimals stay lossless."""
    t = load_tables(spark, sf_dir)
    qty_sq = (dec("l_quantity") * dec("l_quantity")).cast("decimal(18,6)")
    disc_sq = (dec("l_discount") * dec("l_discount")).cast("decimal(18,6)")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
            F.sum(qty_sq).cast("double").alias("sum_qty_sq"),
            dsum("l_discount", "sum_disc"),
            F.sum(disc_sq).cast("double").alias("sum_disc_sq"),
        )
    )


@query(
    "a_groupby_expr",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders GROUP BY order_year, order_month
    """,
    tags=("agg",),
)
def a_groupby_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group by computed expressions (calendar rollup)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "a_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_F')},
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_O')}
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (oracle: conditional aggregation)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
    )


@query(
    "a_percentile_disc",
    oracle="""
    SELECT o_orderstatus,
           MAX(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.9*n) AS BIGINT) THEN o_totalprice END) AS p90
    FROM (SELECT o_orderstatus, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) rn,
                 COUNT(*) OVER (PARTITION BY o_orderstatus) n
          FROM orders) t
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "stats", "window"),
)
def a_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles per group (p50/p90 of order value): the
    value at rank ⌈p·n⌉ in sort order — an actual data point, engine-exact,
    unlike interpolating percentile_cont (whose arithmetic differs across
    engines) or approx sketches. One shuffle on the group key; rank + count
    share a single window partition pass; ties in price collapse to the
    same value so the row_number tiebreak cannot change the answer."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice")
    wp = W.partitionBy("o_orderstatus")
    ranked = t["orders"].select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def at(p: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        )

    return (
        ranked.groupBy("o_orderstatus")
        .agg(at(0.5).alias("p50"), at(0.9).alias("p90"))
        .orderBy("o_orderstatus")
    )


WEIGHTED_QUANTILE_SQL = """
WITH l AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS wgt
  FROM lineitem),
c AS (
  SELECT l_returnflag, v,
         SUM(wgt) OVER (PARTITION BY l_returnflag ORDER BY v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(wgt) OVER (PARTITION BY l_returnflag) AS tot
  FROM l)
SELECT l_returnflag,
       MIN(CASE WHEN cum * 2 >= tot THEN v END) AS wmedian_cents,
       MIN(CASE WHEN cum * 10 >= tot * 9 THEN v END) AS wp90_cents
FROM c GROUP BY l_returnflag
"""


@query("a_weighted_quantiles", oracle=WEIGHTED_QUANTILE_SQL, tags=("agg", "quantile"))
def a_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(0.5|0.9)(price, quantity)``: the
    smallest value whose cumulative weight reaches the level — exact
    weighted quantiles with quantity-weighted prices per return flag.

    All arithmetic is integer (cents values, bigint weights, cross-
    multiplied level comparisons), so both engines agree bit-for-bit —
    no interpolation formula to diverge on (see the verify note on
    percentile formulas). ONE exchange: hash(l_returnflag) satisfies both
    window specs (running RANGE cumsum + partition total) and the final
    aggregate — the group key prefixes every spec, so Spark re-sorts
    within partitions without re-shuffling; compute is the per-group sort,
    O(n log n), with a scan-pruned 3-column read."""
    l = load_tables(spark, sf_dir)["lineitem"].select(
        "l_returnflag",
        (dec("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("wgt"),
    )
    wc = (
        W.partitionBy("l_returnflag")
        .orderBy("v")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy("l_returnflag")
    c = l.select(
        "l_returnflag",
        "v",
        F.sum("wgt").over(wc).alias("cum"),
        F.sum("wgt").over(wt).alias("tot"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("v"))).alias(
            "wmedian_cents"
        ),
        F.min(F.when(F.col("cum") * 10 >= F.col("tot") * 9, F.col("v"))).alias(
            "wp90_cents"
        ),
    )


RANK_CORR_SQL = """
WITH r AS (
  SELECT event_type,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY value)
           + COUNT(*) OVER (PARTITION BY event_type, value) - 1 AS x,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY ts)
           + COUNT(*) OVER (PARTITION BY event_type, ts) - 1 AS y
  FROM events),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM r GROUP BY event_type)
SELECT event_type, n AS n_events,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
                 sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                      CAST(n * syy - sy * sy AS DOUBLE))
       END AS spearman
FROM s ORDER BY event_type
"""


@query("x_rank_corr", oracle=RANK_CORR_SQL, tags=("agg", "stats"))
def x_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation (ClickHouse ``rankCorr``; the
    dialect points here) between event value and event time per type —
    "do values drift over time?".

    Exactness recipe: average ranks for ties are carried DOUBLED so they
    stay integers (2·avgrank = rank_min + rank_max; the oracle spells the
    identical value as 2·min_rank + tie_count − 1), every moment
    is an integer sum in DECIMAL(38,0) (exact, order-insensitive), and
    only the final Pearson-over-ranks formula touches doubles — integer→
    double rounding, one IEEE multiply, sqrt, and divide are all
    correctly rounded, so the driver hash is bit-stable (DECIMAL(38,0)
    holds the n·Σx² term to n ≈ 10⁹ rows PER GROUP; beyond that, split
    groups or pre-scale). Zero-variance groups return NULL on both
    engines by an explicit guard (Spark NULLs on 0/0 where DuckDB gives
    inf — never rely on the engines' division edge cases).

    Scale: ALL FOUR window specs and the final aggregate cluster by
    hash(event_type) — ONE exchange, two in-partition sorts, no join (the
    rank-vs-rank formulation never materializes pairs). The doubled
    average rank is computed as rank_min + rank_max, with rank_max taken
    from a RANGE-frame running count over the SAME (event_type)
    partitioning — a (event_type, value)-partitioned tie count would
    force a second exchange (plan-asserted in test_plans.py)."""
    ev = load_tables(spark, sf_dir)["events"]
    DEC = "decimal(38,0)"
    wv = W.partitionBy("event_type").orderBy("value")
    wt = W.partitionBy("event_type").orderBy("ts")
    nv = wv.rangeBetween(W.unboundedPreceding, W.currentRow)
    nt = wt.rangeBetween(W.unboundedPreceding, W.currentRow)
    r = ev.select(
        "event_type",
        (F.rank().over(wv) + F.count(F.lit(1)).over(nv))
        .cast(DEC).alias("x"),
        (F.rank().over(wt) + F.count(F.lit(1)).over(nt))
        .cast(DEC).alias("y"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast(DEC)
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    rho = F.when(
        (vx == 0) | (vy == 0), F.lit(None).cast("double")
    ).otherwise(num / F.sqrt(vx.cast("double") * vy.cast("double")))
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        rho.alias("spearman"),
    ).orderBy("event_type")


CRAMERS_V_SQL = """
WITH cell AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2),
m AS (
  SELECT lang, source, o,
         CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cell),
t AS (
  SELECT lang, source, n,
         (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
         * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
         / (CAST(r AS DOUBLE) * c / n) AS term
  FROM m),
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS k_lang,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS k_source,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY lang, source)),
           (a, b) -> a + b) AS chi2
  FROM t)
SELECT n AS n_docs, k_lang, k_source, chi2,
       CASE WHEN least(k_lang - 1, k_source - 1) = 0 THEN NULL
            ELSE sqrt(chi2 / (n * least(k_lang - 1, k_source - 1)))
       END AS cramers_v,
       sqrt(chi2 / (chi2 + n)) AS contingency_coeff
FROM agg
"""


@query("x_cramers_v", oracle=CRAMERS_V_SQL, tags=("agg", "stats"))
def x_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV`` / ``contingency`` (the dialect points here):
    chi-square association between the documents' language and source —
    "does the corpus mix languages evenly across sources?", the standard
    check before per-source mixture weighting.

    Exactness recipe: the per-cell chi-square term is a fixed chain of
    IEEE double ops on exact integers (o, r, c, n < 2^53 convert exactly;
    multiply/divide/subtract are correctly rounded, identical on both
    engines), and the SUM over cells — the one order-sensitive step — is
    a LEFT FOLD OVER THE (lang, source)-SORTED term array on BOTH engines
    (Spark aggregate(array_sort(collect_list(struct))), DuckDB
    list_reduce(list(... ORDER BY))), so the additions associate
    identically and the driver hash is bit-stable. cramers_v /
    contingency_coeff are one deterministic sqrt each on top.

    Scale: the contingency table is bounded by |lang| x |source| (~100
    cells) regardless of corpus size — the first hash aggregate (with
    map-side partials) collapses 100 TB to those cells, and everything
    after runs on the 100-row frame (window marginals, ordered fold).
    One corpus-scale exchange; the later exchanges move only the
    bounded cells frame."""
    docs = load_tables(spark, sf_dir)["documents"]
    cell = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    m = cell.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(W.partitionBy("lang")).alias("r"),
        F.sum("o").over(W.partitionBy("source")).alias("c"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    d = F.col("o").cast("double") - e
    t = m.select(
        "lang", "source", "n", (d * d / e).alias("term")
    )
    agg = t.agg(
        F.max("n").alias("n"),
        F.countDistinct("lang").alias("k_lang"),
        F.countDistinct("source").alias("k_source"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(lang, source, term))), "
            "cast(0 as double), (a, x) -> a + x.term)"
        ).alias("chi2"),
    )
    k = F.least(F.col("k_lang") - 1, F.col("k_source") - 1)
    return agg.select(
        F.col("n").alias("n_docs"),
        "k_lang",
        "k_source",
        "chi2",
        F.when(k == 0, F.lit(None).cast("double"))
        .otherwise(F.sqrt(F.col("chi2") / (F.col("n") * k)))
        .alias("cramers_v"),
        F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))).alias(
            "contingency_coeff"
        ),
    )


# ---------------------------------------------------------------------------
# Engine-exact statistic counterparts of ClickHouse's two-sample test
# aggregates (kolmogorovSmirnovTest / welchTTest / mannWhitneyUTest). The
# dialect keeps the CH functions loud because their P-VALUES are
# transcendental (no bit-stable SQL); the STATISTICS themselves are exact
# integer/rational work plus a fixed chain of IEEE ops — these queries are
# the engine-native route those errors point at. All three collapse the
# two samples to the bounded distinct-cents histogram FIRST (one hash
# aggregate with map-side partials — the corpus-scale exchange), so the
# rank/ECDF windows run over the value grid, never the event rows.
# ---------------------------------------------------------------------------

_KS_SQL = """
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS c1,
         CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS c2
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY 1),
c AS (
  SELECT CAST(SUM(c1) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
         CAST(SUM(c1) OVER () AS BIGINT) AS n1,
         CAST(SUM(c2) OVER () AS BIGINT) AS n2
  FROM h)
SELECT MAX(n1) AS n1, MAX(n2) AS n2,
       CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_numer,
       CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
         / (MAX(n1) * MAX(n2)) AS d
FROM c
"""


@query("x_ks_test", oracle=_KS_SQL, tags=("agg", "stats"))
def x_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic (CH
    ``kolmogorovSmirnovTest``; the dialect points here) between the
    purchase and view value distributions. D's numerator max|cum1·n2 −
    cum2·n1| is an INTEGER — exact on both engines — and D itself is one
    final division; p-values stay out by the studentTTest contract.

    Scale: the samples collapse to the distinct-cents histogram first
    (one corpus-scale exchange); the ECDF running sums are ONE window
    over the bounded value grid."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("purchase", "view")
    )
    h = ev.groupBy(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c2"),
    )
    wc = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    c = h.select(
        F.sum("c1").over(wc).alias("cum1"),
        F.sum("c2").over(wc).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    d_num = F.max(
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    )
    return c.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        d_num.alias("d_numer"),
        (d_num.cast("double") / (F.max("n1") * F.max("n2"))).alias("d"),
    )


_WELCH_SQL = """
WITH s AS (
  SELECT CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n1,
         CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT)
                       * CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(round(value * 100) AS BIGINT)
                       * CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS q2
  FROM events WHERE event_type IN ('purchase', 'view'))
SELECT n1, n2, s1, s2, q1, q2,
       ((CAST(s1 AS DOUBLE) / n1) - (CAST(s2 AS DOUBLE) / n2))
         / sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                  / (n1 - 1) / n1
                + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                  / (n2 - 1) / n2) AS t,
       ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
          / (n1 - 1) / n1
        + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
          / (n2 - 1) / n2)
       * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
            / (n1 - 1) / n1
          + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
            / (n2 - 1) / n2)
       / (((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
             / (n1 - 1) / n1)
          * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
             / (n1 - 1) / n1) / (n1 - 1)
          + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
             / (n2 - 1) / n2)
          * ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
             / (n2 - 1) / n2) / (n2 - 1)) AS df
FROM s
"""


@query("x_welch_t", oracle=_WELCH_SQL, tags=("agg", "stats"))
def x_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic + Welch–Satterthwaite degrees of freedom (CH
    ``welchTTest``; the dialect points here) between purchase and view
    values. The moments are exact integer cents sums; t and df are fixed
    chains of IEEE ops spelled IDENTICALLY on both engines (a = s²₁/n₁
    and b = s²₂/n₂ always composed as (q − s·s/n)/(n−1)/n), so every
    intermediate rounds the same way → bit-stable hash. p-values stay
    out (studentTTest contract).

    Scale: ONE map-side-combined aggregate to a single row — no window,
    no join, the cheapest two-sample plan there is."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("purchase", "view")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    is1 = F.col("event_type") == "purchase"
    is2 = F.col("event_type") == "view"
    s = ev.agg(
        F.count(F.when(is1, 1)).alias("n1"),
        F.count(F.when(is2, 1)).alias("n2"),
        F.sum(F.when(is1, cents)).alias("s1"),
        F.sum(F.when(is2, cents)).alias("s2"),
        F.sum(F.when(is1, cents * cents)).alias("q1"),
        F.sum(F.when(is2, cents * cents)).alias("q2"),
    )
    # a, b composed EXACTLY as in the oracle text: (q - s*s/n)/(n-1)/n
    a = (
        (F.col("q1").cast("double")
         - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1"))
        / (F.col("n1") - 1) / F.col("n1")
    )
    b = (
        (F.col("q2").cast("double")
         - F.col("s2").cast("double") * F.col("s2").cast("double") / F.col("n2"))
        / (F.col("n2") - 1) / F.col("n2")
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    return s.select(
        "n1", "n2", "s1", "s2", "q1", "q2",
        ((m1 - m2) / F.sqrt(a + b)).alias("t"),
        ((a + b) * (a + b)
         / (a * a / (F.col("n1") - 1) + b * b / (F.col("n2") - 1))).alias("df"),
    )


_MWU_SQL = """
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY 1),
r AS (
  SELECT c1, c,
         CAST(COALESCE(SUM(c) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM h),
s AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c - c1) AS BIGINT) AS n2,
         CAST(SUM(c1 * (2 * cum_before + c + 1)) AS BIGINT) AS r1_x2,
         CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum
  FROM r)
SELECT n1, n2, r1_x2, tie_sum,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
       (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
         / (2 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                     * ((n1 + n2 + 1)
                        - CAST(tie_sum AS DOUBLE)
                          / ((n1 + n2) * (CAST(n1 AS DOUBLE) + n2 - 1)))))
         AS z
FROM s
"""


@query("x_mann_whitney_u", oracle=_MWU_SQL, tags=("agg", "stats"))
def x_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U statistic with tie-corrected normal z (CH
    ``mannWhitneyUTest``; the dialect points here) between purchase and
    view values. Doubled rank sums stay INTEGERS under average-rank ties
    (2·avgrank = 2·cum_before + c + 1 per value cell — the x_rank_corr
    device), so U·2, the tie term Σ(c³−c), and U1+U2 = n1·n2 are exact;
    z is one fixed IEEE chain on top. p-values stay out (studentTTest
    contract).

    Scale: collapse to the distinct-cents histogram first (corpus-scale
    exchange), ONE running-count window over the bounded value grid, one
    final single-row aggregate."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("purchase", "view")
    )
    h = ev.groupBy(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.lit(1)).alias("c"),
    )
    wb = W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    r = h.select(
        "c1",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("cum_before"),
    )
    s = r.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("cum_before") + F.col("c") + 1)
        ).alias("r1_x2"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_sum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1_x2 = F.col("r1_x2") - n1 * (n1 + 1)
    sigma2 = (
        n1.cast("double") * n2 / 12
        * ((n1 + n2 + 1)
           - F.col("tie_sum").cast("double")
             / ((n1 + n2) * (n1.cast("double") + n2 - 1)))
    )
    return s.select(
        "n1", "n2", "r1_x2", "tie_sum",
        u1_x2.cast("long").alias("u1_x2"),
        (2 * n1 * n2 - u1_x2).cast("long").alias("u2_x2"),
        ((u1_x2.cast("double") - (n1 * n2).cast("double"))
         / (2 * F.sqrt(sigma2))).alias("z"),
    )
