"""Scalar-function surface (SURVEY.md §2.4): string, date/time, math,
array, JSON, null-handling.

All expressions are JVM built-ins inside whole-stage codegen — no Python
UDFs anywhere on this path. Oracle caveats handled here:
- year()/month()/… return BIGINT in DuckDB, INT in Spark → oracle casts.
- Spark dayofweek is 1=Sunday; both engines agree on isodow via weekday+1.
- round() on doubles is engine-specific at ties → only applied where the
  result is tie-free (see c_array_vector docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textstats as TS
from ..registry import query
from ..tables import load_tables
from ._exprs import SQL_NORM, dec

# DuckDB token-array expression (mirrors operators/textstats.tokens).
_SQL_TOKENS_SC = f"string_split({SQL_NORM}, ' ')"


@query(
    "c_string_funcs",
    oracle=r"""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           CAST(length(c_name) AS INTEGER) AS name_len,
           substring(c_name, 10, 9) AS name_digits,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           trim(c_mktsegment) AS seg_trim,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT) AS key_from_name
    FROM customer
    """,
    tags=("scalar", "string"),
)
def c_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, length, substring, concat, pad, regexp."""
    t = load_tables(spark, sf_dir)
    return t["customer"].select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_extract("c_name", r"(\d+)", 1).cast("long").alias("key_from_name"),
    )


@query(
    "c_like_split",
    oracle="""
    SELECT p_partkey, p_name, p_type,
           split_part(p_name, ' ', 1) AS first_word,
           (p_type LIKE 'PROMO%') AS is_promo,
           (p_name LIKE '%o%') AS has_o
    FROM part
    WHERE p_brand LIKE 'Brand#1%' AND p_name NOT LIKE 'z%'
    """,
    tags=("scalar", "string"),
)
def c_like_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE predicates (pushed to the scan) + split."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_brand").like("Brand#1%") & ~F.col("p_name").like("z%"))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.split("p_name", " ").getItem(0).alias("first_word"),
            F.col("p_type").like("PROMO%").alias("is_promo"),
            F.col("p_name").like("%o%").alias("has_o"),
        )
    )


@query(
    "c_case_in_between",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS price_band,
           COUNT(*) AS n,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS n_hot,
           COUNT(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31'
                 THEN 1 END) AS n_1998
    FROM orders GROUP BY price_band
    """,
    tags=("scalar",),
)
def c_case_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / IN / BETWEEN predicates."""
    t = load_tables(spark, sf_dir)
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        t["orders"]
        .groupBy(band.alias("price_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1))
            ).alias("n_hot"),
            F.count(
                F.when(
                    F.col("o_orderdate").between("1998-01-01", "1998-12-31"), F.lit(1)
                )
            ).alias("n_1998"),
        )
    )


@query(
    "c_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_weekday,
           CAST(datediff('day', TIMESTAMP '1997-01-01', o_orderdate) AS INTEGER) AS days_since_97,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    tags=("scalar", "datetime"),
)
def c_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction, truncation, diffs, interval arithmetic."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.weekday("o_orderdate") + 1).alias("iso_weekday"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1997-01-01").cast("timestamp")
            ).alias("days_since_97"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        )
    )


@query(
    "c_math_funcs",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 100000) AS dist_from_100k,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderkey % 97 AS BIGINT) AS key_mod,
           CAST(sign(o_totalprice - 100000) AS DOUBLE) AS over_100k,
           sqrt(o_totalprice) AS price_sqrt,
           CAST(o_totalprice AS DOUBLE) * CAST(o_totalprice AS DOUBLE) AS price_sq
    FROM orders WHERE o_orderkey % 11 = 0
    """,
    tags=("scalar", "math"),
)
def c_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins (sqrt is IEEE-correctly-rounded → engine-identical;
    transcendentals ln/exp are libm-specific and deliberately excluded
    from the oracle surface)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 11 == 0)
        .select(
            "o_orderkey",
            F.abs(F.col("o_totalprice") - 100000).alias("dist_from_100k"),
            F.ceil("o_totalprice").alias("price_ceil"),
            F.floor("o_totalprice").alias("price_floor"),
            (F.col("o_orderkey") % 97).cast("long").alias("key_mod"),
            F.signum(F.col("o_totalprice") - 100000).alias("over_100k"),
            F.sqrt("o_totalprice").alias("price_sqrt"),
            # Square in IEEE-double space: double*double is correctly
            # rounded on both engines, unlike the DECIMAL(25,4) product
            # which routes through DuckDB's lossy hugeint→double path
            # (the round-1 hash mismatch).
            (
                F.col("o_totalprice").cast("double")
                * F.col("o_totalprice").cast("double")
            ).alias("price_sq"),
        )
    )


@query(
    "c_array_funcs",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[2] AS DOUBLE) AS e2,
           CAST(embedding[64] AS DOUBLE) AS e_last,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) AS head3_sum
    FROM embeddings WHERE vec_id % 5 = 0
    """,
    tags=("scalar", "array"),
)
def c_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array access over ArrayType(FloatType): size, element_at, element
    arithmetic. Output columns are scalars only — Spark hands array cells
    to pandas as Python lists while DuckDB hands numpy arrays, so
    array-typed outputs are not safely hashable across engines (the
    float32→double casts themselves are exact)."""
    t = load_tables(spark, sf_dir)
    e = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return (
        t["embeddings"]
        .filter(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            e(1).alias("e1"),
            e(2).alias("e2"),
            e(64).alias("e_last"),
            (e(1) + e(2) + e(3)).alias("head3_sum"),
        )
    )


@query(
    "c_json_funcs",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 80
    """,
    tags=("scalar", "json"),
)
def c_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the string props column (reference envelope
    analog: events arrive as serialized payloads; SURVEY §2.4 map/JSON)."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t["events"]
        .select("event_id", "event_type", k.alias("k"))
        .filter(F.col("k") > 80)
    )


@query(
    "c_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
           (c_acctbal IS NOT DISTINCT FROM 0.0) AS bal_is_zero,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           ifnull(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, -1) AS bal_filled
    FROM customer
    """,
    tags=("scalar", "null"),
)
def c_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif/coalesce/ifnull + null-safe equality."""
    t = load_tables(spark, sf_dir)
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return t["customer"].select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.col("c_acctbal").eqNullSafe(F.lit(0.0)).alias("bal_is_zero"),
        bal_nonneg.alias("bal_nonneg"),
        F.coalesce(bal_nonneg, F.lit(-1.0)).alias("bal_filled"),
    )


@query(
    "c_explode_outer",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      list_filter({_SQL_TOKENS_SC}, x -> len(x) > 5) AS arr
               FROM documents)
    SELECT doc_id, unnest(arr) AS tok FROM t WHERE len(arr) > 0
    UNION ALL SELECT doc_id, NULL AS tok FROM t WHERE len(arr) = 0
    """,
    tags=("scalar", "explode", "nulls"),
)
def c_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer null semantics: documents whose filtered token array
    is empty must survive as a (doc_id, NULL) row — plain explode silently
    drops them, which in a pipeline means silently losing documents. The
    oracle emulates outer-explode as unnest ∪ null-rows; both sides stay
    narrow (no shuffle)."""
    t = load_tables(spark, sf_dir)
    arr = F.filter(TS.tokens(), lambda x: F.length(x) > 5)
    return t["documents"].select(
        "doc_id", F.explode_outer(arr).alias("tok")
    )


@query(
    "c_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           {'st': o_orderstatus, 'pr': o_orderpriority}.st AS st_field,
           ({'a': o_orderstatus} = {'a': 'F'}) AS is_f,
           {'k': o_orderkey, 'p': o_totalprice}.p AS price_field
    FROM orders WHERE o_orderkey % 11 = 0
    """,
    tags=("scalar", "struct"),
)
def c_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct surface: construction (named fields), field access,
    and whole-struct equality — the building blocks of typed nested
    columns. All narrow row-local expressions inside one codegen stage."""
    t = load_tables(spark, sf_dir)
    s1 = F.struct(
        F.col("o_orderstatus").alias("st"), F.col("o_orderpriority").alias("pr")
    )
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 11 == 0)
        .select(
            "o_orderkey",
            s1.getField("st").alias("st_field"),
            (
                F.struct(F.col("o_orderstatus").alias("a"))
                == F.struct(F.lit("F").alias("a"))
            ).alias("is_f"),
            F.struct(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
            .getField("p")
            .alias("price_field"),
        )
    )
