"""ClickHouse FORMAT-name mapping (formats.py): round-trips through the
mapped Spark sources, header/separator conventions, query_format
extraction, and the loud terminal/wire formats."""

from __future__ import annotations

import pytest

from python_cdc_postgres_to_clickhouse_spark import formats as FMT
from python_cdc_postgres_to_clickhouse_spark.dialect import DialectError


def _df(spark):
    return spark.sql(
        "SELECT * FROM VALUES (1, 'a', 1.5), (2, 'b', 2.5) AS t(id, s, v)"
    )


@pytest.mark.parametrize(
    "fmt", ["CSVWithNames", "TSVWithNames", "JSONEachRow", "Parquet", "ORC"]
)
def test_roundtrip_named_formats(spark, tmp_path, fmt):
    df = _df(spark)
    path = str(tmp_path / fmt)
    FMT.write(df, fmt, path)
    back = FMT.read(spark, fmt, path)
    got = sorted(
        (int(r["id"]), r["s"], float(r["v"])) for r in back.collect()
    )
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_headerless_formats_need_schema(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "tsv")
    FMT.write(df, "TabSeparated", path)
    back = FMT.read(spark, "TSV", path, schema="id INT, s STRING, v DOUBLE")
    rows = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
    assert rows == [(1, "a", 1.5), (2, "b", 2.5)]
    # separator really is a tab (read raw)
    raw = spark.read.text(path).collect()
    assert any("\t" in r["value"] for r in raw)


def test_query_format_extraction():
    assert FMT.query_format("SELECT 1 FORMAT JSONEachRow") == "JSONEachRow"
    assert FMT.query_format("SELECT 1 FORMAT CSVWithNames;") == "CSVWithNames"
    assert FMT.query_format("SELECT 1") is None
    # FORMAT inside a string/identifier position is not the trailing clause
    assert FMT.query_format("SELECT format FROM t") is None


def test_unsupported_formats_are_loud(spark, tmp_path):
    df = _df(spark)
    for fmt, hint in [
        ("Native", "Parquet"),
        ("Pretty", "df.show"),
        ("Values", "createDataFrame"),
        ("Arrow", "toArrow"),
        ("SomethingElse", "no Spark mapping"),
    ]:
        with pytest.raises(DialectError, match=hint):
            FMT.write(df, fmt, str(tmp_path / "x"))


def test_into_outfile_executes_and_strips(spark, tmp_path):
    from python_cdc_postgres_to_clickhouse_spark.dialect import translate

    out = translate(
        "SELECT 1 AS x INTO OUTFILE '/tmp/x' AND STDOUT "
        "COMPRESSION 'gzip' LEVEL 3 FORMAT CSVWithNames"
    )
    assert out == "SELECT 1 AS x"
    target = str(tmp_path / "out")
    df = FMT.execute(
        spark,
        f"SELECT 2 AS id, 'b' AS s INTO OUTFILE '{target}' "
        "FORMAT JSONEachRow",
    )
    assert df.collect()[0]["id"] == 2
    back = FMT.read(spark, "JSONEachRow", target)
    assert back.collect()[0]["s"] == "b"
    assert FMT.outfile_target("SELECT 1") is None
