"""ClickHouse FORMAT-name mapping onto Spark readers/writers.

The reference's users end queries with ``FORMAT JSONEachRow`` /
``FORMAT CSVWithNames`` and feed ``clickhouse-client`` dumps around
(reference repo: the provisioned ClickHouse surface; every CH
INSERT/SELECT can name a format). The dialect deliberately STRIPS the
FORMAT clause before Spark sees the query — result shape is the
DataFrame — so this module closes the loop: ``query_format(sql)``
recovers the stripped name, and ``write``/``read`` map it onto the
matching Spark source with CH's header/separator conventions.

Scale: every mapped format is a native Spark file source — distributed
write (one file per task), predicate/column pushdown on read where the
format supports it (Parquet/ORC). Terminal-only CH formats (Pretty*,
Vertical) and the wire-internal Native format raise loud with the
engine-native route, same contract as the dialect's loud functions.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .dialect import DialectError

# CH format name (lowercased) -> (spark format, reader/writer options).
_FORMATS: dict[str, tuple[str, dict[str, Any]]] = {
    "csv": ("csv", {"header": False, "sep": ","}),
    "csvwithnames": ("csv", {"header": True, "sep": ","}),
    "tsv": ("csv", {"header": False, "sep": "\t"}),
    "tabseparated": ("csv", {"header": False, "sep": "\t"}),
    "tsvwithnames": ("csv", {"header": True, "sep": "\t"}),
    "tabseparatedwithnames": ("csv", {"header": True, "sep": "\t"}),
    "jsoneachrow": ("json", {}),
    "ndjson": ("json", {}),
    "jsonlines": ("json", {}),
    "parquet": ("parquet", {}),
    "orc": ("orc", {}),
}

_UNSUPPORTED: dict[str, str] = {
    "native": "CH's wire-internal columnar format — use Parquet (same "
              "columnar role, splittable, stats-bearing)",
    "values": "SQL-literal tuples are for INSERT statements — use "
              "spark.createDataFrame or the JSONEachRow/CSV formats",
    "pretty": "terminal rendering — use df.show()",
    "prettycompact": "terminal rendering — use df.show()",
    "vertical": "terminal rendering — use df.show(vertical=True)",
    "arrow": "in-memory interchange — use df.toArrow() (PySpark 4) or "
             "mapInArrow for batch-level access",
    "arrowstream": "see Arrow",
    "avro": "requires the spark-avro package at write time — decode-side "
            "Avro is covered broker-less by sources/avro.py",
    "protobuf": "requires a compiled descriptor — use "
                "pyspark.sql.protobuf with an explicit descriptor file",
}


def _resolve(name: str) -> tuple[str, dict[str, Any]]:
    key = name.strip().lower()
    if key in _UNSUPPORTED:
        raise DialectError(f"FORMAT {name}: {_UNSUPPORTED[key]}")
    if key not in _FORMATS:
        raise DialectError(
            f"FORMAT {name} has no Spark mapping — supported: "
            + ", ".join(sorted(_FORMATS))
        )
    return _FORMATS[key]


def query_format(sql: str) -> str | None:
    """The FORMAT name a ClickHouse query ends with, or None.

    The dialect strips the clause during translation; call this FIRST on
    the original text when the consumer needs the output format (e.g.
    to route the result through ``write``).
    """
    m = re.search(r"(?i)\bFORMAT\s+(\w+)\s*;?\s*$", sql)
    return m.group(1) if m else None


def write(df: DataFrame, fmt: str, path: str, mode: str = "overwrite",
          **extra: Any) -> None:
    """Write ``df`` at ``path`` in the ClickHouse-named format ``fmt``."""
    spark_fmt, opts = _resolve(fmt)
    df.write.format(spark_fmt).mode(mode).options(**{**opts, **extra}).save(
        path
    )


def read(spark: SparkSession, fmt: str, path: str, schema=None,
         **extra: Any) -> DataFrame:
    """Read ``path`` written in the ClickHouse-named format ``fmt``.

    Pass ``schema`` for the headerless text formats (CSV/TSV) — CH
    clients carry the structure out of band there too ('format schemas');
    WithNames formats infer column names from the header and JSONEachRow
    from the keys.
    """
    spark_fmt, opts = _resolve(fmt)
    r = spark.read.format(spark_fmt).options(**{**opts, **extra})
    if schema is not None:
        r = r.schema(schema)
    elif spark_fmt == "csv" and opts.get("header"):
        r = r.option("inferSchema", True)
    return r.load(path)


def outfile_target(sql: str) -> str | None:
    """The ``INTO OUTFILE '<path>'`` target of a ClickHouse query, or
    None. The dialect strips the clause (client-side redirection);
    recover it here to route through ``write``."""
    m = re.search(r"(?i)\bINTO\s+OUTFILE\s+'([^']+)'", sql)
    return m.group(1) if m else None


def execute(spark: SparkSession, ch_sql: str, sf_dir: str | None = None,
            default_format: str = "TabSeparated") -> DataFrame:
    """Run a ClickHouse query end to end, honoring its output clauses:
    translate + execute via ``dialect.clickhouse_sql``; when the text
    carries ``INTO OUTFILE`` the result is also written there in the
    query's FORMAT (CH's default outfile format is TabSeparated).
    Returns the DataFrame either way."""
    from .dialect import clickhouse_sql

    df = clickhouse_sql(spark, ch_sql, sf_dir)
    target = outfile_target(ch_sql)
    if target is not None:
        write(df, query_format(ch_sql) or default_format, target)
    return df
