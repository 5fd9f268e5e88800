"""JSONEachRow decode: ClickHouse's newline-delimited-JSON Kafka format.

A ``CREATE TABLE … ENGINE = Kafka(…, 'JSONEachRow')`` queue receives Kafka
messages whose value is ONE OR MORE newline-separated JSON objects, each
object one row of the declared schema (CH docs: formats/JSONEachRow; the
reference provisions AvroConfluent, but JSONEachRow is CH's other standard
Kafka wire format). The Spark mapping:

- value bytes → string → split on newlines, blank lines dropped, explode
  (one message may carry several rows — CH reads them all);
- each line → ``from_json`` against the schema derived from the queue
  table's OWN translated column list (``DdlPlan.columns``) — the same
  schema-from-DDL contract the Avro path gets from the registry;
- malformed lines come back as a NULL struct, routed to a dead-letter
  frame instead of poisoning the batch (the F1-F3 error-routing contract,
  same split as sources/avro.py's PERMISSIVE decode).

Scale: pure narrow map (split/explode/from_json are codegen'd JVM
expressions; no UDF, no shuffle) — decode cost is linear in message bytes
exactly like the engine's own parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_schema_ddl(columns: list[tuple[str, str]]) -> str:
    """The from_json schema string for a translated column list."""
    return ", ".join(f"{n} {t}" for n, t in columns)


def decode_json_each_row(
    frames: DataFrame, columns: list[tuple[str, str]]
) -> tuple[DataFrame, DataFrame]:
    """Decode raw Kafka frames (a ``value`` binary/string column) into
    ``(rows, dead_letter)``: one output row per JSON line, dead letters
    carrying the offending line text verbatim."""
    # from_json is PERMISSIVE: an unparseable line yields all-NULL fields,
    # not a NULL struct — the corrupt-record column is the reliable flag.
    schema = row_schema_ddl(columns) + ", __corrupt STRING"
    lines = frames.select(
        F.explode(
            F.filter(
                F.split(F.col("value").cast("string"), "\n"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ).alias("__line")
    )
    parsed = lines.select(
        F.col("__line"),
        F.from_json(
            "__line", schema,
            {"columnNameOfCorruptRecord": "__corrupt"},
        ).alias("__row"),
    )
    bad = F.col("__row").isNull() | F.col("__row.__corrupt").isNotNull()
    rows = parsed.filter(~bad).select("__row.*").drop("__corrupt")
    dead = parsed.filter(bad).select(F.col("__line").alias("raw_line"))
    return rows, dead
