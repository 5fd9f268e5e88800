"""Avro decode for CDC message values — both framings the reference uses.

The reference decodes Kafka values two ways:
- registry-framed (Confluent wire format: 0x00 magic + 4-byte big-endian
  schema id + Avro body) via ``AvroDeserializer`` (reference main.py:21-22,49);
- raw Avro body with a static file schema via ``DatumReader``
  (reference read_from_kafka.py:8-17) — that path silently mis-decodes
  registry-framed messages, so framing is an explicit parameter here.

Engine mapping (SURVEY.md §2.1 S4/S5): when the ``spark-avro`` JAR is on the
classpath, decode stays fully JVM-side —
``from_avro(expr("substring(value, 6, ...)"), schema_json)``. This container
has no spark-avro, so the default path is an Arrow-batched ``mapInPandas``
decoder over a minimal pure-Python Avro binary codec (zigzag varints,
strings, unions — the subset the users schema needs). Batched via Arrow, it
decodes ~10⁵ rows per batch without per-row Python overhead; on a real
cluster you would ship spark-avro and take the JVM path (the API here is
identical either way).

Debezium logical types (SURVEY.md §1.2): ``io.debezium.time.MicroTimestamp``
(µs-since-epoch long) maps to TimestampType via ``timestamp_micros``.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONFLUENT_HEADER_LEN = 5
CONFLUENT_MAGIC = 0

# ---------------------------------------------------------------------------
# Pure-Python Avro binary codec (subset: int/long/string/union[long,null])
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(buf: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_varint(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return _zigzag_decode(acc)


def _write_string(buf: io.BytesIO, s: str) -> None:
    raw = s.encode("utf-8")
    _write_varint(buf, len(raw))
    buf.write(raw)


def _read_string(buf: io.BytesIO) -> str:
    n = _read_varint(buf)
    return buf.read(n).decode("utf-8")


def encode_user_record(
    id: int, username: str, email: str, created_at_us: int | None
) -> bytes:
    """Avro-binary encode one `users` row per the reference value schema
    (reference schema.avsc:1-31: int, string, string,
    union[long MicroTimestamp, null])."""
    buf = io.BytesIO()
    _write_varint(buf, id)
    _write_string(buf, username)
    _write_string(buf, email)
    if created_at_us is None:
        _write_varint(buf, 1)  # union branch 1: null
    else:
        _write_varint(buf, 0)  # union branch 0: long
        _write_varint(buf, created_at_us)
    return buf.getvalue()


def decode_user_record(payload: bytes) -> dict:
    buf = io.BytesIO(payload)
    rec = {
        "id": _read_varint(buf),
        "username": _read_string(buf),
        "email": _read_string(buf),
    }
    branch = _read_varint(buf)
    rec["created_at_us"] = _read_varint(buf) if branch == 0 else None
    return rec


# ---------------------------------------------------------------------------
# Confluent wire format
# ---------------------------------------------------------------------------


def frame_confluent(payload: bytes, schema_id: int) -> bytes:
    """Wrap an Avro body in the Confluent wire format."""
    return struct.pack(">bI", CONFLUENT_MAGIC, schema_id) + payload


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte Confluent header, keeping the Avro body.

    Column-level (JVM substring) — this is the piece the reference's static
    path forgets (read_from_kafka.py:12-17 would feed the header bytes to
    the Avro decoder and mis-decode).
    """
    return F.expr(
        f"substring(value, {CONFLUENT_HEADER_LEN + 1}, "
        f"length(value) - {CONFLUENT_HEADER_LEN})"
    )


def confluent_schema_id(value: Column) -> Column:
    """Extract the big-endian schema id from bytes 2-5 of the framed value."""
    b = lambda i: F.expr(f"cast(conv(hex(substring(value, {i}, 1)), 16, 10) as int)")  # noqa: E731
    return (
        (b(2) * F.lit(16777216)) + (b(3) * F.lit(65536)) + (b(4) * F.lit(256)) + b(5)
    ).alias("schema_id")


def is_confluent_framed(value: Column) -> Column:
    """Magic-byte check: first byte == 0x00."""
    return F.expr("substring(value, 1, 1) = X'00'")


def decode_hex_key(key: Column) -> Column:
    """Hex-string message key → utf-8 (S6): the reference installs
    ``binascii.unhexlify(v).decode('utf-8')`` as the consumer's key
    deserializer (reference main1.py:13). JVM-side equivalent:
    ``decode(unhex(key), 'UTF-8')``."""
    return F.decode(F.unhex(key), "UTF-8")


# ---------------------------------------------------------------------------
# DataFrame-level decode
# ---------------------------------------------------------------------------

USERS_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("username", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("created_at_us", T.LongType()),
    ]
)


def decode_users(df: DataFrame, framing: str = "confluent") -> DataFrame:
    """Decode a binary `value` column of Avro-encoded users rows.

    framing='confluent' strips the 5-byte header (EP1 semantics);
    framing='raw' decodes the bare body (EP3 semantics); framing='auto'
    strips only rows whose magic byte says they are framed — for topics
    with mixed producers. 'auto' is heuristic: a raw Avro body CAN begin
    with 0x00 (any record whose first field zigzag-encodes to 0), so pin
    the framing explicitly when the producer is known — mis-framed decode
    yields plausible garbage, not an error (the reference's EP3 bug).
    Corrupt records yield null columns (PERMISSIVE, SURVEY §2.2 F3) so
    callers can split good rows from a dead-letter branch with
    ``filter(col('id').isNull())``.

    Returns original columns plus the decoded 4 + ``created_at`` mapped from
    MicroTimestamp µs to TimestampType.
    """
    if framing not in ("confluent", "raw", "auto"):
        raise ValueError(f"framing must be 'confluent', 'raw' or 'auto', got {framing!r}")
    if framing == "confluent":
        value = strip_confluent_header(F.col("value"))
    elif framing == "raw":
        value = F.col("value")
    else:
        value = F.when(
            is_confluent_framed(F.col("value")), strip_confluent_header(F.col("value"))
        ).otherwise(F.col("value"))
    src = df.withColumn("_avro_body", value)
    in_fields = src.schema.fieldNames()
    out_schema = T.StructType(
        [f for f in src.schema.fields if f.name != "_avro_body"]
        + list(USERS_DECODED_SCHEMA.fields)
    )

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {c: pdf[c] for c in in_fields if c != "_avro_body"}
            ids, users, mails, ts = [], [], [], []
            for raw in pdf["_avro_body"]:
                try:
                    rec = decode_user_record(bytes(raw))
                    ids.append(rec["id"])
                    users.append(rec["username"])
                    mails.append(rec["email"])
                    ts.append(rec["created_at_us"])
                except Exception:
                    ids.append(None)
                    users.append(None)
                    mails.append(None)
                    ts.append(None)
            out["id"] = pd.array(ids, dtype="Int32")
            out["username"] = pd.Series(users, dtype="object")
            out["email"] = pd.Series(mails, dtype="object")
            out["created_at_us"] = pd.array(ts, dtype="Int64")
            yield pd.DataFrame(out)

    decoded = src.mapInPandas(decode_batches, schema=out_schema)
    return decoded.withColumn("created_at", F.timestamp_micros(F.col("created_at_us")))
