"""Avro framing tests (SURVEY.md §7 hard part b): Confluent wire format vs
raw body — the silent-corruption path the reference's static decoder has
(read_from_kafka.py would feed header bytes to the Avro decoder)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_cdc_postgres_to_clickhouse_spark.sources.avro import (
    decode_user_record,
    decode_users,
    encode_user_record,
    frame_confluent,
)

ROWS = [
    (1, "alice", "alice@example.com", 1_700_000_000_000_000),
    (2, "bob", "bob@example.com", None),
    (3, "cenk-ünïcode", "cenk@example.com", 1_650_000_123_456_789),
    (-4, "negative-id", "neg@example.com", 0),
]


def _df(spark, payloads):
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(
        [(str(i), bytearray(p)) for i, p in enumerate(payloads)], schema=schema
    )


def test_codec_roundtrip_python():
    for id_, user, mail, ts in ROWS:
        rec = decode_user_record(encode_user_record(id_, user, mail, ts))
        assert rec == {"id": id_, "username": user, "email": mail, "created_at_us": ts}


@pytest.mark.parametrize("framing", ["confluent", "raw"])
def test_decode_users_both_framings(spark, framing):
    bodies = [encode_user_record(*r) for r in ROWS]
    payloads = (
        [frame_confluent(b, schema_id=7) for b in bodies]
        if framing == "confluent"
        else bodies
    )
    out = decode_users(_df(spark, payloads), framing=framing)
    got = {
        r["id"]: (r["username"], r["email"], r["created_at_us"])
        for r in out.collect()
    }
    assert got == {r[0]: (r[1], r[2], r[3]) for r in ROWS}


def test_framing_mismatch_detected(spark):
    """Registry-framed bytes decoded as raw must NOT silently produce the
    original rows (EP3's latent bug made explicit)."""
    framed = [frame_confluent(encode_user_record(*r), schema_id=7) for r in ROWS]
    out = decode_users(_df(spark, framed), framing="raw").collect()
    ok = {r[0]: (r[1], r[2], r[3]) for r in ROWS}
    got_wrong = sum(
        1
        for r in out
        if r["id"] in ok and ok[r["id"]] == (r["username"], r["email"], r["created_at_us"])
    )
    assert got_wrong == 0


def test_auto_framing_mixed_batch(spark):
    """framing='auto': framed and raw messages in one batch both decode
    (raw bodies here don't start with 0x00 — ids zigzag to nonzero)."""
    framed = [
        frame_confluent(encode_user_record(*r), schema_id=7) for r in ROWS[:2]
    ]
    raw = [encode_user_record(*r) for r in ROWS[2:]]
    out = decode_users(_df(spark, framed + raw), framing="auto")
    got = {r["id"]: r["username"] for r in out.collect()}
    assert got == {r[0]: r[1] for r in ROWS}


def test_auto_framing_ambiguity_documented(spark):
    """A raw record whose first varint is 0 starts with 0x00 — 'auto'
    mis-frames it (documented heuristic limitation, not silent: decoder
    returns nulls for it)."""
    ambiguous = encode_user_record(0, "zero-id", "z@x", None)
    assert ambiguous[0] == 0  # id=0 zigzags to 0x00, looks like magic
    out = decode_users(_df(spark, [ambiguous]), framing="auto").collect()
    assert out[0]["id"] is None  # dead-lettered, not silently wrong


def test_corrupt_records_go_permissive(spark):
    """F3: corrupt payloads yield null columns (dead-letter branch), good
    rows decode unaffected."""
    good = frame_confluent(encode_user_record(*ROWS[0]), schema_id=7)
    corrupt = b"\x00\x00\x00\x00\x07\xff\xff\xff"  # framed, truncated body
    out = decode_users(_df(spark, [good, corrupt]), framing="confluent")
    rows = out.collect()
    assert len(rows) == 2
    good_rows = [r for r in rows if r["id"] is not None]
    dead = [r for r in rows if r["id"] is None]
    assert len(good_rows) == 1 and len(dead) == 1
    assert good_rows[0]["username"] == "alice"


def test_confluent_header_fields(spark):
    from python_cdc_postgres_to_clickhouse_spark.sources.avro import (
        confluent_schema_id,
        is_confluent_framed,
    )

    framed = [frame_confluent(encode_user_record(*ROWS[0]), schema_id=123456)]
    df = _df(spark, framed)
    r = df.select(
        confluent_schema_id(F.col("value")).alias("sid"),
        is_confluent_framed(F.col("value")).alias("magic"),
    ).first()
    assert r["sid"] == 123456
    assert r["magic"] is True


def test_header_helpers_honor_renamed_column(spark):
    """The helpers must operate on the *passed* column, not a hardcoded
    'value' (round-1 review finding: an aliased payload column silently
    read the wrong data)."""
    from python_cdc_postgres_to_clickhouse_spark.sources.avro import (
        confluent_schema_id,
        is_confluent_framed,
        strip_confluent_header,
    )

    body = encode_user_record(*ROWS[0])
    framed = frame_confluent(body, schema_id=99)
    df = _df(spark, [framed]).withColumnRenamed("value", "payload")
    r = df.select(
        confluent_schema_id(F.col("payload")).alias("sid"),
        is_confluent_framed("payload").alias("magic"),
        strip_confluent_header(F.col("payload")).alias("body"),
    ).first()
    assert r["sid"] == 99
    assert r["magic"] is True
    assert bytes(r["body"]) == body


def test_engine_python_matches_auto(spark):
    """JVM-vs-Python engine parity. Only meaningful when spark-avro is on
    the classpath: without it 'auto' falls back to the same Python codec
    and the test would compare the Python path to itself — skip so a pass
    always means two engines actually agreed."""
    from python_cdc_postgres_to_clickhouse_spark.sources.avro import jvm_avro_available

    if not jvm_avro_available(spark):
        pytest.skip("spark-avro JAR absent: 'auto' falls back to the Python codec")
    payloads = [frame_confluent(encode_user_record(*r), schema_id=7) for r in ROWS]
    py = decode_users(_df(spark, payloads), framing="confluent", engine="python")
    auto = decode_users(_df(spark, payloads), framing="confluent", engine="auto")
    key = lambda r: (r["id"], r["username"], r["email"], r["created_at_us"])  # noqa: E731
    assert sorted(map(key, py.collect())) == sorted(map(key, auto.collect()))


def test_engine_jvm_explicit(spark):
    """engine='jvm' either takes the JVM from_avro path (JAR present:
    identical rows, zero EvalPython in the plan) or raises an actionable
    error (JAR absent — this container)."""
    from python_cdc_postgres_to_clickhouse_spark.sources.avro import jvm_avro_available

    payloads = [frame_confluent(encode_user_record(*r), schema_id=7) for r in ROWS]
    if jvm_avro_available():
        out = decode_users(_df(spark, payloads), framing="confluent", engine="jvm")
        got = {r["id"]: r["username"] for r in out.collect()}
        assert got == {r[0]: r[1] for r in ROWS}
        assert "EvalPython" not in out._jdf.queryExecution().executedPlan().toString()
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            decode_users(_df(spark, payloads), framing="confluent", engine="jvm")


def test_decoded_field_colliding_with_input_column_raises(spark):
    """A decoded field shadowing an existing column must fail loudly at the
    API edge, not as an Arrow schema/column-count mismatch deep in a task
    (the Python path used to silently clobber the input column)."""
    payloads = [frame_confluent(encode_user_record(*ROWS[0]), schema_id=7)]
    df = _df(spark, payloads).withColumn("id", F.lit(99))
    with pytest.raises(ValueError, match="collide"):
        decode_users(df, framing="confluent", engine="python")


def test_schema_driven_decoder_roundtrip_and_evolution(spark):
    """D5: the decoder is compiled from the Avro JSON schema, so an evolved
    schema (new nullable double field) changes the output columns without
    code changes — and the un-evolved decoder still reads v1 bytes."""
    import json

    from python_cdc_postgres_to_clickhouse_spark.sources.avro import decode_avro, encode_record

    v1 = json.dumps(
        {
            "type": "record",
            "name": "users",
            "fields": [
                {"name": "id", "type": "int"},
                {"name": "email", "type": "string"},
            ],
        }
    )
    v2 = json.dumps(
        {
            "type": "record",
            "name": "users",
            "fields": [
                {"name": "id", "type": "int"},
                {"name": "email", "type": "string"},
                {"name": "score", "type": ["null", "double"]},
            ],
        }
    )
    v2_rows = [
        {"id": 1, "email": "a@x", "score": 0.5},
        {"id": 2, "email": "b@x", "score": None},
    ]
    payloads = [encode_record(v2, r) for r in v2_rows]
    out = decode_avro(_df(spark, payloads), v2, framing="raw").collect()
    got = {r["id"]: (r["email"], r["score"]) for r in out}
    assert got == {1: ("a@x", 0.5), 2: ("b@x", None)}

    # v1 bytes (pre-evolution) decode under the v1 schema: fewer columns.
    v1_payloads = [encode_record(v1, {"id": 9, "email": "old@x"})]
    v1_out = decode_avro(_df(spark, v1_payloads), v1, framing="raw")
    assert "score" not in v1_out.columns
    assert v1_out.first()["email"] == "old@x"


def test_dict_wrapped_union_decodes(spark):
    """{'type': ['null','string']} (valid Avro, dict-wrapped union) must
    decode identically to the bare-list spelling — the branch-index varint
    must be consumed either way."""
    import json

    from python_cdc_postgres_to_clickhouse_spark.sources.avro import decode_avro, encode_record

    wrapped = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "int"},
                {"name": "email", "type": {"type": ["null", "string"]}},
            ],
        }
    )
    payloads = [
        encode_record(wrapped, {"id": 1, "email": "a@x"}),
        encode_record(wrapped, {"id": 2, "email": None}),
    ]
    out = {r["id"]: r["email"] for r in decode_avro(_df(spark, payloads), wrapped, framing="raw").collect()}
    assert out == {1: "a@x", 2: None}


def test_logical_type_rejected_by_python_codec():
    """logicalType fields must raise (the JVM from_avro path honors them;
    silently returning the raw primitive would make engine='auto' output
    depend on JAR presence)."""
    import json

    from python_cdc_postgres_to_clickhouse_spark.sources.avro import build_decoder

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                            "precision": 10, "scale": 2}},
            ],
        }
    )
    with pytest.raises(ValueError, match="logicalType"):
        build_decoder(schema)


def test_out_of_range_int_dead_letters_not_task_failure(spark):
    """A corrupt body whose 'id' varint decodes beyond int32 must null-route
    that one row (dead letter), not abort the Arrow batch at the columnar
    Int32 conversion."""
    import io as _io

    from python_cdc_postgres_to_clickhouse_spark.sources.avro import (
        _write_string,
        _write_varint,
    )

    buf = _io.BytesIO()
    _write_varint(buf, 2**40)        # 'int' field out of int32 range
    _write_string(buf, "user")
    _write_string(buf, "mail@x")
    _write_varint(buf, 1)            # created_at null branch
    corrupt = buf.getvalue()
    good = encode_user_record(*ROWS[0])
    rows = decode_users(_df(spark, [good, corrupt]), framing="raw").collect()
    assert len(rows) == 2
    assert {r["id"] for r in rows} == {ROWS[0][0], None}


# ---------------------------------------------------------------------------
# Property-based codec round-trip: random flat schemas x random values.
# (The dict-wrapped-union bug class would have been caught by exactly this.)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_PRIMS = ["int", "long", "string", "boolean", "float", "double", "bytes"]


def _value_for(prim):
    return {
        "int": st.integers(-(2**31), 2**31 - 1),
        "long": st.integers(-(2**63), 2**63 - 1),
        "string": st.text(max_size=40),
        "boolean": st.booleans(),
        "float": st.floats(width=32, allow_nan=False),
        "double": st.floats(allow_nan=False),
        "bytes": st.binary(max_size=40),
    }[prim]


@st.composite
def _schema_and_rows(draw):
    n_fields = draw(st.integers(1, 6))
    fields, row_strats = [], {}
    for i in range(n_fields):
        prim = draw(st.sampled_from(_PRIMS))
        nullable = draw(st.booleans())
        wrapped = draw(st.booleans())  # dict-wrapped spelling of the same type
        name = f"f{i}"
        if nullable:
            order = draw(st.booleans())
            ftype = ["null", prim] if order else [prim, "null"]
            if wrapped:
                ftype = {"type": ftype}
            row_strats[name] = st.one_of(st.none(), _value_for(prim))
        else:
            ftype = {"type": prim} if wrapped else prim
            row_strats[name] = _value_for(prim)
        fields.append({"name": name, "type": ftype})
    schema = {"type": "record", "name": "r", "fields": fields}
    rows = draw(st.lists(st.fixed_dictionaries(row_strats), min_size=1, max_size=5))
    return schema, rows


@given(_schema_and_rows())
@settings(max_examples=150, deadline=None)
def test_codec_roundtrip_property(schema_and_rows):
    """encode_record ∘ build_decoder == identity for every flat schema the
    Python codec claims to support, in every type spelling."""
    import json
    import math

    from python_cdc_postgres_to_clickhouse_spark.sources.avro import build_decoder, encode_record

    schema, rows = schema_and_rows
    sj = json.dumps(schema)
    decode, _spark_schema, _prims = build_decoder(sj)
    for row in rows:
        got = decode(encode_record(sj, row))
        for k, want in row.items():
            v = got[k]
            if isinstance(want, float) and not isinstance(want, bool):
                assert v == want or (math.isinf(want) and v == want), (k, want, v)
            else:
                assert v == want, (k, want, v)
