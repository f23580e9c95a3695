"""Pure-Python avro codec: spec byte-vectors, round-trips, Spark fallback.

The encoder/decoder follow the public Avro binary spec; byte vectors
below are the spec's own examples, so the round-trip tests aren't just
self-consistent.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.functions import avro_codec as ac
from kafka_plugins_spark.functions.decode import decode_value, encode_avro

REC = """{
  "type": "record", "name": "turn",
  "fields": [
    {"name": "conv_id", "type": "string"},
    {"name": "turn_idx", "type": "int"},
    {"name": "score", "type": "double"},
    {"name": "tool", "type": ["null", "string"]},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}}
  ]
}"""


def test_spec_byte_vectors():
    """Long zig-zag and string examples straight from the Avro spec."""
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                 (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert ac.encode_record("long", n) == b, n
        assert ac.decode_record("long", b) == n
    assert ac.encode_record("string", "foo") == b"\x06foo"
    assert ac.decode_record("string", b"\x06foo") == "foo"
    # array of longs [3, 27] per spec: 04 06 36 00
    sch = {"type": "array", "items": "long"}
    assert ac.encode_record(sch, [3, 27]) == b"\x04\x06\x36\x00"
    assert ac.decode_record(sch, b"\x04\x06\x36\x00") == [3, 27]


def test_record_roundtrip_with_union_and_logical():
    rec = {
        "conv_id": "c-1", "turn_idx": 7, "score": 0.5, "tool": None,
        "tags": ["a", "b"], "ts": dt.datetime(2024, 3, 1, 12, 30, 0, 123456),
    }
    schema = ac.parse_schema(REC)
    assert ac.decode_record(schema, ac.encode_record(schema, rec)) == rec
    rec["tool"] = "search"
    assert ac.decode_record(schema, ac.encode_record(schema, rec)) == rec


def test_malformed_decodes_to_none():
    schema = ac.parse_schema(REC)
    assert ac.decode_record(schema, b"\xff\xff") is None  # truncated varint
    assert ac.decode_record(schema, b"") is None
    assert ac.decode_record(schema, None) is None
    # trailing garbage is rejected too
    good = ac.encode_record(schema, {
        "conv_id": "x", "turn_idx": 1, "score": 1.0, "tool": None,
        "tags": [], "ts": dt.datetime(2024, 1, 1)})
    assert ac.decode_record(schema, good + b"\x00") is None


def test_spark_schema_mapping():
    st = ac.spark_schema_for(REC)
    assert [f.name for f in st.fields] == ["conv_id", "turn_idx", "score", "tool", "tags", "ts"]
    assert st["turn_idx"].dataType.simpleString() == "int"
    assert st["tool"].dataType.simpleString() == "string"
    assert st["tags"].dataType.simpleString() == "array<string>"
    assert st["ts"].dataType.simpleString() == "timestamp"


def test_spark_avro_roundtrip_permissive(spark):
    rows = [
        ("c1", 0, 1.5, None, ["x"], dt.datetime(2024, 5, 1, 8, 0, 0)),
        ("c2", 3, -2.25, "calc", [], dt.datetime(2024, 5, 2, 9, 30, 15, 250000)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double, tool string, tags array<string>, ts timestamp"
    )
    wire = encode_avro(df, REC, payload_cols=df.columns)
    assert wire.schema["value"].dataType.simpleString() == "binary"
    back = decode_value(wire, "avro", schema=REC)

    def norm(rows):
        return sorted(tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in rows)

    assert norm(back.select(*df.columns).collect()) == norm(df.collect())
    # malformed record → all message fields null (dead-letterable)
    bad = spark.createDataFrame([(bytearray(b"\xff\xff\xff"),)], "value binary")
    nulls = decode_value(bad, "avro", schema=REC).collect()[0]
    assert all(nulls[c] is None for c in df.columns)


def test_decode_avro_keeps_envelope(spark):
    df = spark.createDataFrame([("c1", 0, 0.0, None, [], dt.datetime(2024, 1, 1))],
                               "conv_id string, turn_idx int, score double, tool string, tags array<string>, ts timestamp")
    wire = encode_avro(df, REC, payload_cols=df.columns).withColumn(
        "partition", F.lit(3)).withColumn("offset", F.lit(42).cast("long"))
    out = decode_value(wire, "avro", schema=REC)
    row = out.first()
    assert row["partition"] == 3 and row["offset"] == 42 and row["conv_id"] == "c1"


# --- property tests: random records round-trip through the codec ---------

from hypothesis import given, settings
from hypothesis import strategies as st

_SCHEMA_PROP = """{
  "type": "record", "name": "p",
  "fields": [
    {"name": "s", "type": "string"},
    {"name": "n", "type": "long"},
    {"name": "i", "type": "int"},
    {"name": "d", "type": "double"},
    {"name": "b", "type": "boolean"},
    {"name": "u", "type": ["null", "string"]},
    {"name": "xs", "type": {"type": "array", "items": "long"}},
    {"name": "m", "type": {"type": "map", "values": "long"}},
    {"name": "raw", "type": "bytes"}
  ]
}"""

_rec = st.fixed_dictionaries({
    "s": st.text(max_size=50),
    "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "d": st.floats(allow_nan=False),
    "b": st.booleans(),
    "u": st.none() | st.text(max_size=20),
    "xs": st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=8),
    "m": st.dictionaries(st.text(max_size=8), st.integers(-(2**40), 2**40), max_size=5),
    "raw": st.binary(max_size=40),
})


@settings(max_examples=200, deadline=None)
@given(_rec)
def test_codec_roundtrip_property(rec):
    schema = ac.parse_schema(_SCHEMA_PROP)
    assert ac.decode_record(schema, ac.encode_record(schema, rec)) == rec


def test_spark_avro_roundtrip_with_nulls(spark):
    """Nullable columns: pandas NaN/NaT/None must round-trip as avro
    null, including a null in a LONG column (which pandas floats)."""
    sch = """{
      "type": "record", "name": "n",
      "fields": [
        {"name": "a", "type": ["null", "long"]},
        {"name": "b", "type": ["null", "double"]},
        {"name": "c", "type": ["null", "string"]},
        {"name": "t", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]}
      ]
    }"""
    rows = [(1, 1.5, "x", dt.datetime(2024, 1, 1)),
            (None, None, None, None),
            (7, None, "y", dt.datetime(2024, 2, 2, 3, 4, 5))]
    df = spark.createDataFrame(rows, "a long, b double, c string, t timestamp")
    back = decode_value(encode_avro(df, sch, payload_cols=df.columns), "avro", schema=sch)
    got = sorted(back.select("a", "b", "c", "t").collect(),
                 key=lambda r: (r["a"] is None, r["a"] or 0))
    want = sorted(df.collect(), key=lambda r: (r["a"] is None, r["a"] or 0))
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_corrupt_timestamp_varint_is_permissive():
    """A varint decoding to a year-10000+ timestamp must yield None, not
    an OverflowError escaping the task."""
    sch = ac.parse_schema('{"type":"record","name":"t","fields":'
                          '[{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}')
    huge = ac.encode_record("long", 1 << 60)
    assert ac.decode_record(sch, huge) is None


def test_encode_int_detection_is_structural(spark):
    """A float field whose TYPE JSON merely contains the substring "int"
    (a fixed named "fingerprint") must NOT be int-coerced, and timestamp
    logicals must stay datetimes. Regression for the substring test."""
    sch = """{
      "type": "record", "name": "t", "fields": [
        {"name": "score", "type": {"type": "fixed", "name": "fingerprint_int", "size": 4}},
        {"name": "ratio", "type": ["null", "double"]},
        {"name": "n", "type": ["null", "long"]},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}}
      ]}"""
    import datetime

    df = spark.createDataFrame(
        [(bytearray(b"\x01\x02\x03\x04"), 2.5, 7, datetime.datetime(2026, 1, 2, 3, 4, 5))],
        "score binary, ratio double, n long, ts timestamp",
    )
    wire = encode_avro(df, sch, payload_cols=df.columns)
    back = decode_value(wire, "avro", schema=sch)
    row = back.collect()[0]
    assert bytes(row["score"]) == b"\x01\x02\x03\x04"
    assert row["ratio"] == 2.5 and row["n"] == 7
    assert row["ts"] == datetime.datetime(2026, 1, 2, 3, 4, 5)
