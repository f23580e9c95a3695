"""Decode formats (S6), sink serialization/partitioning (K1-K4), connector (C1)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from kafka_plugins_spark.connector import LakeConnector
from kafka_plugins_spark.functions.decode import (
    decode_transcript_events,
    decode_value,
    grok_to_regex,
    project_envelope,
)
from kafka_plugins_spark.sink import (
    NULL_KEY_ERROR,
    keyed_partition_expr,
    produce_to_log,
    publish_alerts,
    serialize_csv,
    serialize_json,
    split_dead_letters,
)


def kafka_frame(spark, values, keys=None):
    keys = keys or [None] * len(values)
    rows = [
        (k.encode() if k else None, v.encode(), "t", 0, i, None)
        for i, (k, v) in enumerate(zip(keys, values))
    ]
    schema = "key binary, value binary, topic string, partition int, offset long, timestamp timestamp"
    return spark.createDataFrame(rows, schema)


def test_envelope_projection(spark):
    df = kafka_frame(spark, ["hello"])
    out = project_envelope(df, key_field="k", partition_field="p", offset_field="o")
    assert out.columns == ["k", "p", "o", "value"]


def test_decode_binary_and_text(spark):
    df = kafka_frame(spark, ["payload"])
    assert decode_value(df, "binary").select("message").first()[0] == b"payload"
    assert decode_value(df, "text").select("message").first()[0] == "payload"


def test_decode_csv_tsv(spark):
    df = kafka_frame(spark, ["a,1,2.5"])
    out = decode_value(df, "csv", "x string, y int, z double")
    r = out.select("x", "y", "z").first()
    assert (r["x"], r["y"], r["z"]) == ("a", 1, 2.5)
    df = kafka_frame(spark, ["a\t1"])
    r = decode_value(df, "tsv", "x string, y int").select("x", "y").first()
    assert (r["x"], r["y"]) == ("a", 1)


def test_decode_json_permissive(spark):
    df = kafka_frame(spark, ['{"x": "a", "y": 1}', "NOT JSON"])
    out = decode_value(df, "json", T.StructType([
        T.StructField("x", T.StringType()), T.StructField("y", T.IntegerType())
    ]))
    rows = out.orderBy("offset").select("x", "y").collect()
    assert (rows[0]["x"], rows[0]["y"]) == ("a", 1)
    assert rows[1]["x"] is None and rows[1]["y"] is None  # malformed → nulls, no crash


def test_decode_clf(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    r = decode_value(kafka_frame(spark, [line]), "clf").first()
    assert r["remote_host"] == "127.0.0.1"
    assert r["auth_user"] == "frank"
    assert r["request"] == "GET /apache_pb.gif HTTP/1.0"
    assert r["status"] == 200 and r["content_length"] == 2326


def test_decode_clf_dash_length(spark):
    line = '10.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "HEAD / HTTP/1.1" 304 -'
    r = decode_value(kafka_frame(spark, [line]), "clf").first()
    assert r["status"] == 304 and r["content_length"] is None


def test_decode_syslog(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed for lonvick"
    r = decode_value(kafka_frame(spark, [line]), "syslog").first()
    assert r["priority"] == 34 and r["host"] == "mymachine"
    assert r["tag"] == "su" and r["pid"] == 230
    assert r["message"].startswith("'su root' failed")


def test_grok_compile_and_decode(spark):
    regex, names = grok_to_regex("%{IP:client} %{WORD:method} %{NOTSPACE:path} %{INT:status}")
    assert names == ["client", "method", "path", "status"]
    line = "1.2.3.4 GET /index.html 200"
    r = decode_value(kafka_frame(spark, [line]), "grok",
                     grok_expr="%{IP:client} %{WORD:method} %{NOTSPACE:path} %{INT:status}").first()
    assert (r["client"], r["method"], r["path"], r["status"]) == ("1.2.3.4", "GET", "/index.html", "200")


def test_grok_unknown_pattern():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        grok_to_regex("%{NOPE:x}")


def test_decode_transcript_events_roundtrip(spark):
    payload = {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",
               "tool": None, "ts": "2025-01-01T00:00:00Z", "op": "I"}
    df = kafka_frame(spark, [json.dumps(payload)])
    r = decode_transcript_events(df).first()
    assert r["conv_id"] == "c1" and r["op"] == "I" and r["offset"] == 0


def test_serialize_roundtrip(spark):
    df = spark.createDataFrame([("a", 1), ("b,x", 2)], "k string, v int")
    js = serialize_json(df).collect()
    assert json.loads(js[0]["value"]) == {"k": "a", "v": 1}
    quoted = serialize_csv(df, quoted=True).orderBy("value").collect()
    assert any('"b,x"' in r["value"] for r in quoted)  # proper quoting
    raw = serialize_csv(df, quoted=False).collect()
    assert any(r["value"] == "b,x,2" for r in raw)  # reference-compatible: none


def test_keyed_partition_deterministic_and_bounded(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    parts = df.select(keyed_partition_expr("k", 7).alias("p")).collect()
    assert all(0 <= r["p"] < 7 for r in parts)
    again = df.select(keyed_partition_expr("k", 7).alias("p")).collect()
    assert [r["p"] for r in parts] == [r["p"] for r in again]


def test_null_key_in_keyed_sink_fails(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    with pytest.raises(Exception, match=NULL_KEY_ERROR):
        df.select(keyed_partition_expr("k", 4)).collect()


def test_produce_to_log_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("c1", "hello"), ("c2", "world"), ("c1", "again")],
                               "conv_id string, text string")
    out = str(tmp_path / "topic")
    produce_to_log(df, out, key_col="conv_id", num_partitions=4)
    back = spark.read.parquet(out)
    assert back.count() == 3
    # keyed: same key → same partition
    assert back.filter(F.col("key") == "c1").select("partition").distinct().count() == 1
    # offsets contiguous from 0 per partition
    stats = back.groupBy("partition").agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"),
                                          F.count("*").alias("n")).collect()
    for r in stats:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1
    # payload survives
    texts = {json.loads(r["value"])["text"] for r in back.collect()}
    assert texts == {"hello", "world", "again"}


def test_alerts_and_dead_letters(spark, tmp_path):
    decoded = spark.createDataFrame(
        [("c1", "ok"), (None, None)], "conv_id string, text string"
    )
    good, dead = split_dead_letters(decoded, ["conv_id", "text"])
    assert good.count() == 1 and dead.count() == 1
    n = publish_alerts(dead.select(F.lit("decode_failure").alias("alert"), "conv_id"),
                       str(tmp_path / "alerts"))
    assert n == 1
    back = spark.read.json(str(tmp_path / "alerts"))
    assert json.loads(back.first()["value"])["alert"] == "decode_failure"


def test_connector_browse_and_sample(spark, events_path, tmp_path):
    from kafka_plugins_spark.replay import replay

    wh = tmp_path / "warehouse"
    replay(spark, events_path, str(wh / "transcripts"))
    replay(spark, events_path, str(wh / "transcripts_b"), mode="bucketed")
    c = LakeConnector(spark, str(wh))
    assert c.test()
    ents = {e.name: e for e in c.browse()}
    assert set(ents) == {"transcripts", "transcripts_b"}
    assert ents["transcripts"].snapshot_id == 0
    assert ents["transcripts"].rows_applied > 0
    assert ents["transcripts"].write_mode == "cow"
    assert ents["transcripts"].n_buckets is None
    assert ents["transcripts_b"].write_mode == "bucketed"
    assert ents["transcripts_b"].n_buckets == 16
    assert ents["transcripts_b"].live_data_dirs > 1  # layout, not MoR debt
    sample = c.sample("transcripts", limit=5)
    assert sample.count() == 5
    assert LakeConnector(spark, str(tmp_path / "missing")).test() is False


def test_salted_partition_deterministic_and_spreads(spark):
    from kafka_plugins_spark.sink import salted_partition_expr

    df = spark.createDataFrame(
        [("hot", f"payload-{i}") for i in range(200)], "k string, v string"
    ).repartition(8)
    expr = salted_partition_expr("k", 16, 4, salt_cols=["v"])
    first = df.select("v", expr.alias("p")).collect()
    # recomputation (simulated task retry) assigns identical partitions
    again = {r["v"]: r["p"] for r in df.select("v", expr.alias("p")).collect()}
    assert all(again[r["v"]] == r["p"] for r in first)
    # one hot key spreads over exactly salt_buckets partitions
    assert len({r["p"] for r in first}) == 4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        salted_partition_expr("k", 16, 4, salt_cols=[])


def test_dead_letters_any_required_null(spark):
    """OR semantics: one missing required field ⇒ dead."""
    decoded = spark.createDataFrame(
        [("c1", "ok"), ("c2", None), (None, "text"), (None, None)],
        "conv_id string, text string",
    )
    good, dead = split_dead_letters(decoded, ["conv_id", "text"])
    assert good.count() == 1 and dead.count() == 3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_dead_letters(decoded, [])


def test_unkeyed_produce_deterministic_across_layouts(spark, tmp_path):
    """Unkeyed ("round-robin") partitioning must be a pure function of
    the record — identical assignment regardless of how the input is
    partitioned (the task-retry recomputation scenario)."""
    from pyspark.sql import functions as F

    rows = [(i, f"payload-{i}") for i in range(200)]
    a = spark.createDataFrame(rows, "id long, body string").repartition(3)
    b = spark.createDataFrame(rows, "id long, body string").repartition(11)
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    produce_to_log(a, pa_, key_col=None, num_partitions=4)
    produce_to_log(b, pb, key_col=None, num_partitions=4)
    ra = {(r["value"], r["partition"]) for r in spark.read.parquet(pa_).collect()}
    rb = {(r["value"], r["partition"]) for r in spark.read.parquet(pb).collect()}
    assert ra == rb
    # and it actually balances
    n_parts = spark.read.parquet(pa_).select("partition").distinct().count()
    assert n_parts == 4


def test_decode_dlq_split(spark):
    """DLQ router: every input row lands in exactly one side; malformed
    JSON and missing-required are distinguished; the good side carries
    fully decoded CHANGE_EVENT columns."""
    from kafka_plugins_spark.functions.decode import decode_transcript_events_with_dlq

    rows = [
        ('{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","op":"U"}', 0, 10),
        ("{garbage", 0, 11),
        ('{"role":"user"}', 1, 12),  # valid JSON, missing conv_id/turn_idx/op
        ('{"conv_id":"c2","turn_idx":1,"role":"assistant","text":"y","op":"D"}', 1, 13),
        ('{"conv_id":"c3","op":"U"}', 2, 14),  # missing turn_idx
    ]
    frame = spark.createDataFrame(rows, "value string, partition int, offset long")
    good, dlq = decode_transcript_events_with_dlq(frame)
    g = good.collect()
    d = {r["offset"]: r["reason"] for r in dlq.collect()}
    assert {r["conv_id"] for r in g} == {"c1", "c2"}
    assert "_corrupt" not in good.columns
    assert d == {11: "malformed_json", 12: "missing_required", 14: "missing_required"}
    assert len(g) + len(d) == len(rows)


def test_publish_changes_round_trip_orders_pre_image_first(spark, tmp_path):
    """CDC-out: changelog → keyed offline topic log; one conversation in
    one partition, dense offsets, update_before before update_after."""
    import json

    from kafka_plugins_spark.lake import ParquetSnapshotTable
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from kafka_plugins_spark.sink import publish_changes
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    r1 = table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "a", "I", 0),
                                        ("k2", "user", "b", "I", 1)])),
        batch_id=0,
    )
    r2 = table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "a2", "U", 10),
                                        ("k2", None, None, "D", 11),
                                        ("k3", "user", "c", "I", 12)])),
        batch_id=1,
    )
    log = str(tmp_path / "log")
    publish_changes(table.changes_between(r1.snapshot_id, r2.snapshot_id), log)
    back = spark.read.parquet(log).collect()
    assert len(back) == 4  # update pair + delete + insert
    by_key = {}
    for r in back:
        by_key.setdefault(r["key"], []).append(r)
    # one partition per key; dense offsets within partition
    for k, rows in by_key.items():
        assert len({r["partition"] for r in rows}) == 1
    for p in {r["partition"] for r in back}:
        offs = sorted(r["offset"] for r in back if r["partition"] == p)
        assert offs == list(range(len(offs)))
    # pre-image precedes post-image for the updated key
    k1 = sorted(by_key["k1"], key=lambda r: r["offset"])
    kinds = [json.loads(r["value"])["_change_type"] for r in k1]
    assert kinds == ["update_before", "update_after"]
    assert json.loads(k1[1]["value"])["text"] == "a2"
    # value is self-describing JSON of the full change row
    d = json.loads(next(r["value"] for r in by_key["k2"]))
    assert d["_change_type"] == "delete" and d["conv_id"] == "k2"


def test_publish_changes_appends_and_continues_offsets(spark, tmp_path):
    """r5 advice: publishing successive changes_between increments to
    the SAME topic log must not clobber earlier ones — each publish
    appends, continuing every partition's offsets from the prior end,
    so a consumer tailing the log sees one monotone dense sequence."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from kafka_plugins_spark.sink import publish_changes
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    r1 = table.merge_into(
        last_writer_wins(_batch(spark, [(f"k{i}", "user", "a", "I", i) for i in range(6)])),
        batch_id=0,
    )
    r2 = table.merge_into(
        last_writer_wins(_batch(spark, [(f"k{i}", "user", "b", "U", 10 + i) for i in range(6)])),
        batch_id=1,
    )
    r3 = table.merge_into(
        last_writer_wins(_batch(spark, [(f"k{i}", None, None, "D", 20 + i) for i in range(3)])),
        batch_id=2,
    )
    log = str(tmp_path / "log")
    publish_changes(table.changes_between(r1.snapshot_id, r2.snapshot_id), log)
    first = {(r["partition"], r["offset"]) for r in spark.read.parquet(log).collect()}
    publish_changes(table.changes_between(r2.snapshot_id, r3.snapshot_id), log)
    back = spark.read.parquet(log).collect()
    # nothing from the first publish was clobbered
    assert first <= {(r["partition"], r["offset"]) for r in back}
    assert len(back) == 12 + 3  # 6 update pairs + 3 deletes
    # offsets stay dense and monotone per partition ACROSS publishes
    for p in {r["partition"] for r in back}:
        offs = sorted(r["offset"] for r in back if r["partition"] == p)
        assert offs == list(range(len(offs))), f"partition {p}: {offs}"


def test_publish_changes_empty_increment_is_noop_not_poison(spark, tmp_path):
    """Review finding: publishing an EMPTY increment first used to create
    a partition-less parquet dir whose footer read crashed every later
    publish to the path. It must be a no-op, and later publishes must
    work."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from kafka_plugins_spark.sink import publish_changes
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    r1 = table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "a", "I", 0)])), batch_id=0
    )
    log = str(tmp_path / "log")
    empty = table.changes_between(None, r1.snapshot_id).limit(0)
    publish_changes(empty, log)           # no-op, nothing written
    publish_changes(empty, log)           # still fine
    r2 = table.merge_into(
        last_writer_wins(_batch(spark, [("k2", "user", "b", "I", 1)])), batch_id=1
    )
    publish_changes(table.changes_between(r1.snapshot_id, r2.snapshot_id), log)
    back = spark.read.parquet(log).collect()
    assert len(back) == 1 and back[0]["offset"] == 0
