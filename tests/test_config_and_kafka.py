"""Unit tests for config validation + Kafka option builders (pure functions)."""

import json

import pytest

from kafka_plugins_spark.config import ConfigError, IngestConfig
from kafka_plugins_spark.sources.kafka import (
    EARLIEST,
    LATEST,
    kafka_stream_options,
    max_offsets_per_trigger,
    partition_assignment,
    resolve_starting_offsets,
    validate_saved_offsets,
)


def test_config_ok():
    IngestConfig(events_path="/tmp/e", table_path="/tmp/t").validate()
    IngestConfig(brokers="k1:9092,k2:9092", topic="t", table_path="/tmp/t").validate()


def test_config_collects_all_failures():
    with pytest.raises(ConfigError) as ei:
        IngestConfig(
            brokers="nothostport",
            topic="",
            table_path="",
            max_rate_per_partition=0,
            principal="p",  # keytab missing
        ).validate()
    msgs = ei.value.failures
    assert len(msgs) >= 4  # all problems reported at once, FailureCollector-style


def test_starting_offsets_sentinels():
    assert resolve_starting_offsets("t", [0, 1], EARLIEST) == "earliest"
    assert resolve_starting_offsets("t", [0, 1], LATEST) == "latest"
    v = json.loads(resolve_starting_offsets("t", [0, 1, 2], EARLIEST, overrides={1: 5}))
    assert v == {"t": {"0": -2, "1": 5, "2": -2}}


def test_starting_offsets_invalid():
    with pytest.raises(ValueError):
        resolve_starting_offsets("t", [0], EARLIEST, overrides={0: -7})


def test_saved_offset_validation():
    validate_saved_offsets({0: 5}, earliest={0: 0}, latest={0: 10})
    with pytest.raises(ValueError) as ei:
        validate_saved_offsets(
            {0: 99, 1: 2, 2: 1}, earliest={0: 0, 1: 5}, latest={0: 10, 1: 8}
        )
    msg = str(ei.value)
    # aggregated: every bad partition named, like the reference's error string
    assert "partition 0" in msg and "partition 1" in msg and "partition 2" in msg


def test_partition_assignment():
    assert json.loads(partition_assignment("t", [2, 0])) == {"t": [0, 2]}


def test_max_offsets_per_trigger():
    assert max_offsets_per_trigger(1000, 4, 1.0) == 4000
    assert max_offsets_per_trigger(1000, 4, 0.5) == 2000


def test_stream_options_subscribe_vs_assign():
    o = kafka_stream_options("b:9092", "topic", n_partitions=4)
    assert o["subscribe"] == "topic" and "assign" not in o
    o = kafka_stream_options("b:9092", "topic", partitions=[0, 1], n_partitions=2)
    assert "subscribe" not in o and json.loads(o["assign"]) == {"topic": [0, 1]}
    assert o["failOnDataLoss"] == "true"


def test_kerberos_jaas_config():
    from kafka_plugins_spark.sources.kafka import kerberos_jaas_config

    opts = kerberos_jaas_config("svc/host@REALM", "/etc/sec.keytab")
    assert opts["kafka.sasl.mechanism"] == "GSSAPI"
    jaas = opts["kafka.sasl.jaas.config"]
    assert 'principal="svc/host@REALM"' in jaas and 'keyTab="/etc/sec.keytab"' in jaas


def test_topic_connector_option_construction(spark):
    """Topic-side browse/sample options build broker-free (C1 parity:
    KafkaConnector.java:81-134); only .load() needs a broker."""
    from kafka_plugins_spark.connector import KafkaTopicConnector
    from kafka_plugins_spark.sources.kafka import kerberos_jaas_config

    c = KafkaTopicConnector(spark, "b1:9092,b2:9092",
                            extra=kerberos_jaas_config("svc@REALM", "/keytabs/svc.kt"))
    b = c.browse_options()
    assert b["subscribePattern"] == ".*"
    assert b["startingOffsets"] == "earliest" and b["endingOffsets"] == "latest"
    assert b["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert b["kafka.sasl.mechanism"] == "GSSAPI"
    s = c.sample_options("transcripts")
    assert s["subscribe"] == "transcripts"
    assert s["endingOffsets"] == "latest" and s["failOnDataLoss"] == "false"
    # connectivity test degrades to False without a broker, never raises
    assert c.test() is False


def test_consumer_lag_report(spark, events_path, tmp_path):
    """Lag = end offsets minus committed watermarks, per partition; a
    partial replay shows positive lag, a completed one shows zero."""
    from kafka_plugins_spark.replay import replay
    from kafka_plugins_spark.sources.events import consumer_lag

    path = str(tmp_path / "t")
    table, _ = replay(spark, events_path, path, chunk_size=150, max_chunks=2)
    partial = consumer_lag(table, events_path)
    assert partial and any(v["lag"] > 0 for v in partial.values())
    for p, v in partial.items():
        assert v["end_offset"] >= v["watermark"] >= 0
    table, _ = replay(spark, events_path, path, chunk_size=150)
    done = consumer_lag(table, events_path)
    assert all(v["lag"] == 0 for v in done.values())
    assert all(v["watermark"] == v["end_offset"] for v in done.values())


def test_consumer_lag_counts_gaps_not_high_watermark(spark, tmp_path):
    """Gapped delivered intervals ([[0,10),[20,30)]) must report the
    10 missing offsets as lag, and the watermark must be the CONTIGUOUS
    prefix — not the high end that would hide the hole."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from kafka_plugins_spark.sources.events import consumer_lag
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    table.merge_into(
        last_writer_wins(_batch(spark, [(f"a{i}", "user", "x", "I", i) for i in range(10)])),
        batch_id=0,
    )
    table.merge_into(
        last_writer_wins(_batch(spark, [(f"b{i}", "user", "x", "I", 20 + i) for i in range(10)])),
        batch_id=1,
    )
    assert table.delivered_ranges()[0] == [(0, 10), (20, 30)]
    lag = consumer_lag(table, end_offsets={0: 30})
    assert lag[0] == {"start_offset": 0, "end_offset": 30, "watermark": 10, "lag": 10}
    # filling the hole zeroes the lag and advances the watermark
    table.merge_into(
        last_writer_wins(_batch(spark, [(f"c{i}", "user", "x", "I", 10 + i) for i in range(10)])),
        batch_id=2,
    )
    assert consumer_lag(table, end_offsets={0: 30})[0] == {
        "start_offset": 0, "end_offset": 30, "watermark": 30, "lag": 0,
    }


def test_consumer_lag_respects_retention_trimmed_start(spark, tmp_path):
    """r5 advice: a retention-trimmed log (nonzero beginning offset —
    the common production case) must not report offsets below the trim
    point as lag forever, and the watermark of a caught-up consumer must
    not stick at 0. Lag/watermark are computed over [start, end)."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from kafka_plugins_spark.sources.events import consumer_lag
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    # consumer has only what survives retention: offsets [20, 30)
    table.merge_into(
        last_writer_wins(_batch(spark, [(f"a{i}", "user", "x", "I", 20 + i) for i in range(10)])),
        batch_id=0,
    )
    # without start offsets the trimmed [0, 20) looks like permanent lag
    naive = consumer_lag(table, end_offsets={0: 30})
    assert naive[0]["lag"] == 20 and naive[0]["watermark"] == 0
    # with the broker's beginningOffsets the consumer is caught up
    trimmed = consumer_lag(table, end_offsets={0: 30}, start_offsets={0: 20})
    assert trimmed[0] == {
        "start_offset": 20, "end_offset": 30, "watermark": 30, "lag": 0,
    }
    # a never-consumed trimmed partition: watermark = start, lag = end-start
    empty = ParquetSnapshotTable(spark, str(tmp_path / "e"))
    rep = consumer_lag(empty, end_offsets={0: 30}, start_offsets={0: 20})
    assert rep[0] == {
        "start_offset": 20, "end_offset": 30, "watermark": 20, "lag": 10,
    }
    # delivered intervals entirely below start are ignored, partial
    # overlap counts only the in-range offsets
    assert consumer_lag(table, end_offsets={0: 30}, start_offsets={0: 25})[0] == {
        "start_offset": 25, "end_offset": 30, "watermark": 30, "lag": 0,
    }
