"""Golden replay: engine final state == DuckDB arg_max oracle == pandas oracle.

The analogue of the reference's AbstractKafkaBatchSourceTest golden-output
assertions, per SURVEY.md §5 item 1.
"""

import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.operators.resolve import dedup_events, final_state, last_writer_wins
from kafka_plugins_spark.replay import replay
from tests.util import assert_tables_equal, duckdb_final_state, pandas_final_state


def test_final_state_matches_duckdb_oracle(spark, events_path):
    ev = spark.read.parquet(events_path)
    got = final_state(ev).toPandas()
    assert_tables_equal(got, duckdb_final_state(events_path))


def test_final_state_matches_pandas_oracle(spark, events_path):
    ev = spark.read.parquet(events_path)
    got = final_state(ev).toPandas()
    assert_tables_equal(got, pandas_final_state(events_path))


@pytest.mark.parametrize("salt", [None, 1, 8, 32])
def test_salting_never_changes_the_winner(spark, events_path, salt):
    ev = spark.read.parquet(events_path)
    got = final_state(ev, salt_buckets=salt).toPandas()
    assert_tables_equal(got, duckdb_final_state(events_path))


def test_skewed_input_correct(spark, skew_events_path):
    ev = spark.read.parquet(skew_events_path)
    got = final_state(ev, salt_buckets=16).toPandas()
    assert_tables_equal(got, duckdb_final_state(skew_events_path))


def test_dedup_collapses_replays(spark, events_path):
    ev = spark.read.parquet(events_path)
    deduped = dedup_events(ev)
    assert deduped.count() == ev.dropDuplicates(["partition", "offset"]).count()
    # dedup then LWW == LWW directly (LWW subsumes dedup)
    a = final_state(deduped).toPandas()
    b = final_state(ev).toPandas()
    assert_tables_equal(a, b)


def test_lww_one_row_per_key(spark, events_path):
    ev = spark.read.parquet(events_path)
    w = last_writer_wins(ev)
    assert w.count() == ev.select("conv_id", "turn_idx").distinct().count()


def test_replay_end_to_end_single_commit(spark, events_path, tmp_path):
    table, results = replay(spark, events_path, str(tmp_path / "t"))
    assert len(results) == 1 and not results[0].skipped
    assert_tables_equal(table.read().toPandas(), duckdb_final_state(events_path))


def test_replay_chunked_equals_single_shot(spark, events_path, tmp_path):
    table, results = replay(spark, events_path, str(tmp_path / "t"), chunk_size=200)
    assert len(results) > 1
    assert_tables_equal(table.read().toPandas(), duckdb_final_state(events_path))
    # lineage ranges are contiguous and non-overlapping per partition
    lin = table.read_lineage().orderBy("partition", "start_offset").collect()
    by_part = {}
    for r in lin:
        by_part.setdefault(r["partition"], []).append((r["start_offset"], r["end_offset"]))
    for part, ranges in by_part.items():
        for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
            assert e0 == s1, f"gap/overlap in partition {part}: {ranges}"
        assert ranges[0][0] == 0


def test_no_python_row_udfs_in_plan(spark, events_path):
    """North rule: no per-row Python in the hot path (BatchEvalPython)."""
    ev = spark.read.parquet(events_path)
    plan = final_state(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_offset_range_scan_prunes(spark, events_path):
    from kafka_plugins_spark.sources.events import scan_events

    df = scan_events(spark, events_path, ranges={0: (10, 20), 1: (0, 5)})
    rows = df.select("partition", "offset").collect()
    assert rows
    for r in rows:
        p, o = r["partition"], r["offset"]
        assert (p == 0 and 10 <= o < 20) or (p == 1 and 0 <= o < 5)
    # the offset/partition predicates reach the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "offset" in plan


def test_max_records_cap(spark, events_path):
    from kafka_plugins_spark.sources.events import scan_events

    df = scan_events(spark, events_path, ranges={0: (0, 1 << 40)}, max_records_per_partition=7)
    assert df.count() <= 7 + 2  # + possible replay duplicates inside the range
    assert df.agg(F.max("offset")).first()[0] < 7


def test_wire_replay_matches_oracle(spark, events_path, tmp_path):
    """Full ingest path: wire-format (binary JSON) log → decode → replay."""
    from kafka_plugins_spark.datagen import write_wire_events

    wire = str(tmp_path / "wire")
    write_wire_events(spark.read.parquet(events_path), wire)
    table, results = replay(spark, wire, str(tmp_path / "t"), wire=True)
    assert not results[0].skipped
    assert_tables_equal(table.read().toPandas(), duckdb_final_state(events_path))
