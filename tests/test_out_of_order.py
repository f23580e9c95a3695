"""Out-of-order batch delivery: the interval fence + order-aware merge.

Regression test for a real bug: a single high-watermark fence silently
DROPPED a late-arriving lower offset range ("already seen"), and a blind
anti-join merge let an older batch overwrite newer rows / resurrect
deleted keys. Kafka delivers per-partition in order, but file drops and
backfills don't — the engine must converge under any batch order.
"""

import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.lake import ParquetSnapshotTable, _merge_intervals
from kafka_plugins_spark.operators.resolve import last_writer_wins
from tests.util import assert_tables_equal, duckdb_final_state


@pytest.fixture(params=["cow", "mor"])
def mode(request):
    """Every out-of-order scenario must hold in BOTH write modes — the
    fence/LWW contract is mode-independent (MoR resolves at read)."""
    return request.param


def _apply_range(spark, table, events_path, lo, hi, batch_id):
    ev = spark.read.parquet(events_path).filter(
        (F.col("offset") >= lo) & (F.col("offset") < hi)
    )
    ranges = {
        int(r["partition"]): (int(r["lo"]), int(r["hi"]) + 1)
        for r in ev.groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    }
    return table.merge_into(last_writer_wins(ev), batch_id=batch_id, ranges=ranges)


def test_reversed_batch_order_converges(spark, events_path, tmp_path, mode):
    """Apply the SECOND half first, then the first half — final state must
    equal in-order replay byte-for-byte."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    r1 = _apply_range(spark, table, events_path, 400, 1 << 40, batch_id=1)
    r2 = _apply_range(spark, table, events_path, 0, 400, batch_id=0)
    assert not r1.skipped and not r2.skipped
    assert_tables_equal(table.read().toPandas(), duckdb_final_state(events_path))
    # delivered intervals collapsed to one contiguous range per partition
    for p, iv in table.delivered_ranges().items():
        assert len(iv) == 1 and iv[0][0] == 0, (p, iv)


def test_interleaved_thirds_converge(spark, events_path, tmp_path, mode):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    for i, (lo, hi) in enumerate([(300, 600), (0, 300), (600, 1 << 40)]):
        _apply_range(spark, table, events_path, lo, hi, batch_id=i)
    assert_tables_equal(table.read().toPandas(), duckdb_final_state(events_path))


def test_late_lower_range_not_fenced_out(spark, events_path, tmp_path, mode):
    """The exact data-loss scenario: high batch first → low batch must
    still be applied (not treated as replay)."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    _apply_range(spark, table, events_path, 200, 1 << 40, batch_id=1)
    rows_before = table.read().count()
    r = _apply_range(spark, table, events_path, 0, 200, batch_id=0)
    assert not r.skipped and r.rows_applied > 0
    assert table.read().count() > rows_before
    # and replaying the low range again IS fenced
    r2 = _apply_range(spark, table, events_path, 0, 200, batch_id=2)
    assert r2.skipped


def test_old_batch_cannot_resurrect_deleted_key(spark, tmp_path, mode):
    from kafka_plugins_spark.schema import CHANGE_EVENT

    rows = [
        ("c1", 0, "user", "v1", None, None, "I", 0, 0),
        ("c1", 0, "user", None, None, None, "D", 0, 5),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT)
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    # delete arrives first (offset 5), insert batch arrives later (offset 0)
    table.merge_into(
        last_writer_wins(df.filter("offset = 5")), batch_id=1, ranges={0: (5, 6)}
    )
    table.merge_into(
        last_writer_wins(df.filter("offset = 0")), batch_id=0, ranges={0: (0, 1)}
    )
    assert table.read().count() == 0  # tombstone at offset 5 wins


def test_compact_drops_tombstones_keeps_state(spark, events_path, tmp_path, mode):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    _apply_range(spark, table, events_path, 0, 1 << 40, batch_id=0)
    full_before = table._read_full().count()
    visible_before = table.read().count()
    assert full_before > visible_before  # tombstones exist
    res = table.compact()
    assert not res.skipped
    assert table._read_full().count() == visible_before
    assert_tables_equal(table.read().toPandas(), duckdb_final_state(events_path))
    # fence still holds after compaction
    r = _apply_range(spark, table, events_path, 0, 1 << 40, batch_id=1)
    assert r.skipped


def test_merge_intervals():
    assert _merge_intervals([(5, 10), (0, 5)]) == [(0, 10)]
    assert _merge_intervals([(0, 3), (7, 9), (2, 8)]) == [(0, 9)]
    assert _merge_intervals([(0, 2), (5, 6)]) == [(0, 2), (5, 6)]
    assert _merge_intervals([]) == []
