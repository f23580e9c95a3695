"""Write-audit-publish staging: stage → audit exact bytes → publish/abort.

The Iceberg WAP pattern (spark.wap.id / branch commits) on the sandbox
backend. The properties pinned: a staged commit is invisible until
publish; the audit read IS the post-publish table; abort reclaims the
staged data and does NOT burn the batch's offsets (a re-merge applies);
an interleaved commit makes the stage stale and publish refuses.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.lake import ParquetSnapshotTable, StagedCommit


def _winners(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "op string, partition int, offset long",
    ).withColumn("ts", F.timestamp_seconds(F.col("offset") + 1_700_000_000))


B0 = [("c1", 0, "user", "hello", None, "I", 0, 0),
      ("c2", 0, "user", "draft", None, "I", 0, 1)]
B1 = [("c2", 0, "user", "final", None, "U", 0, 2),
      ("c3", 0, "user", "new", None, "I", 0, 3)]


@pytest.mark.parametrize("mode", [None, "mor"])
def test_stage_audit_publish_roundtrip(spark, tmp_path, mode):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    table.merge_into(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})
    head = table.current_snapshot()["snapshot_id"]

    staged = table.stage_merge(_winners(spark, B1), batch_id=1, ranges={0: (2, 4)})
    assert isinstance(staged, StagedCommit)
    # invisible: readers, snapshot listing, and watermarks are unchanged
    assert table.current_snapshot()["snapshot_id"] == head
    assert {r["conv_id"]: r["text"] for r in table.read().collect()} == {
        "c1": "hello", "c2": "draft"
    }
    assert table.watermarks() == {0: 2}
    # the audit surface is the exact post-publish table
    audit = {r["conv_id"]: r["text"] for r in table.read_staged(staged).collect()}
    assert audit == {"c1": "hello", "c2": "final", "c3": "new"}

    res = table.publish_staged(staged)
    assert res.snapshot_id == staged.snapshot_id
    assert {r["conv_id"]: r["text"] for r in table.read().collect()} == audit
    assert table.watermarks() == {0: 4}
    # fence covers the published ranges: a replay of the batch is a no-op
    assert table.merge_into(
        _winners(spark, B1), batch_id=1, ranges={0: (2, 4)}
    ).skipped
    # handle is spent
    with pytest.raises(ValueError, match="staged"):
        table.read_staged(staged)


@pytest.mark.parametrize("mode", [None, "mor"])
def test_abort_reclaims_data_and_does_not_burn_offsets(spark, tmp_path, mode):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    table.merge_into(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})
    before_dirs = set(os.listdir(str(tmp_path / "t" / "data")))

    staged = table.stage_merge(_winners(spark, B1), batch_id=1, ranges={0: (2, 4)})
    assert set(os.listdir(str(tmp_path / "t" / "data"))) > before_dirs
    table.abort_staged(staged)
    # staged data dir reclaimed, base dirs intact, no snapshot trace
    assert set(os.listdir(str(tmp_path / "t" / "data"))) == before_dirs
    assert table.current_snapshot()["snapshot_id"] == 0
    assert table.watermarks() == {0: 2}
    # offsets NOT burned: the batch re-applies after the abort
    res = table.merge_into(_winners(spark, B1), batch_id=1, ranges={0: (2, 4)})
    assert not res.skipped
    assert {r["conv_id"]: r["text"] for r in table.read().collect()} == {
        "c1": "hello", "c2": "final", "c3": "new"
    }


def test_stale_stage_refused_after_interleaved_commit(spark, tmp_path):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    table.merge_into(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})
    staged = table.stage_merge(_winners(spark, B1), batch_id=1, ranges={0: (2, 4)})
    # an interleaved commit lands (deletes c1) — the staged CoW rewrite
    # does not contain it, so publishing would resurrect c1
    table.merge_into(
        _winners(spark, [("c1", 0, None, None, None, "D", 0, 4)]),
        batch_id=2,
        ranges={0: (4, 5)},
    )
    with pytest.raises(RuntimeError, match="re-stage"):
        table.publish_staged(staged)
    # the interleaved state is intact and the abort path still works
    table.abort_staged(staged)
    assert {r["conv_id"] for r in table.read().collect()} == {"c2"}


def test_stage_on_empty_table_and_fence_skip_passthrough(spark, tmp_path):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    staged = table.stage_merge(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})
    assert table.current_snapshot() is None
    table.publish_staged(staged)
    assert table.current_snapshot()["snapshot_id"] == 0
    # staging an already-delivered range returns a skipped CommitResult
    res = table.stage_merge(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})
    assert res.skipped


def test_stage_refused_for_bucketed(spark, tmp_path):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="bucketed", n_buckets=4)
    with pytest.raises(NotImplementedError, match="bucketed"):
        table.stage_merge(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})


def test_expire_snapshots_keeps_inflight_staged_data(spark, tmp_path):
    """Retention running mid-audit must not collect a staged commit's
    data dir: the stage is invisible to _snapshot_files (digit-named
    only), but a later publish exposes it — expiring its files would
    publish a snapshot referencing deleted data AND burn the batch's
    offsets (code-review finding)."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    table.merge_into(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})
    table.merge_into(  # second snapshot so expire has something to drop
        _winners(spark, [("c1", 0, "user", "hello2", None, "U", 0, 10)]),
        batch_id=1,
        ranges={0: (2, 11)},
    )
    staged = table.stage_merge(_winners(spark, B1), batch_id=2, ranges={0: (11, 13)})
    table.expire_snapshots(keep_last=1)
    table.publish_staged(staged)
    got = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert got == {"c1": "hello2", "c2": "final", "c3": "new"}


def test_staged_lineage_lands_at_publish_not_stage(spark, tmp_path):
    """Lineage records what the table durably ingested: an aborted stage
    must leave none (else the abort-then-re-merge flow double-counts the
    batch), and a published stage must land exactly one set of rows."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    table.merge_into(_winners(spark, B0), batch_id=0, ranges={0: (0, 2)})

    staged = table.stage_merge(_winners(spark, B1), batch_id=1, ranges={0: (2, 4)})
    assert table.read_lineage().filter(F.col("batch_id") == 1).count() == 0
    table.abort_staged(staged)
    assert table.read_lineage().filter(F.col("batch_id") == 1).count() == 0

    # re-merge after abort: exactly one lineage row set for the batch
    table.merge_into(_winners(spark, B1), batch_id=1, ranges={0: (2, 4)})
    assert table.read_lineage().filter(F.col("batch_id") == 1).count() == 1

    staged2 = table.stage_merge(
        _winners(spark, [("c4", 0, "user", "late", None, "I", 0, 4)]),
        batch_id=2,
        ranges={0: (4, 5)},
    )
    table.publish_staged(staged2)
    rows = table.read_lineage().filter(F.col("batch_id") == 2).collect()
    assert len(rows) == 1
    assert (rows[0]["partition"], rows[0]["start_offset"], rows[0]["end_offset"]) == (0, 4, 5)
