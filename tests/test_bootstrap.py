"""bootstrap → tail handoff: initial dump + fenced replay == full replay.

The Debezium snapshot→streaming phase the reference cannot express (its
initial-offset sentinels -2/-1 restart the log or skip to latest;
``KafkaConfig.java`` — there is no "the sink already reflects everything
below X"). The property pinned here: seed the table from a dump of the
converged pre-cut state, then replay the WHOLE log — the fence must skip
pre-cut chunks, clip the straddler, and land on exactly the
converged-from-scratch table.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.operators.resolve import final_state
from kafka_plugins_spark.replay import bootstrap, replay
from kafka_plugins_spark.sources.events import scan_events
from tests.util import duckdb_final_state

CUT = 120  # events fixture has ~4 partitions × ~300 offsets


def _visible(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


@pytest.mark.parametrize("mode", [None, "mor", "bucketed"])
def test_bootstrap_then_full_replay_converges(spark, events_path, tmp_path, mode):
    events = scan_events(spark, events_path)
    parts = [r["partition"] for r in events.select("partition").distinct().collect()]
    dump = final_state(events.filter(F.col("offset") < CUT))

    kw = {"n_buckets": 8} if mode == "bucketed" else {}
    table, first = bootstrap(
        spark, dump, str(tmp_path / "t"), {p: CUT for p in parts}, mode=mode, **kw
    )
    assert not first.skipped
    # watermark per partition reflects the claimed dump position
    assert all(w == CUT for w in table.watermarks().values())

    # replay the WHOLE log from offset 0 — fence must make this exactly-once
    _, results = replay(
        spark, events_path, str(tmp_path / "t"), chunk_size=100, mode=mode, **kw
    )
    # chunk [0,100) is fully inside the delivered [0,CUT) → fence-skipped
    assert results[0].skipped

    got = _visible(table.read())
    want = duckdb_final_state(events_path)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True)[got.columns],
        check_dtype=False,
    )


def test_bootstrap_refuses_nonempty_table(spark, events_path, tmp_path):
    events = scan_events(spark, events_path)
    parts = [r["partition"] for r in events.select("partition").distinct().collect()]
    dump = final_state(events.filter(F.col("offset") < CUT))
    bootstrap(spark, dump, str(tmp_path / "t"), {p: CUT for p in parts})
    with pytest.raises(ValueError, match="not empty"):
        bootstrap(spark, dump, str(tmp_path / "t"), {p: CUT for p in parts})


def test_bootstrap_tail_events_beat_dump_rows_for_any_partition_assignment(
    spark, events_path, tmp_path
):
    """The soundness invariant the synthetic envelope rides on: every
    stored dump row's offset is strictly below every tail event's offset,
    so merge- and read-side LWW prefer tail data regardless of which
    synthetic partition a dump row landed in."""
    events = scan_events(spark, events_path)
    parts = [r["partition"] for r in events.select("partition").distinct().collect()]
    dump = final_state(events.filter(F.col("offset") < CUT))
    table, _ = bootstrap(spark, dump, str(tmp_path / "t"), {p: CUT for p in parts})
    stored_max = table._read_full().agg(F.max("_offset")).collect()[0][0]
    tail_min = (
        events.filter(F.col("offset") >= CUT).agg(F.min("offset")).collect()[0][0]
    )
    assert stored_max < tail_min


def test_bootstrap_noncontiguous_partition_ids_fence_only_claimed(spark, tmp_path):
    """Claimed partition ids need not be 0..n-1 (a subset-consumer or a
    reassigned topic): the synthetic dump partition must map into the
    CLAIMED id set, so delivered intervals land only on claimed
    partitions (code-review finding: pmod over len(start_offsets) used
    to fence out real events on unclaimed partitions 0..n-1)."""
    dump = spark.createDataFrame(
        [(f"c{i}", 0, "user", f"t{i}", None, None) for i in range(20)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    table, res = bootstrap(spark, dump, str(tmp_path / "t"), {3: 100, 7: 50})
    assert not res.skipped
    delivered = table.delivered_ranges()
    assert set(delivered) == {3, 7}, f"unclaimed partitions fenced: {delivered}"
    assert delivered[3][-1][1] == 100 and delivered[7][-1][1] == 50
    # every dump row is visible and offsets sit below BOTH cuts
    assert table.read().count() == 20
    stored = table._read_full().select("_partition", "_offset").distinct().collect()
    assert {r["_partition"] for r in stored} <= {3, 7}
    assert all(r["_offset"] < 50 for r in stored)
