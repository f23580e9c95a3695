"""Incremental aggregate maintenance from the changelog (operators/incremental.py).

The invariant under test everywhere: maintaining a materialized aggregate
by applying ``changes_between`` deltas lands on EXACTLY the from-scratch
aggregate of the target snapshot — across multi-commit replays, group
appearance/disappearance, group-crossing updates, and NULL group keys —
and an inconsistent changelog fails loudly instead of corrupting state.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from kafka_plugins_spark.lake import ParquetSnapshotTable
from kafka_plugins_spark.operators.incremental import (
    apply_count_sum_delta,
    count_sum_aggregate,
    refresh_affected_groups,
)
from kafka_plugins_spark.operators.resolve import last_writer_wins
from kafka_plugins_spark.schema import CHANGE_EVENT

TS = datetime.datetime(2026, 1, 1)


def _batch(spark, rows):
    """rows: (conv_id, role, text, op, offset)."""
    return spark.createDataFrame(
        [(cid, 0, role, text, None, TS, op, 0, off) for (cid, role, text, op, off) in rows],
        CHANGE_EVENT,
    )


def _with_len(df):
    return df.withColumn("text_len", F.length("text"))


def _agg(df):
    return count_sum_aggregate(_with_len(df), ["role"], ["text_len"])


def _as_rows(df):
    return sorted(
        (r["role"], r["cnt"], r["sum_text_len"]) for r in df.collect()
    )


def test_delta_apply_tracks_every_snapshot_of_a_replay(spark, events_path, tmp_path):
    """Maintain the per-role aggregate across EVERY commit of a chunked
    replay by delta application only; at each snapshot it must equal the
    from-scratch aggregate of that snapshot's visible table."""
    from kafka_plugins_spark.replay import replay

    table, res = replay(spark, events_path, str(tmp_path / "t"), chunk_size=400, mode="mor")
    snaps = [r.snapshot_id for r in res if not r.skipped]
    assert len(snaps) >= 3
    mv = _agg(table.read(snaps[0]))
    for a, b in zip(snaps, snaps[1:]):
        ch = _with_len(table.changes_between(a, b))
        mv = apply_count_sum_delta(ch, mv, ["role"], ["text_len"]).localCheckpoint(
            eager=True
        )
        assert _as_rows(mv) == _as_rows(_agg(table.read(b))), (a, b)


def test_groups_appear_disappear_and_migrate(spark, tmp_path):
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="mor")
    r1 = table.merge_into(
        last_writer_wins(
            _batch(spark, [("k1", "user", "aa", "I", 0), ("k2", "user", "b", "I", 1),
                           ("k3", "agent", "cc", "I", 2)])
        ),
        batch_id=0,
    )
    # k3's group (agent) disappears; k1 MIGRATES user->tool; k4 opens 'sys'
    r2 = table.merge_into(
        last_writer_wins(
            _batch(spark, [("k3", None, None, "D", 3), ("k1", "tool", "aaa", "U", 4),
                           ("k4", "sys", "d", "I", 5)])
        ),
        batch_id=1,
    )
    prior = _agg(table.read(r1.snapshot_id))
    assert _as_rows(prior) == [("agent", 1, 2), ("user", 2, 3)]
    ch = _with_len(table.changes_between(r1.snapshot_id, r2.snapshot_id))
    got = apply_count_sum_delta(ch, prior, ["role"], ["text_len"])
    assert _as_rows(got) == [("sys", 1, 1), ("tool", 1, 3), ("user", 1, 1)]
    assert _as_rows(got) == _as_rows(_agg(table.read(r2.snapshot_id)))


def test_null_group_key_is_one_real_group(spark):
    """NULL group keys must merge null-safely: the prior NULL bucket and
    the delta NULL bucket combine into one row, not two (and not zero)."""
    prior = spark.createDataFrame(
        [(None, 2, 10, 2), ("en", 1, 5, 1)],
        "g string, cnt bigint, sum_v bigint, nn_v bigint",
    )
    changes = spark.createDataFrame(
        [(None, 3, "insert"), (None, 7, "delete"), ("en", 2, "insert")],
        "g string, v int, _change_type string",
    )
    got = sorted(
        (
            (r["g"], r["cnt"], r["sum_v"])
            for r in apply_count_sum_delta(changes, prior, ["g"], ["v"]).collect()
        ),
        key=lambda t: (t[0] is not None, t),
    )
    assert got == [(None, 2, 6), ("en", 2, 7)]


def test_all_null_measure_stays_null(spark):
    """sum over an all-NULL measure is NULL from scratch; the delta merge
    must not manufacture a 0 for it."""
    prior = spark.createDataFrame(
        [("en", 1, None, 0)], "g string, cnt bigint, sum_v bigint, nn_v bigint"
    )
    changes = spark.createDataFrame(
        [("en", None, "insert")], "g string, v int, _change_type string"
    )
    [row] = apply_count_sum_delta(changes, prior, ["g"], ["v"]).collect()
    assert (row["g"], row["cnt"], row["sum_v"]) == ("en", 2, None)


def test_inconsistent_changelog_raises(spark):
    """A delta that removes more rows than the prior ever counted cannot
    come from a real changelog — consuming the result must raise, not
    emit a negative or silently-dropped group."""
    prior = spark.createDataFrame(
        [("en", 1, 5, 1)], "g string, cnt bigint, sum_v bigint, nn_v bigint"
    )
    changes = spark.createDataFrame(
        [("en", 5, "delete"), ("en", 5, "update_before")],
        "g string, v int, _change_type string",
    )
    out = apply_count_sum_delta(changes, prior, ["g"], ["v"])
    with pytest.raises(Exception, match="count went negative"):
        out.collect()


def test_refresh_affected_groups_handles_min_max(spark, tmp_path):
    """Deleting a group's current max is invisible to algebraic deltas —
    the affected-group recompute path must restore the true max, leave
    untouched groups byte-identical, and drop emptied groups."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="mor")
    r1 = table.merge_into(
        last_writer_wins(
            _batch(spark, [("k1", "user", "zz", "I", 0), ("k2", "user", "aa", "I", 1),
                           ("k3", "agent", "mm", "I", 2), ("k4", "sys", "q", "I", 3)])
        ),
        batch_id=0,
    )
    # delete user's max ('zz'); empty out 'agent' entirely; 'sys' untouched
    r2 = table.merge_into(
        last_writer_wins(
            _batch(spark, [("k1", None, None, "D", 4), ("k3", None, None, "D", 5)])
        ),
        batch_id=1,
    )

    agg_fn = lambda df: df.groupBy("role").agg(
        F.max("text").alias("max_text"), F.min("text").alias("min_text")
    )
    prior = agg_fn(table.read(r1.snapshot_id))
    ch = table.changes_between(r1.snapshot_id, r2.snapshot_id)
    got = refresh_affected_groups(
        prior, ch, table.read(r2.snapshot_id), ["role"], agg_fn
    )
    rows = sorted((r["role"], r["max_text"], r["min_text"]) for r in got.collect())
    assert rows == [("sys", "q", "q"), ("user", "aa", "aa")]
    want = sorted(
        (r["role"], r["max_text"], r["min_text"])
        for r in agg_fn(table.read(r2.snapshot_id)).collect()
    )
    assert rows == want


def test_delta_apply_plan_is_jvm_only(spark):
    prior = spark.createDataFrame(
        [("en", 1, 5, 1)], "g string, cnt bigint, sum_v bigint, nn_v bigint"
    )
    changes = spark.createDataFrame(
        [("en", 2, "insert")], "g string, v int, _change_type string"
    )
    plan = (
        apply_count_sum_delta(changes, prior, ["g"], ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --- persisted maintained view (MaintainedCountSum) -----------------------


def test_maintained_view_bootstrap_advance_noop(spark, tmp_path):
    from kafka_plugins_spark.operators.incremental import MaintainedCountSum

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="mor")
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "aaa", "I", 0),
                                        ("k2", "asst", "bb", "I", 1)])),
        batch_id=0,
    )
    mv = MaintainedCountSum(
        table, str(tmp_path / "mv"), ["role"], ["text_len"], prepare=_with_len
    )
    info = mv.advance()
    assert info["bootstrapped"] and not info["delta_applied"]
    # already current → no-op, no new state dir
    assert mv.advance() == {"as_of": info["as_of"], "delta_applied": False,
                            "bootstrapped": False}

    # two more commits (update + delete + new group), ONE advance folds both
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "aaaaa", "U", 10),
                                        ("k3", "tool", "cccc", "I", 11)])),
        batch_id=1,
    )
    table.merge_into(
        last_writer_wins(_batch(spark, [("k2", None, None, "D", 20)])), batch_id=2
    )
    info2 = mv.advance()
    assert info2["delta_applied"] and not info2["bootstrapped"]
    got = {r["role"]: (r["cnt"], r["sum_text_len"]) for r in mv.read().collect()}
    want = {r["role"]: (r["cnt"], r["sum_text_len"])
            for r in _agg(table.read()).collect()}
    assert got == want, "O(delta) maintenance must equal from-scratch"
    assert "asst" not in got  # group dropped to zero disappears


def test_maintained_view_crash_tmp_is_ignored_and_cleaned(spark, tmp_path):
    import os

    from kafka_plugins_spark.operators.incremental import MaintainedCountSum

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "aaa", "I", 0)])), batch_id=0
    )
    mvp = str(tmp_path / "mv")
    mv = MaintainedCountSum(table, mvp, ["role"], ["text_len"], prepare=_with_len)
    mv.advance()
    state_before = sorted(os.listdir(mvp))
    # simulate a crash mid-advance: a leftover .tmp- dir
    os.makedirs(os.path.join(mvp, ".tmp-deadbeef/x"), exist_ok=True)
    assert mv.as_of() is not None and mv.read().count() == 1  # tmp invisible
    table.merge_into(
        last_writer_wins(_batch(spark, [("k2", "user", "bb", "I", 5)])), batch_id=1
    )
    info = mv.advance()
    assert info["delta_applied"]
    names = os.listdir(mvp)
    assert not any(n.startswith(".tmp-") for n in names), "tmp dirs cleaned"
    got = {r["role"]: r["cnt"] for r in mv.read().collect()}
    assert got == {"user": 2}
    assert sorted(n for n in names if n.startswith("state-")) != state_before


def test_maintained_view_after_streaming_ingest(spark, tmp_path):
    """The composition the class exists for: stream → commits land →
    advance folds the changelog; repeated across two file drops."""
    import glob
    import os
    import shutil

    from kafka_plugins_spark.datagen import generate_events
    from kafka_plugins_spark.operators.incremental import MaintainedCountSum
    from kafka_plugins_spark.streaming.pipeline import (
        file_event_source,
        start_ingest_stream,
    )

    df = generate_events(spark, n_conversations=60, n_partitions=4, seed=23)
    full = str(tmp_path / "full")
    df.filter(F.col("offset") < 300).coalesce(2).write.parquet(f"{full}/drop1")
    df.filter(F.col("offset") >= 300).coalesce(2).write.parquet(f"{full}/drop2")
    watch, tpath, ckpt = (str(tmp_path / d) for d in ("watch", "table", "ckpt"))
    schema = spark.read.parquet(f"{full}/drop1").schema

    def stage(drop):
        os.makedirs(watch, exist_ok=True)
        for f in glob.glob(f"{drop}/*.parquet"):
            shutil.copy(f, watch)

    mv = None
    for drop in (f"{full}/drop1", f"{full}/drop2"):
        stage(drop)
        s = start_ingest_stream(
            spark, file_event_source(spark, watch, schema), tpath, ckpt, mode="mor"
        )
        s.await_and_stop()
        if mv is None:
            mv = MaintainedCountSum(
                s.table, str(tmp_path / "mv"), ["role"], ["text_len"], prepare=_with_len
            )
        info = mv.advance()
        assert info["as_of"] == s.table.current_snapshot()["snapshot_id"]
    assert info["delta_applied"] and not info["bootstrapped"]
    got = {r["role"]: (r["cnt"], r["sum_text_len"]) for r in mv.read().collect()}
    want = {r["role"]: (r["cnt"], r["sum_text_len"])
            for r in _agg(mv.table.read()).collect()}
    assert got == want


def test_stream_advances_maintained_views_inline(spark, tmp_path):
    """maintained_views=[mv]: the batch loop advances each view right
    after its commit lands — MVs stay current with the stream with NO
    external scheduler or manual advance. Two file drops through the
    same checkpoint; after each drain the PERSISTED state must already
    reflect the table's current snapshot and equal a full recompute."""
    import glob
    import os
    import shutil

    from kafka_plugins_spark.datagen import generate_events
    from kafka_plugins_spark.operators.incremental import MaintainedCountSum
    from kafka_plugins_spark.streaming.pipeline import (
        file_event_source,
        start_ingest_stream,
    )

    df = generate_events(spark, n_conversations=60, n_partitions=4, seed=29)
    full = str(tmp_path / "full")
    df.filter(F.col("offset") < 300).coalesce(2).write.parquet(f"{full}/drop1")
    df.filter(F.col("offset") >= 300).coalesce(2).write.parquet(f"{full}/drop2")
    watch, tpath, ckpt = (str(tmp_path / d) for d in ("watch", "table", "ckpt"))
    schema = spark.read.parquet(f"{full}/drop1").schema

    table = ParquetSnapshotTable(spark, tpath, mode="mor")
    mv = MaintainedCountSum(
        table, str(tmp_path / "mv"), ["role"], ["text_len"], prepare=_with_len
    )
    n_advances = 0
    for drop in (f"{full}/drop1", f"{full}/drop2"):
        os.makedirs(watch, exist_ok=True)
        for f in glob.glob(f"{drop}/*.parquet"):
            shutil.copy(f, watch)
        s = start_ingest_stream(
            spark,
            file_event_source(spark, watch, schema),
            tpath,
            ckpt,
            mode="mor",
            maintained_views=[mv],
        )
        s.await_and_stop()
        assert len(s.mv_advances) >= 1  # one per committed micro-batch
        n_advances += len(s.mv_advances)
        # current WITHOUT any manual advance, from the persisted state
        assert mv.as_of() == s.table.current_snapshot()["snapshot_id"]
        got = {r["role"]: (r["cnt"], r["sum_text_len"]) for r in mv.read().collect()}
        want = {
            r["role"]: (r["cnt"], r["sum_text_len"])
            for r in _agg(s.table.read()).collect()
        }
        assert got == want
    assert n_advances >= 2
    # a re-drain of already-fenced input advances as a no-op, state intact
    s = start_ingest_stream(
        spark, file_event_source(spark, watch, schema), tpath, ckpt,
        mode="mor", maintained_views=[mv],
    )
    s.await_and_stop()
    assert all(not a["delta_applied"] and not a["bootstrapped"] for a in s.mv_advances)
    assert mv.as_of() == s.table.current_snapshot()["snapshot_id"]


def test_cancel_to_zero_sum_goes_null_not_zero(spark, tmp_path):
    """Code-review finding: deleting the LAST non-NULL measure value of
    a group that still has (all-NULL) rows must leave sum NULL — exactly
    what a recompute yields — not 0. The nn_ bookkeeping column is what
    makes the delta able to tell the difference."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="mor")
    # role 'user': one row with text (len 3) + one row with NULL text
    r1 = table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "abc", "I", 0),
                                        ("k2", "user", None, "I", 1)])),
        batch_id=0,
    )
    prior = _agg(table.read(r1.snapshot_id))
    row = prior.collect()[0]
    assert (row["cnt"], row["sum_text_len"], row["nn_text_len"]) == (2, 3, 1)
    # delete the non-NULL row; k2 (NULL text) remains
    r2 = table.merge_into(
        last_writer_wins(_batch(spark, [("k1", None, None, "D", 10)])), batch_id=1
    )
    ch = _with_len(table.changes_between(r1.snapshot_id, r2.snapshot_id))
    got = apply_count_sum_delta(ch, prior, ["role"], ["text_len"]).collect()
    want = _agg(table.read(r2.snapshot_id)).collect()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["cnt"] == w["cnt"] == 1
    assert g["sum_text_len"] is None and w["sum_text_len"] is None
    assert g["nn_text_len"] == 0


# --- persisted NON-invertible maintained view (MaintainedGroupAgg) ---------


def _mm_agg(df):
    return df.groupBy("role").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("text").alias("min_text"),
        F.max(F.length("text")).alias("max_len"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def _mm_rows(df):
    return sorted(
        (r["role"], r["cnt"], r["min_text"], r["max_len"], r["n_convs"])
        for r in df.collect()
    )


def test_maintained_minmax_bootstrap_advance_noop(spark, tmp_path):
    """Persisted min/max/count-distinct MV: bootstrap once, advance
    O(touched groups) across TWO further commits — one of which
    tombstones the row holding a group minimum AND empties another group
    entirely — and land on exactly the from-scratch aggregate."""
    from kafka_plugins_spark.operators.incremental import MaintainedGroupAgg

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="mor")
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "aaa", "I", 0),
                                        ("k2", "user", "zzz", "I", 1),
                                        ("k3", "asst", "mm", "I", 2)])),
        batch_id=0,
    )
    mv = MaintainedGroupAgg(table, str(tmp_path / "mv"), ["role"], _mm_agg)
    info = mv.advance()
    assert info["bootstrapped"] and not info["delta_applied"]
    assert mv.advance() == {"as_of": info["as_of"], "delta_applied": False,
                            "bootstrapped": False}

    # commit 2: new group + update that changes a max
    table.merge_into(
        last_writer_wins(_batch(spark, [("k4", "tool", "cccc", "I", 10),
                                        ("k2", "user", "zzzzz", "U", 11)])),
        batch_id=1,
    )
    # commit 3: delete the min-holding row of 'user' AND empty 'asst'
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", None, None, "D", 20),
                                        ("k3", None, None, "D", 21)])),
        batch_id=2,
    )
    info2 = mv.advance()
    assert info2["delta_applied"] and not info2["bootstrapped"]
    got = _mm_rows(mv.read())
    want = _mm_rows(_mm_agg(table.read()))
    assert got == want, "patched-in-place MV must equal full recompute"
    roles = [r[0] for r in got]
    assert "asst" not in roles, "group emptied by delete must disappear"
    user = dict((r[0], r) for r in got)["user"]
    assert user[2] == "zzzzz", "deleted minimum must be re-derived, not kept"


def test_maintained_minmax_crash_tmp_ignored_and_cleaned(spark, tmp_path):
    import os

    from kafka_plugins_spark.operators.incremental import MaintainedGroupAgg

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "aaa", "I", 0)])), batch_id=0
    )
    mvp = str(tmp_path / "mv")
    mv = MaintainedGroupAgg(table, mvp, ["role"], _mm_agg)
    mv.advance()
    # simulate a crash mid-advance: a leftover .tmp- dir must be invisible
    os.makedirs(os.path.join(mvp, ".tmp-deadbeef/x"), exist_ok=True)
    assert mv.as_of() is not None and mv.read().count() == 1
    table.merge_into(
        last_writer_wins(_batch(spark, [("k2", "asst", "bb", "I", 5)])), batch_id=1
    )
    info = mv.advance()
    assert info["delta_applied"]
    names = os.listdir(mvp)
    assert not any(n.startswith(".tmp-") for n in names), "tmp dirs cleaned"
    assert _mm_rows(mv.read()) == _mm_rows(_mm_agg(table.read()))


def test_maintained_minmax_untouched_groups_carried_not_recomputed(spark, tmp_path):
    """The refresh reads untouched groups from the STORED MV: corrupt the
    stored row of an untouched group and verify the (wrong) value is
    carried through — proof the advance did not silently re-aggregate
    the whole table (the O(delta) contract, asserted behaviorally)."""
    import os

    from kafka_plugins_spark.operators.incremental import MaintainedGroupAgg

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode="mor")
    table.merge_into(
        last_writer_wins(_batch(spark, [("k1", "user", "aaa", "I", 0),
                                        ("k2", "asst", "bb", "I", 1)])),
        batch_id=0,
    )
    mvp = str(tmp_path / "mv")
    mv = MaintainedGroupAgg(table, mvp, ["role"], _mm_agg)
    mv.advance()
    # poison the stored state: rewrite with asst.cnt bumped to 99
    state = mv.read().withColumn(
        "cnt", F.when(F.col("role") == "asst", F.lit(99)).otherwise(F.col("cnt"))
    )
    poisoned = state.collect()
    sd = mv._state_dir(mv.as_of())
    import shutil as _sh
    _sh.rmtree(sd)
    spark.createDataFrame(poisoned).write.parquet(sd)
    # next commit touches ONLY 'user'
    table.merge_into(
        last_writer_wins(_batch(spark, [("k3", "user", "cccc", "I", 10)])), batch_id=1
    )
    mv.advance()
    got = {r["role"]: r["cnt"] for r in mv.read().collect()}
    assert got["asst"] == 99, "untouched group must come from stored MV, not a rescan"
    assert got["user"] == 2, "touched group recomputed from the target snapshot"


def test_batch_replay_advances_maintained_views(spark, tmp_path, events_path):
    """Batch-path symmetry with the streaming composition: replay(...,
    maintained_views=[mv]) advances the persisted view after every
    committed chunk; a fenced re-replay leaves it untouched and
    current."""
    from kafka_plugins_spark.operators.incremental import MaintainedCountSum
    from kafka_plugins_spark.replay import replay

    tpath = str(tmp_path / "t")
    table = ParquetSnapshotTable(spark, tpath, mode="mor")
    mv = MaintainedCountSum(
        table, str(tmp_path / "mv"), ["role"], ["text_len"], prepare=_with_len
    )
    t2, res = replay(spark, events_path, tpath, chunk_size=200, mode="mor",
                     maintained_views=[mv])
    assert sum(1 for r in res if not r.skipped) > 1
    assert mv.as_of() == t2.current_snapshot()["snapshot_id"]
    got = {r["role"]: (r["cnt"], r["sum_text_len"]) for r in mv.read().collect()}
    want = {r["role"]: (r["cnt"], r["sum_text_len"]) for r in _agg(t2.read()).collect()}
    assert got == want
    before = mv.as_of()
    t3, res2 = replay(spark, events_path, tpath, chunk_size=200, mode="mor",
                      maintained_views=[mv])
    assert all(r.skipped for r in res2)
    assert mv.as_of() == before == t3.current_snapshot()["snapshot_id"]
