"""Iceberg-backend fence logic, jar-free: the pure functions that give
MERGE INTO the same exactly-once contract as ParquetSnapshotTable —
golden tests mirroring the test_out_of_order matrix, plus property
tests for monotonicity/idempotence of the delivered set.
"""

from hypothesis import given
from hypothesis import strategies as st

from kafka_plugins_spark.lake import (
    IcebergMergeBackend,
    advance_delivered,
    decode_summary_props,
    encode_summary_props,
    fence_decision,
)


def test_summary_props_roundtrip_ignores_foreign_keys():
    delivered = {0: [(0, 100), (200, 300)], 3: [(50, 60)]}
    props = encode_summary_props(delivered)
    assert all(k.startswith("kps.delivered.") for k in props)
    # Iceberg puts its own metrics in the same summary map — must be ignored
    summary = {**props, "added-records": "123", "operation": "overwrite"}
    assert decode_summary_props(summary) == delivered
    assert decode_summary_props({"operation": "append"}) == {}


def test_fresh_table_applies_everything():
    d = fence_decision({0: (0, 100), 1: (0, 80)}, {})
    assert not d.skip and not d.needs_filter
    assert d.effective_ranges == {0: (0, 100), 1: (0, 80)}


def test_full_replay_skips():
    delivered = {0: [(0, 100)], 1: [(0, 80)]}
    assert fence_decision({0: (0, 100), 1: (0, 80)}, delivered).skip
    assert fence_decision({0: (20, 60)}, delivered).skip  # strict subset too
    assert fence_decision({}, delivered).skip  # empty batch is a no-op


def test_partial_overlap_applies_only_suffix():
    delivered = {0: [(0, 100)]}
    d = fence_decision({0: (50, 150)}, delivered)
    assert not d.skip and d.needs_filter
    assert d.effective_ranges == {0: (100, 150)}


def test_late_lower_range_not_fenced_out():
    """A high-watermark fence would drop [0,50) as 'already seen' — the
    interval set must let it through (the backfill case)."""
    delivered = {0: [(100, 200)]}
    d = fence_decision({0: (0, 50)}, delivered)
    assert not d.skip and not d.needs_filter
    assert d.effective_ranges == {0: (0, 50)}


def test_interleaved_thirds_converge_to_one_interval():
    delivered = {}
    for rng in ({0: (200, 300)}, {0: (0, 100)}, {0: (100, 200)}):
        d = fence_decision(rng, delivered)
        assert not d.skip
        delivered = advance_delivered(delivered, d.effective_ranges)
    assert delivered == {0: [(0, 300)]}
    # and now replaying ANY of them is a no-op
    for rng in ({0: (200, 300)}, {0: (0, 100)}, {0: (100, 200)}, {0: (0, 300)}):
        assert fence_decision(rng, delivered).skip


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(1, 30)),
        min_size=1,
        max_size=12,
    )
)
def test_commit_then_replay_always_skips(batches):
    """Idempotence: after advance_delivered(d, eff(r)), fencing r skips."""
    delivered = {}
    seen = []
    for p, lo, width in batches:
        rng = {p: (lo, lo + width)}
        d = fence_decision(rng, delivered)
        if not d.skip:
            delivered = advance_delivered(delivered, d.effective_ranges)
        seen.append(rng)
        for old in seen:
            assert fence_decision(old, delivered).skip or not fence_decision(
                old, delivered
            ).skip  # never raises
        assert fence_decision(rng, delivered).skip
    # intervals stay sorted, merged, non-overlapping
    for iv in delivered.values():
        assert iv == sorted(iv)
        assert all(a < b for a, b in iv)
        assert all(iv[i][1] < iv[i + 1][0] for i in range(len(iv) - 1))


def test_merge_sql_hard_delete_clause():
    b = IcebergMergeBackend("lake.db.transcripts")
    soft = b.build_merge_sql("updates", ["conv_id", "turn_idx", "text"])
    assert "THEN DELETE" not in soft
    hard = b.build_merge_sql("updates", ["conv_id", "turn_idx", "text"], hard_delete=True)
    assert "WHEN MATCHED AND s.op = 'D' AND s.offset > t._offset THEN DELETE" in hard
    # DELETE must be evaluated before the generic UPDATE arm
    assert hard.index("THEN DELETE") < hard.index("THEN UPDATE")
    assert b.compaction_sql() == "DELETE FROM lake.db.transcripts WHERE _op = 'D'"


def test_merge_patch_sql_arms():
    """The Iceberg spelling of merge_patch: arm order and column-level
    CASE guards mirror the sandbox path's semantics exactly."""
    b = IcebergMergeBackend("lake.db.transcripts")
    sql = b.build_merge_patch_sql("updates", ["conv_id", "turn_idx", "text", "tool"])
    # tombstone arm first, then resurrect-only-on-I, then patch
    i_del = sql.index("WHEN MATCHED AND s.op = 'D'")
    i_dead = sql.index("WHEN MATCHED AND t._op = 'D'")
    i_patch = sql.index("WHEN MATCHED THEN UPDATE")
    assert i_del < i_dead < i_patch
    # per-column patch guard: set only when named in cols_set or full I
    assert (
        "t.text = CASE WHEN s.op = 'I' OR array_contains(s.cols_set, 'text') "
        "THEN s.text ELSE t.text END" in sql
    )
    # a patch on a tombstoned key must not resurrect: dead arm only
    # applies source values under s.op = 'I'
    dead_arm = sql[i_dead:i_patch]
    assert "CASE WHEN s.op = 'I' THEN s.text ELSE t.text END" in dead_arm
    assert "CASE WHEN s.op = 'I' THEN s.op ELSE t._op END" in dead_arm
    # orphan patches never insert
    assert "WHEN NOT MATCHED AND s.op != 'U' THEN INSERT" in sql
    # key columns are join keys, never SET targets
    assert "t.conv_id =" not in sql.split("ON ")[1].split("WHEN")[1]


def test_commit_options_prefix():
    opts = IcebergMergeBackend.commit_options({0: [(0, 10)]})
    assert opts == {"snapshot-property.kps.delivered.0": "[[0, 10]]"}


# --- read_delivered ancestry + walk-back (synthetic metadata tables) -----

import datetime

from pyspark.sql import types as T

SNAP_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
        T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
    ]
)
HIST_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("is_current_ancestor", T.BooleanType()),
    ]
)


def _ts(i):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=i)


def test_pick_delivered_walks_past_unfenced_snapshot(spark):
    """A compaction/external snapshot carries no fence keys — the fence
    must come from the newest FENCED ancestor, not read as erased."""
    snaps = spark.createDataFrame(
        [
            (1, _ts(1), encode_summary_props({0: [(0, 100)]})),
            (2, _ts(2), {"operation": "delete"}),  # compaction, unfenced
        ],
        SNAP_SCHEMA,
    )
    hist = spark.createDataFrame([(1, True), (2, True)], HIST_SCHEMA)
    assert IcebergMergeBackend.pick_delivered(snaps, hist) == {0: [(0, 100)]}


def test_pick_delivered_ignores_rolled_back_lineage(spark):
    """After rollback_to_snapshot, snapshots off the current ancestry
    still appear in .snapshots — reading their fence would mark the
    rolled-back ranges delivered and silently skip re-ingest."""
    snaps = spark.createDataFrame(
        [
            (1, _ts(1), encode_summary_props({0: [(0, 100)]})),
            # newer + fenced, but abandoned by a rollback:
            (2, _ts(2), encode_summary_props({0: [(0, 500)]})),
        ],
        SNAP_SCHEMA,
    )
    hist = spark.createDataFrame([(1, True), (2, False)], HIST_SCHEMA)
    assert IcebergMergeBackend.pick_delivered(snaps, hist) == {0: [(0, 100)]}
    # re-made-current later ⇒ duplicate history rows must not double-read
    hist2 = spark.createDataFrame([(1, True), (1, True), (2, False)], HIST_SCHEMA)
    assert IcebergMergeBackend.pick_delivered(snaps, hist2) == {0: [(0, 100)]}


def test_pick_delivered_empty_when_no_fenced_ancestor(spark):
    snaps = spark.createDataFrame([(1, _ts(1), {"operation": "append"})], SNAP_SCHEMA)
    hist = spark.createDataFrame([(1, True)], HIST_SCHEMA)
    assert IcebergMergeBackend.pick_delivered(snaps, hist) == {}


# --- fence-channel feature detection (fake session, jar-free) ------------

class _FakeConf:
    def __init__(self):
        self.store = {}

    def set(self, k, v):
        self.store[k] = v

    def unset(self, k):
        self.store.pop(k, None)


class _FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _FakeWriteBuilder:
    def __init__(self, session):
        self._session = session

    def writeTo(self, table):
        return self

    def append(self):
        self._session.commit_snapshot()


class _FakeIcebergSession:
    """Just enough session surface for probe_fence_channel: conf, an
    empty append that commits a snapshot, and `.snapshots` SQL."""

    def __init__(self, channel_works: bool):
        self.conf = _FakeConf()
        self.channel_works = channel_works
        self.summaries = []

    def table(self, name):
        import types as _types

        return _types.SimpleNamespace(schema="conv_id string")

    def createDataFrame(self, data, schema):
        return _FakeWriteBuilder(self)

    def commit_snapshot(self):
        prefix = "spark.sql.iceberg.snapshot-property."
        props = (
            {k[len(prefix):]: v for k, v in self.conf.store.items() if k.startswith(prefix)}
            if self.channel_works
            else {}
        )
        self.summaries.append(props)

    def sql(self, q):
        if not self.summaries:
            return _FakeResult([])
        return _FakeResult([{"summary": self.summaries[-1]}])


def test_probe_accepts_working_channel():
    b = IcebergMergeBackend("lake.db.t")
    s = _FakeIcebergSession(channel_works=True)
    b.probe_fence_channel(s)
    assert b._channel_verified
    assert s.conf.store == {}, "probe conf key must not leak to later commits"


def test_probe_refuses_broken_channel_before_any_merge():
    import pytest

    b = IcebergMergeBackend("lake.db.t")
    s = _FakeIcebergSession(channel_works=False)
    with pytest.raises(RuntimeError, match="refusing to run the first data MERGE"):
        b.probe_fence_channel(s)
    assert not b._channel_verified
    assert s.conf.store == {}


def test_post_commit_verification_raises_on_missing_fence(monkeypatch):
    """Safety net: if the MERGE committed but the fence keys are absent
    from the fresh snapshot, the backend must raise loudly."""
    import pytest

    b = IcebergMergeBackend("lake.db.t")
    s = _FakeIcebergSession(channel_works=False)
    monkeypatch.setattr(b, "read_delivered", lambda spark: {})
    with pytest.raises(RuntimeError, match="fence properties missing"):
        b._merge_with_commit_properties(
            s, "MERGE INTO lake.db.t ...", encode_summary_props({0: [(0, 10)]})
        )


def test_merge_probe_wiring(monkeypatch):
    """merge_into probes the channel only when no fenced ancestor exists;
    a fenced ancestor is itself proof the channel works."""
    calls = []

    b = IcebergMergeBackend("lake.db.t")
    monkeypatch.setattr(b, "read_delivered", lambda spark: {0: [(0, 100)]})
    monkeypatch.setattr(
        b, "probe_fence_channel",
        lambda spark: (_ for _ in ()).throw(AssertionError("probe must not run")),
    )
    res = b.merge_into(None, None, batch_id=0, ranges={0: (0, 50)})  # fully fenced
    assert res.skipped and b._channel_verified

    b2 = IcebergMergeBackend("lake.db.t")
    monkeypatch.setattr(b2, "read_delivered", lambda spark: {})
    monkeypatch.setattr(b2, "probe_fence_channel", lambda spark: calls.append(1))
    res = b2.merge_into(None, None, batch_id=0, ranges={})  # empty batch
    assert res.skipped and calls == [1]


def test_recommended_table_properties():
    import pytest

    mor = IcebergMergeBackend.recommended_table_properties("mor")
    assert mor["format-version"] == "2"
    assert mor["write.merge.mode"] == "merge-on-read"
    cow = IcebergMergeBackend.recommended_table_properties("cow")
    assert cow["write.delete.mode"] == "copy-on-write"
    bucketed = IcebergMergeBackend.recommended_table_properties("bucketed")
    assert bucketed["write.merge.mode"] == "copy-on-write"
    with pytest.raises(ValueError):
        IcebergMergeBackend.recommended_table_properties("nope")


def test_recommended_partitioning():
    import pytest

    assert (
        IcebergMergeBackend.recommended_partitioning("bucketed", n_buckets=4096)
        == "PARTITIONED BY (bucket(4096, conv_id))"
    )
    assert IcebergMergeBackend.recommended_partitioning("mor") == (
        "PARTITIONED BY (_partition)"
    )
    with pytest.raises(ValueError):
        IcebergMergeBackend.recommended_partitioning("nope")


def test_snapshot_diff_changes_matches_changes_between(spark, tmp_path):
    """The engine-agnostic snapshot diff (what IcebergChangelogAdapter
    feeds the maintained-MV lifecycle on a real catalog) must produce
    the IDENTICAL changelog as the sandbox table's pruned
    changes_between for the same snapshot pair — inserts, deletes, and
    update pre/post pairs included."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable, snapshot_diff_changes
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from pyspark.sql import functions as F
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    r1 = table.merge_into(
        last_writer_wins(_batch(spark, [(f"k{i}", "user", "a", "I", i) for i in range(8)])),
        batch_id=0,
    )
    r2 = table.merge_into(
        last_writer_wins(_batch(spark, [
            ("k0", "user", "edited", "U", 10),       # update
            ("k1", None, None, "D", 11),             # delete
            ("k9", "user", "new", "I", 12),          # insert
        ])),
        batch_id=1,
    )

    diff = snapshot_diff_changes(table.read(r1.snapshot_id), table.read(r2.snapshot_id))
    ref = table.changes_between(r1.snapshot_id, r2.snapshot_id)
    assert sorted(diff.columns) == sorted(ref.columns)
    cols = sorted(diff.columns)
    got = sorted(tuple(r) for r in diff.select(*cols).collect())
    want = sorted(tuple(r) for r in ref.select(*cols).collect())
    assert got == want and len(want) == 4  # insert + delete + update pair
    # before=None → everything is an insert
    full = snapshot_diff_changes(None, table.read(r2.snapshot_id))
    assert full.filter(F.col("_change_type") != "insert").count() == 0
    assert full.count() == table.read(r2.snapshot_id).count()


def test_maintained_mv_advances_through_adapter_trio(spark, tmp_path):
    """MaintainedCountSum only needs the current_snapshot/read/
    changes_between trio — proven by advancing it through an adapter
    whose changelog comes from snapshot_diff_changes (exactly what
    IcebergChangelogAdapter does against a real catalog, minus the
    VERSION AS OF plumbing). The advance must be a DELTA apply, and the
    result must equal the from-scratch aggregate."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable, snapshot_diff_changes
    from kafka_plugins_spark.operators.incremental import (
        MaintainedCountSum,
        count_sum_aggregate,
    )
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from pyspark.sql import functions as F
    from tests.test_lake import _batch

    inner = ParquetSnapshotTable(spark, str(tmp_path / "t"))

    class DiffAdapter:
        """The IcebergChangelogAdapter shape, over the sandbox table."""

        def __init__(self, table):
            self.table = table
            self.spark = table.spark

        def current_snapshot(self):
            return self.table.current_snapshot()

        def read(self, snapshot_id=None):
            return self.table.read(snapshot_id)

        def changes_between(self, a, b=None):
            before = None if a is None else self.read(a)
            return snapshot_diff_changes(before, self.read(b))

    adapter = DiffAdapter(inner)
    mv = MaintainedCountSum(adapter, str(tmp_path / "mv"), ["role"], sum_cols=["turn_idx"])

    inner.merge_into(
        last_writer_wins(_batch(spark, [(f"k{i}", "user" if i % 2 else "asst", "a", "I", i)
                                        for i in range(10)])),
        batch_id=0,
    )
    info = mv.advance()
    assert info["bootstrapped"]
    inner.merge_into(
        last_writer_wins(_batch(spark, [
            ("k1", "asst", "moved", "U", 20),   # group-crossing update
            ("k2", None, None, "D", 21),        # delete
            ("knew", "user", "x", "I", 22),     # insert
        ])),
        batch_id=1,
    )
    info = mv.advance()
    assert info["delta_applied"] and not info["bootstrapped"]
    got = sorted(tuple(r) for r in mv.read().collect())
    want = sorted(
        tuple(r)
        for r in count_sum_aggregate(adapter.read(), ["role"], ["turn_idx"]).collect()
    )
    assert got == want


def test_snapshot_diff_is_null_safe_on_keys(spark):
    """Review finding: a name-based equi-join never matches NULL=NULL,
    so an UNCHANGED row with a NULL key component churned as a phantom
    delete+insert on every diff. The null-safe join must report no
    change for it, and a real update to a NULL-key row must emit a
    proper update pair."""
    from kafka_plugins_spark.lake import snapshot_diff_changes

    a = spark.createDataFrame(
        [(None, 0, "same"), ("k1", 0, "old"), (None, 1, "was")],
        "conv_id string, turn_idx int, text string",
    )
    b = spark.createDataFrame(
        [(None, 0, "same"), ("k1", 0, "new"), (None, 1, "now")],
        "conv_id string, turn_idx int, text string",
    )
    got = sorted(
        ((r["conv_id"], r["turn_idx"], r["text"], r["_change_type"])
         for r in snapshot_diff_changes(a, b).collect()),
        key=str,
    )
    assert got == sorted([
        ("k1", 0, "old", "update_before"), ("k1", 0, "new", "update_after"),
        (None, 1, "was", "update_before"), (None, 1, "now", "update_after"),
    ], key=str), got


def test_snapshot_diff_changes_across_schema_evolution(spark, tmp_path):
    """Diffing across a commit that ADDED a column must not crash
    (code-review finding: the before frame was projected with after's
    column list): the new column reads as NULL on the before side, so an
    evolved row diffs as an update whose new column goes NULL → value —
    matching parquet merged-schema semantics and changes_between."""
    from kafka_plugins_spark.lake import ParquetSnapshotTable, snapshot_diff_changes
    from kafka_plugins_spark.operators.resolve import last_writer_wins
    from pyspark.sql import functions as F
    from tests.test_lake import _batch

    table = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    r1 = table.merge_into(
        last_writer_wins(_batch(spark, [("k0", "user", "a", "I", 0),
                                        ("k1", "user", "b", "I", 1)])),
        batch_id=0,
    )
    evolved = last_writer_wins(
        _batch(spark, [("k0", "user", "a2", "U", 10)]).withColumn(
            "lang", F.lit("en")
        )
    )
    r2 = table.merge_into(evolved, batch_id=1)

    before, after = table.read(r1.snapshot_id), table.read(r2.snapshot_id)
    assert "lang" in after.columns and "lang" not in before.columns
    diff = snapshot_diff_changes(before, after)
    rows = {(r["conv_id"], r["_change_type"]): r for r in diff.collect()}
    # k0 churns as an update pair with lang NULL -> 'en'; k1 unchanged
    assert set(rows) == {("k0", "update_before"), ("k0", "update_after")}
    assert rows[("k0", "update_before")]["lang"] is None
    assert rows[("k0", "update_after")]["lang"] == "en"


def test_purge_sql_spelling():
    """The Iceberg spelling of purge_keys: CoW DELETE over the id list
    plus the maintenance follow-ups that make forgetting byte-real
    (expire history + remove orphans — a DELETE alone leaves pre-delete
    files reachable via time travel). Escaping doubles backslashes
    BEFORE quotes (review finding, verified live: quote-doubling alone
    lets a conv_id ending in a backslash hide the closing quote and
    inject a predicate into the DELETE)."""
    b = IcebergMergeBackend("lake.db.transcripts")
    delete_sql, followups = b.build_purge_sql(["conv-2", "conv-1", "o'brien"])
    assert delete_sql == (
        "DELETE FROM lake.db.transcripts "
        "WHERE conv_id IN ('conv-1', 'conv-2', 'o''brien')"
    )
    # backslash neutralization: the injection shape from the review
    inj, _ = b.build_purge_sql(["nobody\\') OR true --"])
    assert inj == (
        "DELETE FROM lake.db.transcripts "
        "WHERE conv_id IN ('nobody\\\\'') OR true --')"
    )
    # follow-ups: catalog-qualified CALLs (procedures resolve in the
    # CURRENT catalog), immediate expiry (Iceberg's 5-day default would
    # keep pre-delete snapshots readable), catalog-relative table arg
    assert followups[0] == (
        "CALL lake.system.expire_snapshots(table => 'db.transcripts', "
        "older_than => current_timestamp(), retain_last => 1)"
    )
    assert followups[1] == (
        "CALL lake.system.remove_orphan_files(table => 'db.transcripts')"
    )
    # two-part identifier: unqualified CALL namespace
    b2 = IcebergMergeBackend("db.t")
    _, f2 = b2.build_purge_sql(["x"])
    assert f2[0].startswith("CALL system.expire_snapshots(table => 'db.t'")
    # empty id list mirrors purge_keys([])'s skipped no-op
    assert b.build_purge_sql([]) == ("", [])
