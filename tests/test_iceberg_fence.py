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


def test_commit_options_prefix():
    opts = IcebergMergeBackend.commit_options({0: [(0, 10)]})
    assert opts == {"snapshot-property.kps.delivered.0": "[[0, 10]]"}
