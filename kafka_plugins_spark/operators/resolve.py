"""Dedup + last-writer-wins resolution for change events.

The reference never resolves conflicts — it replays offset ranges
at-least-once and leaves duplicates to the consumer (inclusive-offset
replay noted at ``KafkaBatchConfig.java:58-62``). The north rule makes the
engine own both: collapse replay duplicates by ``(conv_id, turn_idx,
offset)`` and keep, per key, the event with the highest offset (a conv_id
is pinned to one partition, so offsets totally order its events).

Scale notes
-----------
- LWW is expressed as ``max_by(payload_struct, offset)`` — a declarative
  aggregate, so Catalyst plans a partial (map-side) aggregation before the
  shuffle: even a pathologically hot key reduces to one row per map task
  before any data moves.
- For hot keys with many distinct events per *group* (one turn updated
  millions of times), ``salted`` two-phase LWW spreads a single group
  across ``salt_buckets`` reducers first. max(offset) is associative and
  commutative, so salting can never change the winner.
- Never use a row_number window for this at scale: it shuffles every event
  of a key to one task and sorts — precisely the skew trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_plugins_spark.schema import ENVELOPE_COLUMNS, KEY_COLUMNS

DEDUP_KEY = [*KEY_COLUMNS, "offset"]


def dedup_events(events: DataFrame) -> DataFrame:
    """Drop replay duplicates: same key re-delivered at the same offset.

    Pure batch form — the streaming path uses the watermarked stateful
    variant (see streaming/pipeline.py) so state can be reclaimed.
    """
    return events.dropDuplicates(DEDUP_KEY)


def last_writer_wins(events: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Per ``(conv_id, turn_idx)`` keep the event with max offset.

    Returns one row per key with the winning payload + ``op`` +
    ``partition`` + ``offset``. Replay duplicates collapse for free (the
    tied winners are identical rows), so this subsumes ``dedup_events``
    for batch replay.

    ``salt_buckets``: explicit two-phase reduce — phase 1 groups by
    ``(key, xxhash64(offset) % k)`` so one hot key occupies k reducers,
    phase 2 reduces the ≤k partials per key. ``None`` → single-phase.

    Default is single-phase ON PURPOSE: ``max_by`` is a declarative
    aggregate, so Catalyst already runs a map-side partial reduce — a hot
    key collapses to one row per map task *before* the shuffle, which is
    the same defense salting buys, without the second shuffle. Measured
    at sf0.1 (3.1M wide rows, local[32]): single-phase 6.7s vs salted
    30.1s. Reach for ``salt_buckets`` when the aggregate is NOT
    partially-reducible (collect_list-style payloads, window-function
    LWW) or when one *map partition* is itself a single hot key.
    """
    val_cols = [c for c in events.columns if c not in KEY_COLUMNS]
    payload = F.struct(*[F.col(c) for c in val_cols]).alias("_w")

    if not salt_buckets or salt_buckets <= 1:
        winners = events.groupBy(*KEY_COLUMNS).agg(F.max_by(payload, F.col("offset")).alias("_w"))
    else:
        salt = F.pmod(F.xxhash64(F.col("offset")), F.lit(salt_buckets)).alias("_salt")
        partial = events.groupBy(*KEY_COLUMNS, salt).agg(
            F.max_by(payload, F.col("offset")).alias("_w"),
            F.max("offset").alias("_max_off"),
        )
        winners = partial.groupBy(*KEY_COLUMNS).agg(
            F.max_by(F.col("_w"), F.col("_max_off")).alias("_w")
        )
    return winners.select(*KEY_COLUMNS, *[F.col(f"_w.{c}").alias(c) for c in val_cols])


def final_state(events: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Converged table: LWW winners whose last op is not a delete."""
    winners = last_writer_wins(events, salt_buckets=salt_buckets)
    payload = [c for c in events.columns if c not in ENVELOPE_COLUMNS]
    return winners.filter(F.col("op") != "D").select(*payload)


def resolve_partial_updates(
    events: DataFrame,
    payload_cols: list[str] | None = None,
    sets_col: str = "cols_set",
    keep_deletes: bool = False,
    emit_sets: bool = False,
) -> DataFrame:
    """Per-COLUMN last-writer-wins for partial (patch) change events.

    Row-level LWW (``last_writer_wins``) assumes every update carries the
    full post-image — the reference's replay model, where the payload is
    whatever the producer wrote (``KafkaBatchConfig.java:58-62`` leaves
    duplicate/partial semantics entirely to the consumer). Real binlog
    tails are often NOT full-image: MySQL ``binlog_row_image=minimal`` and
    Debezium patch events carry only the columns that changed. Folding
    such a stream with row-level LWW silently nulls every unchanged
    column. This operator owns that case:

    - ``op='I'`` replaces the whole row — it sets EVERY payload column,
      explicit NULLs included.
    - ``op='U'`` sets only the columns named in ``sets_col``
      (``array<string>``); a column absent from the set is UNCHANGED even
      if its value is NULL, and a column present in the set with a NULL
      value is an explicit SET-to-NULL.
    - ``op='D'`` tombstones the key.

    A key's final row exists iff its latest I/D event is an I; column
    ``c``'s final value comes from the latest event that SET ``c``.
    No delete-boundary anchor is needed: an I sets every column, so the
    latest setter of any column is always >= the latest I — a stale
    pre-delete U can never out-offset the reinsert that followed it.
    Updates for keys that were never inserted resolve to no row (the
    latest I/D aggregate is NULL), matching a tail that attached mid-log.

    Scale shape: ONE hash exchange. Every aggregate (per-column filtered
    ``max_by``, the I/D existence ``max_by``, ``max(offset)``) is
    declarative and partially reducible, so a hot key collapses to one
    row per map task before the shuffle — same defense as row-level LWW,
    and strictly cheaper than the fold-by-window a naive patch replay
    needs (which ships every event of a key to one task and sorts).

    Output: key + payload columns + ``op``/``partition``/``offset``
    (op='I', envelope from the key's latest event), merge-compatible with
    ``ParquetSnapshotTable.merge_into``. ``keep_deletes=True`` also emits
    op='D' tombstone rows (NULL payload) so deletes propagate through a
    downstream merge.

    ``emit_sets=True`` is the CROSS-COMMIT form, the input contract of
    ``ParquetSnapshotTable.merge_patch``: keys whose batch holds only U
    events are emitted too (op='U' — within one batch they have no base
    row to patch, but the stored table does), and every row carries a
    recomputed ``cols_set`` naming the columns THIS batch actually set
    (all of them after an I; the union of patched columns otherwise), so
    the merge can coalesce unpatched columns from the stored row instead
    of nulling them.
    """
    if payload_cols is None:
        payload_cols = [
            c
            for c in events.columns
            if c not in KEY_COLUMNS and c not in ENVELOPE_COLUMNS and c != sets_col
        ]
    def _sets(c: str) -> str:
        return f"op = 'I' OR (op = 'U' AND array_contains({sets_col}, '{c}'))"

    sets_c = [
        F.expr(f"max_by({c}, offset) FILTER (WHERE {_sets(c)})").alias(c)
        for c in payload_cols
    ]
    set_flags = [
        # "did any post-latest-I event of this batch set c" — after an I
        # every column counts as set, so the flag is simply "any setter"
        F.expr(f"max(offset) FILTER (WHERE {_sets(c)}) IS NOT NULL").alias(f"_set_{c}")
        for c in payload_cols
    ]
    resolved = events.groupBy(*KEY_COLUMNS).agg(
        *sets_c,
        *(set_flags if emit_sets else ()),
        F.expr("max_by(op, offset) FILTER (WHERE op IN ('I', 'D'))").alias("_rowop"),
        F.expr("max_by(partition, offset)").alias("partition"),
        F.max("offset").alias("offset"),
    )
    if emit_sets:
        # op: latest I/D of the batch, or 'U' when the batch only patched
        return resolved.select(
            *KEY_COLUMNS,
            *payload_cols,
            F.coalesce(F.col("_rowop"), F.lit("U")).alias("op"),
            "partition",
            "offset",
            F.array_compact(
                F.array(
                    *[
                        F.when(F.col(f"_set_{c}"), F.lit(c))
                        for c in payload_cols
                    ]
                )
            ).alias(sets_col),
        )
    live = resolved.filter(F.col("_rowop") == "I").select(
        *KEY_COLUMNS, *payload_cols, F.lit("I").alias("op"), "partition", "offset"
    )
    if not keep_deletes:
        return live
    dead = resolved.filter(F.col("_rowop") == "D").select(
        *KEY_COLUMNS,
        *[F.lit(None).cast(events.schema[c].dataType).alias(c) for c in payload_cols],
        F.lit("D").alias("op"),
        "partition",
        "offset",
    )
    return live.unionByName(dead)
