"""Batch replay: change-event log → converged transcripts table.

The minimum end-to-end slice (SURVEY.md §7 step 3), the analogue of the
reference's batch-source replay tests
(``AbstractKafkaBatchSourceTest.java:142-229``): read an offset range,
resolve, merge, persist the cursor — except here the cursor commit is
atomic with the data (exactly-once), and resolution happens in the engine
instead of downstream.

Chunked mode splits the offset space into aligned per-partition ranges and
commits one snapshot per chunk — this is what makes replay *resumable*:
re-running from the start is a sequence of fence-skipped no-ops until the
first uncommitted chunk.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_plugins_spark.lake import CommitResult, ParquetSnapshotTable
from kafka_plugins_spark.operators.resolve import last_writer_wins
from kafka_plugins_spark.sources.events import (
    partition_end_offsets,
    partition_end_offsets_from_metadata,
    scan_events,
)


def bootstrap(
    spark: SparkSession,
    snapshot_df,
    table_path: str,
    start_offsets: dict[int, int],
    mode: str | None = None,
    n_buckets: int | None = None,
) -> tuple[ParquetSnapshotTable, CommitResult]:
    """Seed a table from an initial full dump, fencing the tail handoff.

    The canonical CDC start-up (Debezium's snapshot→streaming phase; the
    reference instead starts at an offset sentinel and cannot express "the
    table already reflects everything before X" — ``KafkaConfig.java``
    initial-offset −2/−1): take a consistent dump of the source captured
    at log position ``start_offsets`` (per source partition, exclusive
    "next offset", same convention as the reference's ``untilOffset``),
    write it as the table's first snapshot, and record ``[0, start_p)``
    as DELIVERED for every partition. A subsequent :func:`replay` over
    the FULL log is then exactly-once by construction: chunks below the
    cut are fence-skipped commits, straddling chunks are clipped, and
    nothing pre-dump is ever applied twice.

    Dump rows carry payload columns only (shape of
    :func:`~kafka_plugins_spark.operators.resolve.final_state`). They are
    stored with a synthetic envelope: ``op='I'`` and
    ``offset = min(start_offsets) - 1``, which every tail event
    out-offsets (a key's tail events live in its pinned partition ``p``
    at offsets ``>= start_p >= min(start)``), so read-side and merge-side
    LWW always prefer tail data over the dump — for ANY key→partition
    assignment, which is why the synthetic ``partition`` column (the
    claimed partition id at index ``pmod(xxhash64(conv_id), n)``) is
    bookkeeping, not correctness.
    """
    start_offsets = {int(p): int(s) for p, s in start_offsets.items()}
    if not start_offsets:
        raise ValueError("start_offsets must name at least one partition")
    base = min(start_offsets.values()) - 1
    # The synthetic partition must be one of the CLAIMED partition ids:
    # hashing into 0..n-1 regardless of the claimed set would, for a
    # non-contiguous id set like {3, 7}, record delivered intervals at
    # the synthetic offset on partitions 0 and 1 — partitions the caller
    # never claimed — permanently fencing out their real events there.
    part_ids = sorted(start_offsets)
    part_arr = F.array(*[F.lit(p) for p in part_ids])
    rows = snapshot_df.select(
        *snapshot_df.columns,
        F.lit("I").alias("op"),
        F.element_at(
            part_arr,
            (F.pmod(F.xxhash64("conv_id"), F.lit(len(part_ids))) + 1).cast("int"),
        )
        .cast("int")
        .alias("partition"),
        F.lit(base).cast("long").alias("offset"),
    )
    ranges = {p: (0, s) for p, s in start_offsets.items() if s > 0}
    table = ParquetSnapshotTable(spark, table_path, mode=mode, n_buckets=n_buckets)
    if table.current_snapshot() is not None:
        raise ValueError(f"bootstrap target {table_path} is not empty")
    result = table.merge_into(rows, batch_id=0, ranges=ranges)
    return table, result


def replay(
    spark: SparkSession,
    events_path: str,
    table_path: str,
    chunk_size: int | None = None,
    salt_buckets: int | None = None,
    merge_schema: bool = False,
    max_chunks: int | None = None,
    wire: bool = False,
    mode: str | None = None,
    n_buckets: int | None = None,
    maintained_views: list | None = None,
    patch: bool = False,
) -> tuple[ParquetSnapshotTable, list[CommitResult]]:
    """Replay the event log into the lake table.

    ``chunk_size=None`` → single commit. Otherwise chunk ``i`` covers
    offsets ``[i*chunk_size, (i+1)*chunk_size)`` in every partition.
    ``max_chunks`` stops early (the resume tests run the first half, then
    call replay again to finish — the fence skips committed chunks).
    ``wire=True`` treats the log as Kafka wire shape (binary JSON values)
    and decodes payloads first — the full ingest path incl. S6 decode.
    ``mode="mor"`` commits each chunk as an O(chunk) delta append
    (merge-on-read) instead of a CoW table rewrite — the scale shape for
    many-chunk incremental ingest; run ``table.compact()`` afterwards to
    fold deltas.
    ``maintained_views=[mv, ...]`` advances each persisted MV after each
    committed chunk (same contract as the streaming path: idempotent per
    target snapshot, fenced re-replays advance as no-ops).
    ``patch=True`` treats the log as a PARTIAL-UPDATE stream (events
    carry ``cols_set``): each chunk resolves per-column and applies via
    :meth:`ParquetSnapshotTable.merge_patch` — chunked offset order
    satisfies its in-order contract. Requires ``wire=False`` (the wire
    decoder emits full-row post-images) and CoW mode.
    """
    from kafka_plugins_spark.functions.decode import decode_transcript_events
    from kafka_plugins_spark.operators.resolve import resolve_partial_updates

    if patch and wire:
        raise ValueError("patch=True requires wire=False (patch events carry cols_set)")

    table = ParquetSnapshotTable(spark, table_path, mode=mode, n_buckets=n_buckets)
    events = scan_events(spark, events_path, merge_schema=merge_schema)
    if wire:
        events = decode_transcript_events(events)
    results: list[CommitResult] = []

    def apply(chunk, batch_id, ranges):
        if patch:
            winners = resolve_partial_updates(chunk, emit_sets=True)
            return table.merge_patch(winners, batch_id=batch_id, ranges=ranges)
        winners = last_writer_wins(chunk, salt_buckets=salt_buckets)
        return table.merge_into(winners, batch_id=batch_id, ranges=ranges)

    if chunk_size is None:
        ends = partition_end_offsets_from_metadata(events_path) or partition_end_offsets(events)
        ranges = {p: (0, e) for p, e in ends.items()}
        results.append(apply(events, 0, ranges))
        for mv in maintained_views or ():
            mv.advance()
        return table, results

    ends = partition_end_offsets_from_metadata(events_path) or partition_end_offsets(events)
    if not ends:
        return table, results
    max_end = max(ends.values())
    n_chunks = (max_end + chunk_size - 1) // chunk_size
    if max_chunks is not None:
        n_chunks = min(n_chunks, max_chunks)
    for i in range(n_chunks):
        lo, hi = i * chunk_size, (i + 1) * chunk_size
        ranges = {
            p: (lo, min(hi, end)) for p, end in ends.items() if end > lo
        }
        if not ranges:
            continue
        chunk = scan_events(spark, events_path, ranges=ranges, merge_schema=merge_schema)
        if wire:
            chunk = decode_transcript_events(chunk)
        results.append(apply(chunk, i, ranges))
        for mv in maintained_views or ():
            mv.advance()
    return table, results
