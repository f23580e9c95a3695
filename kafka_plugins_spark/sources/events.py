"""Batch change-event scan with per-partition offset-range pruning.

Re-expresses the reference's batch source (``KafkaInputFormat.java:56-74``:
one split per partition; ``:137-168``: per-partition ``[start, end)`` with a
``maxNumberRecords`` cap) declaratively: the ranges become filter
predicates, which Catalyst pushes into the parquet scan — partition
directories are pruned (the event log is written partitioned by
``partition``) and row-group min/max stats prune on ``offset``. One task
per file split replaces one split per Kafka partition, which is strictly
more parallel at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_events(
    spark: SparkSession,
    path: str,
    ranges: dict[int, tuple[int, int]] | None = None,
    start_offsets: dict[int, int] | None = None,
    max_records_per_partition: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read the event log, restricted to per-partition offset ranges.

    ``ranges``: partition → [start, end) — both bounds applied.
    ``start_offsets``: partition → start (resume from saved cursor; the
    reference's default start is earliest, ``KafkaBatchSource.java:173-202``).
    ``max_records_per_partition``: the reference's ``maxNumberRecords``
    cap, ``end = min(end, start + max)`` (``KafkaInputFormat.java:160-162``).
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)

    if ranges is None and start_offsets is not None:
        ranges = {p: (s, 1 << 62) for p, s in start_offsets.items()}
    if ranges is not None:
        preds = []
        for p, (start, end) in sorted(ranges.items()):
            if max_records_per_partition is not None:
                end = min(end, start + max_records_per_partition)
            preds.append(
                (F.col("partition") == p)
                & (F.col("offset") >= start)
                & (F.col("offset") < end)
            )
        df = df.filter(reduce(lambda a, b: a | b, preds)) if preds else df.limit(0)
    elif max_records_per_partition is not None:
        df = df.filter(F.col("offset") < max_records_per_partition)
    return df


def partition_end_offsets(events: DataFrame) -> dict[int, int]:
    """partition → next offset after the last event (exclusive end —
    the reference's ``untilOffset`` convention)."""
    rows = events.groupBy("partition").agg(F.max("offset").alias("hi")).collect()
    return {int(r["partition"]): int(r["hi"]) + 1 for r in rows}
