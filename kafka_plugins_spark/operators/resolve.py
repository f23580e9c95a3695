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
