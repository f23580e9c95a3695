"""Producer-side semantics: serialization, keyed partitioning, alerts, DLQ.

Reimagines the reference's sink stack (K1-K4 in SURVEY.md §2a):

- K1 serialization: row → CSV or JSON. The reference joins values with
  commas and NO quoting (``KafkaBatchSink.java:105-129``) — that form is
  kept behind ``quoted=False`` for byte-compat, with a properly quoted
  ``to_csv`` as the default.
- K2 keyed partitioning: ``md5(key) % n`` (``StringPartitioner.java:34-38``)
  with the reference's null-key contract: a null key in a keyed sink
  fails the run (``KafkaBatchSink.java:117-127``). A salted variant
  defuses hot keys, which the reference cannot.
- K3 producer: the real sink is ``df.write.format("kafka")`` (options
  below); offline, :func:`produce_to_log` writes the same keyed/offset
  layout to parquet so round-trip tests run without a broker. Unlike the
  reference's no-op committer (at-least-once,
  ``KafkaOutputFormat.java:51-78``), the offline log write is atomic per
  job — and the lake sink path is exactly-once via the snapshot fence.
- K4 alerts: JSON side-channel with null key (round-robin), plus a
  dead-letter splitter for undecodable records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

NULL_KEY_ERROR = "Message Key field value in the record is null"


def serialize_csv(df: DataFrame, quoted: bool = True) -> DataFrame:
    """Row → single CSV string column ``value``."""
    if quoted:
        value = F.to_csv(F.struct(*df.columns))
    else:
        # reference-compatible: plain join, no quoting/escaping
        value = F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns])
    return df.select(value.alias("value"))


def serialize_json(df: DataFrame) -> DataFrame:
    """Row → single JSON string column ``value``."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def keyed_partition_expr(key_col: str, num_partitions: int) -> F.Column:
    """``md5(key) % n`` — the reference's StringPartitioner, as an
    expression. Null key throws at runtime, matching the reference."""
    digest = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
    part = F.pmod(digest.cast("long"), F.lit(num_partitions)).cast("int")
    return (
        F.when(F.col(key_col).isNull(), F.raise_error(F.lit(NULL_KEY_ERROR)).cast("int"))
        .otherwise(part)
    )


def salted_partition_expr(
    key_col: str, num_partitions: int, salt_buckets: int, salt_cols: list[str]
) -> F.Column:
    """Skew-defusing variant: a hot key spreads over ``salt_buckets``
    adjacent partitions instead of hammering one.

    The salt derives from a hash of payload columns (``salt_cols``),
    never from ``monotonically_increasing_id`` — a retried task
    recomputes the same salt, so a record can't land in two partitions
    across attempts (deterministic under task retry/recomputation).

    NOT for CDC keyed topics: scattering one key across partitions breaks
    the "all offsets of a key live in one partition" invariant that the
    LWW-by-offset resolution depends on. Use :func:`keyed_partition_expr`
    there; this partitioner is for unkeyed/analytics topics where only
    load balance matters."""
    if not salt_cols:
        raise ValueError("salt_cols must name ≥1 payload column (deterministic salt source)")
    base = keyed_partition_expr(key_col, num_partitions)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    return F.pmod(base + salt, F.lit(num_partitions)).cast("int")


def produce_to_log(
    df: DataFrame,
    path: str,
    key_col: str | None = None,
    num_partitions: int = 4,
    fmt: str = "json",
    quoted_csv: bool = True,
) -> None:
    """Offline topic emulation: serialize, assign partitions (keyed md5 or
    round-robin), assign per-partition offsets, write parquet partitioned
    by ``partition`` — the same on-disk shape datagen produces, so the
    batch source can re-read what the sink wrote (round-trip tests)."""
    key = F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")
    value = (
        F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        if fmt == "json"
        else (
            F.to_csv(F.struct(*[F.col(c) for c in df.columns]))
            if quoted_csv
            else F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns])
        )
    )
    if key_col:
        part = keyed_partition_expr(key_col, num_partitions)
    else:
        # "round-robin" = load-balanced, and it must be DETERMINISTIC
        # under task retry: hash the serialized payload, never
        # monotonically_increasing_id (which depends on the partition
        # layout of the attempt, so a retried task could send the same
        # record to two partitions across attempts)
        part = F.pmod(F.xxhash64(value), F.lit(num_partitions)).cast("int")
    out = df.select(key.alias("key"), value.alias("value"), part.alias("partition"))
    w = Window.partitionBy("partition").orderBy(F.col("key").asc_nulls_first(), "value")
    out = out.withColumn("offset", (F.row_number().over(w) - 1).cast("long"))
    out.repartition("partition").write.mode("overwrite").partitionBy("partition").parquet(path)


def publish_changes(changes: DataFrame, path: str, num_partitions: int = 4) -> None:
    """CDC-out (the outbox half the reference's consumers lack): publish
    a ``changes_between`` frame to the offline topic log so downstream
    systems tail the TABLE as a change stream instead of re-scanning it.
    Production swaps the final write for ``df.write.format("kafka")``
    with :func:`kafka_sink_options` — everything before it is the same
    frame.

    Contract a CDC consumer needs, enforced here:

    - keyed by ``conv_id`` (md5 % n, the K2 partitioner) — one
      conversation's changes land in ONE partition, so per-key order is
      per-partition order;
    - per-partition offsets are assigned by a deterministic sort
      ``(conv_id, turn_idx, pre-image-first)`` so an ``update_before``
      always precedes its ``update_after`` and a task retry reproduces
      identical offsets (no monotonically_increasing_id);
    - value is the JSON of the full change row including
      ``_change_type`` — self-describing, replayable into any sink;
    - successive publishes to the SAME path APPEND, continuing each
      partition's offsets from the prior publish's end (read from
      parquet footer stats, no Spark job) — a consumer tailing the
      topic log sees one monotone offset sequence across increments,
      exactly like a real topic (r5 advice: overwrite restarted
      offsets at 0 and clobbered earlier increments). Offsets within
      ONE publish are retry-deterministic; re-publishing the same
      increment twice appends it twice — idempotence across publishes
      is the caller's changes_between bookkeeping, as with any
      at-least-once producer.
    """
    import os

    from kafka_plugins_spark.sources.events import partition_end_offsets_from_metadata

    if changes.isEmpty():
        # publishing an empty increment is a no-op — writing it anyway
        # would create a partition-less parquet dir whose footer read
        # fails and poisons every LATER publish to the path (review
        # finding)
        return
    base: dict[int, int] = {}
    if os.path.isdir(path) and any(
        e.name.startswith("partition=") for e in os.scandir(path)
    ):
        got = partition_end_offsets_from_metadata(path)
        if got is None:  # footers unusable → one metadata-size Spark agg
            prior = changes.sparkSession.read.parquet(path)
            got = {
                int(r["partition"]): int(r["hi"]) + 1
                for r in prior.groupBy("partition").agg(F.max("offset").alias("hi")).collect()
            }
        base = got
    if base:
        bmap = F.create_map(*[F.lit(x) for kv in sorted(base.items()) for x in kv])
        off_base = F.coalesce(bmap[F.col("partition")], F.lit(0)).cast("long")
    else:
        off_base = F.lit(0).cast("long")
    rank = F.when(F.col("_change_type") == "update_before", F.lit(0)).otherwise(F.lit(1))
    payload = [c for c in changes.columns]
    out = changes.select(
        F.col("conv_id").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload])).alias("value"),
        keyed_partition_expr("conv_id", num_partitions).alias("partition"),
        F.col("turn_idx").alias("_turn"),
        rank.alias("_rank"),
    )
    w = Window.partitionBy("partition").orderBy("key", "_turn", "_rank", "value")
    out = (
        out.withColumn("offset", (F.row_number().over(w) - 1 + off_base).cast("long"))
        .drop("_turn", "_rank")
    )
    out.repartition("partition").write.mode("append").partitionBy("partition").parquet(path)


def kafka_sink_options(brokers: str, topic: str, async_mode: bool = False) -> dict[str, str]:
    """Options for ``df.write.format("kafka")`` (production K3).

    ``linger.ms=100`` batching and async⇒acks=1 mirror the reference's
    producer defaults (``KafkaOutputFormat.java:112-133``)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.linger.ms": "100",
        "kafka.acks": "1" if async_mode else "all",
    }


def publish_alerts(alerts: DataFrame, path: str) -> int:
    """K4: alert side-channel — JSON-serialized, null key (round-robin).

    Offline: appended to an ``_alerts`` log dir; returns rows published.
    Per-record try/catch-and-continue in the reference degrades to
    PERMISSIVE serialization here (to_json never throws)."""
    from pyspark.sql import Observation

    obs = Observation()
    out = serialize_json(alerts).observe(obs, F.count(F.lit(1)).alias("n"))
    out.write.mode("append").json(path)
    # Observation rides the write job — ONE pass, and the reported count
    # is exactly what was persisted (a second count() job could disagree
    # for a nondeterministic source, and doubles the work).
    return int(obs.get["n"])


def split_dead_letters(decoded: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """Split records whose decode failed into a dead-letter frame.

    A record is dead when ANY required field is null — one missing
    required field means the decode did not produce a usable record
    (OR semantics; the permissive decoders null individual fields).
    Returns (good, dead)."""
    if not required:
        raise ValueError("split_dead_letters needs ≥1 required field")
    is_dead = None
    for c in required:
        cond = F.col(c).isNull()
        is_dead = cond if is_dead is None else (is_dead | cond)
    return decoded.filter(~is_dead), decoded.filter(is_dead)
