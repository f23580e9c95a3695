"""Deterministic, seeded CDC-event generator — the Kafka-topic stand-in.

Replaces the reference's embedded-broker test producer
(``KafkaTestCommon.java:43-53``) with a *distributed* generator: every value
is a pure column expression over ``spark.range``, so the same code produces
10k events for unit tests and 10^8+ for bench runs with no driver-side data
and full determinism (xxhash64 of seeded strings, no RNG state).

Guarantees (FIXTURES.md §2):
- a conv_id maps to exactly one partition (keyed produce, as the
  reference's ``StringPartitioner.java:34-38``)
- offsets strictly increase within each partition, start at 0, no gaps
- ~`duplicate_rate` of events appear twice with identical
  ``(partition, offset)`` — replay duplicates
- ~`ooo_fraction` of events are delivered late within a bounded window
- optional hot conversation (``conv-<seed>-000000``) holding a large
  share of events, for the skew tests
- optional schema-evolution cut: events are split into a pre-cut phase
  written WITHOUT the ``tool`` column and a post-cut phase with it
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_plugins_spark.schema import CHANGE_EVENT

BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z


def _h(*cols, salt: str) -> F.Column:
    """Non-negative deterministic 64-bit hash of (cols..., salt)."""
    return F.abs(F.xxhash64(*cols, F.lit(salt)))


def generate_events(
    spark: SparkSession,
    n_conversations: int,
    n_partitions: int = 8,
    seed: int = 42,
    max_turns: int = 64,
    update_rate: float = 0.30,
    delete_rate: float = 0.05,
    duplicate_rate: float = 0.02,
    ooo_fraction: float = 0.10,
    ooo_window: int = 16,
    hot_updates_per_turn: int = 0,
) -> DataFrame:
    """Build the change-event DataFrame (schema ``CHANGE_EVENT``).

    ``hot_updates_per_turn > 0`` gives conversation 0 that many extra
    update events per turn — the hot-key skew fixture.
    """
    sd = F.lit(f"s{seed}")

    convs = spark.range(n_conversations).select(
        F.format_string(f"conv-{seed}-%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    n_turns = (_h(F.col("conv_id"), sd, salt="turns") % max_turns + 1).cast("int")
    if hot_updates_per_turn > 0:
        # the hot conversation gets the full turn count so its event share
        # is actually dominant, not diluted by a small random turn count
        n_turns = F.when(F.col("conv_no") == 0, F.lit(max_turns)).otherwise(n_turns)
    convs = convs.withColumn("n_turns", n_turns)

    turns = convs.select(
        "conv_id",
        "conv_no",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    # events per turn: 1 insert, 0-2 updates, 0-1 trailing delete
    u_h = _h(F.col("conv_id"), F.col("turn_idx"), sd, salt="upd") % 1000
    d_h = _h(F.col("conv_id"), F.col("turn_idx"), sd, salt="del") % 1000
    n_upd = (
        F.when(u_h < int(update_rate * 1000 * 0.25), 2)
        .when(u_h < int(update_rate * 1000), 1)
        .otherwise(0)
    )
    if hot_updates_per_turn > 0:
        n_upd = F.when(F.col("conv_no") == 0, F.lit(hot_updates_per_turn)).otherwise(n_upd)
    turns = turns.withColumn("n_upd", n_upd).withColumn(
        "has_del", (d_h < int(delete_rate * 1000)).cast("int")
    )

    ev = turns.select(
        "conv_id",
        "conv_no",
        "turn_idx",
        "n_upd",
        F.explode(F.sequence(F.lit(0), F.col("n_upd") + F.col("has_del"))).alias("ev_i"),
    )
    ev = ev.withColumn(
        "op",
        F.when(F.col("ev_i") == 0, "I")
        .when(F.col("ev_i") <= F.col("n_upd"), "U")
        .otherwise("D"),
    ).withColumn("version", F.least(F.col("ev_i"), F.col("n_upd")))

    # --- payload (null for deletes, like a tombstone) ----------------------
    role_h = _h(F.col("conv_id"), F.col("turn_idx"), sd, salt="role") % 10
    role = (
        F.when(role_h == 0, "system")
        .when(role_h == 1, "tool")
        .when(F.col("turn_idx") % 2 == 0, "user")
        .otherwise("assistant")
    )
    text_len = (_h(F.col("conv_id"), F.col("turn_idx"), F.col("version"), sd, salt="len") % 2033 + 16).cast("int")
    # text is deterministic from (conv_id, turn_idx, version): md5 repeated
    # then cut to a hash-derived length in [16, 2048]
    text = F.expr("substring(text_full, 1, text_len)")
    tool = F.when(role_h == 1, F.format_string("tool-%d", (_h(F.col("conv_id"), F.col("turn_idx"), sd, salt="tool") % 7).cast("int")))
    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH)
        + _h(F.col("conv_id"), sd, salt="t0") % 86400
        + F.col("turn_idx") * 30
        + F.col("version") * 300
        + F.col("ev_i")
        + _h(F.col("conv_id"), F.col("turn_idx"), F.col("ev_i"), sd, salt="jit") % 17
    )
    is_del = F.col("op") == "D"
    ev = (
        ev.withColumn("text_len", text_len)
        .withColumn(
            "text_full",
            F.repeat(F.md5(F.concat_ws("|", F.col("conv_id"), F.col("turn_idx"), F.col("version"), sd)), 64),
        )
        .withColumn("role", F.when(is_del, F.lit(None)).otherwise(role))
        .withColumn("text", F.when(is_del, F.lit(None)).otherwise(text))
        .withColumn("tool", F.when(is_del, F.lit(None)).otherwise(tool))
        .withColumn("ts", ts)
        .drop("text_len", "text_full")
    )

    # --- envelope: partition pinning + offset assignment -------------------
    ev = ev.withColumn("partition", (_h(F.col("conv_id"), sd, salt="part") % n_partitions).cast("int"))
    # delivery order: inserts in turn order first, then updates, then
    # deletes (seq), conversations interleaved by the tiebreaker; a slice of
    # events is delayed by up to `ooo_window` seq units (late delivery).
    seq = F.col("ev_i") * 100000 + F.col("turn_idx")
    late = _h(F.col("conv_id"), F.col("turn_idx"), F.col("ev_i"), sd, salt="ooo") % 1000 < int(ooo_fraction * 1000)
    jitter = F.when(late, _h(F.col("conv_id"), F.col("turn_idx"), F.col("ev_i"), sd, salt="ooow") % (ooo_window * 64)).otherwise(0)
    ev = ev.withColumn("gkey", seq * 64 + jitter)
    w = Window.partitionBy("partition").orderBy("gkey", "conv_id", "turn_idx", "ev_i")
    ev = ev.withColumn("offset", (F.row_number().over(w) - 1).cast("long"))

    # --- replay duplicates: same row, same (partition, offset) -------------
    out_cols = [f.name for f in CHANGE_EVENT.fields]
    base = ev.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
        "op",
        "partition",
        "offset",
    )
    if duplicate_rate > 0:
        dupes = base.filter(
            _h(F.col("conv_id"), F.col("turn_idx"), F.col("offset"), sd, salt="dup") % 1000
            < int(duplicate_rate * 1000)
        )
        base = base.unionByName(dupes)
    return base.select(*out_cols)


def write_wire_events(df: DataFrame, path: str) -> None:
    """Write the event log in Kafka wire shape: ``(key binary, value
    binary(JSON payload+op), partition, offset)`` — what the broker
    actually hands the engine. The bench replays THIS (decode included),
    so the measured pipeline matches the reference's decode-then-emit
    path (``KafkaStreamingSourceUtil.java:327-342``)."""
    payload_cols = [c for c in df.columns if c not in ("partition", "offset")]
    out = df.select(
        F.col("conv_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*payload_cols)).cast("binary").alias("value"),
        "partition",
        "offset",
    )
    out.repartition("partition").write.mode("overwrite").partitionBy("partition").parquet(path)


def write_events(
    df: DataFrame,
    path: str,
    evolution_cut_offset: int | None = None,
) -> None:
    """Write the event log as parquet partitioned by source partition.

    With ``evolution_cut_offset`` set, events with ``offset < cut`` are
    written to ``{path}/phase=0`` WITHOUT the ``tool`` column (the
    pre-evolution schema) and the rest to ``{path}/phase=1`` with it —
    the schema-evolution fixture (FIXTURES.md §2).
    """
    if evolution_cut_offset is None:
        df.repartition("partition").write.mode("overwrite").partitionBy("partition").parquet(path)
        return
    pre = df.filter(F.col("offset") < evolution_cut_offset).drop("tool")
    post = df.filter(F.col("offset") >= evolution_cut_offset)
    pre.repartition("partition").write.mode("overwrite").partitionBy("partition").parquet(f"{path}/phase=0")
    post.repartition("partition").write.mode("overwrite").partitionBy("partition").parquet(f"{path}/phase=1")
