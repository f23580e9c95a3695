"""Custom stateful operator: state survives across micro-batches."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from kafka_plugins_spark.datagen import generate_events
from kafka_plugins_spark.streaming.stateful import track_conversation_progress


def test_conversation_progress_accumulates_across_batches(spark, tmp_path):
    df = generate_events(spark, n_conversations=30, n_partitions=2, seed=17)
    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    df.filter(F.col("offset") < 150).coalesce(1).write.parquet(d1)
    df.filter(F.col("offset") >= 150).coalesce(1).write.parquet(d2)
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    schema = spark.read.parquet(d1).schema

    emitted: list = []

    def run_stream():
        q = (
            track_conversation_progress(
                spark.readStream.schema(schema).parquet(watch)
            )
            .writeStream.foreachBatch(lambda df, _id: emitted.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    for f in glob.glob(f"{d1}/*.parquet"):
        shutil.copy(f, watch)
    run_stream()
    first = {r["conv_id"]: r["n_events"] for r in emitted}
    assert first

    for f in glob.glob(f"{d2}/*.parquet"):
        shutil.copy(f, watch)
    run_stream()
    rows = list(emitted)
    # latest emission per conversation (collector appends update rows)
    latest: dict = {}
    for r in rows:
        cur = latest.get(r["conv_id"])
        if cur is None or r["n_events"] >= cur["n_events"]:
            latest[r["conv_id"]] = r

    expected = {
        r["conv_id"]: (r["n"], r["mx"], r["lo"], r["nd"])
        for r in df.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.max("turn_idx").alias("mx"),
            F.max("offset").alias("lo"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("nd"),
        )
        .collect()
    }
    assert set(latest) == set(expected)
    for cid, r in latest.items():
        n, mx, lo, nd = expected[cid]
        assert r["n_events"] == n, cid  # state accumulated across batches
        assert r["max_turn_idx"] == mx
        assert r["last_offset"] == lo
        assert r["n_deletes"] == nd
    # conversations updated in batch 2 really carried batch-1 state forward
    grew = [c for c in latest if latest[c]["n_events"] > first.get(c, 0) and c in first]
    assert grew
