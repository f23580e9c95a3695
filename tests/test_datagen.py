"""Generator invariants (FIXTURES.md §2)."""

from pyspark.sql import functions as F

from kafka_plugins_spark.datagen import generate_events


def test_offsets_contiguous_per_partition(spark, events_path):
    ev = spark.read.parquet(events_path).dropDuplicates(["partition", "offset"])
    stats = (
        ev.groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert stats
    for r in stats:
        assert r["lo"] == 0
        assert r["n"] == r["hi"] + 1  # no gaps


def test_conv_pinned_to_one_partition(spark, events_path):
    ev = spark.read.parquet(events_path)
    multi = (
        ev.groupBy("conv_id")
        .agg(F.countDistinct("partition").alias("np"))
        .filter(F.col("np") > 1)
        .count()
    )
    assert multi == 0


def test_duplicates_are_exact_replays(spark, events_path):
    ev = spark.read.parquet(events_path)
    total = ev.count()
    distinct_rows = ev.distinct().count()
    distinct_offsets = ev.dropDuplicates(["partition", "offset"]).count()
    assert total > distinct_offsets  # duplicates exist
    # a duplicated (partition, offset) always carries an identical full row
    assert distinct_rows == distinct_offsets


def test_deterministic(spark, tmp_path):
    a = generate_events(spark, n_conversations=25, n_partitions=2, seed=9)
    b = generate_events(spark, n_conversations=25, n_partitions=2, seed=9)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ops_mix(spark, events_path):
    ops = {
        r["op"]: r["n"]
        for r in spark.read.parquet(events_path).groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    assert set(ops) == {"I", "U", "D"}
    assert ops["I"] > ops["U"] > ops["D"] > 0


def test_delete_is_tombstone(spark, events_path):
    ev = spark.read.parquet(events_path).filter(F.col("op") == "D")
    assert ev.filter(F.col("text").isNotNull() | F.col("role").isNotNull()).count() == 0


def test_hot_key_share(spark, skew_events_path):
    ev = spark.read.parquet(skew_events_path)
    total = ev.count()
    hot = ev.filter(F.col("conv_id").endswith("000000")).count()
    assert hot / total > 0.35  # the skew fixture is actually skewed
