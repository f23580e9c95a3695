"""Real-Iceberg execution proof for the CDC fence — run me on a cluster.

Standalone driver (also invoked by tests/test_iceberg_real.py when an
Iceberg Spark runtime jar is visible): creates a REAL Iceberg table in a
local hadoop catalog, then exercises the exact code paths a cluster user
hits first, in order:

1. ``probe_fence_channel`` — zero-row append carrying a token through the
   session-conf snapshot-property channel; refuses if this Iceberg build
   ignores it.
2. two ``merge_into`` calls (insert+update+delete change batches) with
   fence ranges attached to the MERGE snapshots.
3. replay of batch 0 — must be skipped entirely by the fence.
4. ``rollback_to_snapshot`` + ``pick_delivered`` — the fence must revert
   with the ancestry so the rolled-back batch re-applies.

Prints ``ICEBERG-REAL-OK`` on success; any assertion or API mismatch
exits nonzero.

Usage::

    ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<ver>.jar \
        python tests/iceberg_real_driver.py

or via spark-submit with ``--jars`` and ``--py-files`` per README.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_plugins_spark.lake import IcebergMergeBackend
    from kafka_plugins_spark.operators.resolve import last_writer_wins

    jar = os.environ.get("ICEBERG_JAR", "")
    warehouse = tempfile.mkdtemp(prefix="iceberg_real_")
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-real-fence")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
    )
    if jar:
        builder = builder.config("spark.jars", jar)
    spark = builder.getOrCreate()

    ident = "local.db.transcripts"
    props = ", ".join(
        f"'{k}'='{v}'"
        for k, v in IcebergMergeBackend.recommended_table_properties("mor").items()
    )
    spark.sql(
        f"""CREATE TABLE {ident} (
            conv_id STRING, turn_idx INT, role STRING, text STRING,
            tool STRING, ts TIMESTAMP, _op STRING, _partition INT, _offset BIGINT
        ) USING iceberg TBLPROPERTIES ({props})"""
    )
    backend = IcebergMergeBackend(ident)

    # 1. pre-MERGE channel probe — must pass (or raise loudly) before data
    backend.probe_fence_channel(spark)
    print("probe: channel verified")

    def batch(rows):
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, op string, partition int, offset long",
        ).withColumn("ts", F.timestamp_seconds(F.col("offset") + 1_700_000_000))
        return df

    b0 = batch(
        [
            ("c1", 0, "user", "hello", None, "U", 0, 0),
            ("c1", 1, "assistant", "hi", None, "U", 0, 1),
            ("c2", 0, "user", "draft", None, "U", 0, 2),
        ]
    )
    b1 = batch(
        [
            ("c2", 0, "user", "final", None, "U", 0, 3),  # update c2/0
            ("c1", 1, None, None, None, "D", 0, 4),  # delete c1/1
            ("c3", 0, "user", "new", None, "U", 0, 5),
        ]
    )

    # 2. two fenced MERGEs
    r0 = backend.merge_into(spark, last_writer_wins(b0), batch_id=0, ranges={0: (0, 3)})
    assert not r0.skipped
    r1 = backend.merge_into(spark, last_writer_wins(b1), batch_id=1, ranges={0: (3, 6)})
    assert not r1.skipped
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in spark.table(ident).filter(F.col("_op") != "D").collect()
    }
    assert got == {("c1", 0): "hello", ("c2", 0): "final", ("c3", 0): "new"}, got
    print("merge: converged state correct after 2 fenced MERGEs")

    # 3. replay of batch 0 — fence must skip it without touching the table
    snap_before = spark.sql(
        f"SELECT snapshot_id FROM {ident}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]
    r0_again = backend.merge_into(
        spark, last_writer_wins(b0), batch_id=0, ranges={0: (0, 3)}
    )
    assert r0_again.skipped, "replayed committed range must be a no-op"
    snap_after = spark.sql(
        f"SELECT snapshot_id FROM {ident}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]
    assert snap_before == snap_after, "no-op replay must not commit a snapshot"
    print("fence: replay skipped, snapshot unchanged")

    # 4. rollback — the fence must revert with the ancestry
    first_merge_snap = spark.sql(
        f"""SELECT snapshot_id FROM {ident}.snapshots
            WHERE summary['kps.delivered.0'] IS NOT NULL
            ORDER BY committed_at ASC LIMIT 1"""
    ).collect()[0][0]
    spark.sql(
        f"CALL local.system.rollback_to_snapshot('db.transcripts', {first_merge_snap})"
    )
    delivered = backend.read_delivered(spark)
    assert delivered == {0: [(0, 3)]}, (
        f"after rollback the fence must cover only batch 0, got {delivered}"
    )
    r1_again = backend.merge_into(
        spark, last_writer_wins(b1), batch_id=1, ranges={0: (3, 6)}
    )
    assert not r1_again.skipped, "rolled-back batch must re-apply, not be skipped"
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in spark.table(ident).filter(F.col("_op") != "D").collect()
    }
    assert got == {("c1", 0): "hello", ("c2", 0): "final", ("c3", 0): "new"}, got
    print("rollback: fence reverted with ancestry; batch 1 re-applied; state converged")

    print("ICEBERG-REAL-OK")
    spark.stop()


if __name__ == "__main__":
    main()
