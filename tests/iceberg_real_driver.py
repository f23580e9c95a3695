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
5. bucketed write-mode mapping — a table created with
   ``recommended_partitioning("bucketed", n)`` (the ``bucket(n, conv_id)``
   transform) + ``recommended_table_properties("bucketed")`` must accept
   fenced MERGEs, spread rows across bucket partitions, and fence a
   replay, proving all THREE sandbox write modes map to real DDL.
6. maintained-MV advance — ``IcebergChangelogAdapter`` +
   ``MaintainedCountSum`` bootstrap on the first snapshot and DELTA-
   advance over the second; result must equal the from-scratch
   aggregate of the current table state.

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

    # 5. bucketed write-mode mapping: bucket(n, conv_id) DDL + fenced MERGEs
    ident_b = "local.db.transcripts_bucketed"
    props_b = ", ".join(
        f"'{k}'='{v}'"
        for k, v in IcebergMergeBackend.recommended_table_properties("bucketed").items()
    )
    part_b = IcebergMergeBackend.recommended_partitioning("bucketed", 16)
    spark.sql(
        f"""CREATE TABLE {ident_b} (
            conv_id STRING, turn_idx INT, role STRING, text STRING,
            tool STRING, ts TIMESTAMP, _op STRING, _partition INT, _offset BIGINT
        ) USING iceberg {part_b} TBLPROPERTIES ({props_b})"""
    )
    backend_b = IcebergMergeBackend(ident_b)
    wide = batch([(f"c{i}", 0, "user", f"t{i}", None, "U", 0, i) for i in range(40)])
    rb0 = backend_b.merge_into(spark, last_writer_wins(wide), batch_id=0, ranges={0: (0, 40)})
    assert not rb0.skipped
    upd = batch([("c1", 0, "user", "edited", None, "U", 0, 40),
                 ("c2", 0, None, None, None, "D", 0, 41)])
    rb1 = backend_b.merge_into(spark, last_writer_wins(upd), batch_id=1, ranges={0: (40, 42)})
    assert not rb1.skipped
    # the bucket transform actually partitions: >1 bucket dir holds data
    n_parts = spark.sql(f"SELECT count(*) FROM {ident_b}.partitions").collect()[0][0]
    assert n_parts > 1, f"bucket(16, conv_id) produced {n_parts} partition(s)"
    got_b = {
        r["conv_id"]: r["text"]
        for r in spark.table(ident_b).filter(F.col("_op") != "D").collect()
    }
    assert got_b["c1"] == "edited" and "c2" not in got_b and len(got_b) == 39, got_b
    assert backend_b.merge_into(
        spark, last_writer_wins(wide), batch_id=0, ranges={0: (0, 40)}
    ).skipped, "bucketed replay must be fenced"
    print(f"bucketed: {part_b} DDL accepted; {n_parts} bucket partitions; "
          "MERGE converged; replay fenced")

    # 6. maintained-MV advance through the changelog adapter
    from kafka_plugins_spark.lake import IcebergChangelogAdapter
    from kafka_plugins_spark.operators.incremental import (
        MaintainedCountSum,
        count_sum_aggregate,
    )

    adapter = IcebergChangelogAdapter(spark, ident_b)
    mv_dir = tempfile.mkdtemp(prefix="iceberg_mv_")
    mv = MaintainedCountSum(adapter, mv_dir, ["role"], sum_cols=["turn_idx"])
    # bootstrap reflects the CURRENT snapshot; prove the DELTA path by
    # committing one more batch and advancing again
    info = mv.advance()
    assert info["bootstrapped"], info
    more = batch([("c50", 0, "assistant", "new", None, "U", 0, 42),
                  ("c3", 0, None, None, None, "D", 0, 43)])
    assert not backend_b.merge_into(
        spark, last_writer_wins(more), batch_id=2, ranges={0: (42, 44)}
    ).skipped
    info = mv.advance()
    assert info["delta_applied"] and not info["bootstrapped"], info
    got_mv = sorted(tuple(r) for r in mv.read().collect())
    want_mv = sorted(
        tuple(r)
        for r in count_sum_aggregate(adapter.read(), ["role"], ["turn_idx"]).collect()
    )
    assert got_mv == want_mv, f"MV diverged: {got_mv} != {want_mv}"
    print("mv: bootstrap + O(delta) advance against the real catalog == full recompute")

    # 7. column-level patch MERGE (build_merge_patch_sql) on a fresh table
    ident_p = "local.db.transcripts_patch"
    spark.sql(f"DROP TABLE IF EXISTS {ident_p}")
    spark.sql(
        f"CREATE TABLE {ident_p} (conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, _op string, _partition int, "
        "_offset bigint) USING iceberg"
    )
    from kafka_plugins_spark.lake import IcebergMergeBackend

    backend_p = IcebergMergeBackend(ident_p)

    def patch_batch(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, op string, partition int, offset long, "
            "cols_set array<string>",
        ).withColumn("ts", F.timestamp_seconds(F.col("offset") + 1_700_000_000))

    full = ["role", "text", "tool", "ts"]
    patch_batch(
        [("p1", 0, "user", "hello", "t0", "I", 0, 0, full),
         ("p2", 0, "user", "bye", None, "I", 0, 1, full)]
    ).createOrReplaceTempView("patch_updates")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    spark.sql(backend_p.build_merge_patch_sql("patch_updates", cols))
    # patch ONLY tool on p1, tombstone p2, orphan-patch p9 (must not insert)
    patch_batch(
        [("p1", 0, None, None, "t1", "U", 0, 2, ["tool"]),
         ("p2", 0, None, None, None, "D", 0, 3, []),
         ("p9", 0, None, "ghost", None, "U", 0, 4, ["text"])]
    ).createOrReplaceTempView("patch_updates")
    spark.sql(backend_p.build_merge_patch_sql("patch_updates", cols))
    got_p = {
        (r["conv_id"]): (r["text"], r["tool"], r["_op"])
        for r in spark.table(ident_p).collect()
    }
    assert got_p["p1"] == ("hello", "t1", "U"), got_p  # text kept, tool patched
    assert got_p["p2"][2] == "D" and got_p["p2"][0] is None, got_p
    assert "p9" not in got_p, got_p
    # late patch on the tombstoned p2 is a no-op; a full I resurrects
    patch_batch(
        [("p2", 0, None, "zombie", None, "U", 0, 5, ["text"]),
         ("p2", 1, "user", "fresh", None, "I", 0, 6, full)]
    ).createOrReplaceTempView("patch_updates")
    spark.sql(backend_p.build_merge_patch_sql("patch_updates", cols))
    rows_p = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_op"])
        for r in spark.table(ident_p).collect()
    }
    assert rows_p[("p2", 0)] == (None, "D"), rows_p  # not resurrected
    assert rows_p[("p2", 1)] == ("fresh", "I"), rows_p
    print("patch: column-level MERGE composed, tombstone held, orphan dropped")

    print("ICEBERG-REAL-OK")
    spark.stop()


if __name__ == "__main__":
    main()
