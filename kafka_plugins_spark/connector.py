"""Connector surface: test / browse / sample — the reference's KafkaConnector.

``KafkaConnector.java:81-134``: ``test`` lists topics, ``browse`` returns
topics as entities, ``sample`` polls up to a limit. The lake-native
equivalent browses snapshot tables under a warehouse root and samples with
``df.limit(n)`` (which Spark turns into a partial scan, not a full read).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kafka_plugins_spark.lake import SNAPSHOT_DIR, ParquetSnapshotTable


@dataclass
class TableEntity:
    name: str
    path: str
    snapshot_id: int | None
    rows_applied: int | None


class LakeConnector:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")

    def test(self) -> bool:
        """Connectivity check — the warehouse root is reachable."""
        return os.path.isdir(self.warehouse)

    def browse(self) -> list[TableEntity]:
        """Every snapshot table under the warehouse, as entities."""
        out = []
        if not self.test():
            return out
        for name in sorted(os.listdir(self.warehouse)):
            p = os.path.join(self.warehouse, name)
            if os.path.isdir(os.path.join(p, SNAPSHOT_DIR)):
                t = ParquetSnapshotTable(self.spark, p)
                snap = t.current_snapshot()
                out.append(
                    TableEntity(
                        name=name,
                        path=p,
                        snapshot_id=None if snap is None else snap["snapshot_id"],
                        rows_applied=None if snap is None else snap.get("rows_applied"),
                    )
                )
        return out

    def sample(self, name: str, limit: int = 100) -> DataFrame:
        """First ``limit`` rows of a table (partial scan via LIMIT)."""
        t = ParquetSnapshotTable(self.spark, os.path.join(self.warehouse, name))
        return t.read().limit(limit)
