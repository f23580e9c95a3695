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
    # number of data dirs the current snapshot reads. For mode="mor"
    # this is the read-amplification signal (>1 means deltas await
    # compact()); for mode="bucketed" it is layout (one dir per live
    # bucket, no resolution cost) — read it together with write_mode.
    live_data_dirs: int = 0
    write_mode: str = "cow"
    n_buckets: int | None = None


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
                        live_data_dirs=t.live_data_dirs(),
                        write_mode=t._write_mode(),
                        n_buckets=(
                            None if snap is None else snap.get("n_buckets")
                        ),
                    )
                )
        return out

    def sample(self, name: str, limit: int = 100) -> DataFrame:
        """First ``limit`` rows of a table (partial scan via LIMIT)."""
        t = ParquetSnapshotTable(self.spark, os.path.join(self.warehouse, name))
        return t.read().limit(limit)


def ops_report(
    table: ParquetSnapshotTable,
    events_path: str | None = None,
    end_offsets: dict[int, int] | None = None,
    start_offsets: dict[int, int] | None = None,
    mv_paths: list[str] | None = None,
) -> dict:
    """One pageable JSON document for everything an on-call operator
    asks of an ingest table — the unified surface the reference lacks
    (its ``KafkaPartitionOffsets`` file must be fetched and decoded by
    hand; provenance ``KafkaPartitionOffsets.java:69-95``):

    - **commit state**: snapshot/batch ids, write mode, rows applied,
      retained snapshots, live data dirs (the compact() trigger for MoR);
    - **fence watermarks**: per-partition contiguous watermark plus the
      FULL delivered interval set, with backfill gaps listed explicitly
      (``gaps`` is what to re-ingest — a high-watermark report would
      hide them);
    - **consumer lag** vs the event log (or broker-provided end/start
      offsets — retention-aware), with a single ``caught_up`` bool to
      alert on;
    - **materialized views**: each MV's ``as_of`` snapshot vs the
      table's current one, with a ``stale`` flag to page on.

    Driver-only metadata throughout: snapshot JSON, parquet footer
    stats, MV state dirs — ZERO Spark jobs, so it is safe to poll from
    a cron/alerting loop against a production table.
    """
    from kafka_plugins_spark.sources.events import consumer_lag

    snap = table.current_snapshot()
    delivered = table.delivered_ranges()
    starts = {int(k): max(0, int(v)) for k, v in (start_offsets or {}).items()}
    gaps: dict[str, list[list[int]]] = {}
    fence: dict[str, dict] = {}
    for p, iv in sorted(delivered.items()):
        start = starts.get(p, 0)
        # Gaps and watermark are computed over the RETENTION-CLAMPED view
        # [start, ∞) — the same clamping consumer_lag applies — so the
        # same report never tells the operator to re-ingest offsets the
        # broker trimmed (un-reingestable) nor carries a fence watermark
        # that contradicts the lag block's. 'intervals' stays the raw
        # delivered set: the truthful record of what was ever committed.
        viv = [(max(s, start), e) for s, e in iv if e > start]
        # holes an operator must re-ingest: the LEADING hole from the log's
        # beginning offset (review finding: delivered [(20,30)] used to
        # report gaps={} although [start,20) was never delivered) plus
        # every hole between intervals
        holes = (
            [[start, viv[0][0]]] if viv and viv[0][0] > start else []
        ) + [
            [viv[i][1], viv[i + 1][0]]
            for i in range(len(viv) - 1)
            if viv[i][1] < viv[i + 1][0]
        ]
        if holes:
            gaps[str(p)] = holes
        fence[str(p)] = {
            "intervals": [[int(a), int(b)] for a, b in iv],
            # contiguous-from-start prefix — with broker beginningOffsets
            # supplied, a fully-caught-up consumer of a retention-trimmed
            # log no longer shows a watermark stuck at 0 (consistent with
            # the lag block below)
            "watermark": int(viv[0][1]) if viv and viv[0][0] <= start else start,
        }
    out: dict = {
        "table": table.path,
        "snapshot_id": None if snap is None else snap["snapshot_id"],
        # head-commit wall clock — "when did this table last advance",
        # the first freshness question an on-call asks
        "committed_at_ms": None if snap is None else snap.get("committed_at_ms"),
        "batch_id": None if snap is None else snap.get("batch_id"),
        "write_mode": table._write_mode(),
        "n_buckets": None if snap is None else snap.get("n_buckets"),
        "rows_applied": None if snap is None else snap.get("rows_applied"),
        "snapshots_retained": len(table._snapshot_files()),
        "live_data_dirs": table.live_data_dirs(),
        # un-published write-audit-publish stages: each holds data on
        # disk and goes stale the moment any commit lands — a non-empty
        # list after a pipeline run is an operator signal (publish or
        # abort), invisible to readers and easy to forget
        "staged_commits": sorted(
            f
            for f in os.listdir(os.path.join(table.path, SNAPSHOT_DIR))
            if f.startswith("staged-") and f.endswith(".json")
        )
        if os.path.isdir(os.path.join(table.path, SNAPSHOT_DIR))
        else [],
        "fence": fence,
        "gaps": gaps,
    }
    if events_path is not None or end_offsets is not None:
        lag = consumer_lag(
            table, events_path, end_offsets=end_offsets, start_offsets=start_offsets
        )
        out["lag"] = {str(p): v for p, v in lag.items()}
        out["caught_up"] = all(v["lag"] == 0 for v in lag.values())
    if mv_paths:
        from kafka_plugins_spark.operators.incremental import maintained_view_as_of

        views = []
        for mp in mv_paths:
            mp = mp.rstrip("/")
            asof = maintained_view_as_of(mp)
            views.append(
                {
                    "path": mp,
                    "as_of": asof,
                    "stale": (
                        None
                        if snap is None or asof is None
                        else asof < snap["snapshot_id"]
                    ),
                }
            )
        out["maintained_views"] = views
    return out


class KafkaTopicConnector:
    """Topic-side test/browse/sample — the reference's KafkaConnector
    proper (``KafkaConnector.java:81-134``: ``test`` lists topics,
    ``browse`` returns one entity per topic, ``sample`` consumes up to a
    limit). Expressed over Spark's kafka batch source: listing rides the
    AdminClient inside the connector (``subscribePattern .*`` resolves
    topics), sampling is ``spark.read.format("kafka")`` bounded by
    ``endingOffsets`` — never a streaming query. All option maps build
    broker-free (unit-testable offline); only ``.load()`` needs a broker.
    """

    def __init__(self, spark: SparkSession, brokers: str, extra: dict[str, str] | None = None):
        self.spark = spark
        self.brokers = brokers
        self.extra = dict(extra or {})  # e.g. kerberos_jaas_config(...)

    def _base_options(self) -> dict[str, str]:
        return {"kafka.bootstrap.servers": self.brokers, **self.extra}

    def browse_options(self) -> dict[str, str]:
        """Options for the scan-based topic enumeration fallback: a
        bounded pattern-subscribe read whose rows carry the topic column.
        (An earliest..earliest read would be metadata-only but yields
        ZERO rows — topic names only exist on rows — so it can't list
        anything.) Prefer :meth:`_admin_topics`, which is O(metadata)."""
        return {
            **self._base_options(),
            "subscribePattern": ".*",
            "startingOffsets": "earliest",
            "endingOffsets": "latest",
            "failOnDataLoss": "false",
        }

    def sample_options(self, topic: str) -> dict[str, str]:
        """Options for a bounded sample read of one topic."""
        return {
            **self._base_options(),
            "subscribe": topic,
            "startingOffsets": "earliest",
            "endingOffsets": "latest",
            "failOnDataLoss": "false",
        }

    def _reader(self, options: dict[str, str]):
        r = self.spark.read.format("kafka")
        for k, v in options.items():
            r = r.option(k, v)
        return r

    def _admin_topics(self) -> list[str]:
        """Topic names via the Kafka AdminClient (py4j; needs the
        kafka-clients jar that ships with spark-sql-kafka). O(metadata) —
        the direct analogue of the reference's ``consumer.listTopics()``
        (``KafkaConnector.java:105-109``)."""
        jvm = self.spark.sparkContext._jvm
        props = jvm.java.util.Properties()
        props.put("bootstrap.servers", self.brokers)
        for k, v in self.extra.items():
            if k.startswith("kafka."):
                props.put(k[len("kafka."):], v)
        admin = jvm.org.apache.kafka.clients.admin.AdminClient.create(props)
        try:
            names = admin.listTopics().names().get()
            return sorted(names.toArray())
        finally:
            admin.close()

    def test(self) -> bool:
        """Connectivity check: can topic metadata be listed?"""
        try:
            self._admin_topics()
            return True
        except Exception:
            try:
                self._reader(self.browse_options()).load().limit(0).collect()
                return True
            except Exception:
                return False

    def browse(self) -> list[str]:
        """Topic names, one entity per topic (the reference's browse).

        AdminClient metadata when the kafka-clients jar is present;
        otherwise a bounded scan's distinct topic column (correct but
        O(data) — only the fallback)."""
        try:
            return self._admin_topics()
        except Exception:
            df = self._reader(self.browse_options()).load()
            return sorted(r["topic"] for r in df.select("topic").distinct().collect())

    def sample(self, topic: str, limit: int = 100) -> DataFrame:
        """Up to ``limit`` records of the topic's envelope columns."""
        return self._reader(self.sample_options(topic)).load().limit(limit)
