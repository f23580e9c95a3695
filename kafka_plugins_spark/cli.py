"""spark-submit entrypoint: ``spark-submit --py-files kafka_plugins_spark.zip cli.py ...``

Subcommands:
  replay   — batch replay an event log into a lake table (resumable;
             --mode mor for O(batch) delta commits, --compact to fold)
  stream   — tail an event directory (or Kafka topic) into a lake table
  datagen  — write a deterministic synthetic CDC event log
  browse   — list lake tables / sample one
  compact  — fold MoR deltas / drop tombstones (table maintenance)
  package  — build kafka_plugins_spark.zip for spark-submit --py-files
  report   — the on-call JSON: fence watermarks + backfill gaps,
             consumer lag (retention-aware), MV staleness, compaction
             signals — all driver-side metadata, zero Spark jobs

On a real cluster drop the ``--cores`` flag (the session builder only
pins a master when given one via SPARK_GRAFT_CPUS/--cores; spark-submit's
--master wins otherwise) and size ``spark.sql.shuffle.partitions`` to
~2-3× total executor cores — AQE coalesces the rest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from kafka_plugins_spark.config import IngestConfig
from kafka_plugins_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kafka_plugins_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("replay")
    rp.add_argument("--events", required=True)
    rp.add_argument("--table", required=True)
    rp.add_argument("--chunk-size", type=int, default=None)
    rp.add_argument("--salt-buckets", type=int, default=0)
    rp.add_argument("--cores", type=int, default=None)
    rp.add_argument("--mode", choices=["cow", "mor", "bucketed"], default=None,
                    help="cow: rewrite per commit; mor: O(batch) delta appends, LWW at "
                         "read; bucketed: rewrite only key-touched buckets")
    rp.add_argument("--n-buckets", type=int, default=None,
                    help="bucket count for --mode bucketed (pinned at first commit)")
    rp.add_argument("--compact", action="store_true",
                    help="fold MoR deltas (and drop tombstones) after replay")

    st = sub.add_parser("stream")
    st.add_argument("--events", required=True)
    st.add_argument("--table", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--watermark", default="24 hours")
    # default OFF: watermarked dedup drops late events whose offsets the
    # fence then permanently blocks (LWW + fence already dedup exactly)
    st.add_argument("--dedup", action="store_true",
                    help="enable watermarked stateful dedup (only when event-time "
                         "disorder is provably bounded by --watermark)")
    st.add_argument("--salt-buckets", type=int, default=0)
    st.add_argument("--mode", choices=["cow", "mor", "bucketed"], default=None)
    st.add_argument("--n-buckets", type=int, default=None)
    st.add_argument("--cores", type=int, default=None)

    dg = sub.add_parser("datagen")
    dg.add_argument("--out", required=True)
    dg.add_argument("--conversations", type=int, default=1000)
    dg.add_argument("--partitions", type=int, default=8)
    dg.add_argument("--seed", type=int, default=42)
    dg.add_argument("--hot-updates-per-turn", type=int, default=0)
    dg.add_argument("--evolution-cut", type=int, default=None)
    dg.add_argument("--cores", type=int, default=None)

    br = sub.add_parser("browse")
    br.add_argument("--warehouse", required=True)
    br.add_argument("--sample", default=None)
    br.add_argument("--limit", type=int, default=20)

    cp = sub.add_parser("compact", help="fold MoR deltas / drop tombstones (table maintenance)")
    cp.add_argument("--table", required=True)
    cp.add_argument("--cores", type=int, default=None)
    cp.add_argument("--expire-keep", type=int, default=None,
                    help="after compacting, expire history keeping the last N snapshots")
    cp.add_argument("--orphans-older-than", type=float, default=None, metavar="SEC",
                    help="also reclaim data dirs referenced by no snapshot and "
                         "stale commit temps, untouched for SEC seconds "
                         "(history-preserving; Iceberg remove_orphan_files)")

    pg = sub.add_parser(
        "purge",
        help="GDPR hard delete: rewrite the affected files without the "
             "named conversations' rows (bucketed: only touched buckets); "
             "--purge-history also expires time travel to the purge commit",
    )
    pg.add_argument("--table", required=True)
    pg.add_argument("--conv-id", action="append", required=True,
                    help="conversation id to forget (repeatable)")
    pg.add_argument("--purge-history", action="store_true",
                    help="also expire history so no retained file holds the text")
    pg.add_argument("--cores", type=int, default=None)

    pk = sub.add_parser("package", help="zip the library for spark-submit --py-files")
    pk.add_argument("--out", default="kafka_plugins_spark.zip")

    rr = sub.add_parser(
        "report",
        help="one pageable JSON: fence watermarks + backfill gaps, consumer "
             "lag, MV staleness, compaction signals (zero Spark jobs)",
    )
    rr.add_argument("--table", required=True)
    rr.add_argument("--events", default=None,
                    help="event-log path for lag (footer-stats end offsets)")
    rr.add_argument("--end-offsets", default=None,
                    help='JSON {partition: end}, e.g. a broker endOffsets answer')
    rr.add_argument("--start-offsets", default=None,
                    help='JSON {partition: start} — broker beginningOffsets; '
                         "makes lag retention-aware")
    rr.add_argument("--mv", action="append", default=[],
                    help="maintained-view state dir (repeatable); reports "
                         "as_of + staleness vs the table snapshot")
    rr.add_argument("--fsck", action="store_true",
                    help="add integrity findings (missing data paths, broken "
                         "fence intervals, stale WAP stages) — metadata-only")

    args = p.parse_args(argv)
    t0 = time.monotonic()

    if args.cmd == "replay":
        IngestConfig(
            events_path=args.events,
            table_path=args.table,
            salt_buckets=args.salt_buckets or 1,
            chunk_size=args.chunk_size,
        ).validate()
        spark = get_spark("cdc-replay", cores=args.cores)
        from kafka_plugins_spark.replay import replay

        table, results = replay(
            spark, args.events, args.table, chunk_size=args.chunk_size,
            salt_buckets=args.salt_buckets or None, mode=args.mode,
            n_buckets=args.n_buckets,
        )
        if args.compact:
            table.compact()
        applied = sum(1 for r in results if not r.skipped)
        rows = sum(r.rows_applied for r in results)
        print(
            json.dumps(
                {
                    "commits": len(results),
                    "applied": applied,
                    "rows_applied": rows,
                    "wall_sec": round(time.monotonic() - t0, 2),
                    "events_per_sec": round(rows / max(time.monotonic() - t0, 1e-9), 1),
                    "watermarks": table.watermarks(),
                }
            )
        )
        return 0

    if args.cmd == "stream":
        IngestConfig(
            events_path=args.events, table_path=args.table, checkpoint_path=args.checkpoint
        ).validate()
        spark = get_spark("cdc-stream", cores=args.cores)
        from kafka_plugins_spark.streaming.pipeline import file_event_source, start_ingest_stream

        schema = spark.read.parquet(args.events).schema
        s = start_ingest_stream(
            spark,
            file_event_source(spark, args.events, schema),
            args.table,
            args.checkpoint,
            salt_buckets=args.salt_buckets or None,
            watermark_delay=args.watermark,
            dedup=args.dedup,
            mode=args.mode,
            n_buckets=args.n_buckets,
        )
        s.await_and_stop()
        rows = sum(c.rows_applied for c in s.commits)
        print(
            json.dumps(
                {
                    "commits": len(s.commits),
                    "rows_applied": rows,
                    "wall_sec": round(time.monotonic() - t0, 2),
                    "watermarks": s.table.watermarks(),
                }
            )
        )
        return 0

    if args.cmd == "datagen":
        spark = get_spark("cdc-datagen", cores=args.cores)
        from kafka_plugins_spark.datagen import generate_events, write_events

        df = generate_events(
            spark,
            n_conversations=args.conversations,
            n_partitions=args.partitions,
            seed=args.seed,
            hot_updates_per_turn=args.hot_updates_per_turn,
        )
        write_events(df, args.out, evolution_cut_offset=args.evolution_cut)
        n = spark.read.parquet(args.out if args.evolution_cut is None else f"{args.out}/phase=1").count()
        print(json.dumps({"out": args.out, "events_visible": n, "wall_sec": round(time.monotonic() - t0, 2)}))
        return 0

    if args.cmd == "compact":
        spark = get_spark("cdc-compact", cores=args.cores)
        from kafka_plugins_spark.lake import ParquetSnapshotTable

        table = ParquetSnapshotTable(spark, args.table)
        res = table.compact()
        expired = (
            table.expire_snapshots(keep_last=args.expire_keep)
            if args.expire_keep is not None
            else None
        )
        orphans = (
            table.remove_orphan_files(older_than_sec=args.orphans_older_than)
            if args.orphans_older_than is not None
            else None
        )
        print(
            json.dumps(
                {
                    "skipped": res.skipped,
                    "snapshot_id": res.snapshot_id,
                    "expired": expired,
                    "orphans": orphans,
                    "wall_sec": round(time.monotonic() - t0, 2),
                }
            )
        )
        return 0

    if args.cmd == "purge":
        spark = get_spark("cdc-purge", cores=args.cores)
        from kafka_plugins_spark.lake import ParquetSnapshotTable

        table = ParquetSnapshotTable(spark, args.table)
        res = table.purge_keys(args.conv_id, purge_history=args.purge_history)
        res["wall_sec"] = round(time.monotonic() - t0, 2)
        print(json.dumps(res))
        return 0

    if args.cmd == "package":
        # ship exactly the library package, importable from the zip root —
        # the --py-files contract (no Spark session needed)
        import os
        import zipfile

        pkg_root = os.path.dirname(os.path.abspath(__file__))
        parent = os.path.dirname(pkg_root)
        with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
            for dirpath, _, files in os.walk(pkg_root):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        zf.write(full, os.path.relpath(full, parent))
        print(json.dumps({"out": args.out, "files": len(zipfile.ZipFile(args.out).namelist())}))
        return 0

    if args.cmd == "report":
        spark = get_spark("cdc-report")
        from kafka_plugins_spark.connector import ops_report
        from kafka_plugins_spark.lake import ParquetSnapshotTable

        def _offsets(s):
            return None if s is None else {int(k): int(v) for k, v in json.loads(s).items()}

        table = ParquetSnapshotTable(spark, args.table)
        rep = ops_report(
            table,
            events_path=args.events,
            end_offsets=_offsets(args.end_offsets),
            start_offsets=_offsets(args.start_offsets),
            mv_paths=args.mv or None,
        )
        if args.fsck:
            rep["fsck"] = table.fsck()
        print(json.dumps(rep, sort_keys=True))
        return 0

    if args.cmd == "browse":
        spark = get_spark("cdc-browse")
        from kafka_plugins_spark.connector import LakeConnector

        c = LakeConnector(spark, args.warehouse)
        if args.sample:
            for row in c.sample(args.sample, args.limit).collect():
                print(json.dumps(row.asDict(), default=str))
        else:
            for e in c.browse():
                print(json.dumps(e.__dict__))
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
