"""sf1-scale bucketed write-amplification datapoint (VERDICT r5 item 5).

The write-amplification triangle in BENCH/bucketed.md was measured at
154k rows; the sf1 stretch replay (31.5M events, BENCH/stretch.md)
predates bucketed mode. This run replays the SAME 31.5M-event log into
a bucketed table (n_buckets=256 — sized so one bucket holds ~2.7k
conversations here; at 100 TB scale the same sizing rule gives a few GB
per bucket) and measures, with du (deterministic, immune to the host's
CPU throttle):

- bytes written by the initial load and by each trickle commit;
- MEASURED bucket touches per trickle batch vs the scattering law
  E = n·(1−e^(−c/n)) for a batch updating c uniformly-random
  conversations — the prediction that tells an operator when bucketing
  stops paying (c ≫ n ⇒ full rewrite; raise n_buckets);
- read wall (window-free union scan) best-of-3, next to MoR at the
  same scale (whose read must resolve deltas until compaction).

Plain CoW at this scale is not re-run: its bytes/commit IS the table
size by construction (full rewrite per commit — the initial-load du
below is exactly that number), so running 10 more full rewrites would
burn an hour to confirm a tautology.

Run:  taskset -c 16-31 env SPARK_GRAFT_CPUS=16 PYTHONPATH=/root/repo \
          python BENCH/bucketed_sf1.py [n_conversations]
"""

import json
import math
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from kafka_plugins_spark import get_spark
from kafka_plugins_spark.datagen import generate_events, write_events
from kafka_plugins_spark.lake import ParquetSnapshotTable
from kafka_plugins_spark.operators.resolve import last_writer_wins
from kafka_plugins_spark.sources.events import scan_events

N_BUCKETS = 256


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def pick_convs(events, c: int, salt: int) -> list[str]:
    """c deterministic uniformly-random conversation ids."""
    return [
        r["conv_id"]
        for r in (
            events.select("conv_id")
            .distinct()
            .orderBy(F.xxhash64(F.concat(F.col("conv_id"), F.lit(str(salt)))))
            .limit(c)
            .collect()
        )
    ]


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 700_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("bucketed_sf1", cores=cores)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    root = tempfile.mkdtemp(prefix="bucketed_sf1_", dir=base)
    out: dict = {"n_conversations": n_conv, "n_buckets": N_BUCKETS, "cores": cores}
    try:
        # SF1_EVENTS reuses an already-generated log (the ~15-min datagen
        # is the expensive fixed cost; the first attempt of this run was
        # OOM-killed by host co-tenancy after datagen completed)
        ev_dir = os.environ.get("SF1_EVENTS") or os.path.join(root, "events")
        t0 = time.monotonic()
        if not os.path.isdir(ev_dir):
            write_events(
                generate_events(spark, n_conversations=n_conv, n_partitions=32, seed=17),
                ev_dir,
            )
        # no .persist(): the log lives on tmpfs and re-scans are cheap;
        # caching 33M deserialized rows on top of the merge's own persist
        # doubles peak heap for nothing
        events = scan_events(spark, ev_dir)
        n_events = events.count()
        out["n_events"] = n_events
        out["datagen_wall_s"] = round(time.monotonic() - t0, 1)
        print(f"events ready: {n_events} in {out['datagen_wall_s']}s", flush=True)
        hi = int(events.agg(F.max("offset")).collect()[0][0])

        # trickle phases: bucket-aligned (1 expected touch), then two
        # uniformly-random conv sets sized around/above n_buckets to
        # probe the scattering law
        phases = [("aligned_bucket7", None), ("random_c100", 100), ("random_c500", 500)]

        for mode in ("bucketed", "mor"):
            kw = {"n_buckets": N_BUCKETS} if mode == "bucketed" else {}
            tpath = os.path.join(root, f"t_{mode}")
            table = ParquetSnapshotTable(spark, tpath, mode=mode, **kw)
            t0 = time.monotonic()
            table.merge_into(last_writer_wins(events), batch_id=0)
            res: dict = {
                "init_wall_s": round(time.monotonic() - t0, 1),
                "table_bytes_after_load": du(os.path.join(tpath, "data")),
                "trickles": {},
            }
            print(mode, "loaded:", json.dumps(
                {k: v for k, v in res.items() if k != "trickles"}), flush=True)
            for i, (name, c) in enumerate(phases):
                if c is None:
                    batch = events.filter(
                        F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS)) == F.lit(7)
                    )
                    expected = 1.0
                else:
                    convs = pick_convs(events, c, salt=i)
                    batch = events.filter(F.col("conv_id").isin(convs))
                    expected = N_BUCKETS * (1 - math.exp(-c / N_BUCKETS))
                batch = batch.withColumn(
                    "offset", F.col("offset") + F.lit((i + 1) * (hi + 1))
                ).withColumn("text", F.concat(F.col("text"), F.lit(f"-u{i}")))
                manifest_before = dict(
                    (table.current_snapshot() or {}).get("bucket_paths", {})
                )
                before = du(os.path.join(tpath, "data"))
                t0 = time.monotonic()
                table.merge_into(last_writer_wins(batch), batch_id=i + 1)
                wall = round(time.monotonic() - t0, 1)
                manifest_after = dict(
                    (table.current_snapshot() or {}).get("bucket_paths", {})
                )
                touched = sum(
                    1
                    for k in set(manifest_before) | set(manifest_after)
                    if manifest_before.get(k) != manifest_after.get(k)
                )
                res["trickles"][name] = {
                    "bytes": du(os.path.join(tpath, "data")) - before,
                    "wall_s": wall,
                    "buckets_touched": touched if mode == "bucketed" else None,
                    "scattering_predicted": round(expected, 1) if mode == "bucketed" else None,
                }
                print(mode, name, json.dumps(res["trickles"][name]), flush=True)
            walls = []
            for _ in range(3):
                t0 = time.monotonic()
                rows = table.read().count()
                walls.append(round(time.monotonic() - t0, 2))
            res["read_wall_s_best"] = min(walls)
            res["read_walls_s"] = walls
            res["rows"] = rows
            res["live_data_dirs"] = table.live_data_dirs()
            out[mode] = res
            print(mode, "done:", json.dumps(
                {k: v for k, v in res.items() if k != "trickles"}), flush=True)
        print("RESULT " + json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        try:
            spark.stop()
        except Exception:
            pass


if __name__ == "__main__":
    main()
