"""Write-amplification measurement: trickle updates into cow vs mor vs
bucketed tables (produces the numbers in BENCH/bucketed.md).

Workload: full initial load of a generated event log, then K small
update batches, each re-writing the turns of the conversations in ONE
bucket (bucket-aligned selection — the regime bucketing exists for,
where a batch's keys concentrate in few buckets; uniformly scattered
updates touch ~n·(1−e^(−c/n)) of n buckets and degrade toward full
rewrite, which is why n_buckets must scale with table size — see
BENCH/bucketed.md for the law).

Per mode we record: bytes written by each trickle commit (deterministic
— the headline signal, immune to host throttle), per-commit wall,
post-ingest read wall (best of 3), and live data dirs.

Run:  PYTHONPATH=/root/repo python BENCH/bucketed_bench.py [n_conversations]
"""

import json
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

N_BUCKETS = 64
K = 10  # trickle batches


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("bucketed_bench", cores=cores)
    root = tempfile.mkdtemp(prefix="bucketed_bench_")
    try:
        ev_dir = os.path.join(root, "events")
        write_events(
            generate_events(spark, n_conversations=n_conv, n_partitions=8, seed=11),
            ev_dir,
        )
        events = scan_events(spark, ev_dir)
        hi = int(events.agg(F.max("offset")).collect()[0][0])
        results: dict[str, dict] = {}
        for mode, kw in [("cow", {}), ("mor", {}), ("bucketed", {"n_buckets": N_BUCKETS})]:
            tpath = os.path.join(root, f"t_{mode}")
            table = ParquetSnapshotTable(spark, tpath, mode=mode, **kw)
            t0 = time.monotonic()
            table.merge_into(last_writer_wins(events), batch_id=0)
            init_wall = round(time.monotonic() - t0, 2)
            base_bytes = du(os.path.join(tpath, "data"))
            trickle_bytes, trickle_walls = [], []
            for i in range(K):
                # one bucket's conversations, offsets shifted past everything
                # delivered so far (keeps the in-order fast path, like Kafka)
                batch = (
                    events.filter(
                        F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS)) == F.lit(i)
                    )
                    .withColumn("offset", F.col("offset") + F.lit((i + 1) * (hi + 1)))
                    .withColumn("text", F.concat(F.col("text"), F.lit(f"-u{i}")))
                )
                before = du(os.path.join(tpath, "data"))
                t0 = time.monotonic()
                table.merge_into(last_writer_wins(batch), batch_id=i + 1)
                trickle_walls.append(round(time.monotonic() - t0, 2))
                trickle_bytes.append(du(os.path.join(tpath, "data")) - before)
            read_walls = []
            for _ in range(3):
                t0 = time.monotonic()
                rows = table.read().count()
                read_walls.append(round(time.monotonic() - t0, 2))
            results[mode] = {
                "init_wall_s": init_wall,
                "table_bytes_after_load": base_bytes,
                "trickle_bytes_per_commit": trickle_bytes,
                "mean_trickle_bytes": int(sum(trickle_bytes) / K),
                "trickle_walls_s": trickle_walls,
                "read_wall_s_best": min(read_walls),
                "live_data_dirs": table.live_data_dirs(),
                "rows": rows,
            }
            print(mode, json.dumps(results[mode]), flush=True)
        print("RESULT " + json.dumps({"n_conv": n_conv, "hi_offset": hi, **results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
