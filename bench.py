"""Benchmark harness.

Default mode (what the driver runs): one JSON line with the headline
metric — sustained CDC replay events/sec at $SPARK_GRAFT_SF_DIR scale on
local[$SPARK_GRAFT_CPUS] — plus per-query wall times for a representative
operator suite over the sf tables.

--scaling mode (north-rule evidence): runs the identical replay job in
fresh JVMs at local[8] and local[32] on the same pre-generated input and
writes BENCH/BASELINE.md with events/sec at both and the efficiency
T(32)/(4·T(8)).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py
    python bench.py --scaling
    python bench.py --replay-only --cores 8 --events /tmp/x  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "cdc_lww",
    "cdc_final_state",
    "pricing_summary",
    "nation_volume",
    "top_orders_per_customer",
    "sessionize",
    "doc_quality",
    "dedup_minhash_lsh",
    "ann_topk",
    "knn_label_vote",
]


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _gen_events(spark, sf_dir: str, out: str, seed: int = 42, multiplier: int = 1) -> int:
    """Deterministic CDC event log sized to the sf tier (~45 events/conv)."""
    from kafka_plugins_spark.datagen import generate_events, write_wire_events

    n_events_target = spark.read.parquet(f"{sf_dir}/events.parquet").count() * 30 * multiplier
    n_conversations = max(n_events_target // 45, 200)
    df = generate_events(spark, n_conversations=n_conversations, n_partitions=32, seed=seed)
    write_wire_events(df, out)
    return spark.read.parquet(out).count()


def _run_replay(spark, events_path: str, table_path: str, warmup: bool = True) -> dict:
    """Measure sustained replay throughput (the BASELINE.json metric).

    The measured job is the FULL ingest path — wire-format scan, JSON
    payload decode (S6), LWW resolve, fenced CoW merge. A small warmup
    replay first JIT-compiles the generated code paths — the metric is
    *sustained* events/sec, not JVM cold-start."""
    from kafka_plugins_spark.replay import replay

    n_events = spark.read.parquet(events_path).count()
    if warmup:
        with tempfile.TemporaryDirectory(prefix="warmup_") as w:
            # warm a bounded slice: first 20k offsets of each partition
            from kafka_plugins_spark.functions.decode import decode_transcript_events
            from kafka_plugins_spark.operators.resolve import last_writer_wins
            from kafka_plugins_spark.lake import ParquetSnapshotTable
            from kafka_plugins_spark.sources.events import scan_events

            sl = decode_transcript_events(
                scan_events(spark, events_path, max_records_per_partition=20_000)
            )
            t = ParquetSnapshotTable(spark, f"{w}/t")
            t.merge_into(last_writer_wins(sl), batch_id=0)
    t0 = time.monotonic()
    table, results = replay(spark, events_path, table_path, wire=True)
    wall = time.monotonic() - t0
    rows = sum(r.rows_applied for r in results)
    return {
        "n_events": n_events,
        "rows_applied": rows,
        "replay_sec": round(wall, 2),
        "events_per_sec": round(n_events / wall, 1),
    }


def replay_only(cores: int, events_path: str) -> None:
    from kafka_plugins_spark.session import get_spark

    spark = get_spark(f"bench-replay-{cores}", cores=cores)
    with tempfile.TemporaryDirectory(prefix="bench_table_") as tbl:
        print(json.dumps(_run_replay(spark, events_path, f"{tbl}/t")))


def full_bench(sf_dir: str, cores: int) -> dict:
    from kafka_plugins_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    out: dict = {"sf": _sf_value(sf_dir), "cores": cores}

    with tempfile.TemporaryDirectory(prefix="bench_cdc_") as work:
        ev = f"{work}/events"
        n = _gen_events(spark, sf_dir, ev)
        rep = _run_replay(spark, ev, f"{work}/table")
        out["cdc_replay"] = rep
        out["metric"] = "cdc replay-to-converged-table throughput"
        out["value"] = rep["events_per_sec"]
        out["unit"] = "events/sec"
        out["n_events"] = n

    from kafka_plugins_spark.entry_queries import QUERIES

    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        df = QUERIES[name](spark, sf_dir)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.monotonic() - t0, 3)
    out["queries"] = qtimes
    return out


def _steal_sec() -> float:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8]) / 100.0


def scaling(sf_dir: str, rounds: int = 3, multiplier: int = 4) -> dict:
    """North-rule evidence: identical job, local[8] vs local[32].

    The sandbox host throttles CPU unpredictably (identical runs vary
    3-8×; /proc/stat steal confirms), so each config runs ``rounds``
    times INTERLEAVED and the per-config best is compared — standard
    noisy-neighbor methodology. ``multiplier`` scales the event log up
    so the measured region is parallel work, not fixed job overhead.
    All raw runs (with steal CPU-seconds) are reported, not just the
    best, in BENCH/scaling_runs.md (BENCH/BASELINE.md carries the
    curated analysis incl. pinned-CPU work accounting).
    """
    from kafka_plugins_spark.session import get_spark

    spark = get_spark("bench-gen", cores=32)
    work = tempfile.mkdtemp(prefix="bench_scaling_")
    ev = f"{work}/events"
    n = _gen_events(spark, sf_dir, ev, multiplier=multiplier)
    spark.stop()

    runs: list[dict] = []
    for rnd in range(rounds):
        for cores in (8, 32):
            s0, t0 = _steal_sec(), time.monotonic()
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
                 "--cores", str(cores), "--events", ev],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
            r = json.loads(line)
            r.update(
                cores=cores,
                round=rnd,
                steal_cpu_sec=round(_steal_sec() - s0, 1),
                proc_wall_sec=round(time.monotonic() - t0, 1),
            )
            runs.append(r)

    best = {
        c: max((r for r in runs if r["cores"] == c), key=lambda r: r["events_per_sec"])
        for c in (8, 32)
    }
    eff = best[32]["events_per_sec"] / (4 * best[8]["events_per_sec"])
    report = {
        "n_events": n,
        "local8_events_per_sec": best[8]["events_per_sec"],
        "local32_events_per_sec": best[32]["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "runs": runs,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    rows = "\n".join(
        f"| {r['round']} | local[{r['cores']}] | {r['replay_sec']} | "
        f"{r['events_per_sec']} | {r['steal_cpu_sec']} |"
        for r in runs
    )
    with open(os.path.join(REPO, "BENCH", "scaling_runs.md"), "w") as fh:
        fh.write(
            "# BENCH — replay throughput scaling evidence (north rule)\n\n"
            "Identical replay job (LWW resolve → fenced CoW merge) on the same\n"
            f"pre-generated CDC event log ({n} events), fresh JVM per run,\n"
            f"{rounds} interleaved rounds per parallelism level. Sandbox stand-in\n"
            "for N vs 4N executors per BASELINE.md. The host CPU-throttles\n"
            "unpredictably (see steal column); per-config BEST is compared,\n"
            "all raw runs shown.\n\n"
            "| round | config | replay (s) | events/sec | steal cpu-sec |\n"
            "|---|---|---|---|---|\n"
            f"{rows}\n\n"
            f"Best local[8]: **{best[8]['events_per_sec']}** events/sec · "
            f"Best local[32]: **{best[32]['events_per_sec']}** events/sec\n\n"
            f"**Scaling efficiency** `T(32)/(4*T(8))` = **{eff:.3f}** "
            f"(north-rule target ≥ 0.8).\n"
        )
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replay-only", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--events", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.replay_only:
        replay_only(cores, args.events)
        return 0
    if args.scaling:
        print(json.dumps(scaling(sf_dir)))
        return 0
    print(json.dumps(full_bench(sf_dir, cores)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
