"""Round-7 optimization measurement harness (bench.py is FROZEN — this
file holds the extra instrumentation the optimization round needs).

Modes:
  --make-sf1sim          build /dev/shm/sf1sim: sf0.1 tables replicated 10x
                         with id offsets (TIMING ONLY — never used for
                         correctness; the driver's own sf1 is its own gen).
  --time Q1,Q2 [--sf D] [--reps N]
                         noop-sink wall times per query (guide §1.4), best
                         and all reps printed as JSON.
  --plans [--sf D] [--out DIR] [--suffix before|after]
                         capture .explain("formatted") for each bench query.

Engine-drive queries (cdc_final_state_bucketed etc.) run their merges
eagerly at construction, so the clock starts BEFORE construction — same
methodology as bench.py.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF1SIM = "/dev/shm/sf1sim"

TABLES_REPLICATE = {
    # table -> (id column to offset, offset step)
    "embeddings": ("vec_id", 2_000),
    "documents": ("doc_id", 5_000),
    "events": ("event_id", None),  # special: offset event_id AND user_id
    "lineitem": ("l_orderkey", None),
    "orders": ("o_orderkey", None),
    "customer": ("c_custkey", None),
}
TABLES_COPY = ["nation", "region", "supplier", "part"]


def make_sf1sim(src: str = "/root/testdata/sf0.1", out: str = SF1SIM) -> None:
    from pyspark.sql import functions as F

    from kafka_plugins_spark.session import get_spark

    spark = get_spark("sf1sim-gen", cores=32)
    os.makedirs(out, exist_ok=True)
    for t in TABLES_COPY:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, (idc, step) in TABLES_REPLICATE.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if step is None:
            step = df.agg(F.max(idc)).collect()[0][0] + 1
        parts = []
        for i in range(10):
            p = df.withColumn(idc, F.col(idc) + F.lit(i * step))
            if t == "events":
                # keep user ids disjoint per replica too, so groupBys scale
                p = p.withColumn("user_id", F.col("user_id") + F.lit(i * 100_000))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())


def _bench_queries() -> list[str]:
    from bench import BENCH_QUERIES

    return list(BENCH_QUERIES)


def _get(name):
    from kafka_plugins_spark.entry_queries import EXTRA_QUERIES, QUERIES

    return {**QUERIES, **EXTRA_QUERIES}[name]


def time_queries(names: list[str], sf: str, reps: int) -> None:
    from kafka_plugins_spark.session import get_spark

    spark = get_spark("bench-extra", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = {}
    for name in names:
        fn = _get(name)
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r7:{name}")
            t0 = time.monotonic()
            df = fn(spark, sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(runs), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


def dump_plans(names: list[str], sf: str, out_dir: str, suffix: str) -> None:
    from kafka_plugins_spark.session import get_spark

    spark = get_spark("bench-extra-plans", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = _get(name)
        df = fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("plan:", name, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-sf1sim", action="store_true")
    ap.add_argument("--time", default=None, help="comma-separated query names, or 'all'")
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r07"))
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None, help="for --plans: subset")
    args = ap.parse_args()

    if args.make_sf1sim:
        make_sf1sim()
        return 0
    if args.time:
        names = _bench_queries() if args.time == "all" else args.time.split(",")
        time_queries(names, args.sf, args.reps)
        return 0
    if args.plans:
        names = args.queries.split(",") if args.queries else _bench_queries()
        dump_plans(names, args.sf, args.out, args.suffix)
        return 0
    ap.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
