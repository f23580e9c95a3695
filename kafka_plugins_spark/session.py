"""SparkSession factory tuned for the CDC replay workload.

Local mode is a single JVM; on a real cluster the same settings apply per
executor. AQE is on so the salted LWW reduce and the merge join get
runtime-coalesced partitions and skew-join splitting for free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_plugins_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores=None → ``local[*]``. shuffle_partitions defaults to 2× cores:
    enough tasks that AQE coalescing has room to work, not so many that
    tiny tasks dominate. On a 1000-executor cluster you would instead set
    ``spark.sql.shuffle.partitions`` to ~2-3× total cores and let AQE
    coalesce, which these configs already enable.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(cores_env) if cores_env else (os.cpu_count() or 8)
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # ANSI off: replay semantics must be permissive (bad casts → null),
        # matching the reference's lenient decode path and DuckDB's
        # try-semantics used by the oracle comparisons.
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
