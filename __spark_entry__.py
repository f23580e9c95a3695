"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``kafka_plugins_spark.entry_queries`` (one entry
per operator from SURVEY.md §2 plus the training-data operator library);
this module is the thin driver-facing wrapper.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins final state over the event log at
    sf0.001 — the core replay-to-converged-table semantics."""
    from kafka_plugins_spark.entry_queries import q_cdc_final_state

    return q_cdc_final_state(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_plugins_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # ORACLES also covers EXTRA_QUERIES (pytest-verified variants kept out
    # of the driver registry to respect its 50-row verification cap);
    # expose only the oracles for the rows the driver will actually run.
    from kafka_plugins_spark.entry_queries import ORACLES, QUERIES

    return {k: v for k, v in ORACLES.items() if k in QUERIES}
