"""Schema evolution (SURVEY.md §5 item 5): `tool` column appears mid-stream."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_plugins_spark.datagen import generate_events, write_events
from kafka_plugins_spark.evolve import align_to_schema, arrow_reconcile, evolved_columns
from kafka_plugins_spark.lake import ParquetSnapshotTable
from kafka_plugins_spark.operators.resolve import last_writer_wins
from kafka_plugins_spark.schema import CHANGE_EVENT, SchemaConflictError, merge_schemas
from kafka_plugins_spark.sources.events import partition_end_offsets
from tests.util import assert_tables_equal, duckdb_final_state


def test_merge_schemas_appends_nullable():
    incoming = T.StructType(
        [T.StructField("conv_id", T.StringType()), T.StructField("meta", T.StringType())]
    )
    base = T.StructType([T.StructField("conv_id", T.StringType(), False)])
    merged = merge_schemas(base, incoming)
    assert [f.name for f in merged.fields] == ["conv_id", "meta"]
    assert merged["meta"].nullable


def test_merge_schemas_rejects_type_conflict():
    a = T.StructType([T.StructField("x", T.LongType())])
    b = T.StructType([T.StructField("x", T.StringType())])
    import pytest

    with pytest.raises(SchemaConflictError):
        merge_schemas(a, b)


def test_evolution_replay_old_rows_get_nulls(spark, tmp_path):
    """Phase 0 events lack `tool`; phase 1 adds it. After both phases the
    table has the evolved schema and pre-evolution winners read back with
    tool IS NULL, matching the oracle computed over the merged log."""
    ev_root = str(tmp_path / "events")
    df = generate_events(spark, n_conversations=80, n_partitions=4, seed=21)
    write_events(df, ev_root, evolution_cut_offset=300)

    table_path = str(tmp_path / "table")
    # base schema = pre-evolution transcript (no tool column yet)
    pre_schema = T.StructType([f for f in CHANGE_EVENT.fields if f.name not in ("op", "partition", "offset")])
    pre_schema = T.StructType([f for f in pre_schema.fields if f.name != "tool"])
    table = ParquetSnapshotTable(spark, table_path, schema=pre_schema)

    for batch_id, phase in enumerate(["phase=0", "phase=1"]):
        batch = spark.read.parquet(f"{ev_root}/{phase}")
        winners = last_writer_wins(batch)
        ends = partition_end_offsets(batch)
        table.merge_into(winners, batch_id=batch_id, ranges={p: (0, e) for p, e in ends.items()})

    got = table.read()
    assert "tool" in got.columns  # schema widened by the commit itself
    # oracle over the union of both phases (tool = null pre-cut)
    oracle_dir = str(tmp_path / "oracle")
    df.withColumn(
        "tool", F.when(F.col("offset") < 300, F.lit(None).cast("string")).otherwise(F.col("tool"))
    ).write.partitionBy("partition").parquet(oracle_dir)
    assert_tables_equal(got.toPandas(), duckdb_final_state(oracle_dir))
    # keys that never got a post-evolution update have tool IS NULL
    snap = table.current_snapshot()
    assert "tool" in snap["schema"]


def test_align_to_schema_null_backfill(spark):
    df = spark.createDataFrame([("a", 1)], "conv_id string, turn_idx int")
    target = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    out = align_to_schema(df, target)
    assert out.columns == ["conv_id", "turn_idx", "tool"]
    assert out.first()["tool"] is None


def test_arrow_reconcile_vectorized(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a", "b"], "turn_idx": [0, 1]}),
        "conv_id string, turn_idx long",
    )
    target = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    out = arrow_reconcile(df, target)
    rows = out.orderBy("conv_id").collect()
    assert [r["tool"] for r in rows] == [None, None]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow path only


def test_evolved_columns():
    a = T.StructType([T.StructField("x", T.LongType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.StringType())])
    assert evolved_columns(a, b) == ["y"]


def test_merge_schemas_promotes_int_to_long_and_float_to_double():
    a = T.StructType([T.StructField("x", T.IntegerType()), T.StructField("y", T.DoubleType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.FloatType())])
    m = merge_schemas(a, b)
    assert m["x"].dataType == T.LongType()
    assert m["y"].dataType == T.DoubleType()
    # narrowing the other way also lands on the wider type
    m2 = merge_schemas(b, a)
    assert m2["x"].dataType == T.LongType() and m2["y"].dataType == T.DoubleType()


@pytest.mark.parametrize("mode", ["cow", "mor", "bucketed"])
def test_type_promotion_end_to_end(spark, tmp_path, mode):
    """Commit 1 writes an int extra column; commit 2 arrives with the
    same column as long. The table schema promotes, OLD narrow parquet
    files read back upcast under the wide schema, and LWW across the
    promotion resolves correctly."""
    import datetime

    from kafka_plugins_spark.lake import ParquetSnapshotTable
    from kafka_plugins_spark.operators.resolve import last_writer_wins

    ts = datetime.datetime(2026, 1, 1)
    base = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("score", T.IntegerType()),  # narrow in v0
            T.StructField("op", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    wide = T.StructType(
        [
            f if f.name != "score" else T.StructField("score", T.LongType())
            for f in base.fields
        ]
    )
    table = ParquetSnapshotTable(spark, str(tmp_path / "t"), mode=mode)
    v0 = spark.createDataFrame(
        [("k1", 0, "user", "a", None, ts, 7, "I", 0, 0),
         ("k2", 0, "user", "b", None, ts, 8, "I", 0, 1)],
        base,
    )
    table.merge_into(last_writer_wins(v0), batch_id=0)
    v1 = spark.createDataFrame(
        [("k2", 0, "user", "b2", None, ts, 9_000_000_000, "U", 0, 10)], wide
    )
    table.merge_into(last_writer_wins(v1), batch_id=1)
    assert table.table_schema()["score"].dataType == T.LongType()
    got = {r["conv_id"]: r["score"] for r in table.read().collect()}
    assert got == {"k1": 7, "k2": 9_000_000_000}
