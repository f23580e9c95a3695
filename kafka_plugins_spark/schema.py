"""Schemas for the CDC engine — declared, not inferred.

The reference requires a user-declared Avro-style JSON schema and splits it
into envelope fields (populated from Kafka record metadata) and message
fields (decoded from the payload); see the reference's
``source/KafkaConfig.java:235-294`` (envelope/message split) and
``KafkaStreamingSourceUtil.java:280-291`` (envelope population). Here the
same split is a ``StructType``: ``ENVELOPE_FIELDS`` mirror
timeField/keyField/partitionField/offsetField, the payload is the
transcripts row from ``BASELINE.json`` ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- payload: one conversation turn (the lake-table row) -------------------
TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),  # nullable; added mid-stream in the evolution fixture
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Primary key of the converged table; a conv_id is pinned to one source
# partition (keyed produce, as the reference's StringPartitioner.java:34-38),
# so max offset per key is the unique last writer.
KEY_COLUMNS = ["conv_id", "turn_idx"]

# --- envelope: Kafka-shaped change-event metadata --------------------------
# op ∈ {I,U,D}; (partition, offset) mirror the reference's
# partitionField/offsetField envelope (KafkaConfig.java:258-267).
ENVELOPE_FIELDS = [
    T.StructField("op", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("offset", T.LongType(), False),
]

CHANGE_EVENT = T.StructType(list(TRANSCRIPT.fields) + ENVELOPE_FIELDS)

# Pre-evolution events lack the `tool` column entirely (FIXTURES.md §2).
CHANGE_EVENT_V0 = T.StructType(
    [f for f in CHANGE_EVENT.fields if f.name != "tool"]
)

# --- lineage: one row per (commit, source partition) -----------------------
LINEAGE = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("start_offset", T.LongType(), False),  # inclusive
        T.StructField("end_offset", T.LongType(), False),  # exclusive ("next offset", as the reference's untilOffset)
        T.StructField("rows", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

PAYLOAD_COLUMNS = [f.name for f in TRANSCRIPT.fields]
ENVELOPE_COLUMNS = [f.name for f in ENVELOPE_FIELDS]


class SchemaConflictError(TypeError):
    """Two schemas declare the same column with incompatible types."""


#: safe widenings (Iceberg's promotion set): the merged column takes the
#: WIDER type whichever side carries it. Sound because (a) Spark's
#: parquet reader upcasts old narrow files under the wide read schema
#: (verified on 4.1: int32 file → long column, float → double), and
#: (b) the merge paths cast batch columns to the stored type before
#: writing. Anything else (string↔numeric, long→int narrowing) stays a
#: loud conflict.
_PROMOTIONS: dict[tuple[str, str], T.DataType] = {
    ("integer", "long"): T.LongType(),
    ("long", "integer"): T.LongType(),
    ("float", "double"): T.DoubleType(),
    ("double", "float"): T.DoubleType(),
}


def merge_schemas(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Reconcile an evolved event schema with the table schema.

    New columns append as nullable (the north rule's evolution: added
    tool/metadata columns). A column present in both with different
    types takes the safe promotion (int→long, float→double — Iceberg's
    set, see ``_PROMOTIONS``) or raises a conflict; the reference
    rejects ALL type mismatches at configure time
    (KafkaConfig.java:483-545) — promotion is the lake-side upgrade its
    fixed-schema model never needed.
    """
    pos = {f.name: i for i, f in enumerate(base.fields)}
    out = list(base.fields)
    for f in incoming.fields:
        cur = out[pos[f.name]] if f.name in pos else None
        if cur is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif cur.dataType != f.dataType:
            wider = _PROMOTIONS.get(
                (cur.dataType.typeName(), f.dataType.typeName())
            )
            if wider is None:
                raise SchemaConflictError(
                    f"column {f.name!r}: table has {cur.dataType.simpleString()}, "
                    f"incoming batch has {f.dataType.simpleString()}"
                )
            out[pos[f.name]] = T.StructField(f.name, wider, cur.nullable)
    return T.StructType(out)


def schema_added_columns(base: T.StructType, incoming: T.StructType) -> list[T.StructField]:
    """Columns in `incoming` that `base` lacks (nullable in the result)."""
    have = {f.name for f in base.fields}
    return [T.StructField(f.name, f.dataType, True) for f in incoming.fields if f.name not in have]
