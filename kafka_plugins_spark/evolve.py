"""Schema evolution: new nullable payload columns appearing mid-stream.

Two layers, per the north rule:

1. **Plan-level reconciliation** (the fast path, pure JVM): a batch whose
   schema differs from the table is aligned with ``align_to_schema`` —
   missing columns null-backfilled, order normalized, type conflicts
   rejected (the reference likewise rejects type changes at configure
   time, ``KafkaConfig.java:483-545``). The lake merge then widens the
   table schema atomically in the snapshot commit
   (``merge_schemas`` + ``unionByName(allowMissingColumns=True)``).

2. **Arrow-level reconciliation** (for heterogeneous *decoded* payloads):
   when a single batch mixes payload generations (e.g. JSON blobs where
   some records carry ``tool`` and some don't), ``arrow_reconcile``
   aligns every Arrow record batch to the target schema inside
   ``mapInPandas`` — vectorized, batch-at-a-time, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_plugins_spark.schema import merge_schemas  # noqa: F401  (re-export)


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed nulls,
    extra columns are kept only if ``target`` lacks them entirely (they
    are appended by merge_schemas upstream), order follows ``target``."""
    have = set(df.columns)
    cols = [
        F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name)
        for f in target.fields
    ]
    return df.select(*cols)


def arrow_reconcile(df: DataFrame, target: T.StructType) -> DataFrame:
    """Align heterogeneous Arrow batches to ``target`` via mapInPandas.

    Used on the decode path when record batches inside one partition can
    disagree on columns (mixed payload generations). Missing columns are
    null-backfilled per batch; surplus columns are dropped. Everything is
    column-at-a-time pandas — the plan shows ArrowEvalPython/MapInPandas,
    never BatchEvalPython.
    """
    names = [f.name for f in target.fields]

    def reconcile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(index=pdf.index)
            for n in names:
                out[n] = pdf[n] if n in pdf.columns else None
            yield out

    return df.mapInPandas(reconcile, schema=target)


def evolved_columns(table_schema: T.StructType, batch_schema: T.StructType) -> list[str]:
    """Names of columns the incoming batch adds to the table."""
    have = {f.name for f in table_schema.fields}
    return [f.name for f in batch_schema.fields if f.name not in have]
