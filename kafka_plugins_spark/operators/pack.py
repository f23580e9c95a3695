"""Sequence packing for LLM pretraining: concatenate-and-chunk.

The standard pretraining data layout concatenates every tokenized
document in a fixed order and splits the token stream into
``capacity``-sized training sequences (documents straddle chunk
boundaries; nothing is padded or dropped except empty docs). The
sequential part — every document needs its GLOBAL token offset — is a
prefix sum over a total order, which a naive Spark window
(``Window.orderBy`` with no partition) computes by shuffling the whole
corpus into ONE task. At 100 TB that single-partition exchange is the
job; this module does the same arithmetic with no serial stage:

1. bound the order key (one min/max aggregate),
2. split it into ``n_buckets`` equal RANGES — a deterministic, monotone
   bucketing, so within-bucket order + bucket order = total order,
3. per-bucket local cumulative sums (windows partitioned by bucket —
   parallel, bounded state),
4. bucket totals → driver (O(n_buckets) rows) → exclusive running
   offsets → broadcast-joined back.

The result is exact: ``global_start(doc) = bucket_offset + local_cum −
tokens``, bit-identical to the single-window answer (the driver oracle
recomputes it with a plain SQL window). Determinism requires a UNIQUE
order key; ties would make "the" prefix sum ill-defined, so the
bucketing never sees them (callers pass an id column).

Scale: windows hold one bucket (corpus/n_buckets rows); the only
driver-side data is n_buckets partial sums. Doubling the corpus doubles
bucket width, not stage count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_offsets(
    df: DataFrame,
    value_col: str,
    order_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Add ``_start`` — the EXCLUSIVE global prefix sum of ``value_col``
    under the total order of ``order_col`` (unique, numeric) — without a
    single-partition window (see module docstring for the shape).

    The input plan is evaluated THREE times (bounds collect, bucket
    totals collect, the returned frame) — checkpointed up front so an
    expensive upstream (tokenization of a full corpus) runs once, not
    3× (code-review finding)."""
    df = df.localCheckpoint(eager=True)
    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return df.withColumn("_start", F.lit(None).cast("long"))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))
    bucket = F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("long")
    w = (
        Window.partitionBy("_pb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_pb", bucket).withColumn(
        "_cum", F.sum(F.col(value_col).cast("long")).over(w)
    )
    totals = {
        int(r["_pb"]): int(r["t"])
        for r in local.groupBy("_pb").agg(F.sum(F.col(value_col).cast("long")).alias("t")).collect()
    }
    running, prefix = 0, {}
    for b in sorted(totals):
        prefix[b] = running
        running += totals[b]
    offsets = df.sparkSession.createDataFrame(
        [(b, o) for b, o in prefix.items()], "_pb long, _boff long"
    )
    return (
        local.join(F.broadcast(offsets), "_pb")
        .withColumn("_start", F.col("_boff") + F.col("_cum") - F.col(value_col).cast("long"))
        .drop("_pb", "_cum", "_boff")
    )


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    order_col: str,
    capacity: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Assign every document its training-sequence chunks under
    concatenate-and-chunk packing: the global token stream (documents
    concatenated in ``order_col`` order) is cut every ``capacity``
    tokens, and each document emits one row per chunk it overlaps with
    its half-open token span inside the document:

    ``(…input columns…, chunk_id, doc_begin, doc_end)``

    A document larger than ``capacity`` spans several chunks; a chunk
    boundary mid-document yields two rows (the downstream writer takes
    tokens ``[doc_begin, doc_end)`` of the doc into that chunk). Empty
    documents (0 tokens) pack nothing and are dropped — mirror the
    filter in any oracle. All arithmetic is integer; results are exact
    and deterministic given a unique ``order_col``.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive (got {capacity})")
    nonempty = df.filter(F.col(token_count_col) > 0)
    with_start = with_global_offsets(nonempty, token_count_col, order_col, n_buckets)
    n = F.col(token_count_col).cast("long")
    start = F.col("_start")
    first = F.floor(start / capacity).cast("long")
    last = F.floor((start + n - F.lit(1)) / capacity).cast("long")
    return (
        with_start.withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .withColumn(
            "doc_begin",
            F.greatest(F.lit(0).cast("long"), F.col("chunk_id") * capacity - start),
        )
        .withColumn(
            "doc_end",
            F.least(n, (F.col("chunk_id") + F.lit(1)) * capacity - start),
        )
        .drop("_start")
    )
