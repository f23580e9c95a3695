"""Deterministic dataset splitting / sampling for training pipelines.

`df.randomSplit` depends on partitioning and RNG seeds — re-running on a
re-partitioned corpus reassigns rows, which silently leaks val/test into
train across pipeline versions. These operators assign by md5 of
(salt | id) instead: pure column expressions (JVM-side, no RNG state),
stable across runs, engines, partitionings, and cluster sizes, and
portable to a SQL oracle. Changing ``salt`` re-rolls the entire
assignment; keeping it pins every row forever — exactly the contract a
train/eval split must have.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(id_col: str, salt: str) -> Column:
    """Stable bucket in [0, 100): first 4 hex digits of
    md5(salt | id) mod 100 (16 bits of hash — plenty for percent-
    granularity splits, and cheap to reproduce in any SQL engine)."""
    hx = F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 4)
    return F.conv(hx, 16, 10).cast("long") % 100


def split_assign(
    df: DataFrame,
    train: int = 90,
    val: int = 5,
    salt: str = "v1",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column ∈ {'train','val','test'} with ``train``% /
    ``val``% / rest% proportions (percent granularity), deterministic in
    (salt, id) only."""
    if not (0 <= train and 0 <= val and train + val <= 100):
        raise ValueError(f"bad split percents train={train} val={val}")
    b = _bucket(id_col, salt)
    return df.withColumn(
        split_col,
        F.when(b < train, "train").when(b < train + val, "val").otherwise("test"),
    )


def deterministic_sample(
    df: DataFrame, keep_percent: int, salt: str = "v1", id_col: str = "doc_id"
) -> DataFrame:
    """Keep a stable ``keep_percent``% subset — same hash family as
    :func:`split_assign` (use a DIFFERENT salt when sampling within a
    split, or the sample correlates with the split boundaries)."""
    if not 0 <= keep_percent <= 100:
        raise ValueError(f"bad keep_percent {keep_percent}")
    return df.filter(_bucket(id_col, salt) < keep_percent)


def stratified_exact_sample(
    df: DataFrame,
    group_col: str,
    frac: float,
    id_col: str,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic EXACT stratified sampling: exactly ``ceil(frac·n_g)``
    rows from every group ``g`` — the guarantee :func:`deterministic_sample`'s
    pure-projection hash threshold cannot give (its per-group keep count
    is binomial around the target; fine corpus-wide, wrong when small
    strata must be represented exactly, e.g. per-language eval slices).

    Rows are ranked inside each stratum by ``md5(id ⊕ salt)`` — a
    deterministic shuffle, so the same inputs always select the same
    rows, re-runs are reproducible, and changing ``salt`` redraws the
    sample. ``id_col`` must be unique (it tie-breaks the rank).

    Cost: one hash exchange on ``group_col`` + two window functions over
    it (rank + stratum size — same partitioning, one shuffle total).
    Skewed strata inherit the window's per-group seriality; for a
    pathological mega-stratum use :func:`deterministic_sample` instead.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1] (got {frac})")
    from pyspark.sql import Window

    key = F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col).cast("string"))
    cw = Window.partitionBy(group_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cw))
        .filter(F.col("_rk") <= F.ceil(F.lit(float(frac)) * F.col("_n")))
        .drop("_rk", "_n")
    )
