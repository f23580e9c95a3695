"""Custom stateful streaming operator: per-conversation progress tracking.

Demonstrates the `applyInPandasWithState` pattern (Arrow-batched state,
no per-row Python) for semantics the built-in operators can't express:
a per-key running aggregate that must survive across micro-batches and
emit an updated row per key per batch — here, conversation progress
(turns seen, highest offset applied, event counts) maintained while the
CDC stream is tailed. The reference's only stateful op is offset
tracking (SURVEY.md §2a S7/S8); this generalizes it to arbitrary keyed
state with the same exactly-once story (emitting into the fenced sink).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_turns_batch", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), True),
        T.StructField("last_offset", T.LongType(), True),
        T.StructField("n_deletes", T.LongType(), False),
    ]
)

# state tuple: (n_events, max_turn_idx, last_offset, n_deletes, turn_bitmap_unused)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_offset", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
    ]
)


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_events, max_turn, last_off, n_del = state.get
    else:
        n_events, max_turn, last_off, n_del = 0, None, None, 0
    turns = set()
    for pdf in pdfs:  # Arrow batches, vectorized ops only
        n_events += len(pdf)
        n_del += int((pdf["op"] == "D").sum())
        if len(pdf):
            bm = int(pdf["turn_idx"].max())
            max_turn = bm if max_turn is None else max(max_turn, bm)
            bo = int(pdf["offset"].max())
            last_off = bo if last_off is None else max(last_off, bo)
            turns.update(pdf["turn_idx"].unique().tolist())
    state.update((n_events, max_turn, last_off, n_del))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n_events],
            "n_turns_batch": [len(turns)],  # distinct turns THIS batch (delta signal)
            "max_turn_idx": [max_turn],
            "last_offset": [last_off],
            "n_deletes": [n_del],
        }
    )


def track_conversation_progress(events: DataFrame) -> DataFrame:
    """Streaming: one updated progress row per conversation per batch.

    State is bounded: O(active conversations) fixed-width tuples; use the
    ProcessingTimeTimeout variant + state.setTimeoutDuration to expire
    idle conversations on unbounded key spaces.
    """
    return events.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
