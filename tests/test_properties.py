"""Property-based invariants (hypothesis) for the resolve/fence math.

Pure-Python properties run per-example; Spark checks run once on a
hypothesis-generated worst-case-ish corpus (Spark jobs are too slow for
per-example execution)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_plugins_spark.functions.decode import grok_to_regex
from kafka_plugins_spark.operators.resolve import final_state
from kafka_plugins_spark.schema import CHANGE_EVENT, merge_schemas
from pyspark.sql import types as T

# --- pure functions ---------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # conv
        st.integers(0, 3),  # turn
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 1),  # partition... conv pinned below
    ),
    min_size=1,
    max_size=60,
)


@given(events_strategy, st.randoms())
@settings(max_examples=200, deadline=None)
def test_lww_pandas_model_is_permutation_invariant(evs, rnd):
    """The LWW winner is independent of delivery order — the property that
    makes salting and parallel partial reduces sound."""
    rows = []
    for off, (conv, turn, op, _) in enumerate(evs):
        rows.append({"conv_id": f"c{conv}", "turn_idx": turn, "op": op,
                     "partition": conv % 2, "offset": off, "text": f"t{off}"})
    df = pd.DataFrame(rows)

    def lww(frame):
        s = frame.sort_values("offset").groupby(["conv_id", "turn_idx"]).last()
        return s[s["op"] != "D"]["text"].to_dict()

    shuffled = df.sample(frac=1, random_state=rnd.randint(0, 1 << 30))
    assert lww(df) == lww(shuffled)


@given(st.dictionaries(st.integers(0, 7), st.integers(0, 1000), min_size=1),
       st.dictionaries(st.integers(0, 7), st.integers(0, 1000), min_size=1))
@settings(max_examples=200, deadline=None)
def test_fence_watermark_merge_monotone(wm, ranges):
    """Watermark advance: new = max(old, end) per partition — never regresses."""
    new = dict(wm)
    for p, end in ranges.items():
        new[p] = max(new.get(p, 0), end)
    assert all(new[p] >= v for p, v in wm.items())
    assert all(new[p] >= v for p, v in ranges.items())


@given(st.text(alphabet=st.characters(exclude_categories=("Cs",)), max_size=40))
@settings(max_examples=200, deadline=None)
def test_grok_literal_text_roundtrip(s):
    """Literal (pattern-free) grok text compiles to a regex matching itself."""
    if "%{" in s:
        return
    import re as _re

    regex, names = grok_to_regex(s)
    assert names == []
    assert _re.fullmatch(regex, s)


@given(st.lists(st.sampled_from(["a", "b", "c", "tool", "meta"]), unique=True, max_size=5))
@settings(max_examples=100, deadline=None)
def test_merge_schemas_idempotent_and_monotone(cols):
    incoming = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    base = T.StructType([T.StructField("a", T.StringType(), False)])
    once = merge_schemas(base, incoming)
    twice = merge_schemas(once, incoming)
    assert once == twice  # idempotent
    assert {f.name for f in once.fields} >= {f.name for f in base.fields}


# --- one Spark check over a generated adversarial corpus --------------------

def test_spark_lww_matches_pandas_model_on_generated_corpus(spark):
    import random

    rnd = random.Random(7)
    rows = []
    off = {0: 0, 1: 0}
    for _ in range(500):
        conv = rnd.randint(0, 9)
        part = conv % 2
        rows.append(
            (f"c{conv}", rnd.randint(0, 4), None, f"t{off[part]}", None, None,
             rnd.choice(["I", "U", "U", "D"]), part, off[part])
        )
        off[part] += 1
    df = spark.createDataFrame(rows, CHANGE_EVENT)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in final_state(df, salt_buckets=4).collect()
    }
    pdf = pd.DataFrame(rows, columns=[f.name for f in CHANGE_EVENT.fields])
    last = pdf.sort_values("offset").groupby(["conv_id", "turn_idx"]).last()
    want = {k: v for k, v in last[last["op"] != "D"]["text"].items()}
    assert got == want
