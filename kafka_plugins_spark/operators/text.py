"""Text analysis for training-data pipelines: tokens, quality, lang-ID, fingerprint.

All pure JVM expressions (regexp/string functions, whole-stage codegen) —
no Python in the hot path. Every helper has an exactly-equivalent ANSI SQL
form used by the DuckDB oracles in ``__spark_entry__.py``; keep the two in
sync when changing semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# small per-language stopword signals for the n-gram/lexicon heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "a"],
    "es": ["el", "la", "de", "que", "y", "los", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "un", "est"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(col: Column) -> Column:
    """Whitespace/punct word split, lowercased, empties removed."""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(toks, lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: word-boundary pieces + digit runs +
    punctuation marks (a cheap deterministic proxy for a BPE tokenizer)."""
    return (
        F.size(F.filter(F.split(F.lower(col), "[^a-z]+"), lambda x: x != ""))
        + F.size(F.filter(F.split(col, "[^0-9]+"), lambda x: x != ""))
        + F.length(F.regexp_replace(col, "[a-zA-Z0-9\\s]+", ""))
    ).cast("long")


def stopword_count(col: Column, words: list[str] | None = None) -> Column:
    """Count of stopword tokens (array filter — no per-char regex; the
    regexp_count form showed pathological slowdowns in long-lived JVMs)."""
    wl = words or STOPWORDS_EN
    return F.size(F.filter(tokens(col), lambda x: x.isin(wl))).cast("long")


def with_quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality metric columns in two narrow projections.

    The naive single-select form repeats the token-split/regexp
    subexpressions inside every ratio — Catalyst does not CSE them and
    codegen evaluates each copy (measured ~25× slower at sf0.1). Stage 1
    computes each base count exactly once; stage 2 derives ratios from
    the materialized counts.
    """
    c = F.col(text_col)
    base = df.withColumns(
        {
            "n_chars": F.length(c).cast("long"),
            "n_alpha": F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("long"),
            "n_punct": F.length(F.regexp_replace(c, "[^.,;:!?]", "")).cast("long"),
            "n_tokens": token_count(c),
            "n_stopwords": stopword_count(c),
        }
    )
    denom = F.greatest(F.col("n_chars"), F.lit(1))
    tok_denom = F.greatest(F.col("n_tokens"), F.lit(1))
    alpha_ratio = F.col("n_alpha") / denom
    punct_ratio = F.col("n_punct") / denom
    stop_ratio = F.col("n_stopwords") / tok_denom
    score = (
        alpha_ratio
        - punct_ratio * 2
        + F.least(stop_ratio * 2, F.lit(0.4))
        + F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 5000), 0.2).otherwise(0.0)
    )
    return base.withColumns(
        {
            "alpha_ratio": F.round(alpha_ratio, 4),
            "punct_ratio": F.round(punct_ratio, 4),
            "stopword_ratio": F.round(stop_ratio, 4),
            "mean_word_len": F.round(F.col("n_alpha") / tok_denom, 4),
            "quality_score": F.round(score, 4),
        }
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-lexicon heuristic)."""
    return {lang: stopword_count(col, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column) -> Column:
    """argmax language by stopword hits; ties broken by fixed order
    en > es > de > fr; CJK characters short-circuit to 'zh'."""
    s = lang_scores(col)
    best = (
        F.when(col.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return best


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text —
    identical in any engine with md5 (the oracle uses DuckDB's)."""
    norm = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    return F.md5(F.trim(norm))


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken).

    Rolling char k-gram hashes; from every window of ``window``
    consecutive hashes keep the minimum — the classic local fingerprint
    for plagiarism/near-dup detection, guaranteed to share fingerprints
    with any document containing a common substring ≥ k+window-1 chars.

    Hash = md5-hex of the k-gram (portable to the DuckDB oracle; md5-hex
    min is order-equivalent to a rolling hash min). One explode + one
    window-min + distinct — no Python.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    n_grams = F.greatest(F.length("_norm") - (k - 1), F.lit(0))
    gram = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.md5(F.col("_norm").substr(i, F.lit(k)))
    )
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("_norm"))
        .select("doc_id", F.posexplode(gram).alias("pos", "h"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    bounded = grams.withColumn("fp", F.min("h").over(w)).withColumn(
        "_max_pos", F.max("pos").over(W.partitionBy("doc_id"))
    )
    return (
        bounded.filter(F.col("pos") <= F.col("_max_pos") - (window - 1))
        .select("doc_id", "fp")
        .distinct()
    )


def word_frequencies(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus word-frequency model: (word, freq). The input every BPE-style
    trainer actually consumes — O(distinct words), tiny versus the corpus."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _symbolize(word_col: Column) -> Column:
    """word → initial BPE symbol sequence: characters with '</w>' appended."""
    chars = F.filter(F.split(word_col, ""), lambda x: x != "")
    return F.concat(chars, F.array(F.lit("</w>")))


def _pair_counts(wf: DataFrame, sym_col: str = "syms") -> DataFrame:
    """(lhs, rhs, n) adjacent symbol pairs, each occurrence
    weighted by the word's corpus frequency."""
    s = F.col(sym_col)
    # zip(s[:-1], s[1:]) via slices — total on 0/1-symbol arrays, where a
    # sequence(1, size-1) index array degenerates to [1, 0] and faults
    n1 = F.greatest(F.size(s) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(s, 1, n1),
        F.slice(s, 2, n1),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )
    return (
        wf.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
        .agg(F.sum("freq").alias("n"))
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-round BPE statistics over the corpus: adjacent character-
    pair counts (with '</w>' end markers), weighted by word frequency —
    the argmax of this relation is BPE's first merge. Two partial-
    aggregated shuffles (word freq, then pair sum); everything JVM-side."""
    wf = word_frequencies(docs, text_col=text_col, id_col=id_col)
    return _pair_counts(wf.withColumn("syms", _symbolize(F.col("word"))))


def _apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs —
    a pure-JVM fold: no Python in the loop (aggregate over the symbol
    array with an array accumulator)."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        # try_element_at: AND does not short-circuit under codegen, so a
        # plain element_at(acc, -1) faults on the empty accumulator
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning (Sennrich et al. 2016, public algorithm)
    expressed Spark-first: the corpus collapses to the word-frequency
    relation once (O(distinct words) — the same reduction every real BPE
    trainer does), then each round is one JVM-side pair-count aggregate,
    one argmax collect of a single row, and one codegen'd fold applying
    the merge to the symbol arrays. No Python row functions anywhere;
    the per-round localCheckpoint keeps the plan flat across rounds.

    Tie-break: highest count, then lexicographic (left, right) — fully
    deterministic. Stops early if no pair occurs twice.
    """
    wf = (
        word_frequencies(docs, text_col=text_col, id_col=id_col)
        .withColumn("syms", _symbolize(F.col("word")))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right = top[0]["lhs"], top[0]["rhs"]
        merges.append((left, right))
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), left, right)).localCheckpoint(
            eager=True
        )
    return merges


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a learned merge list to the corpus vocabulary: one row per
    DISTINCT word with its BPE token sequence ``syms`` under the trained
    merges. This is the tokenizer's working set — O(distinct words), the
    same reduction the trainer uses, tiny versus the corpus — so merge
    application (one codegen'd JVM fold per merge, :func:`_apply_merge`)
    never touches corpus-scale data. ``checkpoint_every`` bounds plan
    depth for long merge lists (each merge adds one nested ``aggregate``
    expression; eager localCheckpoint flattens it)."""
    wf = word_frequencies(docs, text_col=text_col, id_col=id_col).withColumn(
        "syms", _symbolize(F.col("word"))
    )
    for i, (left, right) in enumerate(merges):
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), left, right))
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(merges):
            wf = wf.localCheckpoint(eager=True)
    return wf.select("word", "syms")


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-scale BPE tokenization under a trained vocab: per document,
    the ordered token sequence plus counts — the operator a training
    pipeline runs daily over the full corpus.

    Scale shape: merges are applied once to the O(distinct words)
    vocabulary (:func:`bpe_vocab`); the corpus pass joins each doc's
    DISTINCT words against the vocab (AQE broadcasts the vocab when it
    fits), folds them into one ``word → joined-token-string`` map per
    doc, reattaches the map by ``doc_id``, and rebuilds the ordered
    token sequence with a codegen'd ``transform`` over the doc's
    original token array — order comes from the array itself, so there
    is no per-occurrence ``collect_list`` + ``array_sort``. (r7
    measurement, sf1sim best-of-8: the old explode-every-occurrence →
    sort-collect aggregate shape spent its time building and shuffling
    12M (pos, syms) structs — 4.7s vs 2.9s for this shape; outputs
    bit-identical.) Token strings never contain spaces (symbols are
    ``[a-z0-9]`` runs plus the '</w>' marker), so the per-word joined
    string splits back to the exact token array. No Python row
    functions anywhere; docs with zero words produce no row (no token
    sequence to emit — their id is absent from the distinct-word join).

    Returns ``(doc_id, n_words, n_tokens, tokens array<string>)``.
    """
    vocab = bpe_vocab(docs, merges, text_col=text_col, id_col=id_col).select(
        "word", F.concat_ws(" ", "syms").alias("_sstr")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    dw = base.select("doc_id", F.explode(F.array_distinct("_toks")).alias("word"))
    # array_distinct before map_from_entries: _sstr is a pure function of
    # word, so any duplicate (word, _sstr) entries — e.g. an input with
    # duplicate doc_id rows — are exact duplicates, and deduping them
    # keeps map construction total instead of failing with
    # DUPLICATED_MAP_KEY (review finding). With duplicate doc_id rows the
    # output carries one row per input row (each over its own token
    # array); doc ids are unique everywhere this library produces them.
    dmap = (
        dw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.array_distinct(F.collect_list(F.struct("word", "_sstr")))
            ).alias("_m")
        )
    )
    # _s / tokens are materialized in their own projections before being
    # referenced again (the measured whole-stage-codegen CSE trap — see
    # repetition_scores): an inlined split would re-split per reference.
    joined_str = (
        base.join(dmap, "doc_id")
        .select(
            "doc_id",
            F.size("_toks").cast("long").alias("n_words"),
            F.concat_ws(
                " ", F.transform("_toks", lambda w: F.element_at(F.col("_m"), w))
            ).alias("_s"),
        )
        .select("doc_id", "n_words", F.split("_s", " ").alias("tokens"))
    )
    return joined_str.select(
        "doc_id",
        "n_words",
        F.size("tokens").cast("long").alias("n_tokens"),
        "tokens",
    )


def bpe_token_id_table(enc: DataFrame) -> DataFrame:
    """Deterministic token-id assignment over an encoded corpus
    (:func:`bpe_encode` output): ``(token, token_id, n_occurrences)``
    with ids dense-packed by (occurrence count desc, token asc) — the
    conventional frequency-ordered vocabulary file, stable across
    runs/partitionings/engines. One explode + one groupBy; the id table
    is O(vocab), broadcastable downstream."""
    counts = (
        enc.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return counts.select(
        "token", (F.row_number().over(w) - 1).cast("long").alias("token_id"), "n_occurrences"
    )


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc TOKEN-ID sequences under the trained vocab — what a
    training pipeline actually materializes (``doc → int ids``).
    Composition of :func:`bpe_encode` + :func:`bpe_token_id_table`: the
    id join runs on the exploded token stream and order is reassembled
    with the same (pos, value) array_sort trick; ids are frequency-rank
    deterministic, so the output is engine/partitioning stable.

    Note the id table's global ``row_number`` window: a single-partition
    sort of O(vocab) rows — fine for any real vocabulary (≤ millions);
    it never touches corpus-scale data.

    Returns ``(doc_id, n_tokens, token_ids array<long>)``.
    """
    # two consumers (id table + re-explode) — materialize the encoded
    # corpus once instead of re-running the merge folds + corpus join
    enc = bpe_encode(docs, merges, text_col=text_col, id_col=id_col).localCheckpoint(
        eager=True
    )
    ids = bpe_token_id_table(enc).select("token", "token_id")
    tok = enc.select("doc_id", F.posexplode("tokens").alias("pos", "token"))
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "token_id"))), lambda s: s["token_id"]
    )
    return (
        tok.join(ids, "token")
        .groupBy("doc_id")
        .agg(seq.alias("token_ids"))
        .select(
            "doc_id", F.size("token_ids").cast("long").alias("n_tokens"), "token_ids"
        )
    )


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition fractions — the Gopher-style (Rae et
    al. 2021, public) quality filters that catch boilerplate and
    degenerate loops an LM-perplexity gate misses: the fraction of a
    document's word n-grams that are duplicates of an earlier n-gram.

    ``dup_kgram_frac = 1 − distinct(k-grams)/total(k-grams)`` for
    k ∈ {2, 3}; NULL when the doc has no k-gram (shorter than k words).

    Shape: pure projection, zero exchanges, all JVM. The words array and
    each gram array are materialized in their OWN projection before
    being referenced twice (size + array_distinct) — the measured
    whole-stage-codegen CSE trap (see word_shingles,
    operators/dedup.py) would otherwise rebuild the array per reference.
    Ratios round to 4 decimals for cross-engine comparability.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    step1 = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    w = F.col("_w")
    n = F.size(w)

    def grams(k: int) -> Column:
        idx = F.sequence(F.lit(1), n - (k - 1))
        g = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + F.lit(j)) for j in range(k)]
            ),
        )
        # sequence(1, hi) DESCENDS for hi < 1 instead of being empty —
        # short docs must gate to [] (same trap as _pair_counts)
        return F.when(n >= k, g).otherwise(F.array().cast("array<string>"))

    step2 = step1.select(
        "doc_id", n.alias("n_words"), grams(2).alias("_g2"), grams(3).alias("_g3")
    )

    def dup_frac(c: Column) -> Column:
        tot = F.size(c)
        return F.when(
            tot > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(c)) / tot, 4),
        )

    return step2.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        dup_frac(F.col("_g2")).alias("dup_2gram_frac"),
        dup_frac(F.col("_g3")).alias("dup_3gram_frac"),
    )
