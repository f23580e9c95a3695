"""Document deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Spark-first shapes:

- exact: one hash-groupBy (map-side partial agg, single shuffle).
- n-gram Jaccard: shingle→explode→equi-join on shingle→count per pair.
  The candidate join is the scale risk: a shingle shared by k docs emits
  k² pairs, so ``max_shingle_freq`` drops degenerate ultra-common
  shingles first (standard trick; exact under the "a duplicate pair
  shares at least one non-degenerate shingle" assumption).
- MinHash+LSH: the 100 TB path — per-doc fixed-size signature (one
  groupBy), banding, equi-join on (band_id, band_key) buckets only.
  Candidates are verified with true Jaccard so LSH can only *miss* pairs
  (tunable), never emit false positives.
- SimHash: per-doc 16-bit signature from word hashes; exact-collision
  grouping. Hashes are hex-of-md5 so the DuckDB oracle reproduces them.

All expressions are portable: md5 + string ops, no engine-private hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_plugins_spark.operators.text import tokens


def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize an intermediate that downstream joins consume
    several times (shingle tables, pair graphs). Without it Catalyst
    inlines the subplan at every reference and the scan + tokenize +
    explode + distinct pipeline runs once PER REFERENCE — the minhash
    verify plan re-shingled the corpus six times (measured r7, plan in
    plans/r07/dedup_minhash_lsh_before.txt). ``localCheckpoint`` stores
    the computed partitions in the block manager (MEMORY_AND_DISK) and
    cuts the lineage, so every consumer reads the materialized rows. At
    cluster scale the same role is played by persisting the shingle
    table to scratch storage — the structural point (compute the
    corpus-scale intermediate once, not once per join arm) is
    identical. Recomputed from the parquet inputs on every invocation —
    nothing is memoized across runs."""
    return df.localCheckpoint(eager=True)


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group rows by exact text hash; canonical id = min id per group."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Tokens are materialized as a column BEFORE the shingle lambda — an
    inlined token expression gets re-evaluated by codegen for every
    ``element_at`` in every lambda iteration (~3·shingles split calls per
    doc; measured 10× slower at sf0.1)."""
    t = F.col("_toks")
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)])
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode(shingle).alias("shingle"))
        .distinct()
    )


def _verify_pairs(cands: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact Jaccard of candidate (doc_a, doc_b) pairs over the FULL
    shingle sets: expand each pair by doc_a's shingles, equi-join doc_b's
    — O(|cands| · avg shingles), never the all-pairs intersection.

    The per-doc ``sizes`` relation is O(total documents) — at corpus
    scale (10⁹ docs) a forced broadcast of it OOMs the driver. So the
    size joins carry NO broadcast hint: AQE sees at runtime that the
    small side is ``inter`` (verified candidates — small by
    construction, they survived blocking) and broadcasts THAT, streaming
    the sizes relation; sizes itself can never be force-broadcast. (A
    semi-join of sizes onto the candidate ids was measured 1.7× slower
    here: it re-evaluates the candidate-generation subplan for the id
    list, while this shape consumes ``cands`` exactly once.)
    """
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a_sh = shingles.withColumnsRenamed({"doc_id": "doc_a"})
    b_sh = shingles.withColumnsRenamed({"doc_id": "doc_b"})
    inter = (
        cands.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "sz": "sz_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")), 4
            ),
        )
    )


def _pair_jaccard(shingles: DataFrame, max_shingle_freq: int | None = None) -> DataFrame:
    """All candidate pairs sharing ≥1 (sub-cap) shingle, with exact Jaccard.

    The candidate self-join runs over capped shingles only (skew bound);
    the Jaccard of surviving candidates is verified over the full sets.
    """
    sh = shingles
    if max_shingle_freq is not None:
        # the sub-cap shingle list is O(distinct shingles) — never force-
        # broadcast it; a semi-join shuffles on the shingle key (sort-merge
        # at corpus scale, AQE-broadcast when it happens to be small)
        freq = sh.groupBy("shingle").agg(F.count("*").alias("_f"))
        sh = sh.join(
            freq.filter(F.col("_f") <= max_shingle_freq).drop("_f"), "shingle", "left_semi"
        )
    a = sh.alias("a")
    b = sh.alias("b")
    cands = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_pairs(cands, shingles)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 128,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard ≥ threshold.

    ``max_shingle_freq`` (default 128) drops shingles shared by more
    documents than the cap BEFORE the candidate self-join — one
    degenerate stop-shingle in k docs would otherwise emit k² join rows,
    the classic skew bomb at corpus scale. Recall contract: a pair is
    found iff it shares ≥1 shingle *below* the cap; a true near-dup pair
    (high Jaccard) shares many shingles, so only pairs whose entire
    overlap is degenerate boilerplate are missed. The intersection counts
    of surviving pairs use the FULL shingle sets, so reported Jaccard is
    exact. Set ``None`` to disable (exact-but-quadratic).
    """
    # one shingle pass, many consumers (freq cap, candidate self-join,
    # intersection expand, sizes) — see _materialize
    sh = _materialize(word_shingles(docs, n=n, text_col=text_col, id_col=id_col))
    return (
        _pair_jaccard(sh, max_shingle_freq=max_shingle_freq)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 8) -> DataFrame:
    """Fixed-width MinHash signature per doc: sig_i = min(md5(i || '|' || shingle)).

    md5-hex min is an order statistic on a uniform permutation of the
    shingle space — the textbook MinHash estimator, expressed portably.
    One groupBy, num_hashes partial-min aggregates.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Docs agreeing on all rows of ≥1 band. Banded on (band_id, key) so a
    single equi-join covers every band — no b-way union of joins."""
    keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select("doc_id", F.explode(keys).alias("bk")).select(
        "doc_id", "bk.band_id", "bk.band_key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidates, verified with exact Jaccard ≥ threshold.

    The scale path: signature groupBy + bucket equi-join touch O(docs)
    rows; only verified candidates pay the shingle-intersection join.
    """
    # one shingle pass — the before-plan scanned + re-shingled the corpus
    # SIX times (signature path ×2 through the banded self-join, verify
    # join arms ×2, sizes ×2); signatures are additionally materialized
    # (O(docs) rows) so the banded self-join doesn't run the 8-way md5
    # min-aggregate twice. See _materialize.
    sh = _materialize(word_shingles(docs, n=n, text_col=text_col, id_col=id_col))
    sigs = _materialize(minhash_signatures(sh, num_hashes=num_hashes))
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=num_hashes // bands)
    # verify ONLY the candidate pairs (see _verify_pairs) — the all-pairs
    # intersection would defeat the point of LSH
    return _verify_pairs(cands, sh).filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


def word_hash16(col: Column) -> Column:
    """Portable 16-bit word hash: first 4 hex chars of md5 as an int."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")


def simhash16(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over word multiset (duplicate words count)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    h = word_hash16(F.col("w"))
    bit_sums = [
        F.sum(F.when(F.shiftright(h, k).bitwiseAND(1) == 1, 1).otherwise(-1)).alias(f"s{k}")
        for k in range(16)
    ]
    per_doc = words.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for k in range(16):
        bit = F.when(F.col(f"s{k}") > 0, F.lit(1 << k)).otherwise(0)
        sim = bit if sim is None else sim + bit
    return per_doc.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of docs colliding on the full 16-bit SimHash."""
    return (
        simhash16(docs, text_col=text_col, id_col=id_col)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 40,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every doc
    gets ``cluster_id`` = the MIN doc id of its component (singletons
    keep their own id). This is the step that turns pair detectors
    (:func:`ngram_jaccard_pairs`, :func:`minhash_lsh_pairs`) into an
    actionable dedup policy — keep the canonical doc per cluster, drop
    the rest.

    Algorithm: min-label propagation WITH pointer doubling — each round
    every doc takes the min of (a) its own label, (b) its neighbors'
    labels (one equi-join + groupBy-min), and (c) its *label's* label
    (one labels⋈labels self-join — the shortcutting step of classic
    pointer-jumping / Shiloach–Vishkin). Neighbor propagation alone
    needs rounds = graph diameter; the shortcut at least doubles the
    reachable distance per round, so convergence is O(log diameter) —
    a 1000-node chain labels in ~10 rounds (tested), and log₂ of any
    realistic corpus diameter sits far under the default ``max_iters``
    of 40. The extra self-join costs one more shuffle per round; both
    joins/aggs are partition-parallel and labels are eagerly
    localCheckpoint'ed each round so the plan does not grow with
    iterations. Terminates when a round changes nothing; raises after
    ``max_iters`` non-converged rounds rather than returning partial
    labels (rounds needed ≈ log₂(component diameter) + 2).
    """
    # materialize the edge list ONCE: every round's propagation join
    # references it, and an un-materialized `pairs` (often itself a full
    # near-dup detection query) would re-run per round — see _materialize
    sym = _materialize(
        pairs.select(
            F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
        ).union(
            pairs.select(
                F.col(b_col).cast("long").alias("src"), F.col(a_col).cast("long").alias("dst")
            )
        )
    )
    labels = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(id_col).cast("long").alias("label")
    )
    for it in range(max_iters):
        prop = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(prop, labels["id"] == prop["dst"], "left")
        if it == 0:
            # round 1: labels are the identity map, so label-of-label ==
            # label — the shortcut join would be a guaranteed-no-op O(V)
            # shuffle; skip it
            glabel = labels["label"]
        else:
            # pointer doubling: every label value is itself a doc id
            # (labels only ever take existing ids), so label→
            # label-of-label is a complete inner self-join
            grand = (
                labels.alias("l")
                .join(labels.alias("m"), F.col("l.label") == F.col("m.id"))
                .select(F.col("l.id").alias("gid"), F.col("m.label").alias("glabel"))
            )
            stepped = stepped.join(grand, labels["id"] == grand["gid"], "left")
            glabel = F.coalesce(grand["glabel"], labels["label"])
        stepped = stepped.select(
            labels["id"],
            F.least(
                labels["label"],
                F.coalesce(prop["nlabel"], labels["label"]),
                glabel,
            ).alias("label"),
            (
                (F.coalesce(prop["nlabel"], labels["label"]) < labels["label"])
                | (glabel < labels["label"])
            ).alias("_chg"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("_chg")).count()
        labels = stepped.drop("_chg")
        if changed == 0:
            return labels.select(
                F.col("id").alias(id_col), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(f"dedup_clusters did not converge in {max_iters} rounds")


def contamination_pairs(
    train: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 128,
) -> DataFrame:
    """Train/eval DECONTAMINATION: (train_doc_id, eval_doc_id) pairs
    whose shingle CONTAINMENT — |S(train) ∩ S(eval)| / |S(eval)| — is ≥
    threshold. Containment (not Jaccard) is the right asymmetric metric:
    a long training doc that embeds a whole eval item has low Jaccard but
    containment ≈ 1, and it is exactly the leak a benchmark audit must
    catch.

    Same scale shape as :func:`ngram_jaccard_pairs`: candidates come from
    a sub-cap shingle equi-join (skew bound on the TRAIN side, the big
    one), and the containment of surviving candidates is verified over
    the FULL shingle sets by pair expansion — never an uncapped
    train×eval shingle intersection. A pair is found iff it shares ≥1
    sub-cap shingle; a real leak shares many.
    """
    # both shingle tables feed the candidate join AND the verify expand
    # (train ×3, eval ×3 references) — see _materialize
    tr = _materialize(
        word_shingles(train, n=n, text_col=text_col, id_col=id_col).select(
            F.col("doc_id").alias("train_doc_id"), "shingle"
        )
    )
    ev = _materialize(
        word_shingles(evalset, n=n, text_col=text_col, id_col=id_col).select(
            F.col("doc_id").alias("eval_doc_id"), "shingle"
        )
    )
    trc = tr
    if max_shingle_freq is not None:
        freq = tr.groupBy("shingle").agg(F.count("*").alias("_f"))
        trc = tr.join(
            freq.filter(F.col("_f") <= max_shingle_freq).drop("_f"), "shingle", "left_semi"
        )
    cands = trc.join(ev, "shingle").select("train_doc_id", "eval_doc_id").distinct()
    inter = (
        cands.join(tr, "train_doc_id")
        .join(ev, ["eval_doc_id", "shingle"])
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = ev.groupBy("eval_doc_id").agg(F.count("*").alias("_sz"))
    return (
        inter.join(sizes, "eval_doc_id")
        .withColumn("containment", F.round(F.col("n_common") / F.col("_sz"), 4))
        .filter(F.col("containment") >= threshold)
        .select("train_doc_id", "eval_doc_id", "n_common", "containment")
    )


def cross_doc_dup_fraction(
    docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document fraction of word ``k``-gram OCCURRENCES that also
    appear in at least one OTHER document — the cross-corpus complement
    of :func:`~kafka_plugins_spark.operators.text.repetition_scores`
    (which is intra-doc): boilerplate headers, licence blocks, and
    template passages shared across documents score high here while a
    doc-level dedup (exact/MinHash) misses them entirely. The same
    signal Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better", public) act on by removing duplicated substrings;
    this operator emits the measurement — the removal policy (drop doc,
    trim spans) is the caller's.

    Columns: ``doc_id``, ``n_grams`` (occurrences, 0 for docs shorter
    than k words), ``xdoc_dup_frac`` (rounded to 4 decimals, NULL when
    n_grams = 0).

    Scale shape: the gram table is O(corpus words); counting docs per
    gram is one hash aggregate with map-side partials, the membership
    join is a plain equi-join on the gram (AQE-planned), and the final
    per-doc rollup is one more hash aggregate — no windows, no
    cartesian. At 100 TB, shrink the shuffle width by hashing the gram
    (``xxhash64``) before the aggregate and swapping ``countDistinct``
    for ``approx_count_distinct`` — this reference implementation keeps
    the raw gram string so the DuckDB oracle can re-derive it verbatim.
    Tokens and gram arrays are materialized in their own projections
    (the codegen CSE trap — see :func:`word_shingles`).
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    step1 = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    idx = F.sequence(F.lit(1), n - (k - 1))
    gram_arr = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + F.lit(j)) for j in range(k)])
    )
    # sequence(1, hi) DESCENDS for hi < 1 — short docs gate to []
    gram_arr = F.when(n >= k, gram_arr).otherwise(F.array().cast("array<string>"))
    gram_rows = _materialize(
        step1.select("doc_id", gram_arr.alias("_g")).select(
            "doc_id", F.explode("_g").alias("gram")
        )
    )  # consumed by the per-gram doc count AND the membership join
    shared = gram_rows.groupBy("gram").agg(F.countDistinct("doc_id").alias("_nd"))
    per_doc = (
        gram_rows.join(shared, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.round(
                F.sum((F.col("_nd") >= 2).cast("double")) / F.count(F.lit(1)), 4
            ).alias("xdoc_dup_frac"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            "xdoc_dup_frac",
        )
    )
