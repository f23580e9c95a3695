"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: broadcast the (small) query set against the
  candidate table; dot products are ``zip_with`` + ``aggregate`` fold —
  pure JVM, codegen'd, no Python. This is the exactness baseline.
- LSH-bucketed ANN: deterministic sign-random-projection buckets; the
  query only joins its own bucket — the 100 TB path (bucket join is an
  equi-join, prunes ~(1 - 1/2^planes) of candidates per probe).
- kNN label vote: majority label of the top-k (classification via search).

Hyperplanes are derived from md5 in plain Python, so they are identical
across runs/engines without shipping state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sq_norm(v: Column) -> Column:
    return F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.sqrt(_sq_norm(F.col(vec_col))))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic FP order, so the
    DuckDB oracle (list_sum over list_transform) reproduces it exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(_sq_norm(a)) * F.sqrt(_sq_norm(b)))


def dot_fixed(a: str, b: str, dim: int) -> Column:
    """:func:`dot` for a KNOWN dimensionality over two NAMED array
    columns, unrolled into a flat GetArrayItem/Multiply/Add chain.

    Bit-identical to :func:`dot`: the addition sequence is the same left
    fold ``((0.0 + a0·b0) + a1·b1) + …`` and each product the same
    ``cast(ai as double) * cast(bi as double)`` — but the unrolled tree
    contains no higher-order function, so it whole-stage-codegens instead
    of falling back to interpreted per-row eval (``zip_with``/
    ``aggregate`` are CodegenFallback expressions; on the IVF near-dup
    verify the interpreted fold dominated the whole operator at sf1
    scale). Built as ONE parsed SQL expression — constructing the ~450
    operator nodes through py4j calls costs seconds per plan, the parse
    costs microseconds; the resulting tree is identical. Requires
    ``len(a) == len(b) == dim`` — a shorter array yields NULL here where
    the fold would yield a partial sum. NOTE: the generated method of a
    stage containing this chain exceeds HotSpot's 8000-bytecode JIT cap;
    sessions must run with ``-XX:-DontCompileHugeMethods`` (set in
    session.get_spark) or the stage executes in the bytecode interpreter.
    """
    terms = " + ".join(
        f"CAST(`{a}`[{i}] AS DOUBLE) * CAST(`{b}`[{i}] AS DOUBLE)" for i in range(dim)
    )
    return F.expr(f"0.0D + {terms}")


def _dot_lit(a: str, vals: list[float]) -> Column:
    """``dot(named column, literal vector)`` unrolled like
    :func:`dot_fixed` (same fold order; the literal side is already
    double, as after Catalyst's constant folding of the old zip_with
    form). Double literals are emitted with ``repr`` (shortest
    round-tripping form) and parsed by Java's Double.parseDouble — an
    exact round trip."""
    import math

    if not all(math.isfinite(float(v)) for v in vals):
        # repr() of nan/inf ("nan"/"inf") is not parseable SQL — fail with
        # a diagnosis instead of a ParseException deep in plan building
        # (a non-finite centroid means the embeddings feeding the trainer
        # were already poisoned)
        raise ValueError("_dot_lit: literal vector contains non-finite values")
    terms = " + ".join(
        f"CAST(`{a}`[{i}] AS DOUBLE) * {float(v)!r}D" for i, v in enumerate(vals)
    )
    return F.expr(f"0.0D + {terms}")


def _sq_norm_fixed(v: str, dim: int) -> Column:
    """Unrolled ``Σ vᵢ²`` over a NAMED array column — bit-identical to
    :func:`_sq_norm` (same left fold, same per-element cast·cast square)."""
    terms = " + ".join(
        f"CAST(`{v}`[{i}] AS DOUBLE) * CAST(`{v}`[{i}] AS DOUBLE)" for i in range(dim)
    )
    return F.expr(f"0.0D + {terms}")


def _norm_col(vec_col: str, dim: int | None = None) -> Column:
    """‖v‖ as a column — computed ONCE per row before a candidate join,
    so scoring inside the join is dot/(na·nb) instead of re-folding both
    norms per PAIR (measured 1.55× on the IVF near-dup at sf0.1; values
    are bit-identical — same fold, same division). With ``dim`` the fold
    is unrolled (codegen, see :func:`dot_fixed`); values unchanged."""
    if dim is not None:
        return F.sqrt(_sq_norm_fixed(vec_col, dim))
    return F.sqrt(_sq_norm(F.col(vec_col)))


def _pair_dot(a: str, b: str, dim: int | None) -> Column:
    """The per-pair dot over named columns: unrolled when the
    dimensionality is known."""
    return dot_fixed(a, b, dim) if dim is not None else dot(F.col(a), F.col(b))


def brute_force_topk(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of every candidate for query ids < n_queries.

    Plan shape: broadcast-nested-loop of |Q| queries × all candidates —
    the candidate scan parallelizes perfectly; per-query top-k is a
    window over ≤|candidates| rows. At cluster scale replace the window
    with a per-partition partial top-k + final top-k if |Q| is large.
    Pass ``dim`` when known: the per-pair dot unrolls into codegen
    (bit-identical values, see :func:`dot_fixed`).
    """
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), _norm_col(vec_col, dim).alias("_qn")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), _norm_col(vec_col, dim).alias("_cn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[:4]
        out.append(int(h, 16) / 32768.0 - 1.0)
    return out


def lsh_bucket_expr(vec_col: str, dim: int, planes: int = 8) -> Column:
    """Sign-random-projection bucket id in [0, 2^planes)."""
    bucket = F.lit(0)
    for p in range(planes):
        bit = F.when(_dot_lit(vec_col, _hyperplane(p, dim)) > 0, F.lit(1 << p)).otherwise(0)
        bucket = bucket + bit
    return bucket.cast("int")


def ann_lsh_topk(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    planes: int = 4,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: search the query's LSH bucket (+ multi-probe).

    Multi-probe flips each sign bit once, so a query scans ``planes + 1``
    of the ``2^planes`` buckets — the standard recall/latency dial.
    Recall < 1 by construction; at scale the bucket column is a
    partition/cluster key so each probe touches one bucket's files only.
    """
    bucketed = emb.withColumn("_bucket", lsh_bucket_expr(vec_col, dim, planes))
    q = bucketed.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm_col(vec_col, dim).alias("_qn"),
        "_bucket",
    )
    if multiprobe:
        probes = F.array(
            F.col("_bucket"), *[F.col("_bucket").bitwiseXOR(1 << p) for p in range(planes)]
        )
        q = q.withColumn("_bucket", F.explode(probes))
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm_col(vec_col, dim).alias("_cn"),
        "_bucket",
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer centroids from md5.

    Production IVF trains k-means offline and broadcasts the codebook;
    here the codebook is a fixed pseudo-random one so both engines (and
    the DuckDB oracle) share it without shipping state. The *structure*
    — assign to argmax-cosine centroid, probe nprobe cells — is the
    real IVF search plan."""
    out = []
    for c in range(n_cells):
        v = _hyperplane(2000 + c, dim)
        n = sum(x * x for x in v) ** 0.5
        out.append([x / n for x in v])
    return out


IVF_SCALE = 1 << 20  # fixed-point quantum for order-independent k-means sums


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    dim: int = 64,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spark-native spherical k-means for the IVF coarse quantizer:
    ``n_iters`` rounds of assign-to-argmax-cosine-cell (one codegen'd
    projection) + per-cell per-dimension mean (one partial-aggregated
    groupBy collecting ``n_cells`` rows to the driver). Pure DataFrame
    ops — no MLlib, no Python row UDFs.

    Bit-reproducibility is part of the contract: per-dimension sums are
    taken over fixed-point longs (``round(x * 2^20)``), so the result is
    independent of partitioning and row order, and the DuckDB oracle
    (:func:`entry_queries._ivf_train_ctes`) re-derives the IDENTICAL
    centroids from the same parquet — which is what lets the trained-IVF
    driver queries stay hash-green. Multiplication by 2^20 is exact
    (exponent shift), both engines round half-away-from-zero, and sums
    stay far under 2^53 (exact BIGINT→DOUBLE). Empty cells keep their
    previous centroid, ties in assignment go to the smaller cell id.

    At 100 TB: train on a deterministic sample (filter on ``id_col``)
    and cache the input — each iteration is one scan + one O(n_cells)
    shuffle (map-side combine does the heavy lifting).
    """
    import math

    cents = ivf_centroids(n_cells, dim)  # deterministic unit-norm init
    scaled = [
        F.sum(
            F.round(F.col(vec_col)[i].cast("double") * F.lit(float(IVF_SCALE))).cast("long")
        ).alias(f"s{i}")
        for i in range(dim)
    ]
    for _ in range(n_iters):
        assigned = emb.withColumn("_cell", ivf_cell_ranking(vec_col, cents).getItem(0))
        rows = assigned.groupBy("_cell").agg(F.count("*").alias("_n"), *scaled).collect()
        new = [list(c) for c in cents]
        for r in rows:
            v = [(r[f"s{i}"] / r["_n"]) / IVF_SCALE for i in range(dim)]
            nrm = math.sqrt(sum(x * x for x in v))
            if nrm > 0:
                new[r["_cell"]] = [x / nrm for x in v]
        cents = new
    return cents


def ivf_cell_ranking(vec_col: str, centroids: list[list[float]]) -> Column:
    """Array of cell ids ordered by descending dot(vec, centroid)
    (ties → smaller cell id). Element 0 is the home cell; the first
    nprobe elements are the probe set."""
    scored = F.array(
        *[
            F.struct(
                _dot_lit(vec_col, cent).alias("d"),
                F.lit(-cid).alias("nc"),
            )
            for cid, cent in enumerate(centroids)
        ]
    )
    ranked = F.reverse(F.array_sort(scored))  # desc by (d, -cid) ⇒ ties pick smaller cid
    return F.transform(ranked, lambda s: -s["nc"])


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    n_cells: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize every vector to its
    argmax-cosine centroid cell, search only the query's ``nprobe``
    nearest cells. The candidate join is an equi-join on ``_cell``;
    at scale the cell is a partition/cluster key so each probe touches
    one cell's files (same pruning story as the LSH variant, but the
    cells adapt to the data distribution once the codebook is trained —
    pass ``centroids`` from :func:`train_ivf_centroids`). Recall < 1 by
    construction — the nprobe dial trades recall for touched cells."""
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    ranking = ivf_cell_ranking(vec_col, cents)
    bucketed = emb.withColumn("_cell", ranking.getItem(0))
    q = (
        emb.filter(F.col(id_col) < n_queries)
        .withColumn("_probes", F.slice(ranking, 1, nprobe))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            _norm_col(vec_col, dim).alias("_qn"),
            F.explode("_probes").alias("_cell"),
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm_col(vec_col, dim).alias("_cn"),
        "_cell",
    )
    scored = (
        c.join(F.broadcast(q), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _verify_cosine(
    cands: DataFrame,
    emb: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    dim: int | None = None,
) -> DataFrame:
    """Exact rounded-cosine verification of candidate (id_a, id_b) pairs.
    Norms ride the per-vector side of the join (see :func:`_norm_col`);
    with ``dim`` the per-pair dot unrolls into codegen (bit-identical)."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), _norm_col(vec_col, dim).alias("_na")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), _norm_col(vec_col, dim).alias("_nb")
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "score",
            F.round(_pair_dot("_va", "_vb", dim) / (F.col("_na") * F.col("_nb")), 4),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def embedding_neardup_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold — all-pairs cross join.

    O(n²) test oracle ONLY. The production entry point is
    :func:`embedding_neardup_pairs` (grid-blocked equi-join, identical
    result set, no CartesianProduct in the plan)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def _grid_cells(vec_col: str, dim: int, threshold: float, k: int) -> list[Column]:
    """Deterministic-projection grid cell indices with PROVABLE recall.

    For unit vectors, cos(a,b) ≥ t ⟺ ‖â−b̂‖ ≤ d = √(2(1−t)). For any
    projection u: |u·â − u·b̂| ≤ ‖u‖·d (Cauchy–Schwarz) — so with cell
    width w = ‖u‖·d, a qualifying pair's cell indices differ by at most
    1 in every projection. Probing the 3^k neighbor cells therefore
    finds EVERY pair with cosine ≥ t: unlike sign-LSH this blocking is
    exact, not probabilistic (sign-LSH at t≈0.45 ⇒ 63° ⇒ per-bit
    disagreement 0.35 — hopeless for recall 1). Width carries a 2%
    margin so the rounded-score boundary (round(cos,4) ≥ t admits
    cos = t−5e-5) and projection FP error can't break the bound.
    """
    d = (2.0 * (1.0 - (threshold - 1e-3))) ** 0.5
    nrm = F.sqrt(_sq_norm_fixed(vec_col, dim))
    cells = []
    for j in range(k):
        u = _hyperplane(1000 + j, dim)
        u_norm = sum(x * x for x in u) ** 0.5
        w = 1.02 * u_norm * d
        proj = _dot_lit(vec_col, u) / nrm  # projection of the UNIT vector
        cells.append(F.floor(proj / F.lit(w)).cast("long").alias(f"_cell{j}"))
    return cells


def neardup_grid_candidates(
    emb: DataFrame,
    threshold: float,
    dim: int,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Grid-blocked candidate pairs (id_a < id_b) — every pair with
    cosine ≥ threshold is guaranteed present (recall 1, see
    :func:`_grid_cells`). Exposed separately so tests and capacity
    planning can measure the candidate ratio |cands| / (n·(n−1)/2)
    directly — the blocking's pruning power."""
    cells = _grid_cells(vec_col, dim, threshold, k)
    base = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), *cells)

    # probe side: explode to the 3^k neighboring cells
    probed = base
    for j in range(k):
        probed = probed.withColumn(
            f"_cell{j}", F.explode(F.array(*[F.col(f"_cell{j}") + o for o in (-1, 0, 1)]))
        )
    cell_keys = [f"_cell{j}" for j in range(k)]
    return (
        probed.select(F.col("_id").alias("id_a"), *cell_keys)
        .join(base.select(F.col("_id").alias("id_b"), *cell_keys), cell_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = None,
    dim: int | None = None,
    candidate_obs=None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold — grid-blocked, exact.

    The scale shape: each vector lands in one k-dim grid cell (see
    :func:`_grid_cells`); one side multiprobes its 3^k neighbor cells and
    the candidate join is a plain equi-join on the composite cell key —
    no CartesianProduct, bounded fan-out, and provably every qualifying
    pair collides. Candidates are verified with the exact rounded cosine,
    so output ≡ the all-pairs cross join.

    ``dim``: pass the vector dimensionality explicitly (pipelines know
    it) — when omitted, a one-row probe job runs at plan-construction
    time, an extra Spark job the hot path shouldn't pay; an empty input
    returns an empty frame rather than failing the probe.

    OPERATING ENVELOPE (measured, tests/test_training_ops.py): the
    recall-1 cell width is the worst-case (Cauchy–Schwarz) bound
    w ∝ √(1−t), while 64-d unit vectors concentrate their projections in
    a ±3/√dim band — so exact blocking only *prunes* when
    √(2(1−t)) ≲ 1/√dim, i.e. t ≳ 0.99 at dim=64 (candidate ratio ~0.37
    at t=0.99/k=4, ~0.03 at t=0.999/k=4, ~1.0 for every k at t ≤ 0.95 on
    an isotropic corpus). That is the true near-duplicate regime — byte-
    near-identical docs embed at cosine ≈ 1. The plan stays an equi-join
    at any threshold (never a CartesianProduct), but below the envelope
    the candidate set itself degenerates toward all-pairs: for loose
    thresholds use :func:`embedding_neardup_pairs_ivf` (approximate,
    recall dial) instead — exactness below the envelope is inherently
    quadratic on high-dim data.

    ``k`` (projection count): each projection multiplies candidate
    occupancy down but costs 3^k probe fan-out; auto-policy pays k=4
    only inside the envelope (t ≥ 0.98) where projections actually
    prune, and the minimal k=2 outside it.

    ``candidate_obs``: optional ``pyspark.sql.Observation`` — records
    ``n_candidates`` on the run for capacity planning (read it after the
    action; divide by n·(n−1)/2 for the blocking's admitted fraction),
    riding the job instead of costing a second one.
    """
    if k is None:
        k = 4 if threshold >= 0.98 else 2
    if dim is None:
        row = emb.select(vec_col).first()
        if row is None or row[0] is None:
            return emb.sparkSession.createDataFrame(
                [], f"id_a {emb.schema[id_col].dataType.simpleString()}, "
                    f"id_b {emb.schema[id_col].dataType.simpleString()}, score double"
            )
        dim = len(row[0])
    cands = neardup_grid_candidates(emb, threshold, dim, k, vec_col=vec_col, id_col=id_col)
    if candidate_obs is not None:
        cands = cands.observe(candidate_obs, F.count(F.lit(1)).alias("n_candidates"))
    return _verify_cosine(cands, emb, threshold, vec_col, id_col, dim=dim)


def embedding_neardup_pairs_ivf(
    emb: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    n_cells: int = 8,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    candidate_obs=None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold — IVF-blocked,
    APPROXIMATE (recall < 1 by construction, dialable via ``nprobe``).

    The loose-threshold companion to :func:`embedding_neardup_pairs`:
    below that operator's exactness envelope (t ≲ 0.98 at dim=64) any
    recall-1 blocking admits ~all pairs, so the scale path trades recall
    for a bounded candidate set. Candidates are pairs sharing an IVF
    cell — (a, b) survives iff b's home cell is among a's ``nprobe``
    nearest cells or vice versa — then verified with the exact rounded
    cosine, so false positives are impossible and output ⊆ the all-pairs
    result. ``nprobe = n_cells`` degenerates to exact (every pair is a
    candidate). At scale the cell is a partition/cluster key: the
    candidate join is a plain equi-join touching each cell's files only,
    and a trained (k-means) codebook replaces the deterministic one
    (pass ``centroids`` from :func:`train_ivf_centroids`).

    Contract (hot path): ``id_col`` must be integral (emitted as long —
    the declared cogroup schema) and every vector exactly ``dim``
    elements; violations fail the stage loudly. The pure-expression
    observed path below shares the integral-id expectation through the
    same verify join.

    ``candidate_obs``: optional ``pyspark.sql.Observation`` recording
    ``n_candidates`` — the number of DISTINCT pairs the blocking admits,
    the cost driver of this operator: a trained codebook balances cells,
    and balanced cells can admit MORE pairs than lopsided ones at the
    same nprobe, trading verify cost for recall. Observe it to attribute
    wall-time shifts to candidate volume vs host weather. The observed
    variant streams every co-occurrence once (counting each admitted
    pair exactly once via a canonical-direction rule — no O(candidates)
    distinct exchange) and re-derives the result rows by joining the
    candidate stream against the hot path's verified output. Both paths
    return the identical rows.
    """
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    ranking = ivf_cell_ranking(vec_col, cents)
    if candidate_obs is not None:
        # Capacity-accounting path. A pair can arrive by ≤2 directions
        # (a probes b's home cell / b probes a's home cell); instead of
        # a distinct over O(n²/cells) rows, keep one CANONICAL row per
        # admitted pair: drop direction (a→b) iff the reverse direction
        # also exists (home(a) ∈ probes(b)) and id_a > id_b. The count
        # of surviving rows is exactly |distinct candidates|; the result
        # rows come from an inner join against the hot path's verified
        # output (every verified pair is a candidate by construction),
        # so the returned rows are identical to the unobserved path.
        home = emb.select(
            F.col(id_col).alias("id_b"),
            ranking.getItem(0).alias("_cell"),
            F.slice(ranking, 1, nprobe).alias("_probes_b"),
        )
        probes = emb.select(
            F.col(id_col).alias("id_a"),
            ranking.getItem(0).alias("_home_a"),
            F.explode(F.slice(ranking, 1, nprobe)).alias("_cell"),
        )
        cands = (
            probes.join(home, "_cell")
            .filter(F.col("id_a") != F.col("id_b"))
            .filter(
                (F.col("id_a") < F.col("id_b"))
                | ~F.array_contains(F.col("_probes_b"), F.col("_home_a"))
            )
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
        )
        cands = cands.observe(candidate_obs, F.count(F.lit(1)).alias("n_candidates"))
        verified = embedding_neardup_pairs_ivf(
            emb, threshold, dim, n_cells, nprobe, vec_col, id_col, centroids=cents
        )
        return cands.join(F.broadcast(verified), ["id_a", "id_b"]).select(
            "id_a", "id_b", "score"
        )

    # Hot path (guide §4.2 shape: Spark distributes, a vectorized native
    # library does the per-batch math). The O(n²/cells) co-occurrence set
    # is never materialized as rows at all: probes and homes are cogrouped
    # by their Spark-computed (cell, salt) key and each group is scored as
    # ONE numpy/BLAS matrix product over unit vectors, emitting only the
    # pairs above a CONSERVATIVE prefilter threshold. The cogroup crosses
    # the Python boundary as ARROW TABLES (applyInArrow), not pandas: the
    # embedding column arrives as a ListArray whose flat values buffer
    # reshapes straight into the (n, dim) matrix — the pandas form
    # materialized 240k per-row numpy objects and np.stack'ed them, which
    # dominated the stage (measured r7 at sf1sim: 5-7 s pandas vs
    # 1.8-2.4 s Arrow for the identical 202,900 emitted pairs). Every
    # semantic decision stays in Spark expressions:
    #   - cell assignment / probe sets come from the same ivf_cell_ranking
    #     expression as before (bit-exact), evaluated BEFORE the shuffle —
    #     the cogroup key IS the blocking, so membership is structural;
    #   - the prefilter threshold is threshold − 5e-5 − 1e-9: 5e-5 covers
    #     the round(·,4) boundary (round(x,4) ≥ t admits x ≥ t−5e-5) and
    #     1e-9 dwarfs the ~1e-13 worst-case BLAS-reassociation +
    #     unitization FP difference vs the exact fold → NO false
    #     negatives; false positives are killed by the exact verify;
    #   - survivors (the near-pairs only, a vanishing fraction) get the
    #     exact rounded-cosine score from _verify_cosine — the identical
    #     expressions as the legacy path, so results are bit-identical.
    # The salt splits each cell's probe side so one hot cell cannot pin
    # the stage to one task; the home side is replicated per salt (cells
    # are small relative to the pair count this avoids).
    import numpy as np
    import pyarrow as pa

    spark = emb.sparkSession
    n_salts = max(4, (2 * spark.sparkContext.defaultParallelism) // max(n_cells, 1))
    prefilter_thr = threshold - 5e-5 - 1e-9

    clean = emb.filter(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    probes = clean.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(F.slice(ranking, 1, nprobe)).alias("_cell"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int").alias("_salt"),
    )
    homes = clean.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        ranking.getItem(0).alias("_cell"),
        F.explode(F.array(*[F.lit(s) for s in range(n_salts)])).alias("_salt"),
    )

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def _score_group(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0 or right.num_rows == 0:
            return out_schema.empty_table()
        pa_ids = (
            left.column("_id").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        hb_ids = (
            right.column("_id").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # ListArray flat-values buffer → (n, dim) matrix, no per-row objects
        # (float32 → float64 is exact, same values as the pandas np.stack)
        P = np.asarray(left.column("_v").combine_chunks().flatten(), dtype=np.float64).reshape(
            left.num_rows, dim
        )
        H = np.asarray(right.column("_v").combine_chunks().flatten(), dtype=np.float64).reshape(
            right.num_rows, dim
        )
        pn = np.sqrt((P * P).sum(axis=1))
        hn = np.sqrt((H * H).sum(axis=1))
        np.divide(P, pn[:, None], out=P, where=pn[:, None] > 0)
        np.divide(H, hn[:, None], out=H, where=hn[:, None] > 0)
        outs_a, outs_b = [], []
        # slab the matmul so one giant cell cannot blow task memory
        slab = max(1, int(64 * 1024 * 1024 // (8 * max(left.num_rows, 1))))
        for lo in range(0, right.num_rows, slab):
            G = P @ H[lo : lo + slab].T
            ii, jj = np.nonzero(G >= prefilter_thr)
            if len(ii):
                ga, gb = pa_ids[ii], hb_ids[lo + jj]
                m = ga != gb
                outs_a.append(np.minimum(ga[m], gb[m]))
                outs_b.append(np.maximum(ga[m], gb[m]))
        if not outs_a:
            return out_schema.empty_table()
        return pa.table({"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)})

    cands = (
        probes.groupBy("_cell", "_salt")
        .cogroup(homes.groupBy("_cell", "_salt"))
        .applyInArrow(_score_group, "id_a long, id_b long")
        .distinct()
    )
    return _verify_cosine(cands, emb, threshold, vec_col, id_col, dim=dim)


def knn_label_vote(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Predict each query's label by majority vote of its top-k neighbors
    (tie → smallest label)."""
    topk = brute_force_topk(
        emb, n_queries=n_queries, k=k, vec_col=vec_col, id_col=id_col, dim=dim
    )
    labeled = topk.join(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("n_label")),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "n_label").agg(F.count("*").alias("n_votes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("n_label"))
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("n_label").alias("predicted_label"), "n_votes")
    )
