"""Similarity search over embedding columns (north star).

Embeddings are ``array<float>`` columns; all arithmetic stays JVM-side
(``zip_with`` + ``aggregate`` fold to codegen'd expressions). Two paths:

* **brute force** — exact cosine against a query vector; one map stage +
  top-k. The correctness baseline, and at 100 TB the per-partition
  TakeOrdered keeps the shuffle at k rows per partition.
* **IVF (inverted file)** — k-means-style cells (here: the corpus' label
  column or any precomputed assignment), probe the nprobe nearest cells,
  brute-force within. Work drops by ~cells/nprobe; the cell assignment
  broadcast is tiny.
* **random-hyperplane LSH** — sign-bit sketches; Hamming blocking like
  SimHash. The fully hash-derived (data-independent) scale path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hudi_utility_spark.ops import lits


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ as zip_with + aggregate (double precision, sequential fold —
    bit-stable across engines that fold left-to-right)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float] | Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query is a literal array (broadcast by value into the plan); the
    scan computes one fused expression per row and TakeOrderedAndProject
    keeps only k rows per partition before the final merge.
    """
    q = (
        lits.array_double(query_vec)
        if isinstance(query_vec, list)
        else query_vec
    )
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def knn_join_by_cell(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style k-NN join: candidates restricted to the query's probed
    cells; per-query top-k via ranking window on ROUND(cos, 6) (the
    round-6-before-rank discipline — rank order is ulp-insensitive).

    `queries` must carry (query_id, embedding, `probe_cells` array).
    The probed cells are EXPLODED and equi-joined on the cell id — one
    shuffle keyed on cell, each task sees one cell's vectors (the
    classic IVF partition-pruning win). The previous
    ``array_contains(probe_cells, cell)`` theta form planned as a
    nested-loop join at scale (r9 verdict #4). A document lives in
    exactly one cell; ``probe_cells`` is deduplicated before the
    explode so the op keeps the SET semantics of the old
    ``array_contains`` form even when a caller passes duplicate cells
    (a duplicated doc would otherwise occupy two top-k slots,
    displacing a genuine neighbor — r10 advice #2).
    """
    from pyspark.sql import Window

    probes = queries.select(
        F.col("query_id"),
        F.col("embedding").alias("_qvec"),
        F.explode(F.array_distinct("probe_cells")).alias(cell_col),
    )
    scored = probes.join(df, cell_col).select(
        "query_id",
        F.col(id_col),
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_centroids(
    df: DataFrame, vec_col: str = "embedding", cell_col: str = "label"
) -> DataFrame:
    """Per-cell mean vector (the IVF coarse quantizer). posexplode →
    per-(cell, dim) mean → re-assemble; one shuffle keyed on (cell, dim)."""
    dims = df.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    per_dim = dims.groupBy("cell", "dim").agg(F.avg("v").alias("mean_v"))
    return (
        per_dim.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("dims")
        )
        .select(
            "cell", F.transform(F.col("dims"), lambda s: s["mean_v"]).alias("centroid")
        )
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF search for one query: rank cells by centroid cosine, probe the
    top `nprobe`, exact top-k within. Approximate iff the true neighbors
    live outside probed cells — the standard IVF recall trade."""
    cents = ivf_centroids(df, vec_col, cell_col)
    q = lits.array_double(query_vec)
    probed = [
        r["cell"]
        for r in cents.select(
            "cell", cosine(F.col("centroid"), q).alias("s")
        )
        .orderBy(F.desc("s"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    ]
    return brute_force_topk(
        df.filter(F.col(cell_col).isin(probed)), query_vec, k, id_col, vec_col
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    cell_col: str = "label",
    out_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid cell assignment — the IVF coarse-quantization
    step that turns a raw corpus into blockable units for every
    within-cell operator (`hard_negatives(block_col=...)`, SemDeDup,
    IVF probing).

    ``centroids`` defaults to :func:`ivf_centroids` over ``cell_col``
    (per-label means). The centroid table is tiny by construction
    (n_cells × dim floats — driver state, same budget as a PQ
    codebook), so it is collected once and re-enters the plan as ONE
    array-of-structs literal; assignment is then a codegen'd HOF
    argmax per row — map-only, zero shuffle, zero Python. Ranking is
    on ROUND(cos, 6) DESC, cell ASC: rounding before ranking makes the
    argmax insensitive to ulp-level centroid drift from distributed
    AVG partial-sum order, so Spark (any partitioning) and a SQL
    oracle assign identically (the same discipline as
    `margin_pair_mining`)."""
    if centroids is None:
        centroids = ivf_centroids(df, vec_col, cell_col)
    cents = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    ]
    lit = lits.array_struct_pairs(sorted(cents))
    # fold to (best_score, best_cid); round-6 before comparing, cell asc ties
    best = F.aggregate(
        lit,
        F.struct(
            F.lit(-2.0).alias("s"), F.lit(-1).alias("cid")
        ),
        lambda acc, ct: F.when(
            F.round(cosine(F.col(vec_col), ct["c"]), 6) > acc["s"],
            F.struct(
                F.round(cosine(F.col(vec_col), ct["c"]), 6).alias("s"),
                ct["cid"].alias("cid"),
            ),
        ).otherwise(acc),
    )
    return df.withColumn(out_col, best["cid"])


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``m`` contiguous subvectors and learn ``k`` centroids per subspace
    with the deterministic fixed-iteration Lloyd's of `ops/cluster.py`
    (init = k lowest-id subvectors, lower-cid tie break), so the whole
    fit — like `cluster_kmeans_profile` — is a finite dataflow an SQL
    oracle can replay. Returns ``m`` codebooks of ``k`` centroids.

    Scale: ALL m subspace fits share one dataflow — the vector is
    sliced into an (id, subspace, subvector) long relation and every
    iteration is ONE pass (map-only assignment against the nested
    codebook literal, one (s, cid, dim) partial-mean shuffle), so the
    table is scanned ``iters`` times total, not ``m × iters`` as a
    per-subspace loop would. Driver state is m·k·(dim/m) = k·dim
    floats — the same size as one un-quantized centroid table. Init,
    argmin tie rules, and empty-cluster behavior match
    `cluster.kmeans_fit` exactly (lowest-id init, lower-cid ties,
    empty keeps previous), so the per-subspace unrolled oracle is
    unchanged."""
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    # (id, s, v) long relation: every subspace slice in one projection
    slices = F.array(*[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)])
    long = df.select(
        F.col(id_col), F.posexplode(slices).alias("s", "v")
    ).select(F.col(id_col), F.col("s"), F.col("v").cast("array<double>"))

    # init: the k lowest-id vectors, sliced driver-side (k full vectors)
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    books = [
        [
            [float(x) for x in r[0][s * sub : (s + 1) * sub]]
            for r in init_rows
        ]
        for s in range(m)
    ]

    def _books_literal(bks):
        # nested literal: element_at(lit, s+1) = subspace s's codebook;
        # one JVM-parsed SQL string, not m*k*sub py4j lit calls
        return lits.array_array_struct_cid_c(bks)

    def _assign(rel, bks):
        cents = F.element_at(_books_literal(bks), F.col("s") + 1)
        best = F.array_sort(
            F.transform(
                cents,
                lambda st: F.struct(
                    F.aggregate(
                        F.zip_with(F.col("v"), st["c"], lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ).alias("d"),
                    st["cid"].alias("cid"),
                ),
            )
        )[0]["cid"]
        return rel.withColumn("cid", best)

    for _ in range(iters):
        assigned = _assign(long, books)
        per_dim = (
            assigned.select("s", "cid", F.posexplode(F.col("v")).alias("dim", "x"))
            .groupBy("s", "cid", "dim")
            .agg(F.avg("x").alias("mean_x"))
        )
        new = {}
        for r in per_dim.collect():
            new.setdefault((r["s"], r["cid"]), {})[r["dim"]] = r["mean_x"]
        books = [
            [
                [new[(s, cid)][d] for d in range(sub)]
                if (s, cid) in new
                else books[s][cid]
                for cid in range(k)
            ]
            for s in range(m)
        ]
    return books


def pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as ``m`` centroid codes (one per subspace):
    argmin squared-L2 against the subspace codebook folded into the
    plan as literals — map-only, no shuffle, no Python (the HOF argmin
    evaluates as an interpreted JVM projection; the stage stays narrow,
    asserted in tests). The codes column is the 8×-to-64×-compressed
    representation that makes billion-vector ANN fit in memory."""
    from hudi_utility_spark.ops.cluster import _centroid_literal, _sq_dist

    sub = len(codebooks[0][0])
    out = df.select(F.col(id_col), F.col(vec_col))
    for s, book in enumerate(codebooks):
        cents = _centroid_literal(book)
        sliced = F.slice(F.col(vec_col), s * sub + 1, sub)
        best = F.array_sort(
            F.transform(
                cents,
                lambda st: F.struct(
                    _sq_dist(sliced, st["c"]).alias("d"), st["cid"].alias("cid")
                ),
            )
        )[0]["cid"]
        out = out.withColumn(f"code_{s}", best)
    return out.drop(vec_col)


def pq_adc_topk(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: the query stays exact; each corpus
    vector is its PQ codes, and distance ≈ Σₛ ‖q_s − c_{s,code_s}‖².
    The per-subspace distance table (k scalars per subspace, computed
    once on the driver) is folded into the plan as literal arrays, so
    per-row work is ``m`` array lookups + an add chain — the table-
    lookup economics that lets ADC scan compressed codes instead of raw
    vectors. TakeOrderedAndProject keeps k rows per partition; no global
    sort."""
    sub = len(codebooks[0][0])
    coded = pq_codes(df, codebooks, vec_col, id_col)
    adc = None
    for s, book in enumerate(codebooks):
        q_s = [float(x) for x in query_vec[s * sub : (s + 1) * sub]]
        table = [
            sum((q_s[i] - c[i]) * (q_s[i] - c[i]) for i in range(sub)) for c in book
        ]
        term = F.element_at(
            lits.array_double(table), F.col(f"code_{s}") + 1
        )
        adc = term if adc is None else adc + term
    return (
        coded.select(F.col(id_col), F.round(adc, 4).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(topk)
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, id_a < id_b.

    With `block_col` the self-join keys on the block (IVF cell), making
    candidate volume per-cell quadratic instead of global — at 100 TB you
    cluster first, then near-dup within cells (standard SemDeDup shape).
    `block_col=None` is the exact all-pairs baseline for small tables.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        *([F.col(block_col).alias("blk_a")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        *([F.col(block_col).alias("blk_b")] if block_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        cond = cond & (F.col("blk_a") == F.col("blk_b"))
    return (
        a.join(b, cond)
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def random_hyperplane_sketch(
    df: DataFrame,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH sketch: bit p = sign(v · h_p) where plane h_p is a
    deterministic pseudo-random ±1 direction derived from md5 of
    ``plane{p}:dim{d}`` — reproducible with no stored model, in ANY
    engine (`plane_component`), so the bucket histogram is fully
    oracle-checkable (the r2 xxhash64 derivation was Spark-only).

    cos(a,b) ≈ cos(π · hamming/planes); block on the sketch for
    candidate generation like simhash_near_pairs.

    The component table is k·dim driver-side scalars folded into the
    plan as literal arrays (the same broadcast-by-value pattern as
    k-means centroids — nothing per-row recomputes a digest); the
    projection is a ``zip_with``/``aggregate`` fold whose left-fold
    order matches an unrolled sum exactly, so sketches are bit-identical
    across engines evaluating the terms in written order.
    """
    dim_count = len(df.select(vec_col).first()[0])
    sketch = None
    for p in range(planes):
        comps = lits.array_double(
            [plane_component(p, d) for d in range(dim_count)]
        )
        proj = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), comps, lambda v, c: v * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << p).cast("long")
        sketch = term if sketch is None else sketch + term
    return df.select(F.col(id_col), sketch.alias("sketch"))


def plane_component(p: int, d: int) -> float:
    """±1 component d of hyperplane p: parity of the first md5 hex digit
    of the public tag ``plane{p}:dim{d}``. Shared by the Spark sketch,
    the DuckDB oracle builder, and tests."""
    import hashlib

    digit = int(hashlib.md5(f"plane{p}:dim{d}".encode()).hexdigest()[0], 16)
    return 1.0 if digit % 2 == 1 else -1.0


def centroid_scores(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Cosine of every vector to its group's mean vector — the semantic
    outlier signal (a document far from its cluster/language centroid is
    mislabeled, noise, or genuinely novel; SemDeDup prunes the opposite
    end of the same score).

    Plan shape: the centroid table is ONE map-side-combinable hash
    aggregate — ``dim`` scalar ``avg(vec[i])`` columns reassembled into
    an array, no explode, no (row × dim) long relation ever shuffled —
    then a broadcast join back on the label and a fused HOF cosine per
    row. Total cost at 100 TB: one scan + one tiny (labels × dim)
    broadcast; the score projection is map-only.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    mu = df.groupBy(label_col).agg(
        F.array(
            *[F.avg(F.element_at(F.col(vec_col), i + 1)) for i in range(dim)]
        ).alias("__mu")
    )
    return (
        df.join(F.broadcast(mu), label_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(F.col(vec_col), F.col("__mu")), 6).alias(
                "cos_centroid"
            ),
        )
    )


def brute_force_topk_arrow(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via a SCALAR Arrow ``pandas_udf`` — the
    vectorized-Python twin of :func:`brute_force_topk`, kept as the
    documented fallback shape for kernels the built-in HOFs can't
    express (learned scorers, quantized distance tables, anything
    NumPy/torch). Same plan skeleton: map-only scoring →
    TakeOrderedAndProject; the only difference is each Arrow batch
    crossing into one NumPy matmul instead of fused codegen. Use the
    HOF version when the math is expressible — the Arrow hop costs
    serialization the JVM path doesn't pay.
    """
    q = np.asarray(query_vec, dtype="float64")
    qn = float(np.sqrt((q * q).sum()))

    @F.pandas_udf("double")
    def _cos(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy()).astype("float64")  # (batch, dim)
        sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
        return pd.Series(sims)

    return (
        df.select(F.col(id_col), F.round(_cos(vec_col), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def hard_negatives(
    df: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    block_col: str | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``k`` most-similar vectors carrying a DIFFERENT label — the pairs
    that actually move a contrastive/triplet loss (easy negatives are
    already far away).

    ``block_col=None`` is the exact all-pairs baseline arm (same
    contract as ``cosine_near_pairs``'s small-table arm — fine for
    rescoring a candidate pool, wrong for a raw 100 TB corpus). The
    scale path mines within blocks: pass an IVF cell id
    (``assign_cells``) or LSH bucket as ``block_col`` and candidates
    are generated per block — the bucketed-join discipline every other
    similarity operator uses; the top-k window then ranks per anchor
    (anchor-keyed, uniformly distributed).
    """
    a, b = df.alias("a"), df.alias("b")
    cond = F.col(f"a.{label_col}") != F.col(f"b.{label_col}")
    if block_col is not None:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    score = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    from pyspark.sql import Window

    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("anchor_id"),
            F.col(f"b.{id_col}").alias("neg_id"),
            F.col(f"a.{label_col}").alias("anchor_label"),
            F.col(f"b.{label_col}").alias("neg_label"),
            F.round(score, 6).alias("score"),
            score.alias("_raw"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("anchor_id").orderBy(
                    F.desc("_raw"), F.asc("neg_id")
                )
            ),
        )
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_raw")
    )


def embedding_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic twin of
    n-gram `ops/text.decontaminate` (phi-style): a corpus row is
    contaminated when its max cosine against ANY eval-set vector
    reaches *threshold* (paraphrased leaks that share no exact n-gram
    still land near the eval point in embedding space).

    Plan: the eval set — small by definition (an eval benchmark, not a
    corpus) — is collected once and re-enters the plan as ONE
    array-of-arrays literal; the max-cosine fold is a codegen'd HOF
    chain evaluated per corpus row. Map-only, zero shuffle, zero
    Python — the same literal-broadcast discipline as `pq_adc_topk`'s
    codebooks. At 100 TB the corpus side streams at scan bandwidth;
    an eval set beyond literal size (≫10⁴ vectors) should move to the
    broadcast-join + max-agg form instead.

    Returns the corpus with ``max_eval_cos`` (rounded, 6dp) and
    ``contaminated`` appended.

    Guard: raises if the eval set exceeds 20k vectors — the signal the
    caller passed a data-shaped relation where the broadcast-join +
    max-agg form is the correct tool (a 100 TB caller must not be able
    to foot-gun a corpus into a driver collect).
    """
    _EVAL_CAP = 20_000
    rows = eval_set.select(vec_col).limit(_EVAL_CAP + 1).collect()
    if len(rows) > _EVAL_CAP:
        raise ValueError(
            f"embedding_decontaminate(): eval_set exceeds {_EVAL_CAP} "
            "vectors — use a broadcast join + max-agg instead of the "
            "literal-fold form"
        )
    evals = [list(map(float, r[0])) for r in rows]
    if not evals:
        return corpus.withColumn(
            "max_eval_cos", F.lit(None).cast("double")
        ).withColumn("contaminated", F.lit(False))
    best = F.aggregate(
        F.lit(evals),
        F.lit(-2.0),
        lambda acc, ev: F.greatest(acc, cosine(F.col(vec_col), ev)),
    )
    return (
        corpus.withColumn("_m", best)
        .withColumn("max_eval_cos", F.round("_m", 6))
        .withColumn("contaminated", F.col("_m") >= F.lit(float(threshold)))
        .drop("_m")
    )


def mmr_rerank(
    df: DataFrame,
    query_vec: list[float],
    k: int = 4,
    pool: int = 15,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance: retrieve-then-diversify re-ranking.

    Stage 1 (distributed): exact cosine top-``pool`` candidates —
    map-only scoring + TakeOrderedAndProject, identical shape to
    :func:`brute_force_topk`; this is the only stage that sees the
    corpus, so the 100 TB cost is one scan regardless of k.

    Stage 2 (bounded): greedy MMR over the pool —
    ``argmax lam*rel(p) - (1-lam)*max_{s in S} cos(p, s)`` k times.
    The pool is a CONSTANT (the rerank window every retrieval stack
    uses); O(pool^2 * d) on <= pool rows is driver arithmetic on par
    with the IVF codebook idiom, not a collect of data rows. Ties on
    the greedy argmax break toward the lower id (stable across
    engines).

    Returns (rnk, id, rel, mmr) — relevance and marginal score both
    rounded to 6 for engine-portable hashing.

    Guard: raises if ``pool`` exceeds 10k — the O(pool² · d) driver
    arithmetic is only "codebook-sized" while the rerank window stays a
    constant; a caller asking for a data-shaped pool needs a
    distributed diversifier, not this op.
    """
    _POOL_CAP = 10_000
    if pool > _POOL_CAP:
        raise ValueError(
            f"mmr_rerank(): pool={pool} exceeds {_POOL_CAP} — the greedy "
            "MMR stage is driver-side O(pool^2); keep the rerank window "
            "bounded or use a distributed diversifier"
        )
    q = np.asarray(query_vec, dtype="float64")
    cand = (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            cosine(
                F.col(vec_col), lits.array_double(query_vec)
            ).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(pool)
    )
    rows = cand.collect()
    ids = [r[0] for r in rows]
    V = np.asarray([list(r[1]) for r in rows], dtype="float64")
    rel = np.asarray([r[2] for r in rows], dtype="float64")
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T  # pool x pool cosine matrix

    selected: list[int] = []
    out: list[tuple[int, int, float, float]] = []
    remaining = set(range(len(ids)))
    for rank in range(1, min(k, len(ids)) + 1):
        if selected:
            penal = sims[:, selected].max(axis=1)
        else:
            penal = np.zeros(len(ids))
        mmr = lam * rel - (1.0 - lam) * penal
        best = max(remaining, key=lambda i: (mmr[i], -ids[i]))
        remaining.discard(best)
        selected.append(best)
        out.append(
            (rank, ids[best], round(float(rel[best]), 6), round(float(mmr[best]), 6))
        )
    return df.sparkSession.createDataFrame(
        out, f"rnk int, {id_col} long, rel double, mmr double"
    )


def jl_sign_matrix(d_in: int, d_out: int) -> list[list[int]]:
    """Deterministic +/-1 Johnson-Lindenstrauss sign matrix (d_out rows
    of d_in signs), derived from an LCG's high bit so both engines can
    embed the identical literals. Dense Rademacher JL: E[<Rx,Ry>] =
    <x,y> * d_out, distortion bounded by the JL lemma."""
    rows = []
    for j in range(d_out):
        row = []
        for i in range(d_in):
            v = (1103515245 * (j * d_in + i) + 12345) % (2**31)
            row.append(1 if (v >> 16) & 1 == 0 else -1)
        rows.append(row)
    return rows


def jl_project(
    df: DataFrame,
    d_in: int,
    d_out: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project ``vec_col`` (length d_in) to d_out dims via the literal
    Rademacher matrix — the preprocessing that makes 768-dim ANN
    affordable at corpus scale (shrinks every downstream distance,
    shuffle, and state by d_in/d_out).

    One array HOF dot product per output dim against a LITERAL sign row
    — d_out fused codegen expressions, map-only, no Python, no shuffle;
    at 100 TB this fuses into the scan projection like any other
    column expression. Scaling 1/sqrt(d_out) keeps expected norms.
    """
    R = jl_sign_matrix(d_in, d_out)
    scale = 1.0 / math.sqrt(d_out)
    v = F.col(vec_col).cast("array<double>")
    comps = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    lits.array_double(R[j]),
                    lambda x, r: x * r,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * scale
        ).alias(f"_p{j}")
        for j in range(d_out)
    ]
    return df.withColumn(out_col, F.array(*comps))


def sq8_stats(df: DataFrame, vec_col: str = "embedding") -> list[tuple[float, float]]:
    """Per-dimension (min, max) for int8 scalar quantization — one
    explode + dim-keyed aggregate; returns dim pairs of scalars (the
    centroid/codebook idiom: a model small enough to live as plan
    literals crosses the driver, data rows never do)."""
    mm = (
        df.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "v")
        )
        .groupBy("d")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("d")
        .collect()
    )
    return [(float(r.mn), float(r.mx)) for r in mm]


def sq8_topk(
    df: DataFrame,
    query_vec: list[float],
    stats: list[tuple[float, float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization ANN (FAISS SQ8 shape): each dimension
    quantizes to one of 256 uniform bins over its corpus [min, max] —
    4x memory cut vs float32, 8x vs float64 — and search scores the
    full-precision query against bin-CENTER reconstructions
    (asymmetric distance, like ADC). Quantize/reconstruct uses only
    floor/least on exact dyadic-scaled arithmetic, so the whole
    pipeline replays in SQL; constant dimensions (max == min)
    reconstruct to the constant.

    The scoring expression is dim-unrolled codegen (the PQ-encode
    idiom): one fused map expression per row, TakeOrderedAndProject
    top-k, zero shuffles. At 100 TB the quantized corpus is the thing
    you keep in cache; this demonstrates the scoring math against the
    same value-hash gate as the exact baseline."""
    # dim-unrolled scoring rendered as ONE SQL string (ops/lits.py
    # discipline): the per-dim Column loop cost ~10k py4j round-trips
    # (~1.6 s driver time); the SQL text parses JVM-side in ms with
    # bit-identical literals (D-suffixed reprs) and the same
    # left-associative term order.
    from hudi_utility_spark.ops.lits import _d

    terms = []
    for i, (mn, mx) in enumerate(stats):
        x = f"CAST(element_at(`{vec_col}`, {i + 1}) AS DOUBLE)"
        if mx > mn:
            qbin = (
                f"least(floor(({x} - {_d(mn)}) * {_d(256.0)}"
                f" / {_d(mx - mn)}), 255)"
            )
            recon = (
                f"({_d(mn)} + ({qbin} + {_d(0.5)}) * {_d((mx - mn) / 256.0)})"
            )
        else:
            recon = _d(mn)
        terms.append(f"({_d(float(query_vec[i]))} * {recon})")
    score = F.expr(" + ".join(terms))
    return (
        df.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def margin_pair_mining(
    a_df: DataFrame,
    b_df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ratio-margin cross-set pair mining (the CSLS / margin criterion
    of Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining"):
    the best B-side match per A-vector scored by

        margin(x, y) = cos(x, y) / ((r_B(x) + r_A(y)) / 2)

    with ``r_S(v)`` the mean of v's top-``k`` cosines into set S. The
    normalization is the point: raw cosine mines HUB vectors (points
    close to everything — density artifacts) as universal matches;
    dividing by both sides' local neighborhood density cancels hubness,
    which is why margin, not cosine, is the standard criterion for
    bitext mining and cross-lingual alignment.

    Shape: A is the (bounded) probe set, broadcast against a streamed
    B — the same eval-set contract as `hard_negatives`/`mmr_rerank`.
    Both density terms come from ONE scored relation: r_B is a
    per-anchor top-k mean (anchor-keyed window), r_A a per-candidate
    top-k mean over the |A| probes. All cosines and means are rounded
    to 6 before ranking so both engines rank identical doubles. At
    full-corpus scale, block B by IVF cell (`assign_cells`) first so
    the per-anchor candidate count is bounded — margin math is
    unchanged within blocks."""
    from pyspark.sql import Window

    a = a_df.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).cast("array<double>").alias("av"),
    )
    b = b_df.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).cast("array<double>").alias("bv"),
    )
    p = b.crossJoin(F.broadcast(a)).select(
        "a_id", "b_id", F.round(cosine(F.col("av"), F.col("bv")), 6).alias("c")
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("c"), F.asc("b_id"))
    ra = (
        p.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") <= k)
        .groupBy("a_id")
        .agg(F.round(F.avg("c"), 6).alias("ra"))
    )
    wb = Window.partitionBy("b_id").orderBy(F.desc("c"), F.asc("a_id"))
    rb = (
        p.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= k)
        .groupBy("b_id")
        .agg(F.round(F.avg("c"), 6).alias("rb"))
    )
    m = (
        p.join(F.broadcast(ra), "a_id")
        .join(rb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.col("c").alias("cos_sim"),
            F.round(
                F.col("c") / ((F.col("ra") + F.col("rb")) / 2.0), 6
            ).alias("margin"),
        )
    )
    wbest = Window.partitionBy("a_id").orderBy(F.desc("margin"), F.asc("b_id"))
    return (
        m.withColumn("_rn", F.row_number().over(wbest))
        .filter("_rn = 1")
        .drop("_rn")
    )


def multiprobe_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. 2007): instead of more hash
    tables, probe the query's own bucket PLUS every bucket at Hamming
    distance 1 — the (planes+1)-probe schedule that recovers most of
    the recall lost to sign-bit boundary flips at zero extra index
    cost. The probe test is branch-free integer algebra: a candidate
    is probed iff ``x = sketch XOR qsketch`` is 0 or a power of two
    (``x & (x-1) == 0``) — one fused predicate over the sketch column,
    pushable to a scan when sketches are materialized.

    The query sketch is computed driver-side with the SAME sequential
    fold order as the engine expression (`plane_component` is the
    shared derivation), so both engines probe identical buckets.
    Candidates rescore with exact cosine and TakeOrdered top-k — the
    standard coarse-probe / exact-rescore contract every ANN operator
    here follows. At 100 TB: sketches are a materialized 8-byte
    column; probing is a scan-filter, never a join."""
    qs = 0
    for p in range(planes):
        proj = 0.0
        for d in range(len(query_vec)):
            proj = proj + float(query_vec[d]) * plane_component(p, d)
        if proj >= 0:
            qs |= 1 << p
    sk = random_hyperplane_sketch(df, planes, id_col, vec_col)
    x = F.col("sketch").bitwiseXOR(F.lit(qs))
    cand = sk.filter(
        (x.bitwiseAND(x - 1) == 0) & (x < F.lit(1 << planes))
    ).select(id_col)
    qlit = lits.array_double(query_vec)
    raw = cosine(F.col(vec_col).cast("array<double>"), qlit)
    return (
        df.join(cand, id_col)
        .select(
            F.col(id_col),
            F.round(raw, 6).alias("score"),
            raw.alias("_raw"),
        )
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .drop("_raw")
    )


def covariance_long(
    df: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """Upper-triangle covariance sums as a LONG relation: one map-side
    HOF builds all dim·(dim+1)/2 (i, j, v_i·v_j) triples per row (a
    single generated expression — no 2000-column codegen), posexplode
    feeds a hash aggregate with map-side combine, and the result is a
    bounded (i, j, sum_prod, n) relation — the sufficient statistics of
    the covariance matrix from ONE scan. The same discipline as the
    OLS/PQ sufficient-statistics passes, generalized to matrix shape."""
    v = F.col(vec_col)
    triples = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(v, i + 1).cast("double")
                        * F.element_at(v, j + 1).cast("double")
                    ).alias("p"),
                ),
            ),
        )
    )
    return (
        df.select(F.explode(triples).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(
            F.sum("t.p").alias("sp"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def top_eigenvector(
    df: DataFrame,
    dim: int = 64,
    iters: int = 5,
    round_to: int = 6,
    vec_col: str = "embedding",
) -> tuple[list[float], float]:
    """Leading principal component by power iteration — PCA's top
    direction as pure dataflow + a driver-side fixed-point loop:
    the covariance's sufficient statistics come from ONE scan
    (:func:`covariance_long`), the dim×dim matrix (a codebook-sized
    driver literal) is quantized to ``round_to`` decimals, and each
    power step (matvec → L2-normalize → quantize components) is rounded
    so independent engines replaying the identical schedule stay
    bit-aligned — the `logistic_fit` cross-engine discipline applied to
    linear algebra. Deterministic all-ones start; ``iters`` fixed so an
    unrolled SQL oracle can replay every step. Returns (w, lambda)
    with lambda = wᵀCw."""
    import math

    rows = covariance_long(df, dim, vec_col).collect()
    n = rows[0]["n"]
    sums = {(r["i"], r["j"]): r["sp"] for r in rows}
    means_df = df.select(
        *[
            F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(
                f"m{i}"
            )
            for i in range(dim)
        ]
    ).collect()[0]
    mu = [means_df[f"m{i}"] for i in range(dim)]
    c = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            val = round(sums[(i, j)] / n - mu[i] * mu[j], round_to)
            c[i][j] = val
            c[j][i] = val
    w = [round(1.0 / math.sqrt(dim), round_to)] * dim
    for _ in range(iters):
        raw = [
            sum(c[i][j] * w[j] for j in range(dim)) for i in range(dim)
        ]
        nrm = math.sqrt(sum(x * x for x in raw))
        w = [round(x / nrm, round_to) for x in raw]
    lam = sum(
        w[i] * sum(c[i][j] * w[j] for j in range(dim)) for i in range(dim)
    )
    return w, round(lam, 4)
