"""Graph analytics over edge DataFrames: fixed-iteration PageRank.

Near-dup grouping already ships label propagation / connected
components (`ops/dedup.py::near_dup_groups`); PageRank is the other
workhorse graph primitive for corpus curation — rank pages/documents by
link centrality before sampling (the original web-scale use), or rank
products by co-purchase centrality. No GraphX/GraphFrames dependency:
the power iteration is a plain join + aggregate per round, which is
exactly how Pregel executes it anyway (message passing = shuffle keyed
by destination).

Scale: the edge relation (with pre-divided contribution weights) is
persisted once and reused every round, so each iteration costs one
shuffle join (ranks ⋈ edges on src, ~|E| rows) plus one hash aggregate
keyed by dst — no all-pairs anything, per-round shuffle volume O(|E|).
Rank state is O(|V|), distributed. Iteration count is fixed by the
caller (power iteration converges geometrically at the damping rate;
3-5 rounds rank-order large graphs well), keeping the whole computation
oracle-replayable as unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.storagelevel import StorageLevel


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected → directed: emit each edge in both directions,
    deduplicated. Map-only union; the distinct is one shuffle the
    caller pays once before iterating."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list. Every node
    must have out-degree ≥ 1 (symmetrize undirected graphs first — that
    also removes dangling nodes by construction). Initial rank 1.0 per
    node; per round ``rank'(v) = (1-d) + d * Σ_{u→v} rank(u)/deg(u)``
    (the non-normalized "mass" formulation, total mass |V| at every
    round). Returns (node, rank).

    Physical shape: the raw edge relation is persisted first so the
    (possibly expensive) upstream plan that produced it — e.g. a
    co-occurrence self-join — executes exactly once; the degree
    relation and the ``1/deg(u)``-pre-weighted edge relation are
    derived from that cache and persisted themselves. When the graph
    has at most ``broadcast_max_nodes`` vertices (counted from the
    degree relation, a decision made on runtime stats, not guesses),
    each round joins the cached edges against a BROADCAST of the rank
    vector — map-only — and the only shuffle per round is the dst-keyed
    aggregate, whose partial (map-side) combine caps shuffle volume at
    |V| rows per task. Above the threshold the rank join falls back to
    a src-keyed shuffle join. The persisted relations back the returned
    lazy plan, so clear the cache only after materializing the result
    (same contract as `jaccard_pairs`' shingle relation).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("_deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = deg.count()  # materializes deg (and e); also the broadcast gate
    weighted = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = deg.select(F.col("src").alias("node"))
    small = n_nodes <= broadcast_max_nodes
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        r = F.broadcast(ranks) if small else ranks
        contrib = (
            weighted.join(r, weighted.src == r.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("_in"))
        )
        c = F.broadcast(contrib) if small else contrib
        ranks = (
            nodes.join(c, nodes.node == c.dst, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
