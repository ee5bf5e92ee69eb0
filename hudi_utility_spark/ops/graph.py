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


def symmetrize(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Undirected → directed: emit each edge in both directions,
    deduplicated. Map-only union; the distinct is one shuffle the
    caller pays once before iterating.

    ``assume_canonical``: caller-declared invariant (the
    `full_in_coverage` idiom) — the input is already DISTINCT with
    ``src < dst`` on every row (e.g. a distinct over sorted-basket i<j
    pairs, or a self-join filtered on ``a < b``). Then the forward and
    reversed halves are each duplicate-free and mutually disjoint, so
    the union is distinct for free and the 2·|E|-row dedup exchange is
    skipped outright (guide §2.4: an `orderBy`/`distinct` that only
    re-proves an invariant is a shuffle to delete)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    out = fwd.unionByName(rev)
    return out if assume_canonical else out.distinct()


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_nodes: int = 2_000_000,
    checkpoint_every: int = 8,
    full_in_coverage: bool = False,
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

    Deep iteration: the unrolled plan grows linearly in ``iters``, and
    Catalyst analysis/optimization cost grows faster than linearly in
    plan depth — at iters ≳ 20 the DRIVER becomes the bottleneck before
    any executor does (the standard iterative-DataFrame trap). So every
    ``checkpoint_every`` rounds the rank vector is eagerly
    ``localCheckpoint``-ed: O(|V|) rows materialized to executor-local
    storage, lineage truncated, plan depth bounded by
    ``checkpoint_every`` regardless of total rounds. The default (8)
    never triggers for the oracle-replayable 3-5 round profile, so
    those plans stay pure; convergence runs at iters=25+ pay one
    bounded materialization per window. The last checkpoint's blocks
    back the returned plan — same cache-lifetime contract as the edge
    relations.
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
    for i in range(iters):
        if i == 0:
            # Round 1's rank vector is the constant 1.0 for every node,
            # and every src has out-degree >= 1 (function contract), so
            # the rank join is the identity and `rank*w == w` bitwise
            # (IEEE: 1.0*x = x): the first contribution aggregate needs
            # no join at all (guide §2.4).
            contrib = weighted.groupBy("dst").agg(
                F.sum(F.col("w")).alias("_in")
            )
        else:
            r = F.broadcast(ranks) if small else ranks
            contrib = (
                weighted.join(r, weighted.src == r.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("_in"))
            )
        if full_in_coverage:
            # caller guarantees every node has in-degree >= 1 (true for
            # any symmetrized graph), so the nodes left-join below is
            # row-for-row the identity and `_in` is never NULL: the next
            # rank vector is a map-only projection of the aggregate —
            # one broadcast + one join per round instead of two of each
            # (guide §2.4: remove shuffles/joins outright when an
            # invariant makes them no-ops). Values are unchanged:
            # coalesce(_in, 0) == _in when every node receives mass.
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.col("_in")
                ).alias("rank"),
            )
        else:
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
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_edges: int = 20_000_000,
    broadcast_max_nodes: int = 2_000_000,
    assume_canonical: bool = False,
    with_degrees: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph, via the
    degree-oriented wedge algorithm (Schank & Wagner / Cohen's
    MapReduce formulation): orient every edge from the endpoint that is
    SMALLER under the total order (degree, id) to the larger, form
    wedges only at each edge's low vertex, and close each wedge with
    one join — every triangle {a,b,c} with a ≺ b ≺ c is found exactly
    once as wedge (a→b, a→c) + edge (b→c).

    Why this scales where the naive 3-way self-join does not: wedge
    count under degree orientation is Σ outdeg(v)² = O(|E|^1.5) on any
    graph (out-degree is bounded by graph degeneracy — a hub of degree
    10^6 contributes NO wedges because nearly all its edges point INTO
    it), versus Σ deg(v)² unbounded for the unoriented join where that
    same hub contributes 10^12 wedges.

    Physical shape: the canonical pair relation is persisted (it feeds
    the degree aggregate and the orientation join). Wedges are
    generated MAP-SIDE from per-vertex neighbor arrays (one groupBy of
    |E| rows, then an i<j array explode — the same basket pattern as
    the co-purchase build) instead of a self-join, so the wedge
    relation is never shuffled on its own: when the edge list fits the
    broadcast gate (runtime count, default 20M edges ≈ a few hundred
    MB) the closure probe is a BROADCAST hash join the wedges stream
    through map-side; above the gate it falls back to a (b,c)-keyed
    shuffle join — the O(|E|^1.5) exchange the algorithm genuinely
    requires at that scale. The final per-node count is one partial
    aggregate. No global rank anywhere: the orientation compares
    (deg, id) tuples directly, so there is no single-partition window.

    Input: one row per undirected edge (either orientation, duplicates
    and self-loops tolerated — they are canonicalized and dropped).
    Returns (node, triangles) for every node with ≥ 1 triangle; with
    ``with_degrees=True``, (node, degree, triangles) for EVERY node
    (triangles = 0 when none), the relation clustering-coefficient
    consumers need — served from the degree aggregate this function
    already builds for orientation, stitched with a broadcast gated on
    the already-measured node count (callers previously re-derived the
    same degrees with their own symmetrize + aggregate and stitched
    with an unknown-stats sort-merge join).

    ``assume_canonical``: caller-declared invariant (the `symmetrize`
    idiom) — the input is already DISTINCT with ``src < dst`` and no
    self-loops on every row, so the canonicalizing
    least/greatest/filter/distinct pass (a full |E| exchange + dedup)
    is skipped outright.
    """
    if assume_canonical:
        pairs = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        # canonical undirected pair (u < v), self-loops out; persisted —
        # feeds the degree agg (two scans via the union) and the join
        u = F.least(F.col(src), F.col(dst)).alias("u")
        v = F.greatest(F.col(src), F.col(dst)).alias("v")
        pairs = (
            edges.select(u, v)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    n_edges = pairs.count()  # materializes the cache; broadcast gate
    # degree relation: persisted so the two orientation joins (u side,
    # v side) read ONE materialized aggregate instead of each embedding
    # their own union+aggregate subtree over the pair cache; its count
    # is the broadcast gate (runtime stats, not guesses — the same
    # dispatch as `pagerank`). When the graph's node set fits, both
    # orientation joins become map-side broadcast hash joins and the
    # full edge relation is never exchanged for them (guide §3.1; the
    # auto-planner saw unknown stats on the aggregate and picked
    # sort-merge, two full-edge exchanges).
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = deg.count()
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    if n_nodes <= broadcast_max_nodes:
        du, dv = F.broadcast(du), F.broadcast(dv)
    e = pairs.join(du, "u").join(dv, "v")
    # orient low → high under (deg, id); carry the head's order key so
    # wedge heads can be ordered without another degree lookup
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # map-side wedge generation: per-vertex out-neighbors sorted by the
    # orientation order (db, b), exploded as i<j pairs
    # the neighbor-array relation is tiny in BYTES (one row per low
    # vertex) but the wedge explode below fans each row out ~outdeg²/2
    # ways — compute-bound, so pin cluster-wide parallelism (AQE sizes
    # the exchange on bytes and would coalesce it to a few tasks)
    from hudi_utility_spark.ops import widen_for_compute

    # the (db, b) struct exists only to SORT by the orientation order;
    # project the array down to bare b's before the O(outdeg²) slice/
    # transform below, so the quadratic pass copies long arrays instead
    # of struct arrays (same b sequence — the projection preserves the
    # sorted order)
    nbrs = widen_for_compute(
        oriented.groupBy("a").agg(
            F.sort_array(F.collect_list(F.struct("db", "b"))).alias("ns0")
        )
    ).select("a", F.transform(F.col("ns0"), lambda x: x["b"]).alias("ns"))
    wedge_structs = F.flatten(
        F.transform(
            F.col("ns"),
            lambda x, i: F.transform(
                F.slice(F.col("ns"), i + F.lit(2), F.size(F.col("ns"))),
                lambda y: F.struct(x.alias("b"), y.alias("c")),
            ),
        )
    )
    wedges = nbrs.select(
        "a", F.explode(wedge_structs).alias("w")
    ).select("a", "w.b", "w.c")
    closure = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    if n_edges <= broadcast_max_edges:
        closure = F.broadcast(closure)
    tri = wedges.join(closure, ["b", "c"])
    counts = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    if not with_degrees:
        return counts
    # stitch onto the already-persisted degree relation: tri output is
    # ≤ n_nodes rows, so the broadcast rides the same measured gate
    if n_nodes <= broadcast_max_nodes:
        counts = F.broadcast(counts)
    return deg.select("node", F.col("deg").alias("degree")).join(
        counts, "node", "left"
    ).select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling, FIXED round count:
    each round drops nodes with degree < k and the edges touching them;
    the k-core is the fixpoint. A fixed ``rounds`` (like the fixed-
    iteration k-means / PageRank here) keeps the whole computation a
    finite dataflow an unrolled SQL oracle can replay — pytest asserts
    the last two rounds agree, so the cap is validated, not assumed
    (peeling converges in at most the graph's degeneracy-ordering
    depth; co-purchase graphs are shallow).

    Scale shape per round: one degree aggregate (map-side combinable)
    + two broadcast-measured semi-joins against the surviving-node
    relation; edges are ``localCheckpoint``-ed each round so lineage
    stays flat. Input must be symmetric (use :func:`symmetrize`).
    Returns the core's (node, degree) — degree WITHIN the core."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    for _ in range(rounds):
        keep = (
            e.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("s")
        )
        e = (
            e.join(keep, "s", "left_semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "left_semi")
            .select("s", "d")
            .localCheckpoint(eager=False)
        )
    return (
        e.groupBy("s")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("s").alias("node"), "degree")
    )


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    relation, fixed iteration count, mean-1 normalization: authority =
    normalized in-sum of hub scores, hub = normalized out-sum of
    authority scores, from an all-ones hub start. Mean-1 (score · n /
    Σscore) instead of sum-1 keeps values O(1), so round-6 ranking has
    ~9 orders of magnitude of headroom over distributed-sum ulp noise
    (the round-before-rank discipline).

    Scale: each half-iteration is one edge-keyed shuffle aggregate plus
    a broadcast of the (bounded) score vector back onto edges — the
    same power-iteration shape as :func:`pagerank`. The edge relation
    is persisted once (it feeds every half-iteration), and each
    half-iteration's pre-normalization aggregate is lazily
    localCheckpoint-ed so its two consumers (the mean-1 total and the
    normalized vector) read ONE materialization — the unrolled plan
    otherwise re-evaluates every earlier half-iteration inside both
    subtrees, doubling work per level of depth (guide §5: cut lineage
    when a relation fans out; the pagerank discipline). Returns
    (node, authority) for every dst node."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # h0 = 1 for every source: a1 = in-degree
    a = e.groupBy("d").agg(F.count(F.lit(1)).cast("double").alias("score"))

    def _norm(df_, key):
        df_ = df_.localCheckpoint(eager=False)
        tot = df_.agg(
            F.sum("score").alias("t"), F.count(F.lit(1)).cast("double").alias("n")
        )
        return df_.crossJoin(F.broadcast(tot)).select(
            key, (F.col("score") * F.col("n") / F.col("t")).alias("score")
        )

    a = _norm(a, "d")
    for _ in range(iters - 1):
        h = _norm(
            e.join(F.broadcast(a), "d").groupBy("s").agg(
                F.sum("score").alias("score")
            ),
            "s",
        )
        a = _norm(
            e.join(F.broadcast(h), "s").groupBy("d").agg(
                F.sum("score").alias("score")
            ),
            "d",
        )
    return a.select(F.col("d").alias("node"), F.col("score").alias("authority"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Bounded-hop single/multi-source BFS over a DIRECTED edge list:
    returns (node, dist) with the minimum hop distance from any seed,
    dist <= max_hops. ``seeds`` is a one-column DataFrame of node ids
    (dist 0).

    Physical shape: the edge relation is persisted once; each hop is
    ONE equijoin of the current frontier against it followed by an
    anti-join against the visited set — the visited/frontier relations
    are localCheckpoint'd each round to cut the growing lineage, the
    same fixed-round iterative discipline as :func:`pagerank` /
    :func:`kcore`. Frontier and visited are node-sized but
    checkpoint-backed (unknown stats), which pushed the planner to
    sort-merge: the cached edge relation was exchanged AND sorted every
    hop. Both now ride MEASURED broadcasts — the per-hop frontier count
    replaces the old `isEmpty` probe (same one cheap job over the eager
    checkpoint, but it doubles as the gate and the convergence test)
    and the visited count is the running sum of frontier counts, so the
    gate costs zero extra jobs (guide §3.1, the `pagerank` dispatch).
    Above the gate the hop join falls back to the edge-keyed shuffle,
    which at that frontier size is the right plan. Total work is
    O(max_hops * |E|) worst-case, independent of walk explosion
    (contrast the oracle's recursive-CTE twin whose UNION dedup bounds
    it the same way)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).persist()
    e.count()
    # distinct: duplicate seed ids would emit duplicate (node, 0) rows
    # (the anti-join only protects later hops) and multiply downstream
    # joins/aggregations (ADVICE r9 latent-API hazard)
    visited = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).alias("dist")
    ).distinct().localCheckpoint()
    n_visited = visited.count()
    frontier, n_frontier = visited, n_visited
    try:
        for hop in range(1, max_hops + 1):
            f = F.broadcast(frontier) if n_frontier <= broadcast_max_nodes else frontier
            vis = visited.select("node")
            if n_visited <= broadcast_max_nodes:
                vis = F.broadcast(vis)
            nxt = (
                f.join(e, f.node == e.s)
                .select(F.col("d").alias("node"))
                .distinct()
                .join(vis, "node", "left_anti")
                .select("node", F.lit(hop).alias("dist"))
                .localCheckpoint()
            )
            n_nxt = nxt.count()
            if n_nxt == 0:
                break
            visited = visited.union(nxt).localCheckpoint()
            n_visited += n_nxt
            frontier, n_frontier = nxt, n_nxt
        return visited
    finally:
        e.unpersist()
