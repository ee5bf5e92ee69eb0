"""PageRank semantics: NumPy parity on a handcrafted graph, fixed
points, mass conservation, symmetrize dedup."""

from __future__ import annotations

import numpy as np

from hudi_utility_spark.ops.graph import pagerank, symmetrize


def _ranks(df) -> dict:
    return {r["node"]: r["rank"] for r in df.collect()}


def test_symmetric_regular_graph_is_fixed_point(spark):
    # 3-cycle, symmetrized: every node deg 2, rank stays exactly 1.0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = _ranks(pagerank(symmetrize(edges), iters=4))
    assert got == {1: 1.0, 2: 1.0, 3: 1.0}


def test_star_graph_matches_numpy_power_iteration(spark):
    # star: center 0 <-> leaves 1..4 (symmetrized)
    leaves = [1, 2, 3, 4]
    edges = spark.createDataFrame(
        [(0, v) for v in leaves], "src long, dst long"
    )
    got = _ranks(pagerank(symmetrize(edges), iters=3, damping=0.85))

    nodes = [0] + leaves
    deg = {0: 4, **{v: 1 for v in leaves}}
    out = {0: leaves, **{v: [0] for v in leaves}}
    r = {v: 1.0 for v in nodes}
    for _ in range(3):
        r = {
            v: 0.15 + 0.85 * sum(r[u] / deg[u] for u in nodes if v in out[u])
            for v in nodes
        }
    for v in nodes:
        assert np.isclose(got[v], r[v], rtol=1e-12), (v, got[v], r[v])
    # center of a star out-ranks the leaves
    assert got[0] > got[1]


def test_mass_conservation_on_symmetrized_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long"
    )
    sym = symmetrize(edges)
    n = sym.select("src").distinct().count()
    ranks = pagerank(sym, iters=5)
    total = sum(r["rank"] for r in ranks.collect())
    assert np.isclose(total, float(n), rtol=1e-9)


def test_symmetrize_dedups_both_directions(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2)], "src long, dst long"
    )
    assert symmetrize(edges).count() == 2


def test_symmetrize_assume_canonical_matches_default(spark):
    # canonical input: distinct rows, src < dst everywhere — the flag
    # must produce the exact same edge multiset (as a set: no dups)
    # while skipping the dedup exchange
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "src long, dst long"
    )
    got = sorted(
        (r.src, r.dst)
        for r in symmetrize(edges, assume_canonical=True).collect()
    )
    want = sorted((r.src, r.dst) for r in symmetrize(edges).collect())
    assert got == want
    # and no duplicates were emitted
    assert len(got) == len(set(got)) == 8
    # the fast path's plan has no aggregate (the distinct is gone)
    plan = symmetrize(edges, assume_canonical=True)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan


def test_triangle_counts_known_graph(spark):
    from hudi_utility_spark.ops.graph import triangle_counts

    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) + pendant 5-1
    # + an isolated edge 6-7; edges fed unordered/with dup/self-loop
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 2), (2, 4), (4, 3),
         (5, 1), (1, 5), (6, 7), (2, 2)],
        "src long, dst long",
    )
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_canonical_and_degrees_match_default(spark):
    from hudi_utility_spark.ops.graph import triangle_counts

    # K4 + pendant 5-1 + isolated edge 6-7, ALREADY canonical (distinct,
    # src < dst, no self-loops): the fast path must agree with the
    # canonicalizing default, and with_degrees must report the plain
    # undirected degree with triangles zero-filled for every node
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (6, 7)],
        "src long, dst long",
    )
    base = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    fast = {
        r.node: r.triangles
        for r in triangle_counts(edges, assume_canonical=True).collect()
    }
    assert fast == base == {1: 3, 2: 3, 3: 3, 4: 3}
    wd = {
        r.node: (r.degree, r.triangles)
        for r in triangle_counts(
            edges, assume_canonical=True, with_degrees=True
        ).collect()
    }
    assert wd == {
        1: (4, 3), 2: (3, 3), 3: (3, 3), 4: (3, 3),
        5: (1, 0), 6: (1, 0), 7: (1, 0),
    }


def test_triangle_counts_matches_bruteforce(spark):
    from itertools import combinations

    from hudi_utility_spark.ops.graph import triangle_counts

    # deterministic pseudo-random graph on 40 nodes
    import hashlib

    def h(i, j):
        return int(hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:8], 16)

    edges = [(i, j) for i, j in combinations(range(40), 2) if h(i, j) % 5 == 0]
    adj = {i: set() for i in range(40)}
    for i, j in edges:
        adj[i].add(j)
        adj[j].add(i)
    want: dict[int, int] = {}
    for a, b, c in combinations(range(40), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == want


def test_deep_iteration_bounded_plan_with_checkpoint(spark):
    """iters=25 must not blow plan depth: with the localCheckpoint gate
    (every 8 rounds) the optimized-plan text stays bounded near the
    iters=8 size instead of growing ~linearly to 25 unrolled rounds —
    and the ranks still match an ungated deep run value-for-value."""
    from hudi_utility_spark.ops.graph import pagerank, symmetrize

    edges = symmetrize(
        spark.createDataFrame(
            [(i, (i * 7 + 3) % 23) for i in range(23) if i != (i * 7 + 3) % 23],
            ["src", "dst"],
        )
    )
    deep = pagerank(edges, iters=25, checkpoint_every=8)
    plan_len = len(deep._jdf.queryExecution().optimizedPlan().toString())
    shallow = pagerank(edges, iters=8, checkpoint_every=0)
    shallow_len = len(shallow._jdf.queryExecution().optimizedPlan().toString())
    # 25 rounds with a gate ≈ the last (25 mod 8) unrolled rounds + a
    # checkpoint scan; must stay well under 2× the 8-round plan rather
    # than the ~3× a fully unrolled 25-round plan would be
    assert plan_len < 2 * shallow_len
    ungated = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=25, checkpoint_every=0).collect()
    }
    gated = {r["node"]: r["rank"] for r in deep.collect()}
    assert gated.keys() == ungated.keys()
    for n in gated:
        assert abs(gated[n] - ungated[n]) < 1e-12


def test_kcore_converges_and_is_a_core(spark):
    """Peeling must reach its fixpoint inside the fixed round budget
    (rounds N and N-1 agree) and every surviving node must have degree
    >= k WITHIN the core — the definition, checked directly."""
    from hudi_utility_spark.ops.graph import kcore, symmetrize

    # two triangles sharing a node + a pendant chain: 3-core is empty,
    # 2-core is exactly the two triangles
    tri = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (5, 6), (6, 7)]
    edges = symmetrize(spark.createDataFrame(tri, ["src", "dst"]))
    core2 = {r["node"]: r["degree"] for r in kcore(edges, k=2, rounds=4).collect()}
    assert set(core2) == {1, 2, 3, 4, 5}
    assert all(d >= 2 for d in core2.values())
    assert kcore(edges, k=3, rounds=4).count() == 0
    # convergence: one extra round changes nothing
    a = sorted(map(tuple, kcore(edges, k=2, rounds=3).collect()))
    b = sorted(map(tuple, kcore(edges, k=2, rounds=4).collect()))
    assert a == b


def test_kcore_registered_rounds_converged(spark, sf_dir):
    """The registered 6-round unroll must be a fixpoint on the real
    co-purchase graph — guards the fixed cap against data growth."""
    import __spark_entry__ as entrymod
    from hudi_utility_spark.ops.graph import kcore
    from hudi_utility_spark.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    co = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    edges = co.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(co.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    r5 = sorted(map(tuple, kcore(edges, k=3, rounds=5).collect()))
    r6 = sorted(map(tuple, kcore(edges, k=3, rounds=6).collect()))
    assert r5 == r6


def test_hits_bipartite_sanity(spark):
    """On a star bipartite graph the hub-pointed authority must rank
    first; mean-1 normalization keeps the score average at 1."""
    from hudi_utility_spark.ops.graph import hits

    # customers 1..4 all buy part 10; customer 1 also buys 11, 12
    e = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10), (1, 11), (1, 12)],
        ["src", "dst"],
    )
    out = {r["node"]: r["authority"] for r in hits(e, iters=2).collect()}
    assert max(out, key=out.get) == 10
    assert abs(sum(out.values()) / len(out) - 1.0) < 1e-9
