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
