"""k-means parity: the distributed Lloyd's loop must match a NumPy
reference implementation exactly (same deterministic init, same
tie-breaking), and assignment must be a map-only plan."""

from __future__ import annotations

import numpy as np
import pytest

from hudi_utility_spark.ops import cluster
from hudi_utility_spark.tables import load_table

K, ITERS = 8, 3


def _numpy_kmeans(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    cents = vecs[:k].astype(np.float64).copy()
    for _ in range(iters):
        # pairwise squared L2; argmin breaks ties toward lower cid
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for c in range(k):
            m = vecs[lab == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_kmeans_matches_numpy_reference(spark, emb):
    rows = emb.orderBy("vec_id").collect()
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)

    got = np.array(cluster.kmeans_fit(emb, K, iters=ITERS))
    want = _numpy_kmeans(vecs, K, ITERS)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_assignment_is_map_only(spark, emb):
    cents = [[0.0] * 64, [1.0] * 64]
    plan = cluster.assign_clusters(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle, no join: pure projection


def test_cluster_profile_partitions_all_vectors(spark, emb):
    prof = cluster.kmeans_cluster_profile(emb, K, iters=ITERS)
    rows = prof.collect()
    assert sum(r.n_members for r in rows) == emb.count()
    assert all(r.mean_sq_dist >= 0 for r in rows)
    assert len(rows) <= K


def test_pq_codes_and_adc_respect_cluster_structure(spark):
    from hudi_utility_spark.ops.similarity import pq_adc_topk, pq_codes, pq_fit

    # two well-separated clusters in 8-dim space: ids 0-4 near +1, 5-9 near -1
    rows = []
    for i in range(10):
        base = 1.0 if i < 5 else -1.0
        rows.append((i, [base + 0.01 * ((i * 7 + d) % 5) for d in range(8)]))
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")

    books = pq_fit(df, m=2, k=2, iters=2)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    coded = pq_codes(df, books).collect()
    # codes are valid ids and identical within each true cluster
    for r in coded:
        assert 0 <= r.code_0 < 2 and 0 <= r.code_1 < 2
    c0 = {r.vec_id: (r.code_0, r.code_1) for r in coded}
    assert len({c0[i] for i in range(5)}) == 1
    assert len({c0[i] for i in range(5, 10)}) == 1
    assert c0[0] != c0[9]

    # ADC for a +1-side query ranks the whole +1 cluster first
    q = [1.0] * 8
    top = [r.vec_id for r in pq_adc_topk(df, books, q, topk=5).collect()]
    assert set(top) == {0, 1, 2, 3, 4}

    # determinism: refit gives identical codebooks
    assert pq_fit(df, m=2, k=2, iters=2) == books


def test_pq_encode_and_adc_plans_are_map_only(spark, sf_dir):
    """PQ encoding and the ADC scan must be map-only (zero exchanges) —
    codebooks and distance tables are plan literals, so the only stage
    boundary in ADC top-k is the TakeOrdered merge. (The argmin HOF
    evaluates as an interpreted projection, not inside WholeStageCodegen
    — Spark executes lambda expressions interpreted — but it is still a
    single narrow stage.)"""
    from hudi_utility_spark.ops.similarity import pq_adc_topk, pq_codes, pq_fit
    from hudi_utility_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = pq_fit(emb, m=2, k=4, iters=1)
    enc_plan = pq_codes(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan

    q = list(emb.filter("vec_id = 0").first()[1])
    adc_plan = (
        pq_adc_topk(emb, books, q, topk=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in adc_plan
    assert "TakeOrderedAndProject" in adc_plan


def test_group_linear_fit_matches_numpy_and_handles_degenerates(spark):
    import numpy as np

    from hudi_utility_spark.ops.mlfit import group_linear_fit

    rows = []
    rng = [(i, float(i) * 2.0 + 3.0 + (0.1 if i % 2 else -0.1)) for i in range(20)]
    rows += [("lin", float(x), y) for x, y in rng]   # near-perfect line
    rows += [("one", 1.0, 5.0)]                       # n < 2 -> nulls
    rows += [("flat", 2.0, 7.0), ("flat", 2.0, 9.0)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["group"]: r for r in group_linear_fit(df, "g", "x", "y").collect()}

    x = np.array([x for x, _ in rng]); y = np.array([y for _, y in rng])
    slope, intercept = np.polyfit(x, y, 1)
    assert got["lin"]["n"] == 20
    assert abs(got["lin"]["slope"] - slope) < 1e-9
    assert abs(got["lin"]["intercept"] - intercept) < 1e-9
    assert got["lin"]["r2"] > 0.99
    assert got["one"]["slope"] is None and got["one"]["n"] == 1
    assert got["flat"]["slope"] is None  # sxx == 0 guarded


def test_trimmed_mean_agg_matches_numpy_reference(spark):
    import numpy as np

    from hudi_utility_spark.ops.mlfit import trimmed_mean_agg

    rows = [("g", float(v)) for v in [1, 2, 3, 4, 100]] + [
        ("h", 5.0),
        ("h", None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["n"], r["trimmed_mean"])
        for r in trimmed_mean_agg(df, "g", "v", trim=0.2).collect()
    }
    # g: n=5, k=1 -> mean(2,3,4) = 3.0 (the 100 outlier is cut)
    assert got["g"] == (5, 3.0)
    # h: one non-null value, k=0 -> mean([5]) = 5
    assert got["h"] == (1, 5.0)
    assert np.isclose(got["g"][1], 3.0)


def test_tree_ensemble_null_falls_right_and_sums(spark):
    from hudi_utility_spark.ops.mlfit import ensemble_score

    tree = {
        "feature": "x",
        "threshold": 5.0,
        "left": {"leaf": 1.0},
        "right": {"leaf": 2.0},
    }
    df = spark.createDataFrame(
        [(1, 3.0), (2, 7.0), (3, None)], "id long, x double"
    )
    got = {
        r["id"]: r["score"]
        for r in ensemble_score(df, [tree, tree]).collect()
    }
    assert got == {1: 2.0, 2: 4.0, 3: 4.0}  # NULL routes right, trees sum


def test_kmeans_parallel_init_separates_clusters(spark):
    from hudi_utility_spark.ops.cluster import kmeans_parallel_init

    # three tight, well-separated clusters of 20 points each
    pts = []
    for g, base in enumerate([0.0, 10.0, 20.0]):
        for i in range(20):
            pts.append((g * 20 + i, [base + 0.01 * i, base - 0.01 * i]))
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    centers, diag = kmeans_parallel_init(df, k=3, rounds=3, l=6)
    assert len(centers) == 3
    # one chosen center per true cluster: bucket by nearest base
    buckets = {min((0.0, 10.0, 20.0), key=lambda b: abs(c[0] - b)) for c in centers}
    assert buckets == {0.0, 10.0, 20.0}
    # diagnostics: round 0 is the seed; potential never increases as
    # candidates accumulate
    assert diag[0] == (0, 1, 1, 0.0)
    phis = [d[3] for d in diag[1:]]
    assert all(a >= b for a, b in zip(phis, phis[1:]))
    # determinism
    centers2, diag2 = kmeans_parallel_init(df, k=3, rounds=3, l=6)
    assert centers2 == centers and diag2 == diag


def test_ols2_normal_equations_numpy_parity(spark):
    import numpy as np

    from hudi_utility_spark.ops.mlfit import ols2_normal_equations

    rng = [(i, float(i % 13), float((i * 7) % 5)) for i in range(200)]
    # y = 3 + 2*x1 - 4*x2 + deterministic "noise"
    rows = [
        (x1, x2, 3.0 + 2.0 * x1 - 4.0 * x2 + ((i * 31) % 7 - 3) * 0.01)
        for i, x1, x2 in rng
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    got = ols2_normal_equations(df, "y", "x1", "x2").collect()[0]
    X = np.array([[1.0, x1, x2] for x1, x2, _ in rows])
    yv = np.array([y for _, _, y in rows])
    beta = np.linalg.lstsq(X, yv, rcond=None)[0]
    assert got.n == 200
    assert abs(got.b0 - beta[0]) < 1e-4
    assert abs(got.b1 - beta[1]) < 1e-4
    assert abs(got.b2 - beta[2]) < 1e-4
    assert got.r2 > 0.999  # near-exact linear signal
