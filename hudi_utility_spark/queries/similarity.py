"""Oracle-checked similarity-search queries over the embeddings table.

The query vector is embeddings[vec_id=0], referenced from the table itself
so Spark and DuckDB score the identical vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.ops import similarity as S
from hudi_utility_spark.queries import query
from hudi_utility_spark.tables import load_table


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    e = load_table(spark, sf_dir, "embeddings")
    return list(e.filter(F.col("vec_id") == 0).select("embedding").first()[0])


@query(
    "sim_bruteforce_topk",
    """
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
    FROM embeddings e,
         (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec 0 — the ANN correctness
    baseline (brute force, TakeOrdered top-k)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(e, _query_vec(spark, sf_dir), k=10)


@query(
    "sim_ivf_centroid_ranking",
    """
    WITH dims AS (
        SELECT label AS cell, d.i AS dim, AVG(d.v) AS mean_v
        FROM embeddings,
             LATERAL (SELECT unnest(embedding::DOUBLE[]) AS v,
                             generate_subscripts(embedding, 1) AS i) d
        GROUP BY label, d.i
    ),
    cents AS (
        SELECT cell, list(mean_v ORDER BY dim) AS centroid FROM dims GROUP BY cell
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT cell, ROUND(list_cosine_similarity(centroid, qv), 6) AS score
    FROM cents, q
    """,
)
def sim_ivf_centroid_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: per-cell centroids scored against the query —
    the cell-ranking step that prunes the search space."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = S.ivf_centroids(e)
    q = F.array(*[F.lit(x) for x in _query_vec(spark, sf_dir)])
    return cents.select(
        "cell", F.round(S.cosine(F.col("centroid"), q), 6).alias("score")
    )


@query("sim_ivf_topk")
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (probe 3 of 10 cells, exact within) — approximate by
    construction, so no SQL oracle; pytest checks recall ≥ 0.5 vs brute
    force and the driver records rows-only."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(e, _query_vec(spark, sf_dir), k=10, nprobe=3)


@query("sim_lsh_sketch_buckets")
def sim_lsh_sketch_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH sketch histogram (deterministic hash-derived
    planes; engine-specific hash → rows-only check)."""
    e = load_table(spark, sf_dir, "embeddings")
    sk = S.random_hyperplane_sketch(e, planes=16)
    return sk.groupBy("sketch").agg(F.count(F.lit(1)).alias("n_vecs"))


@query("cluster_kmeans_profile")
def cluster_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned coarse quantizer (rows-only: Lloyd's is iterative, not
    SQL-expressible — pytest pins exact parity with a NumPy reference in
    test_ops_cluster.py). 8 clusters, 3 iterations, deterministic init;
    per-cluster membership and inertia. Assignment is map-only (centroid
    literal evaluated in codegen); update is one shuffle of k×dim
    partial means per iteration."""
    from hudi_utility_spark.ops import cluster as cl

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cl.kmeans_cluster_profile(emb, k=8, iters=3)
