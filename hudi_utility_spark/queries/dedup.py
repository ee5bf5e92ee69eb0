"""Oracle-checked dedup queries over documents/embeddings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.ops import dedup as D
from hudi_utility_spark.queries import query
from hudi_utility_spark.tables import load_table

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@query(
    "dedup_exact_groups",
    f"""
    SELECT md5({_NORM_SQL}) AS fingerprint,
           COUNT(*) AS group_size,
           MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by normalized-content fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(d)


@query(
    "dedup_exact_survivors",
    f"""
    SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
            PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving doc ids after exact dedup (deterministic min-id winner)."""
    d = load_table(spark, sf_dir, "documents")
    return D.dedup_exact(d).select("doc_id")


@query(
    "dedup_jaccard_pairs",
    f"""
    WITH words AS (
        SELECT doc_id, unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS w
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM words GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(common / (sa.set_size + sb.set_size - common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE common / (sa.set_size + sb.set_size - common) >= 0.8
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by unigram Jaccard ≥ 0.8 (inverted-index self-join;
    the exact baseline the MinHash path approximates)."""
    d = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, n=1, threshold=0.8)


_PAIRS_09_SQL = f"""
    WITH RECURSIVE words AS (
        SELECT doc_id, unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS w
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM words GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE common / (sa.set_size + sb.set_size - common) >= 0.9
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    )
"""


@query(
    "dedup_near_groups",
    _PAIRS_09_SQL
    + """
    SELECT id, MIN(lbl) AS group_id FROM reach GROUP BY id
    """,
)
def dedup_near_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over Jaccard≥0.9 near-dup pairs: every paired
    doc labeled with the min id reachable through the pair graph
    (hash-to-min label propagation; the oracle is a recursive CTE
    computing the same transitive closure)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, n=1, threshold=0.9)
    return D.near_dup_groups(pairs)


@query(
    "dedup_near_survivors",
    _PAIRS_09_SQL
    + """
    SELECT d.doc_id FROM documents d
    LEFT JOIN (SELECT id, MIN(lbl) AS group_id FROM reach GROUP BY id) g
      ON g.id = d.doc_id
    WHERE g.id IS NULL OR g.group_id = d.doc_id
    """,
)
def dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup: documents surviving Jaccard≥0.9 cluster
    removal (min-id representative per component; unpaired docs kept)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, n=1, threshold=0.9)
    return D.dedup_survivors(d, pairs).select("doc_id")


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (banded signatures; xxhash64 is
    engine-specific so the driver records the rows-only check — pytest
    cross-validates candidates against exact Jaccard)."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, num_hashes=32, bands=8, shingle_n=2, threshold=0.5)


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 under rotation blocking);
    engine-specific hash → rows-only check + pytest validation."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(d, max_distance=3)


@query(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
               AS score
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < b.vec_id AND a.label = b.label
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs blocked by cluster label — the SemDeDup
    shape: cluster first, near-dup within cells. Production near-dup runs
    at ≥0.9; the synthetic embeddings are random (within-label max cosine
    ≈0.47), so the query uses 0.4 to exercise the operator on a non-empty
    answer (nearest boundary values are ±0.007 away — safe from float
    rounding flips in the oracle comparison)."""
    from hudi_utility_spark.ops.similarity import cosine_near_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return cosine_near_pairs(e, threshold=0.4, block_col="label")
