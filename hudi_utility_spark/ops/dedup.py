"""Deduplication operators (north star): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale design, per operator:

* **exact** — one hash aggregate on a 128-bit content fingerprint; at
  100 TB the only shuffled payload is (fingerprint, doc_id).
* **jaccard** — shingle-inverted-index self-join: explode distinct
  shingles, join on shingle, count common per pair. The candidate set is
  bounded by shared-shingle pairs, never the full n².
* **minhash LSH** — k hash functions → signature; band the signature;
  pairs only within equal band buckets. Candidate volume tunable via
  (bands, rows-per-band) exactly like the published LSH S-curve.
* **simhash** — 64-bit weighted-majority hash; near-dups share all but a
  few bits; bucket on rotated prefixes for Hamming-distance blocking.
* **embedding cosine** — delegated to ops/similarity (normalized dot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hudi_utility_spark.ops.text import fingerprint, word_set


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents: one row
    per duplicated fingerprint with group size and the kept (min-id) doc."""
    fp = fingerprint(df, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("group_size") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative per fingerprint (deterministic
    winner — the precombine-window idiom of write.latest_by_key)."""
    fp = fingerprint(df, text_col)
    w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fingerprint")
    )


# ---------------------------------------------------------------------------
# N-gram / unigram Jaccard near-dup
# ---------------------------------------------------------------------------

def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs; n=1 → distinct words, n>1 → word n-grams."""
    if n == 1:
        sh = word_set(F.col(text_col))
    else:
        words = F.split(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " "),
                    r"\s+",
                    " ",
                )
            ),
            " ",
        )
        idx = F.sequence(F.lit(0), F.size(words) - n)
        sh = F.array_distinct(
            F.transform(
                idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)])
            )
        )
    return df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by shingle-set Jaccard ≥ threshold.

    Inverted-index self-join: candidates are pairs sharing ≥1 shingle, so
    work scales with shared-shingle volume (bounded by posting-list sizes)
    rather than n². Hot shingles (stopword-like) are the skew risk at
    scale — cap posting lists or pre-filter by document frequency.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = _shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 2,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures.

    Each of the k hash functions is xxhash64 with a distinct seed column
    baked into the input; the signature is k per-group MINs — one hash
    aggregate over the exploded shingles, no UDFs. Signature width trades
    accuracy vs shuffle bytes exactly as in the MinHash literature.
    """
    sh = _shingles(df, id_col, text_col, shingle_n)
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"seed{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified by signature similarity.

    Pipeline: signature → split into `bands` bands of k/bands rows →
    hash each band → self-join on (band_idx, band_hash) → estimated
    Jaccard = fraction of equal signature positions ≥ threshold.
    At 100 TB: the band join shuffles only (band_hash, id) pairs, and the
    S-curve keeps candidate volume near the true-pair volume.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "sig", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
            )
        )
        / F.lit(num_hashes),
        6,
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """(id, simhash) — weighted-majority bit signature over word hashes.

    Per word w: h = xxhash64(w); bit i contributes +1 if set else -1;
    simhash bit i = majority sign. Expressed as explode → per-bit
    conditional sums → bit reassembly; one shuffle on id.
    """
    words = df.select(
        F.col(id_col).alias("id"), F.explode(word_set(F.col(text_col))).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    bit_sums = words.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        # shiftleft instead of a literal power of two: bit 63 overflows a
        # signed-long literal but wraps correctly under shift
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return bit_sums.select("id", sim.alias("simhash"))


def hamming_distance(col_a, col_b):
    """Population count of XOR — bit distance between two simhashes."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_distance.

    Blocking: 4 rotations of the 64-bit hash; two hashes within distance
    d ≤ 3 share at least one identical 16-bit prefix under some rotation
    (pigeonhole over 4 blocks) — so the self-join is on (rotation,
    prefix), never all-pairs.
    """
    sh = simhash(df, id_col, text_col)
    rots = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rot"),
                        F.shiftright(F.col("simhash"), r * prefix_bits)
                        .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                        .alias("prefix"),
                    )
                    for r in range(64 // prefix_bits)
                ]
            )
        ).alias("p"),
    ).select("id", "simhash", F.col("p.rot").alias("rot"), F.col("p.prefix").alias("prefix"))
    a, b = rots.alias("a"), rots.alias("b")
    return (
        a.join(
            b,
            (F.col("a.rot") == F.col("b.rot"))
            & (F.col("a.prefix") == F.col("b.prefix"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("distance"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("distance") <= max_distance)
    )
