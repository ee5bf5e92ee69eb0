"""Oracle-checked web/URL curation queries (ops/web.py).

The documents table carries no URL column, so each query synthesizes a
deterministic, deliberately-messy URL per document from (doc_id, source,
lang) — mixed-case hosts, www/cdn subdomains, default ports, tracking
params, fragments, trailing slashes — identically on both engines, and
the canonicalizer has to normalize the mess away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.ops import web
from hudi_utility_spark.queries import query
from hudi_utility_spark.tables import load_table

_URL_SQL = """
        'https://'
        || CASE doc_id % 3 WHEN 0 THEN 'WWW.' WHEN 1 THEN '' ELSE 'cdn.' END
        || source || '.OrG'
        || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
        || '/' || lang || '/article/' || doc_id
        || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
        || CASE doc_id % 5
             WHEN 0 THEN '?utm_source=feed&ref=' || source || '&page=2'
             WHEN 1 THEN '?page=2&utm_campaign=x'
             ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END
"""

_CANON_SQL = """
        'https://'
        || regexp_replace(lower(regexp_extract(url, '^https://([^/:?#]+)', 1)),
                          '^www\\.', '')
        || regexp_replace(regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1),
                          '/+$', '')
        || CASE WHEN array_to_string(list_sort(list_filter(
                     string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                     x -> NOT (starts_with(x, 'utm_')
                               OR starts_with(x, 'ref=') OR x = ''))), '&') <> ''
                THEN '?' || array_to_string(list_sort(list_filter(
                     string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                     x -> NOT (starts_with(x, 'utm_')
                               OR starts_with(x, 'ref=') OR x = ''))), '&')
                ELSE '' END
"""

_DOMAIN_SQL = """
        regexp_extract(regexp_replace(
            lower(regexp_extract(url, '^https://([^/:?#]+)', 1)),
            '^www\\.', ''), '([^.]+\\.[^.]+)$', 1)
"""


def _url_col() -> Column:
    """Spark twin of _URL_SQL (pure codegen expressions)."""
    did = F.col("doc_id")
    return F.concat(
        F.lit("https://"),
        F.when(did % 3 == 0, F.lit("WWW."))
        .when(did % 3 == 1, F.lit(""))
        .otherwise(F.lit("cdn.")),
        F.col("source"),
        F.lit(".OrG"),
        F.when(did % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/article/"),
        did.cast("string"),
        F.when(did % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit("?utm_source=feed&ref="), F.col("source"), F.lit("&page=2")
            ),
        )
        .when(did % 5 == 1, F.lit("?page=2&utm_campaign=x"))
        .otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )


def _docs_with_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").withColumn("url", _url_col())


@query(
    "web_url_canonicalize",
    f"""
    WITH d AS (SELECT doc_id, ({_URL_SQL}) AS url FROM documents)
    SELECT doc_id, url, ({_CANON_SQL}) AS canonical_url
    FROM d ORDER BY doc_id LIMIT 100
    """,
)
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw vs canonical URL, first 100 docs — every normalization rule
    (case, www, :443, utm/ref strip + param sort, fragment, trailing
    slash) visible and value-checked. Map-only; fuses into the scan."""
    d = _docs_with_url(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            "url",
            web.canonical_url(F.col("url")).alias("canonical_url"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "web_domain_stats",
    f"""
    WITH d AS (SELECT doc_id, n_chars, ({_URL_SQL}) AS url FROM documents),
    c AS (SELECT doc_id, n_chars, ({_DOMAIN_SQL}) AS domain,
                 ({_CANON_SQL}) AS canonical_url FROM d)
    SELECT domain,
           COUNT(*) AS docs,
           COUNT(DISTINCT canonical_url) AS distinct_urls,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM c GROUP BY domain
    """,
)
def web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus profile — the aggregate behind
    domain-level quality decisions (a crawl pipeline's first rollup).
    One keyed aggregate with map-side partials; the canonical-URL
    distinct is the per-domain dedup cardinality."""
    d = _docs_with_url(spark, sf_dir)
    return (
        d.select(
            web.registered_domain(web.canonical_host(F.col("url"))).alias(
                "domain"
            ),
            web.canonical_url(F.col("url")).alias("canonical_url"),
            "n_chars",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("canonical_url").alias("distinct_urls"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


_BLOCKED = ["src0.org", "src7.org", "src13.org"]


@query(
    "web_blocklist_filter",
    f"""
    WITH d AS (SELECT doc_id, lang, ({_URL_SQL}) AS url FROM documents),
    c AS (SELECT doc_id, lang, ({_DOMAIN_SQL}) AS domain FROM d)
    SELECT lang,
           COUNT(*) AS docs,
           COUNT(DISTINCT domain) AS domains
    FROM c
    WHERE domain NOT IN ('src0.org', 'src7.org', 'src13.org')
    GROUP BY lang
    """,
)
def web_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist as a BROADCAST left-anti join (the list is a
    table, not a literal: real blocklists are millions of rows — the
    broadcast/anti-join shape survives that; an isin literal would
    not). Survivor counts per language."""
    d = _docs_with_url(spark, sf_dir)
    block = F.broadcast(
        d.sparkSession.createDataFrame(
            [(b,) for b in _BLOCKED], "domain string"
        )
    )
    survivors = (
        d.select(
            "lang",
            web.registered_domain(web.canonical_host(F.col("url"))).alias(
                "domain"
            ),
        )
        .join(block, "domain", "left_anti")
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("domain").alias("domains"),
    )


_URL2_SQL = """
        'https://'
        || CASE doc_id % 3 WHEN 0 THEN 'WWW.' WHEN 1 THEN '' ELSE '' END
        || 'src' || CAST((doc_id % 250) % 20 AS VARCHAR) || '.OrG'
        || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
        || '/article/' || CAST(doc_id % 250 AS VARCHAR)
        || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
        || CASE doc_id % 5
             WHEN 0 THEN '?utm_source=feed&page=2'
             WHEN 1 THEN '?page=2&utm_campaign=x'
             WHEN 2 THEN '?page=2'
             ELSE '' END
"""


def _url2_col() -> Column:
    """Spark twin of _URL2_SQL: article identity is doc_id % 250, so
    re-crawl pairs (i, i+250) share a canonical URL through DIFFERENT
    raw variants (www/port/tracking-param mess keyed by doc_id)."""
    did = F.col("doc_id")
    art = did % 250
    return F.concat(
        F.lit("https://"),
        F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("src"),
        (art % 20).cast("string"),
        F.lit(".OrG"),
        F.when(did % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/article/"),
        art.cast("string"),
        F.when(did % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("?utm_source=feed&page=2"))
        .when(did % 5 == 1, F.lit("?page=2&utm_campaign=x"))
        .when(did % 5 == 2, F.lit("?page=2"))
        .otherwise(F.lit("")),
    )


@query(
    "web_canonical_dup_groups",
    f"""
    WITH d AS (SELECT doc_id, ({_URL2_SQL}) AS url FROM documents),
    c AS (SELECT doc_id, ({_CANON_SQL}) AS canonical_url FROM d)
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM c GROUP BY canonical_url HAVING COUNT(*) > 1
    """,
)
def web_canonical_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-crawl detection by canonical-URL identity: raw URLs that
    differ in case, www, default port, trailing slash, or tracking
    params collapse to one canonical key — one hash aggregate, the
    cheapest dedup pass a crawl pipeline runs (before any content
    hashing). Query params that survive canonicalization (page=2)
    correctly keep pages distinct."""
    d = load_table(spark, sf_dir, "documents").withColumn("url", _url2_col())
    c = d.select("doc_id", web.canonical_url(F.col("url")).alias("canonical_url"))
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


_SUB_HOST_SQL = """
        (CASE doc_id % 3 WHEN 0 THEN 'm.' WHEN 1 THEN 'static.cdn.' ELSE '' END)
        || 'src' || CAST(doc_id % 20 AS VARCHAR) || '.org'
"""


@query(
    "web_blocklist_subdomains",
    f"""
    WITH d AS (
      SELECT doc_id, lang, ({_SUB_HOST_SQL}) AS host FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(
                 list_transform(
                     range(0, len(string_split(host, '.')) - 1),
                     i -> array_to_string(
                         list_slice(string_split(host, '.'), i + 1,
                                    len(string_split(host, '.'))), '.')),
                 x -> list_contains(
                     ['src3.org', 'src11.org', 'cdn.src5.org'], x))) > 0
                 AS blocked
      FROM d
    )
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
               AS blocked_docs
    FROM s GROUP BY lang
    """,
)
def web_blocklist_subdomains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subdomain-aware blocklist (public-suffix semantics): a list
    entry blocks itself AND everything under it — `cdn.src5.org` must
    catch `static.cdn.src5.org` while leaving bare `src5.org` alone.
    The host explodes into its dot-suffixes (`ops/web.py
    host_suffixes`, bounded by label count), suffixes equi-join the
    BROADCAST blocklist, and matched doc ids distinct back onto the
    corpus — the shape that stays hash-join work when the blocklist is
    millions of rows, where a per-row endswith-any scan would not.
    Per-language totals + blocked counts are the value-hashed readout
    (the deterministic subdomain synthesis guarantees all three match
    modes occur: exact root, exact subdomain entry, deeper subdomain
    of an entry)."""
    d = load_table(spark, sf_dir, "documents")
    host = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("m."))
        .when(F.col("doc_id") % 3 == 1, F.lit("static.cdn."))
        .otherwise(F.lit("")),
        F.lit("src"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".org"),
    )
    base = d.select("doc_id", "lang", host.alias("host"))
    block = F.broadcast(
        spark.createDataFrame(
            [("src3.org",), ("src11.org",), ("cdn.src5.org",)],
            "suf string",
        )
    )
    exploded = base.select(
        "doc_id", F.explode(web.host_suffixes(F.col("host"))).alias("suf")
    )
    blocked_ids = (
        exploded.join(block, "suf").select("doc_id").distinct()
        .withColumn("blocked", F.lit(1))
    )
    return (
        base.join(blocked_ids, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("blocked").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("blocked_docs"),
        )
    )
