"""URL canonicalization + domain rollups for web-scale corpus curation.

Web-crawl pipelines (CCNet / C4 / RefinedWeb style) dedup and filter by
canonical URL and registered domain before any content-level pass. The
reference has no web surface; these are pure column expressions —
whole-stage-codegen, zero Python, zero shuffles until the caller
aggregates — so canonicalization is free at 100 TB (it fuses into the
scan projection).

Canonical form implemented (the common-crawl convention):
  - scheme+host lowercased, leading ``www.`` stripped
  - default port (``:443`` for https) dropped
  - fragment dropped
  - trailing slash stripped from the path
  - tracking params (``utm_*``, ``ref``) removed; survivors sorted
    byte-wise so param order never splits a URL's identity
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Raw authority (host) of an https URL, ports excluded."""
    return F.regexp_extract(url, "^https://([^/:?#]+)", 1)


def canonical_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` label stripped."""
    return F.regexp_replace(F.lower(url_host(url)), "^www\\.", "")


def canonical_path(url: Column) -> Column:
    """Path with the trailing slash stripped (never touches '?','#')."""
    return F.regexp_replace(
        F.regexp_extract(url, "^https://[^/?#]+([^?#]*)", 1), "/+$", ""
    )


def canonical_query(url: Column) -> Column:
    """Query string minus tracking params, survivors sorted.

    Array HOFs (filter/sort/join) stay inside codegen — no UDF.
    """
    raw = F.regexp_extract(url, "\\?([^#]*)", 1)
    parts = F.filter(
        F.split(raw, "&"),
        lambda p: ~(
            p.startswith("utm_") | p.startswith("ref=") | (p == F.lit(""))
        ),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(url: Column) -> Column:
    """Full canonical form (see module docstring)."""
    q = canonical_query(url)
    return F.concat(
        F.lit("https://"),
        canonical_host(url),
        canonical_path(url),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """Last two labels of a host — the dedup/blocklist granularity.

    (A full public-suffix list is a broadcast join against the PSL
    table; the two-label rule is the dependency-free default.)
    """
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host down to the 2-label root, host first:
    ``static.cdn.src5.org`` → ``[static.cdn.src5.org, cdn.src5.org,
    src5.org]`` — the expansion that makes blocklist matching cover
    SUBDOMAINS (a list entry blocks itself and everything under it,
    public-suffix-list semantics) while staying a plain equi-join.

    The array is bounded by the host's label count (realistically ≤ ~6),
    so exploding it multiplies the relation by a small constant — the
    standard trade that turns "endswith any of N patterns" (an N-way
    scan per row, unjoinable) into hash-join work at 100 TB. Pure
    array HOFs, no Python."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
        ),
    ).otherwise(F.array(host))
