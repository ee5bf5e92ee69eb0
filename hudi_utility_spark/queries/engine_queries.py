"""Engine-capability queries: the reference's validation/reconciliation
surface (SURVEY §2.11) expressed as read-only oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.queries import query
from hudi_utility_spark.tables import load_table


@query(
    "v4_partition_audit",
    """
    WITH s AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part_month,
                      COUNT(*) AS src_cnt
               FROM orders GROUP BY 1),
         d AS (SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS part_month,
                      COUNT(*) AS dst_cnt
               FROM lineitem GROUP BY 1)
    SELECT COALESCE(s.part_month, d.part_month) AS part_month,
           COALESCE(src_cnt, 0) AS src_cnt,
           COALESCE(dst_cnt, 0) AS dst_cnt,
           CASE WHEN d.part_month IS NULL THEN 'missing'
                WHEN s.part_month IS NULL THEN 'unexpected'
                WHEN src_cnt <> dst_cnt THEN 'incomplete'
                ELSE 'complete' END AS status
    FROM s FULL OUTER JOIN d USING (part_month)
    """,
)
def v4_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: V4 partition-completeness audit (J1+J2 in one plan).

    The reference runs one filter+count Spark job per partition per side
    (pyspark_script.py:199-253); this is two map-side-partial aggregates
    and one tiny full-outer join, total O(1) jobs at any scale. Status
    labels mirror the reference's missing/incomplete vocabulary.
    """
    src = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("part_month")
        )
        .agg(F.count(F.lit(1)).alias("src_cnt"))
    )
    dst = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.to_date(F.date_trunc("month", F.col("l_shipdate"))).alias("part_month")
        )
        .agg(F.count(F.lit(1)).alias("dst_cnt"))
    )
    return (
        src.join(dst, "part_month", "full_outer")
        .select(
            "part_month",
            F.coalesce("src_cnt", F.lit(0)).alias("src_cnt"),
            F.coalesce("dst_cnt", F.lit(0)).alias("dst_cnt"),
            F.when(F.col("dst_cnt").isNull(), "missing")
            .when(F.col("src_cnt").isNull(), "unexpected")
            .when(F.col("src_cnt") != F.col("dst_cnt"), "incomplete")
            .otherwise("complete")
            .alias("status"),
        )
    )


def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct profiling (HyperLogLog++) — the scale path
    for distinct-value discovery (A3) on 100 TB inputs. Deliberately NOT
    a registered query: the engine-private HLL++ sketch can't be
    oracle-checked; the registered, value-hash-checked twin is
    `approx_distinct_portable` (queries/quality_q.py). Covered by pytest
    (tests/test_engine_queries.py) instead.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "percentile_profile",
    """
    SELECT o_orderstatus,
           ROUND(MEDIAN(o_totalprice), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (continuous interpolation — matches
    DuckDB quantile_cont). The streaming/huge-scale variant is
    percentile_approx, covered rows-only via `approx_distinct_profile`'s
    family."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "v_table_diff",
    """
    WITH l AS (
      SELECT event_id, user_id, event_type, value FROM events
    ), r AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN event_id % 100 = 0 THEN value + 1 ELSE value END AS value
      FROM events WHERE event_id % 10 <> 7
      UNION ALL
      SELECT event_id + 10000000 AS event_id, user_id, event_type, value
      FROM events WHERE event_id % 10 = 3
    )
    SELECT COALESCE(l.event_id, r.event_id) AS event_id,
           CASE WHEN l.event_id IS NULL THEN 'added'
                WHEN r.event_id IS NULL THEN 'removed'
                WHEN l.user_id IS DISTINCT FROM r.user_id
                  OR l.event_type IS DISTINCT FROM r.event_type
                  OR l.value IS DISTINCT FROM r.value THEN 'changed'
           END AS change_type
    FROM l FULL OUTER JOIN r ON l.event_id = r.event_id
    WHERE (l.event_id IS NULL) OR (r.event_id IS NULL)
       OR l.user_id IS DISTINCT FROM r.user_id
       OR l.event_type IS DISTINCT FROM r.event_type
       OR l.value IS DISTINCT FROM r.value
    """,
    sequential=True,
)
def v_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level reconciliation (`validate.table_diff`): diff the events
    table against a synthetic migrated copy that drops every id%10==7
    row (removed), perturbs every id%100==0 value (changed), and clones
    id%10==3 rows under offset keys (added). One full-outer key join +
    null-safe struct equality — the value-granular upgrade of the
    reference's count-only reconcile."""
    from hudi_utility_spark.validate import table_diff

    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    migrated = base.filter(F.col("event_id") % 10 != 7).withColumn(
        "value",
        F.when(F.col("event_id") % 100 == 0, F.col("value") + 1).otherwise(
            F.col("value")
        ),
    )
    added = base.filter(F.col("event_id") % 10 == 3).withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000)
    )
    return table_diff(base, migrated.unionByName(added), ["event_id"])


@query(
    "approx_quantile_check",
    """
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               MAX(value) - MIN(value) AS rng,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(p50, 4) AS p50_exact, ROUND(p90, 4) AS p90_exact,
           TRUE AS p50_within_tol, TRUE AS p90_within_tol
    FROM q
    """,
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`percentile_approx` (Greenwald-Khanna sketch, accuracy 10000)
    validated against the exact percentiles per event type: the approx
    answer must land within 2% of the column range, and that CLAIM is
    what crosses the value-hash gate (the oracle asserts TRUE, so a
    sketch drifting out of tolerance fails the round — approximation
    with an enforced error contract, the `approx_distinct_portable`
    pattern applied to quantiles). At 100 TB the GK sketch is the only
    affordable per-group quantile; this query is the standing proof it
    stays honest."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias(
            "a50"
        ),
        F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias(
            "a90"
        ),
        (F.max("value") - F.min("value")).alias("rng"),
    )
    tol = 0.02 * F.col("rng")
    return q.select(
        "event_type",
        "n",
        F.round("p50", 4).alias("p50_exact"),
        F.round("p90", 4).alias("p90_exact"),
        (F.abs(F.col("a50") - F.col("p50")) <= tol).alias(
            "p50_within_tol"
        ),
        (F.abs(F.col("a90") - F.col("p90")) <= tol).alias(
            "p90_within_tol"
        ),
    )
