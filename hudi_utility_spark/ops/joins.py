"""Advanced join operators absent from stock Spark SQL: as-of join and
range (interval / proximity) join.

The reference has no DataFrame joins at all (SURVEY §2.3 — its join
semantics are driver-side set ops), so these are north-star extensions:
the time-series / event-log joins a training-data pipeline needs.

Scale design:

* **as-of join** — the union-tag trick: union both sides tagged, one
  shuffle on the join key, then ``last(value, ignorenulls=True)`` over an
  ordered window carries the most recent right-side row forward onto each
  left row. O(1) shuffles, no range explosion, no per-key collect —
  versus the naive ``t1.ts >= t2.ts`` theta-join which is a broadcast
  nested loop (quadratic per key). This is the same plan DuckDB/kdb use
  for ASOF under the hood (sorted merge).
* **range join** — bucketize: map each row to coarse time buckets of
  width = max range, self-join on (key, bucket) equi-keys so Catalyst
  uses a hash join, then post-filter the exact predicate. Candidate
  volume is bounded by per-bucket density, not n² — the standard
  bin-join from the spatial/temporal-join literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hudi_utility_spark.tsutil import us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` sharing the ``on`` keys (backward as-of) —
    or, with ``direction="forward"``, the EARLIEST right row with
    ``right.ts >= left.ts`` (next-event semantics: "first click after
    the purchase"). Same single-shuffle union-tag plan either way: the
    forward variant just scans the per-key order in reverse.

    Columns from the right side are suffixed. Rows with no match keep
    nulls. ``tolerance_seconds`` drops matches farther than the
    tolerance in the match direction (kdb ``wj``-style windowed as-of).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    tag = "__asof_side"
    ts = "__asof_ts"

    lhs = left.withColumn(tag, F.lit(1)).withColumn(ts, F.col(left_ts))
    rhs = right.select(
        *on,
        F.col(right_ts).alias(ts),
        *[F.col(c) for c in right_cols],
    ).withColumn(tag, F.lit(0))

    # Align schemas for the union: left keeps all its columns, right-side
    # payload columns are null on left rows and vice versa.
    carried = [f"{c}{suffix}" for c in right_cols]
    lhs = lhs.select(
        "*", *[F.lit(None).cast(rhs.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols]
    )
    rhs_aligned = rhs.select(
        *[
            F.lit(None).cast(lhs.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in set(on)
        ],
        *on,
        F.col(tag),
        F.col(ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).select(*lhs.columns)

    # Right rows sort before left rows at equal timestamps (tag 0 < 1) so
    # a right row at exactly left.ts IS visible to that left row.
    # Forward as-of scans the per-key order newest-first, making "last
    # right seen" the earliest right row at-or-after the left row.
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(tag).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs_aligned)
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(F.col(tag) == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__f_{c}")
            for c in carried
        ],
        F.last(F.when(F.col(tag) == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    )
    out = filled.filter(F.col(tag) == 1)
    if tolerance_seconds is not None:
        gap = us(F.col(ts)) - us(F.col("__match_ts"))
        if direction == "forward":
            gap = -gap
        within = gap <= F.lit(tolerance_seconds) * F.lit(1_000_000)
        out = out.select(
            "*",
            *[
                F.when(within, F.col(f"__f_{c}")).alias(f"__t_{c}")
                for c in carried
            ],
        )
        for c in carried:
            out = out.drop(f"__f_{c}").withColumnRenamed(f"__t_{c}", f"__f_{c}")
        out = out.withColumn(
            "__match_ts", F.when(within, F.col("__match_ts"))
        )
    for c in carried:
        out = out.drop(c).withColumnRenamed(f"__f_{c}", c)
    return out.withColumnRenamed("__match_ts", f"{right_ts}{suffix}").drop(tag, ts)


def range_self_join(
    df: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    max_gap_seconds: int = 60,
    id_col: str = "event_id",
) -> DataFrame:
    """Pairs of rows sharing ``on`` keys within ``max_gap_seconds`` of
    each other (id_a < id_b), via bucketed bin-join.

    Each row lands in bucket floor(epoch/gap) and is replicated into the
    next bucket, so every within-gap pair co-occurs in at least one
    bucket; the equi-join on (keys, bucket) prunes the cross product and
    a ``dropDuplicates`` removes the double-counted same-bucket pairs.
    """
    # Work in microseconds throughout: second-granularity casts floor,
    # which disagrees with sub-second data at the gap boundary.
    gap_us = max_gap_seconds * 1_000_000
    epoch = us(F.col(ts_col))
    base = df.select(
        *on,
        F.col(id_col).alias("id"),
        epoch.alias("epoch_us"),
        F.floor(epoch / gap_us).alias("bucket0"),
    )
    exploded = base.select(
        *on,
        "id",
        "epoch_us",
        F.explode(F.array(F.col("bucket0"), F.col("bucket0") + 1)).alias("bucket"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    cond = cond & (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    return (
        a.join(b, cond)
        .filter(F.abs(F.col("a.epoch_us") - F.col("b.epoch_us")) <= gap_us)
        .select(
            *[F.col(f"a.{k}").alias(k) for k in on],
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (F.col("b.epoch_us") - F.col("a.epoch_us")).alias("gap_us"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def bloom_reduce_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Bloom-filtered join — the runtime-filter / semi-join-reduction
    pattern (Spark's own `spark.sql.optimizer.runtime.bloomFilter` and
    Trino's dynamic filtering), made explicit and portable: build a
    Bloom bitmap of the dimension keys, broadcast it into a map-side
    membership test on the fact, and only the surviving sliver of the
    fact enters the join shuffle.

    Build is fully distributed: each dim key sets ``k`` bit positions
    derived from seeded ``xxhash64`` (JVM-native — the bitmap never
    crosses engines, so the portable-md5 family is unnecessary weight
    here; the oracle for any bloom-reduced query is simply the plain
    join), positions fold into 64-bit words with one ``bit_or`` hash
    aggregate (map-side combinable, ≤ ``m_bits/64`` rows), and the
    collected word array — O(m_bits/8) bytes of driver traffic
    regardless of dim row count — re-enters the plan as ONE array
    literal the codegen'd test indexes per row. No false negatives by
    construction, so the result equals the plain join exactly; false
    positives only cost shuffle bytes, never correctness.

    When to use over alternatives: broadcast-hash join already handles
    a small dim; this wins when the dim's key SET is Bloom-compressible
    but the dim relation itself is too wide/large to broadcast, and the
    fact is huge — the classic 100 TB fact ⋈ 100 M-row dim. Size
    ``m_bits`` ≈ 10–16 bits per expected dim key for sub-1% false
    positives.

    Only ``inner``/``semi`` (and ``right``, whose unmatched side is the
    dim) are accepted: the pre-filter drops fact rows with no dim match
    before the join, so any mode that must PRESERVE unmatched fact rows
    (``left``/``full`` outer, ``anti``) would silently lose them.
    """
    allowed = {"inner", "semi", "leftsemi", "left_semi", "right", "rightouter", "right_outer"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"bloom_reduce_join: how={how!r} is not equivalence-preserving — "
            "the Bloom pre-filter drops unmatched fact rows, so only "
            "inner/semi/right joins (whose results never keep them) are "
            "supported; use a plain join for left/full/anti"
        )
    n_words = (m_bits + 63) // 64

    def positions(col):
        return [
            F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits)) for i in range(k)
        ]

    # SQL shiftleft accepts a column shift amount (the F.shiftleft
    # wrapper requires a literal), so masks derive from a named column
    def mask_of(name: str):
        return F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({name} % 64 AS INT))"
        )

    bits = dim.select(F.explode(F.array(*positions(F.col(dim_key)))).alias("pos"))
    words = (
        bits.select(
            (F.col("pos") / F.lit(64)).cast("int").alias("word"),
            mask_of("pos").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    arr = [0] * n_words
    for r in words:
        arr[r["word"]] = r["mask"]
    # a single ARRAY LITERAL (not CreateArray of m/64 literal nodes,
    # which codegen would rebuild per probed row x k probes)
    arr_lit = F.lit([int(v) for v in arr])

    pos_cols = [f"_bp{i}" for i in range(k)]
    probed = fact
    for name, pos in zip(pos_cols, positions(F.col(fact_key))):
        probed = probed.withColumn(name, pos)
    test = F.lit(True)
    for name in pos_cols:
        word_ix = (F.col(name) / F.lit(64)).cast("int") + F.lit(1)
        test = test & (
            F.element_at(arr_lit, word_ix).bitwiseAND(mask_of(name)) != 0
        )
    reduced = probed.filter(test).drop(*pos_cols)
    return reduced.join(dim, reduced[fact_key] == dim[dim_key], how)


def multi_touch_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    key: str = "user_id",
    channel_col: str = "channel",
    touch_id: str = "event_id",
    conv_id: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    half_life_seconds: float = 600.0,
) -> DataFrame:
    """Multi-touch attribution: credit each conversion's value to the
    same key's touches inside the preceding ``gap_seconds``, under the
    three standard models AT ONCE — last-touch (full credit to the
    latest touch), linear (1/n each), and time-decay
    (exp(-age/half_life), normalized per conversion) — then roll
    credit up by channel. The marketing-attribution readout every
    event pipeline grows; here it doubles as a credit-assignment
    primitive for reward attribution over interaction logs.

    Scale shape: ONE equi-join shuffle on the high-cardinality key
    (the time bound is a residual predicate, not a join explosion —
    per-key fan-in is bounded by event rate x gap); the per-conversion
    n / decay-mass / latest-touch all come from windows PARTITIONED BY
    conversion id (high cardinality, never global); the final rollup
    is one channel-sized aggregate. Nothing collects.
    """
    t = touches.select(
        F.col(key).alias("__k"),
        F.col(channel_col).alias("channel"),
        F.col(touch_id).alias("__tid"),
        F.col(ts_col).alias("__tts"),
    )
    c = conversions.select(
        F.col(key).alias("__k"),
        F.col(conv_id).alias("__cid"),
        F.col(ts_col).alias("__cts"),
        F.col(value_col).alias("__val"),
    )
    j = c.join(t, ["__k"]).filter(
        (F.col("__tts") < F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
        )
    )
    age_s = (us("__cts") - us("__tts")) / F.lit(1_000_000.0)
    w = Window.partitionBy("__cid")
    w_rank = Window.partitionBy("__cid").orderBy(
        F.desc("__tts"), F.desc("__tid")
    )
    decay = F.exp(-age_s / F.lit(float(half_life_seconds)))
    scored = j.select(
        "channel",
        "__val",
        decay.alias("__w"),
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum(decay).over(w).alias("__sum_w"),
        F.row_number().over(w_rank).alias("__rn"),
    )
    return (
        scored.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(
                F.sum(F.when(F.col("__rn") == 1, F.col("__val")).otherwise(0.0)),
                6,
            ).alias("last_touch"),
            F.round(F.sum(F.col("__val") / F.col("__n")), 6).alias("linear"),
            F.round(
                F.sum(F.col("__val") * F.col("__w") / F.col("__sum_w")), 6
            ).alias("time_decay"),
        )
    )
