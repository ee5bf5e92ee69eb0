"""Custom stateful streaming operator: per-key running EWMA.

The north-star streaming surface includes operators the built-in
windowed aggregates cannot express — anything whose state is a
*recursive fold over arrival order* rather than a commutative aggregate.
The canonical example implemented here: an exponentially weighted moving
average per key (anomaly baselines, rate smoothing), carried across
micro-batches with ``applyInPandasWithState``.

    ewma_0 = v_0;  ewma_i = alpha * v_i + (1 - alpha) * ewma_{i-1}

The batch twin (``running_ewma_batch``) computes the same fold with a
higher-order ``aggregate`` over the per-key time-sorted value array —
one shuffle, no Python — and is what the oracle-checked query uses.

Scale notes: state per key is two scalars (ewma, n) in the state store;
the stream shuffles once on the key, identical to any keyed aggregate.
The batch twin's ``collect_list`` bounds per-key memory by per-key event
count — for hot keys at 100 TB, pre-aggregate by (key, coarse window)
first or switch to the streaming form, which never materializes a key's
history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ewma", T.DoubleType(), True),
        T.StructField("n_events", T.LongType(), False),
    ]
)

EWMA_STATE = T.StructType(
    [
        T.StructField("ewma", T.DoubleType(), True),
        T.StructField("n", T.LongType(), False),
    ]
)


def running_ewma_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Streaming per-key EWMA via applyInPandasWithState.

    Emits (key, ewma, n_events) each micro-batch a key receives data;
    the fold continues across batches from the state store. Rows within
    a batch are folded in (ts, order_col) order — the same total order
    as the batch twin.
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ewma, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, order_col], kind="stable")
            for v in pdf[value_col]:
                v = float(v)
                ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
                n += 1
        state.update((ewma, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "ewma": [ewma], "n_events": [n]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_ewma_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Batch twin: the same recursive fold as a higher-order aggregate
    over the per-key time-sorted value array. One shuffle, JVM-only."""
    sorted_vals = F.expr(
        f"transform(array_sort(collect_list(struct({ts_col}, {order_col}, "
        f"{value_col} AS v))), x -> x.v)"
    )
    fold = F.expr(
        f"""
        aggregate(
          _vals,
          named_struct('ewma', CAST(NULL AS DOUBLE), 'n', 0L),
          (acc, v) -> named_struct(
            'ewma', CASE WHEN acc.n = 0 THEN v
                         ELSE {alpha}D * v + {1.0 - alpha}D * acc.ewma END,
            'n', acc.n + 1)
        )
        """
    )
    return (
        df.groupBy(key_col)
        .agg(sorted_vals.alias("_vals"))
        .select(key_col, fold.alias("_f"))
        .select(
            key_col,
            F.col("_f.ewma").alias("ewma"),
            F.col("_f.n").alias("n_events"),
        )
    )


def running_ewma_tws(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Streaming per-key EWMA on ``transformWithStateInPandas`` — the
    Spark 4 successor to ``applyInPandasWithState``. Same contract and
    emissions as :func:`running_ewma_stream`; differences are all
    engine-side: named typed state (`ValueState`), timer support, and
    the RocksDB state-store requirement
    (``spark.sql.streaming.stateStore.providerClass`` must be the
    RocksDB provider — the caller sets it; this function cannot, since
    the conf is read at query start). Also requires ``google.protobuf``
    in the Python workers (transformWithState's state-server RPC is
    protobuf-framed — tools/pyshim supplies a vendored runtime when no
    wheel is installed, so this path executes for real in CI and in the
    registered `stream_ewma_tws` query).

    Scale: state per key is still two scalars; RocksDB keeps the state
    store off-heap and incrementally checkpointed, which is what makes
    100M+ live keys per executor viable where the HDFS-backed provider
    (full-snapshot per commit) is not.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ewma_state", EWMA_STATE)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                ewma, n = self._state.get()
            else:
                ewma, n = None, 0
            for pdf in rows:
                pdf = pdf.sort_values([ts_col, order_col], kind="stable")
                for v in pdf[value_col]:
                    v = float(v)
                    ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
                    n += 1
            self._state.update((ewma, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "ewma": [ewma], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Proc(),
        outputStructType=EWMA_OUTPUT,
        outputMode="update",
        timeMode="none",
    )


SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def fold_session_events(
    cur: tuple[int, int, int] | None, ts_us_sorted: list[int], gap_us: int
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Pure session fold shared by the stateful processor and its unit
    tests (the TWS path itself also runs for real here — the
    tools/pyshim protobuf shim makes the state-server RPC importable,
    and `stream_ewma_tws` is the oracle-checked streaming run): events
    extend the open session
    within ``gap_us``, larger gaps close it. Returns (closed_sessions,
    open_session); sessions are (start_us, last_us, n)."""
    closed: list[tuple[int, int, int]] = []
    for t in ts_us_sorted:
        if cur is None:
            cur = (t, t, 1)
        elif t - cur[1] <= gap_us:
            cur = (cur[0], max(cur[1], t), cur[2] + 1)
        else:
            closed.append(cur)
            cur = (t, t, 1)
    return closed, cur


def sessionize_tws(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Session windows as a custom stateful operator with EVENT-TIME
    TIMERS (`transformWithStateInPandas`, timeMode="eventTime") — the
    capability `applyInPandasWithState` lacks: a session that simply
    stops receiving events still CLOSES, because the watermark-driven
    timer fires; no poison-pill event is needed.

    Per key: events extend the open session while gaps stay within
    ``gap_seconds``; a larger gap closes the open session inline and
    opens a new one; after every batch the key re-arms one timer at
    ``last_event + gap``, and :meth:`handleExpiredTimer` emits the
    final session when the watermark passes it. Emitted rows match the
    built-in ``session_window`` aggregate with ``end = window.end -
    gap`` (pytest pins parity). Caller must ``withWatermark`` the
    stream — event-time timers advance with it.

    Scale: state per key is 3 longs + 1 timer; the stream shuffles once
    on the key. RocksDB provider requirement and protobuf note as in
    :func:`running_ewma_tws`."""
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = gap_seconds * 1_000_000

    def _row(key, s):
        return pd.DataFrame(
            {
                "user_id": [key],
                "session_start_us": [s[0]],
                "session_end_us": [s[1]],
                "n_events": [s[2]],
            }
        )

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._s = handle.getValueState("session", SESSION_STATE)

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            cur = tuple(self._s.get()) if self._s.exists() else None
            ts_us: list[int] = []
            for pdf in rows:
                ts_us.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col])
                )
            ts_us.sort()
            closed, cur = fold_session_events(cur, ts_us, gap_us)
            for s in closed:
                yield _row(key[0], s)
            self._s.update(cur)
            # one armed timer per key: re-arm at the new horizon
            for old in self._h.listTimers():
                self._h.deleteTimer(old)
            self._h.registerTimer((cur[1] + gap_us) // 1000)

        def handleExpiredTimer(
            self,
            key,
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ):
            # parameter names must match the runtime exactly: pyspark's
            # stateful_processor_util invokes this hook with KEYWORD
            # arguments (timerValues=, expiredTimerInfo=)
            if self._s.exists():
                cur = tuple(self._s.get())
                wm_us = timerValues.getCurrentWatermarkInMs() * 1000
                if wm_us >= cur[1] + gap_us:
                    self._s.clear()
                    yield _row(key[0], cur)

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Sessionizer(),
        outputStructType=SESSION_OUTPUT,
        outputMode="append",
        timeMode="eventTime",
    )


def sessionize_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch twin of :func:`sessionize_tws`: the built-in
    ``session_window`` aggregate (whose window end extends past the
    last event by the gap — subtracted here so both forms emit the
    last-event timestamp). NTZ inputs cast to instant semantics (the
    session runs UTC, so the wall time IS the instant)."""
    # the session pins spark.sql.timestampType=TIMESTAMP_NTZ, so the
    # instant type must be named explicitly (unix_micros needs LTZ)
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    w = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        df.groupBy(F.col(key_col), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            (F.unix_micros(F.col("w.end")) - gap_seconds * 1_000_000).alias(
                "session_end_us"
            ),
            "n_events",
        )
    )
