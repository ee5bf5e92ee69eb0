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
    protobuf-framed); the test suite skips when it is absent.

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

        def handleInputRows(self, key, rows, timer_values):
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
