"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no arbitrary stateful ops (SURVEY.md §2.6: watermark +
tumbling window only); this module adds the engine's custom-state surface:
a per-key running profile (event count, last value, exponentially weighted
moving average of the measure) maintained across micro-batches with
explicit GroupState — the building block for sessionization, online
baselines, and drift tracking that windowed aggregation can't express.

Semantics: state folds rows in processing order across batches; within a
batch each key's rows are folded in (event_time, event_id) order (sorted
in the pandas kernel), so a single-batch run — Trigger.AvailableNow over
one file — is fully deterministic and DuckDB-oracle-checkable (the oracle
replicates the fold with an ORDER BY list_reduce, the same IEEE sequence).

Scale: state is O(#keys) (three scalars per key), hash-partitioned by key
across executors, checkpointed incrementally; per batch, each executor
receives only its keys' rows via Arrow — the canonical
stateful-streaming-at-scale shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.3

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

STATE_SCHEMA = "n_events BIGINT, last_value DOUBLE, ewma DOUBLE"


def _fold_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key fold kernel: (count, last, ewma) over event-time-ordered rows.

    This runs once per key per batch, so per-invocation pandas overhead
    multiplies by the key count: the (ts, event_id) ordering is a numpy
    lexsort applied to the single ``value`` column instead of
    ``DataFrame.sort_values`` (which copies every column), and the
    single-chunk common case skips ``pd.concat``. The fold itself is
    unchanged — the same scalar IEEE op sequence the oracle replicates.
    """
    n, last, ewma = state.get if state.exists else (0, None, None)
    chunks = list(pdfs)
    batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    order = np.lexsort((batch["event_id"].to_numpy(), batch["ts"].to_numpy()))
    for v in batch["value"].to_numpy()[order]:
        v = float(v)
        n += 1
        last = v
        ewma = v if ewma is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * ewma
    state.update((n, last, ewma))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "last_value": [last], "ewma": [ewma]}
    )


def key_profiles(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming per-key profiles with explicit GroupState.

    Emits each key's updated (n_events, last_value, ewma) every batch the
    key appears in. No timeout: profiles live for the stream's lifetime
    (bounded, three scalars per key); pass a TTL'd variant for
    sessionization-style eviction.

    The stream is projected to the four columns the kernel reads before
    the stateful exchange: Spark cannot see inside the Python function,
    so without the explicit select every stream column (including wide
    payloads like ``props``) would be shuffled to the state partitions
    and shipped through Arrow to the Python workers.
    """
    stream = stream.select(key, "ts", "event_id", "value")
    return stream.groupBy(key).applyInPandasWithState(
        _fold_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_key_profiles_available_now(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Drive :func:`key_profiles` to completion (Trigger.AvailableNow) and
    return each key's FINAL profile (update mode re-emits per batch; the
    final row per key is the fold over everything)."""
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sink = "profiles_" + uuid.uuid4().hex[:12]
    q = (
        key_profiles(stream, key)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = stream.sparkSession.table(sink)
    w = Window.partitionBy(key).orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# -- transformWithStateInPandas: timers + arbitrary per-key state (X63) ----

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


class SessionFinalizer:
    """StatefulProcessor: gap-based sessionization with EVENT-TIME TIMERS —
    the streaming twin of operators.behavior.sessionize, built on the
    Spark 4 transformWithState API (which applyInPandasWithState cannot
    express: it has no timers, so an idle session could only be closed by
    the key's NEXT event — a key that goes silent would hold state
    forever and never emit).

    Per key: fold incoming event times into the open session; a batch gap
    > ``gap_ms`` closes the current session inline (emitted immediately);
    otherwise an event-time timer at last_event + gap is (re)armed — when
    the WATERMARK passes it, handleExpiredTimer emits the finalized
    session and clears state. State: three BIGINTs per key; timers: one
    per key (re-armed, old ones deleted) — O(#active keys), the bounded
    shape.

    Requires the RocksDB state store provider (transformWithState's
    backing store) — see run_session_finalizer_available_now.

    ENVIRONMENT CEILING (pinned, like the Kafka broker in
    streaming/ingest.py): executing a transformWithState query needs
    ``google.protobuf`` in the Python workers (Spark's TWS state-comms
    protocol); this image ships no protobuf and installs are disallowed,
    so the runtime path is exercised only on real deployments. The
    processor kernel itself is plain Python — its session-fold, in-batch
    split, timer re-arm, and finalization semantics are unit-tested
    against a fake handle in tests/test_tws_sessions.py, and the
    streaming plan construction (watermark -> groupBy -> TWS node,
    output schema) is asserted there too.
    """

    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle) -> None:
        self.handle = handle
        self.sess = handle.getValueState(
            "sess", "start BIGINT, last BIGINT, n BIGINT"
        )

    def _row(self, key, start, last, n) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_ms": [start],
                "session_end_ms": [last],
                "n_events": [n],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        ts_ms: list[int] = []
        for pdf in rows:
            ts_ms.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
        if not ts_ms:
            return
        ts_ms.sort()
        cur = list(self.sess.get()) if self.sess.exists() else None
        for t in ts_ms:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > self.gap_ms:
                yield self._row(key, *cur)  # in-batch gap: close inline
                cur = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        self.sess.update(tuple(cur))
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(cur[1] + self.gap_ms)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self.sess.exists():
            return
        start, last, n = self.sess.get()
        self.sess.clear()
        yield self._row(key, start, last, n)

    def close(self) -> None:
        pass


def idle_sessions(
    stream: DataFrame,
    gap_seconds: int = 300,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-sessionization with timer-driven finalization."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionFinalizer(gap_seconds * 1000),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def run_session_finalizer_available_now(
    stream: DataFrame, gap_seconds: int = 300, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Drive idle_sessions to completion against a file source. Sets the
    RocksDB state store provider (the transformWithState backing store)
    for the query's session, restoring the previous provider after."""
    import uuid

    spark = stream.sparkSession
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sink = "sessions_" + uuid.uuid4().hex[:12]
        q = (
            idle_sessions(stream, gap_seconds, watermark_delay)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(sink)
    finally:
        if prev is not None:
            spark.conf.set(conf_key, prev)
        else:
            spark.conf.unset(conf_key)
