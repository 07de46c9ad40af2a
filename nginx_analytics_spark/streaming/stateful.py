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
    """Per-key fold kernel: (count, last, ewma) over event-time-ordered rows."""
    n, last, ewma = state.get if state.exists else (0, None, None)
    batch = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    for v in batch["value"]:
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
    """
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
