"""Streaming observability (S11; reference ingestor/main.py:97).

The reference's only metric surface is the console-progress side effect of
``awaitTermination``. Here a real ``StreamingQueryListener`` captures
per-batch input rows and latency, so any sink (log line, metrics push) can
consume them; tests assert the listener actually observes progress.

Listener callbacks run on the driver's listener-bus thread — they must stay
O(1) per batch (append to a list / emit a line), never touch DataFrames.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Collects one record per completed micro-batch:
    ``{query_id, batch_id, num_input_rows, duration_ms}``.

    ``emit`` (optional) receives each record as it arrives — the hook for a
    console line or a metrics push in production.
    """

    def __init__(self, emit=None):
        self.records: list[dict] = []
        self._emit = emit

    # -- StreamingQueryListener interface ---------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API name)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        # Late-data observability (X74): rows a watermark silently drops
        # are invisible in results BY DESIGN — the only place they are
        # accounted for is the state-operator progress. Surfacing the
        # count per batch is what lets an operator distinguish "no late
        # data" from "late data being discarded" (and page on a
        # watermark misconfigured tighter than the real event-time skew).
        ops = list(p.stateOperators)
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs),
            "dropped_by_watermark": sum(
                op.numRowsDroppedByWatermark for op in ops
            ),
            "state_rows": sum(op.numRowsTotal for op in ops),
        }
        self.records.append(rec)
        if self._emit is not None:
            self._emit(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- test/consumer helpers --------------------------------------------

    def batches_for(self, query_id: str) -> list[dict]:
        return [r for r in self.records if r["query_id"] == str(query_id)]

    def wait_for_batches(
        self, query_id: str, n: int, timeout_s: float = 30.0
    ) -> list[dict]:
        """Listener events are delivered asynchronously on the listener bus;
        poll until ``n`` batch records for ``query_id`` have arrived."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            got = self.batches_for(query_id)
            if len(got) >= n:
                return got
            time.sleep(0.1)
        return self.batches_for(query_id)
