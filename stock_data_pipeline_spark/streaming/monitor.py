"""Streaming batch metrics: the reference's per-batch count log, upgraded.

The reference's only runtime observability is a print of each batch's row
count ("Data at {} has the length {}",
/root/reference/dags/stock_data_to_gcp.py:69). The engine's batch path
answers with ``Observation`` counters (pipelines/ingest.py); this module
is the STREAMING half — a ``StreamingQueryListener`` that records every
micro-batch's progress (rows, duration, state size, watermark) as
structured records, in memory for tests/dashboards and optionally as an
append-only JSONL log for ops.

Listener callbacks run on Spark's listener bus thread — they must never
block or throw, so the implementation only appends to a list / a local
file and swallows nothing silently (a failed file append surfaces once
via ``io_error``)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_id: str
    batch_id: int
    num_input_rows: int
    batch_duration_ms: int | None
    state_rows: int | None
    event_time_watermark: str | None


@dataclass
class MetricsLog:
    records: list[BatchMetric] = field(default_factory=list)
    io_error: str | None = None

    def total_input_rows(self, query_id: str | None = None) -> int:
        return sum(
            r.num_input_rows
            for r in self.records
            if query_id is None or r.query_id == query_id
        )


class MetricsListener(StreamingQueryListener):
    """Collects one :class:`BatchMetric` per completed micro-batch."""

    def __init__(self, jsonl_path: str | None = None) -> None:
        self.log = MetricsLog()
        self._jsonl_path = jsonl_path

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration = (p.durationMs or {}).get("triggerExecution")
        state_rows = None
        if p.stateOperators:
            state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        watermark = (p.eventTime or {}).get("watermark")
        rec = BatchMetric(
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            batch_duration_ms=duration,
            state_rows=state_rows,
            event_time_watermark=watermark,
        )
        self.log.records.append(rec)
        if self._jsonl_path is not None:
            try:
                with open(self._jsonl_path, "a") as f:
                    f.write(json.dumps(rec.__dict__) + "\n")
            except OSError as ex:  # listener threads must never throw
                self.log.io_error = str(ex)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_metrics(spark, jsonl_path: str | None = None) -> MetricsListener:
    """Register a fresh listener on the session; caller detaches with
    ``spark.streams.removeListener(listener)`` when done (tests do)."""
    listener = MetricsListener(jsonl_path)
    spark.streams.addListener(listener)
    return listener
