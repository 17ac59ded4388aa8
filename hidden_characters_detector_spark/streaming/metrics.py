"""Streaming metrics: listener-driven progress JSON (S11/S12 analog).

The reference reports ScanStats + elapsed to console/report file
(``/root/reference/hidden-characters-detector.py:926-948, :1204-1222``); in
the engine the equivalent telemetry is ``StreamingQueryListener`` progress —
rows/sec, batch durations, state-store metrics, and the watermark's
late-drop counters (``numRowsDroppedByWatermark``) — persisted as JSON
lines for the bench harness and ops audit.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Records every query-progress event; optionally appends JSONL."""

    def __init__(self, jsonl_path: str | None = None) -> None:
        self.progress: list[dict] = []
        self.jsonl_path = jsonl_path
        self._lock = threading.Lock()

    # -- listener callbacks --------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        with self._lock:
            self.progress.append(p)
            if self.jsonl_path:
                mode = "a" if os.path.exists(self.jsonl_path) else "w"
                with open(self.jsonl_path, mode) as f:
                    f.write(json.dumps(p) + "\n")

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- aggregates ----------------------------------------------------------
    def total_input_rows(self, query_name: str | None = None) -> int:
        return sum(int(p.get("numInputRows", 0)) for p in self.progress
                   if query_name is None or p.get("name") == query_name)

    def rows_dropped_by_watermark(self, query_name: str | None = None) -> int:
        n = 0
        for p in self.progress:
            if query_name is not None and p.get("name") != query_name:
                continue
            for op in p.get("stateOperators", []):
                n += int(op.get("numRowsDroppedByWatermark", 0))
        return n

    def observed(self, metric_name: str, field: str,
                 query_name: str | None = None) -> int:
        """Sum an ``observe()`` metric field across recorded batches."""
        n = 0
        for p in self.progress:
            if query_name is not None and p.get("name") != query_name:
                continue
            m = p.get("observedMetrics", {}).get(metric_name)
            if m and m.get(field) is not None:
                n += int(m[field])
        return n

    def state_rows(self, query_name: str | None = None) -> int:
        n = 0
        for p in self.progress:
            if query_name is not None and p.get("name") != query_name:
                continue
            for op in p.get("stateOperators", []):
                n = max(n, int(op.get("numRowsTotal", 0)))
        return n
