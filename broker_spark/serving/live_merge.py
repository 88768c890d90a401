"""Resend-then-realtime handoff (SURVEY §7 hard part 3): deliver a
historical resend followed by the live feed with no gaps and no
duplicates across the batch/stream boundary.

The reference sidesteps this client-side (the client library orders
resent vs realtime messages); the broker only serves the two sources.
Serving both from one engine, the gateway can do better: buffer live
messages while the historical scan drains, then emit the buffered and
subsequent live messages, skipping anything at or before the last
historical message ref.

Total order is the engine's ordering contract `(ts, sequence_no,
publisher_id, msg_chain_id)` — the same tuple the resend queries sort by,
so "duplicate" and "already covered by the resend" are both expressible
as `ref <= last_delivered`.
"""

from __future__ import annotations

import heapq
import threading
from collections.abc import Iterator
from typing import Any


def _ref(row: Any) -> tuple:
    return (row["ts"], row["sequence_no"], row["publisher_id"], row["msg_chain_id"])


class LiveBuffer:
    """Thread-safe buffer a fan-out subscriber pushes into while the
    historical scan is draining (the reference's client keeps exactly this
    buffer — here it lives in the gateway)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._heap: list[tuple[tuple, int, Any]] = []
        self._seq = 0
        self.closed = False

    def push(self, row: Any) -> None:
        with self._lock:
            self._heap.append((_ref(row), self._seq, row))
            self._seq += 1

    def drain_sorted(self) -> list[Any]:
        with self._lock:
            heapq.heapify(self._heap)
            out = [heapq.heappop(self._heap)[2] for _ in range(len(self._heap))]
            self._heap = []
            return out


def resend_then_realtime(
    historical: Iterator[Any],
    live: LiveBuffer,
) -> Iterator[Any]:
    """Yield every historical row, then the live rows that the resend did
    not already cover — each exactly once, in the total order.

    The caller subscribes `live` BEFORE building the historical DataFrame
    (so no message can fall between the scan's snapshot and the first
    buffered live row), then iterates this generator.
    """
    last = None
    for row in historical:
        last = _ref(row)
        yield row
    for row in live.drain_sorted():
        if last is None or _ref(row) > last:
            last = _ref(row)
            yield row
