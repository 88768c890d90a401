"""Pub-sub fan-out sink (S4, W10): broadcast each stored message to every
subscribed local connection.

The reference fans out inside the process: one network message -> every
subscribed websocket/MQTT connection (src/websocket/WebsocketServer.ts:
327-345, src/mqtt/MqttServer.ts:281-302).  The Spark-side analog is a
`foreachBatch` sink that routes each micro-batch to an in-process
subscription registry; a real deployment points the same hook at Kafka
topics (one per stream) and lets consumers fan out at the edge.

Scale: the per-batch routing collects ONLY subscribed streams' rows
(a broadcast-semi-join keeps the filter on executors); an unsubscribed
firehose costs nothing driver-side.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Subscriber = Callable[[Any], None]  # receives a Row


class SubscriptionRegistry:
    """Connection-id -> subscribed (stream_id, partition) sets, mirroring
    the reference's per-connection stream shelves
    (src/websocket/Connection.ts:37-57)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._subs: dict[tuple[str, int], dict[str, Subscriber]] = defaultdict(dict)

    def subscribe(
        self, connection_id: str, stream_id: str, partition: int, cb: Subscriber
    ) -> None:
        with self._lock:
            self._subs[(stream_id, partition)][connection_id] = cb

    def unsubscribe(self, connection_id: str, stream_id: str, partition: int) -> None:
        with self._lock:
            self._subs.get((stream_id, partition), {}).pop(connection_id, None)

    def subscribed_keys(self) -> list[tuple[str, int]]:
        with self._lock:
            return [k for k, v in self._subs.items() if v]

    def dispatch(self, row: Any) -> int:
        """BroadcastMessage to every subscriber of the row's stream-partition
        (src/websocket/WebsocketServer.ts:327-345).  Returns fanout count."""
        with self._lock:
            targets = list(self._subs.get((row["stream_id"], row["partition"]), {}).values())
        for cb in targets:
            cb(row)
        return len(targets)


def foreach_batch_fanout(registry: SubscriptionRegistry) -> Callable[[DataFrame, int], None]:
    """A foreachBatch hook: filter the micro-batch to subscribed
    stream-partitions (executor-side), then dispatch locally in total
    order (ts, sequence_no) — the pub-sub ordering guarantee asserted by
    the reference's e2e test (test/integration/broker.test.ts:133-205)."""

    def _run(batch: DataFrame, _batch_id: int) -> None:
        keys = registry.subscribed_keys()
        if not keys:
            return
        cond = None
        for sid, p in keys:
            c = (F.col("stream_id") == sid) & (F.col("partition") == p)
            cond = c if cond is None else (cond | c)
        rows = (
            batch.filter(cond)
            .orderBy("ts", "sequence_no", "publisher_id", "msg_chain_id")
            .collect()
        )
        for row in rows:
            registry.dispatch(row)

    return _run
