"""Storage assignment config: which stream-partitions THIS node stores.

Mirrors src/storage/StorageConfig.ts: a `"id::partition"` key set fetched
from the core API (injectable here), refreshed on a poll interval, diffed
into add/remove listener callbacks, plus the assignment-event stream
(`{address}/storage-node-assignments`, STREAM_ADDED / STREAM_REMOVED)
that mutates the set live.

Spark-side consumption: `filter_assigned(df)` narrows an ingest
micro-batch to assigned keys with a broadcast semi-join — the F6
assignment filter as a plan, not a driver loop — so an unassigned
firehose costs a broadcast-hash probe per row and writes nothing."""

from __future__ import annotations

import json
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

ASSIGNMENT_EVENT_STREAM_ID_SUFFIX = "/storage-node-assignments"


def get_key(stream_id: str, partition: int) -> str:
    return f"{stream_id}::{partition}"


def get_stream_from_key(key: str) -> tuple[str, int]:
    stream_id, _, partition = key.rpartition("::")
    return stream_id, int(partition)


def _keys_for(stream_id: str, partitions: int) -> set[str]:
    return {get_key(stream_id, p) for p in range(partitions)}


class StorageConfig:
    """Assigned stream-partition set with refresh + live assignment events.

    `fetch_streams() -> [{"id": ..., "partitions": n}, ...]` is the
    injectable core-API callout (`GET /storageNodes/:id/streams`)."""

    def __init__(
        self,
        node_id: str,
        fetch_streams: Callable[[], list[dict]] | None = None,
    ):
        self.node_id = node_id
        self._fetch_streams = fetch_streams or (lambda: [])
        self.stream_keys: set[str] = set()
        self.listeners: list = []
        self._lock = threading.Lock()
        self._timer: threading.Timer | None = None
        self._stopped = False

    @classmethod
    def create_instance(
        cls,
        node_id: str,
        fetch_streams: Callable[[], list[dict]] | None = None,
        poll_interval_s: float = 0.0,
    ) -> "StorageConfig":
        """createInstance (StorageConfig.ts:58-65): an initial refresh,
        then polling unless the interval is 0."""
        instance = cls(node_id, fetch_streams)
        if poll_interval_s != 0:
            instance._poll(poll_interval_s)
        return instance

    # -- set queries --------------------------------------------------------
    def has_stream(self, stream_id: str, partition: int) -> bool:
        with self._lock:
            return get_key(stream_id, partition) in self.stream_keys

    def get_streams(self) -> list[tuple[str, int]]:
        with self._lock:
            return sorted(get_stream_from_key(k) for k in self.stream_keys)

    def add_change_listener(self, listener) -> None:
        """listener has onStreamAdded/onStreamRemoved-style callables
        (`on_stream_added(stream_id, partition)`, `on_stream_removed`)."""
        self.listeners.append(listener)

    # -- refresh / diff (StorageConfig.ts:96-134) ---------------------------
    def refresh(self) -> None:
        streams = self._fetch_streams()
        new_keys: set[str] = set()
        for s in streams:
            new_keys |= _keys_for(s["id"], s["partitions"])
        with self._lock:
            added = new_keys - self.stream_keys
            removed = self.stream_keys - new_keys
        if added:
            self._add_keys(added)
        if removed:
            self._remove_keys(removed)

    def _add_keys(self, keys: set[str]) -> None:
        with self._lock:
            self.stream_keys |= keys
        for listener in self.listeners:
            for key in keys:
                listener.on_stream_added(*get_stream_from_key(key))

    def _remove_keys(self, keys: set[str]) -> None:
        with self._lock:
            self.stream_keys -= keys
        for listener in self.listeners:
            for key in keys:
                listener.on_stream_removed(*get_stream_from_key(key))

    # -- live assignment events (StorageConfig.ts:135-150) ------------------
    def assignment_stream_id(self, streamr_address: str) -> str:
        return streamr_address + ASSIGNMENT_EVENT_STREAM_ID_SUFFIX

    def handle_assignment_message(self, content) -> None:
        """One STREAM_ADDED/STREAM_REMOVED event — subscribe this (via the
        fan-out registry or any transport) to the assignment stream."""
        if isinstance(content, str):
            content = json.loads(content)
        keys = _keys_for(content["stream"]["id"], content["stream"]["partitions"])
        if content["event"] == "STREAM_ADDED":
            self._add_keys(keys)
        elif content["event"] == "STREAM_REMOVED":
            self._remove_keys(keys)

    # -- the Spark-side filter (F6 as a plan) -------------------------------
    def filter_assigned(self, df: DataFrame) -> DataFrame:
        """Narrow a batch to assigned (stream_id, partition) keys: broadcast
        semi-join against the key set, so the filter runs executor-side
        inside the scan stage.  An empty assignment set keeps nothing."""
        with self._lock:
            keys = [get_stream_from_key(k) for k in self.stream_keys]
        spark = df.sparkSession
        assigned = spark.createDataFrame(
            keys or [("", -1)], "stream_id string, partition int"
        )
        return df.join(broadcast(assigned), ["stream_id", "partition"], "left_semi")

    # -- poller (StorageConfig.ts:67-82) ------------------------------------
    def _poll(self, interval_s: float) -> None:
        if self._stopped:
            return
        try:
            self.refresh()
        except Exception:  # noqa: BLE001 — "Unable to refresh storage config"
            pass
        if self._stopped:
            return
        self._timer = threading.Timer(interval_s, self._poll, args=(interval_s,))
        self._timer.daemon = True
        self._timer.start()

    def cleanup(self) -> None:
        self._stopped = True
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
