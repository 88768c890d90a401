"""StorageConfig tests, mirroring test/unit/StorageConfig.test.ts: refresh
diffing with listener callbacks, live assignment events, and the Spark-side
assignment filter."""

from __future__ import annotations

import json

from broker_spark.storage.config import StorageConfig, get_key


class Recorder:
    def __init__(self):
        self.added, self.removed = [], []

    def on_stream_added(self, stream_id, partition):
        self.added.append((stream_id, partition))

    def on_stream_removed(self, stream_id, partition):
        self.removed.append((stream_id, partition))


class TestRefreshDiff:
    def test_refresh_expands_partitions_and_diffs(self):
        responses = [
            [{"id": "s1", "partitions": 2}],
            [{"id": "s1", "partitions": 1}, {"id": "s2", "partitions": 1}],
        ]
        cfg = StorageConfig("node", fetch_streams=lambda: responses.pop(0))
        rec = Recorder()
        cfg.add_change_listener(rec)

        cfg.refresh()
        assert cfg.has_stream("s1", 0) and cfg.has_stream("s1", 1)
        assert not cfg.has_stream("s2", 0)
        assert sorted(rec.added) == [("s1", 0), ("s1", 1)]

        cfg.refresh()  # s1 shrinks to 1 partition, s2 appears
        assert sorted(rec.removed) == [("s1", 1)]
        assert cfg.get_streams() == [("s1", 0), ("s2", 0)]

    def test_create_instance_zero_interval_does_not_poll(self):
        calls = []
        cfg = StorageConfig.create_instance(
            "node", fetch_streams=lambda: calls.append(1) or [], poll_interval_s=0
        )
        assert calls == [] and cfg.get_streams() == []

    def test_poller_refreshes(self):
        import time

        calls = []
        cfg = StorageConfig.create_instance(
            "node", fetch_streams=lambda: calls.append(1) or [], poll_interval_s=0.05
        )
        time.sleep(0.3)
        cfg.cleanup()
        assert len(calls) >= 2


class TestAssignmentEvents:
    def test_added_and_removed_events(self):
        cfg = StorageConfig("node")
        rec = Recorder()
        cfg.add_change_listener(rec)
        assert cfg.assignment_stream_id("0xabc") == "0xabc/storage-node-assignments"

        cfg.handle_assignment_message(
            json.dumps({"event": "STREAM_ADDED", "stream": {"id": "s9", "partitions": 2}})
        )
        assert cfg.has_stream("s9", 1) and ("s9", 0) in rec.added

        cfg.handle_assignment_message(
            {"event": "STREAM_REMOVED", "stream": {"id": "s9", "partitions": 2}}
        )
        assert not cfg.has_stream("s9", 0) and ("s9", 1) in rec.removed

    def test_stream_id_with_separator_round_trips(self):
        cfg = StorageConfig("node")
        cfg.handle_assignment_message(
            {"event": "STREAM_ADDED", "stream": {"id": "a::b/c", "partitions": 1}}
        )
        assert cfg.has_stream("a::b/c", 0)
        assert cfg.get_streams() == [("a::b/c", 0)]
        assert get_key("a::b/c", 0) == "a::b/c::0"


def test_storage_config_endpoint(spark, tmp_path):
    """GET /streams/:id/storage/partitions/:p (StorageConfigEndpoints.ts):
    200 {} when assigned, 404 when not, 400 on a non-numeric partition."""
    import urllib.error
    import urllib.request

    from broker_spark.serving import http as serving_http
    from broker_spark.storage.store import Storage

    cfg = StorageConfig("node", fetch_streams=lambda: [{"id": "s1", "partitions": 1}])
    cfg.refresh()
    st = Storage(spark, str(tmp_path / "sc-log"))
    server = serving_http.serve(st, storage_config=cfg)
    host, port = server.server_address

    def get(path):
        try:
            with urllib.request.urlopen(f"http://{host}:{port}{path}", timeout=60) as r:
                return r.status, r.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    try:
        assert get("/streams/s1/storage/partitions/0") == (200, "{}")
        assert get("/streams/s1/storage/partitions/5")[0] == 404
        assert get("/streams/nope/storage/partitions/0")[0] == 404
        status, body = get("/streams/s1/storage/partitions/zero")
        assert (status, body) == (400, "Partition is not a number: zero")
    finally:
        server.shutdown()


def test_filter_assigned_is_broadcast_semi_join(spark):
    cfg = StorageConfig("node", fetch_streams=lambda: [{"id": "keep", "partitions": 2}])
    cfg.refresh()
    rows = [("keep", 0, 1), ("keep", 1, 2), ("keep", 2, 3), ("drop", 0, 4)]
    df = spark.createDataFrame(rows, "stream_id string, partition int, v int")
    out = cfg.filter_assigned(df)
    assert sorted((r["stream_id"], r["partition"]) for r in out.collect()) == [
        ("keep", 0), ("keep", 1)
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    # empty assignment set keeps nothing
    empty = StorageConfig("node")
    assert empty.filter_assigned(df).count() == 0
