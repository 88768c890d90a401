"""Storage-node routing tests, mirroring test/unit/StorageNodeRegistry.test.ts
(url by address, url by streamId, the three error codes) plus an e2e proxy:
a gateway routes a resend to the owning storage node's HTTP API and parses
the raw response."""

from __future__ import annotations

import datetime
import random

import pytest

from broker_spark.serving import http as serving_http
from broker_spark.serving.routing import (
    GenericError,
    StorageNodeRegistry,
    data_query_endpoint_url,
    fetch_historical,
)
from broker_spark.storage.store import Storage

ADDR1 = "0x1111111111111111111111111111111111111111"
ADDR2 = "0x2222222222222222222222222222222222222222"

STREAM_NODES = {"stream-id-1": [ADDR1], "stream-id-2": [ADDR2]}


def _registry(url1="http://one.mock"):
    return StorageNodeRegistry(
        {ADDR1: url1},
        get_storage_nodes=lambda sid: STREAM_NODES.get(sid, []),
        rng=random.Random(0),
    )


class TestRegistry:
    def test_get_url_by_address(self):
        r = _registry()
        assert r.get_url_by_address(ADDR1) == "http://one.mock"
        assert r.get_url_by_address("0xFFFF") is None

    def test_get_url_by_stream_id(self):
        assert _registry().get_url_by_stream_id("stream-id-1") == "http://one.mock"

    def test_node_not_in_registry(self):
        with pytest.raises(GenericError) as e:
            _registry().get_url_by_stream_id("stream-id-2")
        assert e.value.code == "STORAGE_NODE_NOT_IN_REGISTRY"
        assert str(e.value) == f"Storage node not in registry: {ADDR2}"

    def test_no_storage_nodes(self):
        with pytest.raises(GenericError) as e:
            _registry().get_url_by_stream_id("unassigned")
        assert e.value.code == "NO_STORAGE_NODES"

    def test_list_error(self):
        def boom(sid):
            raise OSError("core api down")

        r = StorageNodeRegistry({ADDR1: "u"}, get_storage_nodes=boom)
        with pytest.raises(GenericError) as e:
            r.get_url_by_stream_id("s")
        assert e.value.code == "STORAGE_NODE_LIST_ERROR"

    def test_create_instance(self):
        assert StorageNodeRegistry.create_instance({"storageNodeRegistry": None}) is None
        r = StorageNodeRegistry.create_instance(
            {"storageNodeRegistry": [{"address": ADDR1, "url": "http://one.mock"}]}
        )
        assert r is not None and r.get_url_by_address(ADDR1) == "http://one.mock"


class TestUrlBuilding:
    def test_last(self):
        url = data_query_endpoint_url(
            {"type": "ResendLastRequest", "streamId": "s/1", "streamPartition": 2,
             "numberLast": 5},
            "http://node/api/v1",
        )
        assert url == "http://node/api/v1/streams/s%2F1/data/partitions/2/last?count=5&format=raw"

    def test_from_skips_nulls(self):
        url = data_query_endpoint_url(
            {"type": "ResendFromRequest", "streamId": "s", "streamPartition": 0,
             "fromTimestamp": 1000},
            "http://node/api/v1",
        )
        assert "publisherId" not in url
        assert "fromTimestamp=1000" in url and "fromSequenceNumber=0" in url

    def test_range_defaults(self):
        url = data_query_endpoint_url(
            {"type": "ResendRangeRequest", "streamId": "s", "streamPartition": 0,
             "fromTimestamp": 1000, "toTimestamp": 2000},
            "http://node/api/v1",
        )
        assert "toSequenceNumber=2147483647" in url

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            data_query_endpoint_url({"type": "Nope", "streamId": "s"}, "b")


ENVELOPE = (
    "stream_id string, partition int, ts timestamp, sequence_no int,"
    " publisher_id string, msg_chain_id string, content string"
)


def test_proxy_resend_end_to_end(spark, tmp_path):
    """A non-storage gateway routes the resend to the owning node over HTTP
    and yields parsed protocol arrays (historicalData.ts:60-96)."""
    st = Storage(spark, str(tmp_path / "routed-log"))
    rows = [
        ("stream-id-1", 0, datetime.datetime(1970, 1, 1, 0, 0, i), 0, "p", "1", "{}")
        for i in (1, 2, 3)
    ]
    st.store(spark.createDataFrame(rows, ENVELOPE))
    storage_node = serving_http.serve(st)
    host, port = storage_node.server_address
    try:
        registry = StorageNodeRegistry(
            {ADDR1: f"http://{host}:{port}"},
            get_storage_nodes=lambda sid: STREAM_NODES.get(sid, []),
        )
        msgs = list(
            fetch_historical(
                registry,
                {"type": "ResendLastRequest", "streamId": "stream-id-1",
                 "streamPartition": 0, "numberLast": 2},
            )
        )
        assert [m[1][2] for m in msgs] == [2000, 3000]
    finally:
        storage_node.shutdown()
