"""TCP control-protocol adapter tests: the publish/subscribe/resend
lifecycle over newline-delimited JSON (the WS RequestHandler surface)."""

from __future__ import annotations

import json
import socket

import pytest

from broker_spark.serving.publish import PublishSpool
from broker_spark.serving.tcp import serve_control
from broker_spark.storage.store import Storage
from broker_spark.streaming.fanout import foreach_batch_fanout


class Client:
    def __init__(self, addr):
        self.sock = socket.create_connection(addr, timeout=120)
        self.f = self.sock.makefile("rwb")

    def send(self, obj):
        self.f.write((json.dumps(obj) + "\n").encode())
        self.f.flush()

    def recv(self):
        return json.loads(self.f.readline())

    def recv_until(self, types):
        out = []
        while True:
            msg = self.recv()
            out.append(msg)
            if msg["type"] in types:
                return out

    def close(self):
        self.sock.close()


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    st = Storage(spark, str(tmp_path_factory.mktemp("tcp") / "log"))
    spool = PublishSpool(st, partition_count=1, close_timeout_s=60.0)
    srv = serve_control(st, spool=spool)
    yield srv, spool, st
    srv.shutdown()


def test_publish_then_resend_lifecycle(server):
    srv, spool, _ = server
    c = Client(srv.server_address)
    try:
        for i in range(3):
            c.send({
                "type": "PublishRequest", "requestId": f"p{i}", "streamId": "tcp-s",
                "ts": 1_000 + i * 1000, "sequenceNumber": 0, "publisherId": "u",
                "msgChainId": "1", "content": {"i": i},
            })
            resp = c.recv()
            assert resp["type"] == "PublishResponse" and resp["streamPartition"] == 0
        spool.flush()

        c.send({"type": "ResendLastRequest", "requestId": "r1",
                "streamId": "tcp-s", "streamPartition": 0, "numberLast": 2})
        msgs = c.recv_until({"ResendResponseResent", "ResendResponseNoResend"})
        assert [m["type"] for m in msgs] == [
            "ResendResponseResending", "UnicastMessage", "UnicastMessage",
            "ResendResponseResent",
        ]
        assert [m["streamMessage"][1][2] for m in msgs[1:3]] == [2000, 3000]
    finally:
        c.close()


def test_resend_no_data(server):
    srv, _, _ = server
    c = Client(srv.server_address)
    try:
        c.send({"type": "ResendRangeRequest", "requestId": "r2", "streamId": "empty",
                "streamPartition": 0, "fromTimestamp": 0, "toTimestamp": 10_000})
        msgs = c.recv_until({"ResendResponseResent", "ResendResponseNoResend"})
        assert [m["type"] for m in msgs] == ["ResendResponseNoResend"]
    finally:
        c.close()


def test_subscribe_and_fanout(server, spark):
    srv, _, _ = server
    c = Client(srv.server_address)
    try:
        c.send({"type": "SubscribeRequest", "requestId": "s1",
                "streamId": "live-s", "streamPartition": 0})
        assert c.recv()["type"] == "SubscribeResponse"

        import datetime as dt
        batch = spark.createDataFrame(
            [("live-s", 0, dt.datetime(2024, 1, 1), i, "p", "1", "{}") for i in (1, 0)],
            "stream_id string, partition int, ts timestamp, sequence_no int,"
            " publisher_id string, msg_chain_id string, content string",
        )
        foreach_batch_fanout(srv.registry)(batch, 0)
        got = [c.recv() for _ in range(2)]
        assert all(m["type"] == "BroadcastMessage" for m in got)
        assert [m["streamMessage"][1][3] for m in got] == [0, 1]  # total order
    finally:
        c.close()


def test_invalid_and_unknown_requests(server):
    srv, _, _ = server
    c = Client(srv.server_address)
    try:
        c.send({"type": "Nonsense"})
        msg = c.recv()
        assert msg["type"] == "ErrorResponse" and msg["errorCode"] == "INVALID_REQUEST"

        c.send({"type": "PublishRequest", "streamId": "s", "ts": 10**18,
                "content": {"a": 1}})  # absurdly future -> publish error
        msg = c.recv()
        assert msg["type"] == "ErrorResponse" and msg["errorCode"] == "PUBLISH_FAILED"
        assert "future timestamps are not allowed" in msg["errorMessage"]
    finally:
        c.close()


def test_mqtt_plaintext_wrapping_via_publish(server):
    srv, spool, st = server
    c = Client(srv.server_address)
    try:
        c.send({"type": "PublishRequest", "requestId": "m1", "streamId": "mqtt-s",
                "ts": 1000, "content": "plain text payload"})
        assert c.recv()["type"] == "PublishResponse"
        spool.flush()
        row = st.request_last("mqtt-s", 0, 1).collect()[0]
        assert json.loads(row["content"]) == {"mqttPayload": "plain text payload"}
    finally:
        c.close()
