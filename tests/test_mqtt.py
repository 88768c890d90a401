"""MQTT adapter tests, mirroring test/integration/mqtt.test.ts (publish ->
store -> resend round trip, plaintext wrapping, pub/sub fan-out) and
test/integration/mqtt-error-handling.test.ts (missing password refused)."""

from __future__ import annotations

import json
import socket
import struct

import pytest

from broker_spark.serving import mqtt
from broker_spark.serving.publish import PublishSpool
from broker_spark.storage.store import Storage


class MiniClient:
    """Just enough MQTT 3.1.1 to exercise the server."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.rfile = self.sock.makefile("rb")

    def send(self, pkt: bytes) -> None:
        self.sock.sendall(pkt)

    def recv(self):
        pkt = mqtt.read_packet(self.rfile)
        assert pkt is not None, "connection closed"
        return pkt

    def connect(self, client_id: str, password: str | None) -> int:
        self.send(mqtt.encode_connect(client_id, username="u", password=password))
        ptype, _, body = self.recv()
        assert ptype == mqtt.CONNACK
        return body[1]  # return code

    def close(self) -> None:
        self.sock.close()


@pytest.fixture()
def server(spark, tmp_path):
    st = Storage(spark, str(tmp_path / "mqtt-log"), bucket_ms=3_600_000)
    spool = PublishSpool(st, partition_count=4, close_timeout_s=60.0)
    srv = mqtt.serve_mqtt(spool)
    yield srv, st, spool
    spool.close()
    srv.shutdown()


def test_connect_without_password_refused(server):
    srv, _, _ = server
    c = MiniClient(srv.server_address[1])
    assert c.connect("c1", password=None) == mqtt.RC_BAD_USERNAME_OR_PASSWORD
    c.close()


def test_connect_with_password_accepted(server):
    srv, _, _ = server
    c = MiniClient(srv.server_address[1])
    assert c.connect("c1", password="key") == mqtt.RC_ACCEPTED
    c.close()


def test_publish_store_resend_round_trip(server):
    """mqtt.test.ts:251 — MQTT publish lands in storage with a random
    partition, server-assigned global sequence, client id as publisher and
    chain id, and plaintext wrapped as {"mqttPayload": ...}."""
    srv, st, spool = server
    c = MiniClient(srv.server_address[1])
    assert c.connect("client-7", password="key") == mqtt.RC_ACCEPTED

    # qos 1 JSON publish -> PUBACK with the same packet id
    c.send(mqtt.encode_publish("mqtt-s", b'{"key": 1}', qos=1, packet_id=42))
    ptype, _, body = c.recv()
    assert ptype == mqtt.PUBACK and struct.unpack(">H", body)[0] == 42

    # qos 0 plaintext publish (no ack) — PINGREQ barrier: packets are
    # handled in order, so PINGRESP means the publish was processed
    c.send(mqtt.encode_publish("mqtt-s", b"plain text"))
    c.send(mqtt.encode_packet(mqtt.PINGREQ, 0, b""))
    ptype, _, _ = c.recv()
    assert ptype == mqtt.PINGRESP
    c.close()
    spool.flush()

    rows = []
    for p in range(4):
        rows += st.request_last("mqtt-s", p, 10).collect()
    rows.sort(key=lambda r: r["sequence_no"])
    assert len(rows) == 2
    assert [r["sequence_no"] for r in rows] == [1, 2]  # global counter from 1
    assert all(r["publisher_id"] == "client-7" for r in rows)
    assert all(r["msg_chain_id"] == "client-7" for r in rows)
    assert all(0 <= r["partition"] < 4 for r in rows)
    assert json.loads(rows[0]["content"]) == {"key": 1}
    assert json.loads(rows[1]["content"]) == {"mqttPayload": "plain text"}


def test_subscribe_receives_published_messages(server):
    """Subscriber gets a qos-0 PUBLISH whose payload is the content JSON,
    regardless of the message's (random) partition."""
    srv, _, _ = server
    sub = MiniClient(srv.server_address[1])
    assert sub.connect("sub-1", password="key") == mqtt.RC_ACCEPTED
    sub.send(mqtt.encode_subscribe(7, ["fan-s"]))
    ptype, _, body = sub.recv()
    assert ptype == mqtt.SUBACK and struct.unpack_from(">H", body)[0] == 7

    pub = MiniClient(srv.server_address[1])
    assert pub.connect("pub-1", password="key") == mqtt.RC_ACCEPTED
    pub.send(mqtt.encode_publish("fan-s", b'{"key": 2}'))

    ptype, flags, body = sub.recv()
    assert ptype == mqtt.PUBLISH
    msg = mqtt.parse_publish(flags, body)
    assert msg["topic"] == "fan-s"
    assert json.loads(msg["payload"]) == {"key": 2}

    # unsubscribe stops delivery
    sub.send(mqtt.encode_unsubscribe(8, ["fan-s"]))
    ptype, _, _ = sub.recv()
    assert ptype == mqtt.UNSUBACK
    pub.close()
    sub.close()


def test_pingreq_pingresp(server):
    srv, _, _ = server
    c = MiniClient(srv.server_address[1])
    assert c.connect("c1", password="key") == mqtt.RC_ACCEPTED
    c.send(mqtt.encode_packet(mqtt.PINGREQ, 0, b""))
    ptype, _, _ = c.recv()
    assert ptype == mqtt.PINGRESP
    c.close()


def test_unauthorized_publish_gets_not_authorized(server):
    srv, _, _ = server

    class DenyBroker(mqtt.MqttBroker):
        def authenticate(self, stream_id, token, operation):
            return operation != "stream_publish"

    srv.broker.__class__ = DenyBroker
    try:
        c = MiniClient(srv.server_address[1])
        assert c.connect("c1", password="key") == mqtt.RC_ACCEPTED
        c.send(mqtt.encode_publish("s", b"{}"))
        ptype, _, body = c.recv()
        assert ptype == mqtt.CONNACK and body[1] == mqtt.RC_NOT_AUTHORIZED
        c.close()
    finally:
        srv.broker.__class__ = mqtt.MqttBroker


class TestTopicMatching:
    def test_exact(self):
        assert mqtt.topic_matches("a/b", "a/b")
        assert not mqtt.topic_matches("a/b", "a/c")

    def test_plus_one_level(self):
        assert mqtt.topic_matches("a/+/c", "a/b/c")
        assert not mqtt.topic_matches("a/+/c", "a/b/d")
        assert not mqtt.topic_matches("a/+", "a/b/c")
        assert mqtt.topic_matches("+", "a")
        assert not mqtt.topic_matches("+", "a/b")

    def test_hash_remaining_levels(self):
        assert mqtt.topic_matches("a/#", "a/b/c")
        assert mqtt.topic_matches("a/#", "a")  # parent level (spec §4.7.1.2)
        assert mqtt.topic_matches("#", "a/b")
        assert not mqtt.topic_matches("a/#/c", "a/b/c")  # '#' must be last


def test_wildcard_subscription_receives_matching_streams(server):
    srv, _, _ = server
    port = srv.server_address[1]
    sub = MiniClient(port)
    assert sub.connect("sub", "key") == mqtt.RC_ACCEPTED
    sub.send(mqtt.encode_subscribe(5, ["sensors/+/temp"]))
    ptype, _, body = sub.recv()
    assert ptype == mqtt.SUBACK

    pub = MiniClient(port)
    assert pub.connect("pub", "key") == mqtt.RC_ACCEPTED
    pub.send(mqtt.encode_publish("sensors/a/temp", b'{"t": 20}'))
    pub.send(mqtt.encode_publish("sensors/a/hum", b'{"h": 50}'))
    pub.send(mqtt.encode_publish("sensors/b/temp", b'{"t": 21}'))

    got = []
    for _ in range(2):
        ptype, flags, body = sub.recv()
        assert ptype == mqtt.PUBLISH
        got.append(mqtt.parse_publish(flags, body)["topic"])
    assert got == ["sensors/a/temp", "sensors/b/temp"]
    sub.close()
    pub.close()


def test_retained_message_delivered_on_subscribe(server):
    srv, _, _ = server
    port = srv.server_address[1]
    pub = MiniClient(port)
    assert pub.connect("pub", "key") == mqtt.RC_ACCEPTED
    # qos=1: the PUBACK round-trip is the synchronization barrier that
    # guarantees the broker stored the retained message before we subscribe
    pub.send(
        mqtt.encode_publish("status/x", b'{"up": true}', qos=1, packet_id=77, retain=True)
    )
    ptype, _, _ = pub.recv()
    assert ptype == mqtt.PUBACK

    # late subscriber still gets the retained last-known-good, retain=1
    sub = MiniClient(port)
    assert sub.connect("sub", "key") == mqtt.RC_ACCEPTED
    sub.send(mqtt.encode_subscribe(9, ["status/#"]))
    ptype, _, _ = sub.recv()  # SUBACK
    assert ptype == mqtt.SUBACK
    ptype, flags, body = sub.recv()
    assert ptype == mqtt.PUBLISH
    msg = mqtt.parse_publish(flags, body)
    assert msg["topic"] == "status/x" and msg["retain"]
    assert json.loads(msg["payload"]) == {"up": True}
    sub.close()

    # zero-byte retained payload clears it (again PUBACK-fenced)
    pub.send(mqtt.encode_publish("status/x", b"", qos=1, packet_id=78, retain=True))
    ptype, _, _ = pub.recv()
    assert ptype == mqtt.PUBACK
    sub2 = MiniClient(port)
    assert sub2.connect("sub2", "key") == mqtt.RC_ACCEPTED
    sub2.send(mqtt.encode_subscribe(10, ["status/#"]))
    ptype, _, _ = sub2.recv()
    assert ptype == mqtt.SUBACK
    sub2.sock.settimeout(0.5)
    with pytest.raises(TimeoutError):
        sub2.recv()
    sub2.close()
    pub.close()


def test_qos1_delivery_tracked_until_puback(server):
    srv, _, _ = server
    port = srv.server_address[1]
    sub = MiniClient(port)
    assert sub.connect("sub", "key") == mqtt.RC_ACCEPTED
    sub.send(mqtt.encode_subscribe(3, ["q1-s"], qos=1))
    ptype, _, body = sub.recv()
    assert ptype == mqtt.SUBACK and body[2:] == b"\x01"  # granted qos 1

    pub = MiniClient(port)
    assert pub.connect("pub", "key") == mqtt.RC_ACCEPTED
    pub.send(mqtt.encode_publish("q1-s", b'{"n": 1}'))
    ptype, flags, body = sub.recv()
    assert ptype == mqtt.PUBLISH
    msg = mqtt.parse_publish(flags, body)
    assert msg["qos"] == 1 and msg["packet_id"] is not None

    # the delivery is in flight until we PUBACK it
    broker = srv.broker
    conn = next(iter(broker._shelves["q1-s"]))
    assert msg["packet_id"] in conn.inflight
    sub.send(mqtt.encode_packet(mqtt.PUBACK, 0, struct.pack(">H", msg["packet_id"])))
    import time as _t

    for _ in range(100):
        if msg["packet_id"] not in conn.inflight:
            break
        _t.sleep(0.02)
    assert msg["packet_id"] not in conn.inflight
    sub.close()
    pub.close()
