"""Signature validation on the publish path (src/Publisher.ts:34-51,
validator wiring src/broker.ts:135-139): bad signature rejected, good
signature accepted into the spool, unsigned policy follows
requireSignedData, and the caching wrapper memoizes core-API lookups."""

from __future__ import annotations

import datetime

import pytest

from broker_spark.serving.auth import InMemoryCoreApi, HttpError
from broker_spark.serving.publish import PublishRequest, PublishSpool
from broker_spark.serving.validator import (
    SIGNATURE_TYPE_HMAC,
    CachingStreamMessageValidator,
    MessageToValidate,
    ValidationError,
    hmac_sign,
    hmac_validator,
    signature_payload,
)
from broker_spark.storage.store import Storage

SECRETS = {"0xpub": b"s3cret", "0xother": b"other"}


def _signed(publisher="0xpub", secret=b"s3cret", tamper=False, **over):
    fields = dict(
        stream_id="s1",
        partition=0,
        ts_ms=1000,
        sequence_no=0,
        publisher_id=publisher,
        msg_chain_id="c1",
        content='{"v":1}',
    )
    fields.update(over)
    sig = hmac_sign(
        secret,
        signature_payload(
            fields["stream_id"],
            fields["partition"],
            fields["ts_ms"],
            fields["sequence_no"],
            fields["publisher_id"],
            fields["msg_chain_id"],
            fields["content"],
        ),
    )
    if tamper:
        fields["content"] = '{"v":2}'  # signature no longer covers content
    return MessageToValidate(
        signature_type=SIGNATURE_TYPE_HMAC, signature=sig, **fields
    )


class TestPolicy:
    def test_good_signature_accepted(self):
        hmac_validator(SECRETS).validate(_signed())

    def test_bad_signature_rejected(self):
        with pytest.raises(ValidationError, match="Signature validation failed"):
            hmac_validator(SECRETS).validate(_signed(secret=b"wrong"))

    def test_tampered_content_rejected(self):
        with pytest.raises(ValidationError, match="Signature validation failed"):
            hmac_validator(SECRETS).validate(_signed(tamper=True))

    def test_unknown_publisher_rejected(self):
        with pytest.raises(ValidationError, match="Signature validation failed"):
            hmac_validator(SECRETS).validate(_signed(publisher="0xnobody"))

    def test_unsigned_rejected_when_stream_requires_signatures(self):
        v = hmac_validator(SECRETS)  # default stream info requires signing
        msg = MessageToValidate("s1", 0, 1000, 0, "0xpub", "c1", "{}")
        with pytest.raises(ValidationError, match="requires signed data"):
            v.validate(msg)

    def test_unsigned_allowed_when_stream_does_not_require(self):
        v = hmac_validator(
            SECRETS, get_stream=lambda sid: {"id": sid, "requireSignedData": False}
        )
        v.validate(MessageToValidate("s1", 0, 1000, 0, "0xpub", "c1", "{}"))

    def test_valid_signature_but_not_a_publisher(self):
        v = hmac_validator(SECRETS, is_publisher=lambda pub, sid: False)
        with pytest.raises(ValidationError, match="is not a publisher"):
            v.validate(_signed())


class TestCaching:
    def test_stream_info_memoized(self):
        calls = {"n": 0}

        def get_stream(sid):
            calls["n"] += 1
            return {"id": sid, "requireSignedData": False}

        v = CachingStreamMessageValidator(
            get_stream, lambda p, s: True, lambda p, b, s: True
        )
        msg = MessageToValidate("s1", 0, 1000, 0, "0xpub", "c1", "{}")
        for _ in range(5):
            v.validate(msg)
        assert calls["n"] == 1
        v.clear_caches()
        v.validate(msg)
        assert calls["n"] == 2


class TestSpoolIntegration:
    @pytest.fixture(scope="class")
    def spool(self, spark, tmp_path_factory):
        st = Storage(spark, str(tmp_path_factory.mktemp("val") / "log"))
        sp = PublishSpool(st, validator=hmac_validator(SECRETS))
        yield sp, st
        sp.close()

    def _req(self, signed=True, secret=b"s3cret"):
        content = '{"v":1}'
        sig = (
            hmac_sign(
                secret,
                signature_payload("s1", 0, 1000, 0, "0xpub", "c1", content),
            )
            if signed
            else None
        )
        return PublishRequest(
            stream_id="s1",
            content=content,
            timestamp=1000,
            publisher_id="0xpub",
            msg_chain_id="c1",
            signature_type=SIGNATURE_TYPE_HMAC if signed else 0,
            signature=sig,
        )

    def test_spool_accepts_good_signature(self, spool):
        sp, st = spool
        sp.publish(self._req(), now_ms=1000)
        sp.flush()
        rows = st.request_last("s1", 0, 10).collect()
        assert len(rows) == 1 and rows[0]["content"] == '{"v":1}'

    def test_spool_rejects_bad_signature(self, spool):
        sp, _ = spool
        with pytest.raises(ValidationError, match="Signature validation failed"):
            sp.publish(self._req(secret=b"wrong"), now_ms=1000)

    def test_spool_rejects_unsigned_on_required_stream(self, spool):
        sp, _ = spool
        with pytest.raises(ValidationError, match="requires signed data"):
            sp.publish(self._req(signed=False), now_ms=1000)


class TestInMemoryCoreApi:
    def test_recorded_grants_and_404(self):
        api = InMemoryCoreApi()
        api.create_stream("s1")
        api.grant("s1", "tok", "stream_subscribe")
        f = api.fetcher()
        assert f.authenticate("s1", "tok", "stream_subscribe")["id"] == "s1"
        with pytest.raises(HttpError) as e:
            f.authenticate("s1", "tok", "stream_publish")
        assert e.value.code == 403
        with pytest.raises(HttpError) as e:
            f.authenticate("nope", "tok", "stream_subscribe")
        assert e.value.code == 404
        api.revoke("s1", "tok")
        f2 = api.fetcher()  # fresh fetcher: no memoized grant
        with pytest.raises(HttpError) as e:
            f2.authenticate("s1", "tok", "stream_subscribe")
        assert e.value.code == 403


class TestGatewayValidation:
    def test_bad_signature_maps_to_400(self, spark, tmp_path):
        """A validator rejection on POST surfaces as the 400 error text,
        not a 500 (reference: FailedToPublishError -> client error)."""
        import urllib.error
        import urllib.request

        from broker_spark.serving import http as serving_http

        st = Storage(spark, str(tmp_path / "gwlog"))
        spool = PublishSpool(st, validator=hmac_validator(SECRETS))
        server = serving_http.serve(st, spool=spool)
        host, port = server.server_address
        try:
            req = urllib.request.Request(
                f"http://{host}:{port}/streams/s1/data?ts=1000"
                "&address=0xpub&msgChainId=c1&signatureType=2&signature=beef",
                data=b'{"v":1}',
                method="POST",
            )
            try:
                urllib.request.urlopen(req, timeout=120)
                raise AssertionError("expected HTTP error")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "Signature validation failed" in e.read().decode()
        finally:
            spool.close()
            server.shutdown()


class TestMalformedEnvelope:
    def test_declared_type_with_missing_signature_rejected(self):
        """signature_type set but signature absent is a malformed envelope
        (ADVICE r3): it must NOT fall through the unsigned path, even on
        streams that allow unsigned data."""
        v = hmac_validator(
            SECRETS, get_stream=lambda sid: {"id": sid, "requireSignedData": False}
        )
        msg = MessageToValidate(
            "s1", 0, 1000, 0, "0xpub", "c1", "{}",
            signature_type=SIGNATURE_TYPE_HMAC, signature=None,
        )
        with pytest.raises(ValidationError, match="carries no signature"):
            v.validate(msg)
        msg.signature = ""
        with pytest.raises(ValidationError, match="carries no signature"):
            v.validate(msg)


class TestEcdsaScheme:
    """The same policy matrix under the asymmetric secp256k1 scheme
    (serving/ecdsa.py) — the validator's `verify` injection point proven
    with a second, reference-shaped implementation."""

    PRIV = {"0xpub": 0xC0FFEE, "0xother": 0xB0BACAFE}

    @classmethod
    def _pubkeys(cls):
        from broker_spark.serving import ecdsa

        return {pid: ecdsa.pubkey(k) for pid, k in cls.PRIV.items()}

    @classmethod
    def _signed(cls, publisher="0xpub", signer=None, tamper=False, **over):
        from broker_spark.serving import ecdsa

        fields = dict(
            stream_id="s1", partition=0, ts_ms=1000, sequence_no=0,
            publisher_id=publisher, msg_chain_id="c1", content='{"v":1}',
        )
        fields.update(over)
        payload = signature_payload(
            fields["stream_id"], fields["partition"], fields["ts_ms"],
            fields["sequence_no"], fields["publisher_id"],
            fields["msg_chain_id"], fields["content"],
        )
        sig = ecdsa.sign(signer or cls.PRIV[publisher], payload)
        if tamper:
            fields["content"] = '{"v":2}'
        return MessageToValidate(
            signature_type=SIGNATURE_TYPE_HMAC, signature=sig, **fields
        )

    def _validator(self, **kw):
        from broker_spark.serving.validator import ecdsa_validator

        return ecdsa_validator(self._pubkeys(), **kw)

    def test_good_signature_accepted(self):
        self._validator().validate(self._signed())

    def test_wrong_key_rejected(self):
        with pytest.raises(ValidationError, match="Signature validation failed"):
            self._validator().validate(
                self._signed(signer=self.PRIV["0xother"])
            )

    def test_tampered_content_rejected(self):
        with pytest.raises(ValidationError, match="Signature validation failed"):
            self._validator().validate(self._signed(tamper=True))

    def test_unknown_publisher_rejected(self):
        with pytest.raises(ValidationError, match="Signature validation failed"):
            self._validator().validate(
                self._signed(publisher="0xnobody", signer=0xC0FFEE)
            )

    def test_unsigned_policy_follows_stream_info(self):
        v = self._validator()
        with pytest.raises(ValidationError, match="requires signed data"):
            v.validate(MessageToValidate("s1", 0, 1000, 0, "0xpub", "c1", "{}"))
        open_v = self._validator(
            get_stream=lambda sid: {"id": sid, "requireSignedData": False}
        )
        open_v.validate(MessageToValidate("s1", 0, 1000, 0, "0xpub", "c1", "{}"))

    def test_valid_signature_but_not_a_publisher(self):
        v = self._validator(is_publisher=lambda pub, sid: False)
        with pytest.raises(ValidationError, match="is not a publisher"):
            v.validate(self._signed())


class TestEcdsaPrimitives:
    def test_pubkey_of_one_is_generator(self):
        from broker_spark.serving import ecdsa

        assert ecdsa.pubkey(1) == (ecdsa.Gx, ecdsa.Gy)

    def test_sign_verify_roundtrip_and_determinism(self):
        from broker_spark.serving import ecdsa

        pub = ecdsa.pubkey(0xDEADBEEF)
        sig1 = ecdsa.sign(0xDEADBEEF, b"payload")
        sig2 = ecdsa.sign(0xDEADBEEF, b"payload")
        assert sig1 == sig2  # RFC 6979 nonce: reproducible
        assert ecdsa.verify(pub, b"payload", sig1)
        assert not ecdsa.verify(pub, b"other", sig1)

    def test_low_s_canonical_form(self):
        from broker_spark.serving import ecdsa

        for i in range(1, 8):
            sig = ecdsa.sign(i * 7919, bytes([i]) * 10)
            s = int.from_bytes(bytes.fromhex(sig)[32:], "big")
            assert 0 < s <= ecdsa.N // 2

    def test_malformed_signatures_fail_closed(self):
        from broker_spark.serving import ecdsa

        pub = ecdsa.pubkey(42)
        for bad in ("", "zz", "ab" * 63, "ab" * 65, "00" * 64):
            assert not ecdsa.verify(pub, b"x", bad)
