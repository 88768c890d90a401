"""Message signature validation on the publish path.

Mirrors the reference's validator wiring: src/broker.ts:135-139 constructs a
`Utils.CachingStreamMessageValidator` from three info callables
(getStream / isPublisher / isSubscriber) and src/Publisher.ts:34-51 awaits
`streamMessageValidator.validate(streamMessage)` before publishing — an
invalid signature rejects the message before it reaches the network or
storage.

The crypto scheme is injectable: the reference verifies secp256k1 ECDSA via
the public streamr-client-protocol library; this engine ships a
deterministic HMAC-SHA256 scheme for self-contained operation and tests,
with the same policy semantics:

- stream info carries ``requireSignedData``; unsigned messages on such
  streams are rejected,
- signed messages must verify AND the publisher must be an authorized
  publisher of the stream,
- stream info / publisher checks are memoized with a TTL so the hot publish
  path does not re-query the core API per message (the "Caching" in
  CachingStreamMessageValidator).
"""

from __future__ import annotations

import hashlib
import hmac
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from broker_spark.serving.auth import _Memo

# signature_type wire values (public streamr protocol)
SIGNATURE_TYPE_NONE = 0
SIGNATURE_TYPE_HMAC = 2  # stands in for ETH(2) with the test scheme

#: CachingStreamMessageValidator default cacheTimeoutMillis (public
#: streamr-client-protocol): 15 minutes.
CACHE_TIMEOUT_MS = 15 * 60 * 1000


class ValidationError(ValueError):
    """Rejected message; `.message` is the publish-path error text."""


def signature_payload(
    stream_id: str,
    partition: int,
    ts_ms: int,
    sequence_no: int,
    publisher_id: str,
    msg_chain_id: str,
    content: str,
) -> bytes:
    """Canonical signed byte string — the same field concatenation the
    public protocol signs (streamId + partition + timestamp + sequenceNumber
    + publisherId + msgChainId + content)."""
    return (
        f"{stream_id}{partition}{ts_ms}{sequence_no}"
        f"{publisher_id}{msg_chain_id}{content}"
    ).encode("utf-8")


def hmac_sign(secret: bytes, payload: bytes) -> str:
    return hmac.new(secret, payload, hashlib.sha256).hexdigest()


@dataclass
class MessageToValidate:
    """The envelope fields the validator reads (a row-shaped view of
    PublishRequest + assigned partition)."""

    stream_id: str
    partition: int
    ts_ms: int
    sequence_no: int
    publisher_id: str
    msg_chain_id: str
    content: str
    signature_type: int = SIGNATURE_TYPE_NONE
    signature: str | None = None


class StreamMessageValidator:
    """validate() raises ValidationError unless the message passes the
    reference's policy (signature required? verifies? authorized publisher?).

    Parameters mirror the three callables the reference wires in
    (src/broker.ts:136-139); `verify` is the crypto scheme:
    ``verify(publisher_id, payload_bytes, signature) -> bool``.
    """

    def __init__(
        self,
        get_stream: Callable[[str], dict],
        is_publisher: Callable[[str, str], bool],
        verify: Callable[[str, bytes, str], bool],
    ):
        self._get_stream = get_stream
        self._is_publisher = is_publisher
        self._verify = verify

    def validate(self, msg: MessageToValidate) -> None:
        info: dict[str, Any] = self._get_stream(msg.stream_id)
        if msg.signature_type != SIGNATURE_TYPE_NONE and not msg.signature:
            # A declared signature type with a missing signature is a
            # malformed envelope, not an unsigned message — it must never
            # slip through the unsigned path on permissive streams.
            raise ValidationError(
                f"Message on stream {msg.stream_id} declares signature type"
                f" {msg.signature_type} but carries no signature."
            )
        signed = msg.signature_type != SIGNATURE_TYPE_NONE
        if not signed:
            if info.get("requireSignedData"):
                raise ValidationError(
                    f"Stream {msg.stream_id} requires signed data,"
                    " but message was not signed."
                )
            return  # unsigned allowed on this stream
        payload = signature_payload(
            msg.stream_id,
            msg.partition,
            msg.ts_ms,
            msg.sequence_no,
            msg.publisher_id,
            msg.msg_chain_id,
            msg.content,
        )
        if not self._verify(msg.publisher_id, payload, msg.signature):
            raise ValidationError(
                f"Signature validation failed for stream {msg.stream_id}"
                f" publisher {msg.publisher_id}."
            )
        if not self._is_publisher(msg.publisher_id, msg.stream_id):
            raise ValidationError(
                f"{msg.publisher_id} is not a publisher on stream"
                f" {msg.stream_id}."
            )


class CachingStreamMessageValidator(StreamMessageValidator):
    """StreamMessageValidator with TTL-memoized stream-info and
    publisher-membership lookups — per-message validation must not
    re-query the core API (the reference's caching wrapper)."""

    def __init__(
        self,
        get_stream: Callable[[str], dict],
        is_publisher: Callable[[str, str], bool],
        verify: Callable[[str, bytes, str], bool],
        cache_timeout_ms: int = CACHE_TIMEOUT_MS,
    ):
        super().__init__(
            _Memo(get_stream, cache_timeout_ms),
            _Memo(is_publisher, cache_timeout_ms),
            verify,
        )
        self.clear_caches = lambda: (
            self._get_stream.clear(),  # type: ignore[union-attr]
            self._is_publisher.clear(),  # type: ignore[union-attr]
        )


def hmac_validator(
    secrets: dict[str, bytes],
    get_stream: Callable[[str], dict] | None = None,
    is_publisher: Callable[[str, str], bool] | None = None,
    cache_timeout_ms: int = CACHE_TIMEOUT_MS,
) -> CachingStreamMessageValidator:
    """Self-contained validator: per-publisher HMAC secrets, default
    stream info requiring signed data, publishers = secret holders."""

    def _verify(publisher_id: str, payload: bytes, signature: str) -> bool:
        secret = secrets.get(publisher_id)
        if secret is None:
            return False
        return hmac.compare_digest(hmac_sign(secret, payload), signature)

    return CachingStreamMessageValidator(
        get_stream or (lambda sid: {"id": sid, "requireSignedData": True}),
        is_publisher or (lambda pub, sid: pub in secrets),
        _verify,
        cache_timeout_ms,
    )


def ecdsa_validator(
    pubkeys: dict[str, tuple[int, int]],
    get_stream: Callable[[str], dict] | None = None,
    is_publisher: Callable[[str, str], bool] | None = None,
    cache_timeout_ms: int = CACHE_TIMEOUT_MS,
) -> CachingStreamMessageValidator:
    """Asymmetric-scheme validator: publishers sign with secp256k1 ECDSA
    private keys and are checked against a registered-public-key registry
    (broker_spark.serving.ecdsa) — the same policy layer as
    `hmac_validator` under a second scheme, matching the reference's
    secp256k1 verification (src/Publisher.ts:34-51)."""
    from broker_spark.serving.ecdsa import ecdsa_verifier

    return CachingStreamMessageValidator(
        get_stream or (lambda sid: {"id": sid, "requireSignedData": True}),
        is_publisher or (lambda pub, sid: pub in pubkeys),
        ecdsa_verifier(pubkeys),
        cache_timeout_ms,
    )
