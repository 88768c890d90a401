"""Pure-Python secp256k1 ECDSA — a second, asymmetric signature scheme for
the publish-path validator, so the deterministic HMAC stand-in is no longer
the only implementation behind the injectable `verify` interface
(broker_spark/serving/validator.py).

The reference verifies secp256k1 ECDSA signatures produced by the public
streamr protocol library before accepting a publish (src/Publisher.ts:34-51
awaits validate(); src/broker.ts:135-139 wires the validator).  This module
implements textbook ECDSA over the public SEC2 secp256k1 parameters with
stdlib hashing only:

- curve arithmetic in Jacobian coordinates (double-and-add scalar mult),
- deterministic nonces per RFC 6979 (HMAC-SHA256 drbg), so signing is
  reproducible — no RNG in tests,
- low-s normalization (s <= n/2), the canonical-form rule secp256k1
  consumers enforce to kill signature malleability.

Publishers are identified by a registered public key (an id -> pubkey
registry), not by address recovery: keccak256 (the Ethereum address hash)
is not in hashlib, and inventing an address scheme here would be fake
fidelity.  The validator policy layer is unchanged either way.
"""

from __future__ import annotations

import hashlib
import hmac

# SEC2 secp256k1 domain parameters (public constants)
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
Gx = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
Gy = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

_INF = (0, 0, 0)  # Jacobian point at infinity (Z == 0)


def _jac_double(pt):
    x, y, z = pt
    if z == 0 or y == 0:
        return _INF
    s = (4 * x * y * y) % P
    m = (3 * x * x) % P  # a == 0 for secp256k1
    x3 = (m * m - 2 * s) % P
    y3 = (m * (s - x3) - 8 * y * y * y * y) % P
    z3 = (2 * y * z) % P
    return (x3, y3, z3)


def _jac_add(a, b):
    if a[2] == 0:
        return b
    if b[2] == 0:
        return a
    x1, y1, z1 = a
    x2, y2, z2 = b
    z1z1 = (z1 * z1) % P
    z2z2 = (z2 * z2) % P
    u1 = (x1 * z2z2) % P
    u2 = (x2 * z1z1) % P
    s1 = (y1 * z2 * z2z2) % P
    s2 = (y2 * z1 * z1z1) % P
    if u1 == u2:
        if s1 != s2:
            return _INF
        return _jac_double(a)
    h = (u2 - u1) % P
    r = (s2 - s1) % P
    h2 = (h * h) % P
    h3 = (h * h2) % P
    u1h2 = (u1 * h2) % P
    x3 = (r * r - h3 - 2 * u1h2) % P
    y3 = (r * (u1h2 - x3) - s1 * h3) % P
    z3 = (h * z1 * z2) % P
    return (x3, y3, z3)


def _jac_mul(k: int, pt) -> tuple:
    acc = _INF
    add = pt
    while k:
        if k & 1:
            acc = _jac_add(acc, add)
        add = _jac_double(add)
        k >>= 1
    return acc


def _to_affine(pt) -> tuple[int, int] | None:
    x, y, z = pt
    if z == 0:
        return None
    zinv = pow(z, P - 2, P)
    zinv2 = (zinv * zinv) % P
    return ((x * zinv2) % P, (y * zinv2 * zinv) % P)


def pubkey(priv: int) -> tuple[int, int]:
    """Affine public point priv * G."""
    if not 0 < priv < N:
        raise ValueError("private key out of range")
    out = _to_affine(_jac_mul(priv, (Gx, Gy, 1)))
    assert out is not None
    return out


def _hash_int(payload: bytes) -> int:
    return int.from_bytes(hashlib.sha256(payload).digest(), "big") % N


def _rfc6979_k(priv: int, h1: bytes) -> int:
    """Deterministic nonce (RFC 6979 §3.2, HMAC-SHA256)."""
    x = priv.to_bytes(32, "big")
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = hmac.new(k, v + b"\x00" + x + h1, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    k = hmac.new(k, v + b"\x01" + x + h1, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(k, v, hashlib.sha256).digest()
        cand = int.from_bytes(v, "big")
        if 0 < cand < N:
            return cand
        k = hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()


def sign(priv: int, payload: bytes) -> str:
    """Hex r||s (64 bytes), low-s normalized, deterministic."""
    z = _hash_int(payload)
    h1 = hashlib.sha256(payload).digest()
    while True:
        k = _rfc6979_k(priv, h1)
        point = _to_affine(_jac_mul(k, (Gx, Gy, 1)))
        assert point is not None
        r = point[0] % N
        if r == 0:
            h1 = hashlib.sha256(h1).digest()  # re-derive; ~never happens
            continue
        s = (pow(k, N - 2, N) * (z + r * priv)) % N
        if s == 0:
            h1 = hashlib.sha256(h1).digest()
            continue
        if s > N // 2:
            s = N - s  # canonical low-s form
        return r.to_bytes(32, "big").hex() + s.to_bytes(32, "big").hex()


def verify(pub: tuple[int, int], payload: bytes, signature: str) -> bool:
    """Standard ECDSA verification; malformed encodings return False."""
    try:
        raw = bytes.fromhex(signature)
    except (ValueError, TypeError):
        return False
    if len(raw) != 64:
        return False
    r = int.from_bytes(raw[:32], "big")
    s = int.from_bytes(raw[32:], "big")
    if not (0 < r < N and 0 < s < N):
        return False
    z = _hash_int(payload)
    w = pow(s, N - 2, N)
    u1 = (z * w) % N
    u2 = (r * w) % N
    pt = _jac_add(_jac_mul(u1, (Gx, Gy, 1)), _jac_mul(u2, (pub[0], pub[1], 1)))
    aff = _to_affine(pt)
    if aff is None:
        return False
    return aff[0] % N == r


def ecdsa_verifier(pubkeys: dict[str, tuple[int, int]]):
    """`verify(publisher_id, payload, signature)` callable for
    StreamMessageValidator: signatures check against the publisher's
    registered public key; unknown publishers fail closed."""

    def _verify(publisher_id: str, payload: bytes, signature: str) -> bool:
        pub = pubkeys.get(publisher_id)
        if pub is None:
            return False
        return verify(pub, payload, signature)

    return _verify
