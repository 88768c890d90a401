"""REST authentication: StreamFetcher permission checks with memoization
plus the authenticator middleware's header parsing and error mapping.

Mirrors src/StreamFetcher.ts (15-min memoized checkPermission/fetch, 1-min
memoized authenticate, failed entries evicted so errors are not cached) and
src/http/RequestAuthenticatorMiddleware.ts:11-53 (Bearer header parsing,
403 -> "Authentication failed.", 404 -> "Stream <id> not found.",
other -> "Request failed." with status err.code or 503).

The core-API transport is injectable: pass `get_permissions(stream_id,
session_token) -> list[{"operation": ...}]` and `get_stream(stream_id,
session_token) -> dict` callables (each may raise HttpError to model a
non-2xx core-api response).  Defaults allow everything, preserving the
open-gateway behavior when no core API is configured.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

# src/StreamFetcher.ts:11-12
MAX_AGE_MS = 15 * 60 * 1000
MAX_AGE_MINUTE_MS = 60 * 1000


class HttpError(Exception):
    """src/errors/HttpError.ts — carries the upstream status code."""

    def __init__(self, code: int, method: str = "GET", url: str = ""):
        super().__init__(f"{method} {url} responded with status code {code}")
        self.code = code
        self.method = method
        self.url = url


class _Memo:
    """memoizee-style cache: positional-args key, per-entry max age.
    Only successes are stored; callers evict explicitly on failure
    (StreamFetcher.ts:106-109,141-144 delete the entry before re-raising,
    so errors are never served from cache)."""

    def __init__(self, fn: Callable, max_age_ms: int):
        self._fn = fn
        self._max_age_s = max_age_ms / 1000.0
        self._lock = threading.Lock()
        self._entries: dict[tuple, tuple[float, object]] = {}

    def __call__(self, *key):
        now = time.monotonic()
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None and now - hit[0] < self._max_age_s:
                return hit[1]
        value = self._fn(*key)  # outside the lock: no stampede protection,
        # matching memoizee's per-promise behavior closely enough
        with self._lock:
            self._entries[key] = (now, value)
        return value

    def delete(self, *key) -> None:
        with self._lock:
            self._entries.pop(key, None)

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()


def _allow_all_permissions(stream_id: str, session_token: str | None) -> list[dict]:
    return [{"operation": op} for op in ("stream_subscribe", "stream_publish")]


def _stream_stub(stream_id: str, session_token: str | None) -> dict:
    return {"id": stream_id, "partitions": 1}


class InMemoryCoreApi:
    """A recorded, REST-shaped core API: per-(stream, token) permission
    grants and stream registry, raising the same HttpErrors the real
    endpoints produce (403 no grant, 404 unknown stream).  Use it to run a
    *closed* gateway without a real core API — the default StreamFetcher
    stubs keep the open-gateway behavior.

    Models GET /streams/:id/permissions/me and GET /streams/:id
    (src/StreamFetcher.ts:96-113,127-158).
    """

    def __init__(self):
        self._streams: dict[str, dict] = {}
        self._grants: dict[tuple[str, str | None], set[str]] = {}

    def create_stream(self, stream_id: str, partitions: int = 1) -> None:
        self._streams[stream_id] = {"id": stream_id, "partitions": partitions}

    def grant(
        self, stream_id: str, session_token: str | None, *operations: str
    ) -> None:
        self._grants.setdefault((stream_id, session_token), set()).update(operations)

    def revoke(self, stream_id: str, session_token: str | None) -> None:
        self._grants.pop((stream_id, session_token), None)

    def get_permissions(self, stream_id: str, session_token: str | None) -> list[dict]:
        if stream_id not in self._streams:
            raise HttpError(404, "GET", f"/streams/{stream_id}/permissions/me")
        ops = self._grants.get((stream_id, session_token), set())
        return [{"operation": op} for op in sorted(ops)]

    def get_stream(self, stream_id: str, session_token: str | None) -> dict:
        if stream_id not in self._streams:
            raise HttpError(404, "GET", f"/streams/{stream_id}")
        return self._streams[stream_id]

    def fetcher(self) -> "StreamFetcher":
        return StreamFetcher(self.get_permissions, self.get_stream)


class StreamFetcher:
    """Memoized permission checks against an injectable core API."""

    def __init__(
        self,
        get_permissions: Callable[[str, str | None], list[dict]] = _allow_all_permissions,
        get_stream: Callable[[str, str | None], dict] = _stream_stub,
    ):
        self._get_permissions = get_permissions
        self._get_stream = get_stream
        self.check_permission = _Memo(self._check_permission, MAX_AGE_MS)
        self.fetch = _Memo(self._fetch, MAX_AGE_MS)
        self.authenticate = _Memo(self._authenticate, MAX_AGE_MINUTE_MS)

    # StreamFetcher.ts:127-158
    def _check_permission(
        self, stream_id: str, session_token: str | None, operation: str
    ) -> bool:
        if stream_id is None:
            raise ValueError("_checkPermission: streamId can not be null!")
        try:
            permissions = self._get_permissions(stream_id, session_token)
        except HttpError:
            self.check_permission.delete(stream_id, session_token, operation)
            raise
        if any(p.get("operation") == operation for p in permissions):
            return True
        self.check_permission.delete(stream_id, session_token, operation)
        raise HttpError(403, "GET", f"/streams/{stream_id}/permissions/me")

    # StreamFetcher.ts:96-113
    def _fetch(self, stream_id: str, session_token: str | None) -> dict:
        try:
            return self._get_stream(stream_id, session_token)
        except HttpError:
            self.fetch.delete(stream_id, session_token)
            raise

    # StreamFetcher.ts:87-90
    def _authenticate(
        self, stream_id: str, session_token: str | None, operation: str
    ) -> dict:
        self.check_permission(stream_id, session_token, operation)
        return self.fetch(stream_id, session_token)


MALFORMED_HEADER_MSG = (
    'Authorization header malformed. Should be of form "Bearer session-token".'
)


def parse_authorization_header(value: str | None) -> tuple[bool, str | None]:
    """RequestAuthenticatorMiddleware.ts:14-29 — (ok, session_token);
    ok=False means 400 with MALFORMED_HEADER_MSG."""
    if value is None:
        return True, None
    if not value.lower().startswith("bearer "):
        return False, None
    return True, value[7:].strip()


def authenticate_request(
    fetcher: StreamFetcher,
    stream_id: str,
    authorization_header: str | None,
    permission: str = "stream_subscribe",
) -> tuple[int, dict]:
    """Run the middleware: returns (200, stream_json) on success, else
    (status, {"error": msg}) with the reference's exact error mapping
    (RequestAuthenticatorMiddleware.ts:31-53)."""
    ok, session_token = parse_authorization_header(authorization_header)
    if not ok:
        return 400, {"error": MALFORMED_HEADER_MSG}
    try:
        stream_json = fetcher.authenticate(stream_id, session_token, permission)
    except HttpError as err:
        if err.code == 403:
            msg = "Authentication failed."
        elif err.code == 404:
            msg = f"Stream {stream_id} not found."
        else:
            msg = "Request failed."
        return (err.code or 503), {"error": msg}
    except Exception:  # noqa: BLE001 — core API unreachable et al.
        return 503, {"error": "Request failed."}
    return 200, stream_json
