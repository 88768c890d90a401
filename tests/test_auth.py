"""Auth middleware tests, mirroring the reference's
RequestAuthenticatorMiddleware + StreamFetcher unit suites: Bearer header
parsing, 403/404/503 error mapping, and the 15-min permission memoize with
failed entries evicted (test/unit/http/DataQueryEndpoints.test.ts auth
cases, test/unit/StreamFetcher.test.ts cache cases)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from broker_spark.serving import http as serving_http
from broker_spark.serving.auth import (
    MALFORMED_HEADER_MSG,
    HttpError,
    StreamFetcher,
    authenticate_request,
)
from broker_spark.storage.store import Storage


class CountingApi:
    """Injectable core API that records calls and can be reconfigured."""

    def __init__(self, operations=("stream_subscribe", "stream_publish")):
        self.operations = list(operations)
        self.error: HttpError | None = None
        self.permission_calls = 0
        self.stream_calls = 0

    def get_permissions(self, stream_id, session_token):
        self.permission_calls += 1
        if self.error is not None:
            raise self.error
        return [{"operation": op} for op in self.operations]

    def get_stream(self, stream_id, session_token):
        self.stream_calls += 1
        return {"id": stream_id, "partitions": 1}


def _fetcher(api: CountingApi) -> StreamFetcher:
    return StreamFetcher(get_permissions=api.get_permissions, get_stream=api.get_stream)


class TestMiddlewareMapping:
    def test_success_returns_stream_json(self):
        status, payload = authenticate_request(
            _fetcher(CountingApi()), "s1", "Bearer tok-1"
        )
        assert (status, payload) == (200, {"id": "s1", "partitions": 1})

    def test_malformed_header_400(self):
        status, payload = authenticate_request(
            _fetcher(CountingApi()), "s1", "Token abc"
        )
        assert status == 400
        assert payload == {"error": MALFORMED_HEADER_MSG}

    def test_missing_permission_403(self):
        api = CountingApi(operations=["stream_publish"])  # no subscribe
        status, payload = authenticate_request(_fetcher(api), "s1", None)
        assert (status, payload) == (403, {"error": "Authentication failed."})

    def test_unknown_stream_404(self):
        api = CountingApi()
        api.error = HttpError(404)
        status, payload = authenticate_request(_fetcher(api), "nope", None)
        assert (status, payload) == (404, {"error": "Stream nope not found."})

    def test_other_upstream_error_maps_to_request_failed(self):
        api = CountingApi()
        api.error = HttpError(500)
        status, payload = authenticate_request(_fetcher(api), "s1", None)
        assert (status, payload) == (500, {"error": "Request failed."})

    def test_core_api_unreachable_503(self):
        fetcher = StreamFetcher(
            get_permissions=lambda s, t: (_ for _ in ()).throw(OSError("down"))
        )
        status, payload = authenticate_request(fetcher, "s1", None)
        assert (status, payload) == (503, {"error": "Request failed."})

    def test_bearer_prefix_case_insensitive_and_trimmed(self):
        api = CountingApi()
        fetcher = _fetcher(api)
        seen = {}
        api.get_stream_orig = api.get_stream

        def spy_stream(stream_id, session_token):
            seen["token"] = session_token
            return api.get_stream_orig(stream_id, session_token)

        fetcher = StreamFetcher(get_permissions=api.get_permissions, get_stream=spy_stream)
        status, _ = authenticate_request(fetcher, "s1", "BEARER   tok-2  ")
        assert status == 200
        assert seen["token"] == "tok-2"


class TestMemoization:
    def test_permission_check_cached_within_max_age(self):
        api = CountingApi()
        fetcher = _fetcher(api)
        for _ in range(5):
            assert authenticate_request(fetcher, "s1", "Bearer t")[0] == 200
        # authenticate memo (1 min) absorbs repeats entirely
        assert api.permission_calls == 1
        assert api.stream_calls == 1

    def test_distinct_tokens_are_distinct_entries(self):
        api = CountingApi()
        fetcher = _fetcher(api)
        authenticate_request(fetcher, "s1", "Bearer a")
        authenticate_request(fetcher, "s1", "Bearer b")
        assert api.permission_calls == 2

    def test_failures_are_not_cached(self):
        api = CountingApi()
        api.error = HttpError(403)
        fetcher = _fetcher(api)
        assert authenticate_request(fetcher, "s1", None)[0] == 403
        assert authenticate_request(fetcher, "s1", None)[0] == 403
        assert api.permission_calls == 2  # evicted on failure, re-checked

        api.error = None  # permission granted upstream -> next check passes
        assert authenticate_request(fetcher, "s1", None)[0] == 200

    def test_expired_entries_refetch(self, monkeypatch):
        api = CountingApi()
        fetcher = _fetcher(api)
        authenticate_request(fetcher, "s1", None)
        assert api.permission_calls == 1

        import broker_spark.serving.auth as auth_mod

        real = auth_mod.time.monotonic
        monkeypatch.setattr(
            auth_mod.time, "monotonic", lambda: real() + 16 * 60
        )  # past both TTLs
        authenticate_request(fetcher, "s1", None)
        assert api.permission_calls == 2


ENVELOPE = (
    "stream_id string, partition int, ts timestamp, sequence_no int,"
    " publisher_id string, msg_chain_id string, content string"
)


def _get(url: str, headers: dict | None = None):
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture(scope="module")
def secured_gateway(spark, tmp_path_factory):
    import datetime

    api = CountingApi(operations=["stream_subscribe"])  # read-only grants
    st = Storage(spark, str(tmp_path_factory.mktemp("auth") / "log"))
    st.store(
        spark.createDataFrame(
            [("s1", 0, datetime.datetime(1970, 1, 1, 0, 0, 1), 0, "p", "1", "{}")],
            ENVELOPE,
        )
    )
    server = serving_http.serve(st, stream_fetcher=_fetcher(api))
    host, port = server.server_address
    yield f"http://{host}:{port}", api
    server.shutdown()


class TestGatewayIntegration:
    def test_authorized_read(self, secured_gateway):
        base, _ = secured_gateway
        status, body = _get(f"{base}/streams/s1/data/partitions/0/last")
        assert status == 200
        assert len(json.loads(body)) == 1

    def test_malformed_header_400_at_gateway(self, secured_gateway):
        base, _ = secured_gateway
        status, body = _get(
            f"{base}/streams/s1/data/partitions/0/last",
            headers={"Authorization": "Basic xyz"},
        )
        assert status == 400
        assert json.loads(body) == {"error": MALFORMED_HEADER_MSG}

    def test_publish_without_grant_403(self, secured_gateway):
        base, _ = secured_gateway
        req = urllib.request.Request(
            f"{base}/streams/s1/data?ts=1000", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
            assert json.loads(e.read()) == {"error": "Authentication failed."}


class TestHttpCoreApi:
    """The real-HTTP transport (serving/core_api.py): the same
    StreamFetcher + middleware stack driven over an actual socket against
    the core-API test server, matching src/StreamFetcher.ts:96-158's
    URL shapes, Bearer header, and non-2xx -> HttpError mapping."""

    @pytest.fixture()
    def served(self):
        from broker_spark.serving.auth import InMemoryCoreApi
        from broker_spark.serving.core_api import HttpCoreApi, serve_core_api

        registry = InMemoryCoreApi()
        registry.create_stream("s1", partitions=2)
        registry.grant("s1", "tok-read", "stream_subscribe")
        server = serve_core_api(registry)
        host, port = server.server_address
        yield HttpCoreApi(f"http://{host}:{port}"), registry
        server.shutdown()

    def test_success_over_socket(self, served):
        api, _ = served
        status, payload = authenticate_request(api.fetcher(), "s1", "Bearer tok-read")
        assert (status, payload) == (200, {"id": "s1", "partitions": 2})

    def test_no_grant_403_over_socket(self, served):
        api, _ = served
        status, payload = authenticate_request(api.fetcher(), "s1", "Bearer other")
        assert (status, payload) == (403, {"error": "Authentication failed."})

    def test_unknown_stream_404_over_socket(self, served):
        api, _ = served
        status, payload = authenticate_request(api.fetcher(), "nope", "Bearer tok-read")
        assert (status, payload) == (404, {"error": "Stream nope not found."})

    def test_unreachable_core_api_503(self):
        from broker_spark.serving.core_api import HttpCoreApi

        # closed port: URLError from the transport -> middleware catch-all
        api = HttpCoreApi("http://127.0.0.1:9", timeout_s=0.5)
        status, payload = authenticate_request(api.fetcher(), "s1", "Bearer t")
        assert (status, payload) == (503, {"error": "Request failed."})

    def test_server_error_maps_to_request_failed(self, served):
        api, registry = served

        def boom(stream_id, token):
            raise RuntimeError("registry exploded")

        registry.get_permissions = boom  # handler returns 500
        status, payload = authenticate_request(api.fetcher(), "s1", "Bearer t")
        assert (status, payload) == (500, {"error": "Request failed."})

    def test_stream_id_url_encoding_roundtrip(self, served):
        api, registry = served
        registry.create_stream("anonymous/weird stream#1")
        registry.grant("anonymous/weird stream#1", "tok", "stream_subscribe")
        status, payload = authenticate_request(
            api.fetcher(), "anonymous/weird stream#1", "Bearer tok"
        )
        assert status == 200
        assert payload["id"] == "anonymous/weird stream#1"

    def test_memoized_over_socket(self, served):
        api, registry = served
        calls = {"n": 0}
        orig = registry.get_permissions

        def counting(stream_id, token):
            calls["n"] += 1
            return orig(stream_id, token)

        registry.get_permissions = counting
        fetcher = api.fetcher()
        for _ in range(3):
            status, _ = authenticate_request(fetcher, "s1", "Bearer tok-read")
            assert status == 200
        assert calls["n"] == 1  # 15-min memo serves repeats
