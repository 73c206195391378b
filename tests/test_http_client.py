"""HTTP fetcher + OAuth client against a live local http.server stub.

Covers the VERDICT r2 #1 'done' bar: pagination, 403 -> re-auth retry,
5xx retry with backoff, token refresh with expiry buffer — all against
a real socket (urllib end-to-end), plus clock-injected unit tests for
the expiry buffer that need no server.  No Spark session required.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from datetime import date
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from acled_spark.http_client import (
    ApiError,
    AuthenticationError,
    HttpPageFetcher,
    OAuthTokenClient,
    TokenData,
    make_http_fetcher,
)
from acled_spark.source import fetch_day, ingest_day

DAY = date(2024, 3, 5)


class StubAcledHandler(BaseHTTPRequestHandler):
    """Minimal ACLED-shaped API: /oauth/token + /acled/read.

    Class-level knobs (reset per test via the fixture):
      rows            - full corpus served page by page
      fail_5xx_times  - next N reads answer 500
      expire_tokens   - when True, every issued access token is
                        immediately treated as invalid (read -> 403)
      valid           - set of currently-honored access tokens
    """

    rows: list[dict] = []
    fail_5xx_times = 0
    fail_token_5xx_times = 0
    expire_tokens = False
    valid: set[str] = set()
    issued = 0
    grants: list[dict] = []
    requests_seen: list[dict] = []

    def log_message(self, *args):  # keep pytest output clean
        pass

    def _json(self, status: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        cls = type(self)
        if urllib.parse.urlparse(self.path).path != "/oauth/token":
            return self._json(404, {})
        length = int(self.headers.get("Content-Length", 0))
        form = dict(urllib.parse.parse_qsl(self.rfile.read(length).decode()))
        cls.grants.append(form)
        if cls.fail_token_5xx_times > 0:
            cls.fail_token_5xx_times -= 1
            return self._json(502, {"error": "bad gateway"})
        if form.get("grant_type") == "password":
            ok = form.get("username") == "u@x.io" and form.get("password") == "pw"
        elif form.get("grant_type") == "refresh_token":
            ok = form.get("refresh_token", "").startswith("refresh-")
        else:
            ok = False
        if not ok:
            return self._json(401, {"error": "invalid_grant"})
        cls.issued += 1
        token = f"token-{cls.issued}"
        if not cls.expire_tokens:
            cls.valid.add(token)
        return self._json(
            200,
            {
                "access_token": token,
                "refresh_token": f"refresh-{cls.issued}",
                "token_type": "Bearer",
                "expires_in": 86400,
            },
        )

    def do_GET(self):
        cls = type(self)
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path != "/acled/read":
            return self._json(404, {})
        params = dict(urllib.parse.parse_qsl(parsed.query))
        cls.requests_seen.append(params)
        auth = self.headers.get("Authorization", "")
        token = auth.removeprefix("Bearer ")
        if token not in cls.valid:
            return self._json(403, {"error": "forbidden"})
        if cls.fail_5xx_times > 0:
            cls.fail_5xx_times -= 1
            return self._json(503, {"error": "unavailable"})
        limit = int(params["limit"])
        page = int(params["page"])
        chunk = cls.rows[(page - 1) * limit : page * limit]
        return self._json(200, {"status": 200, "count": len(chunk), "data": chunk})


@pytest.fixture()
def stub_server():
    StubAcledHandler.rows = []
    StubAcledHandler.fail_5xx_times = 0
    StubAcledHandler.fail_token_5xx_times = 0
    StubAcledHandler.expire_tokens = False
    StubAcledHandler.valid = set()
    StubAcledHandler.issued = 0
    StubAcledHandler.grants = []
    StubAcledHandler.requests_seen = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), StubAcledHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        server.server_close()


def _rows(n: int) -> list[dict]:
    return [{"event_id_cnty": f"E{i:04d}", "fatalities": str(i % 7)} for i in range(n)]


def _fetcher(base_url: str, **kwargs) -> HttpPageFetcher:
    f = make_http_fetcher("u@x.io", "pw", base_url=base_url, **kwargs)
    f.sleep = lambda s: None  # keep backoff out of test wall-clock
    return f


# --- pagination --------------------------------------------------------------


def test_pagination_multi_page(stub_server):
    StubAcledHandler.rows = _rows(23)
    out = fetch_day(_fetcher(stub_server), DAY, limit=10)
    assert [r["event_id_cnty"] for r in out] == [f"E{i:04d}" for i in range(23)]
    # 3 pages: 10, 10, 3 (short page stops the loop)
    pages = [int(p["page"]) for p in StubAcledHandler.requests_seen]
    assert pages == [1, 2, 3]
    # reference page params travel on every request (base_assets.py:38-44)
    assert StubAcledHandler.requests_seen[0]["event_date"] == "2024-03-05"
    assert StubAcledHandler.requests_seen[0]["event_date_where"] == "="


def test_pagination_exact_multiple_issues_trailing_empty_page(stub_server):
    StubAcledHandler.rows = _rows(20)
    out = fetch_day(_fetcher(stub_server), DAY, limit=10)
    assert len(out) == 20
    assert [int(p["page"]) for p in StubAcledHandler.requests_seen] == [1, 2, 3]


def test_one_token_reused_across_pages(stub_server):
    StubAcledHandler.rows = _rows(45)
    fetch_day(_fetcher(stub_server), DAY, limit=10)
    assert StubAcledHandler.issued == 1  # token cached, not re-granted per page


# --- auth flows --------------------------------------------------------------


def test_bad_credentials_raise_authentication_error(stub_server):
    f = HttpPageFetcher(
        auth=OAuthTokenClient(username="u@x.io", password="WRONG", base_url=stub_server)
    )
    with pytest.raises(AuthenticationError):
        f(DAY, 1, 10, {})


def test_403_triggers_single_reauth_then_fails(stub_server):
    StubAcledHandler.rows = _rows(5)
    StubAcledHandler.expire_tokens = True  # every token is dead on arrival
    with pytest.raises(AuthenticationError):
        _fetcher(stub_server)(DAY, 1, 10, {})
    # exactly two grants: the original + the one re-auth retry
    assert len(StubAcledHandler.grants) == 2


def test_403_recovers_after_reauth(stub_server):
    StubAcledHandler.rows = _rows(5)
    f = _fetcher(stub_server)
    assert len(f(DAY, 1, 10, {})) == 5
    # simulate server-side token revocation between requests
    StubAcledHandler.valid.clear()
    assert len(f(DAY, 1, 10, {})) == 5
    # second call: revoked token -> 403 -> invalidate -> fresh grant -> 200
    assert StubAcledHandler.issued == 2


def test_refresh_grant_preferred_when_token_stale(stub_server):
    f = _fetcher(stub_server)
    client = f.auth
    client.get_access_token()
    # age the cached token into the 5-minute buffer
    client.current_token.expires_at = client.clock() + 10
    client.get_access_token()
    kinds = [g["grant_type"] for g in StubAcledHandler.grants]
    assert kinds == ["password", "refresh_token"]


def test_failed_refresh_falls_back_to_password_grant(stub_server):
    f = _fetcher(stub_server)
    client = f.auth
    client.get_access_token()
    client.current_token.expires_at = client.clock() + 10
    client.current_token.refresh_token = "bogus"  # server rejects non refresh-*
    token = client.get_access_token()
    assert token == "token-2"
    kinds = [g["grant_type"] for g in StubAcledHandler.grants]
    assert kinds == ["password", "refresh_token", "password"]


def test_refresh_5xx_exhaustion_falls_back_to_password_grant(stub_server):
    """Some servers answer an expired/revoked refresh token with a 5xx.
    After the refresh grant burns its backoff budget, the password grant
    is the remaining recovery path — the ApiError must not propagate."""
    f = _fetcher(stub_server)
    client = f.auth
    client.sleep = lambda s: None
    client.get_access_token()
    client.current_token.expires_at = client.clock() + 10
    # fail exactly the refresh grant's attempts; the password grant that
    # follows hits a healthy endpoint
    StubAcledHandler.fail_token_5xx_times = client.max_retries + 1
    token = client.get_access_token()
    assert token == "token-2"
    kinds = [g["grant_type"] for g in StubAcledHandler.grants]
    assert kinds == (
        ["password"]
        + ["refresh_token"] * (client.max_retries + 1)
        + ["password"]
    )


# --- transient-failure retry -------------------------------------------------


def test_5xx_retries_with_backoff_then_succeeds(stub_server):
    StubAcledHandler.rows = _rows(3)
    StubAcledHandler.fail_5xx_times = 2
    sleeps: list[float] = []
    f = make_http_fetcher("u@x.io", "pw", base_url=stub_server, backoff=0.25)
    f.sleep = sleeps.append
    assert len(f(DAY, 1, 10, {})) == 3
    assert sleeps == [0.25, 0.5]  # exponential: backoff * 2**attempt


def test_5xx_exhausts_retry_budget(stub_server):
    StubAcledHandler.rows = _rows(3)
    StubAcledHandler.fail_5xx_times = 99
    f = _fetcher(stub_server, max_retries=2)
    with pytest.raises(ApiError) as exc:
        f(DAY, 1, 10, {})
    assert exc.value.status == 503


def test_connection_refused_retries_then_raises():
    # nothing listens on this port; URLError path, not HTTPError.  The
    # first failure happens during the token grant, so the GRANT-level
    # backoff loop owns the retry budget (same policy as page requests).
    sleeps: list[float] = []
    f = make_http_fetcher(
        "u@x.io", "pw", base_url="http://127.0.0.1:9", max_retries=1
    )
    f.sleep = sleeps.append
    f.auth.max_retries = 1
    f.auth.sleep = sleeps.append
    with pytest.raises(ApiError):
        f(DAY, 1, 10, {})
    assert len(sleeps) == 1


def test_4xx_fails_fast_without_retry(stub_server):
    f = _fetcher(stub_server, endpoint="no/such/endpoint")
    with pytest.raises(ApiError) as exc:
        f(DAY, 1, 10, {})
    assert exc.value.status == 404
    # one GET only — 4xx is not retryable
    assert StubAcledHandler.requests_seen == []


# --- expiry buffer (clock-injected, no server) -------------------------------


def test_expiry_buffer_five_minutes():
    t = TokenData(access_token="a", expires_in=86400, expires_at=1000_000.0)
    assert not t.is_expired(now=1000_000.0 - 301)
    assert t.is_expired(now=1000_000.0 - 300)  # inside the buffer
    assert t.is_expired(now=1000_000.0 + 1)


def test_client_clock_injection_drives_reuse_vs_refresh():
    clock_now = [0.0]
    calls: list[str] = []

    def transport(url, data=None, headers=None, timeout=None):
        calls.append("grant")
        return 200, {"access_token": f"t{len(calls)}", "expires_in": 1000}

    c = OAuthTokenClient(
        username="u", password="p", base_url="http://x",
        clock=lambda: clock_now[0], transport=transport,
    )
    assert c.get_access_token() == "t1"
    clock_now[0] = 600.0  # 400s of validity left < 300s buffer? no: 1000-600=400 > 300
    assert c.get_access_token() == "t1"  # still valid, no new grant
    clock_now[0] = 701.0  # 299s left — inside the buffer
    assert c.get_access_token() == "t2"
    assert calls == ["grant", "grant"]


# --- Spark integration (end-to-end through source.ingest_day) ----------------


def test_ingest_day_through_real_http(stub_server, spark):
    StubAcledHandler.rows = _rows(12)
    df = ingest_day(spark, _fetcher(stub_server), DAY, limit=5)
    assert df.count() == 12
    assert df.select("event_id_cnty").distinct().count() == 12


# --- CLI ingest end-to-end ---------------------------------------------------


def test_cli_ingest_end_to_end(stub_server, spark, tmp_path, monkeypatch):
    """python -m acled_spark ingest against the stub API: OAuth grant,
    page loop, typed cast, one bronze date-partition per day."""
    from acled_spark.__main__ import main

    StubAcledHandler.rows = [
        {
            "event_id_cnty": f"CLI{i:03d}",
            "event_date": "2024-03-05",
            "year": "2024",
            "fatalities": str(i % 4),
            "timestamp": str(1709600000 + i),
        }
        for i in range(13)
    ]
    monkeypatch.setenv("ACLED_USERNAME", "u@x.io")
    monkeypatch.setenv("ACLED_PASSWORD", "pw")
    bronze = str(tmp_path / "bronze")
    rc = main(
        [
            "ingest",
            "--bronze", bronze,
            "--start", "2024-03-05",
            "--base-url", stub_server,
            "--limit", "5",
        ]
    )
    assert rc == 0
    out = spark.read.parquet(bronze)
    assert out.count() == 13
    assert out.select("event_date").distinct().collect()[0][0].isoformat() == "2024-03-05"
    # re-run: partition exists -> no fetch, still 13 rows
    seen_before = len(StubAcledHandler.requests_seen)
    assert main(
        ["ingest", "--bronze", bronze, "--start", "2024-03-05",
         "--base-url", stub_server]
    ) == 0
    assert len(StubAcledHandler.requests_seen) == seen_before
    assert spark.read.parquet(bronze).count() == 13


def test_cli_ingest_requires_env_credentials(stub_server, monkeypatch, capsys):
    from acled_spark.__main__ import main

    monkeypatch.delenv("ACLED_USERNAME", raising=False)
    monkeypatch.delenv("ACLED_PASSWORD", raising=False)
    rc = main(
        ["ingest", "--bronze", "/tmp/x", "--start", "2024-03-05",
         "--base-url", stub_server]
    )
    assert rc == 2
    assert "ACLED_USERNAME" in capsys.readouterr().err


def test_fetch_partition_range_distributed_with_real_http(stub_server, spark):
    """The executor fan-out path (mapInPandas) with the REAL fetcher:
    HttpPageFetcher must pickle into worker processes, authenticate
    there, and page each day over live HTTP."""
    from datetime import timedelta

    from acled_spark.source import fetch_partition_range, partition_days

    StubAcledHandler.rows = _rows(12)
    days = partition_days(DAY, DAY + timedelta(days=2))
    f = make_http_fetcher("u@x.io", "pw", base_url=stub_server)
    out = fetch_partition_range(spark, f, days, limit=5)
    # 3 days x 12 rows (the stub serves the same corpus per day)
    assert out.count() == 36
    # every task authenticated on its own (workers can't share the
    # driver's token cache) and paged 3 pages per day
    days_seen = {p["event_date"] for p in StubAcledHandler.requests_seen}
    assert days_seen == {d.isoformat() for d in days}
    assert StubAcledHandler.issued >= 1


def test_200_without_data_key_raises_not_truncates(stub_server, monkeypatch):
    """A 200 body missing 'data' is an error, not an empty page —
    otherwise the page loop stops mid-day and persists a partial
    partition."""
    f = _fetcher(stub_server)

    def transport(url, data=None, headers=None, timeout=None):
        if "/oauth/token" in url:
            return 200, {"access_token": "t", "expires_in": 1000}
        return 200, {"success": False, "error": "quota exceeded"}

    f.auth.transport = transport
    with pytest.raises(ApiError, match="no 'data' key"):
        f(DAY, 1, 10, {})


def test_token_grant_5xx_retries_then_succeeds(stub_server):
    """A transient 5xx at the token endpoint is NOT a credential
    rejection: the grant retries with backoff and the ingest proceeds."""
    StubAcledHandler.rows = _rows(3)
    StubAcledHandler.fail_token_5xx_times = 2
    f = _fetcher(stub_server)
    f.auth.sleep = lambda s: None
    assert len(fetch_day(f, DAY, limit=10)) == 3
    # 2 failed + 1 successful grant attempt, all password grants
    assert len(StubAcledHandler.grants) == 3


def test_token_grant_5xx_exhausts_budget_as_api_error(stub_server):
    """A persistent token-endpoint outage surfaces as ApiError (retryable
    infrastructure failure), never AuthenticationError (bad credentials)."""
    StubAcledHandler.fail_token_5xx_times = 99
    f = _fetcher(stub_server)
    f.auth.sleep = lambda s: None
    with pytest.raises(ApiError, match="password grant failed after") as exc:
        fetch_day(f, DAY, limit=10)
    assert not isinstance(exc.value, AuthenticationError)
    assert len(StubAcledHandler.grants) == f.auth.max_retries + 1


def test_token_grant_4xx_still_authentication_error(stub_server):
    """Credential rejection (4xx) fails fast — no retry burn."""
    f = make_http_fetcher("u@x.io", "WRONG", base_url=stub_server)
    f.auth.sleep = lambda s: None
    with pytest.raises(AuthenticationError):
        fetch_day(f, DAY, limit=10)
    assert len(StubAcledHandler.grants) == 1


@pytest.mark.slow  # ~17 s CLI e2e (VERDICT r14 #1)
def test_cli_ingest_full_lifecycle_to_silver_and_rollup(
    stub_server, spark, tmp_path, monkeypatch
):
    """python -m acled_spark ingest --silver: the CLI composition of the
    whole lifecycle — OAuth fetch -> bronze checks -> bronze -> keyed
    silver upsert -> silver checks — then a daily rollup over the silver
    table (the a4 shape), plus replay idempotence: re-sending day 1 with
    updated rows must update in place, never duplicate."""
    from pyspark.sql import functions as F

    from acled_spark.__main__ import main

    def day_rows(day, n, fat_offset=0):
        return [
            {
                "event_id_cnty": f"LC{i:03d}",
                "event_date": day,
                "year": "2024",
                "event_type": "Riots",
                "fatalities": str((i + fat_offset) % 4),
                "timestamp": str(1709600000 + i),
            }
            for i in range(n)
        ]

    monkeypatch.setenv("ACLED_USERNAME", "u@x.io")
    monkeypatch.setenv("ACLED_PASSWORD", "pw")
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")

    StubAcledHandler.rows = day_rows("2024-03-05", 11)
    rc = main(
        ["ingest", "--bronze", bronze, "--silver", silver,
         "--start", "2024-03-05", "--base-url", stub_server, "--limit", "5"]
    )
    assert rc == 0
    assert spark.read.parquet(silver).count() == 11

    # second day lands as its own partition
    StubAcledHandler.rows = day_rows("2024-03-06", 7)
    assert main(
        ["ingest", "--bronze", bronze, "--silver", silver,
         "--start", "2024-03-06", "--base-url", stub_server, "--limit", "5"]
    ) == 0

    # replay day 1 with changed fatalities: bronze partition for that day
    # must be re-fetched (delete it to simulate a reprocess request) and
    # the silver upsert must UPDATE the 11 keys, not append
    import shutil

    shutil.rmtree(f"{bronze}/event_date=2024-03-05")
    StubAcledHandler.rows = day_rows("2024-03-05", 11, fat_offset=1)
    assert main(
        ["ingest", "--bronze", bronze, "--silver", silver,
         "--start", "2024-03-05", "--base-url", stub_server, "--limit", "5"]
    ) == 0

    out = spark.read.parquet(silver)
    assert out.count() == 18  # 11 updated + 7, no duplicates
    # updated values won: LC000 now has fatalities (0+1)%4 = 1
    row = out.filter(F.col("event_id_cnty") == "LC000").collect()[0]
    assert row["fatalities"] == 1

    # the a4 daily-rollup shape over the silver table
    rollup = (
        out.groupBy("event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("fatalities").alias("total_fatalities"),
        )
        .orderBy("event_date")
        .collect()
    )
    assert [(str(r["event_date"]), r["n_events"]) for r in rollup] == [
        ("2024-03-05", 11),
        ("2024-03-06", 7),
    ]
    assert all(r["total_fatalities"] > 0 for r in rollup)


def test_cli_silver_flag_backfills_days_already_in_bronze(
    stub_server, spark, tmp_path, monkeypatch
):
    """A bronze-only run followed by a --silver run of the SAME range
    must still materialize silver: day selection gates on days missing
    from EITHER table, not bronze alone (a bronze-present/silver-absent
    day would otherwise be skipped forever)."""
    from acled_spark.__main__ import main

    monkeypatch.setenv("ACLED_USERNAME", "u@x.io")
    monkeypatch.setenv("ACLED_PASSWORD", "pw")
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")

    StubAcledHandler.rows = [
        {
            "event_id_cnty": f"BF{i:03d}",
            "event_date": "2024-03-07",
            "year": "2024",
            "event_type": "Riots",
            "fatalities": str(i % 3),
            "timestamp": str(1709600000 + i),
        }
        for i in range(9)
    ]
    # pass 1: bronze only
    assert main(
        ["ingest", "--bronze", bronze,
         "--start", "2024-03-07", "--base-url", stub_server, "--limit", "5"]
    ) == 0
    assert spark.read.parquet(bronze).count() == 9

    # pass 2: same range, now with --silver — must run, not no-op, and
    # must PROMOTE the existing bronze partition rather than re-fetch it
    seen_before = len(StubAcledHandler.requests_seen)
    assert main(
        ["ingest", "--bronze", bronze, "--silver", silver,
         "--start", "2024-03-07", "--base-url", stub_server, "--limit", "5"]
    ) == 0
    assert spark.read.parquet(silver).count() == 9
    assert len(StubAcledHandler.requests_seen) == seen_before

    # pass 3: fully materialized range with --silver is a clean no-op
    assert main(
        ["ingest", "--bronze", bronze, "--silver", silver,
         "--start", "2024-03-07", "--base-url", stub_server, "--limit", "5"]
    ) == 0
    assert spark.read.parquet(silver).count() == 9


# --- round-7 review regressions: 429 + non-JSON-200 retry policy -------------


def _fake_auth(transport) -> OAuthTokenClient:
    """Token client whose transport is fully injected (no server)."""
    client = OAuthTokenClient(
        username="u@x.io", password="pw", base_url="http://stub",
        transport=transport, max_retries=2, backoff=0.1,
    )
    client.sleep = lambda _s: None
    return client


def _token_payload() -> tuple[int, dict]:
    return 200, {"access_token": "tok", "expires_in": 86400}


def test_429_on_page_get_retries_like_5xx():
    """A rate-limited page GET must spend the backoff budget (the token
    path already did, for the same fan-out-burst reason), not abort the
    whole day fetch on the first 429."""
    calls = {"pages": 0}

    def transport(url, data=None, headers=None, timeout=None):
        if data is not None:
            return _token_payload()
        calls["pages"] += 1
        if calls["pages"] <= 2:
            return 429, {"error": "rate limited"}
        return 200, {"data": [{"event_id_cnty": "X1"}]}

    sleeps: list[float] = []
    f = HttpPageFetcher(auth=_fake_auth(transport), max_retries=3, backoff=0.25)
    f.sleep = sleeps.append
    assert len(f(DAY, 1, 10, {})) == 1
    assert sleeps == [0.25, 0.5]


def test_429_exhausts_budget_as_api_error_with_status():
    def transport(url, data=None, headers=None, timeout=None):
        if data is not None:
            return _token_payload()
        return 429, {}

    f = HttpPageFetcher(auth=_fake_auth(transport), max_retries=1, backoff=0.0)
    f.sleep = lambda _s: None
    with pytest.raises(ApiError) as exc:
        f(DAY, 1, 10, {})
    assert exc.value.status == 429


def test_non_json_200_page_body_retries_then_succeeds():
    """A 200 with an HTML body (proxy/LB failover) surfaces from the
    transport as ApiError — the page loop must retry it exactly like
    the same fault expressed as a 502."""
    calls = {"pages": 0}

    def transport(url, data=None, headers=None, timeout=None):
        if data is not None:
            return _token_payload()
        calls["pages"] += 1
        if calls["pages"] == 1:
            raise ApiError("non-JSON body on HTTP 200", status=200)
        return 200, {"data": []}

    f = HttpPageFetcher(auth=_fake_auth(transport), max_retries=2, backoff=0.0)
    f.sleep = lambda _s: None
    assert f(DAY, 1, 10, {}) == []
    assert calls["pages"] == 2


def test_non_json_200_exhausts_budget():
    def transport(url, data=None, headers=None, timeout=None):
        if data is not None:
            return _token_payload()
        raise ApiError("non-JSON body on HTTP 200", status=200)

    f = HttpPageFetcher(auth=_fake_auth(transport), max_retries=1, backoff=0.0)
    f.sleep = lambda _s: None
    with pytest.raises(ApiError, match="non-JSON"):
        f(DAY, 1, 10, {})


def test_grant_failure_not_multiplied_by_page_retry_loop():
    """AuthenticationError is an ApiError subclass: the page loop's new
    ApiError retry branch must NOT re-drive a credential rejection —
    the grant spends its own budget exactly once."""
    grants = {"n": 0}

    def transport(url, data=None, headers=None, timeout=None):
        if data is not None:
            grants["n"] += 1
            return 401, {"error": "invalid_grant"}
        raise AssertionError("page GET must never run without a token")

    f = HttpPageFetcher(auth=_fake_auth(transport), max_retries=3, backoff=0.0)
    f.sleep = lambda _s: None
    with pytest.raises(AuthenticationError):
        f(DAY, 1, 10, {})
    assert grants["n"] == 1  # one password grant, zero page-loop re-drives


def test_token_grant_non_json_200_retries():
    calls = {"n": 0}

    def transport(url, data=None, headers=None, timeout=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ApiError("non-JSON body on HTTP 200", status=200)
        return _token_payload()

    client = _fake_auth(transport)
    assert client.get_access_token() == "tok"
    assert calls["n"] == 2


def test_mid_body_truncation_retries(stub_server):
    """r8 lens: a failure while READING the body (http.client.
    IncompleteRead — an LB closing mid-response) subclasses neither
    URLError nor ConnectionError and used to abort the whole day fetch
    on attempt 1 instead of taking the documented backoff."""
    import http.client

    from acled_spark.http_client import _http_json

    calls = {"n": 0}

    def flaky(url, data=None, headers=None, timeout=None):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise http.client.IncompleteRead(b"half a body")
        return _http_json(url, data=data, headers=headers, timeout=timeout)

    fetcher = make_http_fetcher("u@x.io", "pw", base_url=stub_server, backoff=0.0)
    fetcher.auth.transport = flaky
    fetcher.auth.sleep = lambda s: None  # no real backoff sleeps
    rows = fetch_day(fetcher, DAY, limit=50)
    assert len(rows) == len(StubAcledHandler.rows)
    assert calls["n"] >= 3  # two truncations retried through


def test_retry_after_header_honored_and_capped():
    """r8 lens: the exponential budget totals ~3.5s — a real rate-limit
    window outlasts it, and the server SAYS when to come back.  The
    429 branch sleeps Retry-After (capped), not the exponential."""
    sleeps = []
    responses = iter([
        (200, {"access_token": "tok", "expires_in": 3600}),
        (429, {}, {"Retry-After": "7"}),
        (429, {}, {"Retry-After": "99999"}),   # capped to 60
        (200, {"data": []}),
    ])

    def transport(url, data=None, headers=None, timeout=None):
        return next(responses)

    auth = OAuthTokenClient(
        "u", "p", transport=transport, sleep=sleeps.append, backoff=0.5
    )
    fetcher = HttpPageFetcher(auth=auth, sleep=sleeps.append)
    assert fetcher(DAY, 1, 50, {}) == []
    assert sleeps[0] == 7.0
    assert sleeps[1] == 60.0  # RETRY_AFTER_CAP_SECONDS


def test_retry_after_header_lowercase_honored():
    """ADVICE r8: HTTP/2 servers and many proxies emit lowercase
    'retry-after'; the lookup must be case-insensitive (RFC 9110 §5.1)
    or the header is silently ignored and the ~3.5s exponential budget
    the header was meant to outlast decides the wait."""
    sleeps = []
    responses = iter([
        (200, {"access_token": "tok", "expires_in": 3600}),
        (429, {}, {"retry-after": "11"}),
        (200, {"data": []}),
    ])

    def transport(url, data=None, headers=None, timeout=None):
        return next(responses)

    auth = OAuthTokenClient(
        "u", "p", transport=transport, sleep=sleeps.append, backoff=0.5
    )
    fetcher = HttpPageFetcher(auth=auth, sleep=sleeps.append)
    assert fetcher(DAY, 1, 50, {}) == []
    assert sleeps[0] == 11.0


def test_retry_after_nan_falls_back_to_exponential():
    """r10 hostile-input review: 'Retry-After: NaN' passes float() AND
    min/max (every NaN comparison is False, so both return it
    unchanged) and reached time.sleep(nan), which raises — a hostile
    or buggy server header must never crash the retry loop."""
    sleeps = []
    responses = iter([
        (200, {"access_token": "tok", "expires_in": 3600}),
        (429, {}, {"Retry-After": "NaN"}),
        (429, {}, {"Retry-After": "not a number"}),
        (200, {"data": []}),
    ])

    def transport(url, data=None, headers=None, timeout=None):
        return next(responses)

    auth = OAuthTokenClient(
        "u", "p", transport=transport, sleep=sleeps.append, backoff=0.5
    )
    fetcher = HttpPageFetcher(auth=auth, sleep=sleeps.append)
    assert fetcher(DAY, 1, 50, {}) == []
    # both hostile headers fell back to the finite exponential default
    assert all(s == s and s >= 0 for s in sleeps)
    assert len(sleeps) == 2


def test_short_lived_token_is_not_instantly_expired():
    """r8 lens: expires_in <= the 5-minute buffer made every token
    expired at receipt -> one grant per page request (a grant storm
    under executor fan-out).  The buffer is now min(300, lifetime/2)."""
    t = TokenData(access_token="x", expires_in=300.0, expires_at=1000.0 + 300.0)
    assert not t.is_expired(now=1000.0)          # fresh: usable
    assert not t.is_expired(now=1000.0 + 140.0)  # before the half-life buffer
    assert t.is_expired(now=1000.0 + 151.0)      # inside it
    # long-lived tokens keep the full 5-minute buffer
    t2 = TokenData(access_token="x", expires_in=86400.0, expires_at=1000.0 + 86400.0)
    assert not t2.is_expired(now=1000.0 + 86400.0 - 301.0)
    assert t2.is_expired(now=1000.0 + 86400.0 - 299.0)
