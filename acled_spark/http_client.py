"""Concrete HTTP page fetcher + OAuth token client (SURVEY §2.1 S1/S2).

Re-expresses the reference's aiohttp ``fetch_page`` (dagster_pipeline/
dagster_acled/utils.py:7-23) and ``OAuthTokenManager``
(acled_request_config.py:54-235) on the standard library alone
(``urllib.request``), so real ingestion needs zero extra dependencies.

Behavioral parity with the reference:

- password grant (``grant_type=password, client_id=acled``) against
  ``{base_url}/oauth/token``; refresh grant preferred when a refresh
  token is held, falling back to the password grant if refresh fails
  (acled_request_config.py:140-163);
- ``expires_at`` computed from ``expires_in`` at receipt; a token
  counts as expired 5 minutes BEFORE its real expiry (the reference's
  buffer, acled_request_config.py:37-45);
- a refresh response without a new refresh token keeps the old one
  (acled_request_config.py:229-232);
- page GET carries ``{limit, page, event_date, event_date_where}``
  plus caller params (base_assets.py:35-57), a Bearer header, and
  reads rows from the response's ``data`` key (utils.py:7-23);
- HTTP 403 means authentication failure (utils.py:17-18) — this
  client goes one step further than the reference and retries ONCE
  with a fresh token before giving up.

Deliberate divergences (engine-side hardening the reference lacks):
transient failures (5xx / connection errors) retry with exponential
backoff instead of returning ``[]`` — the reference's silent
empty-list-on-error conflates "day has no data" with "request failed"
and would terminate the page loop early, dropping rows.

Everything here is driver-side I/O glue implementing the injected
:data:`acled_spark.source.PageFetcher` boundary; nothing touches
Spark.  For executor-side fan-out (``fetch_partition_range``) the
fetcher pickles its credentials and re-authenticates per task.
"""

from __future__ import annotations

import http.client
import json
import ssl
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import date

# A token counts as expired this many seconds before its actual expiry
# (reference: 5-minute buffer, acled_request_config.py:37-45).
EXPIRY_BUFFER_SECONDS = 300.0
DEFAULT_TIMEOUT_SECONDS = 30.0
RETRY_AFTER_CAP_SECONDS = 60.0  # ceiling on honoring a server Retry-After


def _retry_wait(headers: dict | None, default: float) -> float:
    """Backoff for one retry: a server Retry-After (seconds form,
    capped — an adversarial/buggy header must not stall an executor
    for hours) when present, else the exponential default.  The
    ~3.5 s total exponential budget cannot outlast a real rate-limit
    window on its own (r8 lens), and the server said when to come
    back."""
    # case-insensitive lookup: HTTP/2 servers and many proxies emit
    # lowercase 'retry-after' (header names are case-insensitive per
    # RFC 9110 §5.1), and a case-sensitive .get silently ignored them
    ra = next(
        (v for k, v in (headers or {}).items() if k.lower() == "retry-after"),
        None,
    )
    if ra is not None:
        try:
            v = float(ra)
            # NaN sails through float() AND through min/max (every
            # comparison is False, so both return it unchanged) and
            # would reach time.sleep(nan), which raises — treat it
            # like any other unparseable header (r10 hostile-input
            # review)
            if v == v:
                return min(max(v, 0.0), RETRY_AFTER_CAP_SECONDS)
        except ValueError:
            pass  # HTTP-date form (rare) -> fall back to exponential
    return default


# The transient-failure taxonomy for retries (r8 lens): URLError covers
# connect-phase faults, but a failure while READING the body — an LB
# closing mid-response (http.client.IncompleteRead and friends) or a
# mid-read TLS error — subclasses neither URLError nor ConnectionError,
# and one truncated response used to abort the whole day fetch with a
# raw traceback instead of the documented backoff.
TRANSIENT_EXCS = (
    urllib.error.URLError,
    ConnectionError,
    TimeoutError,
    http.client.HTTPException,
    ssl.SSLError,
)


class ApiError(Exception):
    """Non-auth HTTP failure that survived the retry budget."""

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class AuthenticationError(ApiError):
    """Credentials rejected (token grant failed, or 403 after re-auth)."""


@dataclass
class TokenData:
    """One OAuth token response (ref acled_request_config.py:15-52)."""

    access_token: str
    refresh_token: str | None = None
    token_type: str = "Bearer"
    expires_in: float = 86400.0
    expires_at: float = 0.0  # epoch seconds, stamped at receipt

    @classmethod
    def from_response(cls, payload: dict, now: float) -> TokenData:
        return cls(
            access_token=payload["access_token"],
            refresh_token=payload.get("refresh_token"),
            token_type=payload.get("token_type", "Bearer"),
            expires_in=float(payload.get("expires_in", 86400)),
            expires_at=now + float(payload.get("expires_in", 86400)),
        )

    def is_expired(self, now: float) -> bool:
        """Expired = within the safety buffer of expiry.  The buffer is
        the smaller of 5 minutes and HALF the token's own lifetime
        (r8 lens): a server issuing expires_in <= 300 made every token
        expired at the instant of receipt, so each page request fired
        a fresh grant — a grant storm under executor fan-out."""
        buffer = min(EXPIRY_BUFFER_SECONDS, self.expires_in / 2.0)
        return now + buffer >= self.expires_at


def _http_json(
    url: str,
    data: bytes | None = None,
    headers: dict[str, str] | None = None,
    timeout: float = DEFAULT_TIMEOUT_SECONDS,
) -> tuple[int, dict, dict]:
    """One HTTP round-trip -> (status, parsed-JSON body, response
    headers).  The callers unpack ``status, payload, *rest`` so an
    injected test transport may still return a bare 2-tuple.

    HTTPError is a response too (4xx/5xx) — normalized into the same
    tuple so callers branch on status, not exception type.
    """
    req = urllib.request.Request(url, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            hdrs = dict(resp.headers)
            body = resp.read()
            if not body:
                return resp.status, {}, hdrs
            try:
                return resp.status, json.loads(body), hdrs
            except json.JSONDecodeError as exc:
                # a 200 with a non-JSON body (proxy/LB error page) must
                # surface through the normal error taxonomy, not as a
                # raw decode traceback that skips every retry handler
                raise ApiError(
                    f"non-JSON body on HTTP {resp.status} from {url}: "
                    f"{body[:120]!r}",
                    status=resp.status,
                ) from exc
    except urllib.error.HTTPError as exc:
        body = exc.read()
        try:
            payload = json.loads(body) if body else {}
        except json.JSONDecodeError:
            payload = {"raw": body.decode("utf-8", "replace")}
        return exc.code, payload, dict(exc.headers or {})


@dataclass
class OAuthTokenClient:
    """Password + refresh grant token lifecycle (S2).

    Mirrors the reference's ``OAuthTokenManager`` decision order
    (acled_request_config.py:140-163): valid cached token -> reuse;
    held refresh token -> refresh grant (failure falls through);
    else password grant.  ``clock`` and ``transport`` are injectable
    for deterministic tests.
    """

    username: str
    password: str
    base_url: str = "https://acleddata.com"
    client_id: str = "acled"
    timeout: float = DEFAULT_TIMEOUT_SECONDS
    clock: Callable[[], float] = time.time
    transport: Callable[..., "tuple[int, dict] | tuple[int, dict, dict]"] = (
        field(default=_http_json)
    )
    max_retries: int = 3
    backoff: float = 0.5
    sleep: Callable[[float], None] = time.sleep
    current_token: TokenData | None = field(default=None, init=False)

    def __post_init__(self) -> None:
        if not self.username or not self.password:
            raise ValueError("username and password are required")
        self.base_url = self.base_url.rstrip("/")

    @property
    def token_url(self) -> str:
        return f"{self.base_url}/oauth/token"

    @property
    def is_token_valid(self) -> bool:
        return self.current_token is not None and not self.current_token.is_expired(
            self.clock()
        )

    def get_access_token(self) -> str:
        if self.is_token_valid:
            return self.current_token.access_token
        if self.current_token is not None and self.current_token.refresh_token:
            try:
                self._refresh_grant()
                return self.current_token.access_token
            except ApiError:
                # Fall through to a fresh password grant on ANY refresh
                # failure — not just a 4xx rejection: some servers answer
                # an expired/revoked refresh token with a 5xx, and after
                # _grant's backoff budget is spent the password grant is
                # the remaining recovery path (at worst it fails the same
                # way and its error propagates).
                pass
        self._password_grant()
        return self.current_token.access_token

    def auth_header(self) -> dict[str, str]:
        token = self.get_access_token()
        return {"Authorization": f"{self.current_token.token_type} {token}"}

    def invalidate(self) -> None:
        """Drop the cached token (after a 403: force a fresh grant)."""
        self.current_token = None

    def _grant(self, form: dict[str, str], kind: str) -> None:
        body = urllib.parse.urlencode(form).encode()
        # Transient failures (5xx / connection errors) get the same
        # backoff budget as page requests — a blip at the token endpoint
        # is not a credential rejection, and reporting it as
        # AuthenticationError would kill an ingest that one retry saves.
        attempt = 0
        while True:
            try:
                status, payload, *rest = self.transport(
                    self.token_url,
                    data=body,
                    headers={"Content-Type": "application/x-www-form-urlencoded"},
                    timeout=self.timeout,
                )
            except (
                *TRANSIENT_EXCS,
                ApiError,  # transport-level: 200 with a non-JSON body
            ) as exc:
                if attempt >= self.max_retries:
                    raise ApiError(
                        f"{kind} grant failed after {attempt + 1} attempts: {exc}"
                    ) from exc
                self.sleep(self.backoff * (2**attempt))
                attempt += 1
                continue
            if status == 429 or 500 <= status < 600:
                # 429 at the token endpoint is a rate limit, not a
                # credential rejection — executor fan-out re-auth bursts
                # make it likely, and an immediate AuthenticationError
                # would fire a SECOND grant straight into the same limit
                if attempt >= self.max_retries:
                    raise ApiError(
                        f"{kind} grant failed after {attempt + 1} attempts: "
                        f"HTTP {status}",
                        status=status,
                    )
                self.sleep(_retry_wait(
                    rest[0] if rest else None,
                    self.backoff * (2**attempt),
                ))
                attempt += 1
                continue
            break
        if status != 200 or "access_token" not in payload:
            raise AuthenticationError(
                f"{kind} grant failed: HTTP {status} {payload}", status=status
            )
        token = TokenData.from_response(payload, self.clock())
        # refresh response without a new refresh token keeps the old one
        # (ref acled_request_config.py:229-232)
        if token.refresh_token is None and self.current_token is not None:
            token.refresh_token = self.current_token.refresh_token
        self.current_token = token

    def _password_grant(self) -> None:
        self._grant(
            {
                "username": self.username,
                "password": self.password,
                "grant_type": "password",
                "client_id": self.client_id,
            },
            "password",
        )

    def _refresh_grant(self) -> None:
        self._grant(
            {
                "refresh_token": self.current_token.refresh_token,
                "grant_type": "refresh_token",
                "client_id": self.client_id,
            },
            "refresh",
        )


@dataclass
class HttpPageFetcher:
    """A :data:`acled_spark.source.PageFetcher` backed by real HTTP.

    ``fetcher(day, page, limit, extra) -> list[dict]`` — one GET of
    ``{base_url}/{endpoint}`` with the reference's page params
    (base_assets.py:38-44) and a Bearer header; rows come from the
    body's ``data`` key.

    Failure policy per request:

    - 200 -> return rows;
    - 403 -> invalidate the token, re-auth, retry ONCE; a second 403
      raises :class:`AuthenticationError`;
    - 429, 5xx, connection error, or a 200 whose body isn't JSON (a
      proxy/LB failover page) -> exponential backoff
      (``backoff * 2**attempt``) up to ``max_retries``, then
      :class:`ApiError` — 429 is a rate limit, and the executor
      fan-out makes bursts likely, so it gets the same budget the
      token endpoint already gives it;
    - other 4xx -> :class:`ApiError` immediately (retrying a bad
      request cannot help).

    Picklable for ``fetch_partition_range`` executor fan-out: the
    token cache is per-process state, so each task authenticates once
    and reuses its token across its pages.
    """

    auth: OAuthTokenClient
    endpoint: str = "acled/read"
    max_retries: int = 3
    backoff: float = 0.5
    sleep: Callable[[float], None] = time.sleep

    @property
    def url(self) -> str:
        return f"{self.auth.base_url}/{self.endpoint.lstrip('/')}"

    def __call__(
        self, day: date, page: int, limit: int, extra: dict
    ) -> list[dict]:
        params = dict(extra)
        reserved = {"limit", "page", "event_date", "event_date_where"}
        clash = reserved & set(params)
        if clash:
            # silently overwriting a pushed event_date filter (or a
            # caller's paging params) would fetch rows the caller
            # excluded with no engine-side correction — the same
            # operator-rewrite hazard fetch_day guards against
            raise ValueError(
                f"extra params collide with fetcher-controlled keys: "
                f"{sorted(clash)} — the fetcher owns paging and the "
                f"per-day date equality"
            )
        params.update(
            {
                "limit": limit,
                "page": page,
                "event_date": day.isoformat(),
                "event_date_where": "=",
            }
        )
        query = urllib.parse.urlencode(params, doseq=True)
        url = f"{self.url}?{query}"
        reauthed = False
        attempt = 0
        while True:
            # auth_header OUTSIDE the try: a grant failure must surface
            # with the grant's own (already-spent) retry budget, not be
            # multiplied by the page loop's — AuthenticationError is an
            # ApiError subclass and would otherwise match the retry
            # branch below
            headers = self.auth.auth_header()
            try:
                status, payload, *rest = self.auth.transport(
                    url, headers=headers, timeout=self.auth.timeout
                )
            except TRANSIENT_EXCS as exc:
                # connection- or read-phase failure (refused, reset, DNS,
                # timeout, truncated body, mid-read TLS): same backoff
                # policy as a 5xx
                if attempt >= self.max_retries:
                    raise ApiError(
                        f"API request failed after {attempt + 1} attempts: {exc}"
                    ) from exc
                self.sleep(self.backoff * (2**attempt))
                attempt += 1
                continue
            except ApiError as exc:
                # transport-level ApiError == a 200 whose body isn't
                # JSON (_http_json's proxy/LB failover normalization).
                # The same fault expressed as a 502 gets the backoff
                # budget, so this shape must too — without this branch
                # it aborted the whole day fetch with zero retries.
                if attempt >= self.max_retries:
                    # same exhaustion framing as the sibling branches —
                    # a bare re-raise read as a first-attempt abort with
                    # a misleading status=200
                    raise ApiError(
                        f"API request failed after {attempt + 1} attempts: {exc}",
                        status=exc.status,
                    ) from exc
                self.sleep(self.backoff * (2**attempt))
                attempt += 1
                continue
            if status == 200:
                # an absent 'data' key is NOT an empty page: treating it
                # as one would stop the page loop mid-day and silently
                # persist a partial partition (a 200-with-error-body is
                # exactly the failure the reference's empty-list-on-
                # error path hid)
                if "data" not in payload:
                    raise ApiError(
                        f"malformed page response: no 'data' key in {payload!r:.200}",
                        status=status,
                    )
                rows = payload["data"]
                if not isinstance(rows, list):
                    raise ApiError(
                        f"malformed page response: 'data' is {type(rows).__name__}",
                        status=status,
                    )
                return rows
            if status in (401, 403):
                # 401 is the standard OAuth invalid/expired-token status
                # (server-side revocation can beat the client's local
                # expiry buffer); both get exactly one invalidate+reauth
                if reauthed:
                    raise AuthenticationError(
                        f"authentication failed for {self.url}: HTTP {status}",
                        status=status,
                    )
                self.auth.invalidate()
                reauthed = True
                continue
            if status == 429 or 500 <= status < 600:
                # 429 is a rate limit, not a bad request: the token
                # path already retries it for exactly the fan-out-burst
                # reason (_grant), and page GETs are the bulk of the
                # burst — aborting a whole day on one 429 that a single
                # sleep would clear is the wrong trade
                if attempt >= self.max_retries:
                    raise ApiError(
                        f"API request failed after {attempt + 1} attempts: "
                        f"HTTP {status}",
                        status=status,
                    )
                self.sleep(_retry_wait(
                    rest[0] if rest else None,
                    self.backoff * (2**attempt),
                ))
                attempt += 1
                continue
            raise ApiError(f"API request failed: HTTP {status}", status=status)


def make_http_fetcher(
    username: str,
    password: str,
    base_url: str = "https://acleddata.com",
    endpoint: str = "acled/read",
    **kwargs,
) -> HttpPageFetcher:
    """Production wiring: credentials -> a source.PageFetcher.

    ``source.ingest_day(spark, make_http_fetcher(u, p), day)`` is the
    end-to-end real-ingestion path.
    """
    return HttpPageFetcher(
        auth=OAuthTokenClient(username=username, password=password, base_url=base_url),
        endpoint=endpoint,
        **kwargs,
    )
