"""Rate limiting + bounded retry for the paginated-feed connector.

The reference throttles its page fetches with a rolling-window rate
limit and retries throttle/unavailable responses with a fixed delay
(`datasources/nvd_handler copy.py:64-85` — @sleep_and_retry +
@limits(calls, period) around the request, bounded retry on 403/503;
`datasources/redhat_handler.py:62-65` likewise). This module is the
Spark-side form of that hook.

Distribution model: the reference's limiter is process-wide — correct
for its single-process thread pool, meaningless on a 1000-executor
cluster where no shared counter exists. The Spark form is a PER-WORKER
token bucket (shared_limiter: one rolling window per Python worker
process, carried across the tasks that worker runs): the operator
divides the provider's total budget by the source's max concurrent
workers (bounded by cluster slots) and sets `rate_calls`/`rate_period`
accordingly. Every worker then self-paces with no coordination, and
the cluster-wide request rate is bounded by workers x per-worker rate
— the only coordination-free bound that exists, and the same one every
distributed HTTP ingester (e.g. connector frameworks' per-task quotas)
ships.

Both pieces take injectable clock/sleep so the laws are tested with a
fake clock (no wall-clock sleeps in the suite).
"""

from __future__ import annotations

import time
from collections import deque
from collections.abc import Callable


class RetryableFeedError(Exception):
    """A transient fetch failure (the 403/503 class): retry with
    backoff up to the bound, then re-raise."""

    def __init__(self, message: str = "", status: int | None = None) -> None:
        super().__init__(message or f"transient feed error (status={status})")
        self.status = status


class RateLimiter:
    """Rolling-window token bucket: at most `calls` acquisitions per
    `period` seconds. acquire() blocks (via the injected sleep) until
    a slot frees — the @limits(calls, period) + @sleep_and_retry
    semantics of the reference, per task."""

    def __init__(
        self,
        calls: int,
        period: float,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if calls < 1 or period <= 0:
            raise ValueError("rate limit needs calls >= 1 and period > 0")
        self.calls, self.period = calls, float(period)
        self._clock, self._sleep = clock, sleep
        self._stamps: deque[float] = deque()

    def acquire(self) -> float:
        """Block until a request slot is available; returns the wait
        imposed (0.0 when under budget)."""
        waited = 0.0
        while True:
            now = self._clock()
            while self._stamps and now - self._stamps[0] >= self.period:
                self._stamps.popleft()
            if len(self._stamps) < self.calls:
                self._stamps.append(now)
                return waited
            delay = self.period - (now - self._stamps[0])
            delay = max(delay, 1e-6)
            self._sleep(delay)
            waited += delay


def fetch_with_retry(
    fetch: Callable[[], object],
    retries: int = 3,
    delay: float = 30.0,
    limiter: RateLimiter | None = None,
    sleep: Callable[[float], None] = time.sleep,
):
    """Run `fetch` under the limiter, retrying RetryableFeedError up to
    `retries` attempts with `delay` between them (the reference's
    bounded 403/503 loop). Non-retryable exceptions propagate at once;
    exhausting the bound re-raises the last transient error (fail
    loudly, never silently drop a page)."""
    last: Exception | None = None
    attempts = max(retries, 1)
    for i in range(attempts):
        if limiter is not None:
            limiter.acquire()
        try:
            return fetch()
        except RetryableFeedError as e:
            last = e
            if i + 1 < attempts:  # no sleep before the final re-raise:
                sleep(delay)  # an exhausted retry must fail loudly NOW,
                # not after one more reference-scale (30 s) delay
    raise last  # type: ignore[misc]


# One limiter per (provider, calls, period) per PROCESS. Spark reuses
# Python worker processes across tasks, so consecutive page fetches
# executed by the same worker share one rolling window — without this,
# a fresh limiter per partition read (each of which fetches exactly
# one page) would never throttle first attempts and the per-task
# budget would be fiction. The PROVIDER discriminator matters too:
# two different feeds that happen to configure the same (calls,
# period) budget are separate providers with separate quotas — sharing
# one window would halve each one's provisioned rate. Cluster-wide
# bound: concurrent workers x per-worker per-provider rate.
_SHARED_LIMITERS: dict[tuple[str, int, float], RateLimiter] = {}


def shared_limiter(
    calls: int, period: float, provider: str = ""
) -> RateLimiter:
    """Process-wide limiter for one provider's budget (see module
    comment); Python workers are single-threaded, so no lock needed."""
    key = (provider, calls, float(period))
    lim = _SHARED_LIMITERS.get(key)
    if lim is None:
        lim = _SHARED_LIMITERS[key] = RateLimiter(calls, period)
    return lim


def reader_hooks(options) -> tuple[RateLimiter | None, int, float]:
    """Parse the connector options into (limiter, retries, delay).
    All optional — absent options mean no pacing and a single attempt,
    so the default read path has zero overhead. The limiter is the
    process-shared one, so a worker running many page tasks paces them
    against a single rolling window."""
    calls = int(options.get("rate_calls", 0) or 0)
    period = float(options.get("rate_period", 0) or 0)
    retries = int(options.get("retry_limit", 1) or 1)
    delay = float(options.get("retry_delay", 0.05) or 0.05)
    # the provider identity is the feed's path/url — distinct feeds
    # with identical budgets must not share a window
    provider = str(options.get("path", "") or options.get("url", ""))
    limiter = (
        shared_limiter(calls, period, provider)
        if calls > 0 and period > 0
        else None
    )
    return limiter, retries, delay
