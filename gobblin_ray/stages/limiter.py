"""Throughput limiters — Gobblin's Limiter API re-expressed as actor-pool
map_batches stages.

Reference semantics (cited for parity, no code reuse):
- ``Limiter.acquirePermits`` contract:
  gobblin-utility/.../util/limiter/Limiter.java
- ``RateBasedLimiter`` (qps token bucket):
  gobblin-utility/.../util/limiter/RateBasedLimiter.java:45-76
- ``CountBasedLimiter`` (finite permit pool; extraction stops when
  exhausted): gobblin-utility/.../util/limiter/CountBasedLimiter.java
- ``TimeBasedLimiter`` (deadline):
  gobblin-utility/.../util/limiter/TimeBasedLimiter.java

Ray-Data shape: a limiter is PER-ACTOR state (a callable class passed to
``map_batches(Cls, concurrency=N)``), so a global budget must be divided
by the pool size up front — exactly how Gobblin splits a job-level limit
across task-level limiters. The rate limiter SLEEPS (backpressure: the
streaming executor stops scheduling upstream blocks into a stalled pool);
the count/time limiters TRUNCATE (rows past the budget are dropped, and
the stage reports how many via its lineage counter column, mirroring
``NotEnoughPermitsException`` ending extraction early rather than erroring
the job). At 100 TB the typical use is protecting a rate-limited external
sink; put the limiter stage immediately before the write so upstream
stages still run at full parallelism and the object store absorbs the
buffering.
"""

from __future__ import annotations

import time

import pyarrow as pa


class RateLimiter:
    """Token-bucket rows/sec limiter (RateBasedLimiter analog).

    ``rows_per_sec`` is the budget of THIS actor — for a pool of N actors
    pass ``global_qps / N``. Sleeps just enough before returning each
    batch; burst capacity is one batch, matching Guava RateLimiter's
    smooth-bursty default closely enough for sink protection.
    """

    def __init__(self, rows_per_sec: float):
        assert rows_per_sec > 0
        self.rows_per_sec = float(rows_per_sec)
        self._next_free = time.monotonic()

    def __call__(self, batch: pa.Table) -> pa.Table:
        now = time.monotonic()
        wait = self._next_free - now
        if wait > 0:
            time.sleep(wait)
            now = self._next_free
        self._next_free = now + len(batch) / self.rows_per_sec
        return batch


class CountLimiter:
    """Finite permit pool (CountBasedLimiter analog): passes rows until
    the per-actor budget is spent, truncates the boundary batch, then
    emits empty batches. Deterministic only per-actor (Ray's block order
    across actors isn't), so use it as a safety valve, not a sampler —
    for deterministic row caps use ``Dataset.limit``."""

    def __init__(self, max_rows: int):
        assert max_rows >= 0
        self.remaining = int(max_rows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.remaining <= 0:
            return batch.slice(0, 0)
        take = min(len(batch), self.remaining)
        self.remaining -= take
        return batch.slice(0, take)


class TimeLimiter:
    """Deadline limiter (TimeBasedLimiter analog): passes batches until
    ``max_seconds`` after the actor started, then emits empty batches —
    extraction windows ("pull for at most an hour") without killing the
    job."""

    def __init__(self, max_seconds: float):
        self.deadline = time.monotonic() + float(max_seconds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if time.monotonic() >= self.deadline:
            return batch.slice(0, 0)
        return batch


def limited(ds, rows_per_sec: float, concurrency: int = 2, batch_size: int = 4096):
    """Apply a global rows/sec cap: the budget is split evenly across the
    actor pool (Gobblin job-level -> task-level limiter split)."""
    return ds.map_batches(
        RateLimiter,
        fn_constructor_kwargs=dict(rows_per_sec=rows_per_sec / concurrency),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ThrottleService:
    """CLUSTER-WIDE token-bucket service — the shared-throttling analog of
    the reference's standalone throttling service
    (gobblin-restli/gobblin-restli-throttling/, where multiple jobs'
    limiters draw permits from ONE server-side bucket): a single Ray
    actor holds the budget, and ANY number of concurrent pipelines (or
    stages within one pipeline) consume from it via ``SharedRateLimiter``
    stages holding the same actor handle.

    Contrast ``limited()``: that splits a budget statically across one
    pool's actors; this enforces one budget across pools whose sizes and
    lifetimes the caller does not control — two pipelines sharing a
    ThrottleService together run at ``rows_per_sec``, not 2x.

    The bucket refills continuously (rate * elapsed, capped at
    ``burst``); ``acquire(n)`` DEBITS n permits immediately and returns
    the seconds the caller must sleep before proceeding (0.0 when the
    bucket covered it) — the "pay then wait" scheme keeps the actor call
    non-blocking (one tiny RPC per batch) so a slow consumer can never
    stall the service for others. Overdraft is bounded by one batch per
    consumer, the same burst posture as ``RateLimiter``."""

    def __init__(self, rows_per_sec: float, burst: float | None = None):
        assert rows_per_sec > 0
        self.rate = float(rows_per_sec)
        self.burst = float(burst if burst is not None else rows_per_sec)
        self.level = self.burst  # start full: first batches pass free
        self.at = time.monotonic()
        self.granted = 0  # lifetime permits, for audit/metrics

    def acquire(self, n: int) -> float:
        now = time.monotonic()
        self.level = min(self.burst, self.level + (now - self.at) * self.rate)
        self.at = now
        self.level -= n  # may go negative: the debt is the wait
        self.granted += n
        if self.level >= 0:
            return 0.0
        return -self.level / self.rate

    def stats(self) -> dict:
        return {"granted": self.granted, "level": self.level,
                "rate": self.rate, "burst": self.burst}


def start_throttle_service(rows_per_sec: float, burst: float | None = None,
                           name: str | None = None):
    """Start the shared bucket actor. Pass ``name`` to make it reachable
    from other drivers via ``ray.get_actor(name)`` (the cross-JOB
    sharing the reference's throttling server provides); anonymous
    handles still shard one budget across pipelines of one driver."""
    import ray

    cls = ray.remote(num_cpus=0)(ThrottleService)
    if name:
        h = cls.options(name=name, get_if_exists=True).remote(
            rows_per_sec, burst
        )
        # get_if_exists ignores constructor args on attach: refuse a
        # silent budget mismatch (a job asking for 100/s must not run at
        # an earlier job's 2000/s)
        got = ray.get(h.stats.remote())
        want_burst = float(burst if burst is not None else rows_per_sec)
        if got["rate"] != float(rows_per_sec) or got["burst"] != want_burst:
            raise ValueError(
                f"throttle service {name!r} already exists with "
                f"rate={got['rate']}/burst={got['burst']} — requested "
                f"{float(rows_per_sec)}/{want_burst}. Reuse it with the "
                "matching arguments or pick a new name."
            )
        return h
    return cls.remote(rows_per_sec, burst)


class SharedRateLimiter:
    """map_batches stage drawing permits from a ThrottleService handle:
    one ``acquire(len(batch))`` RPC per batch, then sleep whatever the
    service says. Works from any number of pools/pipelines concurrently —
    the service, not the pool size, enforces the global rate."""

    def __init__(self, service):
        self.service = service

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        wait = ray.get(self.service.acquire.remote(len(batch)))
        if wait > 0:
            time.sleep(wait)
        return batch


def limited_shared(ds, service, concurrency: int = 2,
                   batch_size: int = 4096, num_cpus: float | None = None):
    """Apply a CLUSTER-WIDE rows/sec cap from a ThrottleService: unlike
    ``limited()``, several datasets may pass the same ``service`` and
    their combined throughput honors the one budget. The stage mostly
    sleeps — pass a fractional ``num_cpus`` (e.g. 0.25) when several
    pipelines' limiter pools must coexist on a small cluster without
    starving the upstream tasks."""
    kw = {} if num_cpus is None else {"num_cpus": num_cpus}
    return ds.map_batches(
        SharedRateLimiter,
        fn_constructor_kwargs=dict(service=service),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kw,
    )
