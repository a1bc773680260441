"""Metrics subsystem: a MetricContext tree with named counters, meters
and timers, GobblinTrackingEvent-style event emission, and a JSON-lines
file reporter.

Thin Ray-native analog of gobblin-metrics
(gobblin-metrics-libs/gobblin-metrics-base/.../MetricContext.java — a
hierarchical context whose metrics aggregate up the parent chain;
GobblinTrackingEvent.avsc — a named event with a timestamp + string
metadata map, shipped through reporters; see also
gobblin-docs/metrics/Gobblin-Metrics-Performance.md for why the hot-path
cost must stay at "increment a long").

Design for the Ray engine:
- Metrics are DRIVER-side accounting. Distributed per-stage counts ride
  the lineage rows the Ray pipelines already return (one tiny row per
  bucket/partition — see engine.EpochReport); the driver folds them into
  counters here. No cross-process metric actors: a metrics actor on the
  hot path would serialize every batch's accounting through one process.
- Counter increments propagate up the context tree (root sees the total
  across all jobs/tables), like codahale/gobblin parent contexts.
- ``submit_event`` appends one JSON line per event through the attached
  reporters — the flight-recorder stream (job started, epoch committed,
  compaction triggered, quality gate failed) that the reference ships to
  Kafka/file reporters.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


class Counter:
    """Monotonic named count (events extracted, rows diverted, ...)."""

    __slots__ = ("value",)

    def __init__(self):
        self.value = 0

    def inc(self, n: int = 1) -> None:
        self.value += n


class Meter:
    """Count + mean rate since creation (records/sec style)."""

    __slots__ = ("count", "_t0")

    def __init__(self):
        self.count = 0
        self._t0 = time.monotonic()

    def mark(self, n: int = 1) -> None:
        self.count += n

    @property
    def mean_rate(self) -> float:
        dt = time.monotonic() - self._t0
        return self.count / dt if dt > 0 else 0.0


class Timer:
    """Duration accumulator; use as a context manager around a stage."""

    __slots__ = ("count", "total_sec", "min_sec", "max_sec", "_start")

    def __init__(self):
        self.count = 0
        self.total_sec = 0.0
        self.min_sec = float("inf")
        self.max_sec = 0.0
        self._start = None

    def update(self, sec: float) -> None:
        self.count += 1
        self.total_sec += sec
        self.min_sec = min(self.min_sec, sec)
        self.max_sec = max(self.max_sec, sec)

    def __enter__(self) -> "Timer":
        self._start = time.monotonic()
        return self

    def __exit__(self, *exc) -> None:
        self.update(time.monotonic() - self._start)
        self._start = None

    @property
    def mean_sec(self) -> float:
        return self.total_sec / self.count if self.count else 0.0


@dataclass
class TrackingEvent:
    """GobblinTrackingEvent analog: name + namespace + metadata map."""

    name: str
    namespace: str
    timestamp_ms: int
    metadata: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "namespace": self.namespace,
            "timestamp_ms": self.timestamp_ms,
            "metadata": self.metadata,
        }


class JsonLinesReporter:
    """File reporter: one JSON object per line, append-only, fsync-free
    (metrics are observability, not correctness — a crash may lose the
    tail, never corrupt earlier lines)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, event: TrackingEvent) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(event.to_json(), sort_keys=True) + "\n")

    def report_snapshot(self, snapshot: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"snapshot": snapshot}, sort_keys=True) + "\n")


class MetricContext:
    """Named metric registry node; ``inc()`` aggregates into parents.

    Rollup happens through the CONTEXT's ``inc`` (which walks the parent
    chain), not through the returned ``Counter`` handle — a bare
    ``counter(name).inc()`` counts on this node only:

    >>> root = MetricContext("gobblin_ray")
    >>> job = root.child("job", table="events")
    >>> job.inc("events_applied", 100)   # rolls up
    >>> root.counters()["events_applied"]
    100
    >>> job.counter("local_only").inc(5)  # this node only, no rollup
    >>> "local_only" in root.counters()
    False
    """

    def __init__(self, name: str, parent: "MetricContext | None" = None,
                 **tags: str):
        self.name = name
        self.parent = parent
        self.tags = dict(tags)
        self._counters: dict[str, Counter] = {}
        self._meters: dict[str, Meter] = {}
        self._timers: dict[str, Timer] = {}
        self._reporters: list[JsonLinesReporter] = []
        self._children: list[MetricContext] = []

    # -- tree ----------------------------------------------------------
    def child(self, name: str, **tags: str) -> "MetricContext":
        c = MetricContext(name, parent=self, **tags)
        self._children.append(c)
        return c

    def add_reporter(self, reporter: JsonLinesReporter) -> None:
        self._reporters.append(reporter)

    # -- metrics ---------------------------------------------------------
    def counter(self, name: str) -> Counter:
        got = self._counters.get(name)
        if got is None:
            got = self._counters[name] = Counter()
        return got

    def meter(self, name: str) -> Meter:
        got = self._meters.get(name)
        if got is None:
            got = self._meters[name] = Meter()
        return got

    def timer(self, name: str) -> Timer:
        got = self._timers.get(name)
        if got is None:
            got = self._timers[name] = Timer()
        return got

    def counters(self) -> dict[str, int]:
        """This node's counter values, sorted by name (manifest-ready)."""
        return {k: c.value for k, c in sorted(self._counters.items())}

    def inc(self, name: str, n: int = 1) -> None:
        """Increment here AND up the parent chain (hierarchical rollup:
        the root context's counter is the fleet-wide total)."""
        node: MetricContext | None = self
        while node is not None:
            node.counter(name).inc(n)
            node = node.parent

    # -- events ----------------------------------------------------------
    def submit_event(self, name: str, **metadata) -> TrackingEvent:
        ev = TrackingEvent(
            name=name,
            namespace=self._qualified_name(),
            timestamp_ms=int(time.time() * 1000),
            metadata={**{k: str(v) for k, v in self.tags.items()},
                      **{k: str(v) for k, v in metadata.items()}},
        )
        node: MetricContext | None = self
        while node is not None:
            for r in node._reporters:
                r.emit(ev)
            node = node.parent
        return ev

    # -- snapshots ---------------------------------------------------------
    def _qualified_name(self) -> str:
        parts = []
        node: MetricContext | None = self
        while node is not None:
            parts.append(node.name)
            node = node.parent
        return ".".join(reversed(parts))

    def snapshot(self) -> dict:
        """Flat-per-node snapshot: counters, meter counts/rates, timer
        stats. Small and JSON-able — this is what gets folded into the
        epoch manifest."""
        out: dict = {"name": self.name}
        if self.tags:
            out["tags"] = dict(self.tags)
        if self._counters:
            out["counters"] = {k: c.value for k, c in self._counters.items()}
        if self._meters:
            out["meters"] = {
                k: {"count": m.count, "mean_rate": round(m.mean_rate, 3)}
                for k, m in self._meters.items()
            }
        if self._timers:
            out["timers"] = {
                k: {
                    "count": t.count,
                    "total_sec": round(t.total_sec, 4),
                    "mean_sec": round(t.mean_sec, 4),
                    "max_sec": round(t.max_sec, 4),
                }
                for k, t in self._timers.items()
            }
        if self._children:
            out["children"] = [c.snapshot() for c in self._children]
        return out

    def report(self) -> None:
        snap = self.snapshot()
        for r in self._reporters:
            r.report_snapshot(snap)
