"""Metrics subsystem: MetricContext tree rollup, tracking events, and the
engine integration (manifest counters + events.jsonl flight recorder)."""

import json
import os
import time

from gobblin_ray.metrics import (
    JsonLinesReporter,
    MetricContext,
    Timer,
)


def test_counter_rollup_to_parents():
    root = MetricContext("root")
    job = root.child("job", table="events")
    task = job.child("task")
    task.inc("rows", 10)
    job.inc("rows", 5)
    assert task.counter("rows").value == 10
    assert job.counter("rows").value == 15
    assert root.counter("rows").value == 15
    snap = root.snapshot()
    assert snap["counters"]["rows"] == 15
    assert snap["children"][0]["tags"] == {"table": "events"}


def test_timer_and_meter():
    ctx = MetricContext("t")
    with ctx.timer("stage"):
        time.sleep(0.01)
    with ctx.timer("stage"):
        time.sleep(0.01)
    t: Timer = ctx.timer("stage")
    assert t.count == 2
    assert t.total_sec >= 0.02
    assert t.mean_sec > 0
    m = ctx.meter("recs")
    m.mark(100)
    assert m.count == 100
    assert m.mean_rate > 0


def test_events_reported_up_the_tree(tmp_path):
    path = str(tmp_path / "ev.jsonl")
    root = MetricContext("root")
    root.add_reporter(JsonLinesReporter(path))
    job = root.child("job", table="docs")
    ev = job.submit_event("JobStarted", attempt=1)
    assert ev.namespace == "root.job"
    job.inc("n", 3)
    root.report()
    lines = [json.loads(x) for x in open(path)]
    assert lines[0]["name"] == "JobStarted"
    assert lines[0]["metadata"] == {"table": "docs", "attempt": "1"}
    assert lines[1]["snapshot"]["counters"]["n"] == 3


def test_engine_emits_metrics(ray_session, tmp_path):
    """A real mini-replay: counters land in the committed manifest,
    survive a driver restart (seeded from the manifest), and the
    events.jsonl flight recorder gets one EpochCommitted per epoch."""
    from gobblin_ray import synth
    from gobblin_ray.engine import CdcEngine, EngineConfig

    root = str(tmp_path / "corpus")
    synth.write_corpus(root, n_pages=50, n_events=300, shard_rows=100)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(num_buckets=4, epoch_width=100, job_lock=False)
    eng = CdcEngine(lake, os.path.join(root, "events"), cfg)
    eng.bootstrap(os.path.join(root, "pages.parquet"))
    eng.run(max_epochs=2, vacuum=False)
    m1 = eng.store.latest()
    assert m1.metrics["epochs_committed"] == 2
    assert m1.metrics["events_applied"] == 200
    # restart: counters continue, not reset
    eng2 = CdcEngine(lake, os.path.join(root, "events"), cfg)
    eng2.run(vacuum=False)
    m2 = eng2.store.latest()
    assert m2.metrics["epochs_committed"] == 3
    assert m2.metrics["events_applied"] == 300
    ev_path = os.path.join(lake, "_metrics", "events.jsonl")
    events = [json.loads(x) for x in open(ev_path)]
    committed = [e for e in events if e["name"] == "EpochCommitted"]
    assert len(committed) == 3
    assert committed[-1]["metadata"]["events"] == "100"
    job_done = [e for e in events if e["name"] == "JobRunCompleted"]
    assert len(job_done) == 2  # one per drain (run call) that applied work
    assert job_done[-1]["metadata"]["events"] == "100"
