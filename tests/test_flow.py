"""Flow-DAG orchestration e2e (gobblin_ray/flow.py): full run, all-skip
fixpoint, kill-between-nodes resume, input-change trigger, failure
resume, and spec validation.

Mirrors gobblin-service's FlowSpec compile + trigger handler
(gobblin-service/.../spec/FlowSpec.java, FlowTriggerHandlerTest.java)
and CommitSequence.isCompleted resume
(gobblin-api/.../commit/CommitSequence.java:141-152)."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gobblin_ray import cli as climod
from gobblin_ray import flow as flowmod
from gobblin_ray.fixtures import CDC_NEARDUP_DIR, planted_cdc_neardup_corpus


@pytest.fixture()
def env(ray_session, tmp_path):
    """A private copy of the planted corpus (trigger tests grow its log)
    plus a flow spec over bootstrap -> ingest -> prep."""
    planted_cdc_neardup_corpus()
    corpus = str(tmp_path / "corpus")
    shutil.copytree(CDC_NEARDUP_DIR, corpus)
    root = str(tmp_path)
    spec = {
        "name": "ingest_and_prep",
        "vars": {"lake": f"{root}/lake", "corpus": corpus,
                 "out": f"{root}/shards"},
        "nodes": [
            {"id": "bootstrap",
             "cmd": ["bootstrap", "${lake}",
                     "--events-dir", "${corpus}/events",
                     "--pages", "${corpus}/pages.parquet",
                     "--buckets", "4", "--epoch-width", "4"],
             "inputs": [{"path": "${corpus}/pages.parquet"}]},
            {"id": "ingest", "after": ["bootstrap"],
             "cmd": ["run", "${lake}", "--events-dir", "${corpus}/events",
                     "--buckets", "4", "--epoch-width", "4", "--no-vacuum"],
             "inputs": [{"log": "${corpus}/events"}]},
            {"id": "prep", "after": ["ingest"],
             "cmd": ["prep", "${lake}", "${out}", "--shards", "2",
                     "--min-chars", "10"],
             "inputs": [{"lake": "${lake}"}]},
        ],
    }
    spec_path = f"{root}/flow.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    return {"spec_path": spec_path, "corpus": corpus, "root": root,
            "state": f"{root}/_flowstate"}


def _actions(reports):
    return [(r["id"], r["action"]) for r in reports]


def test_flow_run_skip_and_trigger(env, capsys):
    flow = flowmod.load_flow(env["spec_path"])
    r1 = flowmod.run_flow(flow, env["state"])
    assert _actions(r1) == [("bootstrap", "ran"), ("ingest", "ran"),
                            ("prep", "ran")]
    # fixpoint: unchanged inputs -> all skip
    r2 = flowmod.run_flow(flow, env["state"])
    assert _actions(r2) == [("bootstrap", "skipped"), ("ingest", "skipped"),
                            ("prep", "skipped")]
    assert all(s["state"] == "complete"
               for s in flowmod.flow_status(flow, env["state"]))
    # trigger: the log grows -> ingest and its downstream re-run
    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    t = pa.table({
        "event_seq": pa.array([8], pa.int64()),
        "op": pa.array(["insert"], pa.string()),
        "url": pa.array(["http://new/n7"], pa.string()),
        "warc_ts": pa.array([t0 + np.timedelta64(20, "h")],
                            pa.timestamp("us")),
        "html": pa.array([b"<p>fresh lighthouse keepers</p>"], pa.binary()),
        "text": pa.array(
            ["totally fresh content about lighthouse keepers and tides"],
            pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    pq.write_table(t, f"{env['corpus']}/events/part-00002.parquet")
    r3 = flowmod.run_flow(flow, env["state"])
    assert _actions(r3) == [("bootstrap", "skipped"), ("ingest", "ran"),
                            ("prep", "ran")]
    # the re-triggered ingest actually applied the new event
    from gobblin_ray.engine import CdcEngine, EngineConfig

    eng = CdcEngine(f"{env['root']}/lake", f"{env['corpus']}/events",
                    EngineConfig(num_buckets=4, epoch_width=4))
    urls = set(
        eng.read_table_arrow().column("url").to_pylist()
    )
    assert "http://new/n7" in urls


def test_kill_between_nodes_resume(env):
    flow = flowmod.load_flow(env["spec_path"])
    # "kill" after ingest: the DAG prefix commits, prep never starts
    r1 = flowmod.run_flow(flow, env["state"], until="ingest")
    assert _actions(r1) == [("bootstrap", "ran"), ("ingest", "ran")]
    st = {s["id"]: s["state"] for s in flowmod.flow_status(flow, env["state"])}
    assert st == {"bootstrap": "complete", "ingest": "complete",
                  "prep": "pending"}
    # resume: committed prefix skips, only prep runs
    r2 = flowmod.run_flow(flow, env["state"])
    assert _actions(r2) == [("bootstrap", "skipped"), ("ingest", "skipped"),
                            ("prep", "ran")]
    assert os.path.isdir(f"{env['root']}/shards")


def test_failed_node_stops_and_resumes(env):
    flow = flowmod.load_flow(env["spec_path"])
    # sabotage prep with an invalid flag value
    bad = json.loads(json.dumps(flow))
    bad["nodes"][2]["cmd"] = ["prep", f"{env['root']}/lake",
                              f"{env['root']}/shards", "--shards", "0"]
    with pytest.raises(flowmod.FlowError, match="node prep failed"):
        flowmod.run_flow(bad, env["state"])
    st = {s["id"]: s["state"] for s in flowmod.flow_status(flow, env["state"])}
    assert st["prep"] == "pending"  # no marker for the failed node
    # fixed spec resumes at the failed node only
    r = flowmod.run_flow(flow, env["state"])
    assert _actions(r) == [("bootstrap", "skipped"), ("ingest", "skipped"),
                           ("prep", "ran")]


def test_cli_flow_surface(env, capsys):
    # the cli wrapper end-to-end (NESTED keeps the session fixture alive)
    prev = climod.NESTED
    climod.NESTED = True
    try:
        rc = climod.main(["flow", "run", env["spec_path"],
                          "--state-dir", env["state"]])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ran"] == 3
        rc = climod.main(["flow", "status", env["spec_path"],
                          "--state-dir", env["state"]])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert [n["state"] for n in out["nodes"]] == ["complete"] * 3
    finally:
        climod.NESTED = prev


def test_spec_validation():
    with pytest.raises(flowmod.FlowError, match="cycle"):
        flowmod.load_flow({"nodes": [
            {"id": "a", "cmd": ["x"], "after": ["b"]},
            {"id": "b", "cmd": ["x"], "after": ["a"]},
        ]})
    with pytest.raises(flowmod.FlowError, match="unknown dep"):
        flowmod.load_flow({"nodes": [
            {"id": "a", "cmd": ["x"], "after": ["zzz"]},
        ]})
    with pytest.raises(flowmod.FlowError, match="unique"):
        flowmod.load_flow({"nodes": [
            {"id": "a", "cmd": ["x"]}, {"id": "a", "cmd": ["y"]},
        ]})
    # ${var} substitution reaches nested cmd/inputs
    f = flowmod.load_flow({
        "vars": {"d": "/tmp/x"},
        "nodes": [{"id": "a", "cmd": ["run", "${d}/lake"],
                   "inputs": [{"lake": "${d}/lake"}]}],
    })
    assert f["nodes"][0]["cmd"] == ["run", "/tmp/x/lake"]
    assert f["nodes"][0]["inputs"] == [{"lake": "/tmp/x/lake"}]


def test_parallel_branches(env, tmp_path):
    """max_parallel: two INDEPENDENT lake branches run concurrently, a
    join node waits for both; resume all-skips; --until restricts to the
    ancestor closure (the sibling branch does not run)."""
    corpus = env["corpus"]
    root = str(tmp_path)
    spec = flowmod.load_flow({
        "name": "two_lakes",
        "vars": {"c": corpus, "r": root},
        "nodes": [
            {"id": "boot_a",
             "cmd": ["bootstrap", "${r}/lake_a", "--events-dir",
                     "${c}/events", "--pages", "${c}/pages.parquet",
                     "--buckets", "4", "--epoch-width", "4"]},
            {"id": "boot_b",
             "cmd": ["bootstrap", "${r}/lake_b", "--events-dir",
                     "${c}/events", "--pages", "${c}/pages.parquet",
                     "--buckets", "4", "--epoch-width", "4"]},
            {"id": "run_a", "after": ["boot_a"],
             "cmd": ["run", "${r}/lake_a", "--events-dir", "${c}/events",
                     "--buckets", "4", "--epoch-width", "4",
                     "--no-vacuum"],
             "inputs": [{"log": "${c}/events"}]},
            {"id": "run_b", "after": ["boot_b"],
             "cmd": ["run", "${r}/lake_b", "--events-dir", "${c}/events",
                     "--buckets", "4", "--epoch-width", "4",
                     "--no-vacuum"],
             "inputs": [{"log": "${c}/events"}]},
            {"id": "check", "after": ["run_a", "run_b"],
             "cmd": ["status", "${r}/lake_a"],
             "inputs": [{"lake": "${r}/lake_a"},
                        {"lake": "${r}/lake_b"}]},
        ],
    })
    state = f"{root}/_st"
    r1 = flowmod.run_flow(spec, state, max_parallel=2)
    assert {(r["id"], r["action"]) for r in r1} == {
        ("boot_a", "ran"), ("boot_b", "ran"), ("run_a", "ran"),
        ("run_b", "ran"), ("check", "ran"),
    }
    # the join node really waited: both lakes are at head
    from gobblin_ray.checkpoint import CheckpointStore

    for lk in ("lake_a", "lake_b"):
        assert CheckpointStore(f"{root}/{lk}").latest().high_seq == 7
    r2 = flowmod.run_flow(spec, state, max_parallel=2)
    assert all(r["action"] == "skipped" for r in r2)
    # parallel + until: only the ancestor closure of run_a is eligible
    import shutil

    shutil.rmtree(state)
    r3 = flowmod.run_flow(spec, state, max_parallel=2, until="run_a")
    assert {r["id"] for r in r3} == {"boot_a", "run_a"}


def test_cli_flow_follow_drains_then_stops(env, capsys):
    """`flow run --follow` honors the _STOP drop only AFTER completing a
    pass (the run --follow drain contract), consumes the stop file, and
    reports the pass count."""
    os.makedirs(env["state"], exist_ok=True)
    open(f"{env['state']}/_STOP", "w").close()
    prev = climod.NESTED
    climod.NESTED = True
    try:
        rc = climod.main(["flow", "run", env["spec_path"],
                          "--state-dir", env["state"],
                          "--follow", "--poll-interval", "0.1"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["passes"] == 1 and out["ran"] == 3
        assert not os.path.exists(f"{env['state']}/_STOP")  # consumed
    finally:
        climod.NESTED = prev
