"""Flow-DAG orchestration: a declarative multi-step flow spec compiled to
a dependency-ordered, crash-resumable DAG of CLI commands.

The gobblin-service analog: FlowSpec declares a multi-hop flow
(gobblin-service/.../spec/FlowSpec.java), the compiler turns it into a
dependency-ordered job DAG (gobblin-service/.../modules/flowgraph/), a
trigger handler re-launches it when inputs change
(FlowTriggerHandlerTest.java at the reference root), and CommitSequence
makes re-runs skip completed steps
(gobblin-api/.../commit/CommitSequence.java:141-152 ``isCompleted``).

Here a flow is JSON::

    {"name": "ingest_and_prep",
     "vars": {"lake": "/data/lake"},
     "nodes": [
       {"id": "bootstrap",
        "cmd": ["bootstrap", "${lake}", "--events-dir", "...", "--pages", "..."],
        "inputs": [{"path": ".../pages.parquet"}]},
       {"id": "ingest", "after": ["bootstrap"],
        "cmd": ["run", "${lake}", "--events-dir", ".../events"],
        "inputs": [{"log": ".../events"}]},
       {"id": "prep", "after": ["ingest"],
        "cmd": ["prep", "${lake}", ".../out", "--shards", "4"],
        "inputs": [{"lake": "${lake}"}]}]}

Nodes ARE the existing CLI commands (``cli.main(argv)`` with the nested
flag set, so the whole DAG shares ONE Ray session — per-node re-init
costs 20-30 s in this sandbox). Execution is strictly ordered by the
deterministic topological sort (first listed node whose deps are done);
branch parallelism lives INSIDE each node's Ray pipeline, which is where
the scale is — two driver-side commands racing one lake's staging dir is
exactly what the job lock exists to prevent.

Resume + triggers are ONE mechanism, the fingerprint: each node declares
its INPUTS (a lake's committed manifest, a change log's head, a file
path), and a completion marker (``state_dir/node-<id>.json``, atomic
write) records the input fingerprint the run consumed plus the node's
cmd. A node is skipped iff its marker exists and the fingerprint matches
— so a crashed flow re-run skips the committed prefix (isCompleted), and
a flow re-run after the log grew re-runs ingest and everything downstream
of it (the trigger). Fingerprints deliberately cover only EXTERNAL
inputs, never the node's own output, so a completed flow is a fixpoint:
every pass after the inputs stop moving is all-skip. ``cli flow run
--follow`` polls exactly that loop.
"""

from __future__ import annotations

import json
import os
import time


class FlowError(RuntimeError):
    pass


def _subst(v, variables: dict):
    if isinstance(v, str):
        for k, val in variables.items():
            v = v.replace("${" + k + "}", str(val))
        return v
    if isinstance(v, list):
        return [_subst(x, variables) for x in v]
    if isinstance(v, dict):
        return {k: _subst(x, variables) for k, x in v.items()}
    return v


def load_flow(spec) -> dict:
    """Load + validate a flow spec (path, JSON string, or dict): unique
    node ids, known deps, acyclic, ``${var}`` substitution applied."""
    if isinstance(spec, str):
        if os.path.exists(spec):
            with open(spec) as f:
                spec = json.load(f)
        else:
            spec = json.loads(spec)
    if not isinstance(spec, dict) or "nodes" not in spec:
        raise FlowError("flow spec must be a dict with a 'nodes' list")
    variables = dict(spec.get("vars", {}))
    nodes = [_subst(dict(n), variables) for n in spec["nodes"]]
    ids = [n.get("id") for n in nodes]
    if len(set(ids)) != len(ids) or not all(ids):
        raise FlowError("every node needs a unique non-empty 'id'")
    known = set(ids)
    for n in nodes:
        n.setdefault("after", [])
        n.setdefault("inputs", [])
        if not isinstance(n.get("cmd"), list) or not n["cmd"]:
            raise FlowError(f"node {n['id']}: 'cmd' must be a non-empty list")
        for d in n["after"]:
            if d not in known:
                raise FlowError(f"node {n['id']}: unknown dep {d!r}")
    out = {"name": spec.get("name", "flow"), "nodes": nodes}
    topo_order(out)  # raises on cycles
    return out


def topo_order(flow: dict) -> list[dict]:
    """Deterministic topological order: repeatedly the FIRST listed node
    whose deps are all placed (stable across runs — resume must replay
    the same order)."""
    nodes = flow["nodes"]
    placed: set = set()
    order = []
    while len(order) < len(nodes):
        progress = False
        for n in nodes:
            if n["id"] in placed:
                continue
            if all(d in placed for d in n["after"]):
                order.append(n)
                placed.add(n["id"])
                progress = True
        if not progress:
            cyc = [n["id"] for n in nodes if n["id"] not in placed]
            raise FlowError(f"dependency cycle among {cyc}")
    return order


def _input_state(inp: dict) -> dict:
    """Resolve one declared input to its current state — all metadata-only
    (manifest JSON / parquet footers / stat), no Ray session."""
    if "lake" in inp:
        from .checkpoint import CheckpointStore

        store = CheckpointStore(inp["lake"])
        epochs = store.committed_epochs()
        if not epochs:
            return {"lake": inp["lake"], "epoch": None}
        m = store.load(epochs[-1])
        return {"lake": inp["lake"], "epoch": m.epoch,
                "high_seq": m.high_seq,
                "schema": m.schema_fingerprint}
    if "log" in inp:
        from .plan import load_log_meta

        meta = load_log_meta(inp["log"])
        return {"log": inp["log"], "max_seq": meta["max_seq"],
                "shards": len(meta["shards"])}
    if "path" in inp:
        p = inp["path"]
        # mtime_ns joins the fingerprint (round-4 advisor finding): a
        # content change that happens to preserve the byte size must
        # still invalidate the node marker, or the trigger silently
        # skips a node whose input actually changed. Conservative by
        # design: a byte-identical rewrite (tmp+rename bumps mtime)
        # re-triggers — a wasted re-run, never a missed one.
        if os.path.isdir(p):
            entries = []
            for name in os.listdir(p):
                full = os.path.join(p, name)
                if not os.path.isfile(full):
                    continue
                st = os.stat(full)  # ONE stat: size+mtime self-consistent
                entries.append((name, st.st_size, st.st_mtime_ns))
            return {"path": p, "entries": sorted(entries)}
        if os.path.exists(p):
            st = os.stat(p)
            return {"path": p, "size": st.st_size,
                    "mtime_ns": st.st_mtime_ns}
        return {"path": p, "size": None}
    raise FlowError(f"unknown input kind: {inp!r}")


def node_fingerprint(node: dict) -> dict:
    return {
        "cmd": list(node["cmd"]),
        "inputs": [_input_state(i) for i in node["inputs"]],
    }


def _marker_path(state_dir: str, node_id: str) -> str:
    return os.path.join(state_dir, f"node-{node_id}.json")


def _write_marker(state_dir: str, node_id: str, payload: dict) -> None:
    os.makedirs(state_dir, exist_ok=True)
    path = _marker_path(state_dir, node_id)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def flow_status(flow: dict, state_dir: str) -> list[dict]:
    """Marker-derived per-node status in topo order (no Ray session)."""
    out = []
    for n in topo_order(flow):
        mp = _marker_path(state_dir, n["id"])
        if not os.path.exists(mp):
            out.append({"id": n["id"], "state": "pending"})
            continue
        with open(mp) as f:
            m = json.load(f)
        fresh = m.get("fingerprint") == node_fingerprint(n)
        out.append({
            "id": n["id"],
            "state": "complete" if fresh else "stale",
            "completed_at": m.get("completed_at"),
            "sec": m.get("sec"),
        })
    return out


def _run_node(runner, cmd: list[str]) -> tuple[int, str | None]:
    """Execute one node's command; any failure mode (non-zero rc,
    SystemExit with int/str/None code, or a raised exception) is a
    FAILED NODE, never a flow-runner crash."""
    try:
        rc = runner(cmd)
        return rc, None
    except SystemExit as e:
        if e.code is None or e.code == 0:
            return 0, None
        if isinstance(e.code, int):
            return e.code, None
        return 1, str(e.code)
    except Exception as e:
        return 1, repr(e)


def run_flow(
    flow: dict,
    state_dir: str,
    base_argv: list[str] | None = None,
    force: bool = False,
    until: str | None = None,
    runner=None,
    max_parallel: int = 1,
) -> list[dict]:
    """One DAG pass: execute nodes in topo order, skipping every node
    whose completion marker matches its current input fingerprint
    (CommitSequence.isCompleted). A node failure stops the pass — no
    marker is written, downstream nodes never run, and the next pass
    resumes AT the failed node with the committed prefix skipped.

    ``until`` restricts the pass to the named node's ANCESTOR CLOSURE
    (itself included) — the operational "run this node and everything it
    needs" control the kill-between-nodes resume test drives; sibling
    branches that merely precede it in listing order do NOT run, and the
    semantics are identical in serial and parallel modes. ``runner``
    overrides the node executor (default:
    ``cli.main(base_argv + cmd)`` with the nested flag so all nodes share
    one Ray session; the CALLER owns final shutdown).

    ``max_parallel`` > 1 runs INDEPENDENT branches concurrently (the
    gobblin-service branch-parallel DAG execution): ready nodes — all
    deps complete — dispatch to a thread pool; fingerprints still
    resolve per node after its own deps finish, and markers are per-node
    files, so resume semantics are unchanged. Parallel branches must
    touch disjoint resources — two nodes driving one lake concurrently
    are refused by the lake's job lock, exactly as two independent
    drivers would be. On a failure no NEW nodes dispatch; in-flight
    nodes drain, then the pass raises."""
    from . import cli as climod

    order = topo_order(flow)
    if until is not None:
        if until not in {n["id"] for n in order}:
            raise FlowError(f"--until {until!r}: no such node")
        # restrict to the ancestor closure — same node set in serial and
        # parallel modes, so alternating modes across passes can never
        # flip which markers exist
        keep: set = {until}
        by_id = {n["id"]: n for n in order}
        changed = True
        while changed:
            changed = False
            for nid in list(keep):
                for d in by_id[nid]["after"]:
                    if d not in keep:
                        keep.add(d)
                        changed = True
        order = [n for n in order if n["id"] in keep]
    if runner is None:
        def runner(cmd: list[str]) -> int:
            return climod.main((base_argv or []) + cmd)

    def attempt(n: dict) -> dict:
        """Skip-or-run one node whose deps are all complete."""
        fp = node_fingerprint(n)  # resolved AFTER deps completed
        mp = _marker_path(state_dir, n["id"])
        marker = None
        if os.path.exists(mp):
            with open(mp) as f:
                marker = json.load(f)
        if (not force and marker and marker.get("ok")
                and marker.get("fingerprint") == fp):
            return {"id": n["id"], "action": "skipped"}
        t0 = time.time()
        rc, err = _run_node(runner, n["cmd"])
        sec = round(time.time() - t0, 3)
        if rc != 0:
            return {"id": n["id"], "action": "failed", "rc": rc,
                    "error": err}
        _write_marker(state_dir, n["id"], {
            "ok": True,
            "fingerprint": fp,
            "sec": sec,
            "completed_at": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime()
            ),
        })
        return {"id": n["id"], "action": "ran", "sec": sec}

    def fail(rep: dict, n_done: int):
        raise FlowError(
            f"node {rep['id']} failed (rc={rep.get('rc')}"
            + (f", {rep['error']}" if rep.get("error") else "")
            + f"); flow stopped — re-run resumes here "
            f"({n_done} nodes already complete)"
        )

    reports: list[dict] = []
    prev_nested = climod.NESTED
    climod.NESTED = True
    try:
        if max_parallel <= 1:
            for n in order:
                rep = attempt(n)
                reports.append(rep)
                if rep["action"] == "failed":
                    fail(rep, len(reports) - 1)
            return reports

        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
        from concurrent.futures import wait as fwait

        done: set = set()
        started: set = set()
        failed = False
        with ThreadPoolExecutor(max_parallel) as ex:
            futures: dict = {}
            while len(done) < len(order) and not failed:
                for n in order:
                    if (n["id"] not in started
                            and all(d in done for d in n["after"])):
                        started.add(n["id"])
                        futures[ex.submit(attempt, n)] = n["id"]
                if not futures:
                    break
                done_f, _ = fwait(futures, return_when=FIRST_COMPLETED)
                for f in done_f:
                    nid = futures.pop(f)
                    rep = f.result()
                    reports.append(rep)
                    if rep["action"] == "failed":
                        failed = True
                    else:
                        done.add(nid)
            # drain in-flight before raising
            for f in list(futures):
                rep = f.result()
                reports.append(rep)
                if rep["action"] != "failed":
                    done.add(futures[f])
                else:
                    failed = True
        if failed:
            bad = next(r for r in reports if r["action"] == "failed")
            fail(bad, len(done))
        return reports
    finally:
        climod.NESTED = prev_nested
