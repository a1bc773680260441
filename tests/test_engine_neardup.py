"""Dedup-on-ingest (EngineConfig.neardup_dedup) e2e tests: planted
verdicts, exactly-once kill/resume with the index joining the two-phase
commit, and idempotent re-commit.

Mirrors the reference's in-stream converter/quality-chain posture
(gobblin-runtime/.../StreamModelTaskRunner.java:122-138) and its
exactly-once resume tests (CommitSequenceTest)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gobblin_ray.engine import CdcEngine, EngineConfig, NEARDUP_INDEX_DIR
from gobblin_ray.fixtures import planted_cdc_neardup_corpus


def _cfg():
    return EngineConfig(
        num_buckets=4, epoch_width=4, pipeline_epochs=1, neardup_dedup=True
    )


def _replay(corpus: str, lake: str, max_epochs=None) -> CdcEngine:
    eng = CdcEngine(lake, f"{corpus}/events", _cfg())
    eng.bootstrap(f"{corpus}/pages.parquet")
    eng.run(max_epochs=max_epochs, vacuum=False)
    return eng


def _live_state(eng: CdcEngine) -> dict:
    t = eng.read_table_arrow()
    return {
        u: (x, s) for u, x, s in zip(
            t.column("url").to_pylist(),
            t.column("text").to_pylist(),
            t.column("event_seq").to_pylist(),
        )
    }


def _diverted(lake: str) -> dict:
    out = {}
    for f in sorted(glob.glob(f"{lake}/_errors/epoch=*/bucket=*.parquet")):
        t = pq.read_table(f)
        for u, txt, e in zip(
            t.column("url").to_pylist(), t.column("text").to_pylist(),
            t.column("_err").to_pylist(),
        ):
            if e == "neardup":
                out[u] = txt
    return out


def _index_rows(lake: str) -> set:
    rows = set()
    for f in sorted(
        glob.glob(f"{lake}/{NEARDUP_INDEX_DIR}/part=*/run-*.parquet")
    ):
        t = pq.read_table(f, columns=["anchor", "doc"])
        rows.update(zip(t.column("anchor").to_pylist(),
                        t.column("doc").to_pylist()))
    return rows


@pytest.fixture(scope="module")
def corpus():
    d, _ = planted_cdc_neardup_corpus()
    return d


@pytest.fixture(scope="module")
def full_run(ray_session, corpus, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake_neardup_full"))
    return _replay(corpus, lake), lake


def test_planted_verdicts(full_run):
    eng, lake = full_run
    live = _live_state(eng)
    # diverted inserts never reach the lake; delete tombstoned p2
    assert set(live) == {
        "http://base/p0", "http://base/p1", "http://base/p3",
        "http://new/n2", "http://new/n3", "http://new/n5",
    }
    # the update of p1 passed the self-match exclusion and applied
    assert live["http://base/p1"][0].endswith("with a small appended suffix")
    diverted = _diverted(lake)
    assert set(diverted) == {
        "http://new/n1", "http://new/n4", "http://new/n6"
    }
    # survivors (and the bootstrap seed) are in the index; losers are not
    docs = {d for _, d in _index_rows(lake)}
    assert {"http://base/p0", "http://new/n2", "http://new/n5"} <= docs
    assert not docs & {"http://new/n1", "http://new/n4", "http://new/n6"}
    # metric surfaced in the committed manifest
    m = eng.store.latest()
    assert m.metrics.get("neardup_urls_diverted") == 3


def test_commit_gate_counts_diverted(full_run):
    # extracted == applied + diverted held for every committed epoch
    eng, _ = full_run
    total = sum(
        eng.store.load(e).event_count + eng.store.load(e).error_count
        for e in eng.store.committed_epochs() if e > 0
    )
    assert total == 8


def test_kill_and_resume_exactly_once(ray_session, corpus, full_run,
                                      tmp_path_factory):
    ref_eng, ref_lake = full_run
    lake = str(tmp_path_factory.mktemp("lake_neardup_resume"))
    _replay(corpus, lake, max_epochs=1)  # "kill" after epoch 1
    # fresh engine instance = new driver resuming from the manifest
    eng2 = CdcEngine(lake, f"{corpus}/events", _cfg())
    reports = eng2.run(vacuum=False)
    assert [r.epoch for r in reports] == [2]
    assert _live_state(eng2) == _live_state(ref_eng)
    assert _diverted(lake) == _diverted(ref_lake)
    assert _index_rows(lake) == _index_rows(ref_lake)


def test_recommit_is_noop(ray_session, corpus, full_run):
    eng, lake = full_run
    before = _index_rows(lake)
    reports = eng.run(vacuum=False)  # nothing left to apply
    assert reports == []
    assert _index_rows(lake) == before


def test_crash_between_index_promote_and_manifest_commit(
    ray_session, corpus, full_run, tmp_path_factory
):
    """The narrowest neardup crash window: the sidecar index promote for
    an epoch lands but the manifest write doesn't. The epoch is
    UNCOMMITTED (manifest is the commit point), so resume re-executes it
    against an index that already holds its own survivors — the
    full-pairwise within-epoch check plus self-match exclusion must
    reproduce IDENTICAL verdicts, and the content-named index files must
    make the re-promote a no-op (no duplicates). Final state and index
    must equal an uninterrupted run's byte-for-byte."""
    ref_eng, ref_lake = full_run
    lake = str(tmp_path_factory.mktemp("lake_neardup_crash"))
    eng = CdcEngine(lake, f"{corpus}/events", _cfg())
    eng.bootstrap(f"{corpus}/pages.parquet")
    eng.run(max_epochs=1, vacuum=False)

    real_commit = eng.store.commit

    def boom(manifest):
        raise RuntimeError("injected crash after sidecar promote")

    # epoch 2: _commit_epoch promotes data files, then the neardup
    # sidecar, THEN writes the manifest — boom fires exactly in the
    # window where the index is promoted but the epoch is not committed
    eng.store.commit = boom
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        eng.run(vacuum=False)
    eng.store.commit = real_commit
    assert eng.store.latest().epoch == 1  # epoch 2 never committed
    # the crash window really did leave the epoch-2 survivor promoted
    assert "http://new/n5" in {d for _, d in _index_rows(lake)}

    # fresh driver resumes: epoch 2 re-executes against its own promoted
    # survivors and must converge to the uninterrupted run's exact state
    eng2 = CdcEngine(lake, f"{corpus}/events", _cfg())
    reports = eng2.run(vacuum=False)
    assert [r.epoch for r in reports] == [2]
    assert _live_state(eng2) == _live_state(ref_eng)
    assert _diverted(lake) == _diverted(ref_lake)
    assert _index_rows(lake) == _index_rows(ref_lake)
    # content-named files: the re-executed epoch re-promoted the SAME
    # files, so the index file count matches the uninterrupted run too
    import glob as _glob

    n_files = len(_glob.glob(f"{lake}/{NEARDUP_INDEX_DIR}/part=*/run-*.parquet"))
    n_ref = len(_glob.glob(
        f"{ref_lake}/{NEARDUP_INDEX_DIR}/part=*/run-*.parquet"
    ))
    assert n_files == n_ref


def test_multi_table_neardup_index_isolation(ray_session, corpus, full_run,
                                             tmp_path_factory):
    """MultiTableCdcEngine with neardup_dedup: each table owns its OWN
    _neardup_index (a dup in table A must not divert table B's identical
    insert — per-dataset isolation, SafeDatasetCommit posture), and both
    tables' verdicts match the single-table reference run."""
    from gobblin_ray.engine import MultiTableCdcEngine

    ref_eng, ref_lake = full_run
    root = str(tmp_path_factory.mktemp("multi_neardup"))
    multi = MultiTableCdcEngine(
        root,
        {"ta": f"{corpus}/events", "tb": f"{corpus}/events"},
        _cfg(),
    )
    multi.bootstrap({"ta": f"{corpus}/pages.parquet",
                     "tb": f"{corpus}/pages.parquet"})
    results = multi.run(vacuum=False)
    assert multi.failed_tables(results) == []
    for name in ("ta", "tb"):
        lake = os.path.join(root, name)
        assert _diverted(lake) == _diverted(ref_lake)
        assert _index_rows(lake) == _index_rows(ref_lake)
        assert _live_state(multi.engines[name]) == _live_state(ref_eng)


def test_constraint_quarantine_precedes_neardup(ray_session,
                                                tmp_path_factory):
    """Ordering contract (round-4 advisor medium finding): constraint
    enforcement runs BEFORE the neardup stage, so a constraint-violating
    INSERT is neither near-dup-checked nor staged into the index as a
    'survivor' — a later legitimate insert of similar content must LAND,
    not divert against content that never reached the lake."""
    import numpy as np

    from gobblin_ray.fixtures import (_FRESH1, _FRESH2, _FRESH3, _PARA,
                                      _PARA2, _PARA3)

    corpus = str(tmp_path_factory.mktemp("cons_corpus"))
    os.makedirs(f"{corpus}/events", exist_ok=True)
    t0 = np.datetime64("2026-01-01T00:00:00", "us")

    def ts(h):
        return t0 + np.timedelta64(h, "h")

    pages = [("http://base/p0", _PARA2), ("http://base/p1", _PARA3)]
    pq.write_table(pa.table({
        "url": pa.array([p[0] for p in pages]),
        "warc_ts": pa.array([ts(0)] * 2, pa.timestamp("us")),
        "html": pa.array([f"<p>{p[1]}</p>".encode() for p in pages],
                         pa.binary()),
        "text": pa.array([p[1] for p in pages]),
        "lang": pa.array(["en"] * 2),
    }), f"{corpus}/pages.parquet")
    events = [
        # epoch 1 (seq 0-3): b1 violates the lang constraint AND carries
        # a text that seq-4's legit insert is a near-dup of
        (0, "http://bad/b1", _PARA, "xx"),
        (1, "http://new/f1", _FRESH1, "en"),
        (2, "http://new/f2", _FRESH2, "en"),
        (3, "http://new/f3", _FRESH3, "en"),
        # epoch 2 (seq 4]: near-dup of b1's text — must land
        (4, "http://new/ok", _PARA.replace("quick", "swift"), "en"),
    ]
    for shard, lo in enumerate(range(0, len(events), 4)):
        chunk = events[lo:lo + 4]
        pq.write_table(pa.table({
            "event_seq": pa.array([e[0] for e in chunk], pa.int64()),
            "op": pa.array(["insert"] * len(chunk)),
            "url": pa.array([e[1] for e in chunk]),
            "warc_ts": pa.array([ts(e[0] + 1) for e in chunk],
                                pa.timestamp("us")),
            "html": pa.array([f"<p>{e[2]}</p>".encode() for e in chunk],
                             pa.binary()),
            "text": pa.array([e[2] for e in chunk]),
            "lang": pa.array([e[3] for e in chunk]),
        }), f"{corpus}/events/part-{shard:05d}.parquet")

    lake = str(tmp_path_factory.mktemp("cons_lake"))
    eng = CdcEngine(lake, f"{corpus}/events", _cfg())
    eng.bootstrap(f"{corpus}/pages.parquet")
    eng.add_constraint(
        "lang_en",
        {"kind": "in_set", "column": "lang", "values": ["en"]},
    )
    eng.run(vacuum=False)

    live = _live_state(eng)
    assert "http://new/ok" in live, "legit near-dup of quarantined text"
    assert "http://bad/b1" not in live
    # b1 diverted as a CONSTRAINT failure, not neardup
    errs = {}
    for f in sorted(glob.glob(f"{lake}/_errors/epoch=*/bucket=*.parquet")):
        t = pq.read_table(f)
        for u, e in zip(t.column("url").to_pylist(),
                        t.column("_err").to_pylist()):
            errs[u] = e
    assert errs.get("http://bad/b1") == "constraint:lang_en"
    assert "http://new/ok" not in errs
    # and b1's sketches never entered the index
    assert not any(d == "http://bad/b1" for _a, d in _index_rows(lake))
