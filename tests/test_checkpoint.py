"""Manifest store + two-phase commit unit tests (Ray-free).

Mirrors the reference's state-store round-trip and commit-sequence tests
(gobblin-metastore FsStateStoreTest.java:48-132,
gobblin-runtime CommitSequenceTest / FsCommitSequenceStoreTest)."""

import os

import pyarrow as pa
import pytest

from gobblin_ray import checkpoint as ckpt
from gobblin_ray.checkpoint import BucketState, CheckpointStore, Manifest
from gobblin_ray.schema import BASE_SCHEMA, schema_fingerprint


def mk_manifest(epoch=1, low=0, high=100):
    m = Manifest(
        epoch=epoch,
        low_seq=low,
        high_seq=high,
        num_buckets=4,
        schema_fingerprint=schema_fingerprint(BASE_SCHEMA),
        schema_ipc=Manifest.encode_schema(BASE_SCHEMA),
    )
    for b in range(4):
        m.buckets[b] = BucketState(
            bucket=b, high_seq=high, base_epoch=epoch if b % 2 else 0,
            rows=10 * b, events_applied=5 * b, events_epoch=b,
        )
    return m


def test_manifest_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path))
    m = mk_manifest()
    store.commit(m)
    got = store.load(1)
    assert got.to_json() == m.to_json()
    assert got.base_schema().equals(BASE_SCHEMA)
    assert store.latest().epoch == 1
    assert store.committed_epochs() == [1]


def test_latest_of_empty_store(tmp_path):
    assert CheckpointStore(str(tmp_path)).latest() is None


def test_commit_is_atomic_no_tmp_left(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit(mk_manifest())
    assert not [f for f in os.listdir(store.dir) if f.endswith(".tmp")]


def test_promote_idempotent(tmp_path):
    lake = str(tmp_path)
    t = pa.table({"x": [1, 2]})
    ckpt.atomic_write_table(t, ckpt.staging_path(lake, 3, 0))
    ckpt.promote(lake, 3, [0])
    dst = ckpt.base_path(lake, 0, 3)
    assert os.path.exists(dst)
    mtime = os.path.getmtime(dst)
    # Second promote with no staged file must be a no-op (dest exists).
    ckpt.promote(lake, 3, [0])
    assert os.path.getmtime(dst) == mtime
    # Crash-resume shape: staged file re-created, dest still wins.
    ckpt.atomic_write_table(pa.table({"x": [9]}), ckpt.staging_path(lake, 3, 0))
    ckpt.promote(lake, 3, [0])
    import pyarrow.parquet as pq

    assert pq.read_table(dst).equals(t)


def test_vacuum_drops_superseded_bases(tmp_path):
    lake = str(tmp_path)
    t = pa.table({"x": [1]})
    for epoch in (0, 1):
        ckpt.atomic_write_table(t, ckpt.staging_path(lake, epoch, 0))
        ckpt.promote(lake, epoch, [0])
    m = mk_manifest(epoch=1)
    m.buckets = {0: BucketState(bucket=0, high_seq=1, base_epoch=1, rows=1, events_applied=1)}
    removed = ckpt.vacuum(lake, m)
    assert removed >= 1
    assert not os.path.exists(ckpt.base_path(lake, 0, 0))
    assert os.path.exists(ckpt.base_path(lake, 0, 1))


def test_bucket_hash_version_gates_resume(ray_session, tmp_path):
    """A lake whose manifest records a different url->bucket router must
    refuse to resume: applying events under a new hash would route
    updates/deletes for existing urls to the wrong bucket (silent
    duplicates). Legacy manifests (no field) default to the old siphash
    tag and are refused too."""
    import json
    import os

    import pytest as _pytest

    from gobblin_ray import checkpoint as ckpt
    from gobblin_ray.engine import CdcEngine, EngineConfig
    from gobblin_ray.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    lake = str(tmp_path / "lake")
    write_corpus(corpus, n_pages=20, n_events=100, shard_rows=100, seed=5)
    cfg = EngineConfig(num_buckets=2, epoch_width=100, job_lock=False)
    eng = CdcEngine(lake, f"{corpus}/events", cfg)
    eng.bootstrap(f"{corpus}/pages.parquet")
    # current version: runs fine
    assert sum(r.events for r in eng.run(vacuum=False)) == 100
    # rewrite the manifest as if written by an older build (no field)
    path = eng.store._path(eng.store.latest().epoch)
    d = json.load(open(path))
    del d["bucket_hash"]
    with open(path, "w") as f:
        json.dump(d, f)
    assert eng.store.latest().bucket_hash == ckpt._LEGACY_BUCKET_HASH
    with _pytest.raises(RuntimeError, match="bucket router"):
        CdcEngine(lake, f"{corpus}/events", cfg).run(vacuum=False)
    assert os.path.exists(path)  # refused loudly, nothing touched
