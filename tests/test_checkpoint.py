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
