"""Distcp-style copy job tests (gobblin-data-management copy analog:
CopySource planning, FileAwareInputStreamDataWriter streaming,
CopyDataPublisher atomic publish + resume; CopyIntegrationTest posture)."""

import os

import pyarrow.parquet as pq
import pytest

from gobblin_ray import copy as cp


def _mk_tree(root, spec):
    for rel, content in spec.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(content)


@pytest.fixture()
def tree(tmp_path):
    src = str(tmp_path / "src")
    spec = {
        "a.bin": b"alpha" * 1000,
        "sub/b.bin": b"bravo" * 50,
        "sub/deep/c.bin": b"",  # empty file must copy too
        "d.bin": os.urandom(1 << 16),
        "_skipme.bin": b"hidden bookkeeping never copied",
    }
    _mk_tree(src, spec)
    return src, spec


def test_copy_roundtrip_bytes_identical(ray_session, tree, tmp_path):
    src, spec = tree
    dest = str(tmp_path / "dest")
    out = cp.run_copy(src, dest, num_units=2)
    assert out["files_copied"] == 4  # _skipme excluded
    for rel, content in spec.items():
        if rel.startswith("_"):
            assert not os.path.exists(os.path.join(dest, rel))
            continue
        with open(os.path.join(dest, rel), "rb") as f:
            assert f.read() == content, rel
    assert cp.verify_copy(src, dest) == []
    # no staging residue
    assert not os.listdir(os.path.join(dest, cp.STAGING_DIR)) or not os.path.exists(
        os.path.join(dest, cp.STAGING_DIR)
    )


def test_copy_resume_skips_committed_and_recopies_changed(
    ray_session, tree, tmp_path
):
    src, _ = tree
    dest = str(tmp_path / "dest")
    cp.run_copy(src, dest, num_units=2)
    # idempotent re-run: nothing to do
    again = cp.run_copy(src, dest, num_units=2)
    assert again["files_copied"] == 0
    # mutate one source file (content AND mtime) -> exactly one re-copy
    p = os.path.join(src, "sub/b.bin")
    with open(p, "wb") as f:
        f.write(b"changed!")
    os.utime(p, ns=(1, 1))
    third = cp.run_copy(src, dest, num_units=2)
    assert third["files_copied"] == 1
    with open(os.path.join(dest, "sub/b.bin"), "rb") as f:
        assert f.read() == b"changed!"
    # new source file appears -> picked up on the next run
    _mk_tree(src, {"e.bin": b"late arrival"})
    fourth = cp.run_copy(src, dest, num_units=2)
    assert fourth["files_copied"] == 1
    assert cp.verify_copy(src, dest) == []


def test_copy_manifest_matches_disk(ray_session, tree, tmp_path):
    src, _ = tree
    dest = str(tmp_path / "dest")
    cp.run_copy(src, dest, num_units=3)
    t = pq.read_table(os.path.join(dest, cp.MANIFEST_NAME))
    rows = {r["rel_path"]: r for r in t.to_pylist()}
    assert sorted(rows) == sorted(
        e.rel_path for e in cp.list_files(src)
    )
    for rel, r in rows.items():
        assert os.path.getsize(os.path.join(dest, rel)) == r["bytes"]
        assert cp._md5_file(os.path.join(dest, rel)) == r["md5"]


def test_plan_copy_bins_balance_and_diff():
    ents = [cp.CopyEntity(f"f{i}", 10 * (i + 1), i) for i in range(10)]
    committed = {"f0": (10, 0), "f1": (999, 1)}  # f0 unchanged, f1 changed
    units = cp.plan_copy(ents, committed, num_units=3)
    rels = sorted(e.rel_path for u in units for e in u)
    assert rels == [f"f{i}" for i in range(1, 10)]  # f0 skipped, f1 redone
    loads = sorted(sum(e.bytes for e in u) for u in units)
    assert loads[-1] <= loads[0] * 3  # worst-fit-decreasing keeps bins close


def test_verify_copy_detects_corruption(ray_session, tree, tmp_path):
    src, _ = tree
    dest = str(tmp_path / "dest")
    cp.run_copy(src, dest, num_units=2)
    with open(os.path.join(dest, "a.bin"), "r+b") as f:
        f.write(b"XX")
    assert cp.verify_copy(src, dest) == ["a.bin"]
