"""Retention subsystem: version finders, policies, trash, cleaner, and
manifest-aware vacuum (reference analogs cited in gobblin_ray/retention.py).

Pure filesystem tests — no Ray session needed except for the lake fixture
in the vacuum_keep test, which reuses the shared session fixture."""

import os
from datetime import datetime, timedelta

import pytest

from gobblin_ray import retention as ret


def _mkver(root, name, ts=None):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-0.parquet"), "w") as f:
        f.write("x")
    if ts is not None:
        os.utime(d, (ts.timestamp(), ts.timestamp()))
    return d


NOW = datetime(2026, 8, 17, 12, 0, 0)


@pytest.fixture
def dated_root(tmp_path):
    root = str(tmp_path / "ds")
    for i in range(6):
        day = NOW - timedelta(days=i)
        _mkver(root, f"dt={day:%Y-%m-%d}")
    return root


def test_glob_finder_parses_dirname_timestamps(dated_root):
    vers = ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d").find()
    assert len(vers) == 6
    assert all(v.key.startswith("dt=") for v in vers)
    assert max(v.ts for v in vers) == NOW.replace(hour=0, minute=0, second=0)


def test_glob_finder_skips_unparseable_and_trash(dated_root):
    _mkver(dated_root, "dt=not-a-date")
    os.makedirs(os.path.join(dated_root, ret.TRASH_DIR), exist_ok=True)
    vers = ret.GlobVersionFinder(dated_root, "*", "dt=%Y-%m-%d").find()
    assert len(vers) == 6  # bad dir and _trash both skipped


def test_time_based_policy_cutoff(dated_root):
    vers = ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d").find()
    pol = ret.TimeBasedRetentionPolicy(timedelta(days=3), now=NOW)
    doomed = {v.key for v in pol.deletable(vers)}
    # versions at midnight 3,4,5 days ago are < NOW(12:00) - 3d
    assert doomed == {
        f"dt={NOW - timedelta(days=i):%Y-%m-%d}" for i in (3, 4, 5)
    }


def test_newest_k_policy(dated_root):
    vers = ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d").find()
    doomed = {v.key for v in ret.NewestKRetentionPolicy(2).deletable(vers)}
    assert doomed == {
        f"dt={NOW - timedelta(days=i):%Y-%m-%d}" for i in (2, 3, 4, 5)
    }
    assert ret.NewestKRetentionPolicy(10).deletable(vers) == []


def test_combine_policy_union_vs_intersect(dated_root):
    vers = ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d").find()
    time3 = ret.TimeBasedRetentionPolicy(timedelta(days=3), now=NOW)  # 3 doomed
    newest5 = ret.NewestKRetentionPolicy(5)  # 1 doomed (the oldest)
    union = ret.CombineRetentionPolicy([time3, newest5], op="union")
    inter = ret.CombineRetentionPolicy([time3, newest5], op="intersect")
    assert len(union.deletable(vers)) == 3
    assert len(inter.deletable(vers)) == 1  # only the oldest is in both


def test_cleaner_deletes_and_retains(dated_root):
    cleaner = ret.DatasetCleaner(
        ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d"),
        ret.NewestKRetentionPolicy(4),
    )
    rep = cleaner.clean()
    assert len(rep.deleted) == 2 and len(rep.retained) == 4
    assert len(os.listdir(dated_root)) == 4


def test_cleaner_dry_run_touches_nothing(dated_root):
    cleaner = ret.DatasetCleaner(
        ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d"),
        ret.DeleteAllRetentionPolicy(),
    )
    rep = cleaner.clean(dry_run=True)
    assert len(rep.deleted) == 6
    assert len(os.listdir(dated_root)) == 6


def test_trash_moves_and_purges(dated_root):
    trash = ret.Trash(dated_root, now=NOW)
    cleaner = ret.DatasetCleaner(
        ret.GlobVersionFinder(dated_root, "dt=*", "dt=%Y-%m-%d"),
        ret.NewestKRetentionPolicy(5),
        trash=trash,
    )
    rep = cleaner.clean()
    assert len(rep.trashed) == 1
    snaps = trash.snapshots()
    assert len(snaps) == 1
    # the trashed version's data file survived the move
    moved = os.listdir(snaps[0])
    assert len(moved) == 1
    assert os.path.exists(os.path.join(snaps[0], moved[0], "part-0.parquet"))
    # purge with a cutoff before the snapshot stamp keeps it...
    assert trash.purge(older_than=NOW - timedelta(days=1)) == 0
    # ...and a cutoff after it deletes it permanently
    assert trash.purge(older_than=NOW + timedelta(days=1)) == 1
    assert trash.snapshots() == []


def test_vacuum_keep_preserves_time_travel(tmp_path, ray_session):
    """keep_manifests=K: reads AS OF any kept epoch still work; older
    manifests and their exclusive files are gone."""
    from gobblin_ray import checkpoint as ckpt
    from gobblin_ray.engine import CdcEngine, EngineConfig
    from gobblin_ray.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    lake = str(tmp_path / "lake")
    write_corpus(corpus, n_pages=60, n_events=600, shard_rows=200, seed=11)
    cfg = EngineConfig(num_buckets=4, epoch_width=200, compact_every=2)
    eng = CdcEngine(lake, f"{corpus}/events", cfg)
    eng.bootstrap(f"{corpus}/pages.parquet")
    eng.run(vacuum=False)
    store = ckpt.CheckpointStore(lake)
    all_epochs = store.committed_epochs()
    assert len(all_epochs) >= 3

    before = {e: eng.read_table_arrow(store.load(e)) for e in all_epochs[-2:]}

    out = ret.vacuum_keep(lake, keep_manifests=2)
    assert out["kept_epochs"] == all_epochs[-2:]
    assert store.committed_epochs() == all_epochs[-2:]
    # both kept manifests still resolve to byte-identical tables (time
    # travel inside the retention window survives the vacuum)
    for e in all_epochs[-2:]:
        assert eng.read_table_arrow(store.load(e)).equals(before[e])


def test_size_quota_policy(tmp_path):
    """Newest-first accumulation under a byte quota; the newest version
    survives even when it alone busts the budget."""
    import os

    from gobblin_ray.retention import (
        DatasetCleaner, GlobVersionFinder, SizeQuotaRetentionPolicy,
    )

    root = tmp_path / "ds"
    root.mkdir()
    # four versions, 100 bytes each, dt-ordered
    for i, day in enumerate(("01", "02", "03", "04")):
        d = root / f"dt=2026-01-{day}"
        d.mkdir()
        (d / "part.bin").write_bytes(b"x" * 100)
    finder = GlobVersionFinder(str(root), "dt=*", ts_format="dt=%Y-%m-%d")
    # quota fits two versions: the two oldest are deletable
    doomed = SizeQuotaRetentionPolicy(250).deletable(finder.find())
    assert sorted(v.key for v in doomed) == ["dt=2026-01-01", "dt=2026-01-02"]
    # quota smaller than ONE version: newest still retained
    doomed = SizeQuotaRetentionPolicy(10).deletable(finder.find())
    assert sorted(v.key for v in doomed) == [
        "dt=2026-01-01", "dt=2026-01-02", "dt=2026-01-03"]
    # end-to-end through the cleaner
    rep = DatasetCleaner(finder, SizeQuotaRetentionPolicy(250)).clean()
    assert sorted(os.listdir(root)) == ["dt=2026-01-03", "dt=2026-01-04"]
    assert len(rep.deleted) == 2


def test_size_quota_prefix_contract(tmp_path):
    """Unequal sizes: once a version busts the budget, every OLDER version
    is deletable too — the retained set is a contiguous newest prefix, a
    smaller older version must NOT sneak back under the quota."""
    from gobblin_ray.retention import GlobVersionFinder, SizeQuotaRetentionPolicy

    root = tmp_path / "ds"
    root.mkdir()
    # newest-first sizes: [100, 200, 50]
    for day, size in (("03", 100), ("02", 200), ("01", 50)):
        d = root / f"dt=2026-01-{day}"
        d.mkdir()
        (d / "part.bin").write_bytes(b"x" * size)
    finder = GlobVersionFinder(str(root), "dt=*", ts_format="dt=%Y-%m-%d")
    doomed = SizeQuotaRetentionPolicy(160).deletable(finder.find())
    # dt=02 busts the 160 budget -> it AND the older dt=01 are deletable
    assert sorted(v.key for v in doomed) == ["dt=2026-01-01", "dt=2026-01-02"]


def test_vacuum_tolerates_foreign_entries(tmp_path, ray_session):
    """Stray files in _staging/ and data/ (editor temps, .DS_Store) must
    not abort vacuum — cleanup bounds disk growth and can't be fragile."""
    import os

    from gobblin_ray import checkpoint as ckpt
    from gobblin_ray import synth
    from gobblin_ray.engine import CdcEngine, EngineConfig

    d = str(tmp_path / "c")
    synth.write_corpus(d, n_pages=20, n_events=100, shard_rows=100)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, f"{d}/events",
                    EngineConfig(num_buckets=2, epoch_width=100))
    eng.bootstrap(f"{d}/pages.parquet")
    eng.run(vacuum=False)
    os.makedirs(os.path.join(lake, "_staging"), exist_ok=True)
    open(os.path.join(lake, "_staging", ".DS_Store"), "w").write("junk")
    open(os.path.join(lake, "data", "strayfile"), "w").write("junk")
    removed = ckpt.vacuum(lake, eng.store.latest())  # must not raise
    assert removed >= 0
    assert os.path.exists(os.path.join(lake, "data", "strayfile"))  # not ours


def test_tags_pin_manifests(tmp_path, ray_session):
    """Iceberg-refs semantics: a tag pins its manifest + files through
    both the run-path vacuum and vacuum_keep, blocks rollback past it,
    and reads byte-identically by name; compliance-style dangling prune
    and the name/epoch/duplicate guards all hold."""
    from gobblin_ray import checkpoint as ckpt
    from gobblin_ray import refs
    from gobblin_ray.engine import CdcEngine, EngineConfig
    from gobblin_ray.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    lake = str(tmp_path / "lake")
    write_corpus(corpus, n_pages=60, n_events=600, shard_rows=200, seed=13)
    cfg = EngineConfig(num_buckets=4, epoch_width=200, compact_every=2)
    eng = CdcEngine(lake, f"{corpus}/events", cfg)
    eng.bootstrap(f"{corpus}/pages.parquet")
    eng.run(vacuum=False)
    store = ckpt.CheckpointStore(lake)
    epochs = store.committed_epochs()
    assert len(epochs) >= 3
    tagged_epoch = epochs[-3]

    with pytest.raises(ValueError):
        refs.create_tag(lake, "bad name!")
    with pytest.raises(ValueError):
        refs.create_tag(lake, "v1", epoch=10_000)
    refs.create_tag(lake, "v1", epoch=tagged_epoch)
    with pytest.raises(FileExistsError):
        refs.create_tag(lake, "v1", epoch=epochs[-1])
    assert refs.list_tags(lake) == {"v1": tagged_epoch}
    want = eng.read_table_arrow(store.load(tagged_epoch))

    # run-path vacuum keeps the tagged manifest's files
    ckpt.vacuum(lake, store.latest())
    assert eng.read_table_arrow(store.load(tagged_epoch)).equals(want)

    # manifest retention keeps the tagged epoch outside the newest-K set
    out = ret.vacuum_keep(lake, keep_manifests=1)
    assert tagged_epoch in out["kept_epochs"]
    assert store.committed_epochs() == sorted({tagged_epoch, epochs[-1]})
    assert eng.read_table_arrow(store.load(tagged_epoch)).equals(want)

    # rollback past a tag is blocked until the tag is dropped
    head = epochs[-1]
    refs.create_tag(lake, "head", epoch=head)
    with pytest.raises(ValueError, match="pin later"):
        ret.rollback_to(lake, tagged_epoch)
    refs.drop_tag(lake, "head")
    r = ret.rollback_to(lake, tagged_epoch)
    assert r["rolled_back_to"] == tagged_epoch
    assert eng.read_table_arrow(store.load(tagged_epoch)).equals(want)

    # force retag + dangling prune
    refs.create_tag(lake, "v1", force=True)  # head (== tagged_epoch now)
    os.remove(store._path(tagged_epoch))
    assert refs.prune_dangling_tags(lake) == ["v1"]
    assert refs.list_tags(lake) == {}
    with pytest.raises(KeyError):
        refs.resolve_tag(lake, "v1")
