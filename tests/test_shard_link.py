"""Bucket-shard sampled reads + zero-copy hardlink clone.

Shard contract: the m shards are disjoint, exhaustive, and exact — every
url's full version history lives in exactly one shard (the write router),
so the per-shard LWW merge equals the full merge restricted to the shard.

Link-clone contract: isolation rests on the repo-wide tmp+os.replace
write discipline — mutating either lake detaches directory entries from
the shared inodes instead of rewriting them."""

import os

import pyarrow as pa
import pytest

from gobblin_ray import synth
from gobblin_ray.copy import link_lake
from gobblin_ray.engine import CdcEngine, EngineConfig, stable_hash_u64


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shard_corpus"))
    synth.write_corpus(d, n_pages=250, n_events=2_500, shard_rows=500)
    lake_dir = str(tmp_path_factory.mktemp("shard_lake"))
    cfg = EngineConfig(num_buckets=8, epoch_width=1_000)
    eng = CdcEngine(lake_dir, f"{d}/events", cfg)
    eng.bootstrap(f"{d}/pages.parquet")
    eng.run()
    return eng


@pytest.fixture(scope="module")
def head_df(lake):
    return lake.read_table_arrow().to_pandas()


def _read_df(eng, **kw):
    ds = eng.read_table(**kw)
    parts = [b for b in ds.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        import pandas as pd

        return pd.DataFrame(columns=["url"])
    return pa.concat_tables(parts).to_pandas()


def test_shards_partition_exactly(lake, head_df):
    m = 4
    seen = []
    for i in range(m):
        report = {}
        df = _read_df(lake, bucket_shard=(i, m), prune_report=report)
        assert report["shard_frac"] == 1.0 / m
        # shard membership is exactly the write router's assignment
        if len(df):
            b = stable_hash_u64(pa.array(df["url"], pa.string())) % 8
            assert set(b % m) == {i}
        seen.append(df)
    import pandas as pd

    union = pd.concat(seen).sort_values("url").reset_index(drop=True)
    want = head_df.sort_values("url").reset_index(drop=True)
    assert len(union) == len(want)
    assert list(union["url"]) == list(want["url"])
    assert (union["text"].to_numpy() == want["text"].to_numpy()).all()


def test_shard_validates_bounds(lake):
    with pytest.raises(ValueError):
        lake.read_table(bucket_shard=(4, 4))


def test_link_clone_serves_and_isolates(lake, head_df, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("linked_lake"))
    out = link_lake(lake.lake_dir, dst)
    assert out["files_linked"] > 0 and out["files_copied"] == 0
    clone = CdcEngine(dst, events_dir=lake.events_dir,
                      config=EngineConfig(num_buckets=8))
    # clone serves the same state at the same watermark
    assert clone.store.latest().high_seq == lake.store.latest().high_seq
    cdf = clone.read_table_arrow().to_pandas().sort_values(
        "url").reset_index(drop=True)
    want = head_df.sort_values("url").reset_index(drop=True)
    assert list(cdf["url"]) == list(want["url"])
    assert (cdf["text"].to_numpy() == want["text"].to_numpy()).all()

    # mutate the SOURCE in place (delete DML rewrites bases via
    # tmp+os.replace): the clone's inodes must be untouched
    n_before = len(want)
    victims = want["url"].iloc[:5].tolist()
    lake.delete_where(
        lambda t: pa.compute.is_in(
            t.column("url"), value_set=pa.array(victims)
        )
    )
    assert len(lake.read_table_arrow()) == n_before - 5
    cdf2 = clone.read_table_arrow().to_pandas()
    assert len(cdf2) == n_before  # clone unchanged

    # and the clone can diverge independently
    clone.delete_where(
        lambda t: pa.compute.is_in(
            t.column("url"), value_set=pa.array(victims[:2])
        )
    )
    assert len(clone.read_table_arrow()) == n_before - 2
    assert len(lake.read_table_arrow()) == n_before - 5
