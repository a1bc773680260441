"""ANALYZE + footer-zone-map pruned reads (stats.py).

Oracle posture: `analyze`'s per-column numbers are checked against exact
pandas recomputation on the merged head; pruned `read_table(ts_min/ts_max)`
windows are checked against the FULL read filtered in pandas — including
windows that interact with tombstones (the unsafe min-side file prune the
implementation deliberately avoids would fail these)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from gobblin_ray import stats as statsmod
from gobblin_ray import synth
from gobblin_ray.engine import CdcEngine, EngineConfig

N_PAGES = 300
N_EVENTS = 3_000


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stats_corpus"))
    synth.write_corpus(d, n_pages=N_PAGES, n_events=N_EVENTS, shard_rows=500)
    lake_dir = str(tmp_path_factory.mktemp("stats_lake"))
    cfg = EngineConfig(num_buckets=8, epoch_width=1_000)
    eng = CdcEngine(lake_dir, f"{d}/events", cfg)
    eng.bootstrap(f"{d}/pages.parquet")
    eng.run()
    return eng


@pytest.fixture(scope="module")
def head_df(lake):
    return lake.read_table_arrow().to_pandas()


def test_analyze_matches_exact(lake, head_df):
    st = statsmod.analyze(lake, ndv_k=4096)
    assert st["epoch"] == lake.store.latest().epoch
    cols = {r["col"]: r for r in st["columns"]}
    n = len(head_df)
    assert st["live_rows"] == n
    for c, r in cols.items():
        assert r["n_rows"] == n
        assert r["n_nulls"] == int(head_df[c].isna().sum())
    # KMV below ndv_k distinct values is EXACT (saturated regime)
    assert cols["url"]["ndv"] == float(head_df["url"].nunique())
    assert cols["lang"]["ndv"] == float(head_df["lang"].nunique())
    # string min/max bytewise == pandas min/max for ascii-ish urls
    assert cols["url"]["min_s"] == head_df["url"].min()
    assert cols["url"]["max_s"] == head_df["url"].max()
    # avg_len of text over non-null rows
    lens = head_df["text"].dropna().str.len()
    assert cols["text"]["avg_len"] == pytest.approx(lens.mean(), abs=1e-9)
    # persisted + fresh
    assert statsmod.load_stats(lake.lake_dir,
                               epoch=st["epoch"]) is not None


def test_zone_map_covers_every_file(lake):
    st = statsmod.load_stats(lake.lake_dir) or statsmod.analyze(lake)
    file_map = lake.bucket_file_map()
    want = {os.path.relpath(p, os.path.abspath(lake.lake_dir))
            for files in file_map.values() for p in files}
    got = {e["path"] for v in st["ts_zone_map"].values() for e in v}
    assert got == want
    # every file got usable footer stats (warc_ts is always written)
    for v in st["ts_zone_map"].values():
        for e in v:
            assert e["min_us"] is not None and e["max_us"] <= 2**62


def _window(head_df, lo_q, hi_q):
    ts = head_df["warc_ts"].astype("datetime64[us]")
    lo = ts.quantile(lo_q) if lo_q is not None else None
    hi = ts.quantile(hi_q) if hi_q is not None else None
    mask = pd.Series(True, index=head_df.index)
    if lo is not None:
        mask &= ts >= lo
    if hi is not None:
        mask &= ts <= hi
    return lo, hi, head_df[mask]


@pytest.mark.parametrize("lo_q,hi_q", [
    (0.5, None),      # recent half (file-level max-side prune kicks in)
    (None, 0.3),      # old tail (bucket prune only — min side must NOT
                      # file-prune, tombstones would resurrect rows)
    (0.25, 0.75),     # interior window
    (0.999, None),    # nearly-empty window
])
def test_pruned_read_matches_filter(lake, head_df, lo_q, hi_q):
    lo, hi, want = _window(head_df, lo_q, hi_q)
    report = {}
    got = statsmod._collect(
        lake.read_table(ts_min=lo, ts_max=hi, prune_report=report)
    ).to_pandas()
    want = want.sort_values("url").reset_index(drop=True)
    got = got.sort_values("url").reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["url"]) == list(want["url"])
    assert (got["warc_ts"].to_numpy("datetime64[us]")
            == want["warc_ts"].to_numpy("datetime64[us]")).all()
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
    assert report["files_read"] <= report["files_total"]


def test_recent_window_prunes_files(lake, head_df):
    # ts_min above most epochs' data: delta files wholly older than the
    # cut are skipped (max-side file prune). The synth log is mostly
    # time-ordered so early-epoch deltas fall entirely below the cut.
    lo, _, want = _window(head_df, 0.9, None)
    report = {}
    got = statsmod._collect(
        lake.read_table(ts_min=lo, prune_report=report)
    ).to_pandas()
    assert len(got) == len(want)
    assert report["files_read"] < report["files_total"], report


def test_stale_stats_fall_back_to_footers(lake, head_df):
    # Corrupt the persisted epoch: load_stats must report stale and the
    # pruned read must fall back to a live footer scan, still correct.
    path = statsmod.stats_path(lake.lake_dir)
    with open(path) as f:
        st = json.load(f)
    st["epoch"] += 7
    with open(path, "w") as f:
        json.dump(st, f)
    head = lake.store.latest()
    assert statsmod.load_stats(lake.lake_dir, epoch=head.epoch) is None
    lo, hi, want = _window(head_df, 0.4, 0.8)
    got = statsmod._collect(lake.read_table(ts_min=lo, ts_max=hi)).to_pandas()
    assert len(got) == len(want)
    # restore freshness for any later test
    st["epoch"] = head.epoch
    with open(path, "w") as f:
        json.dump(st, f)


def test_column_stats_empty_and_allnull(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "a": pa.array([None, None], pa.string()),
        "b": pa.array([1, 2], pa.int64()),
    })
    out = statsmod.column_stats(rd.from_arrow(t), t.schema)
    rows = {r["col"]: r for r in out.to_pylist()}
    assert rows["a"]["n_nulls"] == 2 and rows["a"]["min_s"] is None
    assert rows["a"]["ndv"] == 0.0 and rows["a"]["avg_len"] is None
    assert rows["b"]["min_s"] == "1" and rows["b"]["max_s"] == "2"
    assert rows["b"]["ndv"] == 2.0


def test_manifest_zone_map_matches_footers(lake):
    # write-time ranges (BucketState.ts_ranges) must agree exactly with
    # what a footer scan reads back — same files, same [min,max]
    m = lake.store.latest()
    mr = statsmod.zone_ranges(lake, m)
    fr = statsmod.file_ts_ranges(lake.bucket_file_map(m))
    assert set(mr) == set(fr)
    for b in fr:
        a = {e["path"]: (e["min_us"], e["max_us"]) for e in mr[b]}
        f = {e["path"]: (e["min_us"], e["max_us"]) for e in fr[b]}
        assert a == f
    # and they really are carried by the manifest (no sidecar needed):
    # every live file resolves from ts_ranges alone
    for b, files in lake.bucket_file_map(m).items():
        s = m.buckets[b]
        keys = (["base"] if s.base_epoch >= 0 else []) + [
            str(e) for e in s.delta_epochs
        ]
        assert len([k for k in keys if s.ts_ranges.get(k)]) == len(files)


def test_maintenance_rewrite_falls_back_per_file(lake, head_df):
    # forced compaction rewrites bases WITHOUT write-time ranges: the
    # zone map must fall back to footers for exactly those files and a
    # pruned read must stay correct (LAST: mutates the shared lake)
    lake.compact_now()
    m = lake.store.latest()
    zr = statsmod.zone_ranges(lake, m)
    live = {p for fs in lake.bucket_file_map(m).values() for p in fs}
    got = {e["path"] for v in zr.values() for e in v}
    assert got == live
    lo, hi, want = _window(head_df, 0.5, None)
    res = statsmod._collect(lake.read_table(ts_min=lo)).to_pandas()
    assert len(res) == len(want)
    assert sorted(res["url"]) == sorted(want["url"])
