"""Bloom secondary index (index.py) + eq-pruned merge-on-read.

Safety model under test: pruning is per BUCKET only (winners are file
rows verbatim), a bucket with any unindexed file fails open, nulls never
match, and the sidecar is incremental across epochs (per-file blooms are
immutable-file-keyed)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gobblin_ray import index as idxmod
from gobblin_ray import synth
from gobblin_ray.engine import CdcEngine, EngineConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_corpus"))
    synth.write_corpus(d, n_pages=300, n_events=3_000, shard_rows=500)
    return d


@pytest.fixture(scope="module")
def lake(ray_session, corpus, tmp_path_factory):
    lake_dir = str(tmp_path_factory.mktemp("idx_lake"))
    cfg = EngineConfig(num_buckets=8, epoch_width=1_000)
    eng = CdcEngine(lake_dir, f"{corpus}/events", cfg)
    eng.bootstrap(f"{corpus}/pages.parquet")
    # index at the bootstrap watermark, BEFORE the replay — the rebuild
    # after run() must reuse these per-file blooms (files are immutable)
    first = idxmod.build_bloom_index(eng, ["lang", "event_seq",
                                           "fetch_status"])
    assert first["entries_reused"] == 0 and first["entries_computed"] > 0
    eng.run()
    second = idxmod.build_bloom_index(eng, ["lang", "event_seq",
                                            "fetch_status"])
    # surviving bootstrap bases are reused; new delta files computed
    assert second["entries_reused"] > 0, second
    assert second["entries_computed"] > 0, second
    return eng


@pytest.fixture(scope="module")
def head_df(lake):
    return lake.read_table_arrow().to_pandas()


def test_bloom_unit_membership_and_fp_rate():
    vals = pa.array([f"v{i}" for i in range(5_000)])
    m = idxmod._size_bits(len(vals))
    bits = idxmod._build_bitset(vals, m, k=7)
    for probe in ("v0", "v4999", "v2500"):
        assert idxmod.might_contain(bits, m, 7, probe)
    fp = sum(
        idxmod.might_contain(bits, m, 7, f"absent{i}") for i in range(2_000)
    )
    assert fp / 2_000 < 0.05, fp


def test_eq_read_matches_filter(lake, head_df):
    report = {}
    got = lake.read_table(eq={"lang": "en"}, prune_report=report)
    got = pa.concat_tables(
        [b for b in got.iter_batches(batch_format="pyarrow") if b.num_rows]
    ).to_pandas().sort_values("url").reset_index(drop=True)
    want = head_df[head_df["lang"] == "en"].sort_values(
        "url").reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["url"]) == list(want["url"])
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
    assert report["bloom_buckets_total"] == 8


def test_eq_absent_value_prunes_everything(lake):
    report = {}
    ds = lake.read_table(eq={"lang": "xx-not-a-language"},
                         prune_report=report)
    assert ds.count() == 0
    assert report["bloom_buckets_read"] == 0, report


def test_eq_point_probe_prunes_most_buckets(lake, head_df):
    # event_seq is ~unique per row -> its bloom confines the probe to
    # the owning bucket (plus rare false positives)
    target = int(head_df.loc[head_df["event_seq"] >= 0, "event_seq"].iloc[17])
    report = {}
    ds = lake.read_table(eq={"event_seq": target}, prune_report=report)
    rows = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    ).to_pandas()
    assert len(rows) == int((head_df["event_seq"] == target).sum())
    assert report["bloom_buckets_read"] <= 3, report


def test_eq_schema_evolved_column(lake, head_df):
    # fetch_status arrives mid-log: pre-evolution files carry an empty
    # bloom (nulls only), post-evolution deltas index real values
    got = lake.read_table(eq={"fetch_status": 404})
    n = got.count()
    assert n == int((head_df["fetch_status"] == 404).sum())
    assert n > 0


def test_eq_fails_open_without_index(ray_session, corpus, tmp_path_factory,
                                     head_df):
    # no sidecar built: every bucket is read, result identical
    lake_dir = str(tmp_path_factory.mktemp("idx_lake_noidx"))
    cfg = EngineConfig(num_buckets=8, epoch_width=1_000)
    eng = CdcEngine(lake_dir, f"{corpus}/events", cfg)
    eng.bootstrap(f"{corpus}/pages.parquet")
    eng.run()
    report = {}
    ds = eng.read_table(eq={"lang": "en"}, prune_report=report)
    assert report["bloom_buckets_read"] == report["bloom_buckets_total"]
    want = head_df[head_df["lang"] == "en"]
    assert ds.count() == len(want)


def test_eq_unknown_column_raises(lake):
    with pytest.raises(ValueError):
        lake.read_table(eq={"nope": 1})


def test_eq_composes_with_ts_window_and_projection(lake, head_df):
    ts = head_df["warc_ts"].astype("datetime64[us]")
    lo = ts.quantile(0.4)
    want = head_df[(head_df["lang"] == "de") & (ts >= lo)]
    ds = lake.read_table(columns=["url", "text"], eq={"lang": "de"},
                         ts_min=lo)
    got = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    ).to_pandas()
    assert sorted(got.columns) == ["url", "text"][::-1] or \
        sorted(got.columns) == ["text", "url"]
    assert len(got) == len(want)
    assert sorted(got["url"]) == sorted(want["url"])
