"""Straggler-feedback e2e (round-5 judge item #8): a bucket whose merge
wall-time dominated an epoch is salted by the NEXT epoch's plan with no
config, and the oracle identity is preserved — salting only changes the
exchange shape, never the merged bytes."""

import json
import os

import pytest

from gobblin_ray import synth
from gobblin_ray.engine import CdcEngine, EngineConfig


def _cfg():
    return EngineConfig(num_buckets=4, epoch_width=500)


def test_merge_sec_lands_in_manifest(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("strag_corpus"))
    synth.write_corpus(d, n_pages=60, n_events=1000, shard_rows=500)
    lake = str(tmp_path_factory.mktemp("strag_lake"))
    eng = CdcEngine(lake, f"{d}/events", _cfg())
    eng.bootstrap(f"{d}/pages.parquet")
    eng.run(vacuum=False)
    m = eng.store.latest()
    secs = [s.merge_sec for s in m.buckets.values() if s.events_epoch]
    assert secs and all(s > 0 for s in secs)  # timing observed + persisted


def test_hot_merge_time_salts_next_epoch_oracle_identical(
    ray_session, tmp_path_factory
):
    """Inject an observed merge-time skew into the committed manifest
    between two runs (the deterministic stand-in for a genuinely slow
    bucket — wall-time cannot be forced reproducibly in CI) and assert
    (a) the next epoch's plan salts that bucket with zero config and
    (b) the final table is byte-identical to an undoctored replay."""
    d = str(tmp_path_factory.mktemp("strag_corpus2"))
    synth.write_corpus(d, n_pages=60, n_events=1000, shard_rows=500)

    def run_half(lake):
        eng = CdcEngine(lake, f"{d}/events", _cfg())
        eng.bootstrap(f"{d}/pages.parquet")
        eng.run(max_epochs=1, vacuum=False)
        return eng

    lake_a = str(tmp_path_factory.mktemp("strag_a"))
    lake_b = str(tmp_path_factory.mktemp("strag_b"))
    eng_a = run_half(lake_a)
    eng_b = run_half(lake_b)

    # doctor lake_a's committed manifest: bucket 2's merge dominated
    mpath = sorted(
        os.path.join(lake_a, "_checkpoints", f)
        for f in os.listdir(os.path.join(lake_a, "_checkpoints"))
        if f.endswith(".json")
    )[-1]
    with open(mpath) as f:
        doc = json.load(f)
    for b, s in doc["buckets"].items():
        s["merge_sec"] = 30.0 if b == "2" else 0.05
    with open(mpath, "w") as f:
        json.dump(doc, f)

    salted_before = eng_a.store.latest().metrics.get("salted_buckets", 0)
    eng_a = CdcEngine(lake_a, f"{d}/events", _cfg())
    eng_a.run(vacuum=False)  # resumes; next plan sees the doctored times
    salted_after = eng_a.store.latest().metrics.get("salted_buckets", 0)
    assert salted_after > salted_before  # the plan adapted in ONE epoch

    eng_b = CdcEngine(lake_b, f"{d}/events", _cfg())
    eng_b.run(vacuum=False)  # undoctored control
    ta = eng_a.read_table_arrow().sort_by([("url", "ascending")])
    tb = eng_b.read_table_arrow().sort_by([("url", "ascending")])
    assert ta.equals(tb)  # salting changed the exchange, not the bytes
