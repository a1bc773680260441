"""REST-style paginated-pull source tests (sources/restapi.py):
page-token resume mid-listing, no-refetch accounting, idempotent
re-pull, and the distributed multi-unit pull."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gobblin_ray.sources.restapi import (
    FilePagedApi,
    paged_pull,
    staged_dataset,
)


@pytest.fixture()
def api_table(tmp_path):
    t = pa.table({
        "event_seq": pa.array(list(range(1, 501)), pa.int64()),
        "v": pa.array([i * 3 for i in range(1, 501)], pa.int64()),
    })
    path = str(tmp_path / "src.parquet")
    pq.write_table(t, path)
    return path


def test_paged_pull_all_units(ray_session, api_table, tmp_path):
    calls = str(tmp_path / "calls.log")
    api = FilePagedApi(api_table, "event_seq", page_size=60,
                       calls_file=calls)
    state = str(tmp_path / "state")
    spans = [(0, 250), (250, 500)]
    lineage = paged_pull(api, spans, state)
    assert all(not u.get("killed_mid_listing") for u in lineage)
    ds = staged_dataset(state)
    got = ds.to_pandas().sort_values("event_seq")
    assert got["event_seq"].tolist() == list(range(1, 501))
    assert got["v"].sum() == sum(i * 3 for i in range(1, 501))


def test_resume_from_page_token_no_refetch(ray_session, api_table,
                                           tmp_path):
    """Kill mid-listing (bounded pages per call), resume, and prove the
    resumed run fetched only the REMAINING pages — the RestApiExtractor
    page-token contract."""
    calls = str(tmp_path / "calls.log")
    api = FilePagedApi(api_table, "event_seq", page_size=50,
                       calls_file=calls)
    state = str(tmp_path / "state")
    spans = [(0, 500)]  # 500 rows / 50 per page = 10 pages
    lineage = paged_pull(api, spans, state, max_pages_per_call=3)
    assert lineage[0]["killed_mid_listing"]
    with open(calls) as f:
        assert len(f.read().splitlines()) == 3
    # resume: finishes the listing from the checkpointed token
    lineage2 = paged_pull(api, spans, state)
    assert not lineage2[0].get("killed_mid_listing")
    with open(calls) as f:
        lines = f.read().splitlines()
    assert len(lines) == 10  # 3 + 7, never refetching pages 0-2
    offsets = [int(line.split(",")[2]) for line in lines]
    assert offsets == [0, 50, 100, 150, 200, 250, 300, 350, 400, 450]
    got = staged_dataset(state).to_pandas().sort_values("event_seq")
    assert got["event_seq"].tolist() == list(range(1, 501))
    # a third pull is a no-op (done marker short-circuits)
    lineage3 = paged_pull(api, spans, state)
    assert lineage3[0]["resumed_done"]
    with open(calls) as f:
        assert len(f.read().splitlines()) == 10


def test_empty_span_completes(ray_session, api_table, tmp_path):
    api = FilePagedApi(api_table, "event_seq", page_size=50)
    state = str(tmp_path / "state")
    lineage = paged_pull(api, [(1000, 2000)], state)
    assert not lineage[0].get("killed_mid_listing")
    assert os.path.exists(os.path.join(state, "unit=0", "done"))
    with pytest.raises(FileNotFoundError):
        staged_dataset(str(tmp_path / "nothing"))
