"""Planner unit tests: sized epochs, bin packing, salting (Ray-free)."""

import numpy as np

from gobblin_ray import plan as pl


def _meta(widths_bytes):
    """Build shard metadata: each (rows, bytes) shard covers a dense
    contiguous seq range."""
    shards, lo = [], 0
    for rows, nbytes in widths_bytes:
        shards.append(
            {"file": f"p{lo}.parquet", "min_seq": lo, "max_seq": lo + rows - 1,
             "rows": rows, "bytes": nbytes, "schema_version": 0}
        )
        lo += rows
    return {"shards": shards, "max_seq": lo - 1}


def test_plan_epochs_sized_adapts_width():
    # 1000 skinny events (100 B each) then 1000 fat events (10 kB each).
    meta = _meta([(1000, 100_000), (1000, 10_000_000)])
    epochs = pl.plan_epochs_sized(meta, committed_high=-1, target_bytes=500_000,
                                  start_index=1)
    # Tiling invariants: contiguous, no gaps, ends at head.
    assert epochs[0].low_seq == -1 and epochs[-1].high_seq == meta["max_seq"]
    for a, b in zip(epochs, epochs[1:]):
        assert b.low_seq == a.high_seq
    # Epochs starting in the skinny segment are ~10x wider than epochs in
    # the fat segment (epoch widths adapt to bytes, not event count).
    skinny = [e.width for e in epochs if e.low_seq < 1000]
    fat = [e.width for e in epochs if e.low_seq >= 1000]
    assert skinny and fat
    assert min(skinny) > 5 * max(fat), (skinny, fat)


def test_plan_epochs_sized_respects_max_width():
    meta = _meta([(10_000, 1_000)])  # absurdly skinny -> huge epochs
    epochs = pl.plan_epochs_sized(meta, -1, 10**9, 1, max_width=500)
    assert all(e.width <= 500 for e in epochs)
    assert epochs[-1].high_seq == meta["max_seq"]


def test_pack_bins_worst_fit_decreasing():
    sizes = {f"w{i}": s for i, s in enumerate([100, 90, 50, 40, 30, 20, 10, 10])}
    bins = pl.pack_bins(sizes, 2)
    loads = [sum(sizes[k] for k in b) for b in bins]
    assert sorted(sum(bins, [])) == sorted(sizes)  # every item placed once
    assert max(loads) - min(loads) <= 30  # balanced (170 vs 180)


def test_plan_epochs_sized_tiling_property():
    """Property: for ANY shard layout (random widths/byte-densities) and any
    resume point, sized epochs tile (committed_high, head] exactly —
    contiguous, gapless, monotone indices, every epoch non-empty, max_width
    respected. (Hypothesis over the planner's whole input space.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    shard = st.tuples(st.integers(1, 5_000), st.integers(1, 2_000_000))

    @settings(max_examples=200, deadline=None)
    @given(
        shards=st.lists(shard, min_size=1, max_size=12),
        target=st.integers(1, 3_000_000),
        resume_frac=st.floats(0, 1),
        max_width=st.one_of(st.none(), st.integers(1, 10_000)),
    )
    def run(shards, target, resume_frac, max_width):
        meta = _meta(shards)
        head = meta["max_seq"]
        committed = int(-1 + resume_frac * (head + 1)) - 1
        committed = max(-1, min(committed, head - 1))
        epochs = pl.plan_epochs_sized(meta, committed, target, 7, max_width)
        assert epochs, "span is non-empty, planner must emit epochs"
        assert epochs[0].low_seq == committed
        assert epochs[-1].high_seq == head
        assert [e.index for e in epochs] == list(range(7, 7 + len(epochs)))
        for a, b in zip(epochs, epochs[1:]):
            assert b.low_seq == a.high_seq
        for e in epochs:
            assert e.high_seq > e.low_seq
            if max_width is not None:
                assert e.high_seq - e.low_seq <= max_width

    run()


def test_expected_event_count_full_and_boundary(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = _meta([(100, 1), (100, 1)])
    for s in meta["shards"]:
        t = pa.table({"event_seq": pa.array(
            range(s["min_seq"], s["max_seq"] + 1), pa.int64())})
        pq.write_table(t, str(tmp_path / s["file"]))
    # Full shards: (−1, 199] = 200 rows; boundary: (49, 149] = 100 rows.
    assert pl.expected_event_count(meta, str(tmp_path), -1, 199) == 200
    assert pl.expected_event_count(meta, str(tmp_path), 49, 149) == 100


def test_expected_event_count_row_group_granular(tmp_path):
    """Boundary shards resolve at row-group granularity: fully-covered
    groups count from stats, only straddling groups decode. Epoch edges
    here are deliberately unaligned with the 25-row groups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = _meta([(100, 1), (100, 1)])
    for s in meta["shards"]:
        t = pa.table({"event_seq": pa.array(
            range(s["min_seq"], s["max_seq"] + 1), pa.int64())})
        pq.write_table(t, str(tmp_path / s["file"]), row_group_size=25)
    # (30, 160]: shard 0 contributes 70 (boundary in RG 1), shard 1
    # contributes 61 (RGs 0-1 full, RG 2 straddles at 160).
    assert pl.expected_event_count(meta, str(tmp_path), 30, 160) == 130
    # Edges exactly on group boundaries and a sub-group span.
    assert pl.expected_event_count(meta, str(tmp_path), 24, 74) == 50
    assert pl.expected_event_count(meta, str(tmp_path), 101, 107) == 6
    # Tiling property: any partition of (−1, 199] sums to 200.
    cuts = [-1, 13, 48, 99, 150, 199]
    assert sum(
        pl.expected_event_count(meta, str(tmp_path), a, b)
        for a, b in zip(cuts, cuts[1:])
    ) == 200


def test_salt_plan_time_axis():
    """Straggler feedback (round-5): a bucket whose previous-epoch merge
    WALL time dominated gets salted even with an even event count; noise
    under the absolute floor never salts; count- and time-hot take the
    larger salt."""
    from gobblin_ray.plan import salt_plan

    even = {b: 100 for b in range(8)}
    # one bucket 10x the mean merge time -> salted, capped at max_salt
    times = {b: 0.1 for b in range(8)}
    times[3] = 8.0
    p = salt_plan(even, 8, hot_factor=4.0, max_salt=8, prev_times=times)
    assert set(p.hot_buckets) == {3}
    assert 2 <= p.hot_buckets[3] <= 8
    # sub-floor absolute times: relative skew alone must not salt
    tiny = {b: 0.001 for b in range(8)}
    tiny[5] = 0.02
    assert salt_plan(
        even, 8, prev_times=tiny
    ).hot_buckets == {}
    # count-hot AND time-hot: max of the two salts wins
    counts = dict(even)
    counts[3] = 100_000  # count salt -> max_salt
    p2 = salt_plan(counts, 8, max_salt=8, prev_times=times)
    assert p2.hot_buckets[3] == 8
    # no signals -> no salting (back-compat with the count-only contract)
    assert salt_plan(even, 8).hot_buckets == {}
    assert salt_plan(None, 8, prev_times=None).hot_buckets == {}


def test_salt_plan_two_bucket_straggler_and_hysteresis():
    """Review findings: (1) with two active buckets the LOWER median is
    the baseline, so the dominant straggler still flags; (2) a bucket
    salted last epoch keeps its salt while its merge time stays above
    the floor (the salted pre-reduce hides the time signal), and unsalts
    once trivially cheap."""
    from gobblin_ray.plan import salt_plan

    even = {0: 100, 1: 100}
    p = salt_plan(even, 2, prev_times={0: 0.1, 1: 30.0})
    assert 1 in p.hot_buckets  # lower median 0.1 is the baseline
    # hysteresis: salted last epoch, time collapsed but >= floor -> keep
    p2 = salt_plan(even, 2, prev_times={0: 0.1, 1: 0.3},
                   prev_salts={1: 4})
    assert p2.hot_buckets.get(1) == 4
    # salted bucket gone trivially cheap -> unsalts
    p3 = salt_plan(even, 2, prev_times={0: 0.1, 1: 0.05},
                   prev_salts={1: 4})
    assert 1 not in p3.hot_buckets
