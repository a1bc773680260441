"""Windowed aggregation stages beyond tumbling windows (SURVEY §2.6/2.8;
tumbling event-time windows live in stages/partition.py `time_partition`).

Session windows are the classic gap-based streaming window (rows of one
key belong to the same session while successive event times are within
``gap``): the reference expresses this as per-key stateful reducers in
its streaming runtime; Ray-native it is ONE bounded-partition exchange
(`hash(key) % P`, never a per-key dispatch) and a fully vectorized
sort + gap-boundary-detect + segmented reduce inside each partition.

Partitioning assumption (documented per the custom-operator rule): one
key's full history fits in a worker — the same assumption the as-of join
makes; raise ``num_partitions`` at scale."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def session_rollup(
    ds,
    key: str,
    ts_col: str,
    gap_seconds: float,
    value_col: str | None = None,
    num_partitions: int = 32,
):
    """Sessionize + per-session rollup in one pass: emits one row per
    (key, session ordinal) with n_events, first/last timestamps and
    (optionally) the value sum. Session boundary = key change OR time gap
    > ``gap_seconds``; ordinals are 1-based per key, deterministic (ties
    in ts fall in the same session regardless of order, since dt == 0).
    """
    from .partition import key_partition

    P = num_partitions
    gap_us = int(gap_seconds * 1_000_000)

    def bucket(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(ts_col)))
        )
        return t.append_column("_kp", pa.array(key_partition(t.column(key), P)))

    bucket.__name__ = "session_bucket"

    def rollup(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")])
        k = g.column(key).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        new_key = np.empty(len(k), bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        dt = np.empty(len(ts), np.int64)
        dt[0] = 0
        dt[1:] = ts[1:] - ts[:-1]
        new_sess = new_key | (dt > gap_us)
        sess = np.cumsum(new_sess)  # global ordinal within partition
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.append(starts, len(k)))
        # per-key 1-based ordinal: subtract the key's first global ordinal
        key_starts = np.flatnonzero(new_key)
        key_first_sess = sess[key_starts]
        key_rep = np.repeat(
            key_first_sess, np.diff(np.append(key_starts, len(k)))
        )
        per_key = sess - key_rep + 1
        out = {
            key: pa.array(k[starts]),
            "session_id": pa.array(per_key[starts].astype(np.int64)),
            "n_events": pa.array(counts.astype(np.int64)),
            "session_start": pa.array(
                ts[starts].astype("datetime64[us]"), pa.timestamp("us")
            ),
            "session_end": pa.array(
                ts[np.append(starts[1:], len(k)) - 1].astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
        if value_col is not None:
            # nulls sum as 0 (SQL SUM ignores NULLs; an all-null session
            # sums to 0.0 here vs SQL NULL — callers coalesce if needed)
            v = np.nan_to_num(
                g.column(value_col).to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
            )
            out["sum_value"] = pa.array(np.add.reduceat(v, starts))
        return pa.table(out)

    rollup.__name__ = "session_rollup"
    cols = [key, ts_col] + ([value_col] if value_col else [])
    return (
        ds.select_columns(cols)
        .map_batches(bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_kp")
        .map_groups(rollup, batch_format="pyarrow")
    )


def hopping_rollup(
    ds,
    ts_col: str,
    width_seconds: float,
    hop_seconds: float,
    value_col: str | None = None,
):
    """Hopping (sliding) event-time windows aligned to the epoch: an event
    at time e belongs to every window [s, s+width) with s a multiple of
    ``hop`` — exactly width/hop overlapping windows (width must be a
    multiple of hop). The tumbling special case is width == hop
    (stages/partition.time_partition); session windows are above.

    Scale shape (combiner rule): the r-fold replication NEVER reaches the
    exchange — each batch expands in numpy, immediately collapses to one
    partial (n, sum) row per window present in the batch, and only those
    partials shuffle through the final groupby. At 10^10 events with
    width/hop = 4 the exchange moves O(windows) rows, not 4x the events.
    Window keys travel as int64 epoch-us and become timestamps only in the
    final tiny projection.
    """
    from ray.data.aggregate import Sum

    width_us = int(width_seconds * 1_000_000)
    hop_us = int(hop_seconds * 1_000_000)
    if width_us % hop_us:
        raise ValueError("width must be a multiple of hop (aligned windows)")
    r = width_us // hop_us

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(ts_col)))
        e = (
            t.column(ts_col).cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
            .astype(np.int64)
        )
        w0 = (e // hop_us) * hop_us
        starts = (w0[None, :] - (np.arange(r) * hop_us)[:, None]).ravel()
        order = np.argsort(starts, kind="stable")
        s = starts[order]
        b = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        out = {
            "_w": pa.array(s[b], pa.int64()),
            "_n": pa.array(np.diff(np.append(b, len(s))).astype(np.int64)),
        }
        if value_col is not None:
            v = np.nan_to_num(
                t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            )
            out["_sv"] = pa.array(np.add.reduceat(np.tile(v, r)[order], b))
        return pa.table(out)

    partial.__name__ = f"hop{r}_partial"

    aggs = [Sum("_n", alias_name="n_events")]
    if value_col is not None:
        aggs.append(Sum("_sv", alias_name="sum_value"))
    cols = [ts_col] + ([value_col] if value_col else [])
    agg = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_w")
        .aggregate(*aggs)
    )

    def finish(t: pa.Table) -> pa.Table:
        w = t.column("_w").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        t = t.drop_columns(["_w"]).append_column(
            "window_start", pa.array(w, pa.timestamp("us"))
        )
        return t

    finish.__name__ = "hop_finish"
    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def analytic_lag_cumsum(
    ds,
    key: str,
    order_by: list[str],
    value_col: str,
    num_partitions: int = 64,
):
    """Per-key ordered analytic functions: ``prev_value`` (SQL ``lag``)
    and ``running_sum`` (SQL ``sum() OVER (... ROWS UNBOUNDED
    PRECEDING)``) of ``value_col``, ordered by ``order_by`` within each
    ``key`` — the row-window analytics family the reference's streaming
    reducers cover with per-key state.

    Scale shape (same contract as session_rollup / merge_asof_by_key):
    ONE exchange on ``hash(key) % num_partitions`` — bounded partitions,
    never per-key dispatch — then per partition one pandas sort +
    ``groupby(key).shift()/cumsum()`` (all-C kernels over every key in
    the partition at once). Rows with a null key are dropped (SQL users
    filter them before windowing anyway; a null PARTITION BY group is
    rarely meaningful). Additions happen in the same sorted order as the
    SQL window, so running sums are bit-identical to the oracle.
    Partitioning assumption: one partition's rows fit in a worker."""
    import pandas as pd

    from .partition import keyed_map_groups

    def analytics(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort")
        grp = g.groupby(key, sort=False)[value_col]
        g["prev_value"] = grp.shift(1)
        # SQL sum() OVER ignores NULLs (a null-value row carries the prior
        # running total) but is NULL until the first non-null value; plain
        # cumsum would emit NaN AT the null row instead.
        cs = g[value_col].fillna(0.0).groupby(g[key], sort=False).cumsum()
        seen = g[value_col].notna().groupby(g[key], sort=False).cummax()
        g["running_sum"] = np.where(seen, cs, np.nan)
        return g

    analytics.__name__ = "lag_cumsum"
    return keyed_map_groups(ds, key, analytics, num_partitions=num_partitions)


def ntile_by(ds, key: str, order_by: list[str], n: int,
             ascending: list[bool] | None = None,
             num_partitions: int = 64, out: str = "tile"):
    """SQL NTILE(n) per key: rows of each key, ordered by ``order_by``,
    split into n buckets — first (count % n) buckets one row larger,
    exactly the SQL rule. Same bounded-partition shape as the other window
    analytics: ONE exchange on ``hash(key) % P``, then a vectorized pandas
    sort + cumcount + closed-form bucket assignment per partition (no
    per-key dispatch). Null keys are dropped (filter upstream for parity).
    """
    import pandas as pd

    from .partition import keyed_map_groups

    asc = ascending if ascending is not None else [True] * len(order_by)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by],
                          ascending=[True, *asc], kind="mergesort")
        grp = g.groupby(key, sort=False)
        r0 = grp.cumcount().to_numpy()
        cnt = grp[key].transform("size").to_numpy()
        q, rem = cnt // n, cnt % n
        big = (q + 1) * rem  # rows covered by the size-(q+1) buckets
        in_big = r0 < big
        tile = np.where(
            in_big,
            r0 // np.maximum(q + 1, 1),
            rem + (r0 - big) // np.maximum(q, 1),
        ) + 1
        g[out] = tile.astype(np.int64)
        return g

    assign.__name__ = "ntile_assign"
    return keyed_map_groups(ds, key, assign, num_partitions=num_partitions)


def last_observed_state(ds, key: str, order_by: list[str],
                        value_cols: list[str], num_partitions: int = 64):
    """CDC partial-column upsert (merge-patch reduce): one row per ``key``
    carrying, for EACH of ``value_cols`` independently, the LAST NON-NULL
    value in ``order_by`` order — change records that carry only the
    columns they touch (null = "not present", not "set to null") fold into
    the full current state. This is the partial-update payload contract of
    CDC lake writers (Hudi's OverwriteNonDefaultsWithLatestAvroPayload;
    Gobblin analog: converter-merged mutation streams feeding
    `gobblin-runtime`'s dedup-reducer, SURVEY §2.8) — distinct from the
    engine's whole-row LWW (`merge.lww_reduce`), where the newest row wins
    wholesale.

    Scale shape: ONE bounded exchange on ``hash(key) % num_partitions``
    (same contract as the session/lag analytics), then per partition one
    mergesort + ``groupby(key).last()`` — pandas' ``last`` skips NA, so the
    per-column scan is a single C kernel over every key in the partition.
    Refinement documented for very hot keys: a within-batch combiner must
    carry per-COLUMN (order, value) partials (a single surviving row per
    key is not associative when different columns' last writers are in
    different batches), so it is deliberately not applied here.
    Output columns: ``key`` then ``last_<col>`` per value column."""
    import pandas as pd

    from .partition import keyed_map_groups

    def reduce_state(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort")
        out = g.groupby(key, sort=False)[value_cols].last()
        out.columns = [f"last_{c}" for c in value_cols]
        return out.reset_index()

    reduce_state.__name__ = "last_observed_state"
    return keyed_map_groups(ds, key, reduce_state,
                            num_partitions=num_partitions)
