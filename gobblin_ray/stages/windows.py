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
        if t.num_rows == 0:
            # empty/all-null-ts block: the change-point seed [True] below
            # would index into an empty array
            cols = {"_w": pa.array([], pa.int64()),
                    "_n": pa.array([], pa.int64())}
            if value_col is not None:
                cols["_sv"] = pa.array([], pa.float64())
            return pa.table(cols)
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


def scd2_history(ds, key: str, order_by: list[str], attr: str,
                 num_partitions: int = 64):
    """Slowly-changing-dimension type-2 history: collapse each key's
    ordered event stream into one row per ATTRIBUTE CHANGE, with validity
    interval [valid_from, valid_to) — valid_to is the next change's start,
    null for the current row. The warehouse-side CDC pattern this engine's
    lake feeds (reference analog: Gobblin-ingested mutation streams landing
    in SCD2 dimension tables; the LWW reducer keeps only the newest state,
    SCD2 keeps the full validity timeline).

    Change semantics: a row opens a new interval when its ``attr`` IS
    DISTINCT FROM the previous row's (null-safe, so null->value and
    value->null both count; first row always opens). ``order_by[0]`` is
    the event-time column used for the validity bounds.

    Scale shape: ONE bounded exchange on ``hash(key) % num_partitions``,
    then per partition one mergesort + vectorized shift/compare/shift —
    the same all-C-kernel contract as the other window analytics. Null
    keys dropped (filter upstream for parity)."""
    import pandas as pd

    from .partition import keyed_map_groups

    ts_col = order_by[0]

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort")
        kcol = g[key]
        prev_attr = g[attr].shift(1)
        same_key = kcol.eq(kcol.shift(1))
        # null-safe "attr changed": equal treats NaN != NaN, so compare
        # via (a == b) | (both null)
        a, b = g[attr], prev_attr
        unchanged = a.eq(b) | (a.isna() & b.isna())
        opens = (~same_key) | (~unchanged)
        c = g[opens.to_numpy()]
        out = pd.DataFrame({
            key: c[key].to_numpy(),
            attr: c[attr].to_numpy(),
            "valid_from": c[ts_col].to_numpy(),
        })
        nxt = out["valid_from"].shift(-1)
        same_next = out[key].eq(out[key].shift(-1))
        out["valid_to"] = nxt.where(same_next.to_numpy())
        return out

    collapse.__name__ = "scd2_collapse"
    return keyed_map_groups(ds, key, collapse,
                            num_partitions=num_partitions)


def dedup_within_window(ds, keys: list[str], ts_col: str, gap_s: float,
                        order_tiebreak: list[str] | None = None,
                        num_partitions: int = 64):
    """Streaming-style windowed deduplication: keep a row only if the
    PREVIOUS kept row with the same ``keys`` is more than ``gap_s``
    seconds older — the at-most-one-per-window throttle used to suppress
    duplicate beacons / retry storms in event ingestion. "Previous KEPT"
    (not previous raw) is the reference-faithful semantics: a burst
    emits one survivor per gap_s stretch, measured from the last
    survivor.

    Scale shape: ONE bounded exchange on the key hash, then a per-partition
    pass. The kept-anchored chain is inherently sequential per key, but the
    loop body is a C ``searchsorted`` that JUMPS to the first row past the
    window — O(kept · log rows) iterations total, not a Python visit of
    every row (a retry storm of 10^6 duplicates inside one window costs
    one iteration, not 10^6)."""
    import pandas as pd

    from .partition import keyed_map_groups

    tiebreak = order_tiebreak or []
    kp = keys[0]

    def throttle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*keys, ts_col, *tiebreak], kind="mergesort")
        # group boundary = ANY key column differs from the previous row
        # (null-safe); vectorized per column — no row-wise string join
        new_grp = np.zeros(len(g), dtype=bool)
        new_grp[:1] = True
        for k in keys:
            col = g[k]
            prev = col.shift(1)
            same = col.eq(prev) | (col.isna() & prev.isna())
            new_grp |= ~same.to_numpy()
        new_grp = pd.Series(new_grp, index=g.index)
        ts = g[ts_col].to_numpy()
        # event-time seconds as float64 (datetime64 or numeric)
        if np.issubdtype(ts.dtype, np.datetime64):
            tsec = ts.astype("datetime64[us]").astype(np.int64) / 1e6
        else:
            tsec = ts.astype(np.float64)
        grp_start = new_grp.to_numpy()
        keep = np.zeros(len(g), dtype=bool)
        starts = np.flatnonzero(grp_start)
        bounds = np.append(starts, len(g))
        # per key group: keep the anchor, searchsorted-jump to the first
        # row strictly past anchor+gap (ts is sorted within the group)
        for gi in range(len(starts)):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            seg = tsec[s:e]
            i = 0
            n = e - s
            while i < n:
                keep[s + i] = True
                i = int(np.searchsorted(seg, seg[i] + gap_s, side="right"))
        return g[keep]

    def drop_null_ts(t):
        import pyarrow.compute as _pc

        # a null timestamp has no position in any window — and once cast
        # to int64 seconds a NaT becomes INT64_MIN, breaking the
        # sorted-segment invariant searchsorted jumps rely on (it silently
        # dropped VALID rows after the NaT in a group)
        return t.filter(_pc.is_valid(t.column(ts_col)))

    throttle.__name__ = f"dedup_window[{gap_s}s]"
    return keyed_map_groups(ds, kp, throttle,
                            num_partitions=num_partitions,
                            pre=drop_null_ts)


def rolling_window(ds, key: str, order_by: list[str], value_col: str,
                   n_rows: int, num_partitions: int = 64):
    """Moving-frame window aggregates per key: for each row, sum / avg /
    min / count of ``value_col`` over the frame ``ROWS BETWEEN n_rows-1
    PRECEDING AND CURRENT ROW`` ordered by ``order_by`` — the
    moving-average / peak-detection shape (reference analog: windowed
    rollups its streaming runtime builds from per-key state).

    Float parity contract: the frame sum adds oldest -> newest, the same
    order DuckDB evaluates moving frames, so sums are BIT-IDENTICAL to
    the SQL window (verified empirically; a cumsum-diff formulation would
    drift by subtraction error). Cost is n_rows vectorized shifted adds —
    right for small frames; for n_rows in the thousands use a segment
    tree / cumsum-diff with explicit rounding instead.

    Scale shape: ONE bounded exchange on ``hash(key) % num_partitions``,
    then per partition one mergesort + n_rows numpy adds. Emits the input
    columns plus roll_sum / roll_avg / roll_min / roll_n."""
    import pandas as pd

    from .partition import keyed_map_groups

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort")
        raw = g[value_col].to_numpy(dtype=np.float64)
        # SQL frame aggregates IGNORE NULLs: a null row contributes to no
        # frame sum/avg/min/count (one NaN used to poison every frame
        # containing it); an all-null frame yields NaN (SQL NULL)
        notnull = ~np.isnan(raw)
        v = np.where(notnull, raw, 0.0)
        pos = g.groupby(key, sort=False).cumcount().to_numpy()
        m = len(g)
        acc = np.zeros(m)
        mn = np.full(m, np.inf)
        cnt = np.zeros(m, np.int64)
        # oldest -> newest so addition order matches the SQL frame
        for lag in range(n_rows - 1, -1, -1):
            valid = pos >= lag
            shifted = np.empty(m)
            sh_nn = np.empty(m, bool)
            if lag:
                shifted[lag:] = v[:-lag]
                shifted[:lag] = 0.0
                sh_nn[lag:] = notnull[:-lag]
                sh_nn[:lag] = False
            else:
                shifted[:] = v
                sh_nn[:] = notnull
            take = valid & sh_nn
            acc[take] += shifted[take]
            np.minimum(mn, np.where(take, shifted, np.inf), out=mn)
            cnt += take
        has = cnt > 0
        out = g.copy()
        out["roll_sum"] = np.where(has, acc, np.nan)
        out["roll_avg"] = np.where(has, acc / np.maximum(cnt, 1), np.nan)
        out["roll_min"] = np.where(has, mn, np.nan)
        out["roll_n"] = cnt  # SQL COUNT(value): non-null only
        return out

    roll.__name__ = f"rolling[{n_rows}]"
    return keyed_map_groups(ds, key, roll, num_partitions=num_partitions)


def rank_by(ds, key: str, rank_cols: list[str], tiebreak: list[str],
            descending: bool = True, num_partitions: int = 64):
    """rank() / dense_rank() / row_number() per key over ``rank_cols``
    (ties share rank; ``tiebreak`` makes row_number deterministic, as an
    oracle-comparable SQL row_number needs a unique ORDER BY anyway).

    Scale shape: ONE bounded exchange, then per partition one mergesort
    plus change-point arithmetic (flatnonzero / maximum.accumulate /
    cumsum) — no per-group dispatch, no Python loop. Emits the input
    columns plus rnk / dense_rnk / row_num (1-based, SQL semantics)."""
    import pandas as pd

    from .partition import keyed_map_groups

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        asc = [True] + [not descending] * len(rank_cols) + [True] * len(tiebreak)
        g = g.sort_values([key, *rank_cols, *tiebreak], ascending=asc,
                          kind="mergesort")
        m = len(g)
        kcol = g[key]
        new_key = np.zeros(m, bool)
        new_key[0] = True
        new_key[1:] = (kcol.to_numpy()[1:] != kcol.to_numpy()[:-1])
        change = new_key.copy()
        for c in rank_cols:
            col = g[c]
            prev = col.shift(1)
            same = (col.eq(prev) | (col.isna() & prev.isna())).to_numpy()
            same[0] = False
            change |= ~same
        idx = np.arange(m)
        grp_start = np.maximum.accumulate(np.where(new_key, idx, -1))
        row_num = idx - grp_start + 1
        last_change = np.maximum.accumulate(np.where(change, idx, -1))
        rnk = row_num[last_change]
        cs = np.cumsum(change)
        dense = cs - cs[grp_start] + 1
        out = g.copy()
        out["rnk"] = rnk.astype(np.int64)
        out["dense_rnk"] = dense.astype(np.int64)
        out["row_num"] = row_num.astype(np.int64)
        return out

    rank.__name__ = "rank_by"
    return keyed_map_groups(ds, key, rank, num_partitions=num_partitions)


def analytic_frame_values(ds, key: str, order_by: list[str], value_col: str,
                          rank_col: str, num_partitions: int = 64):
    """The remaining SQL analytic-window family: ``lead(value)`` (as
    ``next_value``), ``first_value`` / ``last_value`` over the FULL
    partition frame (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING — the unambiguous frame; the SQL default frame for
    last_value is a classic footgun), and ``percent_rank`` / ``cume_dist``
    ordered by ``rank_col`` (ties share: peers are IS NOT DISTINCT groups,
    nulls/NaN all mutually peers, nulls last — DuckDB ASC default).

    Gobblin analog: the per-key stateful streaming reducers
    (gobblin-runtime fork/operator stream state); rebuilt Ray-native as
    the family's shared shape — ONE bounded exchange on ``hash(key) % P``
    (keyed_map_groups), then pure change-point arithmetic per partition
    (lexsort / maximum.accumulate / searchsorted), no per-key dispatch.

    Exactness: pct_rank = (rnk-1)/(n-1) and cume_dist = peers_end/n are
    single IEEE divisions of small ints — bit-identical to the SQL
    oracle, no rounding needed. next/first/last are raw column values.
    Null keys are dropped (SQL window parity: filter upstream)."""
    import pandas as pd

    from .partition import keyed_map_groups

    def frame(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort").reset_index(
            drop=True
        )
        m = len(g)
        if m == 0:
            for c in ("next_value", "first_val", "last_val",
                      "pct_rank", "cume_dist"):
                g[c] = pd.Series(dtype="float64")
            return g
        k = g[key].to_numpy()
        idx = np.arange(m)
        new_key = np.zeros(m, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, m))
        grp_start = np.repeat(starts, sizes)
        grp_end = np.repeat(starts + sizes - 1, sizes)
        v = g[value_col].to_numpy(dtype="float64", na_value=np.nan)
        nxt = np.empty(m, np.float64)
        nxt[:-1] = v[1:]
        nxt[idx == grp_end] = np.nan
        g["next_value"] = nxt
        g["first_val"] = v[grp_start]
        g["last_val"] = v[grp_end]
        # rank ordering over rank_col within key (NaN sorts last, like
        # DuckDB NULLS LAST ASC); stable so tie groups stay contiguous
        rv = g[rank_col].to_numpy(dtype="float64", na_value=np.nan)
        order = np.lexsort((rv, k))
        rv2, k2 = rv[order], k[order]
        new_key2 = np.zeros(m, bool)
        new_key2[0] = True
        new_key2[1:] = k2[1:] != k2[:-1]
        starts2 = np.flatnonzero(new_key2)
        sizes2 = np.diff(np.append(starts2, m))
        grp_start2 = np.repeat(starts2, sizes2)
        n2 = np.repeat(sizes2, sizes2).astype(np.float64)
        same = np.zeros(m, bool)
        same[1:] = (rv2[1:] == rv2[:-1]) | (
            np.isnan(rv2[1:]) & np.isnan(rv2[:-1])
        )
        change = new_key2 | ~same
        ch_idx = np.flatnonzero(change)
        row_num2 = idx - grp_start2 + 1
        rnk2 = row_num2[np.maximum.accumulate(np.where(change, idx, -1))]
        # peer-group end = (next change point) - 1; key starts are always
        # change points, so the peer group never crosses a key boundary
        pos = np.searchsorted(ch_idx, idx, side="right")
        nc = np.where(pos < len(ch_idx), ch_idx[np.minimum(pos, len(ch_idx) - 1)], m)
        peers_end = (nc - grp_start2).astype(np.float64)
        pct2 = np.where(n2 > 1, (rnk2 - 1) / np.maximum(n2 - 1, 1.0), 0.0)
        cume2 = peers_end / n2
        pct = np.empty(m, np.float64)
        cume = np.empty(m, np.float64)
        pct[order] = pct2
        cume[order] = cume2
        g["pct_rank"] = pct
        g["cume_dist"] = cume
        return g

    frame.__name__ = "analytic_frame"
    return keyed_map_groups(ds, key, frame, num_partitions=num_partitions)


def ewma_by_key(ds, key: str, order_by: list[str], value_col: str,
                alpha: float = 0.1, last_only: bool = False,
                num_partitions: int = 64):
    """Per-key exponential moving average (EWMA, the adjust-free
    recurrence ``s_1 = x_1; s_t = (1-alpha)*s_{t-1} + alpha*x_t`` over
    rows ordered by ``order_by``) — the streaming smoothed-metric /
    anomaly-baseline shape (reference analog: the per-key state its
    streaming runtime folds per record; EWMA is the canonical such fold).
    Emits ``(key, rn, ewma)`` per row, or only each key's LAST row with
    ``last_only=True`` (the "current smoothed state per key" serving
    shape). NULL values must be filtered upstream (a NULL poisons the
    SQL recurrence forever; the paired oracle's WHERE matches).

    Float parity contract: each step evaluates EXACTLY the SQL
    expression ``(1.0 - alpha) * s + alpha * x`` in float64 — same two
    multiplies, same add, same literals — so results are BIT-IDENTICAL
    to a recursive-CTE oracle with that expression, no rounding anywhere.

    Scale shape: ONE bounded exchange on ``hash(key) % num_partitions``,
    then per partition a rank-indexed vectorized scan: rows are bucketed
    by their per-key rank once (bincount + stable argsort, O(n)), and
    step j updates ALL rank-j rows across every key in one fancy-indexed
    expression — total work O(rows), loop depth = max rows per key IN
    THIS PARTITION (the count_triangles wedge-pass idiom), never a
    per-row Python loop."""
    import pandas as pd

    from .partition import keyed_map_groups

    a = float(alpha)

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort")
        x = g[value_col].to_numpy(dtype=np.float64)
        pos = g.groupby(key, sort=False).cumcount().to_numpy()
        s = x.copy()  # rank-0 rows: s_1 = x_1
        n = len(g)
        if n:
            order_idx = np.argsort(pos, kind="stable")
            cnt = np.bincount(pos)
            start = np.cumsum(cnt) - cnt
            for j in range(1, len(cnt)):
                idx = order_idx[start[j]: start[j] + cnt[j]]
                # sorted by (key, order): idx-1 is the SAME key's rank j-1
                s[idx] = (1.0 - a) * s[idx - 1] + a * x[idx]
        out = pd.DataFrame({
            key: g[key].to_numpy(),
            "rn": (pos + 1).astype(np.int64),
            "ewma": s,
        })
        if last_only and n:
            out = out.loc[out.groupby(key, sort=False)["rn"].idxmax()]
        return out

    smooth.__name__ = "ewma_by_key"
    return keyed_map_groups(ds, key, smooth, num_partitions=num_partitions)


def distinct_count_by_window(ds, ts_col: str, key_col: str, width_s: int,
                             num_partitions: int = 64):
    """EXACT distinct keys per tumbling event-time window — the streaming
    "hourly unique users" staple (the reference computes this as a Hive
    COUNT(DISTINCT) over its time-partitioned output; Flink as a keyed
    window dedup + count). A plain groupby(window).count_distinct would
    ship every raw row to the window's partition and hold the full key
    set of a hot window in one task; this shape never does either.

    Scale shape: per-batch the (window, key) pairs are deduped with
    pyarrow's C++ hash groupby (the combiner — repeated keys inside a
    window collapse before anything moves), then ONE bounded exchange on
    ``hash(window, key) % num_partitions`` splits every window's key set
    across partitions (a hot window is split, not hotspotted); each
    partition dedups its disjoint pair slice and emits per-window partial
    counts, and because pairs are partition-disjoint the final is a tiny
    Sum groupby over O(windows x P) rows. Null ts or null key rows drop
    (SQL COUNT(DISTINCT) semantics; a null ts has no window).

    Returns ``(window_start timestamp[us], n_distinct int64)``.
    """
    from ray.data.aggregate import Sum

    from ..functions.sketch import _splitmix64, hash_column_u64
    from .partition import keyed_map_groups

    width_us = int(width_s) * 1_000_000

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(ts_col)),
                             pc.is_valid(t.column(key_col))))
        us = t.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        w = (us // width_us) * width_us
        p = pa.table({"window_us": pa.array(w),
                      "k": t.column(key_col)})
        # combiner: within-batch distinct pairs, vectorized C++
        p = pa.TableGroupBy(p, ["window_us", "k"]).aggregate([])
        with np.errstate(over="ignore"):
            ph = _splitmix64(
                p.column("window_us").to_numpy(zero_copy_only=False)
                .view(np.uint64) * np.uint64(1099511628211)
                + hash_column_u64(p.column("k")))
        return p.append_column("_ph", pa.array(ph.astype(np.int64)))

    pairs.__name__ = "window_key_pairs"

    def count_partial(g: pa.Table) -> pa.Table:
        d = pa.TableGroupBy(
            g.select(["window_us", "k"]), ["window_us", "k"]).aggregate([])
        agg = pa.TableGroupBy(d, "window_us").aggregate([("k", "count")])
        return pa.table({
            "window_us": agg.column("window_us").cast(pa.int64()),
            "n": agg.column("k_count").cast(pa.int64()),
        })

    count_partial.__name__ = "distinct_partial"
    parts = keyed_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        "_ph", count_partial, num_partitions=num_partitions,
        batch_format="pyarrow")
    out = parts.groupby("window_us").aggregate(Sum("n", alias_name="nd"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": t.column("window_us").cast(pa.int64())
            .cast(pa.timestamp("us")),
            "n_distinct": t.column("nd").cast(pa.int64()),
        })

    finish.__name__ = "window_finish"
    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def cohort_retention(ds, ts_col: str, key_col: str,
                     num_partitions: int = 64):
    """Cohort retention analysis — the product-analytics staple the
    funnel composition doesn't cover: group every key (user) into the
    cohort of its FIRST-seen day, then count how many of each cohort
    were active again k days later. Returns ``(cohort_day, day_offset,
    n_users)`` with days as int64 epoch-day indices (floor(epoch_us /
    86_400e6) — the oracle replays the identical arithmetic; callers
    render dates at the edge).

    Scale shape: per-batch combiner dedups (key, day) activity pairs
    with pyarrow's C++ hash groupby; ONE bounded exchange on
    ``hash(key) % num_partitions`` co-locates each key's day set (the
    same partitioning the session/as-of family uses — one key's days
    fit a worker); inside each partition one lexsort derives first-seen
    day and offsets for every key vectorized, collapsing to per-
    (cohort, offset) partial counts. Keys are partition-disjoint, so
    the finish is a tiny Sum groupby over O(cohorts x offsets x P)
    rows. Null ts / null key rows drop.
    """
    from ray.data.aggregate import Sum

    from .partition import keyed_map_groups

    day_us = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(ts_col)),
                             pc.is_valid(t.column(key_col))))
        us = t.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        p = pa.table({"k": t.column(key_col),
                      "day": pa.array(us // day_us)})
        return pa.TableGroupBy(p, ["k", "day"]).aggregate([])

    pairs.__name__ = "activity_pairs"

    def fold(g: pa.Table) -> pa.Table:
        k = g.column("k").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))
        ks, dsrt = k[order], d[order]
        # partition-level pair dedup (the batch combiner can't see
        # across batches): adjacent equal (k, day) after the lexsort
        keep = np.r_[True, (ks[1:] != ks[:-1]) | (dsrt[1:] != dsrt[:-1])]
        ks, dsrt = ks[keep], dsrt[keep]
        first = np.r_[True, ks[1:] != ks[:-1]]
        starts = np.flatnonzero(first)
        runs = np.diff(np.r_[starts, len(ks)])
        d0 = np.repeat(dsrt[starts], runs)
        off = dsrt - d0
        part = pa.table({"cohort_day": pa.array(d0),
                         "day_offset": pa.array(off)})
        agg = pa.TableGroupBy(part, ["cohort_day", "day_offset"]) \
            .aggregate([("day_offset", "count")])
        return pa.table({
            "cohort_day": agg.column("cohort_day").cast(pa.int64()),
            "day_offset": agg.column("day_offset").cast(pa.int64()),
            "n": agg.column("day_offset_count").cast(pa.int64()),
        })

    fold.__name__ = "cohort_fold"
    parts = keyed_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        "k", fold, num_partitions=num_partitions, batch_format="pyarrow")
    out = parts.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n", alias_name="n_users"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": t.column("cohort_day").cast(pa.int64()),
            "day_offset": t.column("day_offset").cast(pa.int64()),
            "n_users": t.column("n_users").cast(pa.int64()),
        })

    finish.__name__ = "cohort_finish"
    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def resample_ffill(ds, key: str, ts_col: str, value_col: str,
                   every_s: int = 3600, num_partitions: int = 32):
    """Regularize an irregular per-key time series onto a dense grid with
    forward fill: per key, one row per ``every_s``-second bucket from the
    key's first to last observation, carrying the key's LAST observed
    value at-or-before each grid point (gap-fill / resample — the shape a
    metrics or sensor CDC feed needs before windowed math).

    Per-bucket observation = the value of the max-``ts`` row in that
    bucket, ties broken by max value (a total order, so the result is
    deterministic and SQL-expressible: ``list(v ORDER BY ts DESC, v
    DESC)[1]``). Grid timestamps are bucket FLOORS (epoch-aligned
    multiples of ``every_s``). The first grid point per key is the key's
    first observed bucket, so the output never contains nulls.

    Reference analog: none in Gobblin (it lands raw feeds and leaves
    regularization to Hive/Pinot) — beyond-reference addition in the
    windowed-analytics family.

    Scale shape: ONE bounded exchange on ``hash(key) % P``; inside each
    partition everything is vectorized numpy (sort + run-length bucket
    collapse + arithmetic grid expansion + one searchsorted fill).
    Output size is O(key-span/every_s), independent of input row count.
    Partitioning assumption (custom-operator rule): one key's grid fits
    a worker; raise ``num_partitions`` / shrink spans at scale. Null
    key/ts/value rows are dropped at the tag stage.
    """
    import pandas as pd

    from .partition import keyed_map_groups

    E = int(every_s) * 1_000_000  # bucket width in microseconds


    def project(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(ts_col))),
            pc.is_valid(t.column(value_col)),
        )
        t = t.filter(keep)
        return pa.table({
            key: t.column(key),
            "_us": t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
            "_v": t.column(value_col).cast(pa.float64()),
        })

    def fill(g: pa.Table) -> pa.Table:
        # pyarrow batches so the key column KEEPS its Arrow type — the
        # empty-group branch must emit the same schema as populated
        # groups or Ray's block unification fails on numeric keys
        ktype = g.schema.field(key).type
        ts = g.column("_us").to_numpy(zero_copy_only=False)
        if len(ts) == 0:
            return pa.table({
                key: pa.array([], ktype),
                "bucket_ts": pa.array([], pa.timestamp("us")),
                value_col: pa.array([], pa.float64()),
            })
        ts = ts.astype(np.int64)
        v = g.column("_v").to_numpy(zero_copy_only=False).astype(np.float64)
        kraw = g.column(key).to_numpy(zero_copy_only=False)
        # dense key index so composites never overflow
        uk, kidx = np.unique(kraw, return_inverse=True)
        b = ts // E  # bucket index (floor division, epoch-aligned)
        # last-by-(ts, v) per (key, bucket): sort ascending, take run ends
        order = np.lexsort((v, ts, b, kidx))
        kidx, b, v = kidx[order], b[order], v[order]
        new = np.empty(len(b), dtype=bool)
        new[:-1] = (kidx[1:] != kidx[:-1]) | (b[1:] != b[:-1])
        new[-1] = True
        ends = np.flatnonzero(new)          # last row of each (key, bucket)
        ok, ob, ov = kidx[ends], b[ends], v[ends]
        # per-key span -> arithmetic grid expansion
        kstart = np.flatnonzero(
            np.r_[True, ok[1:] != ok[:-1]])  # obs sorted by (key, bucket)
        kend = np.r_[kstart[1:], len(ok)] - 1
        lo, hi = ob[kstart], ob[kend]
        n = (hi - lo + 1)
        total = int(n.sum())
        gkey = np.repeat(ok[kstart], n)
        offs = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(n)[:-1]], n)
        gbucket = np.repeat(lo, n) + offs
        # searchsorted fill over composite (key, bucket) — both sides
        # sorted; composite uses the partition-local bucket range
        span = int(ob.max() - ob.min()) + 1 if len(ob) else 1
        base = int(ob.min()) if len(ob) else 0
        ocomp = ok * span + (ob - base)
        gcomp = gkey * span + (gbucket - base)
        pos = np.searchsorted(ocomp, gcomp, side="right") - 1
        return pa.table({
            key: pa.array(uk[gkey], ktype),
            "bucket_ts": pa.array(gbucket * E).cast(pa.timestamp("us")),
            value_col: pa.array(ov[pos]),
        })

    return keyed_map_groups(
        ds, key, fill, num_partitions=num_partitions,
        batch_format="pyarrow", pre=project,
    )


def transition_counts(ds, key: str, order_by: list[str], state_col: str,
                      num_partitions: int = 32):
    """Per-key state-transition counts (the Markov-chain / clickstream
    building block): order each key's events by ``order_by`` (a total
    order — include a unique tiebreaker), pair every event with its
    predecessor's ``state_col``, and count (from_state, to_state) pairs
    across all keys.

    Reference analog: none in Gobblin (sequence analytics live downstream
    in Hive/Pinot) — beyond-reference addition in the windowed-analytics
    family alongside funnel_rollup / analytic_lag_cumsum.

    Scale shape: ONE bounded exchange on ``hash(key) % P``; inside each
    partition a vectorized lexsort + shift-compare yields the pairs and a
    pyarrow C++ group_by collapses them to partial counts, so only
    O(|states|^2) rows per partition leave for the final (tiny,
    LOW-cardinality) global sum — the combiner-before-groupby posture.
    Null key / order / state rows are dropped at the tag stage.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .partition import keyed_map_groups

    def pre(t: pa.Table) -> pa.Table:
        for c in (key, state_col, *order_by):
            t = t.filter(pc.is_valid(t.column(c)))
        t = t.select([key, *order_by, state_col])
        # states coerce to string (the output's from/to type) so numeric
        # state columns are total, matching CAST(... AS VARCHAR) in SQL
        idx = t.schema.get_field_index(state_col)
        return t.set_column(idx, state_col,
                            pc.cast(t.column(state_col), pa.string()))

    def pairs(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({
                "from_state": pa.array([], pa.string()),
                "to_state": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        cols = [g[c].to_numpy() for c in reversed(order_by)]
        kvals = g[key].to_numpy()
        order = np.lexsort((*cols, kvals))
        k = kvals[order]
        s = g[state_col].to_numpy()[order]
        same = k[1:] == k[:-1]
        t = pa.table({
            "from_state": pa.array(s[:-1][same], pa.string()),
            "to_state": pa.array(s[1:][same], pa.string()),
        })
        agg = pa.TableGroupBy(t, ["from_state", "to_state"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "from_state": agg.column("from_state"),
            "to_state": agg.column("to_state"),
            "n": agg.column("count_all").cast(pa.int64()),
        })

    partials = keyed_map_groups(
        ds, key, pairs, num_partitions=num_partitions,
        batch_format="pandas", pre=pre,
    )
    # final rollup key is |states|^2 — LOW cardinality, native groupby ok
    out = partials.groupby(["from_state", "to_state"]).aggregate(
        Sum(on="n", alias_name="n")
    )

    def to_i64(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("n"), "n",
                            t.column("n").cast(pa.int64()))

    return out.map_batches(to_i64, batch_format="pyarrow", batch_size=None)
