"""Distributed EXACT quantiles by iterative histogram refinement.

Public-knowledge basis: the classic distributed order-statistic search
(iterative bucketing / parallel binary search on the value domain — e.g.
the MassQ/histogram-refinement family; same shape as external-memory
selection). Reference analog: the metrics histograms the reference exposes
per job (gobblin-metrics-libs Codahale histograms report p50/p95/p99 of
timers); here it is a first-class dataset operator instead of a
process-local reservoir.

Why not a one-pass sketch: t-digest/KLL trade exactness for one pass. The
driver's correctness gate hash-compares against DuckDB ``quantile_cont``,
so this operator computes EXACT order statistics: each refinement round is
one streaming scan that histograms the remaining candidate interval into B
bins (a length-B int64 vector — mergeable, O(B) bytes per block to the
tree), narrowing every target rank to one bin; when the total candidate
mass is small (or an interval degenerates to a repeated single value) the
survivors are collected and finished with np.partition. For doubles, B=1024
narrows 64 bits of range in ~6 rounds worst case; real data converges in
2-3 scans.

Scale: every pass is map_batches + an O(B) aggregation tree — no shuffle
of row data, driver holds O(B + collected_tail) values. The final collect
is bounded by ``collect_threshold`` rows by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hist_pass(ds, column: str, intervals: list[tuple[float, float]], B: int):
    """One scan: per interval [lo, hi], a B-bin histogram of values in
    [lo, hi] (right-closed on the last bin). Returns list of count arrays."""
    from ray.data.aggregate import AggregateFn

    los = np.array([iv[0] for iv in intervals])
    his = np.array([iv[1] for iv in intervals])
    m = len(intervals)
    zero = np.zeros(m * B, dtype=np.int64)

    def acc_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        v = block.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        out = acc.copy()
        for i in range(m):
            lo, hi = los[i], his[i]
            sel = v[(v >= lo) & (v <= hi)]
            if not len(sel):
                continue
            width = (hi - lo) or 1.0
            # bin membership by searchsorted against the SAME float edge
            # values the refinement later uses as interval bounds
            # (lo + k*width/B) — a floor((v-lo)/width*B) here could
            # disagree with the next round's v >= edge comparison at a
            # bin boundary, desyncing `below` from the collected rows
            edges = lo + np.arange(1, B) * width / B
            idx = np.searchsorted(edges, sel, side="right")
            out[i * B : (i + 1) * B] += np.bincount(idx, minlength=B)
        return out

    agg = AggregateFn(
        init=lambda _k: zero,
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        name="qhist",
    )
    flat = ds.aggregate(agg)["qhist"]
    return [flat[i * B : (i + 1) * B] for i in range(m)]


def exact_quantiles(
    ds,
    column: str,
    qs: list[float],
    B: int = 1024,
    collect_threshold: int = 200_000,
    max_rounds: int = 12,
    interpolation: str = "linear",
):
    """quantile_cont semantics: linear interpolation between the order
    statistics floor(h) and ceil(h), h = (n-1)*q (NaNs/NULLs excluded).
    Returns a list of floats aligned with ``qs``.

    ``interpolation="lower"`` gives SQL ``quantile_disc`` semantics
    instead: the ACTUAL element at 1-based rank ceil(q*n) — a value that
    exists in the data (what a percentile-based retention cutoff or
    p99-latency SLO wants), same histogram-refinement scan either way."""
    from ray.data.aggregate import Count, Max, Min

    stats_ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column(column)),
                    pc.invert(pc.is_nan(t.column(column))))
        ),
        batch_format="pyarrow", batch_size=None,
    )
    st = stats_ds.aggregate(
        Count(alias_name="n"), Min(column, alias_name="lo"),
        Max(column, alias_name="hi"),
    )
    n, glo, ghi = int(st["n"]), float(st["lo"]), float(st["hi"])
    if n == 0:
        return [float("nan")] * len(qs)

    # ranks (0-based order statistics) every quantile needs
    need: set[int] = set()
    for q in qs:
        if interpolation == "lower":
            need.add(min(max(int(np.ceil(q * n)) - 1, 0), n - 1))
        else:
            h = (n - 1) * q
            need.add(int(np.floor(h)))
            need.add(int(np.ceil(h)))
    ranks = sorted(need)

    # state per rank: (interval lo, hi, #values below lo, #values in interval)
    state = {r: (glo, ghi, 0, n) for r in ranks}
    resolved: dict[int, float] = {}

    for _ in range(max_rounds):
        live = {r: s for r, s in state.items() if r not in resolved}
        if not live:
            break
        if sum(s[3] for s in live.values()) <= collect_threshold:
            break
        # distinct intervals this round (ranks often share one)
        ivs = sorted({(s[0], s[1]) for s in live.values()})
        hists = dict(zip(ivs, _hist_pass(stats_ds, column, list(ivs), B)))
        for r, (lo, hi, below, cnt) in live.items():
            h = hists[(lo, hi)]
            cum = np.cumsum(h)
            k = int(np.searchsorted(cum, r - below + 1))  # bin holding rank r
            new_below = below + (int(cum[k - 1]) if k else 0)
            width = (hi - lo) or 1.0
            nlo = lo + k * width / B
            nhi = lo + (k + 1) * width / B if k < B - 1 else hi
            ncnt = int(h[k])
            if nlo >= nhi or ncnt == cnt and (nlo, nhi) == (lo, hi):
                # degenerate: the bin cannot shrink -> repeated value
                resolved[r] = nlo
            state[r] = (nlo, nhi, new_below, ncnt)

    # exact finish: collect survivors of each live interval
    for r in ranks:
        if r in resolved:
            continue
        lo, hi, below, cnt = state[r]
        vals = (
            stats_ds.map_batches(
                lambda t, lo=lo, hi=hi: t.select([column]).filter(
                    pc.and_(pc.greater_equal(t.column(column), pa.scalar(lo)),
                            pc.less_equal(t.column(column), pa.scalar(hi)))
                ),
                batch_format="pyarrow", batch_size=None,
            )
            .to_pandas()[column].to_numpy()
        )
        j = r - below
        resolved[r] = float(np.partition(vals, j)[j])

    out = []
    for q in qs:
        if interpolation == "lower":
            out.append(resolved[min(max(int(np.ceil(q * n)) - 1, 0),
                                    n - 1)])
            continue
        h = (n - 1) * q
        a, b = resolved[int(np.floor(h))], resolved[int(np.ceil(h))]
        frac = h - np.floor(h)
        out.append(a + (b - a) * frac)
    return out


def exact_quantiles_by(ds, group_col: str, value_col: str, qs: list[float],
                       num_partitions: int = 64):
    """PER-GROUP exact quantiles (long format: one row per (group, q) with
    the ``quantile_cont``-interpolated value).

    Scale shape: groups are small relative to workers in the common case
    (per-segment / per-host percentiles), so this uses ONE bounded
    exchange on ``hash(group) % num_partitions`` and a vectorized
    ``pandas.groupby().quantile()`` per partition (linear interpolation ==
    SQL ``quantile_cont``) — every group in a partition resolves in one C
    pass. Partitioning assumption: one partition's rows fit in a worker;
    a group too big for that should run the global histogram-refinement
    kernel (``exact_quantiles``, O(B)-byte scans) on its own filter
    instead."""
    import pandas as pd

    from ..stages.partition import keyed_map_groups

    def qpart(g: "pd.DataFrame") -> "pd.DataFrame":
        r = (
            g.groupby(group_col, sort=False)[value_col]
            .quantile(qs, interpolation="linear")
            .reset_index()
        )
        r.columns = [group_col, "q", "qv"]
        return r

    qpart.__name__ = "group_quantiles"
    return keyed_map_groups(ds, group_col, qpart,
                            num_partitions=num_partitions)


def mad_outliers(ds, group_col: str, value_col: str, k: float = 3.0,
                 num_partitions: int = 64):
    """Robust per-group outlier detection via Median Absolute Deviation
    (Hampel's rule: flag rows with |v - median| > k * MAD) — the
    data-quality screen that, unlike z-scores, is not itself dragged by
    the outliers it hunts. Gobblin analog: the row-level quality-policy
    family (SURVEY §2.9), extended with a data-driven threshold.

    ONE bounded exchange on ``hash(group) % num_partitions``; per
    partition both medians come from the same cythonized
    ``groupby().quantile`` lerp that is bit-identical to SQL
    ``quantile_cont`` (proven by the grouped-quantile oracle), so the
    deviations, the k*MAD threshold and the resulting flags are exactly
    reproducible — no float tolerance. Emits the input columns plus
    ``med`` / ``mad`` / ``is_outlier``. Null group keys are dropped;
    null values pass through with a null flag (SQL comparison-with-NULL
    semantics)."""
    import numpy as np
    import pandas as pd

    from ..stages.partition import keyed_map_groups

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        med = g.groupby(group_col, sort=False)[value_col].quantile(
            0.5, interpolation="linear")
        m = g[group_col].map(med).to_numpy(np.float64)
        dev = np.abs(g[value_col].to_numpy(np.float64) - m)
        mad = (g.assign(_dev=dev)
                .groupby(group_col, sort=False)["_dev"]
                .quantile(0.5, interpolation="linear"))
        md = g[group_col].map(mad).to_numpy(np.float64)
        out = g.copy()
        out["med"] = m
        out["mad"] = md
        flag = dev > k * md
        out["is_outlier"] = pd.array(
            np.where(np.isnan(dev), None, flag), dtype="boolean"
        )
        return out

    flag.__name__ = "mad_outliers"
    return keyed_map_groups(ds, group_col, flag,
                            num_partitions=num_partitions)
