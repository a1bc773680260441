"""Multi-level (ROLLUP / CUBE / GROUPING SETS) aggregation.

Analog: the reference's metric-context TREE — counters registered in a
child context aggregate up through every ancestor so the same measurement
is readable at task, job, and instance granularity
(gobblin-metrics-libs/gobblin-metrics-base/.../MetricContext.java; the
docs' context-hierarchy examples). ``rollup_aggregate`` is that shape for
data: one result row set per grouping prefix, plus the grand total,
mirroring SQL ``GROUP BY ROLLUP``; ``cube_aggregate`` covers every key
subset (``GROUP BY CUBE``), and ``grouping_sets_aggregate`` is the general
form both reduce to.

Scale shape: exactly ONE wide shuffle — the groupby at the FINEST level.
Every coarser grouping set re-aggregates the finest RESULT (O(distinct
groups) rows, usually thousands), which is valid because sum/count are
algebraic. A naive per-level groupby over the input would scan and shuffle
the table once per grouping set. Rolled-up key columns are NULL, as in SQL.

CAVEAT (documented partitioning assumption): re-aggregating the finest
result is only exact when every coarser set is a SUBSET of the finest key
list and the aggregates are decomposable (count/sum are; count-distinct is
not). Grouping sets outside the finest key list are rejected.
"""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa
import pyarrow.compute as pc


def grouping_sets_aggregate(
    ds, keys: list[str], sum_cols: list[str], sets: list[list[str]]
):
    """GROUPING SETS over subsets of ``keys``: one output row per group per
    grouping set, carrying ``n`` (row count) and ``sum_<col>`` per
    ``sum_cols``. Keys absent from a grouping set are NULL in its rows.
    ``sets`` must not repeat the full key list (the finest level is always
    emitted first) and every set must be a subset of ``keys``."""
    from ray.data.aggregate import Count, Sum

    seen_sets = set()
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} is not a subset of {keys}")
        if set(s) == set(keys):
            raise ValueError(
                f"grouping set {s} repeats the full key list (the finest "
                "level is always emitted first); drop it"
            )
        fs = frozenset(s)
        if fs in seen_sets:
            raise ValueError(f"duplicate grouping set {s}")
        seen_sets.add(fs)

    key_types = {f.name: f.type for f in ds.schema().base_schema}
    out_cols = keys + ["n"] + [f"sum_{c}" for c in sum_cols]

    # The finest level is re-consumed once per coarser set; without a
    # materialize each branch would RE-RUN the wide shuffle over the full
    # input (Ray Datasets fork by re-execution). The finest result is
    # O(distinct key combos) rows — the "small results" exemption — so
    # pinning it converts N full scans into one scan + N tiny re-aggs.
    finest = ds.groupby(keys).aggregate(
        Count(alias_name="n"),
        *[Sum(c, alias_name=f"sum_{c}") for c in sum_cols],
    ).materialize()
    resums = [Sum("n", alias_name="n")] + [
        Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols
    ]

    def null_keys(nulls: list[str]):
        def f(t: pa.Table) -> pa.Table:
            for k in nulls:
                t = t.append_column(k, pa.nulls(t.num_rows, type=key_types[k]))
            return t

        f.__name__ = f"nulls_{len(nulls)}"
        return f

    levels = [finest.select_columns(out_cols)]
    for sub in sets:
        if sub:
            cur = finest.groupby(list(sub)).aggregate(*resums)
        else:

            def to_one(t: pa.Table) -> pa.Table:
                return t.append_column("_g", pa.array([0] * t.num_rows, pa.int32()))

            cur = (
                finest.map_batches(to_one, batch_format="pyarrow", batch_size=None)
                .groupby("_g")
                .aggregate(*resums)
                .drop_columns(["_g"])
            )
        missing = [k for k in keys if k not in sub]
        levels.append(
            cur.map_batches(
                null_keys(missing), batch_format="pyarrow", batch_size=None
            ).select_columns(out_cols)
        )

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup_aggregate(ds, keys: list[str], sum_cols: list[str]):
    """ROLLUP over ``keys``: one output row per group at every prefix level
    of ``keys`` (finest -> ... -> grand total), carrying ``n`` (row count)
    and ``sum_<col>`` for each of ``sum_cols``. Rolled-up keys are NULL."""
    prefixes = [keys[:i] for i in range(len(keys) - 1, -1, -1)]
    return grouping_sets_aggregate(ds, keys, sum_cols, prefixes)


def cube_aggregate(ds, keys: list[str], sum_cols: list[str]):
    """CUBE over ``keys``: one output row per group for EVERY subset of
    ``keys`` (2^k grouping sets) — the finest shuffle happens once; the
    other 2^k - 1 sets re-aggregate its small result."""
    subsets = [
        list(c)
        for r in range(len(keys) - 1, -1, -1)
        for c in combinations(keys, r)
    ]
    return grouping_sets_aggregate(ds, keys, sum_cols, subsets)


def pivot_aggregate(ds, index_col: str, pivot_col: str, value_col: str,
                    pivot_values: list):
    """PIVOT: one output row per ``index_col`` value with a ``sum_<v>``
    column per pivot value (SQL ``sum(CASE WHEN pivot = v THEN value ELSE
    0 END)``). ``pivot_values`` must be known up front, as in SQL PIVOT.

    Scale shape: the batch is widened FIRST (one vectorized if_else mask
    per pivot value -> the row already carries its per-column
    contribution), so ONE groupby over the index key aggregates all pivot
    columns together — no per-pivot-value scan or shuffle, and the
    exchange rows are exactly as wide as the result."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def widen(t: pa.Table) -> pa.Table:
        cols = {index_col: t.column(index_col)}
        pv = t.column(pivot_col)
        val = pc.cast(t.column(value_col), pa.float64())
        zero = pa.scalar(0.0, pa.float64())
        for v in pivot_values:
            mask = pc.fill_null(pc.equal(pv, pa.scalar(v)), False)
            cols[f"sum_{v}"] = pc.if_else(mask, pc.fill_null(val, zero), zero)
        return pa.table(cols)

    widen.__name__ = "pivot_widen"
    return (
        ds.map_batches(widen, batch_format="pyarrow", batch_size=None)
        .groupby(index_col)
        .aggregate(*[Sum(f"sum_{v}", alias_name=f"sum_{v}") for v in pivot_values])
    )


def pearson_corr(ds, x_col: str, y_col: str) -> float:
    """Pearson correlation of two columns as a single ALGEBRAIC aggregate
    pass: the five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) fold
    per block and merge associatively — O(1) state to the driver, no
    shuffle (the textbook decomposable-aggregate shape the metric system's
    meters use for rates). Rows where either side is null are skipped,
    matching SQL corr()."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn

    def acc(s, block):
        ok = pc.and_(pc.is_valid(block.column(x_col)),
                     pc.is_valid(block.column(y_col)))
        t = block.filter(ok)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return (
            s[0] + len(x), s[1] + x.sum(), s[2] + y.sum(),
            s[3] + (x * y).sum(), s[4] + (x * x).sum(), s[5] + (y * y).sum(),
        )

    agg = AggregateFn(
        init=lambda _k: (0, 0.0, 0.0, 0.0, 0.0, 0.0),
        accumulate_block=acc,
        merge=lambda a, b: tuple(u + v for u, v in zip(a, b)),
        finalize=lambda s: s,
        name="corr_stats",
    )
    n, sx, sy, sxy, sxx, syy = ds.aggregate(agg)["corr_stats"]
    if n == 0:
        return float("nan")
    cov = sxy - sx * sy / n
    vx, vy = sxx - sx * sx / n, syy - sy * sy / n
    return float(cov / np.sqrt(vx * vy)) if vx > 0 and vy > 0 else float("nan")


def ols_by_group(ds, key: str, x_col: str, y_col: str):
    """Grouped simple linear regression (SQL ``regr_slope`` /
    ``regr_intercept`` shape): per group the OLS fit of y on x via the
    five sufficient statistics (n, Σx, Σy, Σxy, Σx²) — the same
    decomposable-aggregate posture as pearson_corr, but grouped: each
    block contributes one partial row per group (per-batch pyarrow
    group_by combiner), the exchange carries O(groups x blocks) rows,
    and the finish applies the closed form
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)``,
    ``intercept = (Σy − slope·Σx)/n``.
    SQL parity: the oracle spells the SAME sums and closed form (not
    DuckDB's regr_* internals, which use a different covar/var
    arithmetic); rows with a null on either side are skipped. For stable
    floats pick an x with small magnitude (center timestamps first —
    n·Σx² − Σx² cancels catastrophically on raw epoch seconds)."""
    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        import numpy as np

        ok = pc.and_(pc.is_valid(t.column(x_col)),
                     pc.is_valid(t.column(y_col)))
        t = t.filter(ok)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        tmp = pa.table({
            key: t.column(key),
            "_n": pa.array(np.ones(len(x), np.int64)),
            "_sx": pa.array(x), "_sy": pa.array(y),
            "_sxy": pa.array(x * y), "_sxx": pa.array(x * x),
        })
        agg = pa.TableGroupBy(tmp, key).aggregate(
            [("_n", "sum"), ("_sx", "sum"), ("_sy", "sum"),
             ("_sxy", "sum"), ("_sxx", "sum")]
        )
        return pa.table({
            key: agg.column(key),
            "_n": agg.column("_n_sum"), "_sx": agg.column("_sx_sum"),
            "_sy": agg.column("_sy_sum"), "_sxy": agg.column("_sxy_sum"),
            "_sxx": agg.column("_sxx_sum"),
        })

    partials.__name__ = "ols_partials"
    folded = ds.map_batches(
        partials, batch_format="pyarrow"
    ).groupby(key).sum(["_n", "_sx", "_sy", "_sxy", "_sxx"])

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t.column("sum(_n)").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sx = t.column("sum(_sx)").to_numpy(zero_copy_only=False)
        sy = t.column("sum(_sy)").to_numpy(zero_copy_only=False)
        sxy = t.column("sum(_sxy)").to_numpy(zero_copy_only=False)
        sxx = t.column("sum(_sxx)").to_numpy(zero_copy_only=False)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table({
            key: t.column(key),
            "slope": pa.array(slope, pa.float64()),
            "intercept": pa.array(intercept, pa.float64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    finish.__name__ = "ols_finish"
    return folded.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def mode_by_group(ds, key: str, val: str, num_partitions: int = 16):
    """Deterministic grouped MODE: per group the most frequent value,
    ties broken by the SMALLEST value (SQL's ``mode()`` is
    tie-nondeterministic — this spec is reproducible across
    partitionings and expressible as exact SQL). Emits
    ``(key, mode_<val>, n)`` with n = the winning frequency.

    Scale shape: per-batch pyarrow group_by collapses each block to
    O(distinct (key, val) pairs) partial counts, ONE bounded exchange on
    hash(key) co-locates each group, and the per-partition resolve is a
    vectorized lexsort + run-boundary argmax (count desc, value asc) —
    never a per-group Python loop."""
    import pyarrow.compute as pc

    from .partition import keyed_map_groups

    def partials(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.filter(pc.and_(pc.is_valid(t.column(key)),
                             pc.is_valid(t.column(val))))
        tmp = pa.table({
            key: t.column(key), val: t.column(val),
            "_c": pa.array(np.ones(t.num_rows, np.int64)),
        })
        agg = pa.TableGroupBy(tmp, [key, val]).aggregate([("_c", "sum")])
        return pa.table({
            key: agg.column(key), val: agg.column(val),
            "_c": agg.column("_c_sum"),
        })

    partials.__name__ = "mode_partials"

    def resolve(t: pa.Table) -> pa.Table:
        import numpy as np

        agg = pa.TableGroupBy(t, [key, val]).aggregate([("_c", "sum")])
        k = agg.column(key).to_numpy(zero_copy_only=False)
        v = agg.column(val).to_numpy(zero_copy_only=False)
        c = agg.column("_c_sum").to_numpy(zero_copy_only=False)
        # per group: max count, then min value — lexsort so each group's
        # winner is its FIRST run element
        order = np.lexsort((v, -c, k))
        k, v, c = k[order], v[order], c[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        sel = np.flatnonzero(first)
        return pa.table({
            key: pa.array(k[sel]),
            f"mode_{val}": pa.array(v[sel]),
            "n": pa.array(c[sel].astype(np.int64), pa.int64()),
        })

    resolve.__name__ = "mode_resolve"
    pre = ds.map_batches(partials, batch_format="pyarrow")
    return keyed_map_groups(pre, key, resolve,
                            num_partitions=num_partitions,
                            batch_format="pyarrow")


def string_agg_by(ds, key: str, val: str, sep: str = ",",
                  num_partitions: int = 64, out: str = "agg"):
    """Per-key sorted string aggregation (SQL ``string_agg(val, sep ORDER
    BY val)``): same bounded-exchange + vectorized run-length ListArray /
    binary_join assembly as the inverted index — one exchange on
    ``hash(key) % P``, no per-key Python. The skew note there applies:
    a hot key's concatenation is O(its rows); cap upstream if keys can be
    stopword-grade."""
    import pyarrow.compute as pc

    from ..kernels import runlength_join
    from .partition import keyed_map_groups

    def drop_null_vals(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(val)))

    def assemble(g: pa.Table) -> pa.Table:
        k = g.column(key).to_numpy(zero_copy_only=False)
        # RAW values into the sort — runlength_join casts to string AFTER
        # ordering, so numeric columns aggregate in numeric order (a
        # pre-cast here once made [9, 10] join as "10,9")
        v = g.column(val).to_numpy(zero_copy_only=False)
        firsts, _counts, joined = runlength_join(k, v, sep)
        return pa.table({key: pa.array(firsts), out: joined})

    assemble.__name__ = "string_agg_assemble"
    return keyed_map_groups(
        ds, key, assemble, num_partitions=num_partitions,
        batch_format="pyarrow", pre=drop_null_vals,
    )


def standardize(ds, value_col: str, out: str = "z"):
    """Z-score standardization (ML feature normalization): two passes —
    ONE algebraic aggregate (n, Σx, Σx²; same decomposable shape as
    ``pearson_corr``) gives the population mean/stddev, broadcast as two
    scalars; then a pure per-batch map emits ``(x - mean) / std``. No
    shuffle in either pass. Null values pass through as null; population
    (ddof=0) semantics match SQL's ``avg``/``stddev_pop``."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn

    def acc(s, block):
        x = block.column(value_col).drop_null().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        return (s[0] + len(x), s[1] + x.sum(), s[2] + (x * x).sum())

    agg = AggregateFn(
        init=lambda _k: (0, 0.0, 0.0),
        accumulate_block=acc,
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
        finalize=lambda s: s,
        name="std_stats",
    )
    n, sx, sxx = ds.aggregate(agg)["std_stats"]
    mean = sx / n if n else 0.0
    var = max(sxx / n - mean * mean, 0.0) if n else 0.0
    std = float(np.sqrt(var)) or 1.0  # constant column -> z = 0

    def zmap(t: pa.Table) -> pa.Table:
        z = pc.divide(
            pc.subtract(pc.cast(t.column(value_col), pa.float64()),
                        pa.scalar(mean)),
            pa.scalar(std),
        )
        return t.append_column(out, z)

    zmap.__name__ = "standardize"
    return ds.map_batches(zmap, batch_format="pyarrow", batch_size=None)


def histogram_equi_width(ds, value_col: str, width: float,
                         bucket_col: str = "bucket",
                         sum_col: str = "sum_value"):
    """Equi-width histogram: bucket = floor(value / width), with row count
    and value sum per bucket (the distribution-profiling primitive behind
    data-quality dashboards; reference analog: the metrics histogram
    reporters, gobblin-metrics-libs). Per-batch vectorized floor + ONE
    groupby over at most range/width buckets — the exchange carries
    per-block PARTIALS (Ray's aggregate pushdown), never rows, so at
    10^10 rows the shuffle is O(buckets x blocks)."""
    from ray.data.aggregate import Count, Sum

    w = float(width)

    def tag(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64())
        b = pc.cast(pc.floor(pc.divide(v, pa.scalar(w))), pa.int64())
        return t.append_column(bucket_col, b)

    tag.__name__ = f"bucket[{value_col}/{width}]"
    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby(bucket_col).aggregate(
        Count(alias_name="n"), Sum(value_col, alias_name=sum_col)
    )


def ivm_count_sum_view(base_state, changes, group_fn,
                       seq_col: str = "event_seq",
                       old_seq_col: str = "old_event_seq",
                       group_col: str = "grp",
                       n_col: str = "n_live",
                       sum_col: str = "sum_seq",
                       base_is_state: bool = False,
                       old_group_fn=None):
    """Incremental materialized-view maintenance (IVM) over a CDC change
    feed: maintain a per-group ``(count of live rows, sum of seq_col)``
    view WITHOUT rescanning the table — the downstream-consumer shape
    Gobblin's snapshot-diff listing feeds (FileBasedSource prior-vs-current
    diff, gobblin-core/.../filebased/FileBasedSource.java), generalized to
    row granularity by ``CdcEngine.read_changes(include_before=True)``.

    Delta algebra (classic counting IVM, e.g. Gupta-Mumick'95 survey):
      insert  -> (+1, +new_seq)
      delete  -> (-1, -old_seq)   (the feed's delete rows carry old values)
      update  -> ( 0, new_seq - old_seq)  (needs the before-image column)
    Groups whose maintained count reaches 0 drop out of the view, exactly
    as a recompute would.

    Mutable group columns: with ``group_fn`` alone the group key must be
    derived from IMMUTABLE columns (e.g. host from url — the feed keys
    changes by url), because an update that MOVES a row between groups
    cannot be retracted from its old group without the before-image.
    Pass ``old_group_fn`` (reading the feed's ``old_<col>`` before-image
    columns, ``CdcEngine.read_changes(before_columns=...)``) to handle a
    mutable group column: every update/delete RETRACTS ``(-1, -old_seq)``
    at the OLD group and every insert/update APPLIES ``(+1, +new_seq)``
    at the NEW group — when the group did not move, the two contributions
    net inside the same group, so this generalizes (not replaces) the
    immutable-key algebra.

    Scale shape: both the base view and the deltas pre-aggregate INSIDE
    ``map_batches`` (per-batch combiner over O(groups-in-batch) rows), so
    the single groupby exchange moves O(distinct groups x blocks) partial
    rows — never the state or the feed itself. ``group_fn`` maps a pyarrow
    Table to the group-key Array (derive the key from immutable columns
    only — e.g. host from url — since the feed keys changes by url)."""

    def _combine(tmp: pa.Table) -> pa.Table:
        # per-batch combiner: collapse to one row per group; select
        # output columns BY NAME (keys-first aggregate ordering is
        # build-specific in pyarrow, not contractual)
        agg = pa.TableGroupBy(tmp, group_col).aggregate(
            [("_dn", "sum"), ("_ds", "sum")]
        )
        return pa.table({
            group_col: agg.column(group_col),
            "_dn": agg.column("_dn_sum"),
            "_ds": agg.column("_ds_sum"),
        })

    def _deltas_moving(t: pa.Table) -> pa.Table:
        """Delta partials for a MUTABLE group column (retract at the old
        group, apply at the new — see the docstring's algebra)."""
        import numpy as np

        ct = t.column("change_type").to_numpy(zero_copy_only=False)
        seq = pc.fill_null(t.column(seq_col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        old = pc.fill_null(t.column(old_seq_col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parts = []
        # apply side: insert/update rows contribute (+1, +new_seq) at the
        # NEW group (null group keys excluded, same as the base scan)
        g_new = group_fn(t)
        apply_m = pa.array((ct != "delete") & pc.is_valid(g_new).to_numpy(
            zero_copy_only=False))
        ta = t.filter(apply_m)
        if ta.num_rows:
            parts.append(pa.table({
                group_col: group_fn(ta),
                "_dn": pa.array(np.ones(ta.num_rows, np.int64)),
                "_ds": pa.array(seq[apply_m.to_numpy(
                    zero_copy_only=False)].astype(np.int64)),
            }))
        # retract side: update/delete rows contribute (-1, -old_seq) at
        # the OLD group (the before-image columns)
        g_old = old_group_fn(t)
        retract_m = pa.array((ct != "insert") & pc.is_valid(
            g_old).to_numpy(zero_copy_only=False))
        tr = t.filter(retract_m)
        if tr.num_rows:
            parts.append(pa.table({
                group_col: old_group_fn(tr),
                "_dn": pa.array(np.full(tr.num_rows, -1, np.int64)),
                "_ds": pa.array(-old[retract_m.to_numpy(
                    zero_copy_only=False)].astype(np.int64)),
            }))
        if not parts:
            return pa.table({group_col: pa.array([], g_new.type),
                             "_dn": pa.array([], pa.int64()),
                             "_ds": pa.array([], pa.int64())})
        return _combine(pa.concat_tables(parts))

    _deltas_moving.__name__ = "ivm_deltas_moving"

    def _partials(sign_from_type: bool):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            g = group_fn(t)
            # null group keys are EXCLUDED from the view (the group_fn is a
            # derivation — e.g. host from url — and a non-deriving row has
            # no group; the paired recompute oracle must skip them too)
            valid = pc.is_valid(g)
            if not pc.all(valid).as_py():
                t = t.filter(valid)
                g = g.filter(valid)
            # int64 end to end: float64 partials would silently lose
            # exactness past 2^53, reachable at 10^10-row x large-seq scale
            seq = t.column(seq_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if sign_from_type:
                ct = t.column("change_type").to_numpy(zero_copy_only=False)
                old = pc.fill_null(t.column(old_seq_col), 0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                dn = np.where(ct == "insert", 1, np.where(ct == "delete", -1, 0))
                dsum = np.where(
                    ct == "insert", seq,
                    np.where(ct == "delete", -seq, seq - old),
                )
            else:
                dn = np.ones(len(seq), np.int64)
                dsum = seq
            tmp = pa.table({group_col: g,
                            "_dn": pa.array(dn.astype(np.int64)),
                            "_ds": pa.array(dsum.astype(np.int64))})
            return _combine(tmp)

        f.__name__ = "ivm_deltas" if sign_from_type else "ivm_base"
        return f

    if base_is_state:
        # base rows are ALREADY the view's (group, n, sum) state (a
        # persisted snapshot being folded forward, views.py): each state
        # row IS a partial — map it straight to the combiner schema
        def _state_p(t: pa.Table) -> pa.Table:
            return pa.table({
                group_col: t.column(group_col),
                "_dn": t.column(n_col).cast(pa.int64()),
                "_ds": t.column(sum_col).cast(pa.int64()),
            })

        _state_p.__name__ = "ivm_state"
        base_p = base_state.map_batches(
            _state_p, batch_format="pyarrow", batch_size=None
        )
    else:
        base_p = base_state.map_batches(
            _partials(False), batch_format="pyarrow"
        )
    delta_p = changes.map_batches(
        _deltas_moving if old_group_fn is not None else _partials(True),
        batch_format="pyarrow"
    )
    folded = base_p.union(delta_p).groupby(group_col).sum(["_dn", "_ds"])

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = t.filter(_pc.greater(t.column("sum(_dn)"), 0))
        return pa.table({
            group_col: t.column(group_col),
            n_col: t.column("sum(_dn)").cast(pa.int64()),
            sum_col: t.column("sum(_ds)").cast(pa.int64()),
        })

    finish.__name__ = "ivm_finish"
    return folded.map_batches(finish, batch_format="pyarrow", batch_size=None)
