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


def grouping_sets_aggregate(
    ds, keys: list[str], sum_cols: list[str], sets: list[list[str]]
):
    """GROUPING SETS over subsets of ``keys``: one output row per group per
    grouping set, carrying ``n`` (row count) and ``sum_<col>`` per
    ``sum_cols``. Keys absent from a grouping set are NULL in its rows.
    ``sets`` must not repeat the full key list (the finest level is always
    emitted first) and every set must be a subset of ``keys``."""
    from ray.data.aggregate import Count, Sum

    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} is not a subset of {keys}")

    key_types = {f.name: f.type for f in ds.schema().base_schema}
    out_cols = keys + ["n"] + [f"sum_{c}" for c in sum_cols]

    finest = ds.groupby(keys).aggregate(
        Count(alias_name="n"),
        *[Sum(c, alias_name=f"sum_{c}") for c in sum_cols],
    )
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
