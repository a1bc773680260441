"""Multi-level (ROLLUP) aggregation.

Analog: the reference's metric-context TREE — counters registered in a
child context aggregate up through every ancestor so the same measurement
is readable at task, job, and instance granularity
(gobblin-metrics-libs/gobblin-metrics-base/.../MetricContext.java; the
docs' context-hierarchy examples). ``rollup_aggregate`` is that shape for
data: one result row set per grouping prefix, plus the grand total,
mirroring SQL ``GROUP BY ROLLUP``.

Scale shape: exactly ONE wide shuffle — the groupby at the FINEST level.
Every coarser level re-aggregates the finest RESULT (O(distinct groups)
rows, usually thousands), which is valid because sum/count are algebraic.
A naive per-level groupby over the input would scan and shuffle the table
len(keys)+1 times. Rolled-up key columns are NULL, as in SQL.
"""

from __future__ import annotations

import pyarrow as pa


def rollup_aggregate(ds, keys: list[str], sum_cols: list[str]):
    """ROLLUP over ``keys``: one output row per group at every prefix level
    of ``keys`` (finest -> ... -> grand total), carrying ``n`` (row count)
    and ``sum_<col>`` for each of ``sum_cols``. Rolled-up keys are NULL."""
    from ray.data.aggregate import Count, Sum

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
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        if i > 0:
            cur = cur.groupby(keys[:i]).aggregate(*resums)
        else:

            def to_one(t: pa.Table) -> pa.Table:
                return t.append_column("_g", pa.array([0] * t.num_rows, pa.int32()))

            cur = (
                cur.map_batches(to_one, batch_format="pyarrow", batch_size=None)
                .groupby("_g")
                .aggregate(*resums)
                .drop_columns(["_g"])
            )
        levels.append(
            cur.map_batches(
                null_keys(keys[i:]), batch_format="pyarrow", batch_size=None
            ).select_columns(out_cols)
        )

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out
