"""One-pass dataset profiler: per-column row/null/distinct counts and
numeric ranges.

Reference analog: the data-profiling side of Gobblin's quality checking —
RowCountPolicies need row counts, schema validation needs per-column
nullability, and the planner wants cardinality estimates
(gobblin-core/.../policies/count/*, SURVEY §2.9) — delivered here as ONE
streaming aggregation pass instead of a query per column.

Scale shape: a single ``ds.aggregate`` with one mergeable AggregateFn per
column — each block contributes O(1) counters + an O(k) KMV bottom-k
(functions/sketch.py), merges are associative, and the driver sees one
small struct per column. No shuffle, no per-column scan. Distinct counts
are EXACT while a column stays under k distinct values (the KMV saturated
regime) and ~1/sqrt(k) relative error beyond.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import _bottom_k, hash_column_u64, kmv_estimate


def _col_state():
    return {
        "n": 0, "n_null": 0,
        "bk": np.empty(0, dtype=np.uint64),
        "min": None, "max": None,
    }


def _merge_minmax(state: dict, mn, mx) -> None:
    if mn is not None:
        state["min"] = mn if state["min"] is None else min(state["min"], mn)
    if mx is not None:
        state["max"] = mx if state["max"] is None else max(state["max"], mx)


def _col_aggregate(col: str, numeric: bool, k: int):
    from ray.data.aggregate import AggregateFn

    def acc(state: dict, block: pa.Table) -> dict:
        c = block.column(col)
        out = dict(state)
        out["n"] = state["n"] + len(c)
        out["n_null"] = state["n_null"] + c.null_count
        vals = c.drop_null()
        if len(vals):
            h = hash_column_u64(vals)
            out["bk"] = _bottom_k(np.concatenate([state["bk"], h]), k)
            if numeric:
                mm = pc.min_max(vals)
                _merge_minmax(out, mm["min"].as_py(), mm["max"].as_py())
        return out

    def merge(a: dict, b: dict) -> dict:
        out = {
            "n": a["n"] + b["n"], "n_null": a["n_null"] + b["n_null"],
            "bk": _bottom_k(np.concatenate([a["bk"], b["bk"]]), k),
            "min": a["min"], "max": a["max"],
        }
        _merge_minmax(out, b["min"], b["max"])
        return out

    return AggregateFn(
        init=lambda _k: _col_state(),
        accumulate_block=acc,
        merge=merge,
        finalize=lambda s: s,
        name=f"_p_{col}",
    )


def profile_columns(ds, columns: list[str], numeric: list[str],
                    k: int = 8192) -> pa.Table:
    """Profile ``columns`` of ``ds`` in ONE aggregation pass. Returns one
    row per column: (col, n, n_null, n_distinct, min_v, max_v) — min/max
    as float64 for columns listed in ``numeric``, null otherwise."""
    aggs = [_col_aggregate(c, c in numeric, k) for c in columns]
    res = ds.aggregate(*aggs)
    rows = []
    for c in columns:
        s = res[f"_p_{c}"]
        rows.append((
            c, s["n"], s["n_null"], int(round(kmv_estimate(s["bk"], k))),
            float(s["min"]) if s["min"] is not None and c in numeric else None,
            float(s["max"]) if s["max"] is not None and c in numeric else None,
        ))
    return pa.table({
        "col": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "n_null": pa.array([r[2] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
        "min_v": pa.array([r[4] for r in rows], pa.float64()),
        "max_v": pa.array([r[5] for r in rows], pa.float64()),
    })
