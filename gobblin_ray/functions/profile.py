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


def _row_hash_u64(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Order-sensitive 64-bit content hash of the given columns per row:
    per-column hashes chained with a splitmix64 remix (null -> fixed
    sentinel distinct from any value hash). Collision probability for a
    missed mismatch is ~n_mismatch / 2^64 — negligible and only ever
    UNDER-reports differences; documented contract of diff_by_key."""
    from .sketch import _splitmix64

    acc = np.full(len(t), np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    for c in cols:
        col = t.column(c)
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        if col.null_count:
            # the fill value is irrelevant (the sentinel overwrites null
            # slots below) but it must be TYPE-VALID: fill_null(0) raises
            # on string/binary columns, so fill those with ""
            fill = "" if (pa.types.is_string(col.type)
                          or pa.types.is_large_string(col.type)
                          or pa.types.is_binary(col.type)) else 0
            col = col.fill_null(fill)
        h = hash_column_u64(col)
        h = np.where(nulls, np.uint64(0xDEADBEEFCAFEF00D), h)
        with np.errstate(over="ignore"):
            acc = _splitmix64(acc * np.uint64(1099511628211) + h)
    return acc


def diff_by_key(left, right, key: str, compare_cols: list[str],
                num_partitions: int = 64):
    """Row-level diff of two datasets sharing a primary key — the
    data-validation job shape (reference analog: Gobblin's distcp/copy
    verification and ValidationJob comparing source vs destination row
    sets). Returns (key, status) rows for every key where the sides
    DISAGREE: ``left_only``, ``right_only``, or ``mismatch`` (same key,
    different content); equal rows are omitted. ``key`` is assumed unique
    per side (a primary-key diff).

    Scale shape: each side collapses per batch to (key, side, 64-bit
    content hash) — 17 bytes/row through the ONE bounded exchange instead
    of the full row width — then per partition one vectorized pandas
    align + compare. Mismatch detection is by content hash (see
    ``_row_hash_u64``); a hash collision under-reports with probability
    ~2^-64 per differing row."""
    import pandas as pd

    from ..stages.partition import keyed_map_groups

    def tag(side: int):
        def run(t: pa.Table) -> pa.Table:
            return pa.table({
                key: t.column(key),
                "_side": pa.array(
                    np.full(len(t), side, dtype=np.int8)
                ),
                "_h": pa.array(
                    _row_hash_u64(t, compare_cols).view(np.int64)
                ),
            })

        run.__name__ = f"diff_tag[{side}]"
        return run

    l = left.map_batches(tag(0), batch_format="pyarrow", batch_size=None)
    r = right.map_batches(tag(1), batch_format="pyarrow", batch_size=None)
    both = l.union(r)

    def compare(g: pd.DataFrame) -> pd.DataFrame:
        lh = g[g["_side"] == 0].set_index(key)["_h"].astype("Int64")
        rh = g[g["_side"] == 1].set_index(key)["_h"].astype("Int64")
        j = pd.concat({"l": lh, "r": rh}, axis=1)
        ne = (j["l"] != j["r"]).fillna(False).to_numpy(dtype=bool)
        status = np.where(
            j["r"].isna(), "left_only",
            np.where(j["l"].isna(), "right_only",
                     np.where(ne, "mismatch", "equal")),
        )
        out = pd.DataFrame({key: j.index.to_numpy(), "status": status})
        return out[out["status"] != "equal"]

    compare.__name__ = "diff_compare"
    return keyed_map_groups(both, key, compare,
                            num_partitions=num_partitions)


def fk_audit(child, child_fk: str, parent, parent_key: str, edge: str):
    """Referential-integrity audit: count child rows whose foreign key has
    no matching parent key (the dbt ``relationships`` test / Gobblin
    ValidationJob posture, SURVEY §2.9's quality family applied ACROSS
    tables).

    Scale shape: per-batch combiners collapse BOTH sides to
    ``(key, partial child-row count, parent marker)`` before the single
    bounded exchange — the exchange carries O(distinct keys) rows, never
    child rows; one ``groupby(key).aggregate(sum, max)`` resolves each
    key's orphan-ness; the rollup over the grouped output is a tiny
    mergeable aggregate (3 counters per block). NULL child FKs are
    excluded, matching SQL semantics where a NULL FK never fails a
    referential constraint (and the matching ``IS NOT NULL`` oracle).

    Returns a one-row pyarrow Table:
    ``edge | n_child | n_orphan_rows | n_orphan_keys``.
    """
    from ray.data.aggregate import Sum

    def child_comb(t: pa.Table) -> pa.Table:
        k = t.column(child_fk)
        k = k.filter(pc.is_valid(k)) if k.null_count else k
        g = pa.table({"k": k}).group_by("k").aggregate([("k", "count")])
        n = g.column("k_count").cast(pa.int64())
        return pa.table({
            "k": g.column("k"), "n": n,
            "mark": pa.array(np.zeros(g.num_rows, np.int64)),
        })

    def parent_comb(t: pa.Table) -> pa.Table:
        k = t.column(parent_key)
        k = k.filter(pc.is_valid(k)) if k.null_count else k
        ku = pc.unique(k)
        z = pa.array(np.zeros(len(ku), np.int64))
        return pa.table({
            "k": ku, "n": z,
            "mark": pa.array(np.ones(len(ku), np.int64)),
        })

    child_comb.__name__ = f"fk_child[{child_fk}]"
    parent_comb.__name__ = f"fk_parent[{parent_key}]"
    u = child.map_batches(
        child_comb, batch_format="pyarrow", batch_size=None
    ).union(parent.map_batches(
        parent_comb, batch_format="pyarrow", batch_size=None
    ))

    # per-key resolution happens INSIDE a bounded partition with a C++
    # hash groupby — a Ray groupby on the raw key would sort-exchange
    # O(distinct keys) groups (measured ~4 s per 600k-key exchange);
    # keyed_map_groups keeps the exchange at num_partitions groups and
    # each partition rolls straight up to three counters.
    from ..stages.partition import keyed_map_groups

    def part_roll(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("n", "sum"), ("mark", "max")])
        n = g.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64)
        orphan = np.logical_and(
            g.column("mark_max").to_numpy(zero_copy_only=False) == 0,
            n > 0,
        )
        return pa.table({
            "n_child": pa.array([int(n.sum())], pa.int64()),
            "n_orphan_rows": pa.array([int(n[orphan].sum())], pa.int64()),
            "n_orphan_keys": pa.array([int(orphan.sum())], pa.int64()),
        })

    part_roll.__name__ = "fk_rollup"
    rolled = keyed_map_groups(u, "k", part_roll, num_partitions=64,
                              batch_format="pyarrow")
    agg = rolled.aggregate(
        Sum("n_child", alias_name="n_child"),
        Sum("n_orphan_rows", alias_name="n_orphan_rows"),
        Sum("n_orphan_keys", alias_name="n_orphan_keys"),
    )
    return pa.table({
        "edge": pa.array([edge], pa.string()),
        "n_child": pa.array([int(agg["n_child"] or 0)], pa.int64()),
        "n_orphan_rows": pa.array(
            [int(agg["n_orphan_rows"] or 0)], pa.int64()),
        "n_orphan_keys": pa.array(
            [int(agg["n_orphan_keys"] or 0)], pa.int64()),
    })


def divergence_topk(left, right, text_col: str = "text", k: int = 20,
                    digits: int = 6):
    """Corpus drift report: the top-``k`` tokens by smoothed per-term
    KL-divergence contribution ``p * ln(p / q)`` of the LEFT corpus's
    unigram distribution against the RIGHT's (add-half Jelinek-Mercer-ish
    Laplace smoothing so unseen terms stay finite) — the data-drift
    monitor an LLM ingest pipeline runs between yesterday's crawl and
    today's before letting a mixture shift reach training.

    Scale shape: per-batch combiners collapse each side to (term,
    partial_count) — the one exchange carries O(vocab) rows, never
    tokens; the merged (term, cl, cr) table is vocab-sized (word-level
    vocab; same driver-fits assumption as tfidf_top_terms, documented
    there); scoring is one vectorized pass; top-k is per-block partial.
    Every float op mirrors the oracle SQL's association; contributions
    round half-away to ``digits``.
    """
    from ray.data.aggregate import Sum

    from ..stages.sorts import top_k

    def _counts(side: int):
        def run(t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(
                t.column(text_col).fill_null(""), pattern=" ")
            flat = pc.list_flatten(toks).combine_chunks()
            g = pa.table({"term": flat}).group_by("term").aggregate(
                [("term", "count")])
            n = g.column("term_count").cast(pa.int64())
            z = pa.array(np.zeros(g.num_rows, np.int64))
            return pa.table({
                "term": g.column("term"),
                "cl": n if side == 0 else z,
                "cr": z if side == 0 else n,
            })

        run.__name__ = f"unigram_counts[{side}]"
        return run

    merged = (
        left.map_batches(_counts(0), batch_format="pyarrow",
                         batch_size=None)
        .union(right.map_batches(_counts(1), batch_format="pyarrow",
                                 batch_size=None))
        .groupby("term").aggregate(Sum("cl", alias_name="cl"),
                                   Sum("cr", alias_name="cr"))
    ).materialize()  # vocab-sized; read twice (scalars, then scoring)

    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    tot = merged.aggregate(_Sum("cl", alias_name="nl"),
                           _Sum("cr", alias_name="nr"),
                           _Count(alias_name="v"))
    nl, nr, v = int(tot["nl"]), int(tot["nr"]), int(tot["v"])
    def score(t: pa.Table) -> pa.Table:
        cl = t.column("cl").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cr = t.column("cr").to_numpy(zero_copy_only=False).astype(
            np.float64)
        p = (cl + 0.5) / (nl + 0.5 * v)
        q = (cr + 0.5) / (nr + 0.5 * v)
        from ..kernels import duck_round

        d = p * np.log(p / q)
        d = duck_round(d, digits)
        return pa.table({"term": t.column("term"),
                         "kl_contrib": pa.array(d, pa.float64())})

    score.__name__ = "kl_contrib"
    scored = merged.map_batches(score, batch_format="pyarrow",
                                batch_size=None)
    return top_k(scored, k, by=["kl_contrib", "term"],
                 descending=[True, False])
