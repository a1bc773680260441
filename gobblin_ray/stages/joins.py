"""Joins: broadcast (small side) and partitioned hash join (both sides big).

Gobblin has no general join operator (SURVEY.md §2.5) — the CDC engine's
change⋈base merge is a co-located partition-wise merge. These helpers cover
the general shapes a pipeline author needs:

- ``broadcast_join``: the dimension-table pattern — ``ray.put`` the small
  side ONCE, every task does an in-memory pyarrow hash join per batch. No
  shuffle; never re-ships the small table per batch (the object ref is
  plasma-shared per node).
- ``hash_join``: both sides large — Ray's native ``Dataset.join``
  (hash-partitioned); falls back to an explicit bucketed join if the Ray
  version lacks it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(
    ds,
    small: pa.Table,
    keys: list[str] | str,
    join_type: str = "inner",
    batch_size: int | None = None,
):
    """Join a Dataset against a small in-memory Arrow table (broadcast)."""
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    ref = ray.put(small)

    class BroadcastJoin:
        def __init__(self):
            self.small = ray.get(ref)  # fetched once per actor/task process

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=keys, join_type=join_type)

    return ds.map_batches(
        BroadcastJoin, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8)
    )


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None):
    """Partitioned hash join of two Datasets on key columns.

    ``num_partitions`` is clamped to the cluster CPU count: Ray's
    hash-shuffle join reserves one aggregator slot per partition, so
    asking for more partitions than CPUs deadlocks a small node (the
    aggregators can never all be placed). Default: one partition per
    CPU, capped at 16 for the small-SF regime.
    """
    import ray

    cpus = max(1, int(ray.cluster_resources().get("CPU", 1)))
    if num_partitions is None:
        num_partitions = min(16, cpus)
    else:
        num_partitions = max(1, min(int(num_partitions), cpus))
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (
        tuple(right_on) if right_on else None
    )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def semi_join(ds, key: str, key_set, anti: bool = False):
    """Semi / anti join against a broadcast key set: ``ray.put`` the keys
    once, filter per batch with a vectorized is_in. No shuffle — the right
    pattern when the key side fits in memory (SURVEY §2.5; at larger key
    cardinalities swap the set for a Bloom filter, same shape)."""
    import pyarrow.compute as pc
    import ray

    ref = ray.put(pa.array(sorted(key_set)))

    class SemiFilter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch.column(key)
            hit = pc.fill_null(pc.is_in(col, value_set=self.keys), False)
            keep = pc.and_(pc.invert(hit) if anti else hit, pc.is_valid(col))
            return batch.filter(keep)

    return ds.map_batches(SemiFilter, batch_format="pyarrow", batch_size=None,
                          concurrency=(1, 8))


class BloomFilter:
    """Vectorized Bloom filter over u64-hashed keys (public-knowledge
    construction: Bloom 1970; double hashing g_i = h1 + i*h2, Kirsch &
    Mitzenmacher 2006). State is a flat uint8 bit array — O(bits_per_key *
    n / 8) bytes regardless of key width, which is what makes it the
    broadcast-side pruning structure when the exact key SET is too big to
    ship (10^9 64-byte keys = 64 GB of set vs ~1.2 GB of bloom at 10
    bits/key, fp ~1%)."""

    def __init__(self, bits, n_hashes: int):
        self.bits = bits
        self.n_hashes = int(n_hashes)
        self.m = int(len(bits)) * 8

    @classmethod
    def build(cls, hashes, bits_per_key: int = 10, n_hashes: int = 4):
        import numpy as np

        m = max(64, int(len(hashes) * bits_per_key))
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        bf = cls(bits, n_hashes)
        for pos in bf._positions(np.asarray(hashes, dtype=np.uint64)):
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return bf

    def _positions(self, h1):
        import numpy as np

        from ..functions.sketch import _splitmix64

        h2 = _splitmix64(h1) | np.uint64(1)
        m = np.uint64(self.m)
        with np.errstate(over="ignore"):
            for i in range(self.n_hashes):
                yield ((h1 + np.uint64(i) * h2) % m).astype(np.int64)

    def contains(self, hashes):
        """Vectorized membership mask (no false negatives)."""
        import numpy as np

        h1 = np.asarray(hashes, dtype=np.uint64)
        ok = np.ones(len(h1), dtype=bool)
        for pos in self._positions(h1):
            ok &= (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        return ok


def bloom_semi_join(ds, key: str, key_set, bits_per_key: int = 10):
    """Semi join with a Bloom prefilter ahead of the exact check: the bloom
    (O(n/8 * bits_per_key) bytes) is broadcast once and drops ~99% of
    non-matching rows vectorized at the scan; survivors are verified
    exactly, so the RESULT is exact — false positives only cost a second
    look. At demo scale the exact verify is the broadcast ``semi_join``;
    when the key side outgrows broadcast, keep the same bloom prefilter and
    swap the verify for a partitioned ``hash_join`` over the (now tiny)
    survivor stream — the bloom is what keeps that shuffle small."""
    import numpy as np
    import ray

    from ..functions.sketch import hash_column_u64

    keys = pa.array(sorted(key_set))
    bloom = BloomFilter.build(hash_column_u64(keys), bits_per_key=bits_per_key)
    bloom_ref = ray.put(bloom)
    keys_ref = ray.put(keys)

    class BloomThenExact:
        def __init__(self):
            self.bloom = ray.get(bloom_ref)   # once per worker process
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch.column(key)))
            if batch.num_rows == 0:
                return batch
            h = hash_column_u64(batch.column(key))
            cand = batch.filter(pa.array(self.bloom.contains(h)))
            if cand.num_rows == 0:
                return cand
            hit = pc.fill_null(
                pc.is_in(cand.column(key), value_set=self.keys), False
            )
            return cand.filter(hit)

    return ds.map_batches(
        BloomThenExact, batch_format="pyarrow", batch_size=None, concurrency=(1, 8)
    )


def _co_partition(sides, union_schema: pa.Schema, num_partitions: int):
    """Shared two-sided co-partition shape under outer/asof/window joins:
    tag each side, conform to the union schema, route on ``hash(side's
    key) % P``, and union both streams through the ONE exchange. ``sides``
    is a list of ``(dataset, side_label, key_col, require_valid_cols)`` —
    rows with a null in any ``require_valid_cols`` are dropped at the tag
    stage (each operator states its own null policy explicitly). One
    definition so a fix (e.g. the null-timestamp filter) can't silently
    apply to one join and not its siblings."""
    from ..schema import conform
    from .partition import key_partition

    tagged = []
    for ds, side, key_col, req in sides:
        def make(side=side, key_col=key_col, req=tuple(req)):
            def f(t: pa.Table) -> pa.Table:
                for c in req:
                    t = t.filter(pc.is_valid(t.column(c)))
                t = t.append_column("_side", pa.array([side] * t.num_rows))
                t = conform(t, union_schema)
                return t.append_column(
                    "_kp",
                    pa.array(key_partition(t.column(key_col), num_partitions)),
                )

            f.__name__ = f"tag_{side}"
            return f

        tagged.append(
            ds.map_batches(make(), batch_format="pyarrow", batch_size=None)
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out


def outer_join_by_key(
    left,
    right,
    left_key: str,
    right_key: str,
    how: str = "full",
    num_partitions: int = 64,
):
    """FULL / LEFT / RIGHT OUTER join of two Datasets as a bounded-partition
    composition (how in {"full", "left", "right"}).

    Ray's native ``Dataset.join`` covers INNER at scale, but its
    hash-shuffle outer path currently joins a COLUMN-LESS empty table when
    a partition receives no blocks from one side (pyarrow acero KeyError on
    the key column — observed on ray 2.49 with a filtered right side), so
    outer shapes use the merge_asof/session-window pattern instead: both
    sides ride ONE union exchange on ``hash(key) % num_partitions``
    (bounded partitions, never per-key dispatch), and each partition runs
    one vectorized ``pd.merge(how=...)`` over all of its keys.

    Column names of the two sides must be disjoint (rename upstream).
    Null-key rows follow pandas merge semantics (they match each other);
    filter them upstream for SQL parity. Unmatched rows surface as
    NaN/None in the other side's columns. Partitioning assumption: one
    partition's rows from both sides fit in a worker."""
    import pandas as pd

    from ..schema import unify_additive

    hows = {"full": "outer", "left": "left", "right": "right"}
    if how not in hows:
        raise ValueError(f"how must be one of {sorted(hows)}, got {how!r}")
    P = num_partitions
    lcols = left.schema().names
    rcols = right.schema().names
    if set(lcols) & set(rcols):
        raise ValueError(
            f"side column names must be disjoint, both have {set(lcols) & set(rcols)}"
        )
    l_schema = pa.schema(zip(left.schema().names, left.schema().types))
    r_schema = pa.schema(zip(right.schema().names, right.schema().types))
    union_schema = unify_additive(l_schema, r_schema).append(
        pa.field("_side", pa.string())
    )

    both = _co_partition(
        [(left, "l", left_key, []), (right, "r", right_key, [])],
        union_schema, P,
    )

    # Columns on a nullable side (right of a left join, both of a full
    # join) get NaN-promoted to float64 by pandas ONLY in partitions that
    # contain unmatched rows — normalize them in every partition so the
    # output blocks agree on one schema (arrow-level consumers union/write
    # these blocks).
    nullable_cols = []
    if how in ("full", "right"):
        nullable_cols += lcols
    if how in ("full", "left"):
        nullable_cols += rcols
    int_like = {
        f.name: f.type for f in list(l_schema) + list(r_schema)
        if pa.types.is_integer(f.type) or pa.types.is_boolean(f.type)
    }
    # Nullable-side int/bool columns become float64 (NaN-carrying — the
    # same dtype DuckDB's fetchdf hands back for an outer join, so the
    # oracle compare agrees; CAVEAT: ints above 2^53 lose exactness, the
    # price of the float-NaN representation). NON-nullable-side columns
    # can't hold NaN in the result, but the union block ALREADY promoted
    # them wherever the partition contains other-side rows — un-promote
    # them back to their exact arrow dtype so all partitions agree.
    int_cols = [c for c in int_like if c in nullable_cols]
    solid = {c: t for c, t in int_like.items() if c not in nullable_cols}

    def join_partition(g: "pd.DataFrame") -> "pd.DataFrame":
        lg = g[g["_side"] == "l"][lcols]
        rg = g[g["_side"] == "r"][rcols]
        out = pd.merge(lg, rg, left_on=left_key, right_on=right_key,
                       how=hows[how])
        for c in int_cols:
            out[c] = out[c].astype("float64")
        for c, t in solid.items():
            out[c] = out[c].astype(t.to_pandas_dtype())
        return out

    return both.groupby("_kp").map_groups(
        join_partition, batch_format="pandas"
    )


def merge_into(
    target,
    source,
    key: str,
    update_exprs: dict | None = None,
    delete_when=None,
    insert_unmatched: bool = True,
    insert_exprs: dict | None = None,
    num_partitions: int = 64,
):
    """SQL:2003 ``MERGE INTO target USING source ON target.key = source.key``
    (Delta MERGE / Iceberg MergeIntoCommand / Hudi expression-payload
    analog). The CDC engine's LWW merge (merge.py) is the specialized
    whole-row last-writer-wins instance of this; ``merge_into`` is the
    general per-clause form:

      WHEN MATCHED AND delete_when(row)   THEN DELETE
      WHEN MATCHED                        THEN UPDATE SET col = expr(row)
      WHEN NOT MATCHED [BY TARGET]        THEN INSERT (cols) VALUES (exprs)

    Both sides must carry the key under the SAME column name. Expressions
    see a merged frame with target columns under their own names and every
    source column suffixed ``__src``; ``update_exprs`` / ``insert_exprs``
    values are a source column name (str) or a ``callable(df) -> values``
    (``insert_exprs`` callables see only the unmatched SOURCE rows, still
    ``__src``-suffixed). Unlisted target columns default on insert to the
    same-named source column if one exists, else null; the key always
    fills from the source key. Two source rows with one key raise the
    SQL 'attempt to update the same row twice' error (checked per
    partition — co-partitioning makes the per-partition check exhaustive).
    Null source keys are dropped at the tag stage; null target keys pass
    through unmatched (SQL: NULL joins nothing — and they can't falsely
    NaN-match because the null-key source rows are already gone).

    Shape: ONE bounded co-partition exchange on ``hash(key) % P`` (the
    same union exchange as the outer/asof/window joins — both sides
    stream, no broadcast, no driver state), then one vectorized pandas
    pass per partition. Dtype contract (outer_join_by_key convention):
    int/bool target columns that inserts can null, come back float64
    (the NaN-carrying dtype DuckDB's fetchdf also hands back); every
    other int/bool column is un-promoted to its exact dtype in every
    partition; string/timestamp columns are pinned so an all-insert
    partition can't degrade them to a null-typed block."""
    import numpy as np
    import pandas as pd

    from ..schema import unify_additive

    update_exprs = dict(update_exprs or {})
    insert_exprs = dict(insert_exprs or {})
    tcols = list(target.schema().names)
    scols = list(source.schema().names)
    if key not in tcols or key not in scols:
        raise ValueError(f"both sides need key column {key!r}")
    skey = f"{key}__src"

    def rename_src(t: pa.Table) -> pa.Table:
        return t.rename_columns([f"{c}__src" for c in t.column_names])

    rename_src.__name__ = "suffix_source_cols"
    src = source.map_batches(rename_src, batch_format="pyarrow", batch_size=None)
    t_schema = pa.schema(zip(target.schema().names, target.schema().types))
    s_schema = pa.schema(
        [(f"{n}__src", t)
         for n, t in zip(source.schema().names, source.schema().types)]
    )
    union_schema = unify_additive(t_schema, s_schema).append(
        pa.field("_side", pa.string())
    )
    both = _co_partition(
        [(target, "t", key, []), (src, "s", skey, [skey])],
        union_schema, num_partitions,
    )

    for c in tcols:  # default INSERT mapping: same-named source column
        if c != key and c not in insert_exprs and c in scols:
            insert_exprs[c] = c
    int_like = {
        f.name: f.type for f in t_schema
        if pa.types.is_integer(f.type) or pa.types.is_boolean(f.type)
    }
    nullable = set(update_exprs)
    if insert_unmatched:
        nullable |= {c for c in tcols if c != key and c not in insert_exprs}
    float_cols = [c for c in int_like if c in nullable]
    solid = {c: t for c, t in int_like.items() if c not in nullable}
    pin = {}
    for f in t_schema:
        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            pin[f.name] = "string"
        elif pa.types.is_timestamp(f.type):
            pin[f.name] = f"datetime64[{f.type.unit}]"
    scols_r = [f"{c}__src" for c in scols]

    def _vals(ex, frame):
        if isinstance(ex, str):
            return frame[f"{ex}__src"]
        return pd.Series(np.asarray(ex(frame)), index=frame.index)

    def apply_merge(g: pd.DataFrame) -> pd.DataFrame:
        tg = g[g["_side"] == "t"][tcols]
        sg = g[g["_side"] == "s"][scols_r]
        if sg[skey].duplicated().any():
            dup = sg[skey][sg[skey].duplicated()].iloc[0]
            raise ValueError(
                f"MERGE source has multiple rows for key {dup!r} "
                "(SQL: a target row cannot be updated twice)"
            )
        m = tg.merge(sg, left_on=key, right_on=skey, how="left")
        matched = m[skey].notna()
        if delete_when is not None and len(m):
            drop = matched & np.asarray(delete_when(m), dtype=bool)
            m = m[~drop].reset_index(drop=True)
            matched = matched[~drop].reset_index(drop=True)
        for c, ex in update_exprs.items():
            m[c] = m[c].where(~matched, _vals(ex, m))
        out = m[tcols]
        if insert_unmatched:
            ins_src = sg[~sg[skey].isin(tg[key])].reset_index(drop=True)
            if len(ins_src):
                ins = pd.DataFrame(index=ins_src.index)
                for c in tcols:
                    if c == key:
                        ins[c] = ins_src[skey]
                    elif c in insert_exprs:
                        ins[c] = _vals(insert_exprs[c], ins_src)
                    else:
                        ins[c] = None
                out = pd.concat([out, ins[tcols]], ignore_index=True)
        out = out.copy()
        for c in float_cols:
            out[c] = out[c].astype("float64")
        for c, t in solid.items():
            out[c] = out[c].astype(t.to_pandas_dtype())
        for c, dt in pin.items():
            out[c] = out[c].astype(dt)
        return out

    return both.groupby("_kp").map_groups(apply_merge, batch_format="pandas")


def merge_asof_by_key(
    left,
    right,
    key: str,
    left_on: str,
    right_on: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    num_partitions: int = 32,
):
    """As-of join: for each left row, the closest right row (by the
    ``direction`` rule on the *_on columns) within the same ``key`` group.

    Ray Data has no as-of join; the composition (ray_guide pattern) is:
    co-partition both sides through ONE union + groupby shuffle, then ONE
    vectorized ``pd.merge_asof(..., by=key)`` per BOUNDED partition group
    (``hash(key) % num_partitions``) — not per key: at 10^9 keys the
    per-group Python dispatch would dominate, while merge_asof's ``by=``
    handles all of a partition's keys in one C pass. Assumes one partition
    fits in a worker (raise ``num_partitions`` at scale)."""
    import pandas as pd

    from ..schema import conform, unify_additive

    P = num_partitions
    lcols = left.schema().names
    rcols = [key, right_on] + [c for c in (right_cols or []) if c not in (key, right_on)]
    l_schema = pa.schema(zip(left.schema().names, left.schema().types))
    r_full = right.select_columns(rcols)
    r_schema = pa.schema(zip(r_full.schema().names, r_full.schema().types))
    union_schema = unify_additive(l_schema, r_schema).append(
        pa.field("_side", pa.string())
    )

    both = _co_partition(
        [(left, "l", key, []), (r_full, "r", key, [])], union_schema, P,
    )

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"][[c for c in g.columns if c in lcols]]
        rg = g[g["_side"] == "r"][[c for c in rcols if c in g.columns]]
        # null left_on rows have no defined nearest match and make
        # merge_asof raise ("merge keys contain null values on left side");
        # drop them like the inner ASOF JOIN the oracle runs would
        lg = lg.dropna(subset=[left_on]).sort_values(left_on)
        rg = rg.sort_values(right_on).dropna(subset=[right_on, key])
        out = pd.merge_asof(
            lg, rg, left_on=left_on, right_on=right_on, by=key,
            direction=direction,
        )
        return out

    # union carries both sides through ONE shuffle on the partition key
    return both.groupby("_kp").map_groups(asof_partition, batch_format="pandas")


def window_join_by_key(
    left,
    right,
    key: str,
    left_on: str,
    right_on: str,
    before_s: float = 0.0,
    after_s: float = 0.0,
    num_partitions: int = 32,
):
    """Stream-stream WINDOWED join: every (left, right) pair with the same
    ``key`` and ``right_on`` within ``[left_on - before_s, left_on +
    after_s]`` (inclusive both ends — SQL ``BETWEEN`` semantics). Unlike
    ``merge_asof_by_key`` (nearest single match) this emits ALL matches —
    the attribution shape ("every click within 30 min before each
    purchase"), Flink's interval join. Column names of the two sides must
    be disjoint apart from ``key`` (rename the right side first).

    Ray Data has no interval join; the composition is the asof-join shape:
    co-partition both sides through ONE union + groupby exchange on
    ``hash(key) % num_partitions`` (bounded partitions, never per-key
    dispatch), then a fully vectorized per-partition kernel: sort the
    right side by (key-code, ts), rank timestamps so the (code, ts)
    lexicographic order collapses to EXACT int64 arithmetic (code * M +
    rank — no float composite, so microsecond bounds can't jitter), and
    two ``np.searchsorted`` calls give each left row its contiguous match
    span; pairs materialize with one ``np.repeat`` + grouped-arange
    gather. Cost is O((n + pairs) log n) C work per partition, no Python
    row loop. Partitioning assumption: one partition's rows (both sides)
    fit in a worker; skew note — a single hot key with m_l x m_r matching
    pairs emits them all (that's the query's own output size).

    Reference analog: Gobblin has no general join (SURVEY §2.5); this
    extends the merge_asof composition the same way the reference's
    compaction pairs late/on-time records by key+time affinity
    (gobblin-compaction/.../MRCompactorJobRunner.java dedup window)."""
    import numpy as np
    import pandas as pd

    from ..schema import unify_additive

    P = num_partitions
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    overlap = (set(lcols) & set(rcols)) - {key}
    if overlap:
        raise ValueError(f"window_join_by_key: rename overlapping columns {sorted(overlap)}")
    l_schema = pa.schema(zip(left.schema().names, left.schema().types))
    r_schema = pa.schema(zip(right.schema().names, right.schema().types))
    union_schema = unify_additive(l_schema, r_schema).append(
        pa.field("_side", pa.string())
    )
    before_us = int(round(before_s * 1e6))
    after_us = int(round(after_s * 1e6))

    # null keys can't match; null timestamps can't satisfy BETWEEN (SQL
    # comparison with NULL is false) — and once cast to int64 a NaT becomes
    # INT64_MIN and wraps the window arithmetic, so both filter at the tag
    both = _co_partition(
        [(left, "l", key, [key, left_on]),
         (right, "r", key, [key, right_on])],
        union_schema, P,
    )

    r_out = [c for c in rcols if c != key]

    def _usec(s: pd.Series) -> np.ndarray:
        v = s.to_numpy()
        if np.issubdtype(v.dtype, np.datetime64):
            return v.astype("datetime64[us]").astype(np.int64)
        return np.round(v.astype(np.float64) * 1e6).astype(np.int64)

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"][lcols]
        rg = g[g["_side"] == "r"][rcols]
        empty = pd.concat(
            [lg.iloc[:0].reset_index(drop=True),
             rg[r_out].iloc[:0].reset_index(drop=True)], axis=1,
        )
        if lg.empty or rg.empty:
            return empty
        codes, _ = pd.factorize(
            pd.concat([lg[key], rg[key]], ignore_index=True), sort=False
        )
        lc = codes[: len(lg)].astype(np.int64)
        rc = codes[len(lg):].astype(np.int64)
        lt = _usec(lg[left_on])
        rt = _usec(rg[right_on])
        order = np.lexsort((rt, rc))
        rc_s, rt_s = rc[order], rt[order]
        lo_b, hi_b = lt - before_us, lt + after_us
        # rank timestamps over (right values + both query bounds) so the
        # composite code*M + rank is EXACT int64 and order-isomorphic to
        # lexicographic (code, ts)
        uniq = np.unique(np.concatenate([rt_s, lo_b, hi_b]))
        M = np.int64(len(uniq) + 1)
        rcomp = rc_s * M + np.searchsorted(uniq, rt_s)
        lo = np.searchsorted(rcomp, lc * M + np.searchsorted(uniq, lo_b),
                             side="left")
        hi = np.searchsorted(rcomp, lc * M + np.searchsorted(uniq, hi_b),
                             side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(lg)), counts)
        ri = (np.repeat(lo, counts)
              + np.arange(total)
              - np.repeat(np.cumsum(counts) - counts, counts))
        rg_sorted = rg.iloc[order]
        return pd.concat(
            [lg.iloc[li].reset_index(drop=True),
             rg_sorted[r_out].iloc[ri].reset_index(drop=True)], axis=1,
        )

    join_partition.__name__ = "window_join"
    return both.groupby("_kp").map_groups(join_partition, batch_format="pandas")


def range_join(
    points,
    intervals,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    interval_cols: list[str] | None = None,
):
    """Interval (range) join: every point row paired with every interval
    row whose half-open range satisfies ``lo <= value < hi``.

    Ray Data has no range join; the scale-sound composition is ONE
    exchange on a coarse value bucket: points route to
    ``floor(value / bucket_width)``, intervals are REPLICATED to every
    coarse bucket they overlap (a 1:N flat-map — replication factor
    ~ interval span / bucket_width, so pick ``bucket_width`` near the
    typical span), and each bounded bucket does a vectorized
    points x intervals containment match. Half-open semantics mean no
    match is emitted twice despite the replication (a point lives in
    exactly one bucket). Partitioning assumption: one bucket's points
    plus its overlapping intervals fit in a worker; the per-bucket match
    allocates a (points x intervals) mask, so keep intervals-per-bucket
    modest (narrow buckets) when intervals are dense."""
    import numpy as np

    from ..schema import conform, unify_additive

    icols = [lo_col, hi_col] + [
        c for c in (interval_cols or []) if c not in (lo_col, hi_col)
    ]
    pcols = points.schema().names
    p_schema = pa.schema(zip(points.schema().names, points.schema().types))
    ivals = intervals.select_columns(icols)
    i_schema = pa.schema(zip(ivals.schema().names, ivals.schema().types))
    union_schema = unify_additive(p_schema, i_schema).append(
        pa.field("_side", pa.string())
    )
    w = float(bucket_width)

    def tag_points(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(value_col)))
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / w).astype(np.int64)
        t = t.append_column("_side", pa.array(["p"] * t.num_rows))
        return conform(t, union_schema).append_column("_rb", pa.array(b))

    tag_points.__name__ = "tag_points"

    def explode_intervals(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column(lo_col)), pc.is_valid(t.column(hi_col)))
        )
        lo = t.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b0 = np.floor(lo / w).astype(np.int64)
        # hi is EXCLUSIVE: an interval ending exactly on a bucket edge
        # does not overlap the next bucket
        b1 = np.floor(np.nextafter(hi, -np.inf) / w).astype(np.int64)
        b1 = np.maximum(b1, b0)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        out = t.take(pa.array(idx))
        # grouped arange in C (repeat + offset-corrected arange), not a
        # Python per-interval loop — same idiom as window_join's pair gather
        total = int(reps.sum())
        bucket = (
            np.repeat(b0, reps)
            + np.arange(total)
            - np.repeat(np.cumsum(reps) - reps, reps)
        ) if total else np.array([], np.int64)
        out = out.append_column("_side", pa.array(["i"] * out.num_rows))
        return conform(out, union_schema).append_column("_rb", pa.array(bucket))

    explode_intervals.__name__ = "explode_intervals"

    p_tag = points.map_batches(tag_points, batch_format="pyarrow", batch_size=None)
    i_tag = ivals.map_batches(
        explode_intervals, batch_format="pyarrow", batch_size=None
    )

    out_cols = pcols + [c for c in icols if c not in pcols]

    def match(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy(zero_copy_only=False)
        pts = g.filter(pa.array(side == "p"))
        ivs = g.filter(pa.array(side == "i"))
        empty = pa.table(
            {c: pa.array([], union_schema.field(c).type) for c in out_cols}
        )
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return empty
        v = pts.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lo = ivs.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
        hi = ivs.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mask = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
        pi, ii = np.nonzero(mask)
        if len(pi) == 0:
            return empty
        left = pts.select(pcols).take(pa.array(pi))
        right = ivs.select([c for c in icols if c not in pcols]).take(pa.array(ii))
        out = left
        for c in right.column_names:
            out = out.append_column(c, right.column(c))
        return out

    match.__name__ = "range_match"
    both = p_tag.union(i_tag)
    return both.groupby("_rb").map_groups(match, batch_format="pyarrow")


def hot_keys_exact(ds, key: str, threshold: int):
    """Exact hot-key detection: ONE combiner-pre-aggregated groupby count,
    then only keys with count > threshold come to the driver — O(hot keys)
    driver state, never the full key histogram."""
    counts = ds.groupby(key).count()

    def keep_hot(t: pa.Table, th=threshold) -> pa.Table:
        return t.filter(pc.greater(t.column("count()"), th))

    hot = counts.map_batches(keep_hot, batch_format="pyarrow",
                             batch_size=None)
    return [r[key] for r in hot.take_all()]


def skew_join_by_key(left, right, key: str, hot_threshold: int,
                     num_partitions: int = 16):
    """Skew-resistant INNER equi-join: the classic fact⋈dim shape where a
    handful of hot keys (celebrity users, null-ish defaults, head URLs)
    would overload single shuffle partitions. Spark's skew-join hint /
    AQE skew split rebuilt Ray-native, and the join-side complement to
    this engine's salted hot-bucket routing (plan.salt_plan):

    1. find hot LEFT keys exactly (``hot_keys_exact`` — one combiner
       groupby, only hot keys reach the driver);
    2. hot left rows join against the hot slice of the right side via
       ``broadcast_join`` — those rows NEVER shuffle (ray.put once,
       plasma-shared per node);
    3. cold rows flow through the ordinary partitioned ``hash_join``,
       whose partitions are now skew-free;
    4. union — exact, since the key split is a partition of the rows.

    Assumption (documented per the custom-operator rule): the right side
    holds bounded rows per key (dimension/metadata), so the hot slice
    fits in the object store. Null keys drop (inner-join semantics)."""
    import ray

    hot = hot_keys_exact(left, key, hot_threshold)
    if not hot:
        return hash_join(left, right, key, num_partitions=num_partitions)
    hot_arr = pa.array(sorted(hot))
    hot_ref = ray.put(hot_arr)

    def splitter(keep_hot: bool):
        # TASK-based stage on purpose: the final pipeline runs four split
        # streams + the broadcast-join actor pool + the hash-shuffle
        # aggregators CONCURRENTLY, and each actor pool reserves >= 1 CPU
        # up front — on a small node the reservations alone can deadlock
        # the scheduler. ray.get of the plasma-shared hot set is a local
        # zero-copy fetch per task, so tasks lose nothing here.
        def split(t: pa.Table) -> pa.Table:
            hot = ray.get(hot_ref)
            col = t.column(key)
            in_hot = pc.fill_null(pc.is_in(col, value_set=hot), False)
            keep = in_hot if keep_hot else pc.and_(
                pc.invert(in_hot), pc.is_valid(col))
            return t.filter(keep)

        split.__name__ = f"split_{'hot' if keep_hot else 'cold'}[{key}]"
        return split

    right_hot_ds = right.map_batches(splitter(True), batch_format="pyarrow",
                                     batch_size=None)
    right_hot = pa.concat_tables(
        [ray.get(r) for r in right_hot_ds.to_arrow_refs()],
        promote_options="default",
    )
    left_hot = left.map_batches(splitter(True), batch_format="pyarrow",
                                batch_size=None)
    left_cold = left.map_batches(splitter(False), batch_format="pyarrow",
                                 batch_size=None)
    right_cold = right.map_batches(splitter(False), batch_format="pyarrow",
                                   batch_size=None)

    out_cols = list(left.schema().names) + [
        c for c in right.schema().names if c != key
    ]
    joined_hot = broadcast_join(left_hot, right_hot, key).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow",
        batch_size=None,
    )
    joined_cold = hash_join(left_cold, right_cold, key,
                            num_partitions=num_partitions).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow",
        batch_size=None,
    )
    return joined_hot.union(joined_cold)
