"""ANALYZE: table statistics + footer zone maps for the lake.

Two layers, both metadata-first:

1. ``column_stats(ds, schema)`` — one streaming pass over any Dataset
   producing per-column (rows, nulls, min, max, avg_len, KMV
   distinct-estimate) without ever materializing the input: each block
   folds to ONE tiny partial row per column, the partials flow through a
   low-cardinality (#columns) groupby, and only #columns result rows
   reach the driver.  Reference analog: Gobblin's dataset profiler /
   Hive ``ANALYZE TABLE ... COMPUTE STATISTICS`` as used by
   ``gobblin-compaction``'s dataset-size planner.

2. ``analyze(eng)`` — runs (1) over the lake's merge-on-read head, adds
   a per-FILE ``warc_ts`` zone map read from parquet FOOTERS only (no
   data pages touched), and persists everything atomically to
   ``<lake>/_stats/stats.json`` stamped with the manifest epoch.  The
   engine's ``read_table(ts_min=, ts_max=)`` consumes the zone map to
   skip whole buckets/files; staleness is detected by epoch mismatch
   and falls back to a fresh footer scan.

Pruning safety under LWW merge-on-read (the proof ``read_table`` relies
on; see its docstring for the short form):

* BUCKET level — a bucket is self-contained (every version of a url
  lives in exactly one bucket, by the write router), so skipping a
  bucket whose [min_ts, max_ts] is disjoint from the wanted range drops
  only urls whose merged winner would fail the post-merge range filter
  anyway.  Safe on BOTH sides.
* FILE level — safe only on the MAX side (skip a file when
  ``file_max_ts < ts_min``): any row wrongly resurrected by skipping a
  newer-but-old-ts winner has ``ts <= skipped_winner_ts < ts_min`` and
  is dropped by the post-merge range filter.  The MIN side is UNSAFE:
  skipping a file with ``min_ts > ts_max`` can hide a tombstone or a
  newer version whose absence resurrects an in-range stale row that
  the filter then KEEPS.  We therefore prune files on the max side
  only and never on the min side.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .functions.sketch import _bottom_k, hash_column_u64, kmv_estimate

STATS_DIR = "_stats"
STATS_FILE = "stats.json"


# ---------------------------------------------------------------------------
# column classification


def _kind(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return "num"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    return "other"


_PARTIAL_SCHEMA = pa.schema(
    [
        ("col", pa.string()),
        ("rows", pa.int64()),
        ("nulls", pa.int64()),
        ("min_num", pa.float64()),  # num/bool/ts (ts as epoch-us)
        ("max_num", pa.float64()),
        ("min_str", pa.string()),  # str columns only
        ("max_str", pa.string()),
        ("sum_len", pa.int64()),  # str: codepoints; bin: bytes
        ("bytes", pa.int64()),  # Arrow buffer footprint of the chunk
        ("kmv", pa.list_(pa.uint64())),  # bottom-k distinct hashes
    ]
)


def _col_partial(name: str, col: pa.ChunkedArray, kind: str, k: int) -> dict:
    n = len(col)
    nulls = col.null_count
    row = {
        "col": name, "rows": n, "nulls": nulls,
        "min_num": None, "max_num": None, "min_str": None, "max_str": None,
        "sum_len": None, "bytes": col.nbytes, "kmv": [],
    }
    valid = n - nulls
    if valid == 0:
        return row
    if kind in ("num", "bool", "ts"):
        mm = pc.min_max(col)
        lo, hi = mm["min"], mm["max"]
        if kind == "ts":
            row["min_num"] = float(lo.cast(pa.int64()).as_py())
            row["max_num"] = float(hi.cast(pa.int64()).as_py())
        else:
            row["min_num"] = float(lo.as_py())
            row["max_num"] = float(hi.as_py())
    elif kind == "str":
        mm = pc.min_max(col)
        row["min_str"] = mm["min"].as_py()
        row["max_str"] = mm["max"].as_py()
        row["sum_len"] = int(
            pc.sum(pc.utf8_length(col)).as_py() or 0
        )
    elif kind == "bin":
        row["sum_len"] = int(pc.sum(pc.binary_length(col)).as_py() or 0)
    if kind != "other":
        h = hash_column_u64(pc.drop_null(col).combine_chunks())
        row["kmv"] = _bottom_k(h, k).tolist()
    return row


def column_stats(ds, schema: pa.Schema, columns: list[str] | None = None,
                 ndv_k: int = 1024) -> pa.Table:
    """Per-column statistics of ``ds`` in one streaming pass.

    Returns one row per column: ``col, rows, nulls, ndv (KMV estimate;
    exact below ndv_k distinct), min_s, max_s (display strings),
    avg_len, bytes``.  Shuffle shape: block -> #columns partial rows ->
    groupby("col") over #columns groups (low-cardinality by
    construction, so Ray's native groupby is fine per the repo rule) ->
    one fold per column -> O(#columns) rows on the driver.
    """
    cols = list(columns) if columns is not None else list(schema.names)
    kinds = {c: _kind(schema.field(c).type) for c in cols}

    def partials(t: pa.Table) -> pa.Table:
        rows = [
            _col_partial(c, t.column(c), kinds[c], ndv_k)
            for c in cols if c in t.column_names
        ]
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)

    partials.__name__ = "stats_partials"

    def fold(g: pa.Table) -> pa.Table:
        name = g.column("col")[0].as_py()
        kind = kinds[name]
        rows = int(pc.sum(g.column("rows")).as_py() or 0)
        nulls = int(pc.sum(g.column("nulls")).as_py() or 0)
        nbytes = int(pc.sum(g.column("bytes")).as_py() or 0)
        sum_len = pc.sum(g.column("sum_len")).as_py()
        # vectorized flatten: the group holds one ≤ndv_k-element list per
        # BLOCK of the input — bounded bytes through the exchange, but at
        # ~10^6 blocks the per-column fold input is blocks x k values;
        # keep it in Arrow/numpy (no Python loop), and at that scale add
        # a per-partition pre-fold stage before this groupby.
        flat = pc.list_flatten(g.column("kmv"))
        kmv = _bottom_k(
            flat.to_numpy(zero_copy_only=False).astype(np.uint64), ndv_k
        )
        ndv = float(kmv_estimate(kmv, ndv_k)) if len(kmv) else 0.0
        min_s = max_s = None
        if kind == "str":
            mn, mx = g.column("min_str"), g.column("max_str")
            if rows - nulls > 0:
                min_s = pc.min(mn).as_py()
                max_s = pc.max(mx).as_py()
        elif kind in ("num", "bool", "ts"):
            if rows - nulls > 0:
                lo = pc.min(g.column("min_num")).as_py()
                hi = pc.max(g.column("max_num")).as_py()
                min_s, max_s = _fmt(lo, kind), _fmt(hi, kind)
        valid = rows - nulls
        avg_len = (
            float(sum_len) / valid if sum_len is not None and valid else None
        )
        return pa.table(
            {
                "col": pa.array([name], pa.string()),
                "n_rows": pa.array([rows], pa.int64()),
                "n_nulls": pa.array([nulls], pa.int64()),
                "ndv": pa.array([ndv], pa.float64()),
                "min_s": pa.array([min_s], pa.string()),
                "max_s": pa.array([max_s], pa.string()),
                "avg_len": pa.array([avg_len], pa.float64()),
                "bytes": pa.array([nbytes], pa.int64()),
            }
        )

    fold.__name__ = "stats_fold"
    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
    out = parts.groupby("col").map_groups(fold, batch_format="pyarrow")
    tbl = _collect(out)
    if tbl.num_rows == 0:
        return tbl
    return tbl.sort_by("col")


def _collect(ds) -> pa.Table:
    batches = [b for b in ds.iter_batches(batch_format="pyarrow")
               if b.num_rows]
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


def _fmt(v: float, kind: str) -> str:
    """Display string for a numeric/ts min/max (integral floats as ints,
    timestamps as ISO — matches DuckDB's CAST(... AS VARCHAR) for the
    integer case the oracles compare)."""
    if kind == "ts":
        return str(np.datetime64(int(v), "us"))
    if kind == "bool":
        return "true" if v else "false"
    if float(v).is_integer():
        return str(int(v))
    return repr(float(v))


# ---------------------------------------------------------------------------
# footer zone maps


def file_ts_ranges(file_map: dict[int, list[str]],
                   ts_col: str = "warc_ts") -> dict[int, list[dict]]:
    """Per-file [min, max] of ``ts_col`` (epoch-us) from parquet FOOTERS
    only — no data pages are read.  Distributed: one map_batches task
    per footer batch; the driver receives O(#files) 3-int rows.  A file
    with no usable statistics gets an infinite range (never pruned).
    """
    import ray.data as rd

    items = [
        {"bucket": b, "path": p}
        for b, files in file_map.items() for p in files
    ]
    if not items:
        return {}

    def scan(t: pa.Table) -> pa.Table:
        out = {"bucket": [], "path": [], "min_us": [], "max_us": []}
        for b, p in zip(t.column("bucket").to_pylist(),
                        t.column("path").to_pylist()):
            md = pq.ParquetFile(p).metadata
            try:
                ci = md.schema.to_arrow_schema().names.index(ts_col)
            except ValueError:
                ci = -1
            lo, hi = None, None
            if ci >= 0:
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo, hi = None, None
                        break
                    mn = _to_us(st.min)
                    mx = _to_us(st.max)
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
            out["bucket"].append(b)
            out["path"].append(p)
            out["min_us"].append(lo)
            out["max_us"].append(hi)
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "path": pa.array(out["path"], pa.string()),
                "min_us": pa.array(out["min_us"], pa.int64()),
                "max_us": pa.array(out["max_us"], pa.int64()),
            }
        )

    scan.__name__ = "footer_scan"
    tbl = _collect(
        rd.from_items(items).map_batches(
            scan, batch_format="pyarrow", batch_size=64
        )
    )
    ranges: dict[int, list[dict]] = {}
    for b, p, lo, hi in zip(
        tbl.column("bucket").to_pylist(), tbl.column("path").to_pylist(),
        tbl.column("min_us").to_pylist(), tbl.column("max_us").to_pylist(),
    ):
        ranges.setdefault(int(b), []).append(
            {"path": p, "min_us": lo, "max_us": hi}
        )
    return ranges


def _to_us(v) -> int:
    """Parquet footer statistics value -> epoch microseconds."""
    if hasattr(v, "timestamp"):  # datetime.datetime
        import calendar

        return calendar.timegm(v.utctimetuple()) * 1_000_000 + v.microsecond
    return int(v)


# ---------------------------------------------------------------------------
# persisted ANALYZE


def stats_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, STATS_DIR, STATS_FILE)


def analyze(eng, ndv_k: int = 1024) -> dict:
    """One ANALYZE pass over the lake head: per-column stats over the
    merge-on-read live rows + per-file footer zone maps, persisted
    atomically to ``_stats/stats.json`` stamped with the manifest epoch
    (readers treat any other epoch as stale)."""
    m = eng.store.latest()
    if m is None:
        raise RuntimeError("uninitialized lake")
    schema = m.base_schema()
    cols = column_stats(eng.read_table(manifest=m), schema, ndv_k=ndv_k)
    file_map = eng.bucket_file_map(m)
    ranges = file_ts_ranges(file_map)
    rel = os.path.abspath(eng.lake_dir)
    zone = {
        str(b): [
            {
                "path": os.path.relpath(e["path"], rel),
                "min_us": e["min_us"],
                "max_us": e["max_us"],
            }
            for e in entries
        ]
        for b, entries in sorted(ranges.items())
    }
    out = {
        "epoch": m.epoch,
        "schema_fingerprint": m.schema_fingerprint,
        "ndv_k": ndv_k,
        "columns": cols.to_pylist(),
        "ts_zone_map": zone,
        "live_rows": int(cols.column("n_rows")[0].as_py()) if cols.num_rows
        else 0,
    }
    path = stats_path(eng.lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, path)
    return out


def load_stats(lake_dir: str, epoch: int | None = None) -> dict | None:
    """The persisted ANALYZE output, or None if absent / stale (``epoch``
    given and not matching — the zone map would reference dead files)."""
    path = stats_path(lake_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        st = json.load(f)
    if epoch is not None and st.get("epoch") != epoch:
        return None
    return st


def zone_ranges(eng, manifest) -> dict[int, list[dict]]:
    """Per-file ts ranges for pruned reads, cheapest source first:

    1. The MANIFEST's write-time ranges (BucketState.ts_ranges — the
       Iceberg posture: captured while the epoch's table was in memory,
       zero read cost, always as fresh as the manifest itself).
    2. For files the manifest lacks (pre-upgrade lakes; maintenance
       rewrites — rebucket/DML/purge/repair/forced compact): the
       persisted ANALYZE zone map when epoch-fresh.
    3. For whatever is still missing: a live footer scan of JUST those
       files.  A file unresolved even then gets an infinite range
       (never pruned) — fallbacks only ever cost pruning, not
       correctness."""
    from . import checkpoint as ckpt

    file_map = eng.bucket_file_map(manifest)
    out: dict[int, list[dict]] = {}
    missing: dict[int, list[str]] = {}
    for b, files in file_map.items():
        s = manifest.buckets[b]
        known: dict[str, list] = {}
        if s.base_epoch >= 0:
            rng = s.ts_ranges.get("base")
            if rng:
                known[ckpt.base_path(eng.lake_dir, b, s.base_epoch)] = rng
        for e in s.delta_epochs:
            rng = s.ts_ranges.get(str(e))
            if rng:
                known[ckpt.delta_path(eng.lake_dir, b, e)] = rng
        ents = []
        for p in files:
            rng = known.get(p)
            if rng:
                ents.append(
                    {"path": p, "min_us": int(rng[0]), "max_us": int(rng[1])}
                )
            else:
                missing.setdefault(b, []).append(p)
        out[b] = ents
    if missing:
        st = load_stats(eng.lake_dir, epoch=manifest.epoch)
        side: dict[str, dict] = {}
        if st is not None:
            base = os.path.abspath(eng.lake_dir)
            side = {
                os.path.join(base, e["path"]): e
                for entries in st["ts_zone_map"].values() for e in entries
            }
        still: dict[int, list[str]] = {}
        for b, files in missing.items():
            for p in files:
                e = side.get(p)
                if e is not None:
                    out[b].append(
                        {"path": p, "min_us": e["min_us"],
                         "max_us": e["max_us"]}
                    )
                else:
                    still.setdefault(b, []).append(p)
        if still:
            for b, entries in file_ts_ranges(still).items():
                out[b].extend(entries)
    return out
