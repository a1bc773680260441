"""Sort / top-k stages (SURVEY §2.7).

``top_k`` avoids the global all-to-all sort for small k: each block emits
its own k best rows (vectorized Arrow sort+slice), and only the tiny
candidate set (<= k x blocks rows) goes through the final sort+limit —
the same candidate/final-reduce shape as functions.similarity.knn_brute_force.
Gobblin analog: MR secondary sort feeding a single reducer that keeps the
top rows (MRCompactor job shape), minus the full shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def top_k(ds, k: int, by: list[str], descending: list[bool]):
    """Global top-k rows of ``ds`` ordered by ``by``/``descending``.

    Per-block partial top-k, then one final sort+limit over the candidates.
    At 10^9 input rows the exchange moves k rows per block, not the table.
    """
    sort_keys = [
        (c, "descending" if d else "ascending") for c, d in zip(by, descending)
    ]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.sort_by(sort_keys).slice(0, k)

    partial.__name__ = f"partial_top{k}"
    candidates = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return candidates.sort(by, descending=descending).limit(k)


def top_k_per_group(
    ds,
    group_key: str,
    k: int,
    by: list[str],
    descending: list[bool],
    num_partitions: int = 64,
):
    """Top-k rows PER GROUP (grouped rank) — the k>1 generalization of the
    compaction dedup reducer's keep-the-winner contract
    (gobblin-compaction/.../AvroKeyDedupReducer.java:35-93 keeps top-1 per
    key under a secondary sort; this keeps the first k).

    Scale shape: a within-batch combiner first prunes every batch to its
    LOCAL top-k per group (only rows that can survive globally), so the
    exchange carries <= k x groups-per-batch rows, not the table. The
    shuffle then keys on ``hash(group) % num_partitions`` — bounded
    partitions, never one dispatch per group — and each partition re-runs
    the same vectorized sort + segmented-head kernel over thousands of
    groups in one Arrow pass. Skewed groups cost k rows each post-combine,
    so hot keys cannot inflate the exchange.
    """
    import numpy as np

    sort_keys = [(group_key, "ascending")] + [
        (c, "descending" if d else "ascending") for c, d in zip(by, descending)
    ]

    def _head_per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.sort_by(sort_keys)
        g = t.column(group_key).to_numpy(zero_copy_only=False)
        change = np.concatenate(([True], g[1:] != g[:-1]))
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        ranks = np.arange(len(g)) - starts[seg]
        return t.take(pa.array(np.flatnonzero(ranks < k)))

    def combine_and_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop null/NaN group keys (the keyed_map_groups family's
        # drop-null policy): NaN != NaN makes every such row its OWN
        # group, so null-key rows bypassed the k limit entirely
        col0 = t.column(group_key)
        mask = pc.is_valid(col0)
        if pa.types.is_floating(col0.type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(col0)))
        t = t.filter(pc.fill_null(mask, False))
        t = _head_per_group(t)
        col = t.column(group_key)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from ..engine import stable_hash_u64

            h = stable_hash_u64(col)
        else:
            h = t.column(group_key).to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    combine_and_part.__name__ = f"top{k}_combine"

    def reduce_partition(g: pa.Table) -> pa.Table:
        return _head_per_group(g.drop_columns(["_part"]))

    return (
        ds.map_batches(combine_and_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(reduce_partition, batch_format="pyarrow")
    )


def mixture_sample_hash(ds, group_col: str, weights: dict, id_col: str):
    """Deterministic WEIGHTED mixture sampling (LLM data-mixture shape:
    keep fraction w_g of stratum g, reproducibly): a row survives iff the
    top-32-bits-of-md5(id) fraction is below its group's weight — the
    same stable-hash coin as ``stratified_sample_hash``, so the subset is
    identical across runs, partitionings, and cluster sizes, and exactly
    SQL-replayable (md5 prefix arithmetic). Groups absent from
    ``weights`` default to weight 0 (dropped). Pure per-batch filter —
    no shuffle, no driver state."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        frac = np.array(
            [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
             for v in ids],
            dtype=np.float64,
        ) / float(1 << 32)
        g = t.column(group_col).to_pylist()
        w = np.array([weights.get(x, 0.0) for x in g])
        return t.filter(pa.array(frac < w))

    keep.__name__ = "mixture_sample"
    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def stratified_sample_hash(
    ds,
    group_key: str,
    n_per_group: int,
    id_col: str,
    num_partitions: int = 64,
):
    """Deterministic stratified sample: the ``n_per_group`` rows with the
    SMALLEST md5(id) per group — a fixed-size per-stratum sample that is
    reproducible across runs, cluster sizes, and input partitioning (the
    property a training-data pipeline needs for stable eval/holdout
    splits; random_shuffle/limit is none of those). Hash-ordering is
    uniform, so this is statistically a uniform without-replacement sample
    per stratum (Appendix of Broder 1997 min-wise sampling).

    Composition: md5 per row (no Arrow kernel; the Fingerprinter pattern)
    then the grouped-rank kernel (``top_k_per_group``) — combiner pruning
    keeps the exchange at <= n_per_group x groups-per-batch rows."""
    import hashlib

    import pyarrow as pa

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        hs = [hashlib.md5(str(v).encode()).hexdigest() for v in ids]
        return t.append_column("_h", pa.array(hs, pa.string()))

    add_hash.__name__ = "sample_hash"
    tagged = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)
    out = top_k_per_group(
        tagged, group_key, n_per_group, by=["_h", id_col],
        descending=[False, False], num_partitions=num_partitions,
    )
    return out.drop_columns(["_h"])


def zorder_key(cols: list[str], bits: int = 16, out: str = "zkey"):
    """Z-order (Morton) clustering key — the Delta/Iceberg ``OPTIMIZE
    ZORDER BY`` layout primitive: interleave the low ``bits`` bits of k
    int columns so a sort/range-partition on the key co-locates rows
    that are close in EVERY dimension, making multi-column min/max file
    pruning effective (each file covers a small hyper-rectangle instead
    of a full stripe of one column). Gobblin analog: none (its writers
    partition on one derived key; SURVEY §2.2) — lakehouse-standard
    beyond-reference addition.

    Per-batch converter, no shuffle: k·bits vectorized numpy ops per
    batch (bit ops are exactly reproducible in SQL ``>> & <<``, so the
    key is oracle-checkable). Cluster the table with
    ``ds.sort(out)`` / ``repartition`` downstream; k·bits must be <= 63.
    Columns are masked to the low ``bits`` bits — pre-scale or bucket
    wider domains upstream (standard zorder practice)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"zorder_key: {k} cols x {bits} bits > 63")
    mask = (1 << bits) - 1

    def run(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        for i, c in enumerate(cols):
            x = t.column(c).to_numpy(zero_copy_only=False).astype(
                np.int64) & mask
            for b in range(bits):
                z |= ((x >> b) & 1) << (b * k + i)
        return t.append_column(out, pa.array(z))

    run.__name__ = f"zorder[{','.join(cols)}]"
    return run


# ---------------------------------------------------- range clustering (TeraSort)

def range_cut_points(ds, col: str, num_ranges: int, digits: int = 4,
                     exact: bool = True, sketch_k: int = 2048) -> list[float]:
    """Sample the ``num_ranges - 1`` equi-frequency cut points that split
    ``col`` into balanced ranges — the sampling half of the TeraSort /
    Spark RangePartitioner shape. Cuts are rounded to ``digits`` with the
    DuckDB half-away rule so the downstream assignment is bit-reproducible
    against a SQL ``round(quantile_cont(...), d)`` replay.

    ``exact=True`` uses the multi-round exact-quantile scan (deterministic,
    oracle-parity; O(B) bytes per scan to the driver). At 100 TB pass
    ``exact=False`` for the one-pass mergeable KLL sketch — same API, one
    scan, O(k log(n/k)) floats to the driver; cut placement error ~1/k of
    rank, which only skews partition sizes, never correctness (assignment
    still uses the one shared cut list).
    """
    qs = [i / num_ranges for i in range(1, num_ranges)]
    if exact:
        from ..functions.quantiles import exact_quantiles
        vals = exact_quantiles(ds, col, qs)
    else:
        from ..functions.sketch import approx_quantiles
        vals = approx_quantiles(ds, col, qs, k=sketch_k)
    from ..kernels import duck_round

    return [float(duck_round(v, digits)) for v in vals]


def assign_range(cuts: list[float], col: str, out: str = "range_id"):
    """Per-batch range assignment: ``range_id = #{cut : cut <= v}``
    (searchsorted side='right' over the sorted cut list — O(log cuts) per
    row, vectorized, no shuffle). Null/NaN values get range NULL so they
    can't silently land in range 0. SQL replay:
    ``(SELECT count(*) FROM cuts WHERE c <= value)``."""
    carr = np.asarray(sorted(cuts), dtype=np.float64)

    def run(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        rid = np.searchsorted(carr, v, side="right").astype(np.int64)
        bad = np.isnan(v)
        arr = pa.array(rid, pa.int64())
        if bad.any():
            arr = pa.array(
                np.ma.masked_array(rid, mask=bad), pa.int64(),
            )
        return t.append_column(out, arr)

    run.__name__ = f"assign_range[{col}]"
    return run


def range_partitioned_export(ds, col: str, out_dir: str,
                             cuts: list[float]):
    """Range-clustered, sorted, pruning-ready export — the write half of
    TeraSort and the ``OPTIMIZE ... SORT BY`` layout primitive: one
    bounded exchange co-locates each range, every range task sorts its
    rows by ``col`` and writes its own parquet file under
    ``out_dir/range=K/`` (distributed writes, one dir per range =
    resumable/partitioned output), and the driver records only the
    O(ranges) stats manifest ``_ranges.json`` (cuts + per-range
    rows/min/max) that ``read_range_pruned`` uses to open only the files a
    predicate can touch. Null/NaN sort keys are excluded (they carry no
    range). Gobblin analog: TimeBasedWriterPartitioner's partitioned
    output dirs (PartitionedDataWriter.java:349) with lakehouse min/max
    zone maps added. At scale, roll files inside a range by size (the
    per-range task sees its rows as one group; splitting is local)."""
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column(col)),
                    pc.invert(pc.is_nan(t.column(col))))
        ),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(assign_range(cuts, col), batch_format="pyarrow",
                  batch_size=None)

    def write_range(t: pa.Table) -> pa.Table:
        rid = int(t.column("range_id")[0].as_py())
        body = t.drop_columns(["range_id"]).sort_by([(col, "ascending")])
        d = os.path.join(out_dir, f"range={rid}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-0.parquet")
        tmp = path + ".tmp"
        pq.write_table(body, tmp, compression="zstd")
        os.replace(tmp, path)
        v = body.column(col).to_numpy(zero_copy_only=False)
        return pa.table({
            "range_id": pa.array([rid], pa.int64()),
            "path": pa.array([path], pa.string()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "vmin": pa.array([float(v[0])], pa.float64()),
            "vmax": pa.array([float(v[-1])], pa.float64()),
        })

    write_range.__name__ = "write_range"
    manifest = (
        ds.groupby("range_id")
        .map_groups(write_range, batch_format="pyarrow")
        .take_all()
    )
    manifest = sorted(manifest, key=lambda r: r["range_id"])
    os.makedirs(out_dir, exist_ok=True)
    meta = {"col": col, "cuts": [float(c) for c in cuts],
            "ranges": [{k: r[k] for k in
                        ("range_id", "path", "rows", "vmin", "vmax")}
                       for r in manifest]}
    mpath = os.path.join(out_dir, "_ranges.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, mpath)
    return meta


def read_range_pruned(out_dir: str, lo: float, hi: float):
    """Zone-map pruned read over a ``range_partitioned_export`` layout:
    consult ``_ranges.json``, open ONLY the range files whose [vmin, vmax]
    overlaps [lo, hi], apply the residual filter per batch. Returns
    ``(dataset, files_opened)`` so callers (and the pruning test) can see
    the file subset."""
    import json
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    with open(os.path.join(out_dir, "_ranges.json")) as f:
        meta = json.load(f)
    col = meta["col"]
    files = [r["path"] for r in meta["ranges"]
             if r["vmin"] <= hi and r["vmax"] >= lo]
    if not files:
        return rd.from_arrow(pa.table({col: pa.array([], pa.float64())})), []
    ds = rd.read_parquet(files)
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t.column(col), pa.scalar(float(lo))),
                    pc.less_equal(t.column(col), pa.scalar(float(hi))))
        ),
        batch_format="pyarrow", batch_size=None,
    )
    return ds, files


def weighted_sample_topk(ds, id_col: str, weight_col: str, k: int):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-Res: keep the k rows with the largest u^(1/w), u
    uniform — inclusion probability proportional to weight): the LLM
    data-mixture step "sample k documents proportional to quality/length"
    made reproducible by drawing u from the same md5(id)-prefix coin as
    ``mixture_sample_hash``, so the sample is identical across runs,
    partitionings, and cluster sizes, and exactly SQL-replayable
    (pow((md5 prefix + 0.5)/2^32, 1.0/w)).

    Scale shape: per-batch key computation (md5 per row — the documented
    Fingerprinter pattern, no Arrow kernel) + the per-block partial top-k
    (``top_k``): k rows per block cross the exchange, never the table.
    Weights must be > 0 (rows with w <= 0 or null are dropped — zero
    weight means zero inclusion probability)."""
    import hashlib

    def key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = t.column(weight_col)
        ok = pc.and_(pc.is_valid(w),
                     pc.greater(w.cast(pa.float64()), pa.scalar(0.0)))
        if not pc.all(ok).as_py():
            t = t.filter(ok)
        ids = t.column(id_col).to_pylist()
        u = (np.array(
            [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
             for v in ids], dtype=np.float64,
        ) + 0.5) / float(1 << 32)
        w = t.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "_skey", pa.array(np.power(u, 1.0 / w), pa.float64()))

    key.__name__ = "ares_key"
    keyed = ds.map_batches(key, batch_format="pyarrow", batch_size=None)
    out = top_k(keyed, k, by=["_skey", id_col], descending=[True, False])
    return out.drop_columns(["_skey"])


def _morton16(xq: "np.ndarray", yq: "np.ndarray") -> "np.ndarray":
    """Interleave two 8-bit quantized axes into a 16-bit Morton (Z-order)
    code, fully vectorized (classic bit-spread)."""
    import numpy as np

    def spread(v):
        v = v.astype(np.uint32)
        v = (v | (v << 4)) & np.uint32(0x0F0F)
        v = (v | (v << 2)) & np.uint32(0x3333)
        v = (v | (v << 1)) & np.uint32(0x5555)
        return v

    return (spread(xq) | (spread(yq) << np.uint32(1))).astype(np.int64)


def zorder_export(ds, x_col: str, y_col: str, out_dir: str,
                  num_files: int = 16):
    """Two-dimensional Z-ORDER clustering + pruning-ready export — the
    Delta/Iceberg ``OPTIMIZE ZORDER BY (x, y)`` layout primitive and the
    2-D generalization of ``range_partitioned_export`` (which prunes on
    ONE axis only): each axis is linearly quantized to 8 bits over its
    global [min, max], the two codes interleave into a 16-bit Morton
    code, rows co-locate by equal-width z-range (``z >> (16 -
    log2(num_files))``), and each file carries min/max ZONE MAPS FOR
    BOTH axes — so a predicate on EITHER column prunes files.

    Determinism/SQL-parity: the quantization is the exact float64
    expression ``least(floor((v - vmin) * 256 / (vmax - vmin)), 255)``
    and the Morton interleave is a finite bit-op sum, so the whole
    assignment replays bit-identically in DuckDB (the oracle does).
    Linear quantization is the SQL-replayable default; heavily-skewed
    axes want equi-frequency codes (swap in ``range_cut_points`` ranks —
    same export path), documented trade-off. Null/NaN on either axis is
    excluded (no cell). num_files must be a power of two <= 65536.

    Returns the O(files) stats manifest as a Dataset: (file_id, rows,
    x_min, x_max, y_min, y_max) plus the paths in ``_zorder.json``.
    """
    import json
    import os

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ray.data.aggregate import Max, Min

    if num_files & (num_files - 1) or not 1 <= num_files <= 1 << 16:
        raise ValueError("num_files must be a power of two in [1, 65536]")
    shift = 16 - int(np.log2(num_files))

    def clean(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(x_col), pa.float64())
        y = pc.cast(t.column(y_col), pa.float64())
        keep = pc.and_(
            pc.and_(pc.is_valid(x), pc.invert(pc.is_nan(x))),
            pc.and_(pc.is_valid(y), pc.invert(pc.is_nan(y))),
        )
        return pa.table({"x": x, "y": y}).filter(keep)

    # materialize once: the min/max aggregate AND the tag+write pass both
    # consume it — an unmaterialized lineage would re-execute the full
    # upstream scan twice and could quantize against different rows than
    # it writes (breaking zone-map bit-parity) under nondeterministic
    # upstreams
    cleaned = ds.map_batches(clean, batch_format="pyarrow",
                             batch_size=None).materialize()
    stats = cleaned.aggregate(Min("x"), Max("x"), Min("y"), Max("y"))
    if not stats or stats.get("min(x)") is None or stats.get("min(y)") is None:
        raise ValueError(
            "zorder_export: no rows left after the null/NaN filter — "
            "nothing to cluster"
        )
    xmin, xmax = float(stats["min(x)"]), float(stats["max(x)"])
    ymin, ymax = float(stats["min(y)"]), float(stats["max(y)"])
    xspan = (xmax - xmin) or 1.0
    yspan = (ymax - ymin) or 1.0

    def tag(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        xq = np.minimum(np.floor((x - xmin) * 256.0 / xspan), 255.0)
        yq = np.minimum(np.floor((y - ymin) * 256.0 / yspan), 255.0)
        z = _morton16(xq.astype(np.uint32), yq.astype(np.uint32))
        return t.append_column("_z", pa.array(z)).append_column(
            "file_id", pa.array(z >> shift))

    def write_cell(t: pa.Table) -> pa.Table:
        fid = int(t.column("file_id")[0].as_py())
        body = t.sort_by([("_z", "ascending")])
        path = os.path.join(out_dir, f"z-{fid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(body.drop_columns(["_z", "file_id"]), tmp,
                       compression="zstd")
        os.replace(tmp, path)
        x = body.column("x").to_numpy(zero_copy_only=False)
        y = body.column("y").to_numpy(zero_copy_only=False)
        return pa.table({
            "file_id": pa.array([fid], pa.int64()),
            "path": pa.array([path], pa.string()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "x_min": pa.array([float(x.min())], pa.float64()),
            "x_max": pa.array([float(x.max())], pa.float64()),
            "y_min": pa.array([float(y.min())], pa.float64()),
            "y_max": pa.array([float(y.max())], pa.float64()),
        })

    write_cell.__name__ = "write_zorder_cell"
    os.makedirs(out_dir, exist_ok=True)
    manifest = (
        cleaned.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("file_id")
        .map_groups(write_cell, batch_format="pyarrow")
        .take_all()
    )  # O(files) rows
    manifest = sorted(manifest, key=lambda r: r["file_id"])
    with open(os.path.join(out_dir, "_zorder.json"), "w") as fh:
        json.dump({"x_col": x_col, "y_col": y_col, "num_files": num_files,
                   "x_minmax": [xmin, xmax], "y_minmax": [ymin, ymax],
                   "files": manifest}, fh)
    import ray.data as rd

    return rd.from_items(manifest)


def read_zorder_pruned(out_dir: str, x_range=None, y_range=None):
    """Zone-map file pruning over a ``zorder_export`` layout: open ONLY
    the files whose per-file min/max intersects the given inclusive
    range(s) on either or both axes — the read half that makes 2-D
    clustering pay. Returns (dataset, files_opened, files_total); the
    residual filter still applies (zone maps prune files, not rows)."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(out_dir, "_zorder.json")) as fh:
        meta = json.load(fh)
    files = meta["files"]
    picked = []
    for f in files:
        if x_range and (f["x_max"] < x_range[0] or f["x_min"] > x_range[1]):
            continue
        if y_range and (f["y_max"] < y_range[0] or f["y_min"] > y_range[1]):
            continue
        picked.append(f["path"])
    if not picked:
        return None, 0, len(files)
    return rd.read_parquet(picked), len(picked), len(files)
