"""Secondary Bloom-filter index for equality predicates on non-key columns.

Iceberg Puffin-blob / Parquet column-bloom analog, adapted to the lake's
merge-on-read layout:

* Blooms are built per DATA FILE (base or delta), over the indexed
  column's raw values in that file.  Files are immutable, so a file's
  bloom is valid forever — a rebuild at a later epoch recomputes only
  files it has not seen (incremental by construction), and rows for
  files no longer referenced are dropped.
* Pruning is per BUCKET, never per file: a merged winner row is some
  file row verbatim (LWW picks a version, it never recombines values),
  so if NO file of a bucket can contain ``col == v`` the bucket cannot
  produce a live row with ``col == v`` — the whole bucket is skipped.
  Skipping individual FILES would be unsafe for the same reason
  min-side ts pruning is (see stats.py): dropping the file that holds
  the winning newer version or tombstone resurrects a stale row that
  the equality filter would then KEEP.
* A bucket with ANY unindexed file is unprunable (fail open).  Nulls
  are not indexed and ``eq`` never prunes on a null probe (the
  post-merge filter semantics are SQL ``=``, null never matches).

Sidecar layout: ``<lake>/_stats/bloom.parquet`` with one row per
(file, column): relative path, column, m_bits, k, bitset (binary).
Atomic tmp+rename replace; readers tolerate its absence (no pruning).

Bloom math: double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher),
h1/h2 from the repo's splitmix64 family over hash_column_u64 values;
m is sized from the file's row count for ~1% FP at 10 bits/row.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .functions.sketch import _splitmix64, hash_column_u64

BLOOM_FILE = "bloom.parquet"
_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def bloom_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_stats", BLOOM_FILE)


def _size_bits(n_rows: int) -> int:
    """~10 bits/value (FP ≈ 1% at k=7), rounded up to a 64-bit word,
    floor 1024 bits so tiny files don't degenerate."""
    return max(1024, ((n_rows * 10 + 63) // 64) * 64)


def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing — vectorized."""
    h1 = h
    h2 = _splitmix64(h ^ _H2_SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(
            np.int64
        )


def _build_bitset(values: pa.ChunkedArray | pa.Array, m: int,
                  k: int) -> bytes:
    words = np.zeros(m // 64, dtype=np.uint64)
    vals = pc.drop_null(values)
    if len(vals):
        h = hash_column_u64(
            vals.combine_chunks() if isinstance(vals, pa.ChunkedArray)
            else vals
        )
        pos = _positions(h, m, k).ravel()
        np.bitwise_or.at(words, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
    return words.tobytes()


def might_contain(bitset: bytes, m: int, k: int, value) -> bool:
    """Bloom membership probe for one (non-null) scalar."""
    words = np.frombuffer(bitset, dtype=np.uint64)
    h = hash_column_u64(pa.array([value]))
    pos = _positions(h, m, k)[0]
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return bool(bits.all())


def build_bloom_index(eng, columns: list[str], k: int = 7,
                      manifest=None) -> dict:
    """(Re)build the bloom sidecar for ``columns`` at the head manifest.

    Incremental: per-file rows already present in the sidecar are
    REUSED (files are immutable); only (file, column) pairs not yet
    indexed are computed — one distributed pass reading ONLY the
    indexed columns of the new files.  Returns
    {files_total, files_computed, files_reused, columns}.
    """
    import ray.data as rd

    manifest = manifest or eng.store.latest()
    base = os.path.abspath(eng.lake_dir)
    # metadata-only renames: a file may store the indexed column under
    # its pre-rename name — read that; a file predating the column
    # entirely gets an empty bloom (it can only hold nulls for it)
    stored_for = {cur: old for old, cur in manifest.column_renames.items()}
    file_map = eng.bucket_file_map(manifest)
    live = {
        os.path.relpath(p, base)
        for files in file_map.values() for p in files
    }
    old: dict[tuple[str, str], dict] = {}
    path = bloom_path(eng.lake_dir)
    if os.path.exists(path):
        for row in pq.read_table(path).to_pylist():
            if row["path"] in live:
                old[(row["path"], row["col"])] = row
    todo = [
        {"path": rel, "col": c}
        for rel in sorted(live) for c in columns
        if (rel, c) not in old
    ]

    def build(t: pa.Table) -> pa.Table:
        out = {"path": [], "col": [], "m_bits": [], "k": [], "bitset": []}
        for rel, c in zip(t.column("path").to_pylist(),
                          t.column("col").to_pylist()):
            fp = os.path.join(base, rel)
            avail = pq.read_schema(fp).names
            name = c if c in avail else stored_for.get(c)
            if name in avail:
                col = pq.read_table(fp, columns=[name]).column(name)
                m = _size_bits(len(col))
                bits = _build_bitset(col, m, k)
            else:
                # file predates the column (schema evolution): it can
                # only hold nulls for it -> empty bloom, never matches
                m = 1024
                bits = np.zeros(m // 64, dtype=np.uint64).tobytes()
            out["path"].append(rel)
            out["col"].append(c)
            out["m_bits"].append(m)
            out["k"].append(k)
            out["bitset"].append(bits)
        return pa.table(
            {
                "path": pa.array(out["path"], pa.string()),
                "col": pa.array(out["col"], pa.string()),
                "m_bits": pa.array(out["m_bits"], pa.int64()),
                "k": pa.array(out["k"], pa.int64()),
                "bitset": pa.array(out["bitset"], pa.binary()),
            }
        )

    build.__name__ = "bloom_build"
    new_rows: list[pa.Table] = []
    if todo:
        ds = rd.from_items(todo).map_batches(
            build, batch_format="pyarrow", batch_size=16
        )
        new_rows = [b for b in ds.iter_batches(batch_format="pyarrow")
                    if b.num_rows]
    keep = pa.Table.from_pylist(
        list(old.values()),
        schema=pa.schema(
            [("path", pa.string()), ("col", pa.string()),
             ("m_bits", pa.int64()), ("k", pa.int64()),
             ("bitset", pa.binary())]
        ),
    ) if old else None
    parts = ([keep] if keep is not None else []) + new_rows
    tbl = pa.concat_tables(parts) if parts else pa.Table.from_pylist(
        [], schema=pa.schema(
            [("path", pa.string()), ("col", pa.string()),
             ("m_bits", pa.int64()), ("k", pa.int64()),
             ("bitset", pa.binary())]
        )
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return {
        "files_total": len(live),
        "entries_computed": len(todo),
        "entries_reused": len(old),
        "columns": list(columns),
    }


def load_bloom(lake_dir: str,
               col: str | None = None) -> dict[tuple[str, str], dict] | None:
    """The sidecar as {(relpath, col): row}, or None if never built.

    ``col`` pushes a row filter into the parquet scan — a probe loads
    only that column's bitsets (the sidecar is O(files x columns x
    bits/8) on disk; at fleet scale a reader must not page all of it)."""
    path = bloom_path(lake_dir)
    if not os.path.exists(path):
        return None
    filters = [("col", "==", col)] if col is not None else None
    return {
        (r["path"], r["col"]): r
        for r in pq.read_table(path, filters=filters).to_pylist()
    }


def prunable_buckets(eng, manifest, col: str, value) -> set[int] | None:
    """Bucket ids that CANNOT contain ``col == value`` (safe to skip).

    None when the index is absent or the probe is null (no pruning).
    A bucket with any unindexed file fails open (not prunable).
    """
    if value is None:
        return None
    idx = load_bloom(eng.lake_dir, col=col)
    if idx is None:
        return None
    base = os.path.abspath(eng.lake_dir)
    out: set[int] = set()
    for b, files in eng.bucket_file_map(manifest).items():
        skip = True
        for p in files:
            row = idx.get((os.path.relpath(p, base), col))
            if row is None:
                skip = False  # unindexed file: fail open
                break
            if might_contain(row["bitset"], row["m_bits"], row["k"], value):
                skip = False
                break
        if skip:
            out.add(b)
    return out
