"""Shared vectorized kernels used by several operators.

``runlength_join`` is the sorted-group string-assembly kernel under the
inverted index and the string-agg aggregate (and the same run-length idiom
the repetition signals use for counting): ONE lexsort + run-boundary pass
builds every group's joined value list with no per-group Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def runlength_join(group: np.ndarray, values: np.ndarray, sep: str,
                   cap: int | None = None):
    """Sort (group, value) pairs by their RAW types (numeric values sort
    numerically), then join each group's sorted values into one string.

    Returns ``(group_firsts, exact_counts, joined)`` — ``cap`` truncates
    each joined list to its first ``cap`` values while ``exact_counts``
    stays exact (the inverted index's stopword head-truncation). int32
    list offsets bound a single partition's joined payload at 2^31 values
    — far above any bounded-partition budget."""
    order = np.lexsort((values, group))
    g, v = group[order], values[order]
    new_run = np.ones(len(g), bool)
    new_run[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(new_run)
    counts = np.diff(np.append(starts, len(g)))
    if cap is not None:
        rank = np.arange(len(g)) - np.repeat(starts, counts)
        v = v[rank < cap]
        kept_counts = np.minimum(counts, cap)
    else:
        kept_counts = counts
    offsets = np.concatenate([[0], np.cumsum(kept_counts)])
    vals = pc.cast(pa.array(v), pa.string())
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
    return g[starts], counts, pc.binary_join(la, sep)


def duck_round(v, digits: int) -> np.ndarray:
    """DuckDB-bit-exact round: half AWAY from zero via the same double-op
    sequence DuckDB uses (x*10^d, std::round, /10^d), so hash comparison
    against an oracle matches to the last ULP. numpy ``rint`` is
    banker's-rounding and diverges on exact halves — never use it on a
    value that crosses an oracle hash. The ONE shared definition: every
    operator that rounds for SQL parity must call this (a local copy that
    later diverges silently breaks the oracle hash of every OTHER site)."""
    v = np.asarray(v, np.float64)
    p = float(10**digits)
    return np.copysign(np.floor(np.abs(v) * p + 0.5), v) / p


def content_fingerprint(table: pa.Table) -> str:
    """Deterministic 16-hex content name for an Arrow table: md5 over its
    serialized IPC stream. The ONE definition behind every idempotent
    sink/index file name (parquet sinks, ORC blocks, dedup/IVF-PQ index
    runs): a retried task reproduces the same bytes -> same name -> safe
    overwrite, never a duplicate file. Callers that shuffle must sort
    BEFORE fingerprinting (group row order is shuffle-dependent). A local
    copy that later diverges silently breaks the idempotence of every
    other site — always call this."""
    import hashlib

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return hashlib.md5(sink.getvalue().to_pybytes()).hexdigest()[:16]
