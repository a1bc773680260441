"""Fork operator: 1 -> N branch routing (Gobblin ForkOperator analog,
gobblin-api/.../fork/ForkOperator.java:36-71 — a demultiplexer over a
per-record boolean vector; branches then run their own converter chains
and writers, gobblin-runtime/.../fork/Fork.java:190-219).

Ray-native shapes:
- ``fork(ds, branches)``: N filtered views of one lazy Dataset. Each branch
  re-executes the upstream pipeline on consumption — fine when upstream is a
  cheap read; materialize upstream first (small data) or prefer
  ``fork_partitioned_write`` (one pass) when it isn't.
- ``route_column`` + ``fork_partitioned_write``: single-pass routing by
  writing a computed ``branch`` column as a partition directory — the
  PartitionedDataWriter composition.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc


def fork(ds, branches: dict[str, Callable[[pa.Table], pa.ChunkedArray]]) -> dict:
    """N named filtered datasets from one source (lazy views)."""
    out = {}
    for name, pred in branches.items():
        def make(p):
            def f(t: pa.Table) -> pa.Table:
                return t.filter(pc.fill_null(p(t), False))

            f.__name__ = "fork_filter"
            return f

        out[name] = ds.map_batches(make(pred), batch_format="pyarrow", batch_size=None)
    return out


def multicast_column(
    branches: dict[str, Callable[[pa.Table], pa.ChunkedArray]],
    default: str | None = None,
    out: str = "branch",
):
    """One-pass DUPLICATING fork (the actual ForkOperator contract,
    ForkOperator.java:36-71: forkDataRecord returns a per-record boolean
    vector — a record can flow to SEVERAL branches): emit each row once
    per matching branch with a ``branch`` label column. Rows matching no
    branch go to ``default`` (or are dropped when default is None).

    Vectorized: one predicate evaluation per branch over the whole batch,
    one ``take`` per branch, one concat — the input is scanned ONCE
    regardless of branch count (unlike ``fork()``'s N filtered views).
    Compose with ``PartitionedParquetSink``/``write_parquet(partition_cols
    =["branch"])`` for the single-pass fork-and-write."""

    def run(t: pa.Table) -> pa.Table:
        import numpy as np

        parts: list[pa.Table] = []
        matched = np.zeros(t.num_rows, dtype=bool)
        for name, pred in branches.items():
            m = pc.fill_null(pred(t), False).to_numpy(zero_copy_only=False)
            matched |= m
            idx = np.flatnonzero(m)
            if len(idx):
                piece = t.take(pa.array(idx))
                parts.append(piece.append_column(
                    out, pa.array(np.full(len(idx), name, dtype=object), pa.string())
                ))
        if default is not None:
            idx = np.flatnonzero(~matched)
            if len(idx):
                piece = t.take(pa.array(idx))
                parts.append(piece.append_column(
                    out, pa.array(np.full(len(idx), default, dtype=object), pa.string())
                ))
        if not parts:
            return t.slice(0, 0).append_column(out, pa.array([], pa.string()))
        return pa.concat_tables(parts)

    run.__name__ = "multicast"
    return run


def fork_multicast(ds, branches, default: str | None = None, out: str = "branch"):
    """Dataset-level duplicating fork: one scan, rows replicated per
    matching branch, labeled by ``out``. Downstream: filter by label,
    group by it, or partition-write on it."""
    return ds.map_batches(
        multicast_column(branches, default, out),
        batch_format="pyarrow", batch_size=None,
    )


def route_column(
    branches: dict[str, Callable[[pa.Table], pa.ChunkedArray]],
    default: str = "rest",
    out: str = "branch",
):
    """Batch fn adding a ``branch`` column = first matching branch name."""

    def run(t: pa.Table) -> pa.Table:
        import numpy as np

        label = np.full(t.num_rows, default, dtype=object)
        unset = np.ones(t.num_rows, dtype=bool)
        for name, pred in branches.items():
            m = pc.fill_null(pred(t), False).to_numpy(zero_copy_only=False)
            sel = m & unset
            label[sel] = name
            unset &= ~m
        return t.append_column(out, pa.array(label, pa.string()))

    run.__name__ = "route"
    return run


def fork_partitioned_write(ds, branches, out_dir: str, default: str = "rest"):
    """Single-pass fork: route + partitioned Parquet write (one directory
    per branch) — at scale this is the right fork: no N re-reads."""
    routed = ds.map_batches(
        route_column(branches, default), batch_format="pyarrow", batch_size=None
    )
    routed.write_parquet(out_dir, partition_cols=["branch"])
    return out_dir
