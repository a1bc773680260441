"""Writer partitioners: derive partition columns from record fields, then
write partitioned Parquet (Gobblin PartitionedDataWriter +
TimeBasedWriterPartitioner analog,
gobblin-core/.../writer/partitioner/TimeBasedWriterPartitioner.java:59-207 —
partition path from a record timestamp; PartitionedDataWriter routes each
record to a cached per-partition writer :349).

Ray-native: a computed partition column via vectorized pc kernels + one
``write_parquet(partition_cols=[...])`` — the writer cache, file naming and
parallel flush all come from Ray Data's sink."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def key_partition(kcol: pa.ChunkedArray | pa.Array, num_partitions: int):
    """Bounded partition id per key value: ``hash(key) % P`` as int32 —
    the one dispatch-bounding idiom every keyed operator here shares
    (as-of join, session windows): never group by the raw key (per-key
    Python dispatch), always by this. Integers partition by value
    (deterministic, no hashing needed for dispatch bounding); strings by
    pandas' fixed-key siphash."""
    import numpy as np
    import pandas as pd

    if pa.types.is_integer(kcol.type):
        return (
            kcol.to_numpy(zero_copy_only=False).astype(np.int64)
            % num_partitions
        ).astype(np.int32)
    arr = kcol.to_pandas().to_numpy(dtype=object, na_value=None)
    return (
        pd.util.hash_array(arr, categorize=False) % num_partitions
    ).astype(np.int32)


def time_partition(field: str, granularity: str = "day", out: str = "date_part"):
    """Add a string partition column derived from a timestamp column.

    granularity: 'year' | 'month' | 'day' | 'hour'
    """
    fmt = {
        "year": "%Y",
        "month": "%Y-%m",
        "day": "%Y-%m-%d",
        "hour": "%Y-%m-%d-%H",
    }[granularity]

    def run(t: pa.Table) -> pa.Table:
        return t.append_column(out, pc.strftime(t.column(field), format=fmt))

    run.__name__ = f"time_partition[{field}:{granularity}]"
    return run


def write_time_partitioned(
    ds, out_dir: str, field: str, granularity: str = "day"
) -> str:
    """One-pass partitioned write: resumable layout (a rerun can skip
    finished partition dirs) — the 'resumable output' posture."""
    part = time_partition(field, granularity)
    ds.map_batches(part, batch_format="pyarrow", batch_size=None).write_parquet(
        out_dir, partition_cols=["date_part"]
    )
    return out_dir


def keyed_map_groups(ds, key: str, fn, num_partitions: int = 64,
                     batch_format: str = "pandas",
                     drop_null_keys: bool = True, pre=None):
    """Bounded-partition grouped apply — the shared shape under the window
    analytics / grouped quantiles / string-agg / outer-join family: ONE
    exchange on ``hash(key) % num_partitions`` (never per-key dispatch),
    then ``fn`` once per partition with the routing column already
    stripped. ``drop_null_keys`` filters null keys at the tag stage (SQL
    window/group semantics vary; make the policy explicit per operator);
    ``pre`` is an optional per-batch pyarrow filter/transform applied
    before tagging. Partitioning assumption: one partition fits a worker —
    raise ``num_partitions`` at scale."""
    import pyarrow as pa
    import pyarrow.compute as pc

    P = num_partitions

    def tag(t: pa.Table) -> pa.Table:
        if pre is not None:
            t = pre(t)
        if drop_null_keys:
            t = t.filter(pc.is_valid(t.column(key)))
        return t.append_column("_kp", pa.array(key_partition(t.column(key), P)))

    tag.__name__ = f"tag_kp[{key}]"

    def wrapped(g):
        g = g.drop(columns=["_kp"]) if batch_format == "pandas" else (
            g.drop_columns(["_kp"])
        )
        return fn(g)

    wrapped.__name__ = getattr(fn, "__name__", "keyed_fn")
    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_kp").map_groups(wrapped, batch_format=batch_format)
