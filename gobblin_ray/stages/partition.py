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
