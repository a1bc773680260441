"""Actor-pool Parquet sink stage (SURVEY §2.2).

Gobblin analogs:
- ``PartitionedDataWriter`` (gobblin-core/.../writer/PartitionedDataWriter
  .java:80-360): route each record via a partitioner to a per-partition
  child writer — here each batch is split by the partition column and each
  slice written to its partition directory.
- ``AsyncWriterManager`` / ``BufferedAsyncDataWriter``
  (gobblin-core-base/.../writer/AsyncWriterManager.java): the async sink
  pool — here a ``map_batches`` actor pool: writer state (compression,
  filesystem handles) initialized once per actor, one write per batch.
- ``FsDataWriter`` staging semantics (FsDataWriter.java:108-270): files are
  written via tmp + atomic rename, and the NAME is a content fingerprint,
  so a retried task overwrites the same file — idempotent under Ray task
  retries (speculative-attempt-safe without attempt-id directories).

Usage::

    lineage = ds.map_batches(
        PartitionedParquetSink,
        fn_constructor_kwargs=dict(out_dir=..., partition_col="date_part"),
        batch_size=64 * 1024, concurrency=8, batch_format="pyarrow",
    )
    lineage.count()   # drives the write; rows are (partition, path, rows)

The returned lineage rows are the DataWriter recordsWritten/bytesWritten
accounting (DataWriter.java:41-125). For the CDC lake's exactly-once
two-phase commit use checkpoint.staging_path + promote instead — this sink
is the general partitioned-output surface (one file per batch x partition;
size batches so files land near the target file size).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


class PartitionedParquetSink:
    """Callable actor class: write each batch's partitions to Parquet."""

    def __init__(
        self,
        out_dir: str,
        partition_col: str | None = None,
        compression: str = "zstd",
        compression_level: int = 3,
    ):
        self.out_dir = out_dir
        self.partition_col = partition_col
        self.compression = compression
        self.level = compression_level
        os.makedirs(out_dir, exist_ok=True)

    def _fingerprint(self, table: pa.Table) -> str:
        """Deterministic content name: md5 over the serialized batch. A
        retried task reproduces the same bytes -> same name -> idempotent
        overwrite (never a duplicate file)."""
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
        return hashlib.md5(sink.getvalue().to_pybytes()).hexdigest()[:16]

    def _write_one(self, table: pa.Table, part_dir: str) -> dict:
        os.makedirs(part_dir, exist_ok=True)
        name = f"part-{self._fingerprint(table)}.parquet"
        path = os.path.join(part_dir, name)
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(
            table, tmp, compression=self.compression,
            compression_level=self.level,
        )
        os.replace(tmp, path)
        return {
            "partition": os.path.basename(part_dir),
            "path": path,
            "rows": table.num_rows,
            "bytes": os.path.getsize(path),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        if self.partition_col is None:
            out.append(self._write_one(batch, self.out_dir))
        else:
            col = batch.column(self.partition_col)
            for v in pc.unique(col).to_pylist():
                if v is None:
                    mask = pc.is_null(col)
                    label = "__null__"
                else:
                    mask = pc.equal(col, pa.scalar(v))
                    label = str(v)
                part = batch.filter(pc.fill_null(mask, False))
                out.append(
                    self._write_one(
                        part, os.path.join(self.out_dir, f"{self.partition_col}={label}")
                    )
                )
        return pa.table(
            {
                "partition": pa.array([r["partition"] for r in out], pa.string()),
                "path": pa.array([r["path"] for r in out], pa.string()),
                "rows": pa.array([r["rows"] for r in out], pa.int64()),
                "bytes": pa.array([r["bytes"] for r in out], pa.int64()),
            }
        )
