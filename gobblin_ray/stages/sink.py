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
from ray.data import Datasink


def _label(v) -> str:
    """Directory-safe partition label: URL-quote everything outside
    [A-Za-z0-9._-] (the Hive writer's escaping) — a raw str(value) holding
    '/' or '..' would escape the partition layout (or out_dir entirely)."""
    from urllib.parse import quote

    return quote(str(v), safe="._-")


def _split_by_partition(table: pa.Table, col: str) -> list[tuple[str, pa.Table]]:
    """(label, slice) per distinct partition value; nulls land in
    '__null__', float NaNs in '__nan__' (``pc.equal(c, NaN)`` matches
    NOTHING, so NaN rows used to vanish from the output entirely). Shared
    by both sinks so label formatting and null/NaN masking can never
    diverge between the actor-pool and Datasink paths."""
    out: list[tuple[str, pa.Table]] = []
    c = table.column(col)
    for v in pc.unique(c).to_pylist():
        if v is None:
            mask, label = pc.is_null(c), "__null__"
        elif isinstance(v, float) and v != v:  # NaN
            mask, label = pc.is_nan(c), "__nan__"
        else:
            mask, label = pc.equal(c, pa.scalar(v)), _label(v)
        out.append((label, table.filter(pc.fill_null(mask, False))))
    return out


class PartitionedParquetSink:
    """Callable actor class: write each batch's partitions to Parquet.

    CAVEAT: file names are pure content fingerprints (retry-idempotent),
    so two DISTINCT batches with byte-identical content collapse into one
    file. Data that can legitimately contain duplicated batches should go
    through ``write_partitioned`` (the Datasink), whose names carry the
    write-task index and never collide across tasks."""

    def __init__(
        self,
        out_dir: str,
        partition_col: str | None = None,
        compression: str = "zstd",
        compression_level: int = 3,
        file_format: str = "parquet",
    ):
        if file_format not in ("parquet", "orc", "csv", "jsonl"):
            raise ValueError(f"unsupported file_format {file_format!r}")
        self.out_dir = out_dir
        self.partition_col = partition_col
        self.compression = compression
        self.level = compression_level
        self.file_format = file_format  # orc: gobblin-orc writer analog
        os.makedirs(out_dir, exist_ok=True)

    def _fingerprint(self, table: pa.Table) -> str:
        """Deterministic content name (shared kernels.content_fingerprint):
        a retried task reproduces the same bytes -> same name ->
        idempotent overwrite (never a duplicate file)."""
        from ..kernels import content_fingerprint

        return content_fingerprint(table)

    def _write_one(self, table: pa.Table, part_dir: str,
                   suffix: str = "") -> dict:
        os.makedirs(part_dir, exist_ok=True)
        name = f"part-{self._fingerprint(table)}{suffix}.{self.file_format}"
        path = os.path.join(part_dir, name)
        tmp = f"{path}.tmp-{os.getpid()}"
        if self.file_format == "orc":
            import pyarrow.orc as orc

            # pyarrow.orc supports these codecs natively; anything else
            # must fail loudly, not silently fall back. (gzip callers:
            # ORC's deflate codec is spelled 'zlib'.) ORC has no per-codec
            # level knob in pyarrow, so compression_level is parquet-only.
            supported = {"uncompressed", "snappy", "zlib", "lz4", "zstd"}
            if self.compression not in supported:
                raise ValueError(
                    f"ORC does not support compression {self.compression!r};"
                    f" pick one of {sorted(supported)}"
                )
            orc.write_table(table, tmp, compression=self.compression)
        elif self.file_format == "csv":
            import pyarrow.csv as pacsv

            # CsvDataWriter analog; compression applies at the parquet/orc
            # formats only (gzip-wrapping CSV is the compress_column
            # converter's job)
            pacsv.write_csv(table, tmp)
        elif self.file_format == "jsonl":
            # newline-delimited JSON (JsonWriter analog) — pyarrow has no
            # JSON writer; pandas to_json(lines=True) is the vectorized path
            with open(tmp, "w") as f:
                table.to_pandas().to_json(f, orient="records", lines=True,
                                          date_format="iso")
        else:
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
            for label, part in _split_by_partition(batch, self.partition_col):
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


class SizedPartitionedParquetSink(Datasink):
    """Size-targeted partitioned Parquet sink (``ray.data.Datasink``): the
    scale answer to the one-file-per-batch-x-partition small-file storm.

    The reference ``PartitionedDataWriter`` caches a child writer per
    partition and rolls files by size (PartitionedDataWriter.java:349);
    here each WRITE TASK accumulates per-partition buffers across all the
    blocks it receives and flushes a file only when the buffered Arrow
    bytes reach ``target_file_bytes`` — plus one remainder flush when the
    task's block stream ends. Files per partition ~= max(tasks,
    partition_bytes / target) instead of #batches. File names are content
    fingerprints, so a retried (or speculative) task rewrites identical
    files — idempotent like the map_batches sink above.

    Use via ``write_partitioned(ds, ...)`` below; lineage (partition,
    path, rows, bytes) is aggregated on the driver by
    ``on_write_complete`` and available as ``sink.lineage`` afterward.
    """

    def __init__(
        self,
        out_dir: str,
        partition_col: str | None = None,
        target_file_bytes: int = 128 * 1024 * 1024,
        compression: str = "zstd",
        compression_level: int = 3,
        min_rows_per_write: int | None = 64 * 1024,
        file_format: str = "parquet",
    ):
        self.out_dir = out_dir
        self.partition_col = partition_col
        self.target = target_file_bytes
        self._writer = PartitionedParquetSink(
            out_dir, partition_col=None, compression=compression,
            compression_level=compression_level, file_format=file_format,
        )
        # Ray bundles at least this many input rows into ONE write task —
        # without it each task sees a single block and per-task rolling
        # can't merge anything. Size it ~ target_file_bytes / avg row
        # bytes so one task's stream spans at least one output file.
        self._min_rows_per_write = min_rows_per_write
        self.lineage: list[dict] = []

    # -- Datasink protocol -------------------------------------------
    def get_name(self) -> str:
        return "SizedPartitionedParquet"

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    @property
    def min_rows_per_write(self):
        return self._min_rows_per_write

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)

    def _part_dir(self, label: str) -> str:
        if self.partition_col is None:
            return self.out_dir
        return os.path.join(self.out_dir, f"{self.partition_col}={label}")

    def write(self, blocks, ctx) -> list[dict]:
        import pandas as pd

        buf: dict[str, list[pa.Table]] = {}
        sizes: dict[str, int] = {}
        out: list[dict] = []
        flush_no: dict[str, int] = {}
        # ctx.task_index in the name: retry-stable (a retried task keeps
        # its index) AND distinct across tasks — pure content fingerprints
        # collapse two DIFFERENT tasks' identical batches into one file
        # (silent row loss on legitimately duplicated data)
        task_idx = getattr(ctx, "task_idx", None)
        if task_idx is None:
            task_idx = getattr(ctx, "task_index", 0)

        def flush(label: str):
            tables = buf.pop(label, None)
            if not tables:
                return
            sizes.pop(label, None)
            merged = pa.concat_tables(tables)
            n = flush_no.get(label, 0)
            flush_no[label] = n + 1
            out.append(self._writer._write_one(
                merged, self._part_dir(label), suffix=f"-t{task_idx}-{n}"
            ))

        for block in blocks:
            if isinstance(block, pd.DataFrame):
                block = pa.Table.from_pandas(block, preserve_index=False)
            if self.partition_col is None:
                slices = [("", block)]
            else:
                slices = _split_by_partition(block, self.partition_col)
            for label, part in slices:
                if part.num_rows == 0:
                    continue
                buf.setdefault(label, []).append(part)
                sizes[label] = sizes.get(label, 0) + part.nbytes
                if sizes[label] >= self.target:
                    flush(label)
        for label in list(buf):
            flush(label)
        return out

    def on_write_complete(self, write_result) -> None:
        for rows in write_result.write_returns:
            self.lineage.extend(rows)

    def on_write_failed(self, error: Exception) -> None:
        pass


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    **kw,
):
    """Write ``ds`` as size-targeted partitioned Parquet; returns the
    lineage rows (partition, path, rows, bytes) — the DataWriter
    recordsWritten/bytesWritten accounting."""
    sink = SizedPartitionedParquetSink(
        out_dir, partition_col=partition_col,
        target_file_bytes=target_file_bytes, **kw,
    )
    ds.write_datasink(sink)
    return sink.lineage


def export_csv(ds, out_dir: str, **kw):
    """Text-format export sink: CSV directory (one file per block —
    Gobblin's SimpleDataWriter/CsvWriter posture, gobblin-core/.../writer/
    SimpleDataWriter.java, where a job's sink is a line-oriented text
    format rather than Parquet). Ray Data's native distributed writer —
    each block streams to its own file, no driver materialization. Use
    for interchange with line-oriented consumers; Parquet remains the
    lake format (typed, compressed, prunable).

    Engine CSV dialect: values are always quoted (``all_valid``) and
    NULL is the unquoted empty field — so NULL vs empty-string survives
    the text round trip through read_csv_source (the pyarrow default
    dialect collapses both to ``''``). Pass your own
    ``arrow_csv_args_fn`` to opt out for an external consumer
    (WriteOptions is a Cython object that cannot pickle, hence the
    worker-side factory rather than a plain kwarg)."""
    os.makedirs(out_dir, exist_ok=True)
    if "arrow_csv_args_fn" not in kw:
        def _dialect():
            import pyarrow.csv as pacsv
            return {"write_options":
                    pacsv.WriteOptions(quoting_style="all_valid")}
        kw["arrow_csv_args_fn"] = _dialect
    ds.write_csv(out_dir, **kw)
    return out_dir


def export_jsonl(ds, out_dir: str, **kw):
    """Text-format export sink: newline-delimited JSON directory (the
    JsonWriter analog; same per-block distributed write as export_csv).
    Ray Data writes one JSON object per row."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir, **kw)
    return out_dir


def export_orc(ds, out_dir: str, compression: str = "zstd"):
    """ORC export sink — write-side parity with ``read_orc_source``
    (GobblinOrcWriter analog,
    gobblin-modules/gobblin-orc/.../writer/GobblinOrcWriter.java). Ray
    Data ships no ORC writer, so each block writes ONE ORC file via
    pyarrow.orc inside a distributed Ray task: tmp + atomic rename under
    a name carrying BOTH the block ordinal and the content fingerprint —
    the ordinal keeps two byte-identical blocks from collapsing into one
    file (round-4 advisor finding: the old content-only name silently
    lost rows on content-equal blocks while the lineage still reported
    both), while the fingerprint keeps a retried task idempotent (same
    ordinal + same content -> same name -> overwrite). The dataset is
    materialized and its block refs enumerated on the driver (O(blocks)
    work, the lineage posture every sink here has); stale blocks clear
    first so a re-run can't double-count. Returns the (path, rows)
    lineage as a small Dataset."""
    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    # stale-output clearing (the shuffle_shard_export invariant): a prior
    # run's blocks this run won't rewrite would silently fold into the
    # next read_orc_source scan and double-count
    for f in os.listdir(out_dir):
        if f.startswith(("block-", ".block-")):
            os.remove(os.path.join(out_dir, f))

    @ray.remote(num_cpus=0.5)
    def write_block(t: pa.Table, ordinal: int) -> dict:
        from pyarrow import orc

        from ..kernels import content_fingerprint

        if t.num_rows == 0:
            return {"path": "", "rows": 0}
        fp = content_fingerprint(t)
        path = os.path.join(out_dir, f"block-{ordinal:05d}-{fp}.orc")
        # tmp name must NOT end in .orc: read_orc_source globs on the
        # suffix, and a crashed attempt's partial tmp would poison reads
        tmp = os.path.join(
            out_dir, f".block-{ordinal:05d}-{fp}.tmp-{os.getpid()}"
        )
        orc.write_table(t, tmp, compression=compression)
        os.replace(tmp, path)
        return {"path": path, "rows": t.num_rows}

    refs = ds.materialize().to_arrow_refs()
    lineage = [
        r for r in ray.get(
            [write_block.remote(ref, i) for i, ref in enumerate(refs)]
        )
        if r["rows"] > 0
    ]
    return rd.from_items(lineage or [{"path": "", "rows": 0}])


def shuffle_shard_export(
    ds,
    out_dir: str,
    n_shards: int,
    key_col: str,
    salt: str = "",
    columns: list[str] | None = None,
    file_format: str = "parquet",
):
    """Deterministic shuffle-and-shard export — the canonical LAST step of
    a training-data pipeline: give every row a reproducible pseudo-random
    coin (md5 of ``key:salt`` — the repo's shared SQL-reproducible coin),
    route it to ``coin % n_shards``, and write ONE parquet file per shard
    with rows in coin order (random order within the shard, globally
    disjoint + exhaustive shards). Reproducible across runs, partitionings
    and cluster sizes — re-running an interrupted export rewrites the same
    bytes (tmp + atomic rename per shard file).

    Shape: one ``groupby(shard).map_groups`` exchange (bounded: exactly
    ``n_shards`` groups), each group sorts locally (shard-sized) and
    streams its file. Pick ``n_shards`` so a shard fits a worker's heap
    (corpus_bytes / n_shards ≲ heap) — the same sizing rule as any
    hash-shard shuffle; for multi-TB shards switch the local sort to an
    external k-way merge. Returns lineage rows
    (shard_id, position, <key_col>) read back FROM THE WRITTEN FILES, so
    the returned table proves file content and order, not intent.

    ``file_format``: parquet (default) or ``avro`` — one Avro object
    container per shard through the from-scratch codec (the reference's
    native record format; AvroHdfsDataWriter posture), same tmp+rename
    and read-back-lineage discipline.

    Reference analog: Gobblin's partitioned fork+writer fan-out
    (PartitionedDataWriter.java:80-360) with a deterministic
    shuffle-partitioner instead of a semantic one."""
    import numpy as np

    if columns is not None and key_col not in columns:
        # the key column is the lineage/read-back identity — always kept
        columns = list(columns) + [key_col]
    os.makedirs(out_dir, exist_ok=True)
    # clear stale output: a prior run with different n_shards/salt/input
    # leaves shard files this run won't rewrite, and the read-back lineage
    # globs ALL shard-*.parquet — stale shards would silently fold into
    # the export and double-count documents
    for f in os.listdir(out_dir):
        if f.startswith((".shard-", "shard-")):
            os.remove(os.path.join(out_dir, f))

    def add_coin(t: pa.Table) -> pa.Table:
        # per-row hashlib: Arrow ships no md5 kernel — the same documented
        # trade-off as functions/text.fingerprint_md5 (the md5 coin is what
        # makes the shuffle SQL-oracle-reproducible)
        keys = t.column(key_col).to_pylist()
        coins = [
            hashlib.md5(f"{k}{salt}".encode()).hexdigest() for k in keys
        ]
        shard = np.array(
            [int(c[:8], 16) % n_shards for c in coins], np.int64
        )
        return t.append_column("_coin", pa.array(coins, pa.string())) \
                .append_column("_shard", pa.array(shard))

    add_coin.__name__ = "shuffle_coin"
    coined = ds.map_batches(add_coin, batch_format="pyarrow",
                            batch_size=None)

    keep = columns
    if file_format not in ("parquet", "avro"):
        raise ValueError(f"unsupported shard format {file_format!r}")
    suffix = f".{file_format}"

    def write_shard(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("_coin", "ascending"), (key_col, "ascending")]
        )
        g = g.take(order)
        shard_id = int(g.column("_shard")[0].as_py())
        body = g.drop_columns(["_coin", "_shard"])
        if keep is not None:
            body = body.select(keep)
        tmp = os.path.join(out_dir, f".shard-{shard_id:05d}.tmp")
        if file_format == "avro":
            from ..sources.avro import write_container

            write_container(body, tmp)
        else:
            pq.write_table(body, tmp)
        os.replace(
            tmp, os.path.join(out_dir, f"shard-{shard_id:05d}{suffix}")
        )
        return pa.table({"_shard": pa.array([shard_id], pa.int64())})

    # drive the export; one group per shard
    coined.groupby("_shard").map_groups(
        write_shard, batch_format="pyarrow"
    ).count()

    import ray.data as rd

    files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.startswith("shard-") and f.endswith(suffix)
    )

    def read_back(row: dict) -> list[dict]:
        if file_format == "avro":
            from ..sources.avro import read_container

            t = read_container(row["path"]).select([key_col])
        else:
            t = pq.read_table(row["path"], columns=[key_col])
        # {:05d} is a MINIMUM width: parse up to the suffix, not a slice
        sid = int(os.path.basename(row["path"])[len("shard-"):-len(suffix)])
        return [
            {"shard_id": sid, "position": i, key_col: k}
            for i, k in enumerate(t.column(key_col).to_pylist())
        ]

    return rd.from_items(
        [{"path": f} for f in files], override_num_blocks=max(1, len(files))
    ).flat_map(read_back)


def export_avro(ds, out_dir: str, codec: str = "deflate"):
    """Avro object-container export sink (AvroHdfsDataWriter analog,
    gobblin-core/.../writer/AvroHdfsDataWriter.java:1 — the reference's
    native record sink) over the from-scratch codec in sources/avro.py.
    One container file per non-empty block, written by a distributed Ray
    task per block: tmp + atomic rename under a name carrying BOTH the
    block ordinal and the content fingerprint — the ordinal keeps two
    byte-identical blocks from collapsing into one file (the export_orc
    failure mode the round-4 advisor flagged), while the fingerprint
    keeps a retried task overwriting its own file (same ordinal + same
    content -> same name -> idempotent). The dataset is materialized and
    its block refs enumerated on the driver (O(blocks) work, the lineage
    posture every sink here has); stale output clears first so a re-run
    can't double-count. Returns the (path, rows) lineage as a small
    Dataset read from the write results."""
    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.startswith(("block-", ".block-")):
            os.remove(os.path.join(out_dir, f))

    @ray.remote(num_cpus=0.5)
    def write_block(t: pa.Table, ordinal: int) -> dict:
        from ..kernels import content_fingerprint
        from ..sources.avro import write_container

        if t.num_rows == 0:
            return {"path": "", "rows": 0}
        fp = content_fingerprint(t)
        path = os.path.join(out_dir, f"block-{ordinal:05d}-{fp}.avro")
        # tmp name must NOT end in .avro: read_avro_source globs on the
        # suffix and a crashed attempt's partial tmp would poison reads
        tmp = os.path.join(
            out_dir, f".block-{ordinal:05d}-{fp}.tmp-{os.getpid()}"
        )
        write_container(t, tmp, codec=codec)
        os.replace(tmp, path)
        return {"path": path, "rows": t.num_rows}

    refs = ds.materialize().to_arrow_refs()
    lineage = [
        r for r in ray.get(
            [write_block.remote(ref, i) for i, ref in enumerate(refs)]
        )
        if r["rows"] > 0
    ]
    return rd.from_items(lineage or [{"path": "", "rows": 0}])
