"""Readers: pruned, watermark-filtered, schema-unified Parquet/CSV/JSON reads.

Gobblin analogs:
- QueryBasedSource incremental pull (gobblin-core/.../extract/
  QueryBasedSource.java:171-258): previous high watermark -> predicate on the
  watermark column, pushed into the read.
- FileBasedSource snapshot-diff listing (gobblin-core/.../filebased/
  FileBasedSource.java): list files, skip ones already ingested.
- KafkaExtractor low-watermark skip (KafkaExtractor.java:179): rows at or
  below the low watermark are filtered out at the scan.

Scale notes: always pass ``columns=`` (column pruning) and ``filter=``
(row-group pushdown); both reach pyarrow's scanner so non-matching
row groups never leave storage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw):
    """Read one named testdata table with column pruning."""
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kw
    )


def read_incremental(
    paths,
    watermark_col: str,
    low,
    high=None,
    columns: list[str] | None = None,
    schema: pa.Schema | None = None,
):
    """Incremental read of the half-open interval ``(low, high]`` on the
    watermark column (QueryBasedSource/KafkaExtractor semantics: rows at or
    below the previous high watermark are excluded)."""
    import ray.data as rd

    flt = pc.field(watermark_col) > pa.scalar(low)
    if high is not None:
        flt = flt & (pc.field(watermark_col) <= pa.scalar(high))
    kw = {}
    if schema is not None:
        kw["schema"] = schema
    return rd.read_parquet(paths, columns=columns, filter=flt, **kw)


def list_new_files(
    dir_path: str, already_ingested: set[str], suffix: str = ".parquet"
) -> list[str]:
    """Snapshot-diff file listing (FileBasedSource): files not yet ingested,
    lexicographically ordered (the date-partitioned lexicographic watermark,
    PartitionedFileSourceBase analog)."""
    out = []
    for name in sorted(os.listdir(dir_path)):
        if name.endswith(suffix) and name not in already_ingested:
            out.append(os.path.join(dir_path, name))
    return out


def read_csv_source(paths, **kw):
    import ray.data as rd

    return rd.read_csv(paths, **kw)


def read_json_source(paths, **kw):
    import ray.data as rd

    return rd.read_json(paths, **kw)


def read_binary_source(paths, include_paths: bool = True, **kw):
    """Opaque-payload reader (multimodal ingestion entry point)."""
    import ray.data as rd

    return rd.read_binary_files(paths, include_paths=include_paths, **kw)
