"""Schemas for the webtext CDC corpus + additive schema unification.

Reference analogs: source-announced schemas (Extractor.getSchema,
gobblin-api/.../source/extractor/Extractor.java:59), newest-schema unification
(gobblin-compaction/.../MRCompactorAvroKeyDedupJobRunner.java:114-122),
null-default additive merge (gobblin-utility/.../AvroUtils.java:600), and
Iceberg additive column adds
(gobblin-iceberg/.../writer/IcebergMetadataWriter.java:507-514).

The input shape comes from BASELINE.json ``input_hint``:
``pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``; the CDC event log adds ``op`` and the monotonically
increasing ``event_seq`` watermark axis.
"""

from __future__ import annotations

import pyarrow as pa

# Base lake table (initial snapshot). ``event_seq`` is the sequence number of
# the last event applied to the row (-1 for snapshot rows) and serves as the
# LWW tiebreak; ``is_deleted`` marks tombstones retained so that late events
# with an older ``warc_ts`` cannot resurrect a deleted row (FIXTURES.md §4).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Internal bookkeeping columns present in stored base bucket files.
BASE_EXTRA_FIELDS = [
    ("event_seq", pa.int64()),
    ("is_deleted", pa.bool_()),
]

BASE_SCHEMA = pa.schema(list(PAGES_SCHEMA) + [pa.field(n, t) for n, t in BASE_EXTRA_FIELDS])

# CDC change-log schema (v1). Ordered by event_seq, gapless.
EVENTS_SCHEMA = pa.schema(
    [
        ("event_seq", pa.int64()),
        ("op", pa.string()),  # insert | update | delete
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Schema-evolution segment (FIXTURES.md §3): additive nullable column.
EVENTS_V2_SCHEMA = EVENTS_SCHEMA.append(pa.field("fetch_status", pa.int32()))

OPS = ("insert", "update", "delete")


def unify_additive(*schemas: pa.Schema) -> pa.Schema:
    """Additive-only schema unification (newest-wins field order).

    Fields are the union of all input fields; a field present in several
    schemas must have an identical type (no type promotion — the reference's
    compaction also only supports additive evolution with null defaults).
    Later schemas append their new fields after earlier ones, preserving
    first-seen order, which keeps column order deterministic across epochs.
    """
    fields: dict[str, pa.Field] = {}
    for schema in schemas:
        for field in schema:
            prev = fields.get(field.name)
            if prev is None:
                # All evolved-in columns must be nullable (old rows null-fill).
                fields[field.name] = field.with_nullable(True)
            elif prev.type != field.type:
                raise TypeError(
                    f"non-additive schema change for field {field.name!r}: "
                    f"{prev.type} vs {field.type}"
                )
    return pa.schema(list(fields.values()))


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` to ``schema``: missing columns become all-null,
    column order follows ``schema``. The vectorized analog of Gobblin's
    null-default record upconversion (AvroUtils.nullifyFieldsForSchemaMerge).
    """
    n = table.num_rows
    cols = []
    names = set(table.column_names)
    for field in schema:
        if field.name in names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def schema_fingerprint(schema: pa.Schema) -> str:
    """Stable short fingerprint of a schema (recorded in the manifest)."""
    import hashlib

    desc = ";".join(f"{f.name}:{f.type}" for f in schema)
    return hashlib.sha256(desc.encode()).hexdigest()[:16]
