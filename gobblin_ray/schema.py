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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """LOSSLESS type promotion for schema evolution, mirroring Avro's
    promotion lattice (int -> long, float -> double; the reference's
    AvroSchemaUtils-based evolution accepts these) but restricted to
    promotions that can never lose a value: wider same-signedness ints,
    wider floats, and int -> float only when every int fits the float's
    integer-exact mantissa range (int8/16 -> float32; ints up to 32 bits ->
    float64; int64 -> double is LOSSY past 2^53 and is rejected). Returns
    the wider type, or None when no lossless promotion exists."""
    if a == b:
        return a
    t = pa.types
    for pred in (t.is_signed_integer, t.is_unsigned_integer):
        if pred(a) and pred(b):
            return a if a.bit_width >= b.bit_width else b
    # float16 is deliberately OUTSIDE the lattice: this pyarrow build cannot
    # cast halffloat UP to float32/64, so a float16 promotion would be
    # lossless on paper but uncastable in conform — reject instead
    mantissa = {pa.float32(): 24, pa.float64(): 53}
    if a in mantissa and b in mantissa:
        return a if a.bit_width >= b.bit_width else b

    def int_float(i, f):
        if not ((t.is_signed_integer(i) or t.is_unsigned_integer(i))
                and f in mantissa):
            return None
        value_bits = i.bit_width - (1 if t.is_signed_integer(i) else 0)
        if value_bits <= mantissa[f]:
            return f
        if value_bits <= 53:
            return pa.float64()
        return None
    got = int_float(a, b) or int_float(b, a)
    if got is not None:
        return got
    # Nested types (round-5: the reference's data model is Avro-nested,
    # SURVEY §1.1): struct evolution is ADDITIVE per subfield — the union
    # of both structs' fields, shared subfields widened recursively (new
    # subfields null-fill in conform, the AvroUtils null-default merge
    # posture); list evolution widens the element type. Field-order
    # follows the same first-seen rule as unify_additive.
    if t.is_struct(a) and t.is_struct(b):
        fields: dict[str, pa.Field] = {}
        for st in (a, b):
            for f in st:
                prev = fields.get(f.name)
                if prev is None:
                    fields[f.name] = f.with_nullable(True)
                elif prev.type != f.type:
                    wide = _widen(prev.type, f.type)
                    if wide is None:
                        return None
                    fields[f.name] = pa.field(f.name, wide, nullable=True)
        return pa.struct(list(fields.values()))
    if t.is_list(a) and t.is_list(b):
        wide = _widen(a.value_type, b.value_type)
        return pa.list_(wide) if wide is not None else None
    return None


def unify_additive(*schemas: pa.Schema) -> pa.Schema:
    """Additive + lossless-widening schema unification (newest-wins field
    order).

    Fields are the union of all input fields. A field present in several
    schemas with different types is promoted along the LOSSLESS widening
    lattice (``_widen``: int8<int16<int32<int64, float32<float64, small
    ints into exactly-representing floats) — the Avro type-promotion rules
    the reference's evolution accepts, minus the lossy long->double edge.
    Anything else (string vs int, int64 vs float, timestamp unit changes)
    raises: destructive evolution must be explicit (re-bootstrap), exactly
    as the reference's compaction rejects non-additive changes. ``conform``
    casts narrow-typed old rows up to the unified type at read. Later
    schemas append their new fields after earlier ones, preserving
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
                wide = _widen(prev.type, field.type)
                if wide is None:
                    raise TypeError(
                        f"non-additive schema change for field "
                        f"{field.name!r}: {prev.type} vs {field.type} "
                        "(no lossless promotion)"
                    )
                fields[field.name] = pa.field(field.name, wide, nullable=True)
    return pa.schema(list(fields.values()))


def _conform_array(arr, target: pa.DataType):
    """Cast an array up to ``target``, recursing into structs AND lists:
    pyarrow's plain cast rejects struct -> wider struct, so evolved-in
    subfields null-fill by hand (children conform recursively; the
    parent's validity bitmap is preserved so a null struct stays null
    rather than becoming a struct of nulls). A list whose VALUE type
    needs the struct treatment (list<struct<...>>) rebuilds from its
    offsets with the conformed child — every type ``_widen`` can unify,
    this function can deliver (review finding: the round-5 first cut
    unified list<struct> at plan time then crashed at conform time)."""
    if arr.type == target:
        return arr
    if pa.types.is_struct(arr.type) and pa.types.is_struct(target):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        have = {f.name for f in arr.type}
        children = []
        for f in target:
            child = (arr.field(f.name) if f.name in have
                     else pa.nulls(n, f.type))
            children.append(_conform_array(child, f.type))
        return pa.StructArray.from_arrays(
            children, fields=list(target), mask=arr.is_null()
        )
    if pa.types.is_list(arr.type) and pa.types.is_list(target):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # flatten() honors slicing/offsets (unlike .values); offsets are
        # re-derived from value lengths so the rebuilt array is dense
        values = _conform_array(arr.flatten(), target.value_type)
        lens = pc.fill_null(pc.list_value_length(arr), 0)
        offsets = np.concatenate(
            [[0], np.cumsum(lens.to_numpy(zero_copy_only=False))]
        ).astype(np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), values, mask=arr.is_null()
        )
    return arr.cast(target)


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` to ``schema``: missing columns become all-null,
    column order follows ``schema``. The vectorized analog of Gobblin's
    null-default record upconversion (AvroUtils.nullifyFieldsForSchemaMerge).
    Struct columns conform recursively (evolved-in subfields null-fill)."""
    n = table.num_rows
    cols = []
    names = set(table.column_names)
    for field in schema:
        if field.name in names:
            col = table.column(field.name)
            if col.type != field.type:
                col = _conform_array(col, field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def apply_renames(table: pa.Table, renames: dict[str, str] | None) -> pa.Table:
    """Metadata-only column-rename evolution at READ time (the Iceberg
    rename analog, without field ids): map STORED column names to their
    CURRENT names. Files written before a rename keep the old name on
    disk until compaction naturally rewrites them; every reader passes
    the manifest's cumulative ``column_renames`` map through here first,
    then conforms to the current schema.

    A mapping is SKIPPED when the target name already exists in the same
    file: the only way a file can contain both is that the old name was
    re-added as a NEW column after the rename (files holding the
    pre-rename column strictly predate the rename), and that new column
    must keep its name."""
    if not renames:
        return table
    present = set(table.column_names)
    out = []
    for n in table.column_names:
        t = renames.get(n)
        out.append(t if t is not None and t not in present else n)
    return table.rename_columns(out)


def rename_schema(schema: pa.Schema, renames: dict[str, str] | None) -> pa.Schema:
    """Schema-level twin of ``apply_renames`` (same skip-if-target-present
    rule), for renaming a source-announced schema before unification."""
    if not renames:
        return schema
    present = {f.name for f in schema}
    fields = []
    for f in schema:
        t = renames.get(f.name)
        fields.append(
            f.with_name(t) if t is not None and t not in present else f
        )
    return pa.schema(fields)


def comparable_key_fields(schema: pa.Schema,
                          exclude: tuple = ("event_seq", "is_deleted")
                          ) -> list[str]:
    """Dedup-key projection: the columns of ``schema`` whose types can
    serve as grouping/ordering keys — the AvroKeyMapper posture
    (gobblin-compaction/.../AvroKeyMapper.java:83-119: the reference's
    key projection explicitly SKIPS fields whose Avro type cannot
    compare — maps, arrays, unions of complex types — so a nested column
    never silently breaks the dedup reduce). Here: scalar orderable
    types keep (ints, floats, strings, bool, timestamps, dates);
    struct / list / map / binary / null columns and the engine's
    bookkeeping columns are excluded. Callers doing exact dedup over
    "all key columns" should key on exactly this list."""
    t = pa.types
    out = []
    for f in schema:
        if f.name in exclude:
            continue
        ty = f.type
        if (t.is_integer(ty) or t.is_floating(ty) or t.is_string(ty)
                or t.is_large_string(ty) or t.is_boolean(ty)
                or t.is_timestamp(ty) or t.is_date(ty)):
            out.append(f.name)
    return out


def schema_fingerprint(schema: pa.Schema) -> str:
    """Stable short fingerprint of a schema (recorded in the manifest)."""
    import hashlib

    desc = ";".join(f"{f.name}:{f.type}" for f in schema)
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def _promotes_for_read(writer_t: pa.DataType, reader_t: pa.DataType) -> bool:
    """Can data of ``writer_t`` be READ as ``reader_t``? The Avro
    resolution rule applied recursively: scalars promote along the
    lossless lattice; struct READER subfields resolve against the writer
    (missing ones null-fill, writer-only ones project away — conform
    drops them, so a writer struct with EXTRA subfields is readable, the
    asymmetry the plain ``_widen`` union cannot express); list value
    types resolve recursively."""
    if writer_t == reader_t:
        return True
    if pa.types.is_struct(writer_t) and pa.types.is_struct(reader_t):
        wf = {f.name: f for f in writer_t}
        for f in reader_t:
            w = wf.get(f.name)
            if w is None:
                if not f.nullable:
                    return False
            elif not _promotes_for_read(w.type, f.type):
                return False
        return True
    if pa.types.is_list(writer_t) and pa.types.is_list(reader_t):
        return _promotes_for_read(writer_t.value_type, reader_t.value_type)
    wide = _widen(writer_t, reader_t)
    return wide is not None and wide == reader_t


def _read_violations(writer: pa.Schema, reader: pa.Schema) -> list[str]:
    """Can a consumer on ``reader`` decode data written with ``writer``?
    Avro resolution rules restricted to this engine's lossless lattice:
    reader-only fields need a null default (nullable); shared fields need
    the writer type to promote INTO the reader type (recursively for
    nested types — an additive struct subfield on the writer side is
    readable, review finding); writer-only fields are simply ignored by
    projection."""
    out = []
    wf = {f.name: f for f in writer}
    for f in reader:
        w = wf.get(f.name)
        if w is None:
            if not f.nullable:
                out.append(
                    f"field {f.name!r} is new to the reader but has no "
                    "null default (non-nullable)"
                )
        elif not _promotes_for_read(w.type, f.type):
            out.append(
                f"field {f.name!r}: writer {w.type} does not promote "
                f"to reader {f.type}"
            )
    return out


def compatibility_violations(
    old, new: pa.Schema, mode: str = "BACKWARD"
) -> list[str]:
    """Schema-registry compatibility check — the Confluent/Kafka registry
    contract (BACKWARD / FORWARD / FULL and their _TRANSITIVE variants;
    Gobblin consumes the same registry via
    gobblin-modules/gobblin-kafka-common KafkaSchemaRegistry). ``old`` is
    the previous schema, or the full history list for _TRANSITIVE modes
    (non-transitive modes check only the latest).

    BACKWARD: consumers on ``new`` can read data written under ``old``
    (new fields need null defaults; types may only widen old -> new).
    FORWARD: consumers on ``old`` can read data written under ``new``
    (removed fields must have been nullable; types may only narrow...
    i.e. new must promote INTO old). FULL: both. NONE: anything goes.
    Returns human-readable violations; empty list == compatible."""
    mode = mode.upper()
    base = mode.removesuffix("_TRANSITIVE")
    if base not in ("BACKWARD", "FORWARD", "FULL", "NONE"):
        raise ValueError(f"unknown compatibility mode {mode!r}")
    history = list(old) if isinstance(old, (list, tuple)) else [old]
    if not mode.endswith("_TRANSITIVE"):
        history = history[-1:]
    out: list[str] = []
    for i, prior in enumerate(history):
        tag = f" (vs history[{i}])" if len(history) > 1 else ""
        if base in ("BACKWARD", "FULL"):
            out += [f"BACKWARD{tag}: {v}"
                    for v in _read_violations(prior, new)]
        if base in ("FORWARD", "FULL"):
            out += [f"FORWARD{tag}: {v}"
                    for v in _read_violations(new, prior)]
    return out


def check_compatibility(old, new: pa.Schema, mode: str = "BACKWARD") -> None:
    """Raise ``TypeError`` listing every violation if ``new`` is not
    ``mode``-compatible with ``old`` (see compatibility_violations)."""
    v = compatibility_violations(old, new, mode)
    if v:
        raise TypeError(
            f"schema not {mode}-compatible: " + "; ".join(v)
        )
