"""Last-writer-wins merge-on-read kernel (pure pyarrow/numpy, Ray-free).

The vectorized re-expression of Gobblin's compaction dedup reduce: group by
key, keep the record with the max delta field, tiebreak on order
(gobblin-compaction/.../RecordKeyDedupReducerBase.java:74-118,
AvroKeyDedupReducer.java:35-93; delta-field selection
FieldAttributeBasedDeltaFieldsProvider.java). Here key = ``url``, delta =
``warc_ts``, tiebreak = ``event_seq`` — so the winner per url is
argmax(warc_ts, event_seq).

Deletes are writers too: a tombstone wins or loses LWW by the same
comparison, and the winning tombstone is *retained* in the base (is_deleted
= true) so that a later-arriving event with an older warc_ts cannot
resurrect the row (FIXTURES.md §4). Tombstones vanish only at vacuum time.

LWW is associative and commutative given the total order (warc_ts,
event_seq), so partial merges (within a batch, within a salt sub-group)
followed by a final merge give identical results — the basis for the
pre-aggregation and hot-bucket salting stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import BASE_SCHEMA, conform, unify_additive

_SORT_KEYS = [("url", "ascending"), ("warc_ts", "ascending"), ("event_seq", "ascending")]


def _last_per_url(table: pa.Table) -> pa.Table:
    """Keep the last row per url after sorting by (url, warc_ts, event_seq).

    Vectorized: sort, then boundary-detect adjacent url changes on the
    dictionary-encoded key (no Python per-row loop).
    """
    if table.num_rows == 0:
        return table
    table = table.sort_by(_SORT_KEYS)
    codes_arr = pc.dictionary_encode(table.column("url").combine_chunks()).indices
    codes = codes_arr.to_numpy(zero_copy_only=False)
    take = np.flatnonzero(np.diff(codes, append=codes[-1] + 1) != 0)
    if len(take) == table.num_rows:
        return table
    return table.take(pa.array(take))


def lww_reduce(events: pa.Table) -> pa.Table:
    """Collapse an event table to one winning row per url (tombstones kept).

    Input must have at least (url, warc_ts, event_seq, op) columns; all
    other columns ride along. Output drops nothing — the caller decides
    whether tombstones are filtered (final read) or retained (base write).
    """
    return _last_per_url(events)


def events_to_base(events: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project winning event rows into base-table form under ``schema``
    (which must contain event_seq + is_deleted)."""
    is_deleted = pc.equal(events.column("op"), pa.scalar("delete"))
    tbl = events.drop_columns(["op"]).append_column(
        "is_deleted", pc.fill_null(is_deleted, False)
    )
    return conform(tbl, schema)


def base_to_pseudo_events(base: pa.Table) -> pa.Table:
    """Re-express base rows as events so base ∪ new-events is one LWW pass.

    A live base row becomes an 'update' (its own warc_ts/event_seq), a
    tombstone becomes a 'delete' — the merge then reduces the union.
    """
    op = pc.if_else(
        pc.fill_null(base.column("is_deleted"), False),
        pa.scalar("delete"),
        pa.scalar("update"),
    )
    return base.drop_columns(["is_deleted"]).append_column("op", op)


def merge_base_with_events(
    base: pa.Table | None, events: pa.Table, schema: pa.Schema | None = None
) -> pa.Table:
    """Merge-on-read upsert: new base = LWW(base-as-events ∪ events).

    ``schema`` is the target *base* schema; defaults to the additive union
    of the base's schema and the events' columns (minus op) + bookkeeping —
    the schema-evolution reconciliation point.
    """
    ev_base_schema = pa.schema(
        [f for f in events.schema if f.name != "op"]
        + [pa.field("is_deleted", pa.bool_())]
    )
    if schema is None:
        schema = (
            unify_additive(base.schema, ev_base_schema)
            if base is not None
            else unify_additive(BASE_SCHEMA, ev_base_schema)
        )
    ev_schema = pa.schema([f for f in schema if f.name != "is_deleted"]).append(
        pa.field("op", pa.string())
    )
    parts = [conform(events, ev_schema)]
    if base is not None and base.num_rows:
        parts.append(conform(base_to_pseudo_events(base), ev_schema))
    merged = lww_reduce(pa.concat_tables(parts))
    return events_to_base(merged, schema)


def merge_bases(tables: list[pa.Table], schema: pa.Schema | None = None) -> pa.Table:
    """LWW-merge several base-form tables (a base file + its delta files)
    into one. Order-independent: LWW over (warc_ts, event_seq) is
    associative and commutative, so base+deltas merge in any order."""
    tables = [t for t in tables if t is not None and t.num_rows]
    if not tables:
        # keep the caller's schema: a column-less empty table crashes
        # live_rows (no is_deleted) — reachable when a purge empties a
        # bucket and its 0-row base is later re-read
        return conform(pa.table({}), schema) if schema is not None else pa.table({})
    if schema is None:
        schema = unify_additive(*[t.schema for t in tables])
    if len(tables) == 1:
        return conform(tables[0], schema)
    ev_schema = pa.schema([f for f in schema if f.name != "is_deleted"]).append(
        pa.field("op", pa.string())
    )
    pseudo = pa.concat_tables(
        [conform(base_to_pseudo_events(t), ev_schema) for t in tables]
    )
    return events_to_base(lww_reduce(pseudo), schema)


def live_rows(base: pa.Table) -> pa.Table:
    """Reader view: drop tombstones + bookkeeping columns."""
    live = base.filter(pc.equal(pc.fill_null(base.column("is_deleted"), False), False))
    return live.drop_columns([c for c in ("is_deleted",) if c in live.column_names])
