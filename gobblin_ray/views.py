"""Engine-maintained incremental materialized views.

A registered view is a named, PERSISTED per-group ``(live-row count,
sum of event_seq)`` aggregate of the lake's live state, maintained
incrementally from the CDC-out change feed (counting IVM,
Gupta-Mumick'95; ``stages/aggregates.ivm_count_sum_view``) — the table
is never rescanned on refresh. This is the Hive materialized-view /
Flink dynamic-table posture on top of the lake's exactly-once manifest
chain; the reference's nearest shape is a downstream incremental job
tailing the snapshot-diff listing (FileBasedSource prior-vs-current
diff, gobblin-core/.../filebased/FileBasedSource.java), made
transactional here.

Exactly-once across crashes: each refresh writes an EPOCH-SUFFIXED state
parquet (``_views/<name>/state-epoch=K.parquet``, tmp+rename) and only
then flips ``meta.json`` (tmp+rename) to reference it. A crash between
the two leaves the old meta pointing at the old state, so the re-run
refolds the same change span FROM THE OLD STATE — a span is never
half-applied or applied twice (the stale new file is atomically
overwritten; fold output is deterministic). Unreferenced state files are
swept after the meta flip.

Window contract: refresh needs ``read_changes(folded_to)`` — the
folded-from manifest and its files must still exist (run with
``--no-vacuum`` or inside the ``vacuum --keep-manifests`` window; a tag
on the folded-to epoch pins it, refs.py). Outside the window — or across
a rebucket, whose change feed is undefined — ``refresh(recompute=True)``
rebuilds the view from the head state in one grouped scan.

Group derivations are REGISTERED BY NAME (``VIEW_KINDS``) so a view
definition survives process restarts without pickling callables —
the same named-alias posture as pipeline.py's stage registry.
"""

from __future__ import annotations

import json
import os

import numpy as np  # noqa: F401  (kinds may use it)
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import checkpoint as ckpt
from .refs import _NAME_RE

VIEWS_DIR = "_views"


def _host_of(t: pa.Table) -> pa.Array:
    return pc.struct_field(
        pc.extract_regex(t.column("url"), r"^https://(?P<host>[^/]+)/"),
        "host",
    )


def _lang_of(t: pa.Table) -> pa.Array:
    return t.column("lang")


def _old_lang_of(t: pa.Table) -> pa.Array:
    return t.column("old_lang")


VIEW_KINDS = {
    # per-host (live pages, sum event_seq) — the crawl-coverage monitor.
    # host derives from url (the change-feed KEY, immutable), so the
    # plain single-group fold algebra applies.
    "count_sum_by_host": {"group_fn": _host_of,
                          "columns": ["url", "event_seq"]},
    # per-language live counts — the mixture monitor. lang is a MUTABLE
    # column, so the fold needs the feed to carry the new value
    # (feed_columns) and the before-image (feed_before_columns), and the
    # two-sided retract/apply algebra (old_group_fn) — an update that
    # moves a page between languages retracts from the old group and
    # applies to the new (stages/aggregates.ivm_count_sum_view).
    "count_sum_by_lang": {"group_fn": _lang_of,
                          "old_group_fn": _old_lang_of,
                          "feed_columns": ["lang"],
                          "feed_before_columns": ["lang"],
                          "columns": ["url", "lang", "event_seq"]},
}

_STATE_SCHEMA = pa.schema([
    ("grp", pa.string()), ("n_live", pa.int64()), ("sum_seq", pa.int64()),
])


def _vdir(lake_dir: str, name: str) -> str:
    return os.path.join(lake_dir, VIEWS_DIR, name)


def _state_path(lake_dir: str, name: str, epoch: int) -> str:
    return os.path.join(_vdir(lake_dir, name),
                        f"state-epoch={epoch:06d}.parquet")


def _meta_path(lake_dir: str, name: str) -> str:
    return os.path.join(_vdir(lake_dir, name), "meta.json")


def _load_meta(lake_dir: str, name: str) -> dict:
    try:
        with open(_meta_path(lake_dir, name)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise KeyError(f"unknown view {name!r} "
                       f"(have {sorted(list_views(lake_dir))})") from None


def list_views(lake_dir: str) -> dict[str, dict]:
    root = os.path.join(lake_dir, VIEWS_DIR)
    out: dict[str, dict] = {}
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        mp = _meta_path(lake_dir, name)
        if os.path.isfile(mp):
            with open(mp) as f:
                out[name] = json.load(f)
    return out


def _collect_state(ds) -> pa.Table:
    """Materialize a view result (O(groups) rows) to one Arrow table with
    the pinned state schema."""
    df = ds.to_pandas()
    df = df.sort_values("grp").reset_index(drop=True)
    return pa.table({
        "grp": pa.array(df["grp"].astype(object), pa.string()),
        "n_live": pa.array(df["n_live"].astype("int64"), pa.int64()),
        "sum_seq": pa.array(df["sum_seq"].astype("int64"), pa.int64()),
    }, schema=_STATE_SCHEMA)


def _empty_changes(spec: dict, base_schema: pa.Schema):
    """An empty change feed with the exact schema the kind's fold reads
    (the base feed fields plus the kind's projected/new-value columns and
    ``old_<col>`` before-images). Column types come from the LAKE schema —
    read_changes projects ``schema.field(c).type``, so a hardcoded string
    here would make the seed fold and the real refresh fold disagree on
    typing for any kind whose feed column is non-string."""
    import ray.data as rd

    cols: dict[str, pa.Array] = {
        "url": pa.array([], pa.string()),
        "event_seq": pa.array([], pa.int64()),
        "change_type": pa.array([], pa.string()),
        "old_event_seq": pa.array([], pa.int64()),
    }
    for c in spec.get("feed_columns", ()):
        cols.setdefault(c, pa.array([], base_schema.field(c).type))
    for c in spec.get("feed_before_columns", ()):
        cols.setdefault(f"old_{c}",
                        pa.array([], base_schema.field(c).type))
    return rd.from_arrow(pa.table(cols))


def _seed_state(eng, kind: str) -> tuple[pa.Table, int]:
    """Full recompute of the view at head: one grouped scan of live rows
    (pruned to the kind's columns)."""
    from .stages.aggregates import ivm_count_sum_view

    spec = VIEW_KINDS[kind]
    head = eng.store.latest()
    base = eng.read_table(manifest=head, columns=spec["columns"])
    out = ivm_count_sum_view(base, _empty_changes(spec, head.base_schema()),
                             spec["group_fn"],
                             old_group_fn=spec.get("old_group_fn"))
    return _collect_state(out), head.epoch


def _write_state(lake_dir: str, name: str, state: pa.Table,
                 meta: dict) -> None:
    os.makedirs(_vdir(lake_dir, name), exist_ok=True)
    ckpt.atomic_write_table(state, _state_path(lake_dir, name,
                                               meta["folded_to"]))
    mp = _meta_path(lake_dir, name)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, mp)
    # meta flipped: sweep state files it no longer references
    keep = os.path.basename(_state_path(lake_dir, name, meta["folded_to"]))
    for fn in os.listdir(_vdir(lake_dir, name)):
        if fn.startswith("state-epoch=") and fn.endswith(".parquet") \
                and fn != keep:
            os.remove(os.path.join(_vdir(lake_dir, name), fn))


def create_view(eng, name: str, kind: str) -> dict:
    """Register + seed a view at the current head manifest."""
    if not _NAME_RE.match(name or ""):
        raise ValueError(f"invalid view name {name!r}")
    if kind not in VIEW_KINDS:
        raise ValueError(f"unknown view kind {kind!r} "
                         f"(have {sorted(VIEW_KINDS)})")
    if os.path.isfile(_meta_path(eng.lake_dir, name)):
        raise FileExistsError(f"view {name!r} already exists")
    state, epoch = _seed_state(eng, kind)
    meta = {"name": name, "kind": kind, "folded_to": epoch}
    _write_state(eng.lake_dir, name, state, meta)
    return {**meta, "groups": state.num_rows}


def _window_gone(e: Exception) -> bool:
    """True when an exception (or anything on its cause/context chain —
    Ray Data wraps worker exceptions in RayTaskError/UserCodeException)
    is the fold-window-gone signal: missing swept files, or
    read_changes' SPECIFIC rebucket refusal. Deliberately narrow — a
    generic ValueError match would silently degrade every real fold
    defect (ArrowInvalid is a ValueError subclass, as are cast errors
    and read_changes' bad-column validation) into a permanent
    recompute-on-every-refresh with no signal."""
    seen = set()
    stack = [e]
    while stack:
        c = stack.pop()
        if c is None or id(c) in seen:
            continue
        seen.add(id(c))
        if isinstance(c, FileNotFoundError):
            return True
        if isinstance(c, ValueError) and "bucket migration" in str(c):
            return True
        stack.extend([c.__cause__, c.__context__])
    # RayTaskError reconstructed cross-process keeps only the formatted
    # traceback text, not the cause objects
    return "FileNotFoundError" in str(e)


def refresh_view(eng, name: str, recompute: bool = False) -> dict:
    """Fold the view forward to the head manifest from the change feed
    (or rebuild from head state with ``recompute=True`` when the feed
    window is gone — vacuumed span or a rebucket in between)."""
    import ray.data as rd

    from .stages.aggregates import ivm_count_sum_view

    lake = eng.lake_dir
    meta = _load_meta(lake, name)
    head = eng.store.latest()
    if head is None:
        raise ValueError("lake has no committed manifests")
    if head.epoch <= meta["folded_to"] and not recompute:
        return {**meta, "refreshed": False, "recomputed": False,
                "groups": pq.read_metadata(
                    _state_path(lake, name, meta["folded_to"])).num_rows}
    spec = VIEW_KINDS[meta["kind"]]
    recomputed = recompute
    if recompute:
        state, epoch = _seed_state(eng, meta["kind"])
    else:
        try:
            base = rd.read_parquet(
                _state_path(lake, name, meta["folded_to"]))
            changes = eng.read_changes(
                meta["folded_to"], include_before=True,
                columns=tuple(spec.get("feed_columns", ())),
                before_columns=tuple(spec.get("feed_before_columns", ())),
            )
            out = ivm_count_sum_view(base, changes, spec["group_fn"],
                                     base_is_state=True,
                                     old_group_fn=spec.get("old_group_fn"))
            state, epoch = _collect_state(out), head.epoch
        except Exception as e:
            # the documented window contract: the folded-from manifest's
            # files were vacuumed (FileNotFoundError inside the diff
            # tasks — Ray Data wraps it as
            # RayTaskError(UserCodeException) with the original as the
            # cause chain) or a rebucket intervened (read_changes raises
            # ValueError on the driver). Fall back to the one-scan head
            # recompute instead of failing — critically,
            # auto_refresh_views runs AFTER the epochs committed, where
            # raising would report a failed run despite durable commits
            # and keep failing every run. Anything else re-raises.
            if not _window_gone(e):
                raise
            state, epoch = _seed_state(eng, meta["kind"])
            recomputed = True
    new_meta = {**meta, "folded_to": epoch}
    _write_state(lake, name, state, new_meta)
    return {**new_meta, "refreshed": True, "recomputed": recomputed,
            "groups": state.num_rows}


def read_view(lake_dir: str, name: str) -> pa.Table:
    meta = _load_meta(lake_dir, name)
    return pq.read_table(_state_path(lake_dir, name, meta["folded_to"]))


def drop_view(lake_dir: str, name: str) -> None:
    import shutil

    _load_meta(lake_dir, name)  # raises on unknown
    shutil.rmtree(_vdir(lake_dir, name))
