"""Named refs (tags) over committed manifests — the Iceberg tag / ref
analog (Iceberg spec "References": a named pointer to a snapshot that
PINS it against expiration; Gobblin's nearest concept is the dataset
version a retention policy selects by name).

A tag is one JSON file ``<lake>/_refs/<name>.json`` holding
``{"name": ..., "epoch": K}`` — metadata only, atomically written, no
data rewrite. Reads resolve a tag to its manifest and go through the
normal merge-on-read path (``CdcEngine.read_table(manifest=...)``), so a
tagged epoch is a stable, human-named time-travel point.

Pinning contract (tested end-to-end):
- ``checkpoint.vacuum`` (the run-path data-file sweep) keeps every file
  referenced by a tagged manifest, not just the head.
- ``retention.vacuum_keep`` retains tagged manifests outside the
  newest-K window and their files.
- ``retention.rollback_to`` refuses to drop a tagged epoch — drop the
  tag first (Iceberg's "cannot expire a referenced snapshot").
- Compliance purge BEATS tags (right-to-be-forgotten outranks pinning):
  after a history-dropping purge, dangling tags are pruned.
"""

from __future__ import annotations

import json
import os
import re

from . import checkpoint as ckpt

REFS_DIR = "_refs"
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def _refs_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, REFS_DIR)


def _tag_path(lake_dir: str, name: str) -> str:
    return os.path.join(_refs_dir(lake_dir), f"{name}.json")


def create_tag(lake_dir: str, name: str, epoch: int | None = None,
               force: bool = False) -> dict:
    """Tag a committed epoch (default: the head). Refuses to overwrite an
    existing tag unless ``force`` — retagging silently would un-pin the
    old epoch."""
    from .locks import FileJobLock

    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid tag name {name!r} (want [A-Za-z0-9][A-Za-z0-9._-]*,"
            " <= 64 chars)")
    # Job lock: the vacuums snapshot tagged_epochs() under this lock and
    # then delete — a tag written between their snapshot and their sweep
    # would report success yet dangle immediately. Serializing tag
    # creation against maintenance closes that window.
    with FileJobLock(os.path.join(lake_dir, "_locks")):
        store = ckpt.CheckpointStore(lake_dir)
        epochs = store.committed_epochs()
        if not epochs:
            raise ValueError("no committed manifests to tag")
        epoch = epochs[-1] if epoch is None else int(epoch)
        if epoch not in epochs:
            raise ValueError(
                f"epoch {epoch} is not a committed manifest (have {epochs})")
        path = _tag_path(lake_dir, name)
        if os.path.exists(path) and not force:
            raise FileExistsError(
                f"tag {name!r} already exists (epoch "
                f"{resolve_tag(lake_dir, name)}); use force to retag")
        os.makedirs(_refs_dir(lake_dir), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"name": name, "epoch": epoch}, f)
        os.replace(tmp, path)
        return {"name": name, "epoch": epoch}


def list_tags(lake_dir: str) -> dict[str, int]:
    """All tags as ``{name: epoch}`` (foreign files skipped, never fatal)."""
    d = _refs_dir(lake_dir)
    out: dict[str, int] = {}
    if not os.path.isdir(d):
        return out
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, fn)) as f:
                rec = json.load(f)
            out[str(rec["name"])] = int(rec["epoch"])
        except (ValueError, KeyError, json.JSONDecodeError):
            continue
    return out


def resolve_tag(lake_dir: str, name: str) -> int:
    tags = list_tags(lake_dir)
    if name not in tags:
        raise KeyError(f"unknown tag {name!r} (have {sorted(tags)})")
    return tags[name]


def drop_tag(lake_dir: str, name: str) -> None:
    path = _tag_path(lake_dir, name)
    if not os.path.exists(path):
        raise KeyError(f"unknown tag {name!r}")
    os.remove(path)


def tagged_epochs(lake_dir: str) -> set[int]:
    return set(list_tags(lake_dir).values())


def prune_dangling_tags(lake_dir: str) -> list[str]:
    """Drop tags whose manifest no longer exists (a history-dropping purge
    outranks pinning). Returns the pruned names."""
    store = ckpt.CheckpointStore(lake_dir)
    live = set(store.committed_epochs())
    pruned = []
    for name, epoch in list_tags(lake_dir).items():
        if epoch not in live:
            os.remove(_tag_path(lake_dir, name))
            pruned.append(name)
    return pruned
