"""Distcp-style dataset copy job (the reference's data-management copy).

Analog of gobblin-data-management's copy pipeline:

- plan          -> CopySource.getWorkunits (gobblin-data-management/.../copy/
                   CopySource.java:164-225): list copyable file entities,
                   diff against what the destination already has, bin-pack
                   by size (maxSizePerBin, CopySource.java:183-185).
- copy task     -> FileAwareInputStreamDataWriter (copy/writer/
                   FileAwareInputStreamDataWriter.java): stream bytes
                   src -> staging with a running digest.
- publish       -> CopyDataPublisher (copy/publisher/CopyDataPublisher.java):
                   atomic rename staging -> final per file, then commit a
                   manifest so a re-run never re-copies committed files.

Ray-Data-first shape: the PLAN is driver-side metadata only (O(files) stat
calls — at 100 TB a copy job still has ~10^5-10^6 files, small next to row
data); the COPY fans out as ``ray.data.from_items(units).map_batches(...)``
where each unit is a size-balanced bin of files (so stragglers are bounded
by bin size, not by the largest directory); VERIFY re-reads the destination
bytes and digests them (the integrity check is on what actually landed, not
on what the writer believed it wrote); COMMIT appends to a manifest parquet
under the destination via tmp+rename.

Resume contract (CommitSequence analog): a file whose (size, mtime_ns)
matches its manifest row is skipped at plan time; everything else —
brand-new, changed, or half-copied before a kill — is (re-)copied through a
fresh staging path, so a killed job converges by re-running.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from .plan import pack_bins

MANIFEST_NAME = "_copy_manifest.parquet"
STAGING_DIR = "_copy_staging"
_CHUNK = 1 << 20  # 1 MiB streaming chunks: bounded memory for any file size

_MANIFEST_SCHEMA = pa.schema(
    [
        ("rel_path", pa.string()),
        ("bytes", pa.int64()),
        ("mtime_ns", pa.int64()),
        ("md5", pa.string()),
    ]
)


@dataclass(frozen=True)
class CopyEntity:
    """One file to copy (CopyableFile analog, copy/CopyableFile.java)."""

    rel_path: str
    bytes: int
    mtime_ns: int


def list_files(src_root: str, glob: str = "*") -> list[CopyEntity]:
    """Recursive source listing. ``glob`` matches the file BASENAME
    (fnmatch); hidden bookkeeping (``_*``) is never listed."""
    import fnmatch

    out = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if not d.startswith("_"))
        for f in sorted(filenames):
            if f.startswith("_") or not fnmatch.fnmatch(f, glob):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out.append(
                CopyEntity(os.path.relpath(p, src_root), st.st_size, st.st_mtime_ns)
            )
    return out


def read_manifest(dest_root: str) -> dict[str, tuple[int, int]]:
    """rel_path -> (bytes, mtime_ns) of files already committed."""
    path = os.path.join(dest_root, MANIFEST_NAME)
    if not os.path.exists(path):
        return {}
    t = pq.read_table(path)
    return {
        r["rel_path"]: (r["bytes"], r["mtime_ns"]) for r in t.to_pylist()
    }


def plan_copy(
    entities: list[CopyEntity],
    committed: dict[str, tuple[int, int]],
    num_units: int,
) -> list[list[CopyEntity]]:
    """Diff against the committed manifest, then worst-fit-decreasing
    bin-pack the remainder by byte size into ``num_units`` balanced units
    (CopySource.java:183-185 maxSizePerBin posture — balanced bins instead
    of a cap because the unit count, not the bin ceiling, is what a fixed
    Ray cluster schedules against)."""
    todo = [
        e
        for e in entities
        if committed.get(e.rel_path) != (e.bytes, e.mtime_ns)
    ]
    if not todo:
        return []
    by_rel = {e.rel_path: e for e in todo}
    sizes = {e.rel_path: max(e.bytes, 1) for e in todo}
    bins = pack_bins(sizes, min(num_units, len(todo)))
    return [[by_rel[k] for k in b] for b in bins if b]


def _copy_one(src: str, stage: str) -> tuple[int, str]:
    """Stream src -> stage in bounded chunks, returning (bytes, md5 of the
    bytes WRITTEN). fsync-free by design: the commit rename happens only
    after the verify pass re-reads the destination."""
    os.makedirs(os.path.dirname(stage), exist_ok=True)
    h = hashlib.md5()
    n = 0
    with open(src, "rb") as fin, open(stage, "wb") as fout:
        while True:
            chunk = fin.read(_CHUNK)
            if not chunk:
                break
            h.update(chunk)
            fout.write(chunk)
            n += len(chunk)
    return n, h.hexdigest()


def _md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(_CHUNK)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def run_copy(
    src_root: str,
    dest_root: str,
    glob: str = "*",
    num_units: int | None = None,
    verify: bool = True,
) -> dict:
    """Plan + fan-out copy + verify + publish. Returns a summary dict.

    Dataset pipeline: one row per work unit; each map task copies its bin
    to a per-run staging dir, re-reads the staged bytes for the digest
    when ``verify`` (integrity is judged on landed bytes), and returns
    per-file lineage rows. The driver then publishes (atomic rename per
    file) and appends the manifest — O(files copied) driver work, zero row
    data through the driver.
    """
    import ray.data as rd

    os.makedirs(dest_root, exist_ok=True)
    entities = list_files(src_root, glob)
    committed = read_manifest(dest_root)
    if num_units is None:
        num_units = max(1, min(64, len(entities)))
    units = plan_copy(entities, committed, num_units)
    if not units:
        return {"files_listed": len(entities), "files_copied": 0, "bytes": 0}

    run_tag = f"run-{os.getpid()}-{len(committed)}"
    stage_root = os.path.join(dest_root, STAGING_DIR, run_tag)

    items = [
        {
            "rels": [e.rel_path for e in u],
            "sizes": [e.bytes for e in u],
            "mtimes": [e.mtime_ns for e in u],
        }
        for u in units
    ]

    def copy_unit(batch: pa.Table) -> pa.Table:
        rels, bts, mts, digs = [], [], [], []
        for row in batch.to_pylist():
            for rel, _size, mt in zip(row["rels"], row["sizes"], row["mtimes"]):
                stage = os.path.join(stage_root, rel)
                n, dig = _copy_one(os.path.join(src_root, rel), stage)
                if verify:
                    # integrity is judged on LANDED bytes, and they must
                    # MATCH the source stream's digest — computing the
                    # staged digest without comparing would publish a
                    # torn/bit-flipped file and remember its corrupt md5
                    landed = _md5_file(stage)
                    if landed != dig:
                        raise IOError(
                            f"copy verify failed for {rel}: source md5 "
                            f"{dig} != staged md5 {landed}"
                        )
                    dig = landed
                rels.append(rel)
                bts.append(n)
                mts.append(mt)
                digs.append(dig)
        return pa.table(
            {
                "rel_path": pa.array(rels, pa.string()),
                "bytes": pa.array(bts, pa.int64()),
                "mtime_ns": pa.array(mts, pa.int64()),
                "md5": pa.array(digs, pa.string()),
            }
        )

    lineage = (
        rd.from_items(items)
        .map_batches(copy_unit, batch_format="pyarrow", batch_size=1)
        .take_all()  # O(files) lineage rows, not file bytes
    )

    # Publish: atomic rename per file (CopyDataPublisher.publishFileSet),
    # then manifest append via tmp+replace. A crash between renames is
    # safe: unpublished files stay in staging, the manifest doesn't list
    # them, and the next run re-copies them through a fresh staging dir.
    for row in lineage:
        final = os.path.join(dest_root, row["rel_path"])
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(os.path.join(stage_root, row["rel_path"]), final)
    shutil.rmtree(stage_root, ignore_errors=True)

    new_rows = {r["rel_path"]: r for r in lineage}
    old_md5 = _manifest_md5s(dest_root) if committed else {}
    merged = [
        {"rel_path": rel, "bytes": b, "mtime_ns": m, "md5": old_md5[rel]}
        for rel, (b, m) in committed.items()
        if rel not in new_rows
    ] + list(new_rows.values())
    _write_manifest(dest_root, merged)

    return {
        "files_listed": len(entities),
        "files_copied": len(lineage),
        "bytes": sum(r["bytes"] for r in lineage),
        "units": len(units),
    }


def _manifest_md5s(dest_root: str) -> dict[str, str]:
    """rel_path -> md5 from the committed manifest (one parquet read)."""
    path = os.path.join(dest_root, MANIFEST_NAME)
    t = pq.read_table(path, columns=["rel_path", "md5"])
    return dict(zip(t.column("rel_path").to_pylist(), t.column("md5").to_pylist()))


def _write_manifest(dest_root: str, rows: list[dict]) -> None:
    rows = sorted(rows, key=lambda r: r["rel_path"])
    t = pa.table(
        {f.name: pa.array([r[f.name] for r in rows], f.type)
         for f in _MANIFEST_SCHEMA},
        schema=_MANIFEST_SCHEMA,
    )
    path = os.path.join(dest_root, MANIFEST_NAME)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def verify_copy(src_root: str, dest_root: str, glob: str = "*") -> list[str]:
    """Deep integrity check: rel paths whose destination bytes differ from
    the source (missing counts as differing). Driver-side sequential —
    it's a diagnostic, not the hot path."""
    bad = []
    for e in list_files(src_root, glob):
        dst = os.path.join(dest_root, e.rel_path)
        if not os.path.exists(dst):
            bad.append(e.rel_path)
            continue
        if _md5_file(dst) != _md5_file(os.path.join(src_root, e.rel_path)):
            bad.append(e.rel_path)
    return bad


def copy_lake(src_lake: str, dst_lake: str, num_units: int | None = None,
              verify: bool = True) -> dict:
    """Disaster-recovery lake clone (gobblin-distcp over a whole dataset,
    CopyableDatasetBase posture): checksum-verified copy of everything a
    lake needs to SERVE and RESUME — ``data/`` (bases + deltas),
    ``_checkpoints/`` (the manifest chain IS the watermark/commit state)
    and the ``_errors/`` quarantine — while excluding run-scoped state
    that must not travel (``_locks``: liveness is host-local;
    ``_staging``: uncommitted by definition; ``_metrics``: flight
    recorder, observational). Takes the SOURCE job lock so no commit is
    mid-flight: the clone is a consistent snapshot at a committed
    watermark, and a ``CdcEngine`` pointed at it resumes replay exactly
    where the source stood (run_copy is resumable + idempotent per
    subtree via its own manifest). Re-running after the source advanced
    copies only changed files (mtime+size diff) — an incremental DR sync.
    """
    from .locks import FileJobLock

    out = {"files_listed": 0, "files_copied": 0, "bytes": 0, "subtrees": []}
    with FileJobLock(os.path.join(src_lake, "_locks")):
        # _views travels too: registered materialized-view state (meta +
        # state parquet) is durable engine state a DR clone must serve
        for sub in ("data", "_checkpoints", "_errors", "_refs", "_views"):
            src = os.path.join(src_lake, sub)
            if not os.path.isdir(src):
                continue
            r = run_copy(src, os.path.join(dst_lake, sub),
                         num_units=num_units, verify=verify)
            out["files_listed"] += r["files_listed"]
            out["files_copied"] += r["files_copied"]
            out["bytes"] += r.get("bytes", 0)
            out["subtrees"].append(sub)
    return out


def link_lake(src_lake: str, dst_lake: str) -> dict:
    """Zero-copy lake clone via hardlinks — the instant dev-branch /
    test-sandbox variant of ``copy_lake`` (Iceberg's metadata-level
    shallow clone posture, done at the filesystem layer).

    Correctness rests on the repo-wide write discipline: every file
    mutation anywhere in this codebase is tmp + ``os.replace`` (never an
    in-place write) — a replace on either side DETACHES its directory
    entry from the shared inode instead of mutating it, so compaction,
    purge, vacuum, DML or retention on one lake can never corrupt the
    other; vacuum merely unlinks its own name (the inode lives until the
    last link drops). Same source-lock + subtree policy as ``copy_lake``
    (``_locks``/``_staging``/``_metrics`` excluded). Cross-device links
    fall back to a byte copy per file (EXDEV). No Ray session: O(files)
    metadata ops.
    """
    from .locks import FileJobLock

    out = {"files_linked": 0, "files_copied": 0, "subtrees": []}
    with FileJobLock(os.path.join(src_lake, "_locks")):
        for sub in ("data", "_checkpoints", "_errors", "_refs", "_views",
                    "_stats"):
            src = os.path.join(src_lake, sub)
            if not os.path.isdir(src):
                continue
            for root, _dirs, files in os.walk(src):
                rel_root = os.path.relpath(root, src_lake)
                dst_root = os.path.join(dst_lake, rel_root)
                os.makedirs(dst_root, exist_ok=True)
                for fn in files:
                    if fn.endswith(".tmp"):
                        continue
                    sp = os.path.join(root, fn)
                    dp = os.path.join(dst_root, fn)
                    if os.path.exists(dp):
                        os.remove(dp)
                    try:
                        os.link(sp, dp)
                        out["files_linked"] += 1
                    except OSError:
                        shutil.copy2(sp, dp)
                        out["files_copied"] += 1
            out["subtrees"].append(sub)
    return out
