"""Checkpoint manifest store: per-epoch, per-bucket lineage + watermarks.

The Ray-native analog of Gobblin's state store + watermark storage +
commit-sequence machinery:

- one JSON manifest per committed epoch under ``<lake>/_checkpoints/``
  written atomically via tmp + ``os.replace`` (FsStateStore.put:156-174
  writes via ``_tmp_`` + rename),
- each manifest row carries per-bucket ``(low_seq, high_seq]`` applied
  ranges, event counts, output row counts and the base-file epoch —
  the Iceberg-offset-range idea (IcebergMetadataWriter.mergeOffsets:406-435)
  that makes re-applies of covered ranges no-ops,
- buckets with zero events still get a row with ``low == high`` so the
  watermark is carried forward (empty-WorkUnit analog,
  gobblin-modules/gobblin-kafka-common/.../KafkaSource.java:568-574),
- resume point = the highest epoch with a manifest file
  (AbstractJobLauncher.java:453-458 commit-sequence resume).

The manifest is written by the driver only — no distributed writes to the
checkpoint store (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

CHECKPOINT_DIR = "_checkpoints"
STAGING_DIR = "_staging"
DATA_DIR = "data"
ERRORS_DIR = "_errors"

# Version tag of the url -> bucket routing hash. The hash IS the lake's
# physical layout: a driver whose hash differs from the manifest's would
# route updates/deletes for existing urls to the WRONG bucket (silent
# duplicates / undeletable rows). Manifests written before this field
# existed used the pandas-siphash router, so from_json defaults to that
# tag and the engine refuses to resume across a hash change.
BUCKET_HASH_VERSION = "arrow-poly131-splitmix64-v1"
_LEGACY_BUCKET_HASH = "pandas-siphash-v0"


@dataclass
class BucketState:
    """Lineage for one url-hash bucket as of a committed epoch.

    Merge-on-read layout: one base file (``base_epoch``) plus zero or more
    delta files (``delta_epochs``, ascending). An epoch either appends one
    LWW-reduced delta (O(epoch events)) or compacts base+deltas into a new
    base (amortized by EngineConfig.compact_every) — Gobblin's separation
    of ingestion from the compaction job (SURVEY §3.3)."""

    bucket: int
    high_seq: int  # high watermark: all events with seq <= high applied
    base_epoch: int  # epoch whose base file holds this bucket's data
    rows: int  # live + tombstone rows across base + delta files
    events_applied: int  # cumulative events applied to this bucket
    events_epoch: int = 0  # events applied in THIS epoch (salt-plan input);
    # 0 == watermark carried forward with no work (empty-WorkUnit analog)
    delta_epochs: list = field(default_factory=list)
    delta_rows: int = 0  # rows across outstanding delta files (the
    # RecompactionCondition file-ratio input; 0 after a compaction)
    # Per-file warc_ts zone map captured AT WRITE TIME (Iceberg posture:
    # the manifest carries file stats, so pruned reads never re-open
    # footers): {"base": [min_us, max_us], "<delta_epoch>": [...]}.
    # Optional — maintenance paths that rewrite files without ranges
    # (rebucket/DML/purge/repair/forced compact) leave entries absent
    # and readers fall back to a footer scan FOR THOSE FILES ONLY
    # (stats.zone_ranges); absent can only mean less pruning, never a
    # wrong read.
    ts_ranges: dict = field(default_factory=dict)
    # Merge-task wall seconds for THIS epoch (0.0 when untouched): the
    # straggler signal salt_plan consumes alongside events_epoch — a
    # bucket whose merge dominated the epoch wall gets salted next epoch
    # even when its event COUNT looked even (skewed row widths / compact
    # turns). Mid-run hot-work-unit re-split analog
    # (gobblin-api/.../stream/WorkUnitChangeEvent.java), resolved at the
    # next plan instead of mid-epoch.
    merge_sec: float = 0.0
    # Salt applied to this bucket THIS epoch (0 = unsalted): the
    # hysteresis input — once salted, the heavy reduce moves into the
    # untimed salted-partial stage and merge_sec collapses, so without
    # memory the bucket would unsalt and flap on alternating epochs.
    salt_carry: int = 0


@dataclass
class Manifest:
    """State of the lake after committing ``epoch``."""

    epoch: int
    low_seq: int  # this epoch applied events in (low_seq, high_seq]
    high_seq: int
    num_buckets: int
    schema_fingerprint: str
    schema_ipc: str  # base64 Arrow-IPC serialization of the base schema
    buckets: dict[int, BucketState] = field(default_factory=dict)
    event_count: int = 0  # events applied in this epoch
    error_count: int = 0  # rows diverted to the error sink this epoch
    metrics: dict = field(default_factory=dict)  # cumulative named counters
    # as of this commit (MetricContext rollup; purely observational)
    bucket_hash: str = BUCKET_HASH_VERSION  # url->bucket router version
    # Cumulative STORED-name -> CURRENT-name map (metadata-only column
    # renames; Iceberg rename analog). Readers apply it to every data
    # file before conforming to base_schema; files rewritten by
    # compaction land with current names and the map becomes inert for
    # them (apply_renames skips when the target name is present).
    column_renames: dict[str, str] = field(default_factory=dict)
    # Persisted table constraints (Delta ADD CONSTRAINT analog, enforced
    # in the reference's row-policy posture: violating EVENTS divert to
    # the error sink instead of failing the write): {name: spec dict},
    # see constraints.py for the spec grammar. Metadata-only DDL.
    constraints: dict[str, dict] = field(default_factory=dict)

    def base_schema(self):
        """Deserialize the committed base schema (Arrow IPC round-trip)."""
        import base64

        import pyarrow as pa

        return pa.ipc.read_schema(
            pa.BufferReader(base64.b64decode(self.schema_ipc))
        )

    @staticmethod
    def encode_schema(schema) -> str:
        import base64

        return base64.b64encode(schema.serialize().to_pybytes()).decode()

    def to_json(self) -> dict:
        return {
            "epoch": self.epoch,
            "low_seq": self.low_seq,
            "high_seq": self.high_seq,
            "num_buckets": self.num_buckets,
            "schema_fingerprint": self.schema_fingerprint,
            "schema_ipc": self.schema_ipc,
            "schema_human": [
                [f.name, str(f.type)] for f in self.base_schema()
            ],
            "event_count": self.event_count,
            "error_count": self.error_count,
            "metrics": self.metrics,
            "bucket_hash": self.bucket_hash,
            "column_renames": self.column_renames,
            "constraints": self.constraints,
            "buckets": {
                str(b): vars(s) for b, s in sorted(self.buckets.items())
            },
        }

    @classmethod
    def from_json(cls, d: dict) -> "Manifest":
        m = cls(
            epoch=d["epoch"],
            low_seq=d["low_seq"],
            high_seq=d["high_seq"],
            num_buckets=d["num_buckets"],
            schema_fingerprint=d["schema_fingerprint"],
            schema_ipc=d["schema_ipc"],
            event_count=d.get("event_count", 0),
            error_count=d.get("error_count", 0),
            metrics=d.get("metrics", {}),
            bucket_hash=d.get("bucket_hash", _LEGACY_BUCKET_HASH),
            column_renames=d.get("column_renames", {}),
            constraints=d.get("constraints", {}),
        )
        m.buckets = {int(b): BucketState(**s) for b, s in d["buckets"].items()}
        return m


class CheckpointStore:
    """Reads/writes epoch manifests under ``<lake>/_checkpoints/``."""

    def __init__(self, lake_dir: str):
        self.dir = os.path.join(lake_dir, CHECKPOINT_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"epoch={epoch:06d}.json")

    def committed_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("epoch=") and name.endswith(".json"):
                out.append(int(name[len("epoch=") : -len(".json")]))
        return sorted(out)

    def latest(self) -> Manifest | None:
        epochs = self.committed_epochs()
        return self.load(epochs[-1]) if epochs else None

    def load(self, epoch: int) -> Manifest:
        with open(self._path(epoch)) as f:
            return Manifest.from_json(json.load(f))

    def commit(self, manifest: Manifest) -> None:
        """Atomic publish: the manifest file appearing IS the commit."""
        path = self._path(manifest.epoch)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest.to_json(), f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def is_applied(self, epoch: int) -> bool:
        return os.path.exists(self._path(epoch))


def base_path(lake_dir: str, bucket: int, epoch: int) -> str:
    """Bucket base-file path for a given epoch (immutable once promoted)."""
    return os.path.join(
        lake_dir, DATA_DIR, f"bucket={bucket:05d}", f"base-epoch{epoch:06d}.parquet"
    )


def delta_path(lake_dir: str, bucket: int, epoch: int) -> str:
    """Bucket delta-file path: the LWW-reduced events of one epoch."""
    return os.path.join(
        lake_dir, DATA_DIR, f"bucket={bucket:05d}", f"delta-epoch{epoch:06d}.parquet"
    )


def bucket_files(lake_dir: str, state: "BucketState") -> list[str]:
    """All live data files of a bucket (base first, then deltas ascending)."""
    files = []
    if state.base_epoch >= 0:
        files.append(base_path(lake_dir, state.bucket, state.base_epoch))
    files += [delta_path(lake_dir, state.bucket, e) for e in state.delta_epochs]
    return files


def errors_path(lake_dir: str, bucket: int, epoch: int) -> str:
    """Committed error-sink file (RowLevelPolicy ERR_FILE analog).
    Same (lake, bucket, epoch) argument order as base_path/delta_path."""
    return os.path.join(
        lake_dir, ERRORS_DIR, f"epoch={epoch:06d}", f"bucket={bucket:05d}.parquet"
    )


def staging_path(lake_dir: str, epoch: int, bucket: int, kind: str = "base") -> str:
    """Deterministic, attempt-agnostic staged output name (speculative-safe:
    retried tasks overwrite the same name via tmp+replace)."""
    return os.path.join(
        lake_dir, STAGING_DIR, f"epoch={epoch:06d}", f"bucket={bucket:05d}.{kind}.parquet"
    )


def promote(lake_dir: str, epoch: int, buckets: list[int] | list[tuple[int, str]]) -> None:
    """Phase 1 of the two-phase commit: staged bucket files -> data dir.

    ``buckets`` entries are (bucket, kind) with kind 'base' | 'delta' |
    'errors' (bare ints mean 'base'). Error-sink files ride the same
    staged→promoted path so an uncommitted epoch never leaves error parquet
    visible under _errors/. Idempotent like FsRenameCommitStep
    (isCompleted = dest exists,
    gobblin-core/.../commit/FsRenameCommitStep.java:131-149): a bucket whose
    destination already exists is skipped, so a crashed promote resumes.
    """
    dst_of = {"base": base_path, "delta": delta_path, "errors": errors_path}
    for entry in buckets:
        b, kind = entry if isinstance(entry, tuple) else (entry, "base")
        dst = dst_of[kind](lake_dir, b, epoch)
        if os.path.exists(dst):
            continue
        src = staging_path(lake_dir, epoch, b, kind)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)


def promote_sidecar(
    lake_dir: str, epoch: int, prefix: str, dest_root: str
) -> int:
    """Phase-1 commit step for SIDECAR indexes riding an epoch's two-phase
    commit (e.g. the dedup-on-ingest near-dup index): move the epoch's
    staged flat files ``{prefix}part={p}.<name>`` into
    ``dest_root/part={p}/<name>``. Files are content-fingerprint-named by
    their writers, so the promote is idempotent the same way
    ``promote`` is (dest exists -> drop the staged copy), and a crashed
    promote resumes. Must run BEFORE the manifest write: committed epoch
    => sidecar promoted; sidecar promoted but uncommitted => the epoch
    re-executes and reproduces identical staged files. Staged as FLAT
    files (no subdir) so the vacuum staging sweep handles leftovers of
    crashed epochs. Returns files promoted."""
    sdir = os.path.join(lake_dir, STAGING_DIR, f"epoch={epoch:06d}")
    if not os.path.isdir(sdir):
        return 0
    n = 0
    for name in sorted(os.listdir(sdir)):
        if not name.startswith(prefix):
            continue
        rest = name[len(prefix):]  # "part=<p>.<fname>"
        pband, _, fname = rest.partition(".")
        if not pband.startswith("part=") or not fname:
            continue
        ddir = os.path.join(dest_root, pband)
        os.makedirs(ddir, exist_ok=True)
        dst = os.path.join(ddir, fname)
        src = os.path.join(sdir, name)
        if os.path.exists(dst):
            os.remove(src)
        else:
            os.replace(src, dst)
        n += 1
    return n


def sweep_unreferenced(lake_dir: str, keep_files: set[str]) -> int:
    """Delete every file under ``data/`` not in ``keep_files``; returns the
    count. ONE definition shared by vacuum / manifest-retention / rollback /
    purge (four near-identical copies once risked diverging on fixes).
    Foreign entries — stray dotfiles, crash leftovers, non-directories —
    are skipped, never fatal: a '.DS_Store' must not abort the cleanup that
    bounds disk growth."""
    removed = 0
    data = os.path.join(lake_dir, DATA_DIR)
    if not os.path.isdir(data):
        return 0
    for bdir in os.listdir(data):
        full = os.path.join(data, bdir)
        if not os.path.isdir(full):
            continue
        for name in os.listdir(full):
            p = os.path.join(full, name)
            if p not in keep_files and os.path.isfile(p):
                os.remove(p)
                removed += 1
    return removed


def vacuum(lake_dir: str, manifest: Manifest) -> int:
    """Delete base/delta files superseded by the committed manifest (and
    stale staging dirs of committed epochs). Returns files removed.
    Tagged manifests (refs.py) PIN their files: a tag must survive the
    run-path vacuum or named time travel silently breaks."""
    keep = {
        p for s in manifest.buckets.values() for p in bucket_files(lake_dir, s)
    }
    from . import refs

    store = CheckpointStore(lake_dir)
    for e in refs.tagged_epochs(lake_dir):
        if e != manifest.epoch and os.path.exists(store._path(e)):
            for s in store.load(e).buckets.values():
                keep.update(bucket_files(lake_dir, s))
    removed = sweep_unreferenced(lake_dir, keep)
    stage_root = os.path.join(lake_dir, STAGING_DIR)
    if os.path.isdir(stage_root):
        for edir in os.listdir(stage_root):
            full = os.path.join(stage_root, edir)
            try:
                epoch = int(edir.split("=")[1])
            except (IndexError, ValueError):
                continue  # foreign entry: not ours to touch
            if not os.path.isdir(full):
                continue
            if epoch <= manifest.epoch:
                for name in os.listdir(full):
                    os.remove(os.path.join(full, name))
                    removed += 1
                os.rmdir(full)
    return removed


def atomic_write_table(table, path: str) -> None:
    """Parquet write via tmp + rename so readers never see partial files and
    task retries are idempotent (FsDataWriter staging-commit analog,
    gobblin-core/.../writer/FsDataWriter.java:108-270).

    zstd: webtext compresses ~2x better than snappy, trading cheap CPU for
    scarce IO — the right trade for an IO-bound lake (and this sandbox)."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd", compression_level=3)
    os.replace(tmp, path)
