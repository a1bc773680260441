"""CdcEngine: the epoch-loop driver — plan → apply → two-phase commit.

The Ray-Data-native re-expression of Gobblin's job lifecycle
(AbstractJobLauncher.launchJob, gobblin-runtime/.../AbstractJobLauncher.java:433):

    resume from checkpoint manifest            # commit-sequence replay :453-458
    for each epoch in plan_epochs(log, wm):    # Source.getWorkunits analog
        read pruned event shards (predicate + schema pushdown)
        map_batches: normalize / row policies  # Converter + RowLevelPolicy
        map_batches: bucket + salt + partial LWW dedup   # combiner pre-agg
        [hot epoch] groupby(bucket, salt).map_groups(partial LWW)
        groupby(bucket).map_groups(merge with base -> staged parquet)
        promote staged files (idempotent)      # FsRenameCommitStep analog
        commit manifest (atomic JSON)          # DatasetStateCommitStep analog

Heavy data never returns to the driver: merge tasks write bucket base files
directly and return only tiny lineage rows. Exactly-once follows from
deterministic staged names + idempotent promote + the manifest appearing
last (SURVEY.md §4.4).

Scale posture: per-epoch driver work is O(shards + buckets); the single
all-to-all exchange per epoch is the groupby on ``url_bucket`` whose payload
has already been collapsed by within-batch LWW partial dedup (and, for hot
buckets, a salted partial-merge stage). Buckets (``num_buckets``) are sized
so one bucket's base file fits comfortably in a worker's heap — at 100 TB
raise ``num_buckets``, not the block size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import checkpoint as ckpt
from . import plan as planmod
from .checkpoint import BucketState, CheckpointStore, Manifest
from .merge import live_rows, lww_reduce, merge_base_with_events
from .schema import OPS, PAGES_SCHEMA, conform, schema_fingerprint, unify_additive

_ERR_COL = "_err"
_BUCKET_COL = "url_bucket"
_SALT_COL = "_salt"
_N_COL = "_n"  # raw events represented by a partially-reduced row (lineage)


def stable_hash_u64(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic (cross-process, seed-independent) uint64 hash of a
    string column — pandas' fixed-key siphash, vectorized in C. Python's
    builtin hash() is salted per process and must never be used here."""
    arr = values.to_pandas().to_numpy(dtype=object, na_value=None)
    return pd.util.hash_array(arr, categorize=False)


@dataclass
class EngineConfig:
    num_buckets: int = 16
    epoch_width: int = 100_000  # events per epoch (FlushingExtractor interval analog)
    merge_concurrency: int | None = None  # actor-pool size for merge; None = tasks
    hot_factor: float = 4.0  # salt buckets > hot_factor * mean events
    max_salt: int = 8


@dataclass
class EpochReport:
    epoch: int
    low_seq: int
    high_seq: int
    events: int = 0
    errors: int = 0
    buckets_touched: int = 0
    salted_buckets: int = 0


def _normalize_batch(batch: pa.Table) -> pa.Table:
    """Row-level policies (RowLevelPolicy ERR_FILE semantics,
    gobblin-api/.../qualitychecker/row/RowLevelPolicy.java:33-68): annotate
    invalid rows with an error reason instead of failing the task; the merge
    stage diverts them to the error sink."""
    n = batch.num_rows
    err = np.full(n, None, dtype=object)
    op_ok = pc.is_in(batch.column("op"), value_set=pa.array(OPS)).to_numpy(
        zero_copy_only=False
    )
    err[~op_ok] = "bad_op"
    url_ok = pc.fill_null(
        pc.greater(pc.utf8_length(pc.cast(batch.column("url"), pa.string())), 0), False
    ).to_numpy(zero_copy_only=False)
    err[~url_ok] = "null_url"
    ts_ok = pc.is_valid(batch.column("warc_ts")).to_numpy(zero_copy_only=False)
    err[~ts_ok] = "null_ts"
    return batch.append_column(_ERR_COL, pa.array(err, pa.string()))


def _lww_reduce_weighted(tbl: pa.Table) -> pa.Table:
    """LWW-reduce keeping the per-url sum of the ``_n`` weight column, so
    raw applied-event counts survive partial reduction into the lineage."""
    if tbl.num_rows == 0:
        return tbl
    reduced = lww_reduce(tbl)  # sorted by url ascending
    if reduced.num_rows == tbl.num_rows:
        return reduced
    sums = tbl.group_by("url").aggregate([(_N_COL, "sum")]).sort_by("url")
    return reduced.set_column(
        reduced.schema.get_field_index(_N_COL),
        _N_COL,
        sums.column(f"{_N_COL}_sum").cast(pa.int64()),
    )


class _BucketAndReduce:
    """Stateless batch stage: derive bucket (+ salt) columns, then collapse
    the batch with a partial LWW reduce — the combiner that keeps the
    groupby shuffle payload at O(distinct urls per batch), not O(events)."""

    def __init__(self, num_buckets: int, hot_buckets: dict[int, int]):
        self.num_buckets = num_buckets
        self.hot_buckets = hot_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        err_mask = pc.is_valid(batch.column(_ERR_COL)).to_numpy(zero_copy_only=False)
        h = stable_hash_u64(batch.column("url"))
        bucket = (h % self.num_buckets).astype(np.int32)
        bucket[err_mask] = 0  # error rows ride to bucket 0's merge task
        salt = np.zeros(len(bucket), dtype=np.int32)
        if self.hot_buckets:
            sub = (h // self.num_buckets).astype(np.uint64)
            for b, factor in self.hot_buckets.items():
                m = bucket == b
                salt[m] = (sub[m] % factor).astype(np.int32)
        batch = (
            batch.append_column(_BUCKET_COL, pa.array(bucket))
            .append_column(_SALT_COL, pa.array(salt))
            .append_column(_N_COL, pa.array(np.ones(len(bucket), np.int64)))
        )
        good = batch.filter(pa.array(~err_mask))
        bad = batch.filter(pa.array(err_mask))
        reduced = _lww_reduce_weighted(good)
        return pa.concat_tables([reduced, bad]) if bad.num_rows else reduced


def _salted_partial_reduce(group: pa.Table) -> pa.Table:
    """Per-(bucket, salt) partial LWW merge — spreads a hot bucket over
    ``factor`` reducers; correct because LWW is associative."""
    err_mask = pc.is_valid(group.column(_ERR_COL))
    bad = group.filter(err_mask)
    reduced = _lww_reduce_weighted(group.filter(pc.invert(err_mask)))
    return pa.concat_tables([reduced, bad]) if bad.num_rows else reduced


class _MergeBucket:
    """Per-bucket merge-on-read task: read the bucket's current base file,
    LWW-merge the epoch's events into it, write the staged output
    atomically, emit one lineage row. Runs inside groupby(url_bucket)
    .map_groups — the single wide exchange of the epoch."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        base_epochs: dict[int, int],
        base_schema: pa.Schema,
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.base_epochs = base_epochs  # bucket -> epoch of current base file
        self.base_schema = base_schema

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group.column(_BUCKET_COL)[0].as_py())
        err_mask = pc.is_valid(group.column(_ERR_COL))
        errors = group.filter(err_mask)
        events = group.filter(pc.invert(err_mask))
        n_events = int(pc.sum(events.column(_N_COL)).as_py() or 0)
        events = events.drop_columns([_ERR_COL, _BUCKET_COL, _SALT_COL, _N_COL])

        if errors.num_rows:
            ckpt.atomic_write_table(
                errors.drop_columns([_SALT_COL, _N_COL]),
                os.path.join(
                    self.lake_dir,
                    ckpt.ERRORS_DIR,
                    f"epoch={self.epoch:06d}",
                    f"bucket={bucket:05d}.parquet",
                ),
            )

        base = None
        prev_epoch = self.base_epochs.get(bucket)
        if prev_epoch is not None:
            base = pq.read_table(ckpt.base_path(self.lake_dir, bucket, prev_epoch))
        merged = merge_base_with_events(base, events, self.base_schema)
        ckpt.atomic_write_table(merged, ckpt.staging_path(self.lake_dir, self.epoch, bucket))
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "events": pa.array([n_events], pa.int64()),
                "errors": pa.array([errors.num_rows], pa.int64()),
            }
        )


class CdcEngine:
    """Driver for one lake (one logical table)."""

    def __init__(self, lake_dir: str, events_dir: str, config: EngineConfig | None = None):
        self.lake_dir = lake_dir
        self.events_dir = events_dir
        self.cfg = config or EngineConfig()
        self.store = CheckpointStore(lake_dir)

    # ---------------- bootstrap (epoch 0: snapshot load) ----------------

    def bootstrap(self, pages_path: str) -> Manifest:
        """Load the initial snapshot into bucketed base files (epoch 0).

        Idempotent: returns the existing manifest if epoch 0 committed.
        """
        import ray.data as rd

        if self.store.is_applied(0):
            return self.store.load(0)

        base_schema = unify_additive(
            pq.read_schema(pages_path),
            pa.schema([("event_seq", pa.int64()), ("is_deleted", pa.bool_())]),
        )
        lake_dir, B, schema = self.lake_dir, self.cfg.num_buckets, base_schema

        def prep(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            batch = batch.append_column(
                "event_seq", pa.array(np.full(n, -1, np.int64))
            ).append_column("is_deleted", pa.array(np.zeros(n, bool)))
            bucket = (stable_hash_u64(batch.column("url")) % B).astype(np.int32)
            return conform(batch, schema).append_column(_BUCKET_COL, pa.array(bucket))

        def write_bucket(group: pa.Table) -> pa.Table:
            bucket = int(group.column(_BUCKET_COL)[0].as_py())
            tbl = group.drop_columns([_BUCKET_COL])
            # Snapshot may itself contain duplicate urls: LWW-reduce it.
            tbl = merge_base_with_events(None, _as_insert_events(tbl), schema)
            ckpt.atomic_write_table(tbl, ckpt.staging_path(lake_dir, 0, bucket))
            return pa.table(
                {
                    "bucket": pa.array([bucket], pa.int32()),
                    "rows": pa.array([tbl.num_rows], pa.int64()),
                }
            )

        def _as_insert_events(tbl: pa.Table) -> pa.Table:
            return tbl.drop_columns(["is_deleted"]).append_column(
                "op", pa.array(["insert"] * tbl.num_rows, pa.string())
            )

        ds = rd.read_parquet(pages_path)
        lineage = (
            ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
            .groupby(_BUCKET_COL)
            .map_groups(write_bucket, batch_format="pyarrow")
            .take_all()
        )

        buckets_touched = [int(r["bucket"]) for r in lineage]
        ckpt.promote(self.lake_dir, 0, buckets_touched)
        manifest = Manifest(
            epoch=0,
            low_seq=-1,
            high_seq=-1,
            num_buckets=B,
            schema_fingerprint=schema_fingerprint(base_schema),
            schema_ipc=Manifest.encode_schema(base_schema),
        )
        for r in lineage:
            b = int(r["bucket"])
            manifest.buckets[b] = BucketState(
                bucket=b, high_seq=-1, base_epoch=0, rows=int(r["rows"]),
                events_applied=0, events_epoch=0,
            )
        # Buckets that received no snapshot rows still get a watermark row.
        for b in range(B):
            if b not in manifest.buckets:
                manifest.buckets[b] = BucketState(
                    bucket=b, high_seq=-1, base_epoch=-1, rows=0,
                    events_applied=0, events_epoch=0,
                )
        self.store.commit(manifest)
        return manifest

    # ---------------- epoch apply ----------------

    def _read_epoch_events(self, log_meta: dict, epoch: planmod.Epoch, events_schema):
        import ray.data as rd

        shards = planmod.prune_shards(log_meta, epoch.low_seq, epoch.high_seq)
        paths = [os.path.join(self.events_dir, s["file"]) for s in shards]
        flt = (pc.field("event_seq") > pa.scalar(epoch.low_seq)) & (
            pc.field("event_seq") <= pa.scalar(epoch.high_seq)
        )
        return rd.read_parquet(paths, schema=events_schema, filter=flt)

    def _event_schemas(self, log_meta: dict, shards: list[dict]) -> pa.Schema:
        seen: dict[int, pa.Schema] = {}
        for s in shards:
            v = s.get("schema_version", 0)
            if v not in seen:
                seen[v] = pq.read_schema(os.path.join(self.events_dir, s["file"]))
        return unify_additive(*seen.values())

    def apply_epoch(
        self, epoch: planmod.Epoch, manifest: Manifest, log_meta: dict
    ) -> tuple[Manifest, EpochReport]:
        """Apply one ``(low, high]`` interval. Idempotent: if this epoch's
        manifest exists the committed result is returned untouched."""
        if self.store.is_applied(epoch.index):
            return self.store.load(epoch.index), EpochReport(
                epoch.index, epoch.low_seq, epoch.high_seq
            )

        shards = planmod.prune_shards(log_meta, epoch.low_seq, epoch.high_seq)
        events_schema = self._event_schemas(log_meta, shards)
        base_schema = unify_additive(
            manifest.base_schema(),
            pa.schema([f for f in events_schema if f.name != "op"]).append(
                pa.field("is_deleted", pa.bool_())
            ),
        )

        prev_counts = {b: s.events_epoch for b, s in manifest.buckets.items()}
        splan = planmod.salt_plan(
            prev_counts, self.cfg.num_buckets, self.cfg.hot_factor, self.cfg.max_salt
        )

        ds = self._read_epoch_events(log_meta, epoch, events_schema)
        ds = ds.map_batches(_normalize_batch, batch_format="pyarrow", batch_size=None)
        ds = ds.map_batches(
            _BucketAndReduce(self.cfg.num_buckets, splan.hot_buckets),
            batch_format="pyarrow",
            batch_size=None,
        )
        if splan.hot_buckets:
            ds = ds.groupby([_BUCKET_COL, _SALT_COL]).map_groups(
                _salted_partial_reduce, batch_format="pyarrow"
            )

        base_epochs = {
            b: s.base_epoch for b, s in manifest.buckets.items() if s.base_epoch >= 0
        }
        merge = _MergeBucket(self.lake_dir, epoch.index, base_epochs, base_schema)

        def merge_bucket(group: pa.Table) -> pa.Table:
            return merge(group)

        lineage = (
            ds.groupby(_BUCKET_COL)
            .map_groups(merge_bucket, batch_format="pyarrow")
            .take_all()
        )

        touched = {int(r["bucket"]): r for r in lineage}
        ckpt.promote(self.lake_dir, epoch.index, sorted(touched))

        new = Manifest(
            epoch=epoch.index,
            low_seq=epoch.low_seq,
            high_seq=epoch.high_seq,
            num_buckets=manifest.num_buckets,
            schema_fingerprint=schema_fingerprint(base_schema),
            schema_ipc=Manifest.encode_schema(base_schema),
        )
        report = EpochReport(epoch.index, epoch.low_seq, epoch.high_seq)
        report.salted_buckets = len(splan.hot_buckets)
        for b, prev in manifest.buckets.items():
            r = touched.get(b)
            if r is not None:
                n_ev, n_err = int(r["events"]), int(r["errors"])
                new.buckets[b] = BucketState(
                    bucket=b,
                    high_seq=epoch.high_seq,
                    base_epoch=epoch.index,
                    rows=int(r["rows"]),
                    events_applied=prev.events_applied + n_ev,
                    events_epoch=n_ev,
                )
                report.events += n_ev
                report.errors += n_err
                report.buckets_touched += 1
            else:
                # Zero events this epoch: watermark carried forward,
                # base file untouched (low == high in lineage terms).
                new.buckets[b] = BucketState(
                    bucket=b,
                    high_seq=epoch.high_seq,
                    base_epoch=prev.base_epoch,
                    rows=prev.rows,
                    events_applied=prev.events_applied,
                    events_epoch=0,
                )
        new.event_count = report.events
        new.error_count = report.errors
        self.store.commit(new)
        return new, report

    # ---------------- top-level run ----------------

    def run(
        self, max_epochs: int | None = None, vacuum: bool = True
    ) -> list[EpochReport]:
        """Resume from the latest manifest and replay the log to its head."""
        manifest = self.store.latest()
        if manifest is None:
            raise RuntimeError("lake not bootstrapped — call bootstrap(pages) first")
        log_meta = planmod.load_log_meta(self.events_dir)
        epochs = planmod.plan_epochs(
            log_meta, manifest.high_seq, self.cfg.epoch_width, manifest.epoch + 1
        )
        if max_epochs is not None:
            epochs = epochs[:max_epochs]
        reports = []
        for ep in epochs:
            manifest, report = self.apply_epoch(ep, manifest, log_meta)
            reports.append(report)
        if vacuum and reports:
            ckpt.vacuum(self.lake_dir, manifest)
        return reports

    # ---------------- readers ----------------

    def base_files(self, manifest: Manifest | None = None) -> list[str]:
        manifest = manifest or self.store.latest()
        return [
            ckpt.base_path(self.lake_dir, b, s.base_epoch)
            for b, s in sorted(manifest.buckets.items())
            if s.base_epoch >= 0 and s.rows > 0
        ]

    def read_table(self, manifest: Manifest | None = None):
        """The lake's live rows as a streaming Dataset (tombstones and
        bookkeeping dropped) — the merge-on-read reader."""
        import ray.data as rd

        files = self.base_files(manifest)
        # partitioning=None: the bucket=NNNNN dirs are layout, not hive columns.
        ds = rd.read_parquet(
            files,
            filter=pc.field("is_deleted") == pa.scalar(False),
            partitioning=None,
        )
        return ds.drop_columns(["is_deleted"])

    def read_table_arrow(self, manifest: Manifest | None = None) -> pa.Table:
        """Driver-side materialized view — tests/small lakes only."""
        manifest = manifest or self.store.latest()
        tables = [
            live_rows(pq.read_table(p)) for p in self.base_files(manifest)
        ]
        if not tables:
            return conform(pa.table({}), manifest.base_schema())
        schema = unify_additive(*[t.schema for t in tables])
        return pa.concat_tables([conform(t, schema) for t in tables]).sort_by(
            [("url", "ascending")]
        )
