"""Anti-entropy verify/repair between two lakes with the same layout.

The replication path (replicate.py) PROVES convergence when nothing goes
wrong; this module is the recovery path when something did — bit-rot, a
partial restore, an operator edit, a missed feed span. It is the
Cassandra/Dynamo anti-entropy posture composed with the reference's
distcp verification step (gobblin-data-management's CopyableFile carries
a checksum and the publisher verifies it; here the unit is a BUCKET's
merged state, not a file, because two byte-different file layouts can
hold the identical state — e.g. a compacted source vs an uncompacted
replica).

Shape:
- ``bucket_digests``: one merge+hash task per bucket, NO exchange (the
  bucket router already co-locates state); each task returns 24 bytes.
  Driver state is O(buckets).
- ``repair``: digests both sides, rewrites only MISMATCHED buckets from
  the source's merged state, and commits on the destination as a
  maintenance epoch (watermark PINNED, same posture as compact_now).
  A ``dry_run`` is the pure verification job.

Digest definition (content, not bytes): an ORDER-INDEPENDENT uint64 sum
of per-row content hashes (profile._row_hash_u64 — deterministic across
processes, null-safe, float-bit-exact), split into LIVE rows hashed over
every current-name column and TOMBSTONES hashed over their LWW identity
(url, warc_ts, event_seq) only — a tombstone's payload columns are
incidental (a delete event carries no content, and purge fallbacks can
differ legitimately) but its identity decides future LWW outcomes, so it
must match. Sum-of-hashes makes the digest independent of row order,
chunking and file layout; a missed mismatch needs hash-sum collision
(~2^-64), and only ever UNDER-reports differences.

Preconditions (errors otherwise): equal bucket count, equal router stamp
(digests are only comparable when url->bucket routing is identical),
equal committed watermark (anti-entropy compares states that are
SUPPOSED to be identical; catch a lagging replica up with replicate.py
first), and equal current base schema. Both lakes must be reachable from
the workers (shared or mounted storage — the same assumption distcp
makes for its source).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import checkpoint as ckpt
from .schema import apply_renames, conform

_IDENTITY = ["url", "warc_ts", "event_seq", "is_deleted"]

_DIGEST_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("rows", pa.int64()),
    ("live_sum", pa.uint64()),
    ("tomb_sum", pa.uint64()),
])


def _state_sums(t: pa.Table, schema: pa.Schema) -> tuple[int, int, int]:
    """(rows, live_sum, tomb_sum) of one bucket's merged state."""
    from .functions.profile import _row_hash_u64

    dead = pc.fill_null(t.column("is_deleted"), False)
    live = t.filter(pc.invert(dead))
    tomb = t.filter(dead)
    with np.errstate(over="ignore"):
        live_sum = int(_row_hash_u64(live, schema.names).sum(
            dtype=np.uint64)) if live.num_rows else 0
        tomb_sum = int(_row_hash_u64(tomb, _IDENTITY).sum(
            dtype=np.uint64)) if tomb.num_rows else 0
    return t.num_rows, live_sum, tomb_sum


def bucket_digests(eng, manifest=None):
    """Per-bucket content digests of a lake's merged state: a Dataset of
    ``(bucket, rows, live_sum, tomb_sum)``, one merge+hash task per
    bucket, nothing but O(buckets) rows leaving the workers."""
    import ray.data as rd

    from .merge import merge_bases

    m = manifest if manifest is not None else eng.store.latest()
    if m is None:
        raise ValueError("bucket_digests needs a bootstrapped lake")
    schema = m.base_schema()
    ren = dict(m.column_renames)
    fmap = eng.bucket_file_map(m)
    specs = [{"bucket": b, "files": fmap[b]} for b in sorted(fmap)]

    def digest(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            t = conform(merge_bases(
                [apply_renames(pq.read_table(p), ren)
                 for p in row["files"]], schema), schema)
            n, ls, ts = _state_sums(t, schema)
            rows.append({"bucket": int(row["bucket"]), "rows": n,
                         "live_sum": ls, "tomb_sum": ts})
        return pa.Table.from_pylist(rows, schema=_DIGEST_SCHEMA)

    digest.__name__ = "bucket_digest"
    return rd.from_items(specs).map_batches(
        digest, batch_format="pyarrow", batch_size=1)


def _check_comparable(m_src, m_dst) -> None:
    if m_src.num_buckets != m_dst.num_buckets:
        raise ValueError(
            f"repair needs identical bucket layouts: source has "
            f"{m_src.num_buckets}, destination {m_dst.num_buckets} "
            f"(rebucket one side first)")
    if m_src.bucket_hash != m_dst.bucket_hash:
        raise ValueError(
            f"repair needs the same bucket router: source "
            f"{m_src.bucket_hash!r} vs destination {m_dst.bucket_hash!r}")
    if m_src.high_seq != m_dst.high_seq:
        raise ValueError(
            f"repair compares states at the SAME watermark: source "
            f"high_seq={m_src.high_seq} vs destination "
            f"{m_dst.high_seq} (replicate the lagging side to head "
            f"first)")
    if not m_src.base_schema().equals(m_dst.base_schema()):
        raise ValueError("repair needs identical current base schemas")


def repair(src_eng, dst_eng, dry_run: bool = False) -> dict:
    """Verify the destination lake against the source bucket by bucket
    and (unless ``dry_run``) rewrite only the mismatched buckets from the
    source's merged state, committing a maintenance epoch on the
    destination (watermark pinned, deltas for repaired buckets cleared —
    the repaired base IS the full state). Idempotent: a second call finds
    zero mismatches. Returns ``{"checked", "mismatched", "repaired",
    "rows_written"}`` with ``mismatched`` as the sorted bucket list."""
    from contextlib import nullcontext

    import ray.data as rd

    from .checkpoint import BucketState, Manifest
    from .locks import FileJobLock
    from .merge import merge_bases

    lock = (FileJobLock(os.path.join(dst_eng.lake_dir, "_locks"))
            if dst_eng.cfg.job_lock else nullcontext())
    with lock:
        m_src = src_eng.store.latest()
        m_dst = dst_eng.store.latest()
        if m_src is None or m_dst is None:
            raise ValueError("repair needs two bootstrapped lakes")
        _check_comparable(m_src, m_dst)

        src_d = {r["bucket"]: r for r in
                 bucket_digests(src_eng, m_src).take_all()}
        dst_d = {r["bucket"]: r for r in
                 bucket_digests(dst_eng, m_dst).take_all()}
        mismatched = sorted(
            b for b in src_d
            if (src_d[b]["live_sum"], src_d[b]["tomb_sum"])
            != (dst_d.get(b, {}).get("live_sum"),
                dst_d.get(b, {}).get("tomb_sum")))
        report = {"checked": len(src_d), "mismatched": mismatched,
                  "repaired": 0, "rows_written": 0}
        if dry_run or not mismatched:
            return report

        epoch = m_dst.epoch + 1
        schema = m_src.base_schema()
        ren = dict(m_src.column_renames)
        src_map = src_eng.bucket_file_map(m_src)
        dst_lake = dst_eng.lake_dir
        specs = [{"bucket": b, "files": src_map[b]} for b in mismatched]

        def rewrite(batch: pa.Table) -> pa.Table:
            rows = []
            for row in batch.to_pylist():
                b = int(row["bucket"])
                t = conform(merge_bases(
                    [apply_renames(pq.read_table(p), ren)
                     for p in row["files"]], schema), schema)
                t = t.sort_by([("url", "ascending")])
                ckpt.atomic_write_table(
                    t, ckpt.staging_path(dst_lake, epoch, b))
                rows.append({"bucket": b, "rows": t.num_rows})
            return pa.Table.from_pylist(rows, schema=pa.schema([
                ("bucket", pa.int32()), ("rows", pa.int64())]))

        rewrite.__name__ = "repair_bucket"
        lineage = (rd.from_items(specs)
                   .map_batches(rewrite, batch_format="pyarrow",
                                batch_size=1).take_all())
        touched = [int(r["bucket"]) for r in lineage]
        ckpt.promote(dst_lake, epoch, touched)
        manifest = Manifest(
            epoch=epoch, low_seq=m_dst.high_seq, high_seq=m_dst.high_seq,
            num_buckets=m_dst.num_buckets,
            schema_fingerprint=m_dst.schema_fingerprint,
            schema_ipc=m_dst.schema_ipc, metrics=dict(m_dst.metrics),
            bucket_hash=m_dst.bucket_hash,
            column_renames=dict(m_dst.column_renames),
            constraints=dict(m_dst.constraints),
        )
        for b, s in m_dst.buckets.items():
            manifest.buckets[b] = s
        for r in lineage:
            b = int(r["bucket"])
            old_high = max(
                m_dst.buckets[b].high_seq if b in m_dst.buckets else -1,
                m_src.buckets[b].high_seq if b in m_src.buckets else -1,
            )
            prev = m_dst.buckets.get(b)
            manifest.buckets[b] = BucketState(
                bucket=b, high_seq=old_high, base_epoch=epoch,
                rows=int(r["rows"]),
                events_applied=(prev.events_applied if prev else 0),
                events_epoch=0,
            )
        manifest.metrics["repairs"] = (
            int(manifest.metrics.get("repairs", 0)) + 1)
        dst_eng.store.commit(manifest)
        report["repaired"] = len(touched)
        report["rows_written"] = int(sum(r["rows"] for r in lineage))
        return report
