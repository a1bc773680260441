"""Cascaded CDC replication: maintain a downstream replica lake purely
from the primary's change feed.

This is the completeness proof for the CDC-out surface (and the classic
"lake → lake" topology the reference runs as distcp-style replication
jobs, gobblin-distcp/gobblin-data-management ReplicationConfiguration):
if a replica bootstrapped from the same snapshot and fed ONLY
``read_changes_full`` rows converges byte-identically, the feed loses
nothing. Correctness rests on two invariants the engine already proves:
the feed carries every row's true (warc_ts, event_seq) LWW position
(tombstone identity for deletes — see read_changes_full), and LWW apply
is order-independent, so the replica may re-epoch the feed however it
likes.

Scale shape: the export is the per-bucket-local diff (no shuffle) piped
straight into a sharded Parquet write; the replica ingest is the normal
engine path (its own epochs, salting, exactly-once commits). Nothing is
ever collected on a driver.
"""

from __future__ import annotations

import os

import pyarrow as pa


def export_change_log(eng, out_dir: str, from_epoch: int = 0,
                      to_epoch: int | None = None) -> int:
    """Write the full-row change feed as a replayable event-log directory
    (shards named like the producer's; ``plan.load_log_meta``'s footer
    fallback derives shard metadata, so no ``_meta.json`` is needed).
    Returns the number of change events exported."""
    feed = eng.read_changes_full(from_epoch, to_epoch)

    def to_events(t: pa.Table) -> pa.Table:
        cols = t.column_names
        return t.rename_columns(["op" if c == "change_type" else c
                                 for c in cols])

    events = feed.map_batches(to_events, batch_format="pyarrow",
                              batch_size=None)
    os.makedirs(out_dir, exist_ok=True)
    events.write_parquet(out_dir)
    # count from footers so the pipeline runs exactly once (the write IS
    # the consumption; a count() on the lazy dataset would re-execute it)
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet")
    )


def replicate(src_eng, dst_lake: str, pages_path: str, feed_dir: str,
              cfg=None, from_epoch: int = 0):
    """One replication round: export the primary's committed feed, then
    bootstrap-and-run a replica engine over it. Returns the replica
    engine (idempotent: a second call exports an empty delta and the
    replica's exactly-once watermark makes the run a no-op)."""
    from .engine import CdcEngine, EngineConfig

    export_change_log(src_eng, feed_dir, from_epoch=from_epoch)
    dst = CdcEngine(dst_lake, feed_dir, cfg or EngineConfig())
    dst.bootstrap(pages_path)
    dst.run()
    return dst
