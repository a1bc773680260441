"""CLI entry point: ``python -m gobblin_ray.cli <cmd>``.

The `bin/gobblin` + EmbeddedGobblin analog
(gobblin-runtime/.../embedded/EmbeddedGobblin.java:122): synthesize a corpus,
bootstrap a lake, replay the change log (resumable), inspect state. On a real
cluster the same module runs under ``ray job submit`` — the driver code is
identical; only ``ray.init`` picks up the cluster address.

This module OWNS its Ray session (guarded init + shutdown); library code
never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


NESTED = False  # flow.py runs cli commands as DAG nodes inside ONE Ray
# session (re-init costs ~20-30 s per node in this sandbox); when set, the
# per-command teardown below is a no-op and the flow runner owns shutdown.


def _ray_down():
    if NESTED:
        return
    import ray

    ray.shutdown()


import threading as _threading

_RAY_UP_LOCK = _threading.Lock()  # module-level: lazy creation would race


def _ray_up(num_cpus: int | None):
    import ray

    # lock: parallel flow branches call concurrently, and a double
    # ray.init race raises instead of no-oping
    with _RAY_UP_LOCK:
        if not ray.is_initialized():
            kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
            ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _simple_predicate(args):
    """Shared --where-null / --where-equals / --where-contains predicate
    builder for the update/delete DML subcommands."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def predicate(t: pa.Table):
        if args.where_null:
            return pc.is_null(t.column(args.where_null))
        if args.where_equals:
            col, val = args.where_equals
            c = t.column(col)
            return pc.equal(c, pa.scalar(val, pa.string()).cast(c.type))
        col, sub = args.where_contains
        return pc.match_substring(t.column(col), sub)

    return predicate


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gobblin_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="generate a deterministic CDC corpus")
    sp.add_argument("out_dir")
    sp.add_argument("--pages", type=int, default=2_000)
    sp.add_argument("--events", type=int, default=20_000)
    sp.add_argument("--shard-rows", type=int, default=2_000)

    for name in ("bootstrap", "run", "status", "read"):
        s = sub.add_parser(name)
        s.add_argument("lake_dir")
        if name in ("bootstrap", "run"):
            s.add_argument("--events-dir", required=True)
            s.add_argument("--buckets", type=int, default=16)
            s.add_argument("--epoch-width", type=int, default=100_000)
        if name == "bootstrap":
            s.add_argument("--pages", required=False,
                           help="pages snapshot parquet (file or shard dir)")
            s.add_argument("--warc-dir", required=False,
                           help="bootstrap straight from a WARC archive "
                                "dir (crawl on-ramp: parse + tag-strip + "
                                "snapshot, then bootstrap)")
        if name in ("bootstrap", "run"):
            s.add_argument("--epoch-bytes", type=int, default=None,
                           help="size-based epoch planning target (bytes)")
            s.add_argument("--neardup", action="store_true",
                           help="dedup-on-ingest: divert INSERT events "
                                "whose text near-dups previously ingested "
                                "content (threshold 0.7) to _errors/; "
                                "survivor sketches join the lake's "
                                "_neardup_index atomically with each "
                                "commit. Pass on bootstrap too so the "
                                "snapshot seeds the index")
            s.add_argument("--neardup-threshold", type=float, default=0.7)
        if name == "run":
            s.add_argument("--compact-every", type=int, default=8,
                           help="compact a bucket after this many delta files")
            s.add_argument("--compact-ratio", type=float, default=None,
                           help="also compact when delta rows >= ratio x base rows")
            s.add_argument("--compact-age", type=int, default=None,
                           help="also compact when the oldest outstanding "
                                "delta is this many epochs old")
            s.add_argument("--max-epochs", type=int, default=None)
            s.add_argument("--max-run-seconds", type=float, default=None,
                           help="early stop (Source.isEarlyStopped analog): "
                                "stop planning new epochs after this budget; "
                                "in-flight epochs still commit, next run "
                                "resumes from the clean watermark")
            s.add_argument("--no-vacuum", action="store_true")
            s.add_argument("--refresh-views", action="store_true",
                           help="fold registered materialized views to "
                                "head after the run (before the vacuum)")
            s.add_argument("--follow", action="store_true",
                           help="continuous tailing: poll for log growth "
                                "(stop by creating <lake>/_STOP)")
            s.add_argument("--poll-interval", type=float, default=2.0)
        if name == "read":
            s.add_argument("--limit", type=int, default=5)
            s.add_argument("--tag", default=None,
                           help="read AS OF the named tag's manifest "
                                "(metadata-only time travel by name)")
            s.add_argument("--ts-min", default=None,
                           help="only rows with warc_ts >= this (ISO); "
                                "prunes buckets/files via the footer zone "
                                "map (free after `analyze`)")
            s.add_argument("--ts-max", default=None,
                           help="only rows with warc_ts <= this (ISO)")
            s.add_argument("--where-equals", nargs=2, default=None,
                           metavar=("COL", "VALUE"),
                           help="equality predicate; prunes whole "
                                "buckets via the Bloom sidecar when "
                                "`analyze --bloom-cols COL` ran")
            s.add_argument("--shard", nargs=2, type=int, default=None,
                           metavar=("I", "M"),
                           help="read bucket shard i of m: an exact, "
                                "disjoint, unbiased 1/m sample of the "
                                "url population at 1/m of the read cost")

    sp = sub.add_parser(
        "analyze", help="ANALYZE TABLE: one streaming pass computes "
        "per-column stats (rows/nulls/min/max/avg-len/KMV distinct) over "
        "the merge-on-read head plus a per-file warc_ts zone map from "
        "parquet footers, persisted to _stats/stats.json at the head "
        "epoch; read --ts-min/--ts-max then prunes for free"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--ndv-k", type=int, default=1024,
                    help="KMV sketch size (exact below this many distinct)")
    sp.add_argument("--bloom-cols", default=None,
                    help="comma-separated columns to (re)build the "
                         "per-file Bloom sidecar for (incremental: "
                         "already-indexed files are reused)")

    sp = sub.add_parser(
        "tag", help="named refs over committed manifests (Iceberg tag "
        "analog): a tag pins its manifest + files against vacuum and "
        "rollback; read --tag NAME time-travels to it. No Ray session."
    )
    sp.add_argument("lake_dir")
    sp.add_argument("name", nargs="?", default=None,
                    help="tag to create (omit with --list)")
    sp.add_argument("--epoch", type=int, default=None,
                    help="epoch to tag (default: head)")
    sp.add_argument("--delete", action="store_true")
    sp.add_argument("--force", action="store_true",
                    help="overwrite an existing tag")
    sp.add_argument("--list", action="store_true", dest="list_tags")

    sp = sub.add_parser(
        "lookup", help="point-lookup serving path: live rows for explicit "
        "urls — routes each key to its owning bucket and opens ONLY those "
        "buckets with the key set pushed into the parquet scan (O(keys), "
        "not a table scan)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--url", action="append", default=[],
                    help="url to look up (repeatable)")
    sp.add_argument("--keys-file", default=None,
                    help="newline-delimited file of urls")

    sp = sub.add_parser(
        "fsck", help="metadata-only lake integrity audit: manifest chain "
        "contiguity + monotone watermark, every head-referenced file "
        "exists with a readable parquet footer and rename-mapped schema, "
        "base/delta layout sanity; reports orphan + staging debris. "
        "Reads footers only — no Ray session, no data scan."
    )
    sp.add_argument("lake_dir")

    sp = sub.add_parser(
        "audit-data", help="DATA-level audit (fsck's sibling one layer "
        "down): sequential row-at-a-time LWW replay of the change log up "
        "to the committed watermark, byte-compared per url against the "
        "lake's live rows — 'did exactly-once actually hold on THIS "
        "lake?'. Driver-side O(corpus); serving-sized lakes / DR spot "
        "checks; no Ray session."
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--corpus-dir", required=True,
                    help="synth corpus root (pages.parquet + events/)")

    sp = sub.add_parser(
        "describe", help="manifest lineage: epoch chain, per-bucket "
        "base/delta layout, compaction debt, metrics (no Ray session)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--buckets", action="store_true",
                    help="include the per-bucket table")
    sp.add_argument("--anomalies", action="store_true",
                    help="Hampel-screen the per-epoch ingest volume "
                         "(|events - median| > k*MAD over the committed "
                         "manifest chain) — the feed-broke / feed-burst "
                         "alarm")
    sp.add_argument("--mad-k", type=float, default=3.5)

    sp = sub.add_parser(
        "changes", help="CDC-out snapshot diff between two committed "
        "manifests: insert/update/delete feed (needs the older manifest's "
        "files — run within the vacuum window)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--from-epoch", type=int, required=True)
    sp.add_argument("--to-epoch", type=int, default=None,
                    help="default: the head manifest")
    sp.add_argument("--limit", type=int, default=5)
    sp.add_argument("--include-before", action="store_true",
                    help="carry Debezium-style before-image old_event_seq "
                         "(what an incremental-view consumer needs)")

    sp = sub.add_parser(
        "clean", help="retention: delete/trash old dataset versions "
        "(DatasetCleaner analog; driver-side metadata work, no Ray session)"
    )
    sp.add_argument("root", help="dataset root containing version dirs")
    sp.add_argument("--glob", default="*", help="version dir glob, e.g. 'dt=*'")
    sp.add_argument("--ts-format", default=None,
                    help="strptime format for the dir name, e.g. 'dt=%%Y-%%m-%%d'; "
                         "default uses mtime")
    sp.add_argument("--retain-days", type=float, default=None,
                    help="delete versions older than this many days")
    sp.add_argument("--newest-k", type=int, default=None,
                    help="retain only the newest K versions")
    sp.add_argument("--max-bytes", type=int, default=None,
                    help="retain the newest versions whose cumulative bytes "
                         "fit this quota (newest always kept)")
    sp.add_argument("--combine-op", choices=["union", "intersect"],
                    default="intersect",
                    help="how to combine --retain-days and --newest-k")
    sp.add_argument("--trash", action="store_true",
                    help="move to <root>/_trash snapshot instead of deleting")
    sp.add_argument("--dry-run", action="store_true")

    sp = sub.add_parser(
        "view", help="engine-maintained incremental materialized views "
        "(counting IVM over the CDC-out feed): --create seeds at head, "
        "--refresh folds forward from the change feed without rescanning "
        "the table (--recompute rebuilds when the feed window is gone), "
        "--read/--list/--drop need no Ray session"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("name", nargs="?", default=None)
    sp.add_argument("--create", action="store_true")
    sp.add_argument("--kind", default="count_sum_by_host")
    sp.add_argument("--refresh", action="store_true")
    sp.add_argument("--recompute", action="store_true")
    sp.add_argument("--read", action="store_true", dest="read_view")
    sp.add_argument("--drop", action="store_true", dest="drop_view")
    sp.add_argument("--list", action="store_true", dest="list_views")

    sp = sub.add_parser(
        "constraint", help="persisted table constraints (Delta ADD "
        "CONSTRAINT analog, row-policy enforcement: violating upsert "
        "events quarantine to _errors/, redrivable): --add pre-scans the "
        "live table Delta-style; --drop/--list are metadata-only"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("name", nargs="?", default=None)
    sp.add_argument("--add", action="store_true")
    sp.add_argument("--kind", choices=["not_null", "in_set", "range",
                                       "regex"], default=None)
    sp.add_argument("--column", default=None)
    sp.add_argument("--values", nargs="+", default=None,
                    help="in_set values")
    sp.add_argument("--lo", type=float, default=None)
    sp.add_argument("--hi", type=float, default=None)
    sp.add_argument("--pattern", default=None, help="RE2 search pattern")
    sp.add_argument("--drop", action="store_true", dest="drop_constraint")
    sp.add_argument("--list", action="store_true", dest="list_constraints")

    sp = sub.add_parser(
        "vacuum", help="manifest-aware vacuum: keep the last K committed "
        "manifests (time travel window) and drop unreferenced data files"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--keep-manifests", type=int, default=1)

    sp = sub.add_parser(
        "rebucket", help="bucket-count migration (partition evolution): "
        "rewrite every bucket under a new hash(url) %% N router at the "
        "same watermark; subsequent runs resume under the new count"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--buckets", type=int, required=True)

    sp = sub.add_parser(
        "rename", help="metadata-only column rename (Iceberg RENAME COLUMN "
        "analog): new manifest at the same watermark, no data rewrite; "
        "readers map old stored names forward; identity columns protected"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("old")
    sp.add_argument("new")

    sp = sub.add_parser(
        "drop-column", help="metadata-only DROP COLUMN (Iceberg "
        "deleteColumn analog): no data rewrite; the stored name is retired "
        "via a tombstone mapping so it cannot resurrect; name reusable "
        "after a rebucket"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("name")

    sp = sub.add_parser(
        "update", help="in-place UPDATE ... WHERE DML (Delta UpdateCommand "
        "analog): set constant column values on rows matching a simple "
        "predicate; LWW identity protected, constraints enforced, only "
        "matched buckets rewritten. The general computed-assignment form "
        "is the engine API CdcEngine.update_where."
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--set", nargs=2, action="append", metavar=("COL", "VALUE"),
                    required=True, help="column + constant (repeatable); "
                    "VALUE casts to the column type, 'null' sets NULL")
    wg = sp.add_mutually_exclusive_group(required=True)
    wg.add_argument("--where-null", metavar="COL",
                    help="match rows where COL IS NULL")
    wg.add_argument("--where-equals", nargs=2, metavar=("COL", "VALUE"),
                    help="match rows where COL = VALUE (cast to col type)")
    wg.add_argument("--where-contains", nargs=2, metavar=("COL", "SUBSTR"),
                    help="match rows where string COL contains SUBSTR")

    sp = sub.add_parser(
        "delete", help="in-place DELETE ... WHERE DML (Delta DeleteCommand "
        "analog; purge is the by-key compliance variant): drop live rows "
        "matching a simple predicate; watermark unchanged, later events "
        "re-insert, older manifests keep the rows until vacuum."
    )
    sp.add_argument("lake_dir")
    wg = sp.add_mutually_exclusive_group(required=True)
    wg.add_argument("--where-null", metavar="COL")
    wg.add_argument("--where-equals", nargs=2, metavar=("COL", "VALUE"))
    wg.add_argument("--where-contains", nargs=2, metavar=("COL", "SUBSTR"))

    sp = sub.add_parser(
        "purge", help="compliance purge (gobblin-compliance purger analog): "
        "remove every row for the given keys from the lake — live rows, "
        "tombstones and, by default, all older manifests/files, so time "
        "travel cannot resurrect the data; replay continues at the same "
        "watermark"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--url", action="append", default=[],
                    help="key to purge (repeatable)")
    sp.add_argument("--keys-file", default=None,
                    help="newline-delimited file of keys to purge")
    sp.add_argument("--keep-history", action="store_true",
                    help="keep older manifests (NOT compliant; debugging)")

    sp = sub.add_parser(
        "compact", help="forced full compaction (the reference's standalone "
        "compaction job): merge every bucket's outstanding deltas into a "
        "fresh base at a new epoch; watermark pinned; per-bucket local, no "
        "shuffle"
    )
    sp.add_argument("lake_dir")

    sp = sub.add_parser(
        "redrive", help="dead-letter re-drive: replay quarantined _errors/ "
        "rows back through validate -> merge -> commit, optionally after an "
        "op-repair regex; rows still invalid are re-quarantined, never "
        "dropped; the watermark is untouched (late LWW application "
        "converges)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--epochs", type=int, nargs="+", default=None,
                    help="only re-drive these epochs' error files "
                         "(omit for all; at least one value if given — an "
                         "empty list would silently match nothing)")
    sp.add_argument("--fix-op-sub", nargs=2, metavar=("REGEX", "REPL"),
                    default=None,
                    help="repair the op column with a regex substitution "
                         "before re-validating")
    sp.add_argument("--keep-sources", action="store_true",
                    help="leave the source error files in place (default: "
                         "move them to _errors/_redriven after commit)")

    sp = sub.add_parser(
        "rollback", help="roll the lake back to an older committed manifest "
        "(Iceberg snapshot-rollback analog; legal within the vacuum window; "
        "the next run re-applies the later log span, converging byte-"
        "identically)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("--to-epoch", type=int, required=True)

    sp = sub.add_parser(
        "copy", help="distcp-style resumable file copy (CopySource analog): "
        "bin-packed fan-out, landed-byte verify, manifest commit"
    )
    sp.add_argument("src_root")
    sp.add_argument("dest_root")
    sp.add_argument("--glob", default="*", help="basename glob (default *)")
    sp.add_argument("--units", type=int, default=None)
    sp.add_argument("--no-verify", action="store_true",
                    help="skip re-reading landed bytes for the digest")

    sp = sub.add_parser(
        "clone", help="disaster-recovery lake clone: checksum-verified "
        "copy of data/ + _checkpoints/ + _errors/ under the source job "
        "lock; the clone resumes replay at the copied watermark; "
        "re-running syncs only changed files"
    )
    sp.add_argument("src_lake")
    sp.add_argument("dst_lake")
    sp.add_argument("--units", type=int, default=None)
    sp.add_argument("--no-verify", action="store_true")
    sp.add_argument("--link", action="store_true",
                    help="zero-copy clone via hardlinks (instant dev "
                         "branch; safe because every write in this "
                         "codebase is tmp+rename, never in-place). "
                         "No Ray session.")

    sp = sub.add_parser(
        "repair", help="anti-entropy verify/repair: compare per-bucket "
        "content digests of a replica against its source (same layout, "
        "same watermark) and rewrite only mismatched buckets from the "
        "source's merged state; --dry-run is the pure verification job"
    )
    sp.add_argument("dst_lake", help="the lake to verify/repair")
    sp.add_argument("--source", required=True, help="the reference lake")
    sp.add_argument("--dry-run", action="store_true")

    sp = sub.add_parser(
        "replicate", help="maintain a downstream replica lake purely from "
        "the primary's full-row change feed (cascaded CDC; distcp/"
        "ReplicationConfiguration analog). Idempotent per round."
    )
    sp.add_argument("src_lake")
    sp.add_argument("dst_lake")
    sp.add_argument("--pages", required=True,
                    help="the shared bootstrap snapshot parquet")
    sp.add_argument("--feed-dir", required=True,
                    help="where the exported change-feed shards land")
    sp.add_argument("--events-dir", required=True,
                    help="the PRIMARY's events dir (engine handle only)")
    sp.add_argument("--from-epoch", type=int, default=0)
    sp.add_argument("--buckets", type=int, default=16,
                    help="replica bucket count (independent of primary)")

    sp = sub.add_parser(
        "prep", help="curate the lake into training shards: projected "
        "merge-on-read read -> quality gate -> hash-keyed exact dedup -> "
        "deterministic shuffle-and-shard export (lake-to-training in one "
        "command)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("out_dir")
    sp.add_argument("--shards", type=int, default=16)
    sp.add_argument("--min-chars", type=int, default=1,
                    help="drop docs with shorter (or null) text")
    sp.add_argument("--near-dedup", action="store_true",
                    help="also MinHash+LSH near-dup removal after the "
                         "exact dedup (threshold via --near-threshold; "
                         "the kernel is the value-checked dedup_minhash)")
    sp.add_argument("--near-threshold", type=float, default=0.8,
                    help="Jaccard threshold; LSH banding auto-adapts "
                         "(recall degrades below ~0.45)")
    sp.add_argument("--salt", default="",
                    help="shuffle-coin salt (vary for a new permutation)")
    sp.add_argument("--shard-format", default="parquet",
                    choices=["parquet", "avro"],
                    help="shard file format (avro = object containers "
                         "through the from-scratch codec)")
    sp.add_argument("--dsir-target", default=None, metavar="LANG",
                    help="DSIR selection: fit target = docs with this "
                         "lang, keep the --dsir-keep-frac that scores "
                         "most target-like (runs after dedup)")
    sp.add_argument("--dsir-keep-frac", type=float, default=0.5,
                    help="fraction kept by --dsir-target selection")
    sp.add_argument("--ppl-keep-frac", type=float, default=None,
                    help="CCNet-style perplexity selection: train a "
                         "bigram KN LM on the curated lineage and keep "
                         "this lowest-nll (most fluent) fraction (runs "
                         "after dedup, before DSIR)")
    sp.add_argument("--span-dedup", type=int, default=None, metavar="K",
                    help="exact-substring span REMOVAL over the curated "
                         "corpus (Lee 2022 ExactSubstr at fixed K-token "
                         "windows): duplicated spans keep one canonical "
                         "occurrence, other occurrences' tokens are "
                         "excised before export (runs after the doc-level "
                         "dedups, before selection)")
    sp.add_argument("--emit-tokens", default=None,
                    metavar="TOKENIZER_PARQUET",
                    help="emit TRAINABLE token shards instead of text: "
                         "encode the curated docs to token-id sequences "
                         "under this train-tokenizer artifact — a "
                         "(piece, prob) unigram vocabulary routes "
                         "through the Viterbi encoder, anything else "
                         "through the BPE encoder — pack into contiguous "
                         "--pack-budget bins, and shard the bins (each "
                         "shard file carries bin_id + token_ids)")
    sp.add_argument("--pack-budget", type=int, default=4096,
                    help="token budget per packed training bin")
    sp.add_argument("--tag", default=None,
                    help="prep AS OF the named tag's manifest")
    sp.add_argument("--table", default=None,
                    help="table name under a multi-table root")

    sp = sub.add_parser(
        "train-tokenizer", help="train a tokenizer over a parquet text "
        "corpus (distributed word counts + driver fit): kind bpe -> "
        "merge rules, kind unigram -> piece probabilities; artifact "
        "written as parquet for bpe_apply/unigram_apply"
    )
    sp.add_argument("in_path", help="parquet file or directory")
    sp.add_argument("out_path", help="artifact parquet to write")
    sp.add_argument("--kind", choices=["bpe", "unigram"], default="bpe")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--merges", type=int, default=1000,
                    help="bpe: number of merge rules")
    sp.add_argument("--vocab-size", type=int, default=2000,
                    help="unigram: final piece count")
    sp.add_argument("--min-count", type=int, default=1)

    sp = sub.add_parser(
        "index", help="incremental IVF-PQ ANN index over an embedding "
        "parquet (FAISS IVFADC shape: coarse cells + per-cell residual "
        "PQ codes; fit-once persisted model, later builds append only "
        "unseen ids per cell): `index build` then `index search`"
    )
    sp.add_argument("action", choices=["build", "search"])
    sp.add_argument("index_dir")
    sp.add_argument("--from", dest="from_path", required=True,
                    help="embeddings parquet (build input / query source)")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("--vec-col", default="embedding")
    sp.add_argument("--cells", type=int, default=16,
                    help="build: coarse cell count (first build only)")
    sp.add_argument("--m", type=int, default=8,
                    help="build: PQ subspaces (first build only)")
    sp.add_argument("--ks", type=int, default=16,
                    help="build: centroids per subspace (first build only)")
    sp.add_argument("--train-rows", type=int, default=20_000,
                    help="build: model-fit sample size (first --train-rows "
                         "rows in id order; ignored once the model exists)")
    sp.add_argument("--query-ids", default=None,
                    help="search: comma-separated ids whose vectors become "
                         "the queries")
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument("--nprobe", type=int, default=4)

    sp = sub.add_parser(
        "sql", help="ad-hoc DuckDB SQL over the live merge-on-read lake "
        "state (Hive-registration/serving analog: the lake registered as "
        "a queryable table named `t`, optional time travel via --tag)"
    )
    sp.add_argument("lake_dir")
    sp.add_argument("query", help="SQL; the lake's live rows are table `t`")
    sp.add_argument("--tag", default=None,
                    help="query AS OF the named tag's manifest")
    sp.add_argument("--table", default=None,
                    help="table name under a multi-table root "
                         "(<lake_dir>/<table>)")
    sp.add_argument("--limit", type=int, default=20,
                    help="rows of the result to print")

    sp = sub.add_parser(
        "shard", help="deterministic shuffle-and-shard export of a parquet "
        "file/dir into N training shards (md5-coin order, byte-identical "
        "rerun; stages/sink.shuffle_shard_export)"
    )
    sp.add_argument("in_path", help="parquet file or directory")
    sp.add_argument("out_dir")
    sp.add_argument("--shards", type=int, default=16)
    sp.add_argument("--key", required=True,
                    help="unique row key column the shuffle coin hashes")
    sp.add_argument("--salt", default="",
                    help="coin salt: vary to get a different permutation")
    sp.add_argument("--shard-format", default="parquet",
                    choices=["parquet", "avro"],
                    help="shard file format (avro = object containers "
                         "through the from-scratch codec)")
    sp.add_argument("--columns", default=None,
                    help="comma-separated output column subset")

    sp = sub.add_parser(
        "flow", help="multi-step flow DAG (gobblin-service FlowSpec "
        "analog): run declares a JSON DAG of CLI-command nodes with "
        "dependency edges and input fingerprints; completed nodes skip "
        "on re-run (CommitSequence.isCompleted), changed inputs "
        "re-trigger their subtree"
    )
    sp.add_argument("action", choices=["run", "status"])
    sp.add_argument("spec", help="flow spec JSON file")
    sp.add_argument("--state-dir", default=None,
                    help="marker dir (default <specdir>/_flow/<name>)")
    sp.add_argument("--force", action="store_true",
                    help="re-run every node regardless of markers")
    sp.add_argument("--until", default=None,
                    help="stop (inclusive) after this node id")
    sp.add_argument("--parallel", type=int, default=1,
                    help="run INDEPENDENT branches concurrently with up "
                         "to this many nodes in flight (branches must "
                         "touch disjoint lakes — the job lock refuses "
                         "concurrent drivers of one lake)")
    sp.add_argument("--follow", action="store_true",
                    help="trigger loop: re-evaluate the DAG every "
                         "--poll-interval seconds (unchanged inputs "
                         "all-skip); stop by creating <state-dir>/_STOP")
    sp.add_argument("--poll-interval", type=float, default=2.0)

    sp = sub.add_parser(
        "query", help="run one operator pipeline from the demo library "
        "(EmbeddedGobblin one-shot job analog)"
    )
    sp.add_argument("name", nargs="?", default=None,
                    help="pipeline name (omit to list available names)")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--limit", type=int, default=5,
                    help="rows of the result to print")
    sp.add_argument("--stats", action="store_true",
                    help="print ds.stats() (per-stage wall/cpu/rows) to stderr "
                         "after execution — the per-operator tuning loop")

    args = p.parse_args(argv)

    if args.cmd == "query":
        from .pipelines import demo as demomod

        names = sorted(
            n for n in dir(demomod)
            if not n.startswith("_") and callable(getattr(demomod, n))
            and getattr(getattr(demomod, n), "__module__", "") == demomod.__name__
            and n not in ("read_table", "read_incremental")
        )
        if args.name is None:
            print(json.dumps({"queries": names}))
            return 0
        if args.name not in names:
            print(json.dumps({"error": f"unknown query {args.name!r}",
                              "queries": names}), file=sys.stderr)
            return 2
        _ray_up(args.num_cpus)
        try:
            t0 = time.time()
            import pandas as pd

            res = getattr(demomod, args.name)(args.sf_dir)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if args.stats and hasattr(res, "stats"):
                print(res.stats(), file=sys.stderr)
            print(json.dumps({
                "query": args.name, "rows": int(len(df)),
                "sec": round(time.time() - t0, 3),
                "head": json.loads(df.head(args.limit).to_json(
                    orient="records", date_format="iso")),
            }))
        finally:
            _ray_down()
        return 0

    if args.cmd == "prep":
        from .engine import CdcEngine, EngineConfig
        from .functions.dedup import dedup_exact_by_hash
        from .stages.sink import shuffle_shard_export

        def _add_url_id(col_name: str):
            """ONE url-hash-to-int64-id stage for the kernels that key on
            an int id (--near-dedup / --span-dedup / --emit-tokens). A
            collision (~n^2/2^65 — negligible at any single-prep scale)
            merges two documents' identities for that kernel only; see
            the --near-dedup comment for the accepted posture."""
            from .engine import stable_hash_u64

            def run(t):
                import pyarrow as _pa

                nid = stable_hash_u64(t.column("url")).astype(
                    "int64", copy=False
                )
                return t.append_column(col_name, _pa.array(nid))

            run.__name__ = f"url_to_{col_name.strip('_')}_id"
            return run

        if args.dsir_target and not 0.0 < args.dsir_keep_frac <= 1.0:
            # fail before Ray spins up and the curation pipeline runs
            p.error("--dsir-keep-frac must be in (0, 1]")
        if args.ppl_keep_frac is not None and \
                not 0.0 < args.ppl_keep_frac <= 1.0:
            p.error("--ppl-keep-frac must be in (0, 1]")
        if args.span_dedup is not None and args.span_dedup < 1:
            p.error("--span-dedup K must be >= 1")

        lake = (os.path.join(args.lake_dir, args.table)
                if args.table else args.lake_dir)
        _ray_up(args.num_cpus)
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            eng = CdcEngine(lake, events_dir="", config=EngineConfig())
            manifest = None
            if args.tag:
                from . import refs

                manifest = eng.store.load(refs.resolve_tag(lake, args.tag))
            t0 = time.time()
            # projected read: the html payload never leaves storage
            ds = eng.read_table(manifest, columns=["url", "text", "lang"])
            mc = args.min_chars

            def gate(t: pa.Table) -> pa.Table:
                txt = t.column("text")
                keep = pc.and_(
                    pc.is_valid(txt),
                    pc.greater_equal(
                        pc.utf8_length(txt.fill_null("")), pa.scalar(mc)
                    ),
                )
                return t.filter(keep)

            gate.__name__ = "quality_gate"
            kept = dedup_exact_by_hash(
                ds.map_batches(gate, batch_format="pyarrow",
                               batch_size=None),
                "text", "url",
            )
            if args.near_dedup:
                from .functions.dedup import dedup_minhash

                # the minhash family keys on an int64 id: a hash
                # collision merges two documents' identities — they are
                # never compared with each other and a drop of one id
                # removes both rows, so an innocent doc can be lost.
                # Acceptable for a curation sample; a keyed join on url
                # instead of the int id removes even that.
                add_nid = _add_url_id("_nid")
                # dedup_minhash consumes its input THREE times (signature
                # pass, verify text-attach, final filter): materialize the
                # gated+deduped lineage once so the merge-on-read scan and
                # the exact-dedup shuffle don't re-run per consumption
                kept = kept.map_batches(
                    add_nid, batch_format="pyarrow", batch_size=None
                ).materialize()
                # LSH banding tuned to the requested threshold: the
                # S-curve midpoint is (1/bands)^(1/r) — one fixed banding
                # would silently miss most pairs at lower thresholds
                if args.near_threshold >= 0.75:
                    num_perm, bands = 128, 16   # r=8, midpoint ~0.71
                elif args.near_threshold >= 0.55:
                    num_perm, bands = 126, 21   # r=6, midpoint ~0.60
                else:
                    num_perm, bands = 128, 32   # r=4, midpoint ~0.42
                kept = dedup_minhash(
                    kept,
                    threshold=args.near_threshold, num_perm=num_perm,
                    bands=bands, text_col="text", id_col="_nid",
                    concurrency=(1, 8),
                ).drop_columns(["_nid"])
            if args.span_dedup is not None:
                from .functions.text import remove_dup_spans

                add_sid = _add_url_id("_sid")
                # two consumers inside remove_dup_spans (occurrence
                # explode + rewrite) — materialize the curated lineage
                rewritten = remove_dup_spans(
                    kept.map_batches(add_sid, batch_format="pyarrow",
                                     batch_size=None).materialize(),
                    text_col="text", id_col="_sid", k=args.span_dedup,
                    keep_cols=("url", "lang"),
                )

                def back(t: pa.Table) -> pa.Table:
                    return pa.table({
                        "url": t.column("url"),
                        "text": t.column("text_clean"),
                        "lang": t.column("lang"),
                    })

                back.__name__ = "span_clean_columns"
                kept = rewritten.map_batches(
                    back, batch_format="pyarrow", batch_size=None
                )
            if args.ppl_keep_frac is not None:
                from .functions.train import (bigram_lm_train,
                                              perplexity_select)

                # LM fit + selection both consume the curated lineage —
                # materialize once
                kept = kept.materialize()
                model, word_ids = bigram_lm_train(kept, vocab_size=500)
                kept = perplexity_select(
                    kept, args.ppl_keep_frac, model, word_ids,
                    concurrency=(1, 8),
                )
            if args.dsir_target:
                from .functions.train import dsir_select

                target = args.dsir_target

                def mark_target(t: pa.Table) -> pa.Table:
                    return t.append_column(
                        "is_target",
                        pc.equal(t.column("lang").fill_null(""), target),
                    )

                mark_target.__name__ = "mark_dsir_target"
                # dsir_select consumes its input multiple times (counts,
                # scoring, threshold filter) — materialize the curated
                # lineage once
                kept = dsir_select(
                    kept.map_batches(mark_target, batch_format="pyarrow",
                                     batch_size=None).materialize(),
                    keep_frac=args.dsir_keep_frac,
                    concurrency=(1, 8),
                ).drop_columns(["is_target"])
            if args.emit_tokens:
                # trainable-data leg: curated docs -> BPE token-id
                # sequences under the train-tokenizer artifact ->
                # contiguous packed bins -> sharded bin export (the
                # tokenizer-to-training chain of export_tokenized_shards)
                import pyarrow.parquet as _pq2

                from .functions.train import (bpe_encode_ids,
                                              pack_token_bins,
                                              unigram_encode_ids)

                artifact = _pq2.read_table(args.emit_tokens)

                add_tid = _add_url_id("_tid")  # pack order key
                # dispatch on the train-tokenizer artifact's schema:
                # (piece, prob) = unigram vocabulary, otherwise BPE merges
                encode = (
                    unigram_encode_ids
                    if set(artifact.column_names) == {"piece", "prob"}
                    else bpe_encode_ids
                )
                ids = encode(
                    kept.map_batches(add_tid, batch_format="pyarrow",
                                     batch_size=None),
                    artifact, text_col="text", id_col="_tid",
                )  # single consumer; pack_token_bins sorts + pins the
                # encoded rows itself (hierarchical scan) — no need to
                # pin the full text corpus in the object store here
                bins = pack_token_bins(ids, budget=args.pack_budget,
                                       id_col="_tid")
                lineage = shuffle_shard_export(
                    bins, args.out_dir, n_shards=args.shards,
                    key_col="bin_id", salt=args.salt,
                    columns=["bin_id", "token_ids", "n_docs", "n_tokens"],
                    file_format=args.shard_format,
                )
            else:
                lineage = shuffle_shard_export(
                    kept, args.out_dir, n_shards=args.shards, key_col="url",
                    salt=args.salt, columns=["url", "text", "lang"],
                    file_format=args.shard_format,
                )
            rows = lineage.count()
            print(json.dumps({
                "out_dir": args.out_dir, "shards": args.shards,
                "rows": int(rows), "sec": round(time.time() - t0, 3),
            }))
        finally:
            _ray_down()
        return 0

    if args.cmd == "index":
        from .functions import similarity as simmod

        _ray_up(args.num_cpus)
        try:
            import pyarrow.parquet as _pq
            import ray.data as rd

            t0 = time.time()
            if args.action == "build":
                import numpy as _np
                import os as _os

                from .functions.train import _vec_matrix

                train = None
                if not _os.path.exists(
                    _os.path.join(args.index_dir, "model.npz")
                ):
                    # fit sample: first --train-rows ids in id order.
                    # Read ONLY the id column to pick them, then pull
                    # just those rows with a pushed-down parquet filter —
                    # the full vector table never touches the driver
                    ids_only = _pq.read_table(
                        args.from_path, columns=[args.id_col]
                    ).column(args.id_col).to_numpy(zero_copy_only=False)
                    chosen = _np.sort(ids_only)[: args.train_rows]
                    t = _pq.read_table(
                        args.from_path,
                        columns=[args.id_col, args.vec_col],
                        filters=[(args.id_col, "in", chosen.tolist())],
                    )
                    order = _np.argsort(t.column(args.id_col).to_numpy(
                        zero_copy_only=False))
                    train = _vec_matrix(t, args.vec_col)[order]
                rep = simmod.ivfpq_index_build(
                    rd.read_parquet(args.from_path), args.index_dir,
                    train_matrix=train, n_cells=args.cells, m=args.m,
                    ks=args.ks, id_col=args.id_col, vec_col=args.vec_col,
                )
                print(json.dumps({
                    "index_dir": args.index_dir, **rep,
                    "model_fit": train is not None,
                    "sec": round(time.time() - t0, 3),
                }))
            else:
                if not args.query_ids:
                    raise SystemExit("index search: pass --query-ids")
                import numpy as _np

                from .functions.train import _vec_matrix

                want = [int(x) for x in args.query_ids.split(",")]
                # pushed-down filter: only the queried rows reach the
                # driver, not the corpus the index exists to avoid
                t = _pq.read_table(
                    args.from_path, columns=[args.id_col, args.vec_col],
                    filters=[(args.id_col, "in", want)],
                )
                ids = t.column(args.id_col).to_numpy(zero_copy_only=False)
                pos = {int(v): i for i, v in enumerate(ids)}
                missing = [q for q in want if q not in pos]
                if missing:
                    raise SystemExit(f"index search: ids not found: {missing}")
                Q = _vec_matrix(t, args.vec_col)[[pos[q] for q in want]]
                out = simmod.knn_ivfpq_search(
                    args.index_dir, Q, k=args.k, nprobe=args.nprobe,
                    id_col=args.id_col,
                ).to_pandas()
                rows = [
                    {"query": want[int(r["query_id"])],
                     args.id_col: int(r[args.id_col]),
                     "adist": round(float(r["adist"]), 6)}
                    for _, r in out.iterrows()
                ]
                print(json.dumps({
                    "k": args.k, "nprobe": args.nprobe, "results": rows,
                    "sec": round(time.time() - t0, 3),
                }))
        finally:
            _ray_down()
        return 0

    if args.cmd == "train-tokenizer":
        from .functions import train as trainmod

        _ray_up(args.num_cpus)
        try:
            import pyarrow.parquet as _pq
            import ray.data as rd

            t0 = time.time()
            ds = rd.read_parquet(args.in_path)
            if args.kind == "bpe":
                art = trainmod.bpe_train(
                    ds, text_col=args.text_col, n_merges=args.merges,
                    min_count=args.min_count,
                )
            else:
                art = trainmod.unigram_train(
                    ds, text_col=args.text_col,
                    vocab_size=args.vocab_size, min_count=args.min_count,
                )
            tmp = f"{args.out_path}.tmp-{os.getpid()}"
            try:
                _pq.write_table(art, tmp)
                os.replace(tmp, args.out_path)
            finally:
                if os.path.exists(tmp):  # failed write: no tmp debris
                    os.remove(tmp)
            print(json.dumps({
                "kind": args.kind, "out_path": args.out_path,
                "rows": art.num_rows, "sec": round(time.time() - t0, 3),
            }))
        finally:
            _ray_down()
        return 0

    if args.cmd == "sql":
        import duckdb

        from .engine import CdcEngine, EngineConfig

        lake = (os.path.join(args.lake_dir, args.table)
                if args.table else args.lake_dir)
        eng = CdcEngine(lake, events_dir="", config=EngineConfig())
        manifest = None
        if args.tag:
            from . import refs

            manifest = eng.store.load(refs.resolve_tag(lake, args.tag))
        t0 = time.time()
        t = eng.read_table_arrow(manifest)  # driver-side; serving-sized lakes
        drop = [c for c in ("is_deleted", "url_bucket") if c in t.column_names]
        if drop:
            t = t.drop_columns(drop)
        con = duckdb.connect()
        con.register("t", t)
        df = con.execute(args.query).fetchdf()
        print(json.dumps({
            "rows": int(len(df)), "sec": round(time.time() - t0, 3),
            "head": json.loads(df.head(args.limit).to_json(
                orient="records", date_format="iso")),
        }))
        return 0

    if args.cmd == "shard":
        from .stages.sink import shuffle_shard_export

        _ray_up(args.num_cpus)
        try:
            import ray.data as rd

            t0 = time.time()
            ds = rd.read_parquet(args.in_path)
            cols = (
                [c.strip() for c in args.columns.split(",")]
                if args.columns else None
            )
            lineage = shuffle_shard_export(
                ds, args.out_dir, n_shards=args.shards, key_col=args.key,
                salt=args.salt, columns=cols,
                file_format=args.shard_format,
            )
            rows = lineage.count()
            print(json.dumps({
                "out_dir": args.out_dir, "shards": args.shards,
                "rows": int(rows), "sec": round(time.time() - t0, 3),
            }))
        finally:
            _ray_down()
        return 0

    if args.cmd == "clean":
        from datetime import timedelta

        from . import retention as ret

        policies = []
        if args.retain_days is not None:
            policies.append(
                ret.TimeBasedRetentionPolicy(timedelta(days=args.retain_days))
            )
        if args.newest_k is not None:
            policies.append(ret.NewestKRetentionPolicy(args.newest_k))
        if args.max_bytes is not None:
            policies.append(ret.SizeQuotaRetentionPolicy(args.max_bytes))
        if not policies:
            print("need --retain-days, --newest-k and/or --max-bytes",
                  file=sys.stderr)
            return 2
        policy = (
            policies[0] if len(policies) == 1
            else ret.CombineRetentionPolicy(policies, op=args.combine_op)
        )
        cleaner = ret.DatasetCleaner(
            ret.GlobVersionFinder(args.root, args.glob, args.ts_format),
            policy,
            trash=ret.Trash(args.root) if args.trash else None,
        )
        rep = cleaner.clean(dry_run=args.dry_run)
        print(json.dumps({
            "deleted": rep.deleted, "trashed": rep.trashed,
            "retained": rep.retained, "dry_run": args.dry_run,
        }))
        return 0

    if args.cmd == "tag":
        from . import refs

        if args.list_tags:
            print(json.dumps(refs.list_tags(args.lake_dir)))
        elif args.delete:
            if not args.name:
                raise SystemExit("tag --delete needs a name")
            refs.drop_tag(args.lake_dir, args.name)
            print(json.dumps({"deleted": args.name}))
        else:
            if not args.name:
                raise SystemExit("tag needs a name (or --list)")
            print(json.dumps(refs.create_tag(
                args.lake_dir, args.name, epoch=args.epoch,
                force=args.force)))
        return 0

    if args.cmd == "view" and (args.list_views or args.read_view
                               or args.drop_view):
        from . import views

        if args.list_views:
            print(json.dumps(views.list_views(args.lake_dir)))
        elif args.read_view:
            if not args.name:
                raise SystemExit("view --read needs a name")
            t = views.read_view(args.lake_dir, args.name)
            for r in t.to_pylist():
                print(json.dumps(r))
        else:
            if not args.name:
                raise SystemExit("view --drop needs a name")
            views.drop_view(args.lake_dir, args.name)
            print(json.dumps({"dropped": args.name}))
        return 0

    if args.cmd == "constraint" and (args.list_constraints
                                     or args.drop_constraint):
        from .checkpoint import CheckpointStore as _CS
        from .engine import CdcEngine as _E
        from .engine import EngineConfig as _EC

        if args.list_constraints:
            m = _CS(args.lake_dir).latest()
            print(json.dumps(m.constraints if m else {}))
        else:
            if not args.name:
                raise SystemExit("constraint --drop needs a name")
            eng = _E(args.lake_dir, events_dir="", config=_EC())
            m = eng.drop_constraint(args.name)
            print(json.dumps({"dropped": args.name, "epoch": m.epoch}))
        return 0

    if args.cmd == "vacuum":
        from .retention import vacuum_keep

        print(json.dumps(vacuum_keep(args.lake_dir, args.keep_manifests)))
        return 0

    if args.cmd == "rollback":
        from .retention import rollback_to

        print(json.dumps(rollback_to(args.lake_dir, args.to_epoch)))
        return 0

    if args.cmd == "repair":
        from .engine import CdcEngine as _Eng, EngineConfig as _Cfg
        from .repair import repair as _repair

        _ray_up(args.num_cpus)
        t0 = time.time()
        src = _Eng(args.source, events_dir="", config=_Cfg())
        dst = _Eng(args.dst_lake, events_dir="", config=_Cfg())
        out = _repair(src, dst, dry_run=args.dry_run)
        out["sec"] = round(time.time() - t0, 3)
        print(json.dumps(out))
        _ray_down()
        return 0

    if args.cmd == "replicate":
        from .engine import CdcEngine as _Eng, EngineConfig as _Cfg
        from .replicate import replicate as _repl

        _ray_up(args.num_cpus)
        t0 = time.time()
        src = _Eng(args.src_lake, args.events_dir, _Cfg())
        dst = _repl(src, args.dst_lake, args.pages, args.feed_dir,
                    cfg=_Cfg(num_buckets=args.buckets),
                    from_epoch=args.from_epoch)
        m = dst.store.latest()
        print(json.dumps({
            "replica_epoch": m.epoch,
            "replica_rows": sum(s.rows for s in m.buckets.values()),
            "sec": round(time.time() - t0, 3),
        }))
        _ray_down()
        return 0

    if args.cmd == "clone":
        from .copy import copy_lake, link_lake

        if args.link:
            t0 = time.time()
            out = link_lake(args.src_lake, args.dst_lake)
            out["sec"] = round(time.time() - t0, 3)
            print(json.dumps(out))
            return 0
        _ray_up(args.num_cpus)
        t0 = time.time()
        out = copy_lake(args.src_lake, args.dst_lake, num_units=args.units,
                        verify=not args.no_verify)
        out["sec"] = round(time.time() - t0, 3)
        print(json.dumps(out))
        _ray_down()
        return 0

    if args.cmd == "copy":
        from .copy import run_copy

        _ray_up(args.num_cpus)
        t0 = time.time()
        out = run_copy(args.src_root, args.dest_root, glob=args.glob,
                       num_units=args.units, verify=not args.no_verify)
        out["sec"] = round(time.time() - t0, 3)
        print(json.dumps(out))
        _ray_down()
        return 0

    if args.cmd == "flow":
        from . import flow as flowmod

        try:
            spec = flowmod.load_flow(args.spec)
        except (flowmod.FlowError, json.JSONDecodeError, OSError) as e:
            print(json.dumps({"spec": args.spec, "error": str(e)}))
            return 1
        state_dir = args.state_dir or os.path.join(
            os.path.dirname(os.path.abspath(args.spec)),
            "_flow", spec["name"],
        )
        if args.action == "status":
            print(json.dumps({
                "flow": spec["name"],
                "nodes": flowmod.flow_status(spec, state_dir),
            }))
            return 0
        base = (["--num-cpus", str(args.num_cpus)]
                if args.num_cpus else [])
        try:
            passes = []
            while True:
                reports = flowmod.run_flow(
                    spec, state_dir, base_argv=base,
                    force=args.force, until=args.until,
                    max_parallel=args.parallel,
                )
                passes.append(reports)
                if not args.follow:
                    break
                args.force = False  # --force applies to the first pass only
                stop = os.path.join(state_dir, "_STOP")
                if os.path.exists(stop):
                    os.remove(stop)
                    break
                time.sleep(args.poll_interval)
            print(json.dumps({
                "flow": spec["name"],
                "passes": len(passes),
                "nodes": passes[-1],
                "ran": sum(1 for r in passes[-1] if r["action"] == "ran"),
            }))
            return 0
        except flowmod.FlowError as e:
            print(json.dumps({"flow": spec["name"], "error": str(e)}))
            return 1
        finally:
            import ray

            if ray.is_initialized():
                _ray_down()

    if args.cmd == "synth":
        from .synth import write_corpus

        meta = write_corpus(
            args.out_dir, n_pages=args.pages, n_events=args.events, shard_rows=args.shard_rows
        )
        print(
            json.dumps(
                {
                    "out_dir": args.out_dir,
                    "shards": len(meta["shards"]),
                    "max_seq": meta["max_seq"],
                }
            )
        )
        return 0

    from .checkpoint import CheckpointStore
    from .engine import CdcEngine, EngineConfig

    if args.cmd == "fsck":
        from .fsck import fsck

        rep = fsck(args.lake_dir)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1

    if args.cmd == "audit-data":
        from .fsck import audit_data

        rep = audit_data(args.lake_dir, args.corpus_dir)
        print(json.dumps(rep, default=str))
        return 0 if rep["ok"] else 1

    if args.cmd == "describe":
        store = CheckpointStore(args.lake_dir)
        m = store.latest()
        if m is None:
            print(json.dumps({"lake": args.lake_dir, "state": "uninitialized"}))
            return 1
        deltas = {b: len(s.delta_epochs) for b, s in m.buckets.items()}
        out = {
            "lake": args.lake_dir,
            "epoch": m.epoch,
            "applied_range": [m.low_seq, m.high_seq],
            "epochs_committed": len(store.committed_epochs()),
            "num_buckets": m.num_buckets,
            "bucket_hash": m.bucket_hash,
            "rows": sum(s.rows for s in m.buckets.values()),
            "events_this_epoch": m.event_count,
            "errors_this_epoch": m.error_count,
            "schema": [f.name for f in m.base_schema()],
            "schema_fingerprint": m.schema_fingerprint,
            # compaction debt: outstanding delta files per bucket
            "delta_files_total": sum(deltas.values()),
            "max_deltas_per_bucket": max(deltas.values()) if deltas else 0,
            "metrics": m.metrics,
        }
        from . import refs as _refs
        from . import views as _views

        out["constraints"] = m.constraints
        out["tags"] = _refs.list_tags(args.lake_dir)
        out["views"] = {n: v.get("folded_to")
                        for n, v in _views.list_views(args.lake_dir).items()}
        from . import stats as _stats

        st = _stats.load_stats(args.lake_dir)
        out["stats"] = None if st is None else {
            "epoch": st["epoch"], "fresh": st["epoch"] == m.epoch,
        }
        if args.buckets:
            out["buckets"] = {
                str(b): {"rows": s.rows, "base_epoch": s.base_epoch,
                         "deltas": len(s.delta_epochs),
                         "high_seq": s.high_seq}
                for b, s in sorted(m.buckets.items())
            }
        if args.anomalies:
            # ingest-volume Hampel screen over the manifest chain: the
            # replay epochs' event_count series (bootstrap epoch 0 is a
            # snapshot load, not feed volume — excluded). MAD == 0 (a
            # perfectly steady feed) flags ANY deviation.
            import numpy as np

            # maintenance epochs (compact, rebucket, purge, rename,
            # constraints, error redrive...) commit with the watermark
            # PINNED and apply no feed events — including their near-zero
            # counts would raise permanent false feed-broke alarms and
            # drag the median. A real feed epoch always ADVANCES the
            # watermark (redrive commits low_seq=-1 like the first feed
            # epoch, so low<high alone misclassifies it); an EMPTY feed
            # epoch with an advancing watermark stays in the series —
            # that 0 is exactly the feed-broke signal this screen exists
            # to raise. If older manifests were vacuumed, the first
            # visible epoch has no predecessor to compare against and is
            # skipped rather than guessed.
            series = []
            prev_high = None
            for e in store.committed_epochs():
                me = store.load(e)
                if e != 0 and prev_high is not None \
                        and me.high_seq > prev_high:
                    series.append((e, me.event_count))
                prev_high = me.high_seq
            vals = np.array([v for _, v in series], dtype=np.float64)
            flagged = []
            if len(vals) >= 3:
                med = float(np.median(vals))
                mad = float(np.median(np.abs(vals - med)))
                for (e, v) in series:
                    dev = abs(v - med)
                    if (mad > 0 and dev > args.mad_k * mad) or (
                            mad == 0 and dev > 0):
                        flagged.append({
                            "epoch": e, "events": int(v),
                            "median": med, "mad": mad,
                        })
            out["ingest_anomalies"] = flagged
        print(json.dumps(out))
        return 0

    if args.cmd == "status":
        m = CheckpointStore(args.lake_dir).latest()
        if m is None:
            print(json.dumps({"lake": args.lake_dir, "state": "uninitialized"}))
            return 1
        print(
            json.dumps(
                {
                    "lake": args.lake_dir,
                    "epoch": m.epoch,
                    "high_seq": m.high_seq,
                    "num_buckets": m.num_buckets,
                    "rows": sum(s.rows for s in m.buckets.values()),
                    "events_applied": sum(s.events_applied for s in m.buckets.values()),
                    "schema": [f.name for f in m.base_schema()],
                    "schema_fingerprint": m.schema_fingerprint,
                }
            )
        )
        return 0

    _ray_up(args.num_cpus)
    try:
        if args.cmd == "constraint":
            if not (args.add and args.name and args.kind and args.column):
                raise SystemExit(
                    "constraint --add needs NAME --kind --column")
            spec = {"kind": args.kind, "column": args.column}
            if args.values is not None:
                spec["values"] = args.values
            if args.lo is not None:
                spec["lo"] = args.lo
            if args.hi is not None:
                spec["hi"] = args.hi
            if args.pattern is not None:
                spec["pattern"] = args.pattern
            eng = CdcEngine(args.lake_dir, events_dir="",
                            config=EngineConfig())
            m = eng.add_constraint(args.name, spec)
            print(json.dumps({"added": args.name, "epoch": m.epoch,
                              "constraints": m.constraints}))
        elif args.cmd == "view":
            from . import views

            if not args.name:
                raise SystemExit("view --create/--refresh need a name")
            eng = CdcEngine(args.lake_dir, events_dir="",
                            config=EngineConfig())
            if args.create:
                print(json.dumps(views.create_view(
                    eng, args.name, args.kind)))
            elif args.refresh:
                print(json.dumps(views.refresh_view(
                    eng, args.name, recompute=args.recompute)))
            else:
                raise SystemExit(
                    "view needs one of --create/--refresh/--read/"
                    "--drop/--list")
        elif args.cmd == "bootstrap":
            cfg = EngineConfig(num_buckets=args.buckets, epoch_width=args.epoch_width,
                               epoch_bytes=args.epoch_bytes,
                               neardup_dedup=args.neardup,
                               neardup_threshold=args.neardup_threshold)
            eng = CdcEngine(args.lake_dir, args.events_dir, cfg)
            pages = args.pages
            if args.warc_dir:
                if pages:
                    raise SystemExit("bootstrap: pass --pages OR --warc-dir")
                from .sources.warc import warc_to_pages

                pages = warc_to_pages(
                    args.warc_dir,
                    os.path.join(args.lake_dir, "_snapshot_from_warc"),
                )
            elif not pages:
                raise SystemExit("bootstrap: pass --pages or --warc-dir")
            m = eng.bootstrap(pages)
            print(json.dumps({"epoch": m.epoch, "rows": sum(s.rows for s in m.buckets.values())}))
        elif args.cmd == "run":
            cfg = EngineConfig(num_buckets=args.buckets, epoch_width=args.epoch_width,
                               epoch_bytes=args.epoch_bytes,
                               compact_every=args.compact_every,
                               compact_ratio=args.compact_ratio,
                               compact_age=args.compact_age,
                               max_run_seconds=args.max_run_seconds,
                               neardup_dedup=args.neardup,
                               neardup_threshold=args.neardup_threshold,
                               auto_refresh_views=args.refresh_views)
            eng = CdcEngine(args.lake_dir, args.events_dir, cfg)
            t0 = time.time()
            if args.follow:
                reports = eng.run_forever(poll_interval=args.poll_interval)
            else:
                reports = eng.run(max_epochs=args.max_epochs, vacuum=not args.no_vacuum)
            dt = time.time() - t0
            events = sum(r.events for r in reports)
            print(
                json.dumps(
                    {
                        "epochs": [r.epoch for r in reports],
                        "events": events,
                        "errors": sum(r.errors for r in reports),
                        "sec": round(dt, 3),
                        "events_per_sec": round(events / dt, 1) if dt > 0 else None,
                    }
                )
            )
        elif args.cmd == "rebucket":
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            m = eng.rebucket(args.buckets)
            print(json.dumps({
                "epoch": m.epoch, "num_buckets": m.num_buckets,
                "high_seq": m.high_seq,
                "rows": sum(s.rows for s in m.buckets.values()),
            }))
        elif args.cmd == "drop-column":
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            m = eng.drop_column(args.name)
            print(json.dumps({
                "epoch": m.epoch,
                "schema": [f.name for f in m.base_schema()],
                "column_renames": m.column_renames,
            }))
        elif args.cmd == "rename":
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            m = eng.rename_column(args.old, args.new)
            print(json.dumps({
                "epoch": m.epoch,
                "schema": [f.name for f in m.base_schema()],
                "column_renames": m.column_renames,
            }))
        elif args.cmd == "update":
            import pyarrow as pa

            eng = CdcEngine(args.lake_dir, None, EngineConfig())
            predicate = _simple_predicate(args)
            sets = list(args.set)

            def assign(matched: pa.Table) -> dict:
                out = {}
                for col, val in sets:
                    ftype = matched.schema.field(col).type
                    v = None if val == "null" else val
                    out[col] = pa.array([v] * matched.num_rows,
                                        pa.string()).cast(ftype)
                return out

            print(json.dumps(eng.update_where(predicate, assign)))
        elif args.cmd == "delete":
            eng = CdcEngine(args.lake_dir, None, EngineConfig())
            print(json.dumps(eng.delete_where(_simple_predicate(args))))
        elif args.cmd == "purge":
            keys = list(args.url)
            if args.keys_file:
                with open(args.keys_file) as f:
                    keys += [ln.strip() for ln in f if ln.strip()]
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            print(json.dumps(eng.purge_keys(
                keys, drop_history=not args.keep_history
            )))
        elif args.cmd == "compact":
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            before = eng.store.latest()
            if before is None:
                raise SystemExit(
                    f"compact: {args.lake_dir} is not a bootstrapped lake"
                )
            mf = eng.compact_now()
            # count from compact_now's OWN result (race-free): a no-op
            # returns the old manifest, otherwise every compacted bucket's
            # base was rewritten at the new epoch
            compacted = 0 if mf.epoch == before.epoch else sum(
                1 for s in mf.buckets.values() if s.base_epoch == mf.epoch
            )
            print(json.dumps({
                "epoch": mf.epoch,
                "buckets_compacted": compacted,
                "outstanding_deltas_after": sum(
                    len(s.delta_epochs) for s in mf.buckets.values()
                ),
                "rows": sum(s.rows for s in mf.buckets.values()),
            }))
        elif args.cmd == "redrive":
            import pyarrow as pa
            import pyarrow.compute as pc

            fixer = None
            if args.fix_op_sub:
                pat, repl = args.fix_op_sub
                # fail fast with the ENGINE that will run it: Arrow uses
                # RE2, which rejects lookbehind/backreferences that
                # Python's re.compile happily accepts (a one-element probe
                # — the empty-array call skips pattern compilation)
                pc.replace_substring_regex(
                    pa.array([""], pa.string()), pattern=pat, replacement=repl
                )

                def fixer(t: pa.Table) -> pa.Table:
                    fixed = pc.replace_substring_regex(
                        t.column("op"), pat, repl
                    )
                    return t.set_column(
                        t.column_names.index("op"), "op", fixed
                    )

            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            print(json.dumps(eng.redrive_errors(
                fixer=fixer, epochs=args.epochs,
                consume=not args.keep_sources,
            )))
        elif args.cmd == "changes":
            from ray.data.aggregate import Count

            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            to_epoch = (args.to_epoch if args.to_epoch is not None
                        else eng.store.latest().epoch)
            # materialize once (the diff is churn-sized, not table-sized),
            # then sample + count from the cached blocks
            ds = eng.read_changes(
                args.from_epoch, to_epoch,
                include_before=args.include_before,
            ).materialize()
            for r in ds.take(args.limit):
                r["text"] = (r.get("text") or "")[:60]
                print(json.dumps(r, default=str))
            by_type = {
                r["change_type"]: int(r["n"])
                for r in ds.groupby("change_type")
                .aggregate(Count(alias_name="n")).take_all()
            }
            print(json.dumps({
                "from_epoch": args.from_epoch,
                "to_epoch": to_epoch,
                "changes": sum(by_type.values()),
                "by_type": dict(sorted(by_type.items())),
            }))
        elif args.cmd == "lookup":
            keys = list(args.url)
            if args.keys_file:
                with open(args.keys_file) as f:
                    keys += [ln.strip() for ln in f if ln.strip()]
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            t0 = time.time()
            tbl = eng.lookup_urls(keys)
            for r in tbl.to_pylist():
                r.pop("html", None)
                r["text"] = (r.get("text") or "")[:60]
                print(json.dumps(r, default=str))
            print(json.dumps({
                "requested": len(set(keys)), "found": tbl.num_rows,
                "sec": round(time.time() - t0, 3),
            }))
        elif args.cmd == "read":
            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            manifest = None
            if getattr(args, "tag", None):
                from . import refs

                manifest = eng.store.load(
                    refs.resolve_tag(args.lake_dir, args.tag))
            report: dict = {}
            eq = None
            we = getattr(args, "where_equals", None)
            if we:
                import pyarrow as pa

                col, raw = we
                m = eng.store.latest() if manifest is None else manifest
                typ = m.base_schema().field(col).type if (
                    col in m.base_schema().names) else None
                val: object = raw
                if typ is not None and pa.types.is_integer(typ):
                    val = int(raw)
                elif typ is not None and pa.types.is_floating(typ):
                    val = float(raw)
                eq = {col: val}
            shard = getattr(args, "shard", None)
            ds = eng.read_table(
                manifest=manifest,
                ts_min=getattr(args, "ts_min", None),
                ts_max=getattr(args, "ts_max", None),
                eq=eq,
                bucket_shard=tuple(shard) if shard else None,
                prune_report=report,
            )
            n = ds.count()
            rows = ds.take(args.limit)
            for r in rows:
                r.pop("html", None)
                r["text"] = (r.get("text") or "")[:60]
                print(json.dumps(r, default=str))
            print(json.dumps({"live_rows": n, **report}))
        elif args.cmd == "analyze":
            from . import stats as statsmod

            eng = CdcEngine(args.lake_dir, events_dir="", config=EngineConfig())
            st = statsmod.analyze(eng, ndv_k=args.ndv_k)
            out = {
                "epoch": st["epoch"],
                "live_rows": st["live_rows"],
                "columns": st["columns"],
                "zone_map_files": sum(
                    len(v) for v in st["ts_zone_map"].values()
                ),
            }
            if args.bloom_cols:
                from . import index as idxmod

                out["bloom"] = idxmod.build_bloom_index(
                    eng, [c.strip() for c in args.bloom_cols.split(",")]
                )
            print(json.dumps(out, default=str, indent=1))
    finally:
        _ray_down()
    return 0


if __name__ == "__main__":
    sys.exit(main())
