"""Metadata-only lake integrity audit (``cli fsck``) — the admin check an
operator runs before trusting a lake after an incident: does every
committed manifest parse, does the head manifest reference only files
that exist with readable parquet footers and the expected schema, is the
epoch chain contiguous with a monotone watermark, and how much
unreferenced / staging debris is lying around.

Reference analog: Gobblin's job-state / dataset-state stores are
validated by their readers ad hoc; Iceberg ships this as a first-class
maintenance action (`verify` / orphan-file cleanup). Ray is NOT involved
— fsck reads manifests and parquet FOOTERS only (O(files) metadata
operations, zero data scan), so it runs in milliseconds against a lake
of any row count and never needs a session.

Checks (each failure appends a structured issue; ok = no issues):
- manifest chain: every ``_checkpoints/epoch-*.json`` parses; epochs are
  contiguous from the oldest retained; ``high_seq`` is non-decreasing.
- head references: every base/delta file of every non-empty bucket
  exists and has a readable parquet footer.
- schema: each referenced file's footer column set, mapped through the
  manifest's rename chain, is a subset of the manifest schema (older
  files legitimately lack later additive columns; identity columns must
  be present).
- layout sanity: ``base_epoch <= head epoch``; delta epochs strictly
  ascending and > base_epoch.
Reported but NOT failures: orphan data files no retained manifest
references (vacuum candidates) and leftover ``_staging`` files from
aborted maintenance commands (overwritten or swept by later activity).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from . import checkpoint as ckpt


def fsck(lake_dir: str) -> dict:
    issues: list[dict] = []
    store = ckpt.CheckpointStore(lake_dir)
    epochs = store.committed_epochs()
    if not epochs:
        return {"ok": False, "issues": [
            {"kind": "no_manifests", "detail": lake_dir}],
            "epochs": 0, "files_checked": 0, "orphans": 0, "staging": 0}

    manifests = {}
    for e in epochs:
        try:
            manifests[e] = store.load(e)
        except Exception as ex:  # corrupt manifest JSON
            issues.append({"kind": "manifest_unreadable", "epoch": e,
                           "detail": str(ex)})
    for a, b in zip(epochs, epochs[1:]):
        if b != a + 1:
            issues.append({"kind": "epoch_gap", "detail": f"{a} -> {b}"})
    seqs = [manifests[e].high_seq for e in epochs if e in manifests]
    for a, b in zip(seqs, seqs[1:]):
        if b < a:
            issues.append({"kind": "watermark_regression",
                           "detail": f"high_seq {a} -> {b}"})

    head = manifests.get(epochs[-1])
    files_checked = 0
    referenced: set[str] = set()
    if head is not None:
        schema_names = set(head.base_schema().names)
        ren = dict(head.column_renames)  # stored-name -> current-name
        for b, s in sorted(head.buckets.items()):
            if s.rows <= 0:
                continue
            if s.base_epoch > head.epoch:
                issues.append({"kind": "bad_base_epoch", "bucket": b,
                               "detail": f"{s.base_epoch} > {head.epoch}"})
            des = list(getattr(s, "delta_epochs", []) or [])
            if des != sorted(set(des)) or (des and des[0] <= s.base_epoch):
                issues.append({"kind": "bad_delta_chain", "bucket": b,
                               "detail": str(des)})
            for path in ckpt.bucket_files(lake_dir, s):
                referenced.add(os.path.abspath(path))
                files_checked += 1
                if not os.path.exists(path):
                    issues.append({"kind": "missing_file", "bucket": b,
                                   "detail": path})
                    continue
                try:
                    footer = pq.read_schema(path)
                except Exception as ex:
                    issues.append({"kind": "unreadable_footer",
                                   "bucket": b,
                                   "detail": f"{path}: {ex}"})
                    continue
                mapped = {ren.get(n, n) for n in footer.names}
                extra = mapped - schema_names
                if extra:
                    issues.append({"kind": "schema_mismatch", "bucket": b,
                                   "detail": f"{path}: unexpected columns "
                                             f"{sorted(extra)}"})
                for ident in ("url", "warc_ts", "event_seq"):
                    if ident not in mapped:
                        issues.append({"kind": "schema_mismatch",
                                       "bucket": b,
                                       "detail": f"{path}: missing "
                                                 f"identity column {ident}"})

    # every file any RETAINED manifest references is not an orphan
    for e, m in manifests.items():
        for s in m.buckets.values():
            if s.rows > 0:
                for path in ckpt.bucket_files(lake_dir, s):
                    referenced.add(os.path.abspath(path))
    on_disk = {
        os.path.abspath(p)
        for p in glob.glob(os.path.join(lake_dir, ckpt.DATA_DIR,
                                        "*", "*.parquet"))
    }
    orphans = sorted(on_disk - referenced)
    staging = glob.glob(os.path.join(lake_dir, ckpt.STAGING_DIR,
                                     "**", "*"), recursive=True)

    return {
        "ok": not issues,
        "issues": issues,
        "epochs": len(epochs),
        "head_epoch": epochs[-1],
        "files_checked": files_checked,
        "orphans": len(orphans),
        "staging": len([p for p in staging if os.path.isfile(p)]),
    }


def audit_data(lake_dir: str, corpus_dir: str, engine=None) -> dict:
    """DATA-level lake audit — fsck's sibling one layer down: recompute
    the expected live state by SEQUENTIAL row-at-a-time LWW replay of the
    change log up to the lake's committed watermark
    (fixtures._sequential_live_state — the dumb obvious oracle the e2e
    suite trusts), read the lake's live rows driver-side, and
    byte-compare per url (warc_ts, event_seq, text, html). The ops
    answer to "did exactly-once actually hold on THIS lake?" after an
    incident/restore — fsck proves the metadata is coherent, audit_data
    proves the data matches the log.

    Driver-side O(corpus): a trust tool for serving-sized lakes and DR
    spot checks (pair with ``read_table(bucket_shard=)`` sampling for
    big lakes). No Ray session."""
    from .engine import CdcEngine, EngineConfig
    from .fixtures import _sequential_live_state

    eng = engine or CdcEngine(lake_dir, events_dir="", config=EngineConfig())
    manifest = eng.store.latest()
    if manifest is None:
        return {"ok": False, "issues": [{"kind": "not_bootstrapped"}]}
    expected = _sequential_live_state(corpus_dir, max_seq=manifest.high_seq)
    live = eng.read_table_arrow(manifest)
    rows = live.to_pylist()

    issues: list[dict] = []
    got: dict = {}
    for r in rows:
        if r["url"] in got:  # the LWW identity is one live row per url —
            # a duplicate IS the corruption this audit exists to catch
            issues.append({"kind": "duplicate_url", "url": r["url"]})
        got[r["url"]] = r
    missing_cols = [
        c for c in ("warc_ts", "event_seq", "text", "html")
        if c not in live.column_names
    ]
    for c in missing_cols:  # absent column = unverifiable, never "ok"
        issues.append({"kind": "missing_column", "column": c})
    for url in sorted(set(expected) - set(got)):
        issues.append({"kind": "missing_row", "url": url})
    for url in sorted(set(got) - set(expected)):
        issues.append({"kind": "phantom_row", "url": url})
    checked = 0
    for url in sorted(set(expected) & set(got)):
        e, g = expected[url], got[url]
        checked += 1
        for col in ("warc_ts", "event_seq", "text", "html"):
            if col not in missing_cols and g[col] != e[col]:
                issues.append({"kind": "value_mismatch", "url": url,
                               "column": col})
    return {
        "ok": not issues,
        "epoch": manifest.epoch,
        "high_seq": manifest.high_seq,
        "rows_expected": len(expected),
        "rows_live": live.num_rows,
        "rows_compared": checked,
        "issues": issues[:50],
        "issue_count": len(issues),
    }
