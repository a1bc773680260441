"""Row- and task-level quality checking (Gobblin qualitychecker analog).

- RowLevelPolicy FAIL / ERR_FILE / OPTIONAL semantics
  (gobblin-api/.../qualitychecker/row/RowLevelPolicy.java:33-68): a policy is
  a vectorized predicate; failing rows either abort the task, get diverted
  to an error sink, or are just counted.
- RowCountPolicy / RowCountRangePolicy (gobblin-core/.../policies/count/):
  written-vs-extracted count assertions at commit time.
- RecordTimestampLowerBoundPolicy (gobblin-core/.../policies/time/):
  ``min_timestamp`` below.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from enum import Enum

import pyarrow as pa
import pyarrow.compute as pc


class PolicyAction(Enum):
    FAIL = "fail"  # raise -> task fails (Ray retries, then job errors)
    ERR_FILE = "err_file"  # divert failing rows to the error sink
    OPTIONAL = "optional"  # count only


@dataclass
class RowPolicy:
    name: str
    predicate: Callable[[pa.Table], pa.ChunkedArray]  # True = row passes
    action: PolicyAction = PolicyAction.ERR_FILE


def not_null(field: str, action=PolicyAction.ERR_FILE) -> RowPolicy:
    return RowPolicy(
        f"not_null[{field}]", lambda t: pc.is_valid(t.column(field)), action
    )


def value_in(field: str, values: list, action=PolicyAction.ERR_FILE) -> RowPolicy:
    vs = pa.array(values)
    return RowPolicy(
        f"value_in[{field}]",
        lambda t: pc.is_in(t.column(field), value_set=vs),
        action,
    )


def min_timestamp(field: str, bound, action=PolicyAction.ERR_FILE) -> RowPolicy:
    """RecordTimestampLowerBoundPolicy: drop rows older than ``bound``."""
    b = pa.scalar(bound)
    return RowPolicy(
        f"min_ts[{field}]", lambda t: pc.greater_equal(t.column(field), b), action
    )


def non_empty_string(field: str, action=PolicyAction.ERR_FILE) -> RowPolicy:
    return RowPolicy(
        f"non_empty[{field}]",
        lambda t: pc.greater(pc.utf8_length(pc.cast(t.column(field), pa.string())), 0),
        action,
    )


class PolicyChecker:
    """Batch stage: evaluate policies, annotate failing rows with a
    ``_policy_err`` reason (first failing policy wins), FAIL-action raises.

    Use ``split()`` on the annotated batch (or downstream) to separate
    pass/err — the RowLevelPolicyChecker + err-file writer shape
    (StreamModelTaskRunner.java:136).
    """

    ERR_COL = "_policy_err"

    def __init__(self, policies: list[RowPolicy]):
        self.policies = policies
        self.__name__ = "policy_check"

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        err = np.full(t.num_rows, None, dtype=object)
        for p in self.policies:
            ok = pc.fill_null(p.predicate(t), False).to_numpy(zero_copy_only=False)
            if p.action is PolicyAction.FAIL and not ok.all():
                raise ValueError(f"row policy {p.name} failed for {(~ok).sum()} rows")
            newly = (~ok) & (err == None)  # noqa: E711
            if p.action is PolicyAction.ERR_FILE:
                err[newly] = p.name
            # OPTIONAL: counted by the caller via split() if desired
        return t.append_column(self.ERR_COL, pa.array(err, pa.string()))

    @staticmethod
    def split(t: pa.Table) -> tuple[pa.Table, pa.Table]:
        mask = pc.is_valid(t.column(PolicyChecker.ERR_COL))
        bad = t.filter(mask)
        good = t.filter(pc.invert(mask)).drop_columns([PolicyChecker.ERR_COL])
        return good, bad

    @staticmethod
    def keep_good(t: pa.Table) -> pa.Table:
        return PolicyChecker.split(t)[0]


@dataclass
class RowCountPolicy:
    """Task-level commit gate: |written| == |expected| (± range).
    RowCountRangePolicy when ``tolerance`` > 0."""

    expected: int
    tolerance: float = 0.0

    def check(self, written: int) -> bool:
        if self.tolerance == 0.0:
            return written == self.expected
        lo = self.expected * (1 - self.tolerance)
        hi = self.expected * (1 + self.tolerance)
        return lo <= written <= hi

    def assert_ok(self, written: int) -> None:
        if not self.check(written):
            raise AssertionError(
                f"row count {written} outside {self.expected}±{self.tolerance:.0%}"
            )


def feed_integrity_audit(ds, partition_col: str = "partition_id",
                         seq_col: str = "seq", window: int = 1 << 20,
                         num_partitions: int = 64):
    """Distributed CDC feed-integrity audit: find sequence GAPS (dropped
    events) and DUPLICATES (producer retries / replays) in a change feed
    whose ``seq_col`` is expected to be dense per ``partition_col``.

    Reference analog: Gobblin's Kafka source tracks per-partition offsets
    and applies a reset policy when the stored offset falls out of range
    (gobblin-modules/gobblin-kafka-common/.../KafkaSource.java:544-676),
    and its compaction verifies completeness via audit counts
    (gobblin-compaction/.../verify/CompactionAuditCountVerifier.java) —
    this operator is the row-level version of those checks: it reports
    exactly WHICH sequence ranges are missing and which are duplicated.

    Scale shape (the part Gobblin leaves to Pinot/Hive): one bounded
    exchange keyed on ``(partition_id, seq // window)`` — every row of one
    seq window lands in one worker, where dups and INTERIOR gaps fall out
    of one vectorized sort + run-length pass. Each window also emits a
    tiny summary row (its min/max present seq), and the driver stitches
    CROSS-window gaps from the O(#windows) summaries — per-epoch driver
    work is O(windows), never O(events), the same posture as the engine's
    manifest planning. The exchange payload is projected to exactly
    (partition, seq) before tagging. Findings (not the feed) materialize.

    Preconditions: ``seq_col`` values are non-negative int64; null
    partition/seq rows are ignored. Leading/trailing truncation is not
    reported (matching the SQL lag-window definition of an internal gap).

    Returns a Dataset with columns (partition_id, kind∈{gap,dup},
    seq_start, seq_end, n): for gaps n = missing count, for dups n = the
    total copies observed (≥ 2).
    """
    import numpy as np
    import ray.data

    from .partition import keyed_map_groups

    W = int(window)
    MIX = np.uint64(0x9E3779B97F4A7C15)  # routing-only mix; kernel groups
    # by the REAL (partition, window) pair, so a mix collision merely
    # co-locates two groups in one worker partition (harmless).

    def project(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t.column(partition_col)),
                       pc.is_valid(t.column(seq_col)))
        t = t.filter(keep)
        pid = t.column(partition_col).cast(pa.int64())
        seq = t.column(seq_col).cast(pa.int64())
        w = pc.divide(seq, W).cast(pa.int64())
        wk = pa.array(
            (pid.to_numpy(zero_copy_only=False).astype(np.uint64) * MIX
             + w.to_numpy(zero_copy_only=False).astype(np.uint64))
            .astype(np.int64)
        )
        return pa.table({"_pid": pid, "_seq": seq, "_wk": wk})

    OUT_SCHEMA = pa.schema([
        ("partition_id", pa.int64()), ("kind", pa.string()),
        ("seq_start", pa.int64()), ("seq_end", pa.int64()),
        ("n", pa.int64()),
    ])

    def audit_partition(t: pa.Table) -> pa.Table:
        pid = t.column("_pid").to_numpy(zero_copy_only=False)
        seq = t.column("_seq").to_numpy(zero_copy_only=False)
        if len(pid) == 0:
            return OUT_SCHEMA.empty_table()
        order = np.lexsort((seq, pid))
        pid, seq = pid[order], seq[order]
        # run-length over equal (pid, seq)
        new = np.empty(len(pid), dtype=bool)
        new[0] = True
        new[1:] = (pid[1:] != pid[:-1]) | (seq[1:] != seq[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(pid)))
        upid, useq = pid[starts], seq[starts]
        out_pid, out_kind, out_s, out_e, out_n = [], [], [], [], []
        # duplicates: any (pid, seq) with > 1 copies
        dm = counts > 1
        if dm.any():
            out_pid.append(upid[dm])
            out_kind.append(np.full(int(dm.sum()), "dup", dtype=object))
            out_s.append(useq[dm])
            out_e.append(useq[dm])
            out_n.append(counts[dm].astype(np.int64))
        # interior gaps: consecutive distinct seqs in the SAME window
        w = useq // W
        same = (upid[1:] == upid[:-1]) & (w[1:] == w[:-1])
        gm = same & (useq[1:] > useq[:-1] + 1)
        if gm.any():
            lo = useq[:-1][gm] + 1
            hi = useq[1:][gm] - 1
            out_pid.append(upid[1:][gm])
            out_kind.append(np.full(int(gm.sum()), "gap", dtype=object))
            out_s.append(lo)
            out_e.append(hi)
            out_n.append((hi - lo + 1).astype(np.int64))
        # per-(pid, window) summary rows for the driver stitch
        wnew = np.empty(len(upid), dtype=bool)
        wnew[0] = True
        wnew[1:] = (upid[1:] != upid[:-1]) | (w[1:] != w[:-1])
        ws = np.flatnonzero(wnew)
        we = np.append(ws[1:], len(upid)) - 1
        out_pid.append(upid[ws])
        out_kind.append(np.full(len(ws), "_win", dtype=object))
        out_s.append(useq[ws])       # window's min present seq
        out_e.append(useq[we])       # window's max present seq
        out_n.append((we - ws + 1).astype(np.int64))
        return pa.table({
            "partition_id": pa.array(np.concatenate(out_pid), pa.int64()),
            "kind": pa.array(np.concatenate(out_kind), pa.string()),
            "seq_start": pa.array(np.concatenate(out_s), pa.int64()),
            "seq_end": pa.array(np.concatenate(out_e), pa.int64()),
            "n": pa.array(np.concatenate(out_n), pa.int64()),
        })

    audit = keyed_map_groups(
        ds, "_wk", audit_partition, num_partitions=num_partitions,
        batch_format="pyarrow", pre=project,
    ).materialize()  # findings + window summaries only — O(defects+windows)

    win_rows = audit.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "_win")),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    findings = audit.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("kind"), "_win")),
        batch_format="pyarrow", batch_size=None,
    )

    # driver stitch of cross-window gaps: O(windows log windows)
    wins = sorted((r["partition_id"], r["seq_start"], r["seq_end"])
                  for r in win_rows)
    cp, cs, ce, cn = [], [], [], []
    for (p1, lo1, hi1), (p2, lo2, hi2) in zip(wins, wins[1:]):
        if p1 == p2 and lo2 > hi1 + 1:
            cp.append(p1)
            cs.append(hi1 + 1)
            ce.append(lo2 - 1)
            cn.append(lo2 - hi1 - 1)
    if not cp:
        return findings
    cross = pa.table({
        "partition_id": pa.array(cp, pa.int64()),
        "kind": pa.array(["gap"] * len(cp), pa.string()),
        "seq_start": pa.array(cs, pa.int64()),
        "seq_end": pa.array(ce, pa.int64()),
        "n": pa.array(cn, pa.int64()),
    })
    return findings.union(ray.data.from_arrow(cross))
