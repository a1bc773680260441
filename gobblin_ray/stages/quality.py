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
