"""Persisted table constraints — the Delta Lake ``ADD CONSTRAINT`` /
Iceberg-validation analog, enforced in the reference's ROW-POLICY posture
(RowLevelPolicy ERR_FILE semantics,
gobblin-api/.../qualitychecker/row/RowLevelPolicy.java:33-68): a
constraint lives in the MANIFEST (metadata-only DDL, survives restarts
and drivers), and every subsequent epoch annotates violating UPSERT
events with ``constraint:<name>`` so the merge diverts them to the
``_errors/`` quarantine — redrivable after the data is fixed or the
constraint dropped — instead of failing the write (a CDC feed must keep
draining; Delta's fail-the-transaction is the wrong posture for a log).
Delete events are exempt: a tombstone legitimately carries null content
columns. A column missing from an event batch evaluates as null (a
lagging producer that never sends the column violates ``not_null``
exactly as the merged row would).

Spec grammar (JSON-serializable; validated at DDL time):
  {"kind": "not_null", "column": c}
  {"kind": "in_set",   "column": c, "values": [...]}
  {"kind": "range",    "column": c, "lo": x?, "hi": y?}   (inclusive)
  {"kind": "regex",    "column": c, "pattern": p}          (RE2 search)
All checks are one vectorized pyarrow kernel per constraint per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KINDS = ("not_null", "in_set", "range", "regex")


def validate_spec(spec: dict) -> dict:
    """Normalize + sanity-check a constraint spec (raises ValueError)."""
    kind = spec.get("kind")
    col = spec.get("column")
    if kind not in KINDS:
        raise ValueError(f"unknown constraint kind {kind!r} (have {KINDS})")
    if not col or not isinstance(col, str):
        raise ValueError("constraint needs a 'column'")
    out = {"kind": kind, "column": col}
    if kind == "in_set":
        vals = spec.get("values")
        if not vals or not isinstance(vals, list):
            raise ValueError("in_set needs non-empty 'values'")
        out["values"] = vals
    elif kind == "range":
        lo, hi = spec.get("lo"), spec.get("hi")
        if lo is None and hi is None:
            raise ValueError("range needs 'lo' and/or 'hi'")
        out["lo"], out["hi"] = lo, hi
    elif kind == "regex":
        pat = spec.get("pattern")
        if not pat or not isinstance(pat, str):
            raise ValueError("regex needs a 'pattern'")
        # compile-check NOW (RE2 errors should fail the DDL, not an epoch);
        # probe with a one-element array — pyarrow skips compilation on
        # empty input
        pc.match_substring_regex(pa.array(["x"]), pat)
        out["pattern"] = pat
    return out


def _ok_mask(spec: dict, t: pa.Table) -> np.ndarray:
    """True where the row SATISFIES the constraint. A missing column is
    all-null; null fails not_null and fails every value test (SQL CHECK
    semantics are 'not false', but quarantine-not-reject makes strictness
    the safer default and the oracle-tested contract)."""
    col = spec["column"]
    n = t.num_rows
    if col not in t.column_names:
        return np.zeros(n, dtype=bool)  # all-null: fails every kind
    c = t.column(col)
    kind = spec["kind"]
    if kind == "not_null":
        return pc.is_valid(c).to_numpy(zero_copy_only=False)
    if kind == "in_set":
        vals = pa.array(spec["values"]).cast(c.type)
        ok = pc.is_in(c, value_set=vals)
    elif kind == "range":
        ok = pa.array(np.ones(n, dtype=bool))
        if spec.get("lo") is not None:
            ok = pc.and_(ok, pc.greater_equal(
                c, pa.scalar(spec["lo"]).cast(c.type)))
        if spec.get("hi") is not None:
            ok = pc.and_(ok, pc.less_equal(
                c, pa.scalar(spec["hi"]).cast(c.type)))
    else:  # regex
        ok = pc.match_substring_regex(c.cast(pa.string()), spec["pattern"])
    return pc.fill_null(ok, False).to_numpy(zero_copy_only=False)


def annotate_violations(constraints: dict[str, dict], t: pa.Table,
                        err: np.ndarray, exempt: np.ndarray) -> np.ndarray:
    """Fill ``err`` (object ndarray of reason-or-None) with
    ``constraint:<name>`` where a non-exempt, not-yet-failed row violates
    a constraint. First violating constraint (name order) wins — one
    deterministic reason per row."""
    for name in sorted(constraints):
        ok = _ok_mask(constraints[name], t)
        bad = ~ok & ~exempt & (err == None)  # noqa: E711 (vector compare)
        if bad.any():
            err[bad] = f"constraint:{name}"
    return err
