"""Sequential single-process oracle for the CDC replay (FIXTURES.md §4).

Applies events one at a time in event_seq order: an event wins against the
current row iff its (warc_ts, event_seq) is strictly greater; deletes obey
the same comparison (and a winning delete removes/blocks the row)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def oracle_final_state(pages: pa.Table, events: list[pa.Table]) -> pd.DataFrame:
    state: dict[str, dict] = {}
    pdf = pages.to_pandas()
    for row in pdf.itertuples(index=False):
        state[row.url] = {
            "url": row.url,
            "warc_ts": row.warc_ts,
            "html": row.html,
            "text": row.text,
            "lang": row.lang,
            "event_seq": -1,
            "deleted": False,
            "fetch_status": None,
        }
    for tbl in events:
        edf = tbl.to_pandas()
        has_fs = "fetch_status" in edf.columns
        for row in edf.itertuples(index=False):
            cur = state.get(row.url)
            key = (row.warc_ts, row.event_seq)
            if cur is not None and key <= (cur["warc_ts"], cur["event_seq"]):
                continue  # loses LWW (late or duplicate data)
            state[row.url] = {
                "url": row.url,
                "warc_ts": row.warc_ts,
                "html": None if row.op == "delete" else row.html,
                "text": None if row.op == "delete" else row.text,
                "lang": None if row.op == "delete" else row.lang,
                "event_seq": row.event_seq,
                "deleted": row.op == "delete",
                "fetch_status": getattr(row, "fetch_status", None) if has_fs else None,
            }
    rows = [v for v in state.values() if not v["deleted"]]
    df = pd.DataFrame(rows).drop(columns=["deleted"]).sort_values("url")
    return df.reset_index(drop=True)
