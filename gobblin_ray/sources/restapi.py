"""REST-style paginated-pull source: the page-token-resume connector
pattern (RestApiExtractor analog,
gobblin-core/src/main/java/org/apache/gobblin/source/extractor/extract/restapi/RestApiExtractor.java
— getDataFromSource pulls one HTTP page at a time and chains on the
response's next-page token until exhausted). No network exists in this
sandbox, so the "API" is a file-backed simulator with the same contract
(opaque page token in, one page of records + next token out), and the
pattern under test is the part the reference actually contributes: a
WORK UNIT that survives a mid-listing kill because the extractor
checkpoints the page token after every page and resumes from it, never
refetching committed pages.

Shape: each work unit (a watermark span, QueryBasedSource-style) runs as
ONE Ray task that loops pages sequentially — pagination is inherently
serial within a unit, so parallelism comes from running many units at
once (the same axis the reference scales on: one extractor per work
unit). Every page lands as its own content-named staged parquet part +
an atomically-renamed token marker, so a killed task resumes at the
first unfetched page; completed units write a ``done`` marker. The
combined output is read back as one Dataset from the staged parts.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class FilePagedApi:
    """File-backed paginated API over one parquet table ordered by
    ``order_col``: ``fetch(lo, hi, token)`` returns one page of rows from
    the half-open span ``(lo, hi]`` starting at the opaque ``token``
    (None = first page) plus the next token, mimicking a REST endpoint's
    cursor contract. A call-count file (optional) audits how many pages
    a run actually fetched — the resume test's no-refetch proof."""

    def __init__(self, parquet_path: str, order_col: str,
                 page_size: int = 100, calls_file: str | None = None):
        self.parquet_path = parquet_path
        self.order_col = order_col
        self.page_size = int(page_size)
        self.calls_file = calls_file

    def fetch(self, lo, hi, token: str | None):
        import pyarrow.compute as pc

        offset = int(token) if token else 0
        t = pq.read_table(self.parquet_path)
        m = pc.and_(
            pc.greater(t.column(self.order_col), pa.scalar(lo)),
            pc.less_equal(t.column(self.order_col), pa.scalar(hi)),
        )
        span = t.filter(m).sort_by([(self.order_col, "ascending")])
        page = span.slice(offset, self.page_size)
        next_token = (
            str(offset + self.page_size)
            if offset + self.page_size < span.num_rows
            else None
        )
        if self.calls_file:
            # audit only — atomic append of one line per page fetch
            with open(self.calls_file, "a") as f:
                f.write(f"{lo},{hi},{offset}\n")
        return page, next_token


def _unit_dir(state_dir: str, unit_id: int) -> str:
    return os.path.join(state_dir, f"unit={unit_id}")


def _fetch_unit(api: FilePagedApi, unit_id: int, lo, hi, state_dir: str,
                max_pages: int | None = None) -> dict:
    """Pull pages of one work unit, checkpointing the token after each
    page. Idempotent under kill/retry: page files are named per (unit,
    page ordinal) and the token marker renames atomically, so a resumed
    run continues at the first unfetched page. ``max_pages`` bounds the
    pages fetched THIS call (the kill-simulation hook for the resume
    test); None pulls to exhaustion. ONE implementation for both modes —
    the checkpoint protocol must not be able to diverge between them."""
    udir = _unit_dir(state_dir, unit_id)
    os.makedirs(udir, exist_ok=True)
    done_marker = os.path.join(udir, "done")
    token_marker = os.path.join(udir, "token.json")
    if os.path.exists(done_marker):
        return {"unit": unit_id, "pages": 0, "resumed_done": True}
    token = None
    page_no = 0
    if os.path.exists(token_marker):
        with open(token_marker) as f:
            st = json.load(f)
        token, page_no = st["token"], st["page_no"]
    pages = 0
    while max_pages is None or pages < max_pages:
        page, next_token = api.fetch(lo, hi, token)
        if page.num_rows:
            path = os.path.join(udir, f"page-{page_no:06d}.parquet")
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(page, tmp)
            os.replace(tmp, path)
        pages += 1
        page_no += 1
        if next_token is None:
            tmp = f"{done_marker}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"pages": page_no}, f)
            os.replace(tmp, done_marker)
            return {"unit": unit_id, "pages": pages, "resumed_done": False}
        tmp = f"{token_marker}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"token": next_token, "page_no": page_no}, f)
        os.replace(tmp, token_marker)
        token = next_token
    return {"unit": unit_id, "pages": pages, "resumed_done": False,
            "killed_mid_listing": True}


def paged_pull(api: FilePagedApi, spans: list[tuple], state_dir: str,
               max_pages_per_call: int | None = None):
    """Run one paginated pull over ``spans`` (list of half-open (lo, hi]
    work units) as parallel Ray tasks, one task per unit (pagination is
    serial inside a unit by contract). Returns the lineage list of
    per-unit dicts. ``max_pages_per_call`` simulates a mid-listing kill
    for the resume test: the task stops (checkpointed) after that many
    pages instead of finishing."""
    import ray

    @ray.remote(num_cpus=0.5)
    def run_unit(unit_id: int, lo, hi):
        return _fetch_unit(api, unit_id, lo, hi, state_dir,
                           max_pages=max_pages_per_call)

    return ray.get([
        run_unit.remote(i, lo, hi) for i, (lo, hi) in enumerate(spans)
    ])


def staged_dataset(state_dir: str):
    """Read every staged page file of every unit back as ONE Dataset —
    the downstream pipeline's view of the pulled rows."""
    import ray.data as rd

    files = []
    if os.path.isdir(state_dir):
        for d in sorted(os.listdir(state_dir)):
            udir = os.path.join(state_dir, d)
            if not (d.startswith("unit=") and os.path.isdir(udir)):
                continue
            files += [
                os.path.join(udir, f)
                for f in sorted(os.listdir(udir))
                if f.startswith("page-") and f.endswith(".parquet")
            ]
    if not files:
        raise FileNotFoundError(f"no staged pages under {state_dir}")
    return rd.read_parquet(files)
