"""Sort / top-k stages (SURVEY §2.7).

``top_k`` avoids the global all-to-all sort for small k: each block emits
its own k best rows (vectorized Arrow sort+slice), and only the tiny
candidate set (<= k x blocks rows) goes through the final sort+limit —
the same candidate/final-reduce shape as functions.similarity.knn_brute_force.
Gobblin analog: MR secondary sort feeding a single reducer that keeps the
top rows (MRCompactor job shape), minus the full shuffle.
"""

from __future__ import annotations

import pyarrow as pa


def top_k(ds, k: int, by: list[str], descending: list[bool]):
    """Global top-k rows of ``ds`` ordered by ``by``/``descending``.

    Per-block partial top-k, then one final sort+limit over the candidates.
    At 10^9 input rows the exchange moves k rows per block, not the table.
    """
    sort_keys = [
        (c, "descending" if d else "ascending") for c, d in zip(by, descending)
    ]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.sort_by(sort_keys).slice(0, k)

    partial.__name__ = f"partial_top{k}"
    candidates = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return candidates.sort(by, descending=descending).limit(k)
