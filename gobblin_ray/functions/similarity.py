"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast
  ONCE via ``ray.put`` and read inside each task (never re-shipped per
  batch); each batch does one float64 matmul; per-batch top-k candidates
  are then globally reduced per query (tiny shuffle over k x batches rows).
- ``knn_lsh``: the scale path — hyperplane-LSH bucket the corpus once,
  probe only the query's bucket (+ optional multi-probe neighbors).

Determinism: float64 accumulation, ties broken by ascending id, so results
are stable across runs and comparable to a DuckDB oracle using
``list_cosine_similarity``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import HyperplaneLSH


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BatchTopK:
    """Stateless per-batch scorer: cosine vs the broadcast query matrix,
    emit the batch-local top-k candidates per query."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = queries_ref
        if isinstance(q, ray.ObjectRef):  # fetched from the LOCAL store
            q = ray.get(q)
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (Q, D)
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(
            np.vstack(batch.column(self.vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        scores = mat @ self.q.T  # (n, Q)
        k = min(self.k, len(ids))
        # argpartition per query column, then exact sort of the k candidates
        idx = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, Q)
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[1]):
            cand = idx[:, qi]
            out_q.append(np.full(k, qi, np.int64))
            out_id.append(ids[cand])
            out_s.append(scores[cand, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def knn_brute_force(
    embeddings,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: dict[int, int] | None = None,
):
    """Exact top-k cosine neighbors for each row of ``query_matrix``.

    Returns a Dataset (query_id, id_col, score) with exactly k rows per
    query, score-descending (ties: ascending id). ``exclude_ids`` maps
    query_id -> corpus id to exclude (self-match suppression)."""
    import ray

    qref = ray.put(np.ascontiguousarray(query_matrix))
    # Actor-pool form: _BatchTopK.__init__ runs IN the worker, so ray.get of
    # the query matrix happens against the local object store — the matrix
    # is broadcast once, never serialized into the task closure (the round-1
    # version built the scorer on the driver and shipped the materialized
    # matrix with every task).
    candidates = embeddings.map_batches(
        _BatchTopK,
        fn_constructor_kwargs=dict(
            queries_ref=qref,
            k=k + (1 if exclude_ids else 0),
            id_col=id_col,
            vec_col=vec_col,
        ),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
    )
    excl = exclude_ids or {}

    def final_topk(group: pa.Table) -> pa.Table:
        qid = int(group.column("query_id")[0].as_py())
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sc = group.column("score").to_numpy(zero_copy_only=False)
        if qid in excl:
            m = ids != excl[qid]
            ids, sc = ids[m], sc[m]
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, np.int64)),
                id_col: pa.array(ids[order]),
                "score": pa.array(sc[order]),
            }
        )

    return candidates.groupby("query_id").map_groups(
        final_topk, batch_format="pyarrow"
    )


def knn_lsh(
    embeddings,
    query_matrix: np.ndarray,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    concurrency=(1, 4),
    seed: int = 42,
):
    """Approximate top-k: hyperplane-LSH bucket the corpus (one actor-pool
    pass), then score ONLY batches' rows falling in each query's bucket.
    Recall < 1.0 by construction; raise n_probes by lowering n_planes.

    At 100 TB the bucketed corpus would be written partitioned by
    ``lsh_bucket`` once and re-used across query sets (the IVF posture:
    coarse quantize once, probe per query)."""
    lsh = HyperplaneLSH(dim=dim, n_planes=n_planes, vec_col=vec_col, seed=seed)
    q_buckets = ((_normalize(query_matrix.astype(np.float64)) @ lsh.planes) > 0)
    q_bucket_ids = (q_buckets * lsh.weights).sum(axis=1)
    wanted = set(int(b) for b in q_bucket_ids)

    bucketed = embeddings.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, vec_col=vec_col, seed=seed),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
    )

    def in_wanted(t: pa.Table) -> pa.Table:
        b = t.column("lsh_bucket").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(b, np.fromiter(wanted, np.int64, len(wanted)))))

    in_wanted.__name__ = "probe_buckets"
    probed = bucketed.map_batches(in_wanted, batch_format="pyarrow", batch_size=None)
    return knn_brute_force(probed, query_matrix, k, id_col, vec_col)


def kmeans_fit(sample: np.ndarray, n_cells: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on a driver-held SAMPLE: centroids
    are cosine-assigned means, L2-renormalized each round; init is evenly
    strided sample rows (no RNG — reproducible across processes).

    The IVF 'small model, broadcast wide' pattern: at 100 TB the sample is
    a ~1e-5 fraction read once (ds.limit / filter on id), the fit is
    O(sample x cells x iters) on the driver, and only the (cells x dim)
    centroid matrix is broadcast to the assignment stage."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    idx = np.unique(np.linspace(0, len(X) - 1, min(n_cells, len(X))).astype(int))
    C = X[idx].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


class _AssignCell:
    """Actor-pool stage: append ``ivf_cell`` = argmax-cosine centroid id.
    Centroids fetched from the local object store once per actor."""

    def __init__(self, centroids_ref, vec_col: str):
        import ray

        c = centroids_ref
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        self.C = np.asarray(c, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        mat = _normalize(
            np.vstack(t.column(self.vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        cell = np.argmax(mat @ self.C.T, axis=1).astype(np.int64)
        return t.append_column("ivf_cell", pa.array(cell))


def probe_cells(query_matrix: np.ndarray, centroids: np.ndarray,
                nprobe: int) -> set[int]:
    """Union of each query's ``nprobe`` nearest cells (ties: lower cell id),
    the candidate-list restriction IVF trades recall for."""
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    sims = q @ _normalize(centroids).T  # (Q, cells)
    wanted: set[int] = set()
    for row in sims:
        order = np.lexsort((np.arange(len(row)), -row))[:nprobe]
        wanted.update(int(c) for c in order)
    return wanted


def knn_ivf(
    embeddings,
    query_matrix: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
):
    """IVF approximate top-k: coarse-quantize the corpus to ``centroids``
    (one actor-pool pass, broadcast centroid matrix), probe each query's
    ``nprobe`` nearest cells, exact-score only the probed rows.

    vs ``knn_lsh``: data-adapted cells (k-means) give balanced partitions
    on clustered embeddings where fixed hyperplanes produce skewed
    buckets. At 100 TB the cell assignment is written partitioned by
    ``ivf_cell`` once and re-used across query sets; per-query work is
    nprobe/cells of the corpus. Fit centroids separately via
    ``kmeans_fit`` (the caller controls sampling — keep it deterministic)."""
    import ray

    cref = ray.put(np.ascontiguousarray(_normalize(centroids)))
    assigned = embeddings.map_batches(
        _AssignCell,
        fn_constructor_kwargs=dict(centroids_ref=cref, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
    )
    wanted = probe_cells(query_matrix, centroids, nprobe)

    def in_probed(t: pa.Table) -> pa.Table:
        b = t.column("ivf_cell").to_numpy(zero_copy_only=False)
        return t.filter(
            pa.array(np.isin(b, np.fromiter(wanted, np.int64, len(wanted))))
        )

    in_probed.__name__ = "probe_ivf_cells"
    probed = assigned.map_batches(in_probed, batch_format="pyarrow", batch_size=None)
    return knn_brute_force(probed, query_matrix, k, id_col, vec_col)


class _BatchPairAbove:
    """Per-batch exact verifier: cosine of every batch row against the
    broadcast corpus matrix, emitting (a, b, cosine) pairs with a < b and
    cosine >= tau. The corpus is fetched from the LOCAL object store once
    per actor (never serialized into the task closure)."""

    def __init__(self, corpus_ref, tau: float, id_col: str):
        import ray

        c = corpus_ref
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        self.corpus_ids, self.corpus = c  # (N,), (N, D) already normalized
        self.tau, self.id_col = float(tau), id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(
            np.vstack(
                batch.column("__vec").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
        )
        scores = mat @ self.corpus.T  # (n, N)
        # a < b keeps each unordered pair exactly once (and drops self)
        keep = (ids[:, None] < self.corpus_ids[None, :]) & (
            scores >= self.tau
        )
        ai, bj = np.nonzero(keep)
        return pa.table({
            "a": pa.array(ids[ai]),
            "b": pa.array(self.corpus_ids[bj]),
            "cosine": pa.array(scores[ai, bj]),
        })


def cosine_self_join(
    embeddings,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """EXACT all-pairs cosine similarity self-join: every unordered pair
    (a < b) with cosine >= ``tau`` — the similarity-join primitive behind
    near-duplicate detection at a chosen threshold and related-content
    linking. Returns a Dataset (a, b, cosine).

    Scale shape: the normalized corpus matrix is broadcast ONCE via
    ``ray.put`` and read in each verifier actor's ``__init__``; each batch
    then does one float64 matmul against it (O(n_batch x N x D) C-kernel
    work, no Python loop, no shuffle at all). This is the
    one-side-fits-in-worker-memory regime (same contract as
    ``knn_brute_force``'s query matrix — at D=64 float64, 10^6 vectors is
    ~0.5 GB). Beyond that, prefilter candidates with the hyperplane-LSH
    buckets (`dedup.embedding_neardup`) or IVF cells (`knn_ivf`) and run
    this kernel per cell as the exact verifier — the composition keeps the
    verify exact for all pairs the prefilter admits."""
    import ray

    small = embeddings.select_columns([id_col, vec_col]).to_pandas()
    ids = small[id_col].to_numpy()
    mat = _normalize(np.vstack(small[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, np.ascontiguousarray(mat)))

    renamed = embeddings.select_columns([id_col, vec_col]).rename_columns(
        {vec_col: "__vec"}
    )
    return renamed.map_batches(
        _BatchPairAbove,
        fn_constructor_kwargs=dict(corpus_ref=ref, tau=tau, id_col=id_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
