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
import pyarrow.compute as pc

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
        if batch.num_rows == 0:  # empty block: argpartition(k=-1) crashes
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
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

    CAVEAT (inherent to bucket probing): a query whose bucket holds NO
    corpus vectors returns zero rows for that query_id — consumers must
    key on query_id, never align positionally, and treat a missing id as
    recall collapse (lower n_planes, or fall back to knn_brute_force for
    the missing ids). 2^n_planes should stay well under the corpus size.

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


def farthest_point_init(sample: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-means init: greedy max-min cosine-distance traversal
    starting from row 0 (no RNG). On data with k well-separated clusters the
    traversal provably lands one seed per cluster — the property the Lloyd
    convergence argument needs (kmeans++ without the randomness)."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    seeds = [0]
    # min cosine-similarity to any chosen seed, per point (lower = farther)
    best = X @ X[0]
    for _ in range(k - 1):
        nxt = int(np.argmin(best))  # ties: lowest index (np.argmin rule)
        seeds.append(nxt)
        best = np.maximum(best, X @ X[nxt])
    return X[seeds].copy()


def kmeans_lloyd(
    ds,
    k: int,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_sample_n: int = 4096,
    batch_size: int = 8192,
):
    """Distributed Lloyd k-means over the FULL dataset (spherical/cosine):
    per iteration, ONE map_batches pass computes per-batch per-cluster
    partial sums (a (<=k) x (dim+2) wide table — the mergeable sufficient
    statistic), a tiny ``groupby('cluster').sum()`` tree combines them, and
    the driver recomputes + renormalizes the (k x dim) centroid matrix and
    re-broadcasts it via ``ray.put``. Returns ``(assigned_ds, centroids)``
    where ``assigned_ds`` has a ``cluster`` column.

    Scale shape: per-iteration exchange volume is O(blocks x k x dim)
    floats — independent of row count; the input is re-scanned once per
    iteration (at 100 TB, fit on a sample via ``kmeans_fit`` and run 1-2
    refinement iterations here; this is the SemDeDup/SemDeDup-style
    curation preprocessing pass, Abbas et al. 2023). Init is the
    deterministic farthest-point traversal on a driver-held sample, so
    results are reproducible across runs and partitionings given a
    deterministic input order.

    Reference analog: Gobblin has no clustering operator; this follows the
    classic mergeable-summaries aggregation shape the repo uses for
    sketches (functions/sketch.py) applied to the Lloyd sufficient
    statistics."""
    import ray

    proj = ds.select_columns([id_col, vec_col])
    sample = proj.limit(init_sample_n).to_pandas()
    dim = len(sample[vec_col].iloc[0])
    C = farthest_point_init(np.vstack(sample[vec_col].to_numpy()), k)

    sum_cols = [f"s{i}" for i in range(dim)]

    def partials(cref, t: pa.Table) -> pa.Table:
        c = ray.get(cref[0]) if isinstance(cref, list) else cref
        mat = _normalize(
            np.vstack(t.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        assign = np.argmax(mat @ c.T, axis=1)
        present = np.unique(assign)
        onehot = assign[:, None] == present[None, :]  # (n, p)
        sums = onehot.T.astype(np.float64) @ mat  # (p, dim)
        cols = {
            "cluster": pa.array(present.astype(np.int64)),
            "n": pa.array(onehot.sum(axis=0).astype(np.int64)),
        }
        for i, name in enumerate(sum_cols):
            cols[name] = pa.array(sums[:, i])
        return pa.table(cols)

    for _ in range(iters):
        cref = [ray.put(np.ascontiguousarray(C))]
        import functools

        fn = functools.partial(partials, cref)
        fn.__name__ = "kmeans_partials"
        stats = (
            proj.map_batches(
                fn, batch_format="pyarrow", batch_size=batch_size
            )
            .groupby("cluster")
            .sum(sum_cols + ["n"])
            .take_all()
        )
        newC = C.copy()
        for row in stats:
            cid = int(row["cluster"])
            n = float(row["sum(n)"])
            if n > 0:
                vec = np.array([row[f"sum({s})"] for s in sum_cols])
                newC[cid] = vec / n
        C = _normalize(newC)

    cref_final = ray.put(np.ascontiguousarray(C))
    assigned = ds.map_batches(
        _AssignCell,
        fn_constructor_kwargs=dict(centroids_ref=cref_final, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    ).rename_columns({"ivf_cell": "cluster"})
    return assigned, C


def semantic_dedup(
    embeddings,
    k: int,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 8,
    block: int = 1024,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster the
    embedding space, then WITHIN each cluster drop every row that has a
    lower-id row with cosine >= ``tau`` (keep-first-by-id, the same
    deterministic winner rule as the exact/MinHash dedups). Semantic
    near-duplicates — same content re-encoded, paraphrases — land in the
    same cluster, so the O(m^2) pair check runs per cluster, never
    corpus-wide. Returns the kept rows with their ``cluster`` column.

    Scale shape: clustering bounds the quadratic term to the largest
    cluster (k chosen so corpus/k fits a worker — the paper uses
    k = O(sqrt(n))); the per-cluster check is blocked matmul, O(m*B)
    memory, no Python row loop. At 100 TB, write the assignment
    partitioned by cluster once, then dedup per partition (the same
    posture as knn_ivf's cell reuse)."""
    assigned, _C = kmeans_lloyd(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )

    def dedup_cell(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending")])
        mat = _normalize(
            np.vstack(g.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        m = len(mat)
        dominated = np.zeros(m, dtype=bool)
        # blocked: rows [lo:hi) vs ALL earlier rows [0:hi) — O(m*B) memory
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            sims = mat[lo:hi] @ mat[:hi].T  # (b, hi)
            cols = np.arange(hi)[None, :]
            rows = np.arange(lo, hi)[:, None]
            hit = (sims >= tau) & (cols < rows)
            dominated[lo:hi] = hit.any(axis=1)
        return g.filter(pa.array(~dominated))

    return assigned.groupby("cluster").map_groups(
        dedup_cell, batch_format="pyarrow"
    )


def logistic_score(
    embeddings,
    weights: np.ndarray,
    bias: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "score",
    batch_size: int = 8192,
):
    """Linear-model batch inference over an embedding column: score =
    sigmoid(w . x + b) per row — the quality-classifier curation shape
    (GPT-3's LR-against-WebText filter; fastText quality scoring). The
    weight vector is broadcast ONCE via ``ray.put`` and fetched in each
    actor's ``__init__``; each batch is one float64 matvec (no Python
    loop, no shuffle). Returns (id_col, out_col)."""
    import ray

    wref = ray.put(np.ascontiguousarray(np.asarray(weights, np.float64)))

    class _Score:
        def __init__(self):
            self.w = ray.get(wref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = np.vstack(
                t.column(vec_col).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            z = mat @ self.w + bias
            return pa.table(
                {
                    id_col: t.column(id_col),
                    out_col: pa.array(1.0 / (1.0 + np.exp(-z))),
                }
            )

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        _Score,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


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


def scalar_quantize(
    embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "qvec",
    bits: int = 8,
    batch_size: int = 8192,
):
    """INT8/INTn scalar quantization of an embedding column — the
    vector-store compression step a 100 TB ANN corpus needs (4x storage cut
    at 8 bits vs float32; the same min-max SQ scheme FAISS's
    ScalarQuantizer QT_8bit uses): q = floor((x - mn) * (2^bits - 1) /
    (mx - mn) + 0.5), with ONE global (mn, mx) pair so codes are comparable
    corpus-wide.

    Two passes, no shuffle: pass 1 folds per-batch (min, max) partials —
    O(blocks) rows to the driver; pass 2 broadcasts the two scalars in the
    task closure (two floats — no ray.put needed) and quantizes each batch
    as one numpy expression. Half-up rounding via floor(z + 0.5), NOT
    numpy's banker's rint, so the arithmetic is bit-reproducible against
    the SQL oracle. Degenerate mx == mn maps everything to 0. Returns
    (id_col, out_col) with out_col a list<int64> of codes."""
    import ray  # noqa: F401 - symmetry with siblings; closure broadcast here

    proj = embeddings.select_columns([id_col, vec_col])

    def batch_minmax(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t.column(vec_col))
        return pa.table({
            "mn": pa.array([pc.min(flat).as_py()], pa.float64()),
            "mx": pa.array([pc.max(flat).as_py()], pa.float64()),
        })

    batch_minmax.__name__ = "sq_minmax_partials"
    parts = proj.map_batches(
        batch_minmax, batch_format="pyarrow", batch_size=batch_size
    ).take_all()  # O(blocks) rows
    mn = min(p["mn"] for p in parts)
    mx = max(p["mx"] for p in parts)
    levels = float((1 << bits) - 1)
    scale = (levels / (mx - mn)) if mx > mn else 0.0

    def quantize(t: pa.Table) -> pa.Table:
        col = t.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        # same associativity as the SQL literal: ((x - mn) * levels) / range
        q = np.floor((flat - mn) * levels / (mx - mn) + 0.5) if mx > mn \
            else np.zeros(len(flat))
        codes = pa.ListArray.from_arrays(
            col.offsets, pa.array(q.astype(np.int64), pa.int64())
        )
        return pa.table({id_col: t.column(id_col), out_col: codes})

    quantize.__name__ = "scalar_quantize"
    return proj.map_batches(
        quantize, batch_format="pyarrow", batch_size=batch_size
    )


def pq_kmeans(sub: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic EUCLIDEAN Lloyd k-means on a driver-held subspace
    sample (PQ codebook fit — contrast ``kmeans_fit``'s spherical
    variant): evenly-strided init (no RNG), argmin-distance assignment
    (ties: first centroid), mean update, empty cells keep their centroid.
    Shared verbatim with the sequential oracle."""
    X = np.asarray(sub, dtype=np.float64)
    idx = np.unique(np.linspace(0, len(X) - 1, min(k, len(X))).astype(int))
    C = X[idx].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        assign = np.argmin(d2, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C



def _assign_pq_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) rows -> (n, m) PQ codes under (m, k, d) codebooks:
    per-subspace squared-distance argmin (ties: first centroid).
    Per-row results are independent of batch height — shared by
    product_quantize and knn_pq_adc so their codes can never diverge."""
    m, _k, d = books.shape
    return np.stack([
        np.argmin(((mat[:, None, i * d:(i + 1) * d]
                    - books[i][None, :, :]) ** 2).sum(axis=-1), axis=1)
        for i in range(m)
    ], axis=1)


def product_quantize(
    ds,
    train_matrix: np.ndarray,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product quantization (FAISS PQ shape — the ANN-at-scale
    compression path beyond ``scalar_quantize``): split the vector into
    ``m`` subspaces, fit a k-centroid EUCLIDEAN codebook per subspace on
    a driver-held training sample (``train_matrix`` — at 100 TB a ~1e-5
    hash-sampled fraction read once; the codebook is m×k×(dim/m) floats),
    broadcast the codebooks ONCE via ``ray.put``, and assign codes per
    batch vectorized (per-row distance argmins are independent of batch
    height, so codes are deterministic for any partitioning). Returns
    (id_col, pq_code) with the m codes comma-joined (the repo's list-safe
    compare convention)."""
    import ray

    X = np.asarray(train_matrix, dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = np.stack([
        pq_kmeans(X[:, i * d:(i + 1) * d], k, iters) for i in range(m)
    ])  # (m, k, d)
    bref = ray.put(books)

    class _Assign:
        def __init__(self):
            self.books = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = col.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(t.num_rows, dim)
            codes = _assign_pq_codes(mat, self.books)  # (n, m)
            joined = [",".join(map(str, row)) for row in codes]
            return pa.table({
                id_col: t.column(id_col),
                "pq_code": pa.array(joined, pa.string()),
            })

    return ds.select_columns([id_col, vec_col]).map_batches(
        _Assign, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8),
    )


def knn_pq_adc(
    ds,
    train_matrix: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Approximate kNN by ASYMMETRIC DISTANCE COMPUTATION over PQ codes
    (the FAISS IVFADC search half of ``product_quantize``): fit the
    per-subspace codebooks on the driver sample, precompute each query's
    (m × ks) lookup table of exact query-to-centroid squared distances,
    broadcast (codebooks, LUT) ONCE via ``ray.put``; each batch assigns
    codes and accumulates approx distances by LUT gather (fixed subspace
    order — per-row results independent of batch height), emits its local
    top-k per query, and a single bounded ``groupby(query_id)`` reduce
    keeps the global top-k (ties: ascending id). Corpus bytes never move:
    only k × blocks candidate rows reach the exchange."""
    import ray

    X = np.asarray(train_matrix, dtype=np.float64)
    Q = np.asarray(queries, dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = np.stack([
        pq_kmeans(X[:, i * d:(i + 1) * d], ks, iters) for i in range(m)
    ])  # (m, ks, d)
    lut = np.stack([
        ((Q[:, None, i * d:(i + 1) * d] - books[i][None, :, :]) ** 2
         ).sum(axis=-1)
        for i in range(m)
    ], axis=1)  # (Qn, m, ks)
    bref = ray.put((books, lut))

    class _Cand:
        def __init__(self):
            self.books, self.lut = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # empty block: typed empty candidates
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "adist": pa.array([], pa.float64()),
                })
            col = t.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = col.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(t.num_rows, dim)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            codes = _assign_pq_codes(mat, self.books)  # (n, m)
            qn = self.lut.shape[0]
            out_q, out_i, out_d = [], [], []
            for qi in range(qn):
                ad = np.zeros(t.num_rows, np.float64)
                for i in range(m):  # fixed order: deterministic sums
                    ad += self.lut[qi, i][codes[:, i]]
                top = min(k, len(ad))
                # full (ad, id) lexsort, not argpartition: ADC distances
                # tie STRUCTURALLY (same codes -> identical adist), and a
                # distance-only partition could drop the lower id at the
                # k boundary — breaking the ascending-id tie contract and
                # batch-independence
                order = np.lexsort((ids, ad))[:top]
                out_q.append(np.full(top, qi, np.int64))
                out_i.append(ids[order])
                out_d.append(ad[order])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "adist": pa.array(np.concatenate(out_d)),
            })

    cands = ds.select_columns([id_col, vec_col]).map_batches(
        _Cand, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8),
    )

    def reduce_topk(g: pa.Table) -> pa.Table:
        ad = g.column("adist").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ad))[:k]
        return g.take(pa.array(order))

    return cands.groupby("query_id").map_groups(
        reduce_topk, batch_format="pyarrow"
    )


# ----------------------------------------------------------------- IVF-PQ

def ivfpq_fit_or_load(index_dir: str, train_matrix: np.ndarray | None,
                      n_cells: int = 16, m: int = 8, ks: int = 16,
                      iters: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Fit-ONCE model artifact for the IVF-PQ index (Jegou et al. 2011
    IVFADC): coarse spherical centroids (kmeans_fit) + per-subspace
    EUCLIDEAN residual codebooks (pq_kmeans on train residuals), persisted
    to ``index_dir/model.npz`` via tmp+rename on the first build and
    RELOADED on every later one — an incremental index is only coherent
    if every run assigns codes under the same model (the dedup-index
    fit-once posture). Returns (centroids, books)."""
    import os

    path = os.path.join(index_dir, "model.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["centroids"], z["books"]
    if train_matrix is None:
        raise ValueError(f"no model at {path} and no train_matrix given")
    X = _normalize(np.asarray(train_matrix, dtype=np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    C = kmeans_fit(X, n_cells)  # coarse fit at kmeans_fit's default iters
    # (the sidecar oracle calls it the same way — keep them aligned)
    resid = X - C[np.argmax(X @ C.T, axis=1)]
    books = np.stack([
        pq_kmeans(resid[:, i * d:(i + 1) * d], ks, iters) for i in range(m)
    ])  # (m, ks, d)
    os.makedirs(index_dir, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:  # file object: savez appends no suffix
        np.savez(f, centroids=C, books=books)
    os.replace(tmp, path)
    return C, books


def ivfpq_index_build(
    ds,
    index_dir: str,
    train_matrix: np.ndarray | None = None,
    n_cells: int = 16,
    m: int = 8,
    ks: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 8),
) -> dict:
    """INCREMENTAL IVF-PQ index build (the billion-scale ANN standard:
    coarse cells + per-cell PQ residual codes, FAISS IVFADC shape):
    normalize each vector, coarse-assign to its argmax-cosine cell,
    PQ-encode the RESIDUAL (x_norm - centroid[cell]) under the persisted
    codebooks, and append (id, codes) rows to
    ``index_dir/cell=<c>/run-*.parquet`` — partitioned by cell so a query
    later reads ONLY its probed cells' files.

    Cross-run incremental like the dedup indexes: each per-cell write
    task snapshots its cell's prior files (driver-time listing), drops
    ids already indexed, sorts, and writes a content-fingerprint-named
    file via tmp+rename — idempotent on retry AND on whole-run replay
    (same new rows => same file name => promote-equivalent no-op). The
    model is fit once on ``train_matrix`` and reloaded afterwards so
    codes can never drift between runs. Returns {"cells": n, "rows":
    newly indexed}."""
    import hashlib
    import os

    import pyarrow.parquet as pq
    import ray

    C, books = ivfpq_fit_or_load(index_dir, train_matrix, n_cells, m, ks,
                                 iters)
    dim = C.shape[1]
    prior_files: dict[int, list[str]] = {}
    if os.path.isdir(index_dir):
        for dname in sorted(os.listdir(index_dir)):
            pdir = os.path.join(index_dir, dname)
            if not dname.startswith("cell=") or not os.path.isdir(pdir):
                continue
            files = sorted(
                os.path.join(pdir, f) for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
            if files:
                prior_files[int(dname.split("=")[1])] = files
    mref = ray.put((C, books))

    class _Encode:
        def __init__(self):
            self.C, self.books = ray.get(mref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = _normalize(col.values.to_numpy(
                zero_copy_only=False
            ).astype(np.float64).reshape(t.num_rows, dim))
            cell = np.argmax(mat @ self.C.T, axis=1).astype(np.int64)
            resid = mat - self.C[cell]
            codes = _assign_pq_codes(resid, self.books)  # (n, m)
            return pa.table({
                "id": t.column(id_col).cast(pa.int64()),
                "cell": pa.array(cell),
                "codes": pa.array(codes.tolist(),
                                  pa.list_(pa.int64())),
            })

    def write_cell(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        have: set = set()
        for f in prior_files.get(cell, []):  # driver-time snapshot ONLY
            have.update(pq.read_table(f, columns=["id"]).column(
                "id").to_pylist())
        if have:
            mask = [i not in have for i in g.column("id").to_pylist()]
            g = g.filter(pa.array(mask))
        if g.num_rows == 0:
            return pa.table({"cell": pa.array([cell], pa.int64()),
                             "rows": pa.array([0], pa.int64())})
        out = g.drop_columns(["cell"]).sort_by([("id", "ascending")])
        from ..kernels import content_fingerprint

        fp = content_fingerprint(out)
        pdir = os.path.join(index_dir, f"cell={cell}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".run-{fp}.tmp-{os.getpid()}")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(pdir, f"run-{fp}.parquet"))
        return pa.table({"cell": pa.array([cell], pa.int64()),
                         "rows": pa.array([out.num_rows], pa.int64())})

    write_cell.__name__ = "ivfpq_cell_write"
    lineage = (
        ds.select_columns([id_col, vec_col])
        .map_batches(_Encode, batch_format="pyarrow", batch_size=4096,
                     concurrency=concurrency)
        .groupby("cell")
        .map_groups(write_cell, batch_format="pyarrow")
        .take_all()
    )
    return {"cells": len(lineage),
            "rows": int(sum(r["rows"] for r in lineage))}


def knn_ivfpq_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> "object":
    """IVF-PQ search over a built index (the IVFADC read path): per query,
    probe the ``nprobe`` nearest cells (ties: lower cell id); read ONLY
    those cells' parquet partitions; approximate distance by residual ADC
    — adist(q, x) = sum_i LUT[q, cell][i, codes_i] with LUT the exact
    (m x ks) squared distances from the query's per-cell residual
    (q_norm - centroid[cell]) to the codebooks, computed on the driver
    (Q x probed x m x ks doubles) and broadcast once. Local top-k per
    batch, one bounded groupby(query_id) global reduce, ties ascending
    id. Corpus codes never move beyond the probed partitions; vector
    payloads were never stored at all."""
    import os

    import ray
    import ray.data as rd

    C, books = ivfpq_fit_or_load(index_dir, None)
    m = books.shape[0]
    d = books.shape[2]
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    sims = Q @ C.T
    probe: list[np.ndarray] = []
    for row in sims:
        order = np.lexsort((np.arange(len(row)), -row))[:nprobe]
        probe.append(np.sort(order.astype(np.int64)))
    wanted = sorted({int(c) for p in probe for c in p})
    # LUT[qi][cell] = (m, ks) residual distance table
    lut = {
        (qi, int(c)): np.stack([
            (((Q[qi] - C[c])[i * d:(i + 1) * d][None, :]
              - books[i]) ** 2).sum(axis=-1)
            for i in range(m)
        ])
        for qi in range(len(Q)) for c in probe[qi]
    }
    files = []
    for c in wanted:
        pdir = os.path.join(index_dir, f"cell={c}")
        if os.path.isdir(pdir):
            files += sorted(
                os.path.join(pdir, f) for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        id_col: pa.array([], pa.int64()),
        "adist": pa.array([], pa.float64()),
    })
    if not files:
        return rd.from_arrow(empty)
    probe_ref = ray.put((probe, lut))

    def cell_of_path(path: str) -> int:
        return int(os.path.basename(os.path.dirname(path)).split("=")[1])

    class _Score:
        def __init__(self):
            self.probe, self.lut = ray.get(probe_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            cellv = np.asarray(
                [cell_of_path(p) for p in t.column("path").to_pylist()],
                np.int64,
            )
            ids = t.column("id").to_numpy(zero_copy_only=False)
            codes = np.asarray(
                t.column("codes").to_pylist(), np.int64
            )  # (n, m)
            out_q, out_i, out_d = [], [], []
            for qi, cells in enumerate(self.probe):
                q_idx: list = []
                q_ad: list = []
                for c in cells:  # vectorized LUT gather per (query, cell)
                    idx = np.flatnonzero(cellv == c)
                    if not len(idx):
                        continue
                    tab = self.lut[(qi, int(c))]
                    ad = np.zeros(len(idx), np.float64)
                    for i in range(m):  # fixed order: deterministic sums
                        ad += tab[i][codes[idx, i]]
                    q_idx.append(idx)
                    q_ad.append(ad)
                if not q_idx:
                    continue
                idx = np.concatenate(q_idx)
                ad = np.concatenate(q_ad)
                top = np.lexsort((ids[idx], ad))[: min(k, len(ad))]
                out_q.append(np.full(len(top), qi, np.int64))
                out_i.append(ids[idx][top])
                out_d.append(ad[top])
            if not out_q:
                return empty
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "adist": pa.array(np.concatenate(out_d)),
            })

    cands = rd.read_parquet(files, include_paths=True).map_batches(
        _Score, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8),
    )

    def reduce_topk(g: pa.Table) -> pa.Table:
        ad = g.column("adist").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ad))[:k]
        return g.take(pa.array(order))

    return cands.groupby("query_id").map_groups(
        reduce_topk, batch_format="pyarrow"
    )
