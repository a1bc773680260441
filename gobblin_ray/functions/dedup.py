"""Deduplication suite: exact, MinHash+LSH, SimHash, embedding-cosine.

The scale shapes (per the Ray guide + public dedup pipelines like the
BigCode/SlimPajama-style MinHash dedup):

- exact: hash-partition by key (the groupby IS the hash partition), keep
  the first row per group — Gobblin's compaction dedup with an identity
  delta (AvroKeyDedupReducer keeps one record per key,
  gobblin-compaction/.../AvroKeyDedupReducer.java:35-93).
- MinHash+LSH: shingle -> minhash signature per doc (stateful actor-pool
  stage, permutations built once per actor) -> explode to
  (band, band_hash, doc_id) rows -> groupby band bucket -> candidate pairs
  -> verify true n-gram Jaccard (pairs joined back to texts) -> connected
  components -> keep min doc per cluster.
- SimHash: 64-bit token-vote fingerprint; candidates via exact-chunk
  banding (4 x 16-bit) which catches Hamming distance <= 3.
- embedding cosine: random-hyperplane LSH buckets -> within-bucket pairwise
  cosine -> threshold pairs -> components.

All per-batch math is numpy; the only Python-level loop is per-document
(each iteration does vectorized work over that document's
shingles/tokens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M61 = (1 << 61) - 1  # Mersenne prime for universal hashing


# ---------------------------------------------------------------- exact

def dedup_exact(ds, keys: list[str], order_col: str):
    """Keep one row per key group: the row with the minimal ``order_col``.
    One shuffle (the groupby hash-partitions by key)."""

    def first(group: pa.Table) -> pa.Table:
        return group.sort_by([(order_col, "ascending")]).slice(0, 1)

    return ds.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        first, batch_format="pyarrow"
    )


def content_hash_column(text_col: str, out: str = "content_hash"):
    """Vectorized stable 64-bit content hash (cheap shuffle key so the
    groupby moves a hash, not the full text, when keys are wide). For
    SQL-oracle parity use the text itself or md5 (functions.text.md5_column)."""
    import pandas as pd

    def run(t: pa.Table) -> pa.Table:
        arr = t.column(text_col).to_pandas().to_numpy(dtype=object, na_value=None)
        h = pd.util.hash_array(arr, categorize=False).astype(np.int64)
        return t.append_column(out, pa.array(h))

    run.__name__ = f"content_hash[{text_col}]"
    return run


# ---------------------------------------------------------------- shingles / jaccard

def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """All k-char shingle hashes of ``text`` as a unique uint64 vector —
    vectorized polynomial rolling hash over the utf-8 bytes."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.power(257, np.arange(k, dtype=np.uint64), dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1))  # uint64 wraparound is fine


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


class MinHasher:
    """Actor-pool stage: text -> (band, band_hash) LSH rows, 1:bands per doc.

    ``__init__`` builds the permutation coefficients ONCE per actor;
    ``__call__`` is per batch. num_perm = bands * rows_per_band.
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 128,
        bands: int = 32,
        shingle_k: int = 5,
        seed: int = 42,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, num_perm, dtype=np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.r = num_perm // bands
        # band hash combine coefficients
        self.band_pow = np.power(
            np.uint64(1_000_003), np.arange(self.r, dtype=np.uint64), dtype=np.uint64
        )

    def signature(self, text: str) -> np.ndarray:
        h = _char_shingle_hashes(text or "", self.k)
        # (shingles x perms) universal hash, min over shingles
        vals = (h[:, None] * self.a[None, :] + self.b[None, :]) % _M61
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        n = len(ids)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        # band hashes: combine r rows per band into one uint64
        bands = sigs.reshape(n, self.bands, self.r)
        band_hash = (bands * self.band_pow).sum(axis=2)  # (n, bands)
        out_ids = np.repeat(np.asarray(ids, dtype=np.int64), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                "band": pa.array(out_band),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
            }
        )


def _bucket_pairs_fn(id_col: str, max_pairs_per_bucket: int):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(ids), k=1)
        if len(ii) > max_pairs_per_bucket:
            ii, jj = ii[:max_pairs_per_bucket], jj[:max_pairs_per_bucket]
        return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})

    return bucket_pairs


def minhash_lsh_pairs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    concurrency=(1, 4),
    max_pairs_per_bucket: int = 1000,
):
    """Candidate near-dup pairs (a < b) via MinHash LSH banding."""
    sig = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        batch_size=512,  # small batches spread the pool; state amortized anyway
        concurrency=concurrency,
    )
    pairs = sig.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs_fn(id_col, max_pairs_per_bucket), batch_format="pyarrow"
    )
    # Same pair can surface from several bands — dedup the edge list
    # (the groupby-count IS the distinct; drop the count).
    return pairs.groupby(["a", "b"]).count().drop_columns(["count()"])


def verify_pairs_jaccard(
    pairs,
    docs,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_partitions: int | None = None,
):
    """Attach both texts to each candidate pair (two hash joins) and compute
    the true character-shingle Jaccard; keep pairs >= threshold.

    The joins hash-partition on doc id — no broadcast of the corpus.
    ``num_partitions`` defaults to a fraction of cluster CPUs: each join
    operator holds one actor per partition, and two chained joins plus the
    upstream pool must coexist without starving the scheduler."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)
    # The candidate edge list is tiny by construction (LSH pruned); pin it
    # so the two joins don't re-execute the MinHash + shuffle chain and the
    # join actor pools start against a settled input.
    pairs = pairs.materialize()
    texts = docs.select_columns([id_col, text_col])
    a_side = texts.rename_columns({id_col: "a", text_col: "_text_a"})
    b_side = texts.rename_columns({id_col: "b", text_col: "_text_b"})
    joined = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions, on=("a",)
    ).join(b_side, join_type="inner", num_partitions=num_partitions, on=("b",))

    def verify(t: pa.Table) -> pa.Table:
        ta = t.column("_text_a").to_pylist()
        tb = t.column("_text_b").to_pylist()
        js = np.array(
            [
                jaccard(
                    _char_shingle_hashes(x or "", shingle_k),
                    _char_shingle_hashes(y or "", shingle_k),
                )
                for x, y in zip(ta, tb)
            ],
            dtype=np.float64,
        )
        out = t.drop_columns(["_text_a", "_text_b"]).append_column(
            "jaccard", pa.array(js)
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), pa.scalar(threshold)))

    verify.__name__ = "verify_jaccard"
    return joined.map_batches(verify, batch_format="pyarrow", batch_size=1024)


def connected_components(pairs, max_edges: int = 2_000_000) -> dict[int, int]:
    """Union-find over the (a, b) edge list on the driver.

    Assumption (documented): the *candidate-pair* set is tiny relative to
    the corpus (LSH prunes aggressively), so collecting edges is safe; the
    cap guards the assumption. At extreme scale replace with iterative
    min-label propagation via groupby rounds."""
    edges = pairs.select_columns(["a", "b"]).take_all()
    if len(edges) > max_edges:
        raise RuntimeError(
            f"{len(edges)} candidate edges exceed max_edges={max_edges}; "
            "raise the threshold/bands or switch to label propagation"
        )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        ra, rb = find(int(e["a"])), find(int(e["b"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def dedup_minhash(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **lsh_kw,
):
    """Full near-dup pipeline: LSH candidates -> Jaccard verify ->
    components -> drop every non-representative member (keep min id)."""
    pairs = minhash_lsh_pairs(docs, text_col, id_col, **lsh_kw)
    confirmed = verify_pairs_jaccard(pairs, docs, threshold, text_col, id_col)
    comp = connected_components(confirmed)
    drop = {k for k, v in comp.items() if v != k}

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, np.fromiter(drop, np.int64, len(drop)))
        return t.filter(pa.array(mask))

    keep.__name__ = "drop_near_dups"
    return docs.map_batches(keep, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------- simhash

class SimHasher:
    """Actor-pool stage: 64-bit SimHash fingerprint per document plus its
    4 x 16-bit chunks (exact match on any chunk ⇒ Hamming <= 3 candidate)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
        import pandas as pd

        self.text_col, self.id_col = text_col, id_col
        self.hash_array = pd.util.hash_array
        self.bit_weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def fingerprint(self, text: str) -> np.uint64:
        toks = np.array((text or "").lower().split(), dtype=object)
        if len(toks) == 0:
            return np.uint64(0)
        h = self.hash_array(toks, categorize=False)  # (n,) uint64
        bits = (h[:, None] & self.bit_weights[None, :]) != 0  # (n, 64)
        votes = bits.sum(axis=0) * 2 - len(toks)  # majority vote per bit
        return np.uint64((self.bit_weights * (votes > 0)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        fps = np.array(
            [self.fingerprint(t) for t in batch.column(self.text_col).to_pylist()],
            dtype=np.uint64,
        )
        chunks = [
            ((fps >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            for c in range(4)
        ]
        return pa.table(
            {
                self.id_col: pa.array(np.asarray(ids, np.int64)),
                "simhash": pa.array(fps.astype(np.int64)),
                **{f"chunk{c}": pa.array(chunks[c]) for c in range(4)},
            }
        )


def simhash_candidates(
    docs, text_col: str = "text", id_col: str = "doc_id", concurrency=(1, 4)
):
    """Near-dup candidate pairs with Hamming distance <= 3 (pigeonhole over
    the 4 chunk bands); verify with true Hamming distance on the signature."""
    sigs = docs.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    # The signature table is tiny (id + 5 ints per doc). Pin it: the four
    # band groupbys below would otherwise EACH re-execute the actor-pool
    # stage concurrently and starve small clusters of CPUs.
    sigs = sigs.materialize()
    parts = []
    for c in range(4):
        def pair_fn(group: pa.Table, _c=c):
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            fps = group.column("simhash").to_numpy(zero_copy_only=False)
            order = np.argsort(ids)
            ids, fps = ids[order], fps[order]
            uniq = np.unique(ids, return_index=True)[1]
            ids, fps = ids[uniq], fps[uniq]
            if len(ids) < 2:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                     "hamming": pa.array([], pa.int32())}
                )
            ii, jj = np.triu_indices(len(ids), k=1)
            x = fps[ii].astype(np.uint64) ^ fps[jj].astype(np.uint64)
            ham = np.bitwise_count(x).astype(np.int32) if hasattr(np, "bitwise_count") else np.array(
                [bin(v).count("1") for v in x], np.int32
            )
            keep = ham <= 3
            return pa.table(
                {"a": pa.array(ids[ii][keep]), "b": pa.array(ids[jj][keep]),
                 "hamming": pa.array(ham[keep])}
            )

        pair_fn.__name__ = f"simhash_pairs_c{c}"
        parts.append(sigs.groupby(f"chunk{c}").map_groups(pair_fn, batch_format="pyarrow"))
    allpairs = parts[0].union(*parts[1:])
    return dedup_exact(allpairs, ["a", "b"], "hamming")


# ---------------------------------------------------------------- embeddings

class HyperplaneLSH:
    """Actor-pool stage: random-hyperplane sign bucket for an embedding
    column (cosine LSH). Planes built once per actor."""

    def __init__(self, dim: int, n_planes: int = 12, vec_col: str = "embedding",
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.vec_col = vec_col
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.vstack(batch.column(self.vec_col).to_numpy(zero_copy_only=False))
        signs = (mat @ self.planes) > 0
        bucket = (signs * self.weights).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket))


def embedding_dup_pairs(
    embeddings,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    concurrency=(1, 4),
):
    """Near-dup pairs by cosine >= threshold within hyperplane-LSH buckets."""
    bucketed = embeddings.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def bucket_cosine(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        mat = np.vstack(group.column(vec_col).to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sim = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sim[ii, jj] >= threshold
        return pa.table(
            {
                "a": pa.array(np.minimum(ids[ii][keep], ids[jj][keep])),
                "b": pa.array(np.maximum(ids[ii][keep], ids[jj][keep])),
                "cosine": pa.array(sim[ii, jj][keep]),
            }
        )

    bucket_cosine.__name__ = "bucket_cosine"
    pairs = bucketed.groupby("lsh_bucket").map_groups(
        bucket_cosine, batch_format="pyarrow"
    )
    return dedup_exact(pairs, ["a", "b"], "cosine")
