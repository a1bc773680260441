"""Planted-truth fixtures for oracling the non-SQL-native operators
(language-ID, MinHash/SimHash/embedding near-dup): small deterministic
parquet corpora whose EXPECTED output is either stored alongside the data
(expected_lang, cluster_id) or exactly SQL-computable (cosine over list
columns), so the driver's DuckDB oracle can check these pipelines
value-for-value instead of rows-only.

Mirrors the reference's deterministic test-source strategy
(gobblin-core-base/.../test/SequentialTestSource.java; golden-file harness
gobblin-test-harness/): fixed seed, fixed output path, idempotent write.
Fixture paths are FIXED (no sf tag) because ``oracle_sql()`` strings are
static; the queries rewrite the fixture idempotently before running.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "gobblin_ray_fixtures")
LANGID_PATH = os.path.join(FIXTURE_DIR, "planted_langid.parquet")
NEARDUP_PATH = os.path.join(FIXTURE_DIR, "planted_neardup.parquet")
SIMDUP_PATH = os.path.join(FIXTURE_DIR, "planted_simdup.parquet")
SSJOIN_L_PATH = os.path.join(FIXTURE_DIR, "planted_ssjoin_left.parquet")
SSJOIN_R_PATH = os.path.join(FIXTURE_DIR, "planted_ssjoin_right.parquet")
EMBDUP_PATH = os.path.join(FIXTURE_DIR, "planted_embdup.parquet")
KNN_BUCKETS_PATH = os.path.join(FIXTURE_DIR, "knn_lsh_buckets.parquet")
SEMANTIC_PATH = os.path.join(FIXTURE_DIR, "planted_semantic.parquet")
CDC_VIEW_ORACLE_PATH = os.path.join(FIXTURE_DIR, "cdc_view_oracle.parquet")
CDC_REPLAY_ORACLE_PATH = os.path.join(FIXTURE_DIR, "cdc_replay_oracle.parquet")
LOOKUP_ORACLE_PATH = os.path.join(FIXTURE_DIR, "lookup_oracle.parquet")
PROJ_ORACLE_PATH = os.path.join(FIXTURE_DIR, "projected_read_oracle.parquet")
IVF_CELLS_PATH = os.path.join(FIXTURE_DIR, "knn_ivf_cells.parquet")
IVF_CENTROIDS_PATH = os.path.join(FIXTURE_DIR, "knn_ivf_centroids.parquet")
FEED_AUDIT_PATH = os.path.join(FIXTURE_DIR, "planted_feed.parquet")
CDC_NEARDUP_DIR = os.path.join(FIXTURE_DIR, "cdc_neardup_corpus")
CDC_NEARDUP_ORACLE_PATH = os.path.join(FIXTURE_DIR, "cdc_neardup_oracle.parquet")
SPAN_REMOVE_ORACLE_PATH = os.path.join(FIXTURE_DIR, "span_remove_oracle.parquet")


def _write(table: pa.Table, path: str) -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------- language ID

_LANG_SENTENCES = {
    "en": [
        "the house is old and the garden is full of flowers for a quiet walk",
        "it is a long road to the sea and the wind is cold in the morning",
        "the teacher said that it is good to read a book in the library",
        "a dog ran to the river and the children laughed in the warm sun",
    ],
    "de": [
        "der alte mann und die junge frau gehen mit das kind zu der schule",
        "das wetter ist nicht gut und der regen ist kalt und die nacht lang",
        "ein freund von mir ist mit der bahn zu der stadt gefahren heute",
        "die katze und der hund spielen nicht mit das rote band von oma",
    ],
    "fr": [
        "le chien et la petite fille jouent dans le jardin pres de la mer",
        "il est tard et le train pour la ville ne part pas avant le matin",
        "la maison de mon ami est grande et le salon est plein de livres",
        "un homme et une femme marchent le long de la riviere sous la pluie",
    ],
    "es": [
        "el perro y el gato juegan en la casa grande cerca de la playa",
        "la comida es buena y el vino de la region es famoso por su sabor",
        "un amigo de la familia vive en el centro de la ciudad con su madre",
        "los libros de la biblioteca son viejos y el aire es seco y frio",
    ],
    "zh": [
        "这是一个测试文档 内容都是中文字符 用于语言识别",
        "今天天气很好 我们去公园散步 然后回家吃饭",
        "数据处理系统 需要正确识别 文本的语言类型",
        "这个句子没有空格问题 只有汉字和少量标点",
    ],
}


def planted_langid(path: str = LANGID_PATH) -> str:
    """Docs with a known dominant language; ``expected_lang`` is stored so
    the oracle is `SELECT doc_id, expected_lang AS lang_pred`."""
    rows = []
    i = 0
    for lang, sentences in _LANG_SENTENCES.items():
        for s in sentences:
            rows.append((i, s, lang))
            i += 1
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "expected_lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return _write(t, path)


# ---------------------------------------------------------------- near-dup text

_PARA = (
    "the quick brown fox jumps over the lazy dog while the sly cat watches "
    "from the wooden fence and the small birds sing in the morning light "
    "over the quiet village where people go about their daily work with "
    "steady hands and open minds under a pale autumn sky"
)
_PARA2 = (
    "distributed query engines use vectorized execution over columnar "
    "formats with late materialization and runtime code generation to "
    "process analytical workloads at interactive speed across many nodes "
    "while spilling gracefully when memory pressure rises"
)
_PARA3 = (
    "consensus protocols such as raft and paxos elect a leader and then "
    "replicate an ordered log to a quorum of followers so that a majority "
    "of healthy machines can always reconstruct the committed state after "
    "any single failure or network partition"
)


def planted_neardup(path: str = NEARDUP_PATH) -> str:
    """Near-dup clusters (small edits of a base paragraph, within-cluster
    5-gram Jaccard > 0.85) + singleton docs; ``cluster_id`` stores the
    ground truth: kept set == min(doc_id) per cluster."""
    docs = [
        # cluster 0: 3 near-identical members
        (0, _PARA, 0),
        (1, _PARA + " extra tail words here", 0),
        (2, _PARA.replace("quick", "swift"), 0),
        # cluster 1: 2 members
        (3, _PARA2, 1),
        (4, _PARA2.replace("interactive", "blazing"), 1),
        # singletons
        (5, _PARA3, 2),
        (6, "short unique note about nothing in particular worth keeping", 3),
        (7, _PARA3.replace("consensus", "gossip").replace("raft", "scuttlebutt")
            .replace("paxos", "epidemic broadcast").replace("leader", "peer")
            .replace("log", "digest"), 4),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "cluster_id": pa.array([d[2] for d in docs], pa.int64()),
        }
    )
    return _write(t, path)


def planted_simdup(path: str = SIMDUP_PATH) -> str:
    """Exact-dup groups (identical texts) among very different paragraphs:
    SimHash candidates must be exactly the identical-text pairs (hamming 0),
    which SQL reproduces with a self-join on text."""
    docs = [
        (0, _PARA), (1, _PARA2), (2, _PARA3),
        (3, _PARA),              # dup of 0
        (4, _PARA2),             # dup of 1
        (5, _PARA),              # dup of 0
        (6, "completely standalone sentence with its own odd vocabulary like "
            "zymurgy quixotic fjord sphinx and blitz"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    return _write(t, path)


# ---------------------------------------------------------------- embeddings

def planted_embdup(path: str = EMBDUP_PATH, n: int = 80, dim: int = 16) -> str:
    """Random unit-ish vectors with planted near-identical pairs
    (cosine > 0.999); every >=0.95 pair in the corpus is a planted one, so
    the SQL oracle (exact all-pairs cosine) equals the LSH pipeline output
    as long as the bucketer co-locates near-identical vectors (verified by
    test_fixture_oracles)."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, dim))
    planted = [(3, 41), (10, 55), (22, 67)]
    for a, b in planted:
        vecs[b] = vecs[a] + rng.standard_normal(dim) * 0.003
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )
    return _write(t, path)


def planted_semantic(
    path: str = SEMANTIC_PATH,
    n_clusters: int = 4,
    per_cluster: int = 60,
    dim: int = 16,
) -> str:
    """Clustered embeddings with planted ground truth for the k-means and
    SemDeDup oracles: ``n_clusters`` orthogonal unit centers, members =
    center + N(0, 0.3^2) noise, plus per-cluster near-identical dup groups
    (one pair + one triple, cosine > 0.999 to their source member).

    Margins are ENFORCED at build time (fixed seed, deterministic
    rejection-resampling), so the planted labels are also the unique
    k-means optimum basin:
      - every member's cosine to its own center beats every other center
        by >= 0.25 (Lloyd with centroids anywhere near the true centers
        assigns identically to ``cluster_id``);
      - every same-cluster NON-dup pair has cosine < 0.90, every planted
        dup pair > 0.999 (tau = 0.95 separates with wide margin).

    Columns: vec_id, embedding (list<double>), cluster_id (planted),
    dup_group (= representative vec_id; unique for singletons)."""
    rng = np.random.default_rng(11)
    # orthonormal centers via QR of a fixed random matrix
    q, _ = np.linalg.qr(rng.standard_normal((dim, n_clusters)))
    centers = q.T  # (n_clusters, dim), orthonormal rows

    def unit(v):
        return v / np.linalg.norm(v)

    members: list[np.ndarray] = []
    labels: list[int] = []
    for c in range(n_clusters):
        got = 0
        while got < per_cluster:
            v = unit(centers[c] + rng.standard_normal(dim) * 0.3)
            sims = centers @ v
            own = sims[c]
            other = np.max(np.delete(sims, c))
            if own - other < 0.25:  # reject: too close to a rival center
                continue
            # reject if near-dup of an existing same-cluster member
            ok = all(
                float(m @ v) < 0.90
                for m, lb in zip(members, labels)
                if lb == c
            )
            if not ok:
                continue
            members.append(v)
            labels.append(c)
            got += 1

    vecs = list(members)
    cluster_id = list(labels)
    dup_group = list(range(len(members)))  # singleton: own index
    # plant one dup PAIR and one dup TRIPLE per cluster (copies of an
    # existing member + tiny noise)
    for c in range(n_clusters):
        anchors = [i for i, lb in enumerate(cluster_id) if lb == c][:2]
        for anchor, extra in zip(anchors, (1, 2)):
            for _ in range(extra):
                v = unit(vecs[anchor] + rng.standard_normal(dim) * 0.003)
                assert float(v @ vecs[anchor]) > 0.999
                vecs.append(v)
                cluster_id.append(c)
                dup_group.append(anchor)

    n = len(vecs)
    order = rng.permutation(n)  # shuffle row order so blocks mix clusters
    t = pa.table(
        {
            "vec_id": pa.array([int(i) for i in order], pa.int64()),
            "embedding": pa.array(
                [list(map(float, vecs[i])) for i in order],
                pa.list_(pa.float64()),
            ),
            "cluster_id": pa.array(
                [cluster_id[i] for i in order], pa.int64()
            ),
            "dup_group": pa.array([dup_group[i] for i in order], pa.int64()),
        }
    )
    return _write(t, path)


def knn_bucket_sidecar(
    sf_dir: str, dim: int = 64, n_planes: int = 6, seed: int = 42,
    path: str = KNN_BUCKETS_PATH,
) -> str:
    """Sidecar (vec_id, lsh_bucket) for the driver's embeddings table,
    computed with the SAME hyperplanes the knn_lsh query uses — this is the
    'oracle the verify stage' pattern: the bucketing is engine input, and
    DuckDB then independently reproduces the probe + exact top-k math."""
    from .functions.dedup import HyperplaneLSH

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    lsh = HyperplaneLSH(dim=dim, n_planes=n_planes, seed=seed)
    mat = np.vstack(t.column("embedding").to_numpy(zero_copy_only=False))
    bucket = ((mat @ lsh.planes) > 0) @ lsh.weights
    out = pa.table(
        {
            "vec_id": t.column("vec_id"),
            "lsh_bucket": pa.array(bucket.astype(np.int64)),
        }
    )
    return _write(out, path)


def knn_ivf_sidecar(
    sf_dir: str, n_cells: int = 16, sample_rows: int = 2048,
    cells_path: str = IVF_CELLS_PATH, centroids_path: str = IVF_CENTROIDS_PATH,
) -> np.ndarray:
    """IVF sidecars for the driver's embeddings table: (vec_id, ivf_cell)
    assignments and (cell, centroid DOUBLE[]) centroid vectors, computed
    with the SAME deterministic spherical k-means the knn_ivf query uses
    (sample = vec_id < sample_rows). DuckDB then independently reproduces
    probe-nearest-cells + exact top-k over the probed subset. Returns the
    centroid matrix so the query shares the exact fit."""
    from .functions.similarity import _normalize, kmeans_fit

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.vstack(t.column("embedding").to_numpy(zero_copy_only=False))
    C = kmeans_fit(mat[ids < sample_rows], n_cells=n_cells)
    # Assign with the SAME re-normalized matrix knn_ivf broadcasts
    # (_AssignCell receives _normalize(C)): kmeans_fit's rows are unit
    # up to 1 ulp, and a near-equidistant vector could argmax to a
    # different cell under matrices differing in the last ulp — the
    # sidecar and the live pass must use bit-identical centroids.
    C_b = _normalize(C)
    cell = np.argmax(_normalize(mat.astype(np.float64)) @ C_b.T, axis=1)
    _write(
        pa.table({"vec_id": t.column("vec_id"),
                  "ivf_cell": pa.array(cell.astype(np.int64))}),
        cells_path,
    )
    _write(
        pa.table({
            "cell": pa.array(np.arange(len(C_b), dtype=np.int64)),
            "centroid": pa.array([row.tolist() for row in C_b],
                                 pa.list_(pa.float64())),
        }),
        centroids_path,
    )
    return C


# ------------------------------------------------------- CDC replay oracle

def _sequential_live_state(
    corpus_dir: str, max_seq: int | None = None
) -> dict[str, dict]:
    """Row-at-a-time LWW replay of the synth corpus up to (and including)
    ``max_seq`` — the dumb obvious oracle implementation, shared by the
    full-replay sidecar and the snapshot-diff sidecar. Returns only LIVE
    rows (tombstoned urls are absent)."""
    import glob

    pages = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    state: dict[str, dict] = {}
    for row in pages.to_pylist():
        state[row["url"]] = {
            "url": row["url"], "warc_ts": row["warc_ts"], "html": row["html"],
            "text": row["text"], "lang": row["lang"], "event_seq": -1,
            "fetch_status": None, "deleted": False,
        }
    for f in sorted(glob.glob(os.path.join(corpus_dir, "events", "part-*.parquet"))):
        for row in pq.read_table(f).to_pylist():
            if max_seq is not None and row["event_seq"] > max_seq:
                continue
            cur = state.get(row["url"])
            key = (row["warc_ts"], row["event_seq"])
            if cur is not None and key <= (cur["warc_ts"], cur["event_seq"]):
                continue  # loses LWW (late or duplicate data)
            dele = row["op"] == "delete"
            state[row["url"]] = {
                "url": row["url"], "warc_ts": row["warc_ts"],
                "html": None if dele else row["html"],
                "text": None if dele else row["text"],
                "lang": None if dele else row["lang"],
                "event_seq": row["event_seq"],
                "fetch_status": row.get("fetch_status"),
                "deleted": dele,
            }
    return {u: v for u, v in state.items() if not v["deleted"]}


def cdc_oracle_sidecar(corpus_dir: str, path: str = CDC_REPLAY_ORACLE_PATH,
                       max_seq: int | None = None) -> str:
    """Sequential single-process replay oracle for ``cdc_replay_mini``.

    Independent of the engine: applies every change event row-at-a-time
    under the LWW rule — an event wins against the current row iff its
    ``(warc_ts, event_seq)`` is strictly greater; a winning delete removes
    the row — exactly the contract the reference's state-store/watermark
    tests pin sequentially (gobblin-runtime/.../JobLauncherTestHelper.java:80-131).
    The result is written to a fixed sidecar parquet so the driver's DuckDB
    oracle can value-check the distributed merge-on-read replay against it
    (same pattern as the knn_lsh bucket sidecar). Per-row Python is fine
    here by design: an oracle must be the dumb obvious implementation, and
    the mini corpus is a few thousand rows.
    """
    live = sorted(
        _sequential_live_state(corpus_dir, max_seq).values(),
        key=lambda r: r["url"],
    )
    # html travels as an md5 hex digest (binary columns don't survive the
    # DuckDB->pandas compare path); byte-identity is still what's checked.
    import hashlib

    for r in live:
        r["html_md5"] = (
            None if r["html"] is None else hashlib.md5(r["html"]).hexdigest()
        )
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html_md5", pa.string()), ("text", pa.string()), ("lang", pa.string()),
        ("event_seq", pa.int64()), ("fetch_status", pa.int32()),
    ])
    t = pa.table(
        {n: pa.array([r[n] for r in live], type=schema.field(n).type)
         for n in schema.names},
        schema=schema,
    )
    return _write(t, path)


def cdc_view_sidecar(corpus_dir: str,
                     path: str = CDC_VIEW_ORACLE_PATH) -> str:
    """Recompute oracle for the incremental materialized view
    (``incremental_view_hosts``): group the HEAD state of the independent
    sequential replay by url host — per-host live-row count + sum of
    event_seq. A correct IVM fold (base view at an early manifest + one
    pass over the before-image change feed) must land on exactly this
    table; any missed retraction or double-applied delta shows up as a
    count/sum drift."""
    import re

    agg: dict[str, list] = {}
    for row in _sequential_live_state(corpus_dir).values():
        m = re.match(r"^https://([^/]+)/", row["url"])
        if m is None:
            continue  # no derivable host: excluded on the Ray side too
            # (ivm_count_sum_view drops null group keys)
        cur = agg.setdefault(m.group(1), [0, 0])
        cur[0] += 1
        cur[1] += row["event_seq"]
    hosts = sorted(agg)
    t = pa.table({
        "grp": pa.array(hosts, pa.string()),
        "n_live": pa.array([agg[h][0] for h in hosts], pa.int64()),
        "sum_seq": pa.array([agg[h][1] for h in hosts], pa.int64()),
    })
    return _write(t, path)


# ---------------------------------------------------------------- copy oracle

COPY_ORACLE_PATH = os.path.join(FIXTURE_DIR, "copy_oracle.parquet")


def copy_oracle_sidecar(src_root: str, glob: str = "*",
                        path: str = COPY_ORACLE_PATH) -> str:
    """Independent (rel_path, bytes, md5) listing of the copy job's SOURCE
    tree, digested sequentially with hashlib — the distributed copy's
    manifest (digests of the LANDED destination bytes) must match it
    value-for-value, which is the distcp integrity contract
    (gobblin-data-management/.../copy/CopyIntegrationTest analog)."""
    import fnmatch
    import hashlib

    rows = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if not d.startswith("_"))
        for f in sorted(filenames):
            if f.startswith("_") or not fnmatch.fnmatch(f, glob):
                continue
            p = os.path.join(dirpath, f)
            h = hashlib.md5()
            with open(p, "rb") as fin:
                while True:
                    chunk = fin.read(1 << 20)
                    if not chunk:
                        break
                    h.update(chunk)
            rows.append((os.path.relpath(p, src_root), os.path.getsize(p),
                         h.hexdigest()))
    rows.sort()
    t = pa.table({
        "rel_path": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.int64()),
        "md5": pa.array([r[2] for r in rows], pa.string()),
    })
    return _write(t, path)


# ------------------------------------------------------- snapshot-diff oracle

SNAPSHOT_DIFF_ORACLE_PATH = os.path.join(FIXTURE_DIR, "snapshot_diff_oracle.parquet")


def snapshot_diff_sidecar(
    corpus_dir: str, seq_lo: int, seq_hi: int,
    path: str = SNAPSHOT_DIFF_ORACLE_PATH,
) -> str:
    """Independent oracle for ``CdcEngine.read_changes``: replay the corpus
    sequentially to BOTH watermarks (``_sequential_live_state``) and diff
    the two live states row-by-row — insert/update rows carry the NEW
    (warc_ts, event_seq, text); deletes carry the last OLD watermark and a
    null payload, matching the engine's CDC-out contract. Written to a
    fixed sidecar parquet for the driver's DuckDB oracle."""
    a = _sequential_live_state(corpus_dir, seq_lo)
    b = _sequential_live_state(corpus_dir, seq_hi)
    rows = []
    for url, nv in b.items():
        ov = a.get(url)
        if ov is None:
            rows.append((url, "insert", nv["warc_ts"], nv["event_seq"], nv["text"]))
        elif ov["event_seq"] != nv["event_seq"]:
            rows.append((url, "update", nv["warc_ts"], nv["event_seq"], nv["text"]))
    for url, ov in a.items():
        if url not in b:
            rows.append((url, "delete", ov["warc_ts"], ov["event_seq"], None))
    rows.sort()
    schema = pa.schema([
        ("url", pa.string()), ("change_type", pa.string()),
        ("warc_ts", pa.timestamp("us")), ("event_seq", pa.int64()),
        ("text", pa.string()),
    ])
    t = pa.table(
        {n: pa.array([r[i] for r in rows], type=schema.field(n).type)
         for i, n in enumerate(schema.names)},
        schema=schema,
    )
    return _write(t, path)


# --------------------------------------------------------- multi-line corpus

MULTILINE_PATH = os.path.join(FIXTURE_DIR, "planted_multiline.parquet")


def planted_multiline(path: str = MULTILINE_PATH) -> str:
    """Multi-line docs sharing boilerplate lines (newsletter/footer spam)
    between and within docs — ground truth for corpus-wide line dedup is
    fully SQL-replayable from the fixture itself (keep the first
    (doc_id, line_idx) instance of every distinct line)."""
    boiler = [
        "subscribe to our newsletter for weekly updates",
        "all rights reserved by the site operator",
        "click here to accept cookies and continue",
    ]
    docs = []
    for i in range(24):
        lines = [f"unique opening line of document {i}"]
        if i % 2 == 0:
            lines.append(boiler[0])
        lines.append(f"body paragraph {i} with its own distinct content")
        if i % 3 == 0:
            lines.append(boiler[1])
        if i % 4 == 0:
            lines.append(boiler[0])  # repeated boilerplate WITHIN a doc too
        lines.append(boiler[2] if i % 5 == 0 else f"closing remark {i}")
        docs.append((i, "\n".join(lines)))
    # one doc that is pure boilerplate: every line loses to an earlier doc
    docs.append((24, "\n".join([boiler[0], boiler[1], boiler[2]])))
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })
    return _write(t, path)


# ----------------------------------------------------- time-travel oracle

TIME_TRAVEL_ORACLE_PATH = os.path.join(FIXTURE_DIR, "time_travel_oracle.parquet")


# ------------------------------------------------ cross-run near-dup corpus

NEARDUP_RUNS_PATH = os.path.join(FIXTURE_DIR, "planted_neardup_runs.parquet")


def planted_neardup_runs(path: str = NEARDUP_RUNS_PATH) -> str:
    """Two crawl snapshots with planted near-dup clusters that SPAN runs:
    run-2 docs whose cluster already appeared in run 1 must drop; fresh
    run-2 clusters dedup within the run (min doc_id survives). cluster_id
    stores the ground truth so SQL replays the expected kept set."""
    docs = [
        # run 1
        (0, _PARA, 0, 1),
        (1, _PARA + " trailing words appended", 0, 1),
        (2, _PARA2, 1, 1),
        (3, _PARA3, 2, 1),
        (4, "wholly unrelated short register of terms nothing shared here "
            "with any other paragraph in this corpus at all", 3, 1),
        # run 2
        (10, _PARA.replace("quick", "swift"), 0, 2),        # dup of run-1 c0
        (11, _PARA2 + " with a small suffix", 1, 2),        # dup of run-1 c1
        (12, "a brand new cluster paragraph about distributed checkpoint "
             "barriers and watermark alignment across stream operators "
             "with consistent snapshots and replayable logs", 4, 2),
        (13, "a brand new cluster paragraph about distributed checkpoint "
             "barriers and watermark alignment across stream operators "
             "with consistent snapshots and replayable log files", 4, 2),
        (14, "another singleton about zygote processes forking sandboxes "
             "quickly via copy on write page tables and shared text", 5, 2),
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "cluster_id": pa.array([d[2] for d in docs], pa.int64()),
        "run": pa.array([d[3] for d in docs], pa.int64()),
    })
    return _write(t, path)


# ---------------------------------------------------- dedup-on-ingest corpus

_FRESH1 = (
    "a brand new cluster paragraph about distributed checkpoint barriers "
    "and watermark alignment across stream operators with consistent "
    "snapshots and replayable logs for exactly once delivery"
)
_FRESH2 = (
    "another singleton about zygote processes forking sandboxes quickly "
    "via copy on write page tables and shared text segments mapped read "
    "only into every child address space"
)
_FRESH3 = (
    "columnar object stores shard immutable segments across racks and "
    "rebalance by consistent hashing while compaction threads rewrite "
    "cold segments into larger sorted runs overnight"
)
_SINGLETON = (
    "wholly unrelated short register of terms nothing shared here with "
    "any other paragraph in this corpus at all"
)


def planted_cdc_neardup_corpus(
    corpus_dir: str = CDC_NEARDUP_DIR,
    oracle_path: str = CDC_NEARDUP_ORACLE_PATH,
) -> tuple[str, str]:
    """CDC corpus with planted near-dup INSERT events for the
    dedup-on-ingest engine stage (EngineConfig.neardup_dedup): bootstrap
    pages seed the index; epoch-1 inserts include a near-dup of a
    bootstrap page (diverted) and fresh texts (kept + indexed); an epoch-1
    UPDATE rewrites an existing url with a near-identical text (must PASS
    — self-match exclusion); epoch-2 inserts include a near-dup of an
    epoch-1 survivor (cross-epoch via the committed index), a fresh text,
    and a within-epoch near-dup of that fresh text (larger url diverted);
    plus a delete. All dup edits are single-word substitutions of ~250
    char paragraphs (5-shingle Jaccard ~0.95 >> 0.7) and fresh texts are
    topically disjoint (~0.05 << 0.7), so the bottom-k sketch verdicts
    are certain. Expected (url, text, status) rows — status 'live' for
    the final table, 'neardup' for diverted inserts — go to the oracle
    parquet. Returns (corpus_dir, oracle_path); epoch_width=4 and
    pipeline_epochs=1 are assumed by the planted epoch boundaries."""
    t0 = np.datetime64("2026-01-01T00:00:00", "us")

    def ts(h: int):
        return t0 + np.timedelta64(h, "h")

    pages = [
        ("http://base/p0", ts(0), _PARA),
        ("http://base/p1", ts(0), _PARA2),
        ("http://base/p2", ts(0), _PARA3),
        ("http://base/p3", ts(0), _SINGLETON),
    ]
    p1_updated = _PARA2 + " with a small appended suffix"
    # (seq, op, url, text) — warc_ts = t0 + (seq+1) hours; epoch spans are
    # (-1,3] and (3,7] at epoch_width=4 (plan_epochs half-open intervals)
    events = [
        # epoch 1 (seq 0-3)
        (0, "insert", "http://new/n1", _PARA.replace("quick", "swift")),
        (1, "insert", "http://new/n2", _FRESH1),
        (2, "update", "http://base/p1", p1_updated),
        (3, "insert", "http://new/n3", _FRESH2),
        # epoch 2 (seq 4-7)
        (4, "insert", "http://new/n4",
         _FRESH1.replace("barriers", "fences")),
        (5, "insert", "http://new/n5", _FRESH3),
        (6, "insert", "http://new/n6",
         _FRESH3.replace("overnight", "nightly")),
        (7, "delete", "http://base/p2", None),
    ]
    os.makedirs(os.path.join(corpus_dir, "events"), exist_ok=True)
    # idempotent REWRITE: drop any event shard a previous consumer (e.g.
    # a flow-trigger test growing the log) appended, or the planted
    # expectations below no longer describe the corpus
    expected_shards = {f"part-{i:05d}.parquet" for i in range(2)}
    for name in os.listdir(os.path.join(corpus_dir, "events")):
        if name.endswith(".parquet") and name not in expected_shards:
            os.remove(os.path.join(corpus_dir, "events", name))
    pages_t = pa.table({
        "url": pa.array([p[0] for p in pages], pa.string()),
        "warc_ts": pa.array([p[1] for p in pages], pa.timestamp("us")),
        "html": pa.array(
            [f"<p>{p[2]}</p>".encode() for p in pages], pa.binary()
        ),
        "text": pa.array([p[2] for p in pages], pa.string()),
        "lang": pa.array(["en"] * len(pages), pa.string()),
    })
    tmp = os.path.join(corpus_dir, "pages.parquet.tmp")
    pq.write_table(pages_t, tmp)
    os.replace(tmp, os.path.join(corpus_dir, "pages.parquet"))
    for shard, lo in enumerate(range(0, len(events), 4)):
        chunk = events[lo:lo + 4]
        ev_t = pa.table({
            "event_seq": pa.array([e[0] for e in chunk], pa.int64()),
            "op": pa.array([e[1] for e in chunk], pa.string()),
            "url": pa.array([e[2] for e in chunk], pa.string()),
            "warc_ts": pa.array([ts(e[0] + 1) for e in chunk],
                                pa.timestamp("us")),
            "html": pa.array(
                [None if e[3] is None else f"<p>{e[3]}</p>".encode()
                 for e in chunk], pa.binary()
            ),
            "text": pa.array([e[3] for e in chunk], pa.string()),
            "lang": pa.array(
                [None if e[3] is None else "en" for e in chunk], pa.string()
            ),
        })
        name = os.path.join(corpus_dir, "events", f"part-{shard:05d}.parquet")
        pq.write_table(ev_t, name + ".tmp")
        os.replace(name + ".tmp", name)
    meta = os.path.join(corpus_dir, "events", "_meta.json")
    if os.path.exists(meta):  # stale meta from an older fixture layout
        os.remove(meta)
    expected = (
        # final live table after replay (p2 deleted; n1/n4/n6 diverted)
        [("http://base/p0", _PARA, "live"),
         ("http://base/p1", p1_updated, "live"),
         ("http://base/p3", _SINGLETON, "live"),
         ("http://new/n2", _FRESH1, "live"),
         ("http://new/n3", _FRESH2, "live"),
         ("http://new/n5", _FRESH3, "live")]
        + [("http://new/n1", _PARA.replace("quick", "swift"), "neardup"),
           ("http://new/n4", _FRESH1.replace("barriers", "fences"),
            "neardup"),
           ("http://new/n6", _FRESH3.replace("overnight", "nightly"),
            "neardup")]
    )
    oracle_t = pa.table({
        "url": pa.array([e[0] for e in expected], pa.string()),
        "text": pa.array([e[1] for e in expected], pa.string()),
        "status": pa.array([e[2] for e in expected], pa.string()),
    })
    _write(oracle_t, oracle_path)
    return corpus_dir, oracle_path


# ------------------------------------------------------ span-removal oracle


def span_remove_sidecar(sf_dir: str, k: int = 5,
                        path: str = SPAN_REMOVE_ORACLE_PATH) -> str:
    """Sequential replay oracle for ``dedup_spans_remove`` (Lee et al.
    2022 ExactSubstr at fixed k): the dumb obvious implementation — one
    dict of span TEXT -> occurrence list built scanning docs in ascending
    (doc_id, pos) order, canonical = first occurrence, every other
    occurrence's [pos, pos+k) tokens excised via interval coverage. Keys
    on the actual span string (no hashing), so it independently checks
    the distributed path's 128-bit span-hash identity too. Per-row Python
    is fine by design: an oracle must be the obvious implementation."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    order = np.argsort(np.asarray(ids, np.int64), kind="stable")
    occ: dict = {}
    toks_by_doc: dict = {}
    for j in order:
        d = ids[j]
        toks = (texts[j] or "").split(" ")
        toks_by_doc[d] = toks
        for p in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[p:p + k]), []).append((d, p))
    removed: dict = {}
    for lst in occ.values():
        if len(lst) >= 2:
            for d, p in lst[1:]:  # lst is (doc, pos)-ascending by scan order
                removed.setdefault(d, []).append(p)
    out_ids, out_txt = [], []
    for j in order:
        d = ids[j]
        toks = toks_by_doc[d]
        ps = removed.get(d)
        if not ps:
            out_txt.append(" ".join(toks))
        else:
            cover = np.zeros(len(toks) + 1, np.int64)
            pp = np.asarray(ps, np.int64)
            np.add.at(cover, pp, 1)
            np.subtract.at(cover, np.minimum(pp + k, len(toks)), 1)
            keep = np.cumsum(cover[:-1]) == 0
            out_txt.append(
                " ".join(tok for tok, m in zip(toks, keep) if m)
            )
        out_ids.append(d)
    return _write(pa.table({
        "doc_id": pa.array(out_ids, pa.int64()),
        "text_clean": pa.array(out_txt, pa.string()),
    }), path)


# ------------------------------------------------------- dedup-window oracle

DEDUP_WINDOW_ORACLE_PATH = os.path.join(
    FIXTURE_DIR, "dedup_window_oracle.parquet"
)


def dedup_window_sidecar(sf_dir: str, gap_s: float,
                         path: str = DEDUP_WINDOW_ORACLE_PATH) -> str:
    """Sequential kept-anchored throttle oracle for ``dedup_window_events``:
    per (user_id, event_type) in (ts, event_id) order, keep a row iff it is
    more than ``gap_s`` seconds after the LAST KEPT row — the dumb obvious
    row-at-a-time replay of the window-dedup contract (kept-anchored, not
    prev-raw-anchored), written to a fixed sidecar parquet for the DuckDB
    oracle. Per-row Python is fine by design here: an oracle must be the
    obvious implementation, and the driver corpus is small."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    df = t.to_pandas()
    df = df[df["ts"].notna() & df["user_id"].notna()
            & df["event_type"].notna()]
    df = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                        kind="mergesort")
    tsec = (df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            / 1e6)
    last: dict = {}
    keep = []
    for (uid, etype, sec) in zip(df["user_id"].to_numpy(),
                                 df["event_type"].to_numpy(), tsec):
        k = (uid, etype)
        if k not in last or sec - last[k] > gap_s:
            keep.append(True)
            last[k] = sec
        else:
            keep.append(False)
    out = df[np.asarray(keep)]
    t = pa.table({
        "event_id": pa.array(out["event_id"].to_numpy(), pa.int64()),
        "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
        "event_type": pa.array(out["event_type"].to_numpy(), pa.string()),
        "ts": pa.array(out["ts"].to_numpy().astype("datetime64[us]"),
                       pa.timestamp("us")),
    })
    return _write(t, path)


def planted_ssjoin(lpath: str = SSJOIN_L_PATH,
                   rpath: str = SSJOIN_R_PATH) -> tuple[str, str]:
    """Cross-table similarity-join ground truth: the LEFT corpus holds
    distinct base paragraphs; the RIGHT holds lightly edited copies of
    some of them (5-gram Jaccard well above 0.7 to their source, margin
    enforced) plus unrelated texts (well below to everything). Each right
    row's ``match_doc`` stores the left id it must join to (null = no
    match) — the oracle is a projection, no similarity math in SQL."""
    left = [
        (0, _PARA),
        (1, _PARA2),
        (2, _PARA3),
        (3, "short unique note about nothing in particular worth keeping"),
    ]
    right = [
        (100, _PARA + " extra tail words here", 0),
        (101, _PARA.replace("quick", "swift"), 0),
        (102, _PARA2.replace("interactive", "blazing"), 1),
        (103, _PARA3.replace("consensus", "gossip")
              .replace("raft", "scuttlebutt")
              .replace("paxos", "epidemic broadcast")
              .replace("leader", "peer").replace("log", "digest"), None),
        (104, "completely different content about cooking pasta with "
              "garlic and olive oil in a small kitchen by the sea", None),
    ]
    lt = pa.table({
        "doc_id": pa.array([d[0] for d in left], pa.int64()),
        "text": pa.array([d[1] for d in left], pa.string()),
    })
    rt = pa.table({
        "doc_id": pa.array([d[0] for d in right], pa.int64()),
        "text": pa.array([d[1] for d in right], pa.string()),
        "match_doc": pa.array([d[2] for d in right], pa.int64()),
    })
    return _write(lt, lpath), _write(rt, rpath)


def planted_feed(path: str = FEED_AUDIT_PATH) -> str:
    """A CDC change feed with PLANTED sequence-integrity defects, for the
    feed-integrity audit (stages/quality.feed_integrity_audit).

    Five feed partitions, each a dense ``seq`` range [0, 2000) with known
    holes (dropped events) and duplicate bursts (producer retries) removed
    or injected so the audit's expected output is SQL-computable from the
    data itself (lag-window gaps + HAVING count(*)>1 dups). Defects are
    placed relative to the audit's seq-window size of 256 to exercise every
    distributed code path: interior gaps, a gap crossing one window
    boundary, a gap swallowing two ENTIRE windows (multi-window driver
    stitch), adjacent duplicates, and a duplicate exactly on a window
    boundary. Row order is shuffled with a fixed seed (the audit must not
    depend on input order).
    """
    n = 2000
    parts: list[tuple[int, set[int], dict[int, int]]] = [
        # (partition_id, missing seqs, {seq: total copies})
        (0, set(range(100, 103)), {50: 3}),
        (1, set(range(255, 259)), {600: 2}),          # crosses 255|256
        (2, set(range(512, 1024)), {}),               # windows 2,3 missing
        (3, set(), {10: 2, 11: 2}),
        (4, {1, 1998}, {1024: 2}),                    # dup on boundary
    ]
    pid_col: list[int] = []
    seq_col: list[int] = []
    for pid, missing, dups in parts:
        for s in range(n):
            if s in missing:
                continue
            for _ in range(dups.get(s, 1)):
                pid_col.append(pid)
                seq_col.append(s)
    rng = np.random.default_rng(20260820)
    order = rng.permutation(len(seq_col))
    pid_a = np.asarray(pid_col, dtype=np.int64)[order]
    seq_a = np.asarray(seq_col, dtype=np.int64)[order]
    payload = [f"p{p}-s{s}" for p, s in zip(pid_a, seq_a)]
    t = pa.table({
        "partition_id": pa.array(pid_a),
        "seq": pa.array(seq_a),
        "payload": pa.array(payload, pa.string()),
    })
    return _write(t, path)


REDIRECTS_PATH = os.path.join(FIXTURE_DIR, "planted_redirects.parquet")


def planted_redirects(path: str = REDIRECTS_PATH) -> str:
    """An ACYCLIC functional redirect graph (each src has exactly one
    outgoing edge) with PLANTED chain shapes, for pointer-jumping chain
    resolution (functions/graph.resolve_chains).

    Shapes: one long chain of 130 hops (forces >= 8 doubling rounds), a
    fan of chains with every length 1..20, a convergent tree whose leaves
    drain into the long chain at varied depths, and duplicate-destination
    aliases. Acyclic so the DuckDB recursive-CTE oracle terminates; the
    cycle path is covered by the pytest unit test instead. Row order is
    shuffled with a fixed seed (resolution must not depend on input
    order).
    """
    src: list[int] = []
    dst: list[int] = []
    # long chain 1000 -> 1001 -> ... -> 1130 (1130 terminal)
    for i in range(1000, 1130):
        src.append(i)
        dst.append(i + 1)
    # chains of every length L = 1..20: 10_000*L + k -> +1 ... -> terminal
    for L in range(1, 21):
        base = 10_000 * L
        for k in range(L):
            src.append(base + k)
            dst.append(base + k + 1)
    # convergent tree: 200 leaves drain into the long chain at varied
    # depths (leaf 5000+j -> 1000 + (j*7 % 130))
    for j in range(200):
        src.append(5000 + j)
        dst.append(1000 + (j * 7) % 130)
    # aliases: many srcs -> one shared mid-chain node
    for j in range(50):
        src.append(7000 + j)
        dst.append(1064)
    rng = np.random.default_rng(20260821)
    order = rng.permutation(len(src))
    t = pa.table({
        "src": pa.array(np.asarray(src, np.int64)[order]),
        "dst": pa.array(np.asarray(dst, np.int64)[order]),
    })
    return _write(t, path)


WARC_DIR = os.path.join(FIXTURE_DIR, "planted_warc")
WARC_SIDECAR_PATH = os.path.join(FIXTURE_DIR, "planted_warc_oracle.parquet")


def planted_warc(out_dir: str = WARC_DIR,
                 sidecar: str = WARC_SIDECAR_PATH) -> tuple[str, str]:
    """Deterministic mini web archive for the WARC source
    (sources/warc.read_warc): 3 files x ~40 records with the defects a
    parser must survive — a payload CONTAINING the record magic
    ``WARC/1.0\\r\\n`` (a by-length walker must not trip; a magic-scanner
    would), payloads with bare CRLFs and CRLFCRLF, an empty payload, and
    interleaved non-response records (warcinfo/request) the default
    filter drops. Returns (warc_dir, sidecar_parquet): the sidecar holds
    the expected (url, warc_date, text) of every RESPONSE record — the
    planted ground truth the DuckDB oracle reads."""
    os.makedirs(out_dir, exist_ok=True)
    exp_url: list[str] = []
    exp_date: list[str] = []
    exp_text: list[str] = []

    def rec(rtype: str, payload: bytes, url: str | None = None,
            date: str | None = None) -> bytes:
        h = [b"WARC/1.0"]
        h.append(b"WARC-Type: " + rtype.encode())
        if url is not None:
            h.append(b"WARC-Target-URI: " + url.encode())
        if date is not None:
            h.append(b"WARC-Date: " + date.encode())
        h.append(b"Content-Length: " + str(len(payload)).encode())
        return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    for f in range(3):
        parts = [rec("warcinfo", b"software: planted-fixture")]
        for i in range(40):
            url = f"https://warc{f}.example/page{i:03d}"
            date = f"2026-02-{(i % 28) + 1:02d}T0{f}:00:00Z"
            if i % 7 == 0:
                text = f"page {i} embeds WARC/1.0\r\n magic and\r\n\r\nblanks"
            elif i % 11 == 0:
                text = ""
            else:
                text = f"file {f} page {i} body " + "x" * (i * 3)
            parts.append(rec("request", b"GET /page HTTP/1.1",
                             url=url, date=date))
            parts.append(rec("response", text.encode(), url=url, date=date))
            exp_url.append(url)
            exp_date.append(date)
            exp_text.append(text)
        with open(os.path.join(out_dir, f"crawl-{f:02d}.warc"), "wb") as fh:
            fh.write(b"".join(parts))

    t = pa.table({
        "url": pa.array(exp_url, pa.string()),
        "warc_date": pa.array(exp_date, pa.string()),
        "text": pa.array(exp_text, pa.string()),
    })
    _write(t, sidecar)
    return out_dir, sidecar


# ---------------------------------------------------------- training oracles

LR_ORACLE_PATH = os.path.join(FIXTURE_DIR, "lr_train_oracle.parquet")
PCA_ORACLE_PATH = os.path.join(FIXTURE_DIR, "pca_oracle.parquet")
BPE_ORACLE_PATH = os.path.join(FIXTURE_DIR, "bpe_oracle.parquet")


def lr_oracle_sidecar(sf_dir: str, iters: int = 12, lr: float = 0.5,
                      path: str = LR_ORACLE_PATH) -> str:
    """Sequential fixed-point logistic-regression replay over the
    embeddings table (y = label < 5): the independent oracle for the
    distributed ``train.logreg_train`` (bit-identical by the exact-integer
    accumulation design — see functions/train.py docstring)."""
    import pyarrow.parquet as _pq

    from .functions.train import _vec_matrix, logreg_train_sequential

    t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["embedding", "label"])
    # the SAME extraction the distributed side uses (shared plumbing —
    # oracle independence applies to the replay, not the column decode)
    mat = _vec_matrix(t, "embedding")
    y = (t.column("label").to_numpy(zero_copy_only=False) < 5).astype(
        np.float64
    )
    w, bias, = logreg_train_sequential(mat, y, iters=iters, lr=lr)
    out = pa.table({
        "dim_idx": pa.array(
            list(range(len(w))) + [-1], pa.int64()
        ),
        "weight": pa.array(list(w) + [bias], pa.float64()),
    })
    return _write(out, path)


def pca_oracle_sidecar(sf_dir: str, k: int = 2,
                       path: str = PCA_ORACLE_PATH) -> str:
    """Sequential one-pass PCA replay (quantized integer moments → shared
    eigh/sign canonicalization → ordered-accumulation projection): the
    independent oracle for ``train.pca_fit``/``pca_project``."""
    import pyarrow.parquet as _pq

    from .functions.train import (
        _det_matvec,
        _moment_partials,
        _principal_components,
        _vec_matrix,
    )
    from .kernels import duck_round

    scale = 2 ** 16
    t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    mat = _vec_matrix(t, "embedding")
    n, s, ss = _moment_partials(mat, scale)
    mean, comps = _principal_components(n, s, ss, scale, k)
    centered = mat - mean
    cols = {"vec_id": t.column("vec_id")}
    for i in range(k):
        cols[f"pc{i + 1}"] = pa.array(
            duck_round(_det_matvec(centered, comps[i]), 6)
        )
    return _write(pa.table(cols), path)


def bpe_oracle_sidecar(sf_dir: str, n_merges: int = 40,
                       path: str = BPE_ORACLE_PATH) -> str:
    """Independent word recount (pure-Python split + Counter over the raw
    parquet) feeding the SAME published merge loop: the oracle for the
    distributed word-count half of ``train.bpe_train``."""
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import bpe_merge_loop

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["text"])
    counts: Counter = Counter()
    for s in t.column("text").to_pylist():
        for w in (s or "").split(" "):
            if w:
                counts[w] += 1
    merges = bpe_merge_loop(dict(counts), n_merges)
    out = pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })
    return _write(out, path)


BPE_APPLY_ORACLE_PATH = os.path.join(FIXTURE_DIR, "bpe_apply_oracle.parquet")
TOKEN_EXPORT_ORACLE_PATH = os.path.join(FIXTURE_DIR, "token_export_oracle.parquet")
UNIGRAM_IDS_ORACLE_PATH = os.path.join(FIXTURE_DIR, "unigram_ids_oracle.parquet")


def tokenized_export_oracle_sidecar(sf_dir: str, n_merges: int = 40,
                                    budget: int = 512,
                                    path: str = TOKEN_EXPORT_ORACLE_PATH
                                    ) -> str:
    """Sequential replay of the tokenized-shard export chain: independent
    word recount -> published merge loop -> per-doc token-ID encode under
    the SHARED symbol-id convention (train.bpe_symbol_ids /
    _bpe_word_ids) in doc_id order -> exclusive-cumsum budget bins ->
    per-bin (n_docs, n_tokens, md5 of the comma-joined id sequence).
    Oracles ``export_tokenized_shards``: the distributed result is read
    back FROM the written shard files, so equality proves the landed
    trainable data, not intent."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import (_bpe_word_ids, bpe_merge_loop,
                                  bpe_symbol_ids)

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    order = np.argsort(
        t.column("doc_id").to_numpy(zero_copy_only=False), kind="stable"
    )
    texts = t.column("text").to_pylist()
    rows = [(int(t.column("doc_id")[int(j)].as_py()), texts[int(j)])
            for j in order]
    counts: Counter = Counter()
    for _d, s in rows:
        for w in (s or "").split(" "):
            if w:
                counts[w] += 1
    merges = bpe_merge_loop(dict(counts), n_merges)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    sym_ids = bpe_symbol_ids([(m[1], m[2]) for m in merges])
    cache: dict = {}

    def ids_of(w: str) -> list:
        if w not in cache:
            cache[w] = _bpe_word_ids(w, ranks, sym_ids)
        return cache[w]

    doc_ids = []
    for _d, s in rows:
        ids: list = []
        for w in (s or "").split(" "):
            if w:
                ids += ids_of(w)
        doc_ids.append(ids)
    lens = np.array([len(x) for x in doc_ids], np.int64)
    excl = np.concatenate([[0], np.cumsum(lens)[:-1]])
    bins = excl // int(budget)
    out_rows: dict = {}
    for b, ids in zip(bins, doc_ids):
        r = out_rows.setdefault(int(b), [0, []])
        r[0] += 1
        r[1] += ids
    keys = sorted(out_rows)
    out = pa.table({
        "bin_id": pa.array(keys, pa.int64()),
        "n_docs": pa.array([out_rows[k][0] for k in keys], pa.int64()),
        "n_tokens": pa.array([len(out_rows[k][1]) for k in keys],
                             pa.int64()),
        "ids_md5": pa.array([
            hashlib.md5(",".join(map(str, out_rows[k][1])).encode()
                        ).hexdigest()
            for k in keys
        ], pa.string()),
    })
    return _write(out, path)


def bpe_apply_oracle_sidecar(sf_dir: str, n_merges: int = 40,
                             path: str = BPE_APPLY_ORACLE_PATH) -> str:
    """Sequential replay of train-then-encode: independent pure-Python
    word recount -> the published merge loop -> the published greedy
    encoder over each row's words (cached per distinct word) -> per-lang
    (n_docs, total_bpe_tokens). Oracles the distributed
    ``train.bpe_apply`` composition."""
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import bpe_encode_word, bpe_merge_loop

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["lang", "text"])
    counts: Counter = Counter()
    rows = list(zip(t.column("lang").to_pylist(),
                    t.column("text").to_pylist()))
    for _lang, s in rows:
        for w in (s or "").split(" "):
            if w:
                counts[w] += 1
    merges = bpe_merge_loop(dict(counts), n_merges)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    cache: dict[str, int] = {}

    def ntok(w: str) -> int:
        if w not in cache:
            cache[w] = len(bpe_encode_word(w, ranks))
        return cache[w]

    agg: dict[str, list[int]] = {}
    for lang, s in rows:
        tot = sum(ntok(w) for w in (s or "").split(" ") if w)
        a = agg.setdefault(lang, [0, 0])
        a[0] += 1
        a[1] += tot
    langs = sorted(agg)
    out = pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([agg[g][0] for g in langs], pa.int64()),
        "total_bpe_tokens": pa.array([agg[g][1] for g in langs], pa.int64()),
    })
    return _write(out, path)


ZRATIO_ORACLE_PATH = os.path.join(FIXTURE_DIR, "zratio_oracle.parquet")


def zratio_oracle_sidecar(sf_dir: str, level: int = 6,
                          path: str = ZRATIO_ORACLE_PATH) -> str:
    """Sequential per-row zlib replay (same level, same zlib build) —
    the oracle for the distributed compression-ratio quality screen."""
    import zlib

    import pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    raws, comps = [], []
    for s in t.column("text").to_pylist():
        b = (s or "").encode()
        raws.append(len(b))
        comps.append(len(zlib.compress(b, level)) if b else 0)
    raw = np.asarray(raws, np.int64)
    comp = np.asarray(comps, np.int64)
    out = pa.table({
        "doc_id": t.column("doc_id"),
        "raw_len": pa.array(raw),
        "ratio": pa.array(
            np.where(raw > 0, comp / np.maximum(raw, 1), 0.0), pa.float64()
        ),
    })
    return _write(out, path)


UNIGRAM_ORACLE_PATH = os.path.join(FIXTURE_DIR, "unigram_oracle.parquet")


def unigram_oracle_sidecar(sf_dir: str, vocab_size: int = 300,
                           iters: int = 3,
                           path: str = UNIGRAM_ORACLE_PATH) -> str:
    """Independent pure-Python word recount feeding the published
    Viterbi-EM (functions/train.unigram_em — fixed-order float ops, so
    the replay is bit-identical): the oracle for ``unigram_train``."""
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import unigram_em

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["text"])
    counts: Counter = Counter()
    for s in t.column("text").to_pylist():
        for w in (s or "").split(" "):
            if w:
                counts[w] += 1
    pieces = unigram_em(dict(counts), vocab_size=vocab_size, iters=iters)
    out = pa.table({
        "piece": pa.array([p for p, _ in pieces], pa.string()),
        "prob": pa.array([q for _, q in pieces], pa.float64()),
    })
    return _write(out, path)


UNIGRAM_APPLY_ORACLE_PATH = os.path.join(
    FIXTURE_DIR, "unigram_apply_oracle.parquet"
)


def unigram_ids_oracle_sidecar(
    sf_dir: str, vocab_size: int = 300, iters: int = 3,
    path: str = UNIGRAM_IDS_ORACLE_PATH,
) -> str:
    """Sequential replay of unigram train-then-ID-encode (oracle for
    ``export_unigram_ids``): independent word recount -> shared
    Viterbi-EM -> shared piece-id convention (train.unigram_symbol_ids /
    _unigram_word_ids) per doc -> (doc_id, n_tokens, md5 of the
    comma-joined id sequence)."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import (_unigram_word_ids, unigram_em,
                                  unigram_symbol_ids)

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    ids_col = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    counts: Counter = Counter()
    for s in texts:
        for w in (s or "").split(" "):
            if w:
                counts[w] += 1
    pieces = unigram_em(dict(counts), vocab_size=vocab_size, iters=iters)
    logp = {p: float(np.log(q)) for p, q in pieces if q > 0}
    sym = unigram_symbol_ids(pieces)
    cache: dict = {}

    def wids(w: str):
        if w not in cache:
            cache[w] = _unigram_word_ids(w, logp, sym, 6)
        return cache[w]

    out_n, out_md5 = [], []
    for s in texts:
        seq: list = []
        for w in (s or "").split(" "):
            if w:
                seq += wids(w)
        out_n.append(len(seq))
        out_md5.append(
            hashlib.md5(",".join(map(str, seq)).encode()).hexdigest()
        )
    return _write(pa.table({
        "doc_id": pa.array(ids_col, pa.int64()),
        "n_tokens": pa.array(out_n, pa.int64()),
        "ids_md5": pa.array(out_md5, pa.string()),
    }), path)


def unigram_apply_oracle_sidecar(
    sf_dir: str, vocab_size: int = 300, iters: int = 3,
    path: str = UNIGRAM_APPLY_ORACLE_PATH,
) -> str:
    """Sequential replay of unigram train-then-encode: independent word
    recount -> shared Viterbi-EM -> shared Viterbi encoder per distinct
    word -> per-lang (n_docs, total_unigram_tokens)."""
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import _viterbi_segment, unigram_em

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["lang", "text"])
    rows = list(zip(t.column("lang").to_pylist(),
                    t.column("text").to_pylist()))
    counts: Counter = Counter()
    for _lang, s in rows:
        for w in (s or "").split(" "):
            if w:
                counts[w] += 1
    pieces = unigram_em(dict(counts), vocab_size=vocab_size, iters=iters)
    logp = {p: float(np.log(q)) for p, q in pieces if q > 0}
    cache: dict[str, int] = {}

    def ntok(w: str) -> int:
        if w not in cache:
            cache[w] = len(_viterbi_segment(w, logp, 6))
        return cache[w]

    agg: dict[str, list[int]] = {}
    for lang, s in rows:
        tot = sum(ntok(w) for w in (s or "").split(" ") if w)
        a = agg.setdefault(lang, [0, 0])
        a[0] += 1
        a[1] += tot
    langs = sorted(agg)
    out = pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([agg[g][0] for g in langs], pa.int64()),
        "total_unigram_tokens": pa.array(
            [agg[g][1] for g in langs], pa.int64()
        ),
    })
    return _write(out, path)


PQ_ORACLE_PATH = os.path.join(FIXTURE_DIR, "pq_oracle.parquet")


def pq_oracle_sidecar(sf_dir: str, m: int = 8, k: int = 16,
                      path: str = PQ_ORACLE_PATH) -> str:
    """Sequential PQ replay: same deterministic Euclidean codebook fit on
    the same training matrix, sequential code assignment — the oracle for
    ``similarity.product_quantize``."""
    import pyarrow.parquet as _pq

    from .functions.similarity import pq_kmeans
    from .functions.train import _vec_matrix

    t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy(zero_copy_only=False))
    mat = _vec_matrix(t, "embedding")[order]
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[order]
    dim = mat.shape[1]
    d = dim // m
    books = np.stack([
        pq_kmeans(mat[:, i * d:(i + 1) * d], k) for i in range(m)
    ])
    joined = []
    for row in mat:
        code = []
        for i in range(m):
            sub = row[i * d:(i + 1) * d]
            d2 = ((sub[None, :] - books[i]) ** 2).sum(axis=-1)
            code.append(int(np.argmin(d2)))
        joined.append(",".join(map(str, code)))
    out = pa.table({
        "vec_id": pa.array(ids),
        "pq_code": pa.array(joined, pa.string()),
    })
    return _write(out, path)


PQ_KNN_ORACLE_PATH = os.path.join(FIXTURE_DIR, "pq_knn_oracle.parquet")
IVFPQ_KNN_ORACLE_PATH = os.path.join(FIXTURE_DIR, "ivfpq_knn_oracle.parquet")


def ivfpq_knn_oracle_sidecar(sf_dir: str, n_queries: int = 3,
                             k: int = 10, n_cells: int = 8, m: int = 8,
                             ks: int = 16, nprobe: int = 3,
                             path: str = IVFPQ_KNN_ORACLE_PATH) -> str:
    """Sequential IVF-PQ replay (oracle for similarity.knn_ivfpq_search
    over an ivfpq_index_build index): same coarse fit (kmeans_fit), same
    residual codebooks (pq_kmeans), same per-row code assignment
    (_assign_pq_codes), same nprobe cell probing (ties: lower cell id)
    and residual-ADC sums, exact top-k with ascending-id ties — over ALL
    rows of the probed cells, which equals the incremental two-run index
    because the model is fit once and per-row codes are deterministic."""
    import pyarrow.parquet as _pq

    from .functions.similarity import (_assign_pq_codes, _normalize,
                                       kmeans_fit, pq_kmeans)
    from .functions.train import _vec_matrix
    from .kernels import duck_round

    t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy(zero_copy_only=False))
    X = _normalize(_vec_matrix(t, "embedding")[order])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[order]
    dim = X.shape[1]
    d = dim // m
    C = kmeans_fit(X, n_cells)
    cell = np.argmax(X @ C.T, axis=1)
    resid = X - C[cell]
    books = np.stack([
        pq_kmeans(resid[:, i * d:(i + 1) * d], ks) for i in range(m)
    ])
    codes = _assign_pq_codes(resid, books)
    Q = X[:n_queries]
    sims = Q @ C.T
    rows_q, rows_i, rows_d = [], [], []
    for qi in range(n_queries):
        probe = np.lexsort((np.arange(n_cells), -sims[qi]))[:nprobe]
        idx = np.flatnonzero(np.isin(cell, probe))
        ad = np.zeros(len(idx), np.float64)
        for i in range(m):
            tabs = {
                int(c): (((Q[qi] - C[c])[i * d:(i + 1) * d][None, :]
                          - books[i]) ** 2).sum(axis=-1)
                for c in probe
            }
            for j, row in enumerate(idx):
                ad[j] += tabs[int(cell[row])][codes[row, i]]
        top = np.lexsort((ids[idx], ad))[:k]
        rows_q.append(np.full(len(top), qi, np.int64))
        rows_i.append(ids[idx][top])
        rows_d.append(ad[top])
    out = pa.table({
        "query_id": pa.array(np.concatenate(rows_q)),
        "vec_id": pa.array(np.concatenate(rows_i)),
        "adist": pa.array(
            duck_round(np.concatenate(rows_d), 6), pa.float64()
        ),
    })
    return _write(out, path)


def pq_knn_oracle_sidecar(sf_dir: str, n_queries: int = 3, k: int = 10,
                          m: int = 8, ks: int = 16,
                          path: str = PQ_KNN_ORACLE_PATH) -> str:
    """Sequential ADC replay: same codebook fit, same LUT math, exact
    top-k per query over all rows (ties: ascending id) — the oracle for
    ``similarity.knn_pq_adc``."""
    import pyarrow.parquet as _pq

    from .functions.similarity import pq_kmeans
    from .functions.train import _vec_matrix
    from .kernels import duck_round

    t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy(zero_copy_only=False))
    mat = _vec_matrix(t, "embedding")[order]
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[order]
    Q = mat[:n_queries]
    dim = mat.shape[1]
    d = dim // m
    books = np.stack([
        pq_kmeans(mat[:, i * d:(i + 1) * d], ks) for i in range(m)
    ])
    codes = np.stack([
        np.argmin(((mat[:, None, i * d:(i + 1) * d]
                    - books[i][None, :, :]) ** 2).sum(axis=-1), axis=1)
        for i in range(m)
    ], axis=1)
    lut = np.stack([
        ((Q[:, None, i * d:(i + 1) * d] - books[i][None, :, :]) ** 2
         ).sum(axis=-1)
        for i in range(m)
    ], axis=1)
    rows_q, rows_i, rows_d = [], [], []
    for qi in range(len(Q)):
        ad = np.zeros(len(mat), np.float64)
        for i in range(m):
            ad += lut[qi, i][codes[:, i]]
        order2 = np.lexsort((ids, ad))[:k]
        rows_q.append(np.full(len(order2), qi, np.int64))
        rows_i.append(ids[order2])
        rows_d.append(ad[order2])
    out = pa.table({
        "query_id": pa.array(np.concatenate(rows_q)),
        "vec_id": pa.array(np.concatenate(rows_i)),
        "adist": pa.array(
            duck_round(np.concatenate(rows_d), 6), pa.float64()
        ),
    })
    return _write(out, path)


COOC_ORACLE_PATH = os.path.join(FIXTURE_DIR, "cooc_embed_oracle.parquet")


def cooc_embed_oracle_sidecar(sf_dir: str, vocab_size: int = 200,
                              window: int = 2, dim: int = 16,
                              iters: int = 60, sparse: bool | None = None,
                              path: str = COOC_ORACLE_PATH) -> str:
    """Sequential replay of co-occurrence embedding training: independent
    pure-Python vocab + windowed pair recount feeding the shared
    deterministic factorization — the oracle for
    ``train.cooc_embed_train``. ``sparse`` mirrors the distributed
    side's kernel selection (nonzero-triplet factorization above 500
    words); the RECOUNT stays an independent pure-Python pass — only the
    deterministic factorization kernel is shared, per the sidecar
    contract."""
    from collections import Counter

    import pyarrow.parquet as _pq

    from .functions.train import factorize_cooc, factorize_cooc_sparse
    from .kernels import duck_round

    if sparse is None:
        sparse = vocab_size > 500
    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["text"])
    wc: Counter = Counter()
    docs_tokens = []
    for s in t.column("text").to_pylist():
        toks = [w for w in (s or "").split(" ") if w]
        docs_tokens.append(toks)
        wc.update(toks)
    vocab = [w for w, _ in sorted(
        wc.items(), key=lambda kv: (-kv[1], kv[0])
    )[:vocab_size]]
    vmap = {w: i for i, w in enumerate(vocab)}
    pair_counts: Counter = Counter()
    for toks in docs_tokens:
        ids = [vmap[w] for w in toks if w in vmap]
        for i, a in enumerate(ids):
            for off in range(1, window + 1):
                if i + off < len(ids):
                    b = ids[i + off]
                    pair_counts[(a, b)] += 1
                    pair_counts[(b, a)] += 1
    if sparse:
        items = sorted(pair_counts.items())
        r = np.array([k[0] for k, _ in items], np.int64)
        c = np.array([k[1] for k, _ in items], np.int64)
        n = np.array([v for _, v in items], np.int64)
        emb = duck_round(
            factorize_cooc_sparse(r, c, n, len(vocab), dim=dim,
                                  iters=iters), 6)
    else:
        C = np.zeros((len(vocab), len(vocab)), np.int64)
        for (a, b), v in pair_counts.items():
            C[a, b] = v
        emb = duck_round(factorize_cooc(C, dim=dim, iters=iters), 6)
    out = pa.table({
        "word": pa.array(vocab, pa.string()),
        "embedding": pa.array(
            [",".join(repr(float(x)) for x in row) for row in emb],
            pa.string(),
        ),
    })
    return _write(out, path)


PHASH_ORACLE_PATH = os.path.join(FIXTURE_DIR, "phash_oracle.parquet")


def phash_oracle_sidecar(sf_dir: str, max_hamming: int = 3,
                         path: str = PHASH_ORACLE_PATH) -> str:
    """Sequential perceptual-hash replay: regenerate the planted payloads
    for every doc_id, decode with the same PnmCodec, aHash each image,
    then brute-force ALL O(n^2) pairs (vectorized SWAR popcount,
    blockwise) and keep Hamming <= max_hamming. Recall parity with the
    distributed banded kernel is exact at radius <= 3 (pigeonhole over 4
    bands) while every band bucket stays within the kernel's triangle
    cap — true for the planted corpus (buckets of <= 3 images); an
    adversarial corpus with thousands of identical hashes would trip the
    kernel's documented window fallback and diverge from brute force."""
    import pyarrow.parquet as _pq

    from .functions.dedup import _popcount
    from .functions.multimodal import (PnmCodec, ahash64,
                                       planted_neardup_media_batch)

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id"])
    media = planted_neardup_media_batch(t)
    codec = PnmCodec()
    ids = media.column("media_id").to_numpy(zero_copy_only=False)
    fps = np.array(
        [ahash64(codec.decode(p)) for p in media.column("payload").to_pylist()],
        np.uint64,
    )
    order = np.argsort(ids)
    ids, fps = ids[order].astype(np.int64), fps[order]
    n = len(ids)
    out_a, out_b, out_h = [], [], []
    block = 1024
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        x = fps[lo:hi, None] ^ fps[None, :]
        ham = _popcount(x.reshape(-1)).reshape(hi - lo, n).astype(np.int64)
        bi, bj = np.nonzero(ham <= max_hamming)
        gi = bi + lo
        keep = gi < bj  # upper triangle only
        out_a.append(ids[gi[keep]])
        out_b.append(ids[bj[keep]])
        out_h.append(ham[bi[keep], bj[keep]])
    empty = np.array([], np.int64)
    out = pa.table({
        "a": pa.array(np.concatenate(out_a) if out_a else empty),
        "b": pa.array(np.concatenate(out_b) if out_b else empty),
        "hamming": pa.array(np.concatenate(out_h) if out_h else empty),
    })
    return _write(out, path)


DSIR_ORACLE_PATH = os.path.join(FIXTURE_DIR, "dsir_oracle.parquet")


def dsir_oracle_sidecar(sf_dir: str, n_buckets: int = 8192,
                        path: str = DSIR_ORACLE_PATH) -> str:
    """Sequential DSIR replay: one pass over the doc_id-ordered corpus
    with the SAME hashed-ngram featurizer, count math and fixed-order
    scoring accumulation as the distributed op (functions/train.py
    dsir_weights) — bit-equal on any partitioning by construction.
    Target distribution = the English documents (lang = 'en')."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from .functions.train import dsir_weights_sequential

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text", "lang"])
    t = t.sort_by("doc_id")
    t = t.append_column(
        "is_target", _pc.equal(t.column("lang"), "en")
    )
    ids, w = dsir_weights_sequential(t, n_buckets=n_buckets)
    out = pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64)),
        "dsir_logw": pa.array(w),
    })
    return _write(out, path)


VIDEO_DUP_ORACLE_PATH = os.path.join(FIXTURE_DIR, "video_dup_oracle.parquet")


def video_dup_oracle_sidecar(sf_dir: str, min_shared: int = 2,
                             max_bucket: int = 64, stride: int = 1,
                             max_frames: int = 8,
                             path: str = VIDEO_DUP_ORACLE_PATH) -> str:
    """Sequential video near-dup replay: regenerate the planted video
    payloads per doc_id, demux + aHash the SAME sampled frames (distinct
    per video), drop stop frames (hash in > max_bucket videos — the same
    deterministic cutoff the distributed kernel applies), and count
    shared hashes per video pair; keep shared >= min_shared."""
    import collections

    import pyarrow.parquet as _pq

    from .functions.multimodal import (VideoFrameHasher,
                                       planted_neardup_video_batch)

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id"])
    media = planted_neardup_video_batch(t)
    hasher = VideoFrameHasher(stride=stride, max_frames=max_frames)
    rows = hasher(media)
    ids = rows.column("media_id").to_numpy(zero_copy_only=False)
    fhs = rows.column("fhash").to_numpy(zero_copy_only=False)
    by_hash: dict = collections.defaultdict(list)
    for mid, fh in zip(ids.tolist(), fhs.tolist()):
        by_hash[fh].append(mid)
    shared: dict = collections.Counter()
    for members in by_hash.values():
        if len(members) < 2 or len(members) > max_bucket:
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                shared[(members[i], members[j])] += 1
    keep = sorted((a, b, c) for (a, b), c in shared.items()
                  if c >= min_shared)
    out = pa.table({
        "a": pa.array([k[0] for k in keep], pa.int64()),
        "b": pa.array([k[1] for k in keep], pa.int64()),
        "shared": pa.array([k[2] for k in keep], pa.int64()),
    })
    return _write(out, path)


IMAGE_DEDUP_ORACLE_PATH = os.path.join(FIXTURE_DIR,
                                       "image_dedup_oracle.parquet")


def image_dedup_oracle_sidecar(sf_dir: str, max_hamming: int = 3,
                               path: str = IMAGE_DEDUP_ORACLE_PATH) -> str:
    """Sequential replay of the full image dedup: brute-force pairs at
    the same radius (reusing the phash pair sidecar math), union-find the
    clusters, keep min id per cluster — the survivor set the distributed
    pairs -> connected-components -> drop pipeline must reproduce."""
    import pyarrow.parquet as _pq

    phash_oracle_sidecar(sf_dir, max_hamming=max_hamming)
    pairs = _pq.read_table(PHASH_ORACLE_PATH)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs.column("a").to_pylist(),
                    pairs.column("b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id"])
    ids = sorted(t.column("doc_id").to_pylist())
    keep = [i for i in ids if find(i) == i]
    out = pa.table({"media_id": pa.array(keep, pa.int64())})
    return _write(out, path)


BIGRAM_LM_ORACLE_PATH = os.path.join(FIXTURE_DIR,
                                     "bigram_lm_oracle.parquet")


def bigram_lm_oracle_sidecar(sf_dir: str, vocab_size: int = 500,
                             min_count: int = 1, discount: float = 0.75,
                             path: str = BIGRAM_LM_ORACLE_PATH) -> str:
    """Sequential bigram-KN replay (oracle side of the CCNet-style
    perplexity filter): independent pure-Python word + bigram recount
    over the doc_id-ordered corpus feeding the SAME kn_bigram_model and
    scoring kernels — bit-equal to the distributed train+score for any
    partitioning by exact integer counts and shared float order."""
    import pyarrow.parquet as _pq

    from .functions.train import bigram_lm_sequential

    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    t = t.sort_by("doc_id")
    ids, nll = bigram_lm_sequential(t, vocab_size=vocab_size,
                                    min_count=min_count,
                                    discount=discount)
    out = pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64)),
        "nll": pa.array(nll),
    })
    return _write(out, path)
