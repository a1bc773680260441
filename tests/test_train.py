"""Distributed training ops (functions/train.py): partitioning-invariance
(the fixed-point accumulation contract), learning sanity, and the classic
planted BPE example."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gobblin_ray.functions import train as tr


def _emb_ds(n=200, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    w_true = rng.standard_normal(dim)
    x = rng.standard_normal((n, dim))
    y = (x @ w_true > 0).astype(np.float64)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
        "y": pa.array(y),
    })
    return t, y


def test_logreg_partition_invariant_and_learns(ray_session):
    t, y = _emb_ds()
    w7, b7, losses = tr.logreg_train(
        rd.from_arrow(t).repartition(7), iters=20, lr=1.5
    )
    w2, b2, _ = tr.logreg_train(
        rd.from_arrow(t).repartition(2), iters=20, lr=1.5
    )
    # bit-identical across partitionings (exact integer gradient sums)
    assert w7.tobytes() == w2.tobytes() and b7 == b2
    # learns: monotone-ish loss decrease and better-than-chance accuracy
    assert losses[-1] < losses[0]
    emb = t.column("embedding").combine_chunks()
    mat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = mat.reshape(t.num_rows, 8)
    acc = float(((tr._det_matvec(mat, w7) + b7 > 0) == (y > 0.5)).mean())
    assert acc > 0.8


def test_logreg_matches_sequential_replay(ray_session):
    t, y = _emb_ds(n=150, dim=5, seed=11)
    wd, bd, _ = tr.logreg_train(
        rd.from_arrow(t).repartition(4), iters=5, lr=0.5
    )
    emb = t.column("embedding").combine_chunks()
    mat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = mat.reshape(150, 5)
    ws, bs = tr.logreg_train_sequential(mat, y, iters=5, lr=0.5)
    assert wd.tobytes() == ws.tobytes() and bd == bs


def test_pca_recovers_dominant_direction(ray_session):
    rng = np.random.default_rng(7)
    d = 6
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    x = (rng.standard_normal((400, 1)) * 2.0) @ direction[None, :]
    x += rng.standard_normal((400, d)) * 0.05
    t = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
    })
    mean, comps = tr.pca_fit(rd.from_arrow(t).repartition(5), k=2)
    assert abs(float(comps[0] @ direction)) > 0.99
    # sign canonicalization: the largest-|v| element is positive
    for i in range(2):
        assert comps[i][int(np.argmax(np.abs(comps[i])))] > 0
    # partitioning invariance of the fit (exact integer moments)
    mean3, comps3 = tr.pca_fit(rd.from_arrow(t).repartition(3), k=2)
    assert mean.tobytes() == mean3.tobytes()
    assert comps.tobytes() == comps3.tobytes()
    # projection round-trips the variance ordering: pc1 var >= pc2 var
    proj = tr.pca_project(
        rd.from_arrow(t), mean, comps
    ).to_pandas()
    assert proj["pc1"].var() >= proj["pc2"].var()
    assert len(proj) == 400


def test_bpe_planted_merges(ray_session):
    # Sennrich et al. 2016's worked example: with </w> end markers over
    # {low x5, lower x2, newest x6, widest x3} the top pair is
    # ('e','s') (count 9), then ('es','t') (9), then ('est','</w>') (9)
    # — ties broken lexicographically — then ('l','o') (7), ('lo','w') (7).
    docs = ["low low low low low", "lower lower widest widest widest",
            "newest newest newest newest newest newest"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    got = tr.bpe_train(ds, n_merges=5).to_pylist()
    pairs = [(m["left"], m["right"]) for m in got]
    assert pairs == [("e", "s"), ("es", "t"), ("est", "</w>"),
                     ("l", "o"), ("lo", "w")]
    assert [m["pair_count"] for m in got] == [9, 9, 9, 7, 7]
    # partitioning invariance: counts are exact integers either way
    got2 = tr.bpe_train(ds.repartition(3), n_merges=5).to_pylist()
    assert got2 == got


def test_bpe_min_count_and_max_vocab_bound_the_dictionary(ray_session):
    docs = ["aa aa aa bb bb cc"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    # min_count=2 drops the singleton 'cc'; its chars never merge
    got = tr.bpe_train(ds, n_merges=2, min_count=2).to_pylist()
    syms = {m["left"] for m in got} | {m["right"] for m in got}
    assert "c" not in syms
    # max_vocab=1 keeps only the most frequent word ('aa', count 3):
    # pairs (a,a) and (a,</w>) tie at 3, lexicographic tie-break picks
    # (a,</w>) since '<' sorts below 'a'
    got1 = tr.bpe_train(ds, n_merges=1, max_vocab=1).to_pylist()
    assert (got1[0]["left"], got1[0]["right"]) == ("a", "</w>")
    assert got1[0]["pair_count"] == 3


def test_tree_combined_partials_match_direct(ray_session):
    """combine_blocks (the 10^5+-block scale path) is exact: tree-reduced
    integer partials give bit-identical fits to the direct driver sum."""
    t, _y = _emb_ds(n=180, dim=6, seed=21)
    ds = rd.from_arrow(t).repartition(9)
    w_direct, b_direct, _ = tr.logreg_train(ds, iters=4, lr=0.7)
    w_tree, b_tree, _ = tr.logreg_train(
        ds, iters=4, lr=0.7, combine_blocks=3
    )
    assert w_direct.tobytes() == w_tree.tobytes() and b_direct == b_tree

    t2 = t.select(["vec_id", "embedding"])
    mean_d, comps_d = tr.pca_fit(rd.from_arrow(t2).repartition(9), k=2)
    mean_t, comps_t = tr.pca_fit(
        rd.from_arrow(t2).repartition(9), k=2, combine_blocks=3
    )
    assert mean_d.tobytes() == mean_t.tobytes()
    assert comps_d.tobytes() == comps_t.tobytes()


def test_bpe_apply_counts(ray_session):
    """Train-then-encode: with the classic planted merges, 'low' encodes
    to 2 tokens (low + </w>) and 'newest' to 4 (n e w est</w>); totals
    roll up per group and the word cache returns stable counts."""
    docs = ["low low low low low", "lower lower widest widest widest",
            "newest newest newest newest newest newest"]
    ds = rd.from_arrow(pa.table({
        "lang": pa.array(["a", "b", "a"], pa.string()),
        "text": pa.array(docs, pa.string()),
    }))
    merges = tr.bpe_train(ds, n_merges=5)
    ranks = {(m["left"], m["right"]): m["rank"]
             for m in merges.to_pylist()}
    assert tr.bpe_encode_word("low", ranks) == ["low", "</w>"]
    assert tr.bpe_encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    out = {r["text"]: r["n_bpe_tokens"]
           for r in tr.bpe_apply(ds, merges).take_all()}
    assert out[docs[0]] == 5 * 2          # five 'low' at 2 tokens
    assert out[docs[2]] == 6 * 4          # six 'newest' at 4 tokens
    # 'lower' = low e r </w> (4), 'widest' = w i d est</w> (4)
    assert out[docs[1]] == 2 * 4 + 3 * 4


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(1, 9), min_size=1, max_size=12,
    ),
    st.integers(0, 10),
)
def test_bpe_merge_accounting_property(counts, n_merges):
    """Greedy encode replays the merge history on training words, so
    total tokens after training == initial symbols − Σ pair_counts — EXACT
    when no merge pair is self-overlapping (left != right; canonical
    Sennrich counting counts overlapping occurrences of (X,X) in runs like
    'xxx' but the merge pass consumes them pairwise, so those merges
    collapse FEWER boundaries than their recorded count). Also: ranks are
    contiguous and every recorded pair_count is positive."""
    merges = tr.bpe_merge_loop(counts, n_merges)
    ranks = {(left, right): rank for rank, left, right, _c in merges}
    initial = sum(c * (len(w) + 1) for w, c in counts.items())
    encoded = sum(
        c * len(tr.bpe_encode_word(w, ranks)) for w, c in counts.items()
    )
    if all(m[1] != m[2] for m in merges):
        assert encoded == initial - sum(m[3] for m in merges)
    else:  # self-overlapping pairs merge at most their recorded count
        assert initial - sum(m[3] for m in merges) <= encoded < initial
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert all(m[3] > 0 for m in merges)


def test_unigram_em_planted(ray_session):
    """Unigram EM promotes whole frequent words to pieces while keeping
    single-char coverage; the distributed fit is partitioning-invariant
    and segmentations under the learned probs are valid covers."""
    docs = ["low low low low low", "lower lower widest widest widest",
            "newest newest newest newest newest newest"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    out = tr.unigram_train(ds, vocab_size=30, seed_size=60, iters=3)
    pieces = {r["piece"]: r["prob"] for r in out.to_pylist()}
    assert "low" in pieces and "newest" in pieces
    assert all(c in pieces for c in "lowerniedst")  # char coverage
    probs = [r["prob"] for r in out.to_pylist()]
    assert probs == sorted(probs, reverse=True)
    out2 = tr.unigram_train(ds.repartition(3), vocab_size=30,
                            seed_size=60, iters=3)
    assert out.to_pylist() == out2.to_pylist()
    # a Viterbi segmentation under the learned probs covers the word
    import numpy as np

    logp = {p: float(np.log(q)) for p, q in pieces.items()}
    seg = tr._viterbi_segment("lowest", logp, max_piece=6)
    assert "".join(seg) == "lowest"


def test_cooc_embed_semantics_and_invariance(ray_session):
    """Words that share contexts land closer in the trained space, and
    the distributed co-occurrence counts are partitioning-invariant."""
    docs = ["cat chases mouse", "dog chases mouse", "cat chases bird",
            "dog chases bird", "stock market falls", "stock market rises"] * 5
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    out = tr.cooc_embed_train(ds, vocab_size=20, window=2, dim=8,
                              iters=80).to_pylist()
    emb = {r["word"]: np.array([float(x) for x in r["embedding"].split(",")])
           for r in out}
    cos = lambda a, b: float(  # noqa: E731
        a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    )
    # cat/dog share every context; cat/market share none
    assert cos(emb["cat"], emb["dog"]) > cos(emb["cat"], emb["market"])
    out2 = tr.cooc_embed_train(ds.repartition(5), vocab_size=20, window=2,
                               dim=8, iters=80).to_pylist()
    assert out == out2


def test_dsir_weights_partition_invariant(ray_session):
    """DSIR weights are bit-equal for any input partitioning, match the
    sequential replay, and rank target-looking docs above off-target
    docs."""
    import ray.data as rd

    import pyarrow as pa
    import pyarrow.compute as pc

    from gobblin_ray.functions import train as tr

    en = ["the cat sat on the mat and the dog slept near the door",
          "it is a long road to the sea and the wind is cold",
          "the teacher said it is good to read a book"]
    es = ["el gato come pescado y el perro duerme en la casa",
          "la comida es buena y el vino es famoso en la region"]
    texts = (en * 5) + (es * 5)
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "is_target": pa.array([True] * 15 + [False] * 10),
    })
    want_ids, want_w = tr.dsir_weights_sequential(t)
    got = {}
    for parts in (1, 3, 7):
        out = tr.dsir_weights(
            rd.from_arrow(t).repartition(parts), concurrency=2
        ).take_all()
        got = {r["doc_id"]: r["dsir_logw"] for r in out}
        assert len(got) == len(texts)
        for i, d in enumerate(want_ids):
            assert got[int(d)] == want_w[i]  # bit-equal, not approx
    # every English doc outranks every Spanish doc
    en_w = [got[i] for i in range(15)]
    es_w = [got[i] for i in range(15, 25)]
    assert min(en_w) > max(es_w)


def test_dsir_empty_text_block_keeps_float_schema(ray_session):
    """Regression: a block whose docs produce zero hashed ngrams must
    still emit float64 dsir_logw (empty-weights bincount returns int64)."""
    import ray.data as rd

    import pyarrow as pa

    from gobblin_ray.functions import train as tr

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["", "", "the cat", None]),
        "is_target": pa.array([False, False, True, False]),
    })
    out = tr.dsir_weights(
        rd.from_arrow(t).repartition(4), concurrency=2
    )
    tbl = pa.Table.from_pandas(out.to_pandas())
    assert tbl.column("dsir_logw").type == pa.float64()
    assert tbl.num_rows == 4


def test_dsir_select_keep_frac(ray_session):
    """dsir_select keeps the most-target-like fraction with all input
    columns + dsir_logw, thresholding at the exact (1-frac) quantile
    (ties kept)."""
    import ray.data as rd

    import pyarrow as pa

    from gobblin_ray.functions import train as tr

    en = ["the cat sat on the mat and the dog slept by the door",
          "it is a long road to the sea and the wind is cold"]
    es = ["el gato come pescado y el perro duerme en la casa",
          "la comida es buena y el vino es famoso en la region"]
    texts = (en * 10) + (es * 10)
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "extra": pa.array(["x"] * len(texts)),
        "is_target": pa.array([True] * 20 + [False] * 20),
    })
    out = tr.dsir_select(
        rd.from_arrow(t).repartition(4).materialize(),
        keep_frac=0.5, concurrency=2,
    )
    rows = out.take_all()
    kept_ids = sorted(r["doc_id"] for r in rows)
    assert kept_ids == list(range(20))  # exactly the English half
    assert all("extra" in r and "dsir_logw" in r for r in rows)
    # keep_frac=1.0 keeps everything, scored
    all_rows = tr.dsir_select(
        rd.from_arrow(t).repartition(3).materialize(),
        keep_frac=1.0, concurrency=2,
    ).take_all()
    assert len(all_rows) == len(texts)


def test_bigram_lm_perplexity_partition_invariant(ray_session):
    """Distributed bigram-KN train+score == the sequential replay
    bit-for-bit, for any partitioning (exact integer counts + shared
    fixed-order scoring kernels)."""
    import ray.data as rd

    import pyarrow as pa

    from gobblin_ray.functions import train as tr

    texts = (["the cat sat on the mat and the dog slept",
              "the cat sat on the hat and the dog ran",
              "el gato come pescado en la casa grande",
              ""] * 6) + ["zz qq xx vv strange rare tokens here"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    want_ids, want_nll = tr.bigram_lm_sequential(t, vocab_size=30)
    want = dict(zip(want_ids.tolist(), want_nll.tolist()))
    for parts in (2, 5):
        ds = rd.from_arrow(t).repartition(parts).materialize()
        model, word_ids = tr.bigram_lm_train(ds, vocab_size=30)
        got = {r["doc_id"]: r["nll"]
               for r in tr.perplexity_score(ds, model, word_ids,
                                            concurrency=2).take_all()}
        assert got == want  # bit-equal
    # corpus-typical docs score below the singleton rare-token doc
    rare = len(texts) - 1
    assert want[0] < want[rare] and want[1] < want[rare]


def test_bigram_lm_pruned_to_empty_model_scores_floor(ray_session):
    """Regression: a min_count that prunes EVERY realized bigram must
    leave a scorable model (pure continuation fallback -> the 1e-12
    floor), not crash the scoring actor on an empty keys array."""
    import ray.data as rd

    import pyarrow as pa

    from gobblin_ray.functions import train as tr

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b c", "d e f"])})
    ds = rd.from_arrow(t).materialize()
    model, word_ids = tr.bigram_lm_train(ds, vocab_size=10, min_count=99)
    assert len(model["keys"]) == 0
    out = tr.perplexity_score(ds, model, word_ids,
                              concurrency=2).take_all()
    assert len(out) == 2
    floor = -np.log(1e-12)
    for r in out:
        assert abs(r["nll"] - round(floor, 6)) < 1e-6


def test_perplexity_select_keep_frac(ray_session):
    """perplexity_select keeps the round(frac*n) most fluent (lowest
    nll) rows with all input columns + nll."""
    import ray.data as rd

    import pyarrow as pa

    from gobblin_ray.functions import train as tr

    fluent = ["the cat sat on the mat and the dog slept",
              "the cat sat on the hat and the dog ran"]
    texts = (fluent * 10) + [f"rare{i} odd{i} tok{i} xx{i}" for i in range(10)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "extra": pa.array(["x"] * len(texts)),
    })
    ds = rd.from_arrow(t).repartition(3).materialize()
    model, word_ids = tr.bigram_lm_train(ds, vocab_size=40)
    out = tr.perplexity_select(ds, 2 / 3, model, word_ids,
                               concurrency=2).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == list(range(20))  # exactly the fluent repeated docs
    assert all("extra" in r and "nll" in r for r in out)
