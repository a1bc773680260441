"""Unit tests for the converter / quality / fork / partition stage library
(pure batch functions — Ray-free except the partitioned-write checks)."""

import numpy as np
import pyarrow as pa
import pytest

from gobblin_ray.stages import converters as cv
from gobblin_ray.stages.fork import route_column
from gobblin_ray.stages.partition import time_partition
from gobblin_ray.stages.quality import (
    PolicyAction,
    PolicyChecker,
    RowCountPolicy,
    min_timestamp,
    non_empty_string,
    not_null,
    value_in,
)


def t_events():
    return pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "kind": ["a", "b", "a", None],
            "val": pa.array([1.0, 55.5, 20.0, 70.0]),
            "ts": pa.array(
                np.array(["2024-01-01", "2024-01-02", "2024-01-02", "2024-02-01"],
                         "datetime64[us]")
            ),
            "props": ['{"k": 1}', '{"k": 22}', "{}", None],
        }
    )


def test_project_and_drop():
    assert cv.project(["id", "val"])(t_events()).column_names == ["id", "val"]
    assert "kind" not in cv.drop_fields(["kind"])(t_events()).column_names


def test_rename():
    out = cv.rename({"val": "value"})(t_events())
    assert "value" in out.column_names and "val" not in out.column_names


def test_filter_equals_and_regex():
    assert cv.filter_equals("kind", "a")(t_events()).num_rows == 2
    assert cv.regex_filter("kind", "^a$")(t_events()).num_rows == 2
    assert cv.regex_filter("kind", "^a$", keep_matching=False)(t_events()).num_rows == 1


def test_chain_composes_in_order():
    fn = cv.chain(cv.filter_equals("kind", "a"), cv.project(["id"]))
    out = fn(t_events())
    assert out.column_names == ["id"] and out.num_rows == 2


def test_cast_lower_upper_concat():
    t = pa.table({"s": ["Ab", "cD"], "n": [1, 2]})
    assert cv.lower("s")(t).column("s").to_pylist() == ["ab", "cd"]
    assert cv.upper("s", out="S")(t).column("S").to_pylist() == ["AB", "CD"]
    assert cv.cast_column("n", pa.float64())(t).column("n").type == pa.float64()
    out = cv.concat_fields("joined", ["s", "n"], sep="-")(t)
    assert out.column("joined").to_pylist() == ["Ab-1", "cD-2"]


def test_parse_json_regex_and_class():
    out = cv.parse_json_regex("props", "k", out="k", typ=pa.int64())(t_events())
    assert out.column("k").to_pylist() == [1, 22, None, None]
    out2 = cv.ParseJson("props", {"k": pa.int64()})(t_events())
    assert out2.column("k").to_pylist() == [1, 22, None, None]


def test_split_to_rows_explodes():
    t = pa.table({"id": [1, 2], "text": ["a b c", "x"]})
    out = cv.split_to_rows("text", " ", out="tok")(t)
    assert out.column("tok").to_pylist() == ["a", "b", "c", "x"]
    assert out.column("id").to_pylist() == [1, 1, 1, 2]


def test_flatten_struct():
    t = pa.table({"s": pa.array([{"x": 1, "y": "a"}, {"x": 2, "y": "b"}])})
    out = cv.flatten_struct("s")(t)
    assert out.column("x").to_pylist() == [1, 2]
    assert out.column("y").to_pylist() == ["a", "b"]


def test_sample_mod_deterministic():
    t = pa.table({"id": pa.array(range(1000), pa.int64())})
    out = cv.sample_mod("id", 100, 5)(t)
    assert out.num_rows == 50
    assert cv.sample_mod("id", 100, 5)(t).equals(out)


def test_sample_hash_stable_and_ratioish():
    t = pa.table({"u": [f"url{i}" for i in range(2000)]})
    a = cv.sample_hash("u", 0.25)(t)
    b = cv.sample_hash("u", 0.25)(t)
    assert a.equals(b)
    assert 0.15 < a.num_rows / 2000 < 0.35


def test_policy_checker_err_file_and_split():
    checker = PolicyChecker([not_null("kind"), value_in("kind", ["a", "b"])])
    out = checker(t_events())
    good, bad = PolicyChecker.split(out)
    assert good.num_rows == 3
    assert bad.column(PolicyChecker.ERR_COL).to_pylist() == ["not_null[kind]"]


def test_policy_fail_action_raises():
    checker = PolicyChecker([not_null("kind", action=PolicyAction.FAIL)])
    with pytest.raises(ValueError):
        checker(t_events())


def test_min_timestamp_policy():
    checker = PolicyChecker([min_timestamp("ts", np.datetime64("2024-01-02", "us"))])
    good, bad = PolicyChecker.split(checker(t_events()))
    assert good.num_rows == 3 and bad.num_rows == 1


def test_non_empty_string_policy():
    t = pa.table({"s": ["x", "", None]})
    good, bad = PolicyChecker.split(PolicyChecker([non_empty_string("s")])(t))
    assert good.num_rows == 1 and bad.num_rows == 2


def test_row_count_policy():
    assert RowCountPolicy(100).check(100)
    assert not RowCountPolicy(100).check(99)
    assert RowCountPolicy(100, tolerance=0.05).check(96)
    with pytest.raises(AssertionError):
        RowCountPolicy(100).assert_ok(99)


def test_route_column_first_match_wins():
    import pyarrow.compute as pc

    fn = route_column(
        {
            "b_kind": lambda t: pc.equal(t.column("kind"), pa.scalar("b")),
            "high": lambda t: pc.greater(t.column("val"), pa.scalar(10.0)),
        }
    )
    out = fn(t_events())
    assert out.column("branch").to_pylist() == ["rest", "b_kind", "high", "high"]


def test_multicast_duplicates_rows_per_matching_branch():
    import pyarrow.compute as pc

    from gobblin_ray.stages.fork import multicast_column

    fn = multicast_column(
        {
            "b_kind": lambda t: pc.equal(t.column("kind"), pa.scalar("b")),
            "high": lambda t: pc.greater(t.column("val"), pa.scalar(10.0)),
        },
        default="rest",
    )
    out = fn(t_events())
    got = sorted(zip(out.column("val").to_pylist(), out.column("branch").to_pylist()))
    # row val=20 is kind=b AND >10 -> goes to BOTH branches (duplicating
    # fork, unlike route_column's first-match-wins)
    vals = t_events().column("val").to_pylist()
    kinds = t_events().column("kind").to_pylist()
    expect = []
    for v, k in zip(vals, kinds):
        m = []
        if k == "b":
            m.append("b_kind")
        if v > 10.0:
            m.append("high")
        expect.extend((v, b) for b in (m or ["rest"]))
    assert got == sorted(expect)
    # drop-when-no-default: non-matching rows vanish
    fn2 = multicast_column(
        {"b_kind": lambda t: pc.equal(t.column("kind"), pa.scalar("b"))},
        default=None,
    )
    out2 = fn2(t_events())
    assert set(out2.column("kind").to_pylist()) == {"b"}


def test_time_partition_granularities():
    t = t_events()
    assert time_partition("ts", "day")(t).column("date_part").to_pylist() == [
        "2024-01-01", "2024-01-02", "2024-01-02", "2024-02-01",
    ]
    assert time_partition("ts", "month")(t).column("date_part").to_pylist()[0] == "2024-01"


def test_fork_and_partitioned_write(ray_session, tmp_path):
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    from gobblin_ray.stages.fork import fork, fork_partitioned_write

    ds = rd.from_arrow(t_events())
    branches = {
        "a_kind": lambda t: pc.equal(t.column("kind"), pa.scalar("a")),
    }
    views = fork(ds, branches)
    assert views["a_kind"].count() == 2

    out = str(tmp_path / "forked")
    fork_partitioned_write(ds, branches, out)
    assert sorted(os.listdir(out)) == ["branch=a_kind", "branch=rest"]


def test_write_time_partitioned(ray_session, tmp_path):
    import os

    import ray.data as rd

    from gobblin_ray.stages.partition import write_time_partitioned

    out = str(tmp_path / "by_day")
    write_time_partitioned(rd.from_arrow(t_events()), out, "ts", "day")
    assert len([d for d in os.listdir(out) if d.startswith("date_part=")]) == 3


# ---------------------------------------------------------------- §2.11 surface

def test_grok_expand_and_parse():
    from gobblin_ray.stages import converters as cv
    import pyarrow as pa

    regex, names = cv.grok_expand("%{WORD:lvl} took %{NUMBER:ms}ms")
    assert names == ["lvl", "ms"]
    fn = cv.grok_parse("line", "%{LOGLEVEL:lvl} req took %{NUMBER:ms}ms",
                       types={"ms": pa.float64()})
    t = fn(pa.table({"line": ["INFO req took 12.5ms", "garbage"]}))
    assert t.column("lvl").to_pylist() == ["INFO", None]
    assert t.column("ms").to_pylist() == [12.5, None]


def test_alias_registry_rejects_unknown_and_dup():
    import pytest as _pytest

    from gobblin_ray.pipeline import AliasRegistry

    reg = AliasRegistry()
    reg.register("x", lambda: None)
    with _pytest.raises(ValueError):
        reg.register("x", lambda: None)
    with _pytest.raises(KeyError):
        reg.resolve("nope")


def test_embedded_pipeline_fluent_matches_config(ray_session):
    """Fluent builder and raw config produce identical results; actor stages
    slot into the chain (Fingerprinter via alias)."""
    import pandas as pd

    from gobblin_ray.pipeline import EmbeddedPipeline, Pipeline

    sf = "/root/testdata/sf0.001"
    fluent = (
        EmbeddedPipeline("documents", columns=["doc_id", "text"])
        .actor("Fingerprinter", concurrency=2, batch_size=1024,
               text_col="text", out="fp", normalize=True)
        .transform("project", ["doc_id", "fp"])
        .limit(5)
    )
    got = fluent.run(sf).to_pandas()
    again = Pipeline.from_config(fluent.to_config()).run(sf).to_pandas()
    assert got.shape == (5, 2) and list(got.columns) == ["doc_id", "fp"]
    pd.testing.assert_frame_equal(got, again)


def test_top_k_matches_global_sort(ray_session):
    import ray.data as rd
    import numpy as np
    import pyarrow as pa

    from gobblin_ray.stages.sorts import top_k

    rng = np.random.default_rng(3)
    t = pa.table({"k": pa.array(rng.permutation(5000)),
                  "v": pa.array(rng.standard_normal(5000))})
    ds = rd.from_arrow(t).repartition(8)
    got = top_k(ds, 7, ["v", "k"], [True, False]).to_pandas()
    want = t.to_pandas().sort_values(["v", "k"], ascending=[False, True]).head(7)
    assert list(got["k"]) == list(want["k"])


def test_partitioned_parquet_sink_idempotent(ray_session, tmp_path):
    """Actor-pool sink: partition-dir layout, lineage accounting, and
    content-fingerprint names (a re-run writes the SAME files — retry-safe)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.sink import PartitionedParquetSink

    out = str(tmp_path / "sinkout")
    t = pa.table({"k": pa.array(["a", "a", "b", "b", "b"]),
                  "v": pa.array([1, 2, 3, 4, 5], pa.int64())})

    def write():
        return (
            rd.from_arrow(t)
            .map_batches(
                PartitionedParquetSink,
                fn_constructor_kwargs=dict(out_dir=out, partition_col="k"),
                batch_format="pyarrow",
                batch_size=None,
                concurrency=1,
            )
            .to_pandas()
        )

    l1 = write()
    files1 = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs
    )
    l2 = write()  # simulated retry / replay
    files2 = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs
    )
    assert files1 == files2 and len(files1) == 2  # k=a, k=b — no dup files
    assert sorted(l1["partition"]) == ["k=a", "k=b"]
    assert int(l1["rows"].sum()) == 5
    import pyarrow.parquet as pq

    back = pa.concat_tables([pq.read_table(f) for f in files1])
    assert back.num_rows == 5


def test_sized_sink_rolls_by_bytes_and_flushes_remainder(ray_session, tmp_path):
    """Datasink path: many input blocks merge into few size-targeted files
    per partition (no one-file-per-batch storm), the remainder below the
    byte target still flushes, and lineage matches the read-back."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from gobblin_ray.stages.sink import write_partitioned

    out = str(tmp_path / "sized")
    n = 10_000
    t = pa.table({
        "k": pa.array(["a" if i % 2 else "b" for i in range(n)]),
        "v": pa.array(range(n), pa.int64()),
    })
    # 50 tiny blocks; a huge byte target => exactly one file per partition
    # per write task (here: 1 task), remainder-flushed at stream end.
    ds = rd.from_arrow(t).repartition(50)
    lineage = write_partitioned(
        ds, out, partition_col="k", target_file_bytes=1 << 40
    )
    files = sorted(os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs)
    assert len(files) <= 4  # not 100 (50 blocks x 2 partitions)
    assert sum(r["rows"] for r in lineage) == n
    back = pa.concat_tables([pq.read_table(f) for f in files])
    assert back.num_rows == n
    # tiny byte target => rolling kicks in, more files, same rows
    out2 = str(tmp_path / "sized2")
    lineage2 = write_partitioned(
        rd.from_arrow(t).repartition(50), out2, partition_col="k",
        target_file_bytes=4096,
    )
    files2 = sorted(os.path.join(r, f) for r, _, fs in os.walk(out2) for f in fs)
    assert len(files2) > len(files)
    assert sum(r["rows"] for r in lineage2) == n


def test_read_date_partitioned_prunes(ray_session, tmp_path):
    """Lexicographic date-partition watermark pruning: partitions at or
    below the previous high watermark never enter the listing."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gobblin_ray.sources.readers import read_date_partitioned

    root = str(tmp_path / "datelake")
    for d, vals in (("2024-01-01", [1, 2]), ("2024-01-02", [3]),
                    ("2024-01-03", [4, 5, 6])):
        os.makedirs(f"{root}/date={d}")
        pq.write_table(pa.table({"v": pa.array(vals, pa.int64())}),
                       f"{root}/date={d}/part-0.parquet")

    ds, parts = read_date_partitioned(root, low="2024-01-01")
    assert parts == ["2024-01-02", "2024-01-03"]
    assert sorted(r["v"] for r in ds.take_all()) == [3, 4, 5, 6]
    ds2, parts2 = read_date_partitioned(root, low="2024-01-01", high="2024-01-02")
    assert parts2 == ["2024-01-02"] and ds2.count() == 1
    none_ds, none_parts = read_date_partitioned(root, low="2024-01-03")
    assert none_ds is None and none_parts == []


# ---------------------------------------------------------------- limiters

def test_rate_limiter_paces_batches():
    import time as _t

    from gobblin_ray.stages.limiter import RateLimiter

    lim = RateLimiter(rows_per_sec=1000)
    batch = pa.table({"x": pa.array(range(100))})
    t0 = _t.monotonic()
    for _ in range(5):  # 500 rows at 1000 rows/s -> >= ~0.4 s
        out = lim(batch)
        assert out.num_rows == 100
    elapsed = _t.monotonic() - t0
    assert elapsed >= 0.35


def test_count_limiter_truncates_and_stops():
    from gobblin_ray.stages.limiter import CountLimiter

    lim = CountLimiter(max_rows=250)
    batch = pa.table({"x": pa.array(range(100))})
    sizes = [lim(batch).num_rows for _ in range(4)]
    assert sizes == [100, 100, 50, 0]


def test_time_limiter_deadline():
    import time as _t

    from gobblin_ray.stages.limiter import TimeLimiter

    lim = TimeLimiter(max_seconds=0.2)
    batch = pa.table({"x": pa.array(range(10))})
    assert lim(batch).num_rows == 10
    _t.sleep(0.25)
    assert lim(batch).num_rows == 0


def test_crypto_roundtrip_and_tamper():
    from gobblin_ray.stages.crypto import (
        DecryptColumn,
        EncryptColumn,
        _KeystreamCodec,
    )

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello", None, "unicode ✓ text"]),
    })
    enc = EncryptColumn("text", passphrase="k1")(t)
    assert pa.types.is_binary(enc.schema.field("text").type)
    cts = enc.column("text").to_pylist()
    assert cts[1] is None and cts[0] != b"hello"
    dec = DecryptColumn("text", passphrase="k1")(enc)
    assert dec.column("text").to_pylist() == ["hello", None, "unicode ✓ text"]
    # wrong key must fail loudly, not return garbage
    with pytest.raises(Exception):
        DecryptColumn("text", passphrase="WRONG")(enc)
    # fallback codec: deterministic roundtrip + HMAC tamper detection
    ks = _KeystreamCodec(b"key")
    blob = ks.encrypt(b"payload bytes")
    assert ks.decrypt(blob) == b"payload bytes"
    bad = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(ValueError):
        ks.decrypt(bad)


def test_config_store_hierarchy_imports_and_cycles(ray_session):
    """gobblin-config-management analog: global -> table -> bucket
    inheritance with deep-merge, cross-tree imports, cycle detection, and
    an effective Pipeline assembled from the resolved node."""
    import pytest as _pytest

    from gobblin_ray.pipeline import ConfigStore

    store = ConfigStore()
    store.put("/", {"limit": 10, "source": {"columns": None}})
    store.put("/shared/proj", {
        "transforms": [{"op": "project", "args": [["doc_id", "text"]]}],
    })
    store.put("/tables/documents", {
        "__imports__": ["/shared/proj"],
        "source": {"table": "documents", "columns": ["doc_id", "text", "lang"]},
    })
    store.put("/tables/documents/sample", {"limit": 3})

    eff = store.resolve("/tables/documents")
    # import supplied the transform chain; own keys overrode source; the
    # global limit survived
    assert eff["source"] == {
        "table": "documents", "columns": ["doc_id", "text", "lang"]
    }
    assert eff["transforms"][0]["op"] == "project"
    assert eff["limit"] == 10
    # child inherits everything and overrides only the limit
    leaf = store.resolve("/tables/documents/sample")
    assert leaf["limit"] == 3 and leaf["source"]["table"] == "documents"
    # unknown path == pure inheritance from ancestors
    assert store.resolve("/tables/documents/other")["limit"] == 10
    # round-trips through JSON
    clone = ConfigStore.from_json(store.to_json())
    assert clone.resolve("/tables/documents/sample") == leaf
    # import cycles raise instead of recursing forever
    bad = ConfigStore()
    bad.put("/a", {"__imports__": ["/b"]})
    bad.put("/b", {"__imports__": ["/a"]})
    with _pytest.raises(ValueError):
        bad.resolve("/a")
    # the resolved node assembles and runs as a Pipeline
    out = store.pipeline("/tables/documents/sample").run(
        "/root/testdata/sf0.001"
    ).to_pandas()
    assert out.shape == (3, 2) and list(out.columns) == ["doc_id", "text"]


def test_compress_decompress_all_codecs():
    from gobblin_ray.stages.converters import compress_column, decompress_column

    t = pa.table({"text": ["hello world", None, "x" * 4096, ""]})
    for codec in ["gzip", "zstd", "lz4", "snappy"]:
        c = compress_column("text", codec)(t)
        assert pa.types.is_binary(c.schema.field("text").type)
        vals = c.column("text").to_pylist()
        assert vals[1] is None and vals[0] != b"hello world"
        d = decompress_column("text", codec)(c)
        assert d.column("text").to_pylist() == t.column("text").to_pylist()
    # separate out column + binary output mode
    c2 = compress_column("text", "zstd", out="blob")(t)
    d2 = decompress_column("blob", "zstd", out="raw", as_string=False)(c2)
    assert d2.column("raw").to_pylist()[0] == b"hello world"


def test_orc_sink_and_source_roundtrip(ray_session, tmp_path):
    """gobblin-orc analog: write partitioned ORC through the sized sink,
    read it back with the per-file ORC read tasks."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.sources.readers import read_orc_source
    from gobblin_ray.stages.sink import write_partitioned

    out = str(tmp_path / "orc_out")
    t = pa.table({
        "k": pa.array(["a", "b"] * 500),
        "v": pa.array(range(1000), pa.int64()),
    })
    lineage = write_partitioned(
        rd.from_arrow(t), out, partition_col="k", file_format="orc"
    )
    assert sum(r["rows"] for r in lineage) == 1000
    files = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs
    )
    assert files and all(f.endswith(".orc") for f in files)
    back = read_orc_source(files)
    assert back.count() == 1000
    # column pruning pushes into the ORC reader
    pruned = read_orc_source(files, columns=["v"]).take_all()
    assert set(pruned[0].keys()) == {"v"}
    assert sum(r["v"] for r in pruned) == sum(range(1000))


def test_range_join_matches_naive(ray_session):
    """Bucketed interval join == naive O(n*m) containment join, including
    intervals spanning several coarse buckets, points on bucket edges, and
    overlapping intervals (a point can match several)."""
    import ray.data as rd

    from gobblin_ray.stages.joins import range_join

    pts = pa.table({
        "pid": pa.array(range(8), pa.int64()),
        "v": pa.array([0.0, 5.0, 10.0, 15.0, 25.0, 24.999, 50.0, -3.0]),
    })
    ivs = pa.table({
        "iid": pa.array([0, 1, 2, 3], pa.int64()),
        "lo": pa.array([0.0, 10.0, 0.0, -5.0]),
        "hi": pa.array([10.0, 25.0, 100.0, 0.0]),  # 2 spans many buckets
    })
    got = range_join(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        value_col="v", lo_col="lo", hi_col="hi", bucket_width=7.0,
        interval_cols=["iid"],
    ).take_all()
    got_pairs = sorted((r["pid"], r["iid"]) for r in got)
    expect = sorted(
        (p["pid"], i["iid"])
        for p in pts.to_pylist() for i in ivs.to_pylist()
        if i["lo"] <= p["v"] < i["hi"]
    )
    assert got_pairs == expect
    # half-open: v=10 not in [0,10); v=-3 only in [-5,0)
    assert (2, 0) not in got_pairs and (7, 3) in got_pairs


def test_session_rollup_gap_boundaries(ray_session):
    import datetime as dt

    import ray.data as rd

    from gobblin_ray.stages.windows import session_rollup

    t0 = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = [
        # user 1: two sessions (gap 100s > 60s)
        ("u1", t0, 1.0), ("u1", t0 + 30 * sec, 2.0),
        ("u1", t0 + 130 * sec, 4.0),
        # user 2: one session, tie timestamps share the session
        ("u2", t0, 10.0), ("u2", t0, 20.0),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows]),
    })
    out = session_rollup(
        rd.from_arrow(t), key="user_id", ts_col="ts", gap_seconds=60.0,
        value_col="value",
    ).take_all()
    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
           for r in out}
    assert got == {
        ("u1", 1): (2, 3.0),
        ("u1", 2): (1, 4.0),
        ("u2", 1): (2, 30.0),
    }


def test_range_join_randomized_parity(ray_session):
    """Seeded random points/intervals vs a naive O(n*m) containment join —
    catches bucket-edge and replication bugs the crafted cases miss."""
    import numpy as np
    import ray.data as rd

    from gobblin_ray.stages.joins import range_join

    rng = np.random.default_rng(123)
    for trial, width in enumerate([3.0, 10.0, 0.5]):
        n, m = 200, 25
        v = np.round(rng.uniform(-20, 120, n), 3)
        lo = np.round(rng.uniform(-25, 110, m), 3)
        span = np.round(rng.exponential(8.0, m), 3)
        pts = pa.table({"pid": pa.array(range(n), pa.int64()), "v": pa.array(v)})
        ivs = pa.table({
            "iid": pa.array(range(m), pa.int64()),
            "lo": pa.array(lo), "hi": pa.array(lo + span),
        })
        got = sorted(
            (r["pid"], r["iid"]) for r in range_join(
                rd.from_arrow(pts), rd.from_arrow(ivs),
                value_col="v", lo_col="lo", hi_col="hi",
                bucket_width=width, interval_cols=["iid"],
            ).take_all()
        )
        expect = sorted(
            (int(pi), int(ii))
            for pi in range(n) for ii in range(m)
            if lo[ii] <= v[pi] < lo[ii] + span[ii]
        )
        assert got == expect, f"trial {trial} width {width}"


def test_session_rollup_randomized_parity(ray_session):
    """Seeded random event streams vs a pandas groupby/gap oracle."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import session_rollup

    rng = np.random.default_rng(7)
    n = 500
    users = rng.integers(0, 20, n)
    ts = np.datetime64("2026-01-01", "us") + rng.integers(
        0, 3600 * 6, n
    ).astype("timedelta64[s]").astype("timedelta64[us]")
    vals = np.round(rng.uniform(0, 10, n), 2)
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(vals),
    })
    gap = 300.0
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], round(r["sum_value"], 6))
        for r in session_rollup(
            rd.from_arrow(t), key="user_id", ts_col="ts",
            gap_seconds=gap, value_col="value",
        ).take_all()
    }
    df = pd.DataFrame({"u": users, "ts": ts, "v": vals}).sort_values(["u", "ts"])
    expect = {}
    for u, g in df.groupby("u"):
        dt = g["ts"].diff().dt.total_seconds().fillna(np.inf)
        sess = (dt > gap).cumsum()  # first row's inf gap opens session 1
        for s, sg in g.groupby(sess):
            expect[(int(u), int(s))] = (len(sg), round(float(sg["v"].sum()), 6))
    assert got == expect


def test_top_k_per_group_matches_naive(ray_session):
    """Grouped rank vs a pandas groupby-head oracle: string keys, duplicate
    sort values (tiebreak), a hot group (skew), and a group smaller than k."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.sorts import top_k_per_group

    rng = np.random.default_rng(11)
    n = 6000
    groups = np.concatenate([
        rng.choice([f"g{i}" for i in range(40)], n - 1500),
        np.repeat("hot", 1498),       # skewed group
        np.array(["tiny", "tiny"]),   # group smaller than k
    ])
    df = pd.DataFrame({
        "g": rng.permutation(groups),
        "v": rng.integers(0, 50, n),  # many ties -> tiebreak matters
        "i": np.arange(n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = (
        top_k_per_group(ds, "g", 5, by=["v", "i"], descending=[True, False])
        .to_pandas().sort_values(["g", "v", "i"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "i"], ascending=[False, True])
        .groupby("g", sort=False).head(5)
        .sort_values(["g", "v", "i"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "i"]], want[["g", "v", "i"]])
    assert (got.groupby("g").size() <= 5).all()
    assert (got["g"] == "tiny").sum() == 2


def test_top_k_per_group_int_key(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.sorts import top_k_per_group

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": rng.integers(-20, 20, 3000),  # negative int keys must hash fine
        "v": rng.standard_normal(3000),
        "i": np.arange(3000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = (
        top_k_per_group(ds, "g", 2, by=["v", "i"], descending=[False, False])
        .to_pandas().sort_values(["g", "v"]).reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "i"]).groupby("g", sort=False).head(2)
        .sort_values(["g", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "i"]], want[["g", "v", "i"]])


def test_hopping_rollup_boundaries_and_tumbling_degenerate(ray_session):
    """An event exactly on a window edge belongs to the window it STARTS
    (half-open [s, s+width)); width == hop degenerates to tumbling; every
    event appears in exactly width/hop windows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.windows import hopping_rollup

    ts = pd.to_datetime([
        "2026-01-01 00:00:00",   # exactly on the hour
        "2026-01-01 00:59:59",
        "2026-01-01 01:00:00",   # edge again
        "2026-01-01 03:30:00",
    ])
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "value": pa.array([1.0, 2.0, 4.0, 8.0])})
    ds = rd.from_arrow(t).repartition(2)

    hop = hopping_rollup(ds, "ts", 2 * 3600, 3600, value_col="value").to_pandas()
    assert hop["n_events"].sum() == 4 * 2  # each event in exactly 2 windows
    row = hop.set_index("window_start").loc[pd.Timestamp("2026-01-01 00:00:00")]
    # window [00:00, 02:00): events at 00:00, 00:59:59, 01:00 -> sum 7
    assert row["n_events"] == 3 and row["sum_value"] == 7.0
    row = hop.set_index("window_start").loc[pd.Timestamp("2026-01-01 01:00:00")]
    # window [01:00, 03:00): only the 01:00 event
    assert row["n_events"] == 1 and row["sum_value"] == 4.0

    tumb = hopping_rollup(ds, "ts", 3600, 3600, value_col="value").to_pandas()
    assert tumb["n_events"].sum() == 4  # degenerate: one window per event

    with pytest.raises(ValueError):
        hopping_rollup(ds, "ts", 5400, 3600)


def test_rollup_aggregate_three_keys(ray_session):
    """3-key rollup == DuckDB GROUP BY ROLLUP (4 levels incl. grand total),
    from one finest-level shuffle."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.aggregates import rollup_aggregate

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 1000),
        "b": rng.choice(["p", "q", "r"], 1000),
        "c": rng.integers(0, 4, 1000),
        "v": rng.integers(0, 100, 1000).astype("int64"),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = (
        rollup_aggregate(ds, ["a", "b", "c"], ["v"]).to_pandas()
        .sort_values(["a", "b", "c"], na_position="last")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT a, b, c, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v "
        "FROM df GROUP BY ROLLUP(a, b, c)"
    ).df().sort_values(["a", "b", "c"], na_position="last").reset_index(drop=True)
    got["c"] = got["c"].astype("float64")  # nullable int level -> NaN parity
    pd.testing.assert_frame_equal(
        got[["a", "b", "c", "n", "sum_v"]], want[["a", "b", "c", "n", "sum_v"]]
    )


def test_cube_and_grouping_sets_three_keys(ray_session):
    """3-key CUBE == DuckDB GROUP BY CUBE (8 grouping sets); an explicit
    GROUPING SETS selection matches too; out-of-key sets are rejected."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from gobblin_ray.stages.aggregates import (
        cube_aggregate,
        grouping_sets_aggregate,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 800),
        "b": rng.choice(["p", "q", "r"], 800),
        "c": rng.integers(0, 3, 800),
        "v": rng.integers(0, 100, 800).astype("int64"),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)

    def norm(d):
        d = d.copy()
        d["c"] = d["c"].astype("float64")
        return (d[["a", "b", "c", "n", "sum_v"]]
                .sort_values(["a", "b", "c"], na_position="last")
                .reset_index(drop=True))

    got = norm(cube_aggregate(ds, ["a", "b", "c"], ["v"]).to_pandas())
    want = norm(duckdb.sql(
        "SELECT a, b, c, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v "
        "FROM df GROUP BY CUBE(a, b, c)"
    ).df())
    pd.testing.assert_frame_equal(got, want)

    got_gs = norm(grouping_sets_aggregate(
        ds, ["a", "b", "c"], ["v"], sets=[["b"], ["a", "c"]]
    ).to_pandas())
    want_gs = norm(duckdb.sql(
        "SELECT a, b, c, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v "
        "FROM df GROUP BY GROUPING SETS ((a, b, c), (b), (a, c))"
    ).df())
    pd.testing.assert_frame_equal(got_gs, want_gs)

    with _pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a", "b"], ["v"], sets=[["z"]])


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate near the theoretical
    ~1% at 10 bits/key, 4 hashes."""
    import numpy as np

    from gobblin_ray.functions.sketch import _splitmix64
    from gobblin_ray.stages.joins import BloomFilter

    rng = np.random.default_rng(2)
    members = _splitmix64(rng.integers(0, 2**63, 5000).astype(np.uint64))
    others = _splitmix64(
        rng.integers(2**63, 2**64, 20000, dtype=np.uint64).astype(np.uint64)
    )
    others = others[~np.isin(others, members)]
    bf = BloomFilter.build(members, bits_per_key=10, n_hashes=4)
    assert bf.contains(members).all()  # no false negatives
    fp = bf.contains(others).mean()
    assert fp < 0.05, fp


def test_bloom_semi_join_matches_exact(ray_session):
    """bloom_semi_join == plain broadcast semi_join (the bloom only
    prefilters; survivors are exactly verified), incl. null keys dropped."""
    import numpy as np
    import ray.data as rd

    from gobblin_ray.stages.joins import bloom_semi_join, semi_join

    rng = np.random.default_rng(4)
    keys = rng.integers(0, 10_000, 5000).tolist() + [None] * 17
    t = pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(range(len(keys)), pa.int64()),
    })
    key_set = set(rng.integers(0, 10_000, 200).tolist())
    ds = rd.from_arrow(t).repartition(4)
    import pandas as pd

    got = (bloom_semi_join(ds, "k", key_set).to_pandas()
           .sort_values("v").reset_index(drop=True))
    want = (semi_join(ds, "k", key_set).to_pandas()
            .sort_values("v").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_stratified_sample_deterministic_across_partitioning(ray_session):
    """The hash-ordered stratified sample is identical regardless of input
    partitioning, and takes min(n, group_size) rows per group."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.sorts import stratified_sample_hash

    rng = np.random.default_rng(8)
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], 500)),
        "id": pa.array(range(500), pa.int64()),
    })

    def run(parts):
        return (
            stratified_sample_hash(
                rd.from_arrow(t).repartition(parts), "g", 20, "id")
            .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
        )

    a, b = run(2), run(13)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("g").size() == 20).all()

    small = pa.table({"g": pa.array(["x"] * 3), "id": pa.array([1, 2, 3], pa.int64())})
    got = stratified_sample_hash(rd.from_arrow(small), "g", 20, "id").to_pandas()
    assert len(got) == 3  # group smaller than n: take all


def test_outer_join_by_key_all_hows(ray_session):
    """full/left/right outer join == pandas merge on the whole input, with
    real unmatched rows on both sides; disjoint-columns contract raised."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from gobblin_ray.stages.joins import outer_join_by_key

    rng = np.random.default_rng(12)
    ldf = pd.DataFrame({"lk": rng.integers(0, 60, 80), "a": np.arange(80)})
    rdf = pd.DataFrame({"rk": rng.integers(30, 90, 70), "b": np.arange(70)})
    l = rd.from_arrow(pa.Table.from_pandas(ldf)).repartition(5)
    r = rd.from_arrow(pa.Table.from_pandas(rdf)).repartition(3)
    for how, phow in [("full", "outer"), ("left", "left"), ("right", "right")]:
        got = (outer_join_by_key(l, r, "lk", "rk", how=how, num_partitions=8)
               .to_pandas().sort_values(["lk", "a", "rk", "b"])
               .reset_index(drop=True))
        want = (pd.merge(ldf, rdf, left_on="lk", right_on="rk", how=phow)
                .sort_values(["lk", "a", "rk", "b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[want.columns].astype("float64"), want.astype("float64"),
            check_like=True,
        )
    with _pytest.raises(ValueError):
        outer_join_by_key(l, l, "lk", "lk")


def test_analytic_lag_cumsum_matches_duckdb(ray_session):
    """lag + running sum per key == DuckDB window functions, bit-identical
    (same addition order)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import analytic_lag_cumsum

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 400),
        "o": rng.permutation(400),
        "id": np.arange(400),
        "v": rng.standard_normal(400),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = (analytic_lag_cumsum(ds, "k", ["o", "id"], "v", num_partitions=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, lag(v) OVER w AS prev_value, "
        "sum(v) OVER (PARTITION BY k ORDER BY o, id ROWS UNBOUNDED PRECEDING)"
        " AS running_sum FROM df WINDOW w AS (PARTITION BY k ORDER BY o, id)"
        " ORDER BY id"
    ).df()
    pd.testing.assert_frame_equal(
        got[["id", "prev_value", "running_sum"]], want
    )


def test_approx_distinct_by_saturated_exact(ray_session):
    """Per-group KMV: saturated groups give exact count(DISTINCT) per key."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.functions.sketch import approx_distinct_by

    rng = np.random.default_rng(14)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "u": rng.integers(0, 500, 3000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = (approx_distinct_by(ds, "g", "u", k=2048).to_pandas()
           .sort_values("g").reset_index(drop=True))
    want = (df.groupby("g")["u"].nunique().reset_index(name="n_distinct")
            .sort_values("g").reset_index(drop=True))
    assert list(got["g"]) == list(want["g"])
    assert list(got["n_distinct"]) == list(want["u"] if "u" in want else want["n_distinct"])


def test_ntile_edges_match_duckdb(ray_session):
    """NTILE raggedness: group sizes below, equal to, and not divisible by
    n all match DuckDB's rule."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import ntile_by

    sizes = {"tiny": 2, "exact": 4, "ragged": 10}
    rows = [(k, i) for k, sz in sizes.items() for i in range(sz)]
    df = pd.DataFrame(rows, columns=["k", "o"])
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    got = (ntile_by(ds, "k", ["o"], 4, num_partitions=4).to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    want = duckdb.sql(
        "SELECT k, o, CAST(ntile(4) OVER (PARTITION BY k ORDER BY o) "
        "AS BIGINT) AS tile FROM df ORDER BY k, o"
    ).df()
    pd.testing.assert_frame_equal(got[["k", "o", "tile"]], want)


def test_sink_csv_and_jsonl_roundtrip(ray_session, tmp_path):
    """CSV and JSONL sink formats round-trip through their native readers."""
    import json as _json

    import pyarrow.csv as pacsv

    from gobblin_ray.stages.sink import PartitionedParquetSink

    t = pa.table({
        "k": pa.array(["a", "b", "a"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })
    for fmt in ("csv", "jsonl"):
        d = str(tmp_path / fmt)
        sink = PartitionedParquetSink(d, partition_col="k", file_format=fmt)
        manifest = sink(t)
        assert manifest.num_rows == 2  # two partitions
        total = []
        for p in manifest.column("path").to_pylist():
            if fmt == "csv":
                rt = pacsv.read_csv(p)
                total += rt.column("v").to_pylist()
            else:
                with open(p) as f:
                    total += [_json.loads(line)["v"] for line in f]
        assert sorted(total) == [1, 2, 3]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        PartitionedParquetSink(str(tmp_path / "x"), file_format="avro")


def test_funnel_handles_users_missing_a_stage(ray_session, tmp_path):
    """A user with no click (or no purchase) must count as NOT converted —
    exercises Ray's Min aggregate over an all-null timestamp group, which
    the shipped testdata never does."""
    import pandas as pd
    import pyarrow.parquet as pq

    from gobblin_ray.pipelines.demo import funnel_click_purchase

    ts = pd.Timestamp("2024-01-01")
    rows = [
        (1, "click", ts), (1, "purchase", ts + pd.Timedelta("1h")),   # converted
        (2, "purchase", ts), (2, "click", ts + pd.Timedelta("1h")),   # wrong order
        (3, "click", ts),                                             # no purchase
        (4, "view", ts),                                              # neither
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array(
            [r[2].to_datetime64().astype("datetime64[us]") for r in rows],
            pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    d = tmp_path / "mini_sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = funnel_click_purchase(str(d)).to_pandas()
    assert int(got["n_users"].iloc[0]) == 4
    assert int(got["n_converted"].iloc[0]) == 1


# ----------------------------------------------------- round-3 session-4 ops

def test_chunk_token_windows_edges():
    import pyarrow as pa

    from gobblin_ray.functions.text import chunk_token_windows

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d e f g", "x", "", "p q r s t"],
    })
    out = chunk_token_windows(chunk=4, stride=3)(t).to_pydict()
    # doc 1 (7 tokens): starts 0,3,6 -> 'a b c d','d e f g','g'
    # doc 2 (1 token): one whole-doc chunk; doc 3: '' splits to [''] (1 tok)
    # doc 4 (5 tokens): starts 0,3 -> 'p q r s','s t'
    assert out["doc_id"] == [1, 1, 1, 2, 3, 4, 4]
    assert out["chunk_id"] == [0, 1, 2, 0, 0, 0, 1]
    assert out["n_tokens"] == [4, 4, 1, 1, 1, 4, 2]
    assert out["chunk"] == [
        "a b c d", "d e f g", "g", "x", "", "p q r s", "s t",
    ]
    # stride > chunk (gap sampling) is allowed: starts 0,5 on 6 tokens
    t2 = pa.table({"doc_id": [9], "text": ["t0 t1 t2 t3 t4 t5"]})
    out2 = chunk_token_windows(chunk=2, stride=5)(t2).to_pydict()
    assert out2["chunk"] == ["t0 t1", "t5"]


def test_last_observed_state_all_null_and_order(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from gobblin_ray.stages.windows import last_observed_state

    # user 1: value written at ts 1 then null at ts 2 -> keeps 10.0;
    # event_type written LAST at ts 2 -> 'b' (independent per column).
    # user 2: never writes value -> NaN/None survives.
    df = pd.DataFrame({
        "k": [1, 1, 2, 2],
        "ts": [1, 2, 1, 2],
        "value": [10.0, None, None, None],
        "label": ["a", "b", None, "z"],
    })
    ds = ray.data.from_pandas(df)
    out = (
        last_observed_state(ds, "k", ["ts"], ["value", "label"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 2]
    assert out.loc[0, "last_value"] == 10.0
    assert out.loc[0, "last_label"] == "b"
    assert np.isnan(out.loc[1, "last_value"])
    assert out.loc[1, "last_label"] == "z"


def test_scd2_history_matches_duckdb(ray_session):
    """SCD2 collapse (null-safe attr change + validity intervals) == the
    lag/lead SQL, including null->value and value->null transitions."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import scd2_history

    rng = np.random.default_rng(23)
    n = 500
    attr = rng.choice(["a", "b", None], n, p=[0.45, 0.45, 0.1])
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "ts": rng.integers(0, 10_000, n).astype("datetime64[s]")
            .astype("datetime64[us]"),
        "id": np.arange(n),
        "attr": attr,
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = (scd2_history(ds, "k", ["ts", "id"], "attr", num_partitions=6)
           .to_pandas()
           .sort_values(["k", "valid_from", "attr"])
           .reset_index(drop=True))
    want = duckdb.sql(
        """
        WITH o AS (
            SELECT k, attr, ts, row_number() OVER w AS rn,
                   lag(attr) OVER w AS prev
            FROM df WINDOW w AS (PARTITION BY k ORDER BY ts, id)
        ), c AS (
            SELECT k, attr, ts AS valid_from, rn FROM o
            WHERE rn = 1 OR attr IS DISTINCT FROM prev
        )
        SELECT k, attr, valid_from,
               lead(valid_from) OVER (PARTITION BY k ORDER BY rn) AS valid_to
        FROM c ORDER BY k, valid_from, attr
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["k", "attr", "valid_from", "valid_to"]],
        want, check_dtype=False,
    )


def test_dedup_within_window_kept_anchored(ray_session):
    """Windowed dedup == sequential kept-anchored replay; boundary is
    STRICTLY-greater-than-gap (a row exactly gap seconds after the last
    kept row is suppressed); multi-key groups throttle independently."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import dedup_within_window

    # crafted burst: ts 0,2,5,7,12 with gap=5 -> keep 0 (anchor), drop 2,
    # drop 5 (== gap, not >), keep 7, drop 12 (7+5 == 12, not >)
    burst = pd.DataFrame({
        "k": ["u"] * 5, "t": ["x"] * 5,
        "ts": np.array([0, 2, 5, 7, 12], "datetime64[s]")
            .astype("datetime64[us]"),
        "id": np.arange(5),
    })
    got = (dedup_within_window(
        rd.from_arrow(pa.Table.from_pandas(burst)), ["k", "t"], "ts", 5.0,
        order_tiebreak=["id"], num_partitions=2,
    ).to_pandas().sort_values("id"))
    assert got["id"].tolist() == [0, 3]

    # randomized multi-key parity vs the obvious sequential replay
    rng = np.random.default_rng(31)
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),
        "t": rng.choice(["a", "b"], n),
        "ts": rng.integers(0, 3_000, n).astype("datetime64[s]")
            .astype("datetime64[us]"),
        "id": np.arange(n),
    })
    got = (dedup_within_window(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(6),
        ["k", "t"], "ts", 120.0, order_tiebreak=["id"], num_partitions=7,
    ).to_pandas().sort_values("id")["id"].tolist())
    sdf = df.sort_values(["k", "t", "ts", "id"], kind="mergesort")
    last: dict = {}
    want = []
    for r in sdf.itertuples(index=False):
        key = (r.k, r.t)
        sec = r.ts.timestamp()
        if key not in last or sec - last[key] > 120.0:
            want.append(r.id)
            last[key] = sec
    assert got == sorted(want)


def test_rolling_window_bit_identical_to_duckdb(ray_session):
    """Moving-frame sum/avg/min/count == DuckDB window SQL with EXACT
    float equality (oldest->newest addition order)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import rolling_window

    rng = np.random.default_rng(41)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n),
        "o": rng.permutation(n),
        "id": np.arange(n),
        "v": rng.standard_normal(n) * 1e3,
    })
    got = (rolling_window(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(5),
        "k", ["o", "id"], "v", 5, num_partitions=6,
    ).to_pandas().sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, sum(v) OVER w AS roll_sum, avg(v) OVER w AS roll_avg, "
        "min(v) OVER w AS roll_min, CAST(count(*) OVER w AS BIGINT) AS roll_n "
        "FROM df WINDOW w AS (PARTITION BY k ORDER BY o, id "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) ORDER BY id"
    ).df()
    for c in ["roll_sum", "roll_avg", "roll_min"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["roll_n"].to_numpy() == want["roll_n"].to_numpy()).all()


def test_rank_by_matches_duckdb(ray_session):
    """rank/dense_rank peers on the rank columns only; row_number on the
    full tiebreak — parity incl. duplicate values and null rank values."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import rank_by

    rng = np.random.default_rng(43)
    n = 500
    v = np.round(rng.standard_normal(n), 1)  # force ties
    v[rng.random(n) < 0.05] = np.nan
    df = pd.DataFrame({
        "k": rng.integers(0, 10, n), "id": np.arange(n), "v": v,
    })
    got = (rank_by(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
        "k", ["v"], ["id"], descending=True, num_partitions=5,
    ).to_pandas().sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, CAST(rank() OVER w AS BIGINT) rnk, "
        "CAST(dense_rank() OVER w AS BIGINT) dense_rnk, "
        "CAST(row_number() OVER w2 AS BIGINT) row_num FROM df "
        "WINDOW w AS (PARTITION BY k ORDER BY v DESC), "
        "w2 AS (PARTITION BY k ORDER BY v DESC, id) ORDER BY id"
    ).df()
    for c in ["rnk", "dense_rnk", "row_num"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_normalize_text_unicode_and_whitespace(ray_session):
    """NFC composition, lowercasing and whitespace collapse in one pass."""
    import ray.data as rd

    from gobblin_ray.functions.text import normalize_text

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "  Hello\t\tWORLD \n",
            "Café MIX",          # e + combining accent -> é (NFC)
            "a  b   c",
        ]),
    })
    out = (rd.from_arrow(t)
           .map_batches(normalize_text(), batch_format="pyarrow",
                        batch_size=None)
           .to_pandas().sort_values("doc_id"))
    assert out["norm_text"].tolist() == ["hello world", "café mix", "a b c"]


def test_window_join_matches_bruteforce(ray_session):
    """Randomized parity: window_join_by_key == pandas merge + BETWEEN
    filter, including inclusive bounds, multi-match keys, keys with no
    matches, and duplicate timestamps."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.joins import window_join_by_key

    rng = np.random.default_rng(7)
    nl, nr = 400, 600
    base = np.datetime64("2026-01-01T00:00:00", "us")
    left = pd.DataFrame(
        {
            "lid": np.arange(nl, dtype=np.int64),
            "k": rng.integers(0, 40, nl).astype(np.int64),
            "lts": base + rng.integers(0, 3600, nl).astype("timedelta64[s]"),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(nr, dtype=np.int64),
            "k": rng.integers(0, 50, nr).astype(np.int64),  # some keys unmatched
            "rts": base + rng.integers(0, 3600, nr).astype("timedelta64[s]"),
        }
    )
    before, after = 120.0, 30.0
    got = (
        window_join_by_key(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", left_on="lts", right_on="rts",
            before_s=before, after_s=after, num_partitions=8,
        )
        .to_pandas()
    )
    got["lid"] = got["lid"].astype(np.int64)
    got["rid"] = got["rid"].astype(np.int64)
    exp = left.merge(right, on="k")
    lo = exp["lts"] - pd.Timedelta(seconds=before)
    hi = exp["lts"] + pd.Timedelta(seconds=after)
    exp = exp[(exp["rts"] >= lo) & (exp["rts"] <= hi)]
    key_cols = ["lid", "rid"]
    gs = got[key_cols + ["rts"]].sort_values(key_cols).reset_index(drop=True)
    es = exp[key_cols + ["rts"]].sort_values(key_cols).reset_index(drop=True)
    assert len(gs) > 0  # the window actually matches something
    pd.testing.assert_frame_equal(gs, es)


def test_window_join_empty_side_partitions(ray_session):
    """A partition holding only one side emits nothing (and doesn't crash
    the pandas group stage with a schema mismatch)."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.joins import window_join_by_key

    left = pd.DataFrame({"lid": [1, 2], "k": [0, 1],
                         "lts": pd.to_datetime(["2026-01-01", "2026-01-02"])})
    right = pd.DataFrame({"rid": [9], "k": [99],  # never matches, other partition
                          "rts": pd.to_datetime(["2026-01-01"])})
    got = window_join_by_key(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", left_on="lts", right_on="rts",
        before_s=60.0, after_s=60.0, num_partitions=4,
    ).to_pandas()
    assert len(got) == 0


def test_string_agg_numeric_order(ray_session):
    """string_agg over a NUMERIC column must order numerically (ORDER BY
    val), not lexicographically — [9, 10] joins as "9,10", never "10,9"."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.aggregates import string_agg_by

    df = pd.DataFrame({"k": ["a", "a", "a", "b"], "v": [10, 9, 2, 5]})
    out = (string_agg_by(rd.from_pandas(df), "k", "v")
           .to_pandas().set_index("k")["agg"])
    assert out["a"] == "2,9,10"
    assert out["b"] == "5"


def test_joins_tolerate_null_timestamps(ray_session):
    """Null timestamps: window_join must not wrap NaT into INT64_MIN window
    arithmetic (negative repeat counts), and merge_asof_by_key must not
    crash on null left_on — both drop the undefined rows, as the SQL
    BETWEEN / inner ASOF JOIN semantics do."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.joins import merge_asof_by_key, window_join_by_key

    left = pd.DataFrame(
        {"lid": [1, 2, 3], "k": [0, 0, 0],
         "lts": pd.to_datetime(["2026-01-01 00:00:10", None,
                                "2026-01-01 00:01:00"])}
    )
    right = pd.DataFrame(
        {"rid": [7, 8, 9], "k": [0, 0, 0],
         "rts": pd.to_datetime(["2026-01-01 00:00:05", None,
                                "2026-01-01 00:00:55"])}
    )
    got = window_join_by_key(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", left_on="lts", right_on="rts",
        before_s=10.0, after_s=0.0, num_partitions=4,
    ).to_pandas()
    pairs = set(zip(got["lid"].astype(int), got["rid"].astype(int)))
    assert pairs == {(1, 7), (3, 9)}  # null rows on either side never pair

    asof = merge_asof_by_key(
        rd.from_pandas(left), rd.from_pandas(right.rename(columns={"rts": "ats"})),
        key="k", left_on="lts", right_on="ats", right_cols=["rid"],
    ).to_pandas()
    asof = asof.dropna(subset=["rid"])
    assert set(zip(asof["lid"].astype(int), asof["rid"].astype(int))) == {
        (1, 7), (3, 9)
    }


def test_left_join_keeps_solid_int_dtype(ray_session):
    """LEFT join: the non-nullable (left) side's int columns must come back
    int64 in EVERY partition — the union block NaN-promotes them wherever a
    partition holds right rows, which once made output blocks disagree on
    schema across partitions."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.joins import outer_join_by_key

    left = pd.DataFrame({"lid": [1, 2, 3], "lk": [0, 1, 2]})
    right = pd.DataFrame({"rid": [10, 30], "rk": [0, 2]})
    out = outer_join_by_key(
        rd.from_pandas(left), rd.from_pandas(right), "lk", "rk",
        how="left", num_partitions=4,
    ).to_pandas()
    assert str(out["lid"].dtype) == "int64"
    assert str(out["lk"].dtype) == "int64"
    assert str(out["rid"].dtype) == "float64"  # nullable side stays float
    assert len(out) == 3 and out["rid"].isna().sum() == 1


def test_dedup_window_ignores_null_timestamps(ray_session):
    """A NaT row must not break the sorted-segment searchsorted jumps
    (NaT -> INT64_MIN once silently dropped VALID rows after it)."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import dedup_within_window

    df = pd.DataFrame({
        "k": [0, 0, 0, 0],
        "ts": pd.to_datetime(["2026-01-01 00:00:05", "2026-01-01 00:00:10",
                              None, None]),
        "i": [1, 2, 3, 4],
    })
    got = dedup_within_window(
        rd.from_pandas(df), keys=["k"], ts_col="ts", gap_s=2.0,
        num_partitions=2,
    ).to_pandas()
    # both valid rows survive (5s apart > 2s gap); null-ts rows drop
    assert sorted(got["i"].astype(int)) == [1, 2]


def test_rolling_window_ignores_nulls(ray_session):
    """SQL frame aggregates ignore NULLs: one null value must not poison
    the frames containing it."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import rolling_window

    df = pd.DataFrame({
        "k": [0, 0, 0], "o": [1, 2, 3], "v": [10.0, None, 30.0],
    })
    got = (rolling_window(rd.from_pandas(df), "k", ["o"], "v", n_rows=2)
           .to_pandas().sort_values("o").reset_index(drop=True))
    assert got["roll_sum"].tolist() == [10.0, 10.0, 30.0]
    assert got["roll_n"].tolist() == [1, 1, 1]
    assert got["roll_min"].tolist() == [10.0, 10.0, 30.0]


def test_sink_handles_nan_partition(ray_session, tmp_path):
    """Float-NaN partition values route to '__nan__' instead of silently
    vanishing (pc.equal(c, NaN) matches nothing)."""
    import os

    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.sink import PartitionedParquetSink

    # NaN must arrive as a genuine Arrow NaN (pandas ingest maps NaN to
    # Arrow NULL, which was already handled)
    t = pa.table({
        "p": pa.array(np.array([1.0, np.nan, 2.0])),
        "x": pa.array([1, 2, 3]),
    })
    assert t.column("p").null_count == 0  # it really is NaN, not null
    out = str(tmp_path / "out")
    lin = rd.from_arrow(t).map_batches(
        PartitionedParquetSink,
        fn_constructor_kwargs=dict(out_dir=out, partition_col="p"),
        batch_format="pyarrow", batch_size=None, concurrency=1,
    ).to_pandas()
    assert lin["rows"].sum() == 3
    dirs = sorted(os.listdir(out))
    assert "p=__nan__" in dirs
    import pyarrow.parquet as pq
    total = sum(
        pq.read_table(os.path.join(out, d, f)).num_rows
        for d in dirs for f in os.listdir(os.path.join(out, d))
    )
    assert total == 3


def test_top_k_per_group_drops_null_keys(ray_session):
    """Null group keys follow the family's drop policy — they used to each
    count as their OWN group (NaN != NaN) and bypass the k limit."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.sorts import top_k_per_group

    df = pd.DataFrame({
        "g": [1, 1, 1, None, None, None],
        "v": [3.0, 2.0, 1.0, 9.0, 8.0, 7.0],
    })
    got = top_k_per_group(
        rd.from_pandas(df), "g", k=1, by=["v"], descending=[True],
        num_partitions=2,
    ).to_pandas()
    assert len(got) == 1 and float(got["v"].iloc[0]) == 3.0


def test_analytic_frame_values_matches_duckdb(ray_session):
    """lead/first_value/last_value (full frame) + percent_rank/cume_dist
    parity incl. tied rank values, null values, and a single-row key."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import analytic_frame_values

    rng = np.random.default_rng(7)
    n = 400
    v = np.round(rng.standard_normal(n), 1)  # force ties
    v[rng.random(n) < 0.08] = np.nan
    k = rng.integers(0, 8, n)
    k[0] = 99  # single-row key: percent_rank must be 0, cume_dist 1
    df = pd.DataFrame({"k": k, "id": np.arange(n), "v": v})
    got = (analytic_frame_values(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
        "k", ["id"], "v", "v", num_partitions=5,
    ).to_pandas().sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, lead(v) OVER w AS next_value, "
        "first_value(v) OVER (PARTITION BY k ORDER BY id ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val, "
        "last_value(v) OVER (PARTITION BY k ORDER BY id ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val, "
        "percent_rank() OVER wv AS pct_rank, "
        "cume_dist() OVER wv AS cume_dist FROM df "
        "WINDOW w AS (PARTITION BY k ORDER BY id), "
        "wv AS (PARTITION BY k ORDER BY v) ORDER BY id"
    ).df()
    for c in ["next_value", "first_val", "last_val"]:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    for c in ["pct_rank", "cume_dist"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_zorder_key_improves_multidim_locality(ray_session):
    """Files cut from a zkey-sorted 64x64 grid cover far smaller 2-D
    bounding boxes than files cut from a single-column sort — the whole
    point of Z-ordering for min/max pruning."""
    from gobblin_ray.stages.sorts import zorder_key

    g = np.arange(64, dtype=np.int64)
    x = np.repeat(g, 64)
    y = np.tile(g, 64)
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    z = zorder_key(["x", "y"], bits=6, out="z")(t).column("z").to_numpy()

    def bbox_area_sum(order, rows_per_file=64):
        xs, ys = x[order], y[order]
        total = 0
        for i in range(0, len(xs), rows_per_file):
            cx, cy = xs[i:i + rows_per_file], ys[i:i + rows_per_file]
            total += (cx.max() - cx.min() + 1) * (cy.max() - cy.min() + 1)
        return total

    a_z = bbox_area_sum(np.argsort(z, kind="stable"))
    a_x = bbox_area_sum(np.argsort(x, kind="stable"))
    # z-order files are 8x8 squares (area 64); x-sort files are 1x64
    # stripes (area 64) per x value — equal HERE, so probe with a 2-D
    # range query instead: files overlapping a 8x8 box
    def files_touched(order, lo=(24, 24), hi=(31, 31), rows_per_file=64):
        xs, ys = x[order], y[order]
        n = 0
        for i in range(0, len(xs), rows_per_file):
            cx, cy = xs[i:i + rows_per_file], ys[i:i + rows_per_file]
            if (cx.max() >= lo[0] and cx.min() <= hi[0]
                    and cy.max() >= lo[1] and cy.min() <= hi[1]):
                n += 1
        return n

    assert files_touched(np.argsort(z, kind="stable")) < files_touched(
        np.argsort(x, kind="stable"))
    assert a_z <= a_x


def test_skew_join_matches_plain_join(ray_session):
    """Hybrid hot/cold split is exact: equals a plain pandas merge on a
    crafted skewed input (one celebrity key, a cold tail, a right-only
    key, a null key) and both paths are actually taken."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.joins import hot_keys_exact, skew_join_by_key

    rng = np.random.default_rng(11)
    k = np.concatenate([np.zeros(500, np.int64),
                        rng.integers(1, 40, 300)])
    left = pd.DataFrame({"k": k, "lid": np.arange(len(k))})
    right = pd.DataFrame({"k": np.arange(0, 45), "attr": np.arange(0, 45) * 10})
    # null key row must drop (inner-join semantics)
    lt = pa.table({
        "k": pa.array(list(k) + [None], pa.int64()),
        "lid": pa.array(list(np.arange(len(k))) + [-1], pa.int64()),
    })
    lds = rd.from_arrow(lt).repartition(4)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(2)

    hot = hot_keys_exact(lds, "k", 100)
    assert hot == [0]  # only the celebrity key

    got = (skew_join_by_key(lds, rds, "k", hot_threshold=100,
                            num_partitions=4)
           .to_pandas().sort_values(["k", "lid"]).reset_index(drop=True))
    want = (left.merge(right, on="k", how="inner")
            .sort_values(["k", "lid"]).reset_index(drop=True))
    assert len(got) == len(want) == 800
    for c in ("k", "lid", "attr"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # threshold above every count -> pure hash-join fallback, same result
    got2 = (skew_join_by_key(lds, rds, "k", hot_threshold=10_000,
                             num_partitions=4)
            .to_pandas().sort_values(["k", "lid"]).reset_index(drop=True))
    assert (got2["lid"].to_numpy() == want["lid"].to_numpy()).all()


def test_merge_into_matches_brute_force(ray_session):
    """merge_into == a pandas brute-force MERGE on crafted data covering
    every clause: matched update, matched delete, unmatched-target
    passthrough, unmatched-source insert (explicit expr + same-name
    default + null default), null-key policy, the duplicate-source-key
    error, insert_unmatched=False, and the dtype contract (insert-nullable
    int -> float64, solid int stays exact)."""
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from gobblin_ray.stages.joins import merge_into

    tgt = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "name": ["a", "b", "c", "d", "e"],
        "bal": [10.0, 20.0, 30.0, 40.0, 50.0],
        "tier": np.array([1, 1, 2, 2, 3], np.int64),  # no source counterpart
        "grp": np.array([7, 7, 8, 8, 9], np.int64),   # updated int
    })
    src = pd.DataFrame({
        "k": [2, 3, 5, 6, 7],        # 2,3,5 matched; 6,7 inserts
        "delta": [5.0, 7.0, 9.0, 11.0, 13.0],
        "grp": np.array([70, 80, 90, 60, 61], np.int64),
        "kill": [False, True, False, False, True],  # 3 deletes; 7 inserts anyway
    })
    got = merge_into(
        rd.from_arrow(pa.Table.from_pandas(tgt)).repartition(3),
        rd.from_arrow(pa.Table.from_pandas(src)).repartition(2),
        key="k",
        update_exprs={"bal": lambda df: df["bal"] + df["delta__src"],
                      "grp": "grp"},
        delete_when=lambda df: df["kill__src"],
        insert_exprs={"bal": "delta"},
        num_partitions=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.DataFrame({
        "k": [1, 2, 4, 5, 6, 7],
        "name": ["a", "b", "d", "e", None, None],
        "bal": [10.0, 25.0, 40.0, 59.0, 11.0, 13.0],
        "tier": [1.0, 1.0, 2.0, 3.0, np.nan, np.nan],  # insert-nullable int
        "grp": [7.0, 70.0, 8.0, 90.0, 60.0, 61.0],     # updated int
    })
    assert got["k"].dtype == np.int64          # solid key stays exact
    assert got["tier"].dtype == np.float64
    assert got["grp"].dtype == np.float64
    pd.testing.assert_frame_equal(
        got.assign(name=got["name"].astype(object).where(got["name"].notna(), None)),
        want, check_like=True)

    # insert_unmatched=False: source-only keys vanish, tier stays int64.
    got2 = merge_into(
        rd.from_arrow(pa.Table.from_pandas(tgt)),
        rd.from_arrow(pa.Table.from_pandas(src)),
        key="k",
        update_exprs={"bal": lambda df: df["bal"] + df["delta__src"]},
        delete_when=lambda df: df["kill__src"],
        insert_unmatched=False,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got2["k"]) == [1, 2, 4, 5]
    assert got2["tier"].dtype == np.int64

    # Null source keys drop at the tag stage; null target keys pass through.
    tgt_n = pd.DataFrame({"k": [1.0, np.nan], "v": [1.0, 2.0]})
    src_n = pd.DataFrame({"k": [np.nan, 1.0], "v2": [99.0, 5.0]})
    got3 = merge_into(
        rd.from_arrow(pa.Table.from_pandas(tgt_n)),
        rd.from_arrow(pa.Table.from_pandas(src_n)),
        key="k", update_exprs={"v": "v2"},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert got3["v"].tolist() == [5.0, 2.0]  # null-key target row untouched
    assert len(got3) == 2                     # null source key never inserts

    # Duplicate source key raises the SQL error.
    dup = pd.DataFrame({"k": [2, 2], "delta": [1.0, 2.0],
                        "grp": np.array([0, 0], np.int64),
                        "kill": [False, False]})
    with _pytest.raises(Exception, match="updated twice"):
        merge_into(
            rd.from_arrow(pa.Table.from_pandas(tgt)),
            rd.from_arrow(pa.Table.from_pandas(dup)),
            key="k", update_exprs={"bal": "delta"},
        ).materialize()


def test_range_partitioned_export_prunes(ray_session, tmp_path):
    """TeraSort-shape export: balanced ranges, per-file sort, zone-map
    manifest, and a narrow range query opens ONLY the overlapping file(s)
    while returning exactly the brute-force row set."""
    import ray.data as rd

    from gobblin_ray.stages.sorts import (
        range_cut_points,
        range_partitioned_export,
        read_range_pruned,
    )

    rng = np.random.default_rng(7)
    v = rng.permutation(np.linspace(0.0, 100.0, 4000))
    v[::97] = np.nan  # NaN keys carry no range and must be excluded
    t = pa.table({"value": pa.array(v, pa.float64()),
                  "id": pa.array(np.arange(4000), pa.int64())})
    ds = rd.from_arrow(t).repartition(8)

    cuts = range_cut_points(ds, "value", num_ranges=8, digits=4)
    assert cuts == sorted(cuts) and len(cuts) == 7
    out = str(tmp_path / "range_export")
    meta = range_partitioned_export(ds, "value", out, cuts)

    clean = v[~np.isnan(v)]
    assert sum(r["rows"] for r in meta["ranges"]) == clean.size
    # equi-frequency cuts -> balanced ranges (exact quantiles, n % 8 slack)
    for r in meta["ranges"]:
        assert abs(r["rows"] - clean.size / 8) <= 2
    # files are sorted and zone maps truthful; ranges honor the cut fences
    import pyarrow.parquet as pq
    fences = [-np.inf] + list(cuts) + [np.inf]
    for r in meta["ranges"]:
        body = pq.read_table(r["path"]).column("value").to_numpy()
        assert (np.diff(body) >= 0).all()
        assert body[0] == r["vmin"] and body[-1] == r["vmax"]
        assert body[0] >= fences[r["range_id"]]
        assert body[-1] < fences[r["range_id"] + 1] or (
            body[-1] == fences[r["range_id"] + 1])

    lo, hi = float(cuts[2]) + 0.01, float(cuts[3]) - 0.01  # inside range 3
    pruned, files = read_range_pruned(out, lo, hi)
    assert len(files) == 1
    got = np.sort(pruned.to_pandas()["value"].to_numpy())
    want = np.sort(clean[(clean >= lo) & (clean <= hi)])
    np.testing.assert_array_equal(got, want)

    # empty-overlap query opens nothing
    empty, files0 = read_range_pruned(out, 1e9, 2e9)
    assert files0 == [] and empty.count() == 0

    # sketch-based cuts (the 100-TB one-pass path) are monotone and usable
    acuts = range_cut_points(ds, "value", num_ranges=8, digits=4, exact=False)
    assert acuts == sorted(acuts) and len(acuts) == 7


def test_ewma_by_key_bit_identical_to_sequential(ray_session):
    """ewma_by_key on a randomized multi-key corpus vs a per-key
    sequential recurrence using the same (1.0-a)*s + a*x float64 ops —
    must be BIT-identical (the query's recursive-CTE oracle relies on
    it); last_only keeps exactly each key's final state."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import ewma_by_key

    rng = np.random.default_rng(11)
    n, a = 3_000, 0.1
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n),
        "o": rng.permutation(n),
        "x": np.round(rng.normal(10, 4, n), 3),
    })
    ds = rd.from_pandas(df).repartition(7)
    got = ewma_by_key(ds, "k", ["o"], "x", alpha=a,
                      num_partitions=5).to_pandas()

    exp_rows = []
    for k, g in df.sort_values(["k", "o"]).groupby("k"):
        s = None
        for rn, x in enumerate(g["x"].to_numpy(np.float64), start=1):
            s = x if s is None else (1.0 - a) * s + a * x
            exp_rows.append((k, rn, s))
    exp = pd.DataFrame(exp_rows, columns=["k", "rn", "ewma"])
    got = got.sort_values(["k", "rn"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "rn"]).reset_index(drop=True)
    assert len(got) == n
    assert (got["ewma"].to_numpy() == exp["ewma"].to_numpy()).all()  # bits

    last = ewma_by_key(ds, "k", ["o"], "x", alpha=a, last_only=True,
                       num_partitions=5).to_pandas()
    exp_last = exp.loc[exp.groupby("k")["rn"].idxmax()]
    m = last.sort_values("k").reset_index(drop=True)
    e = exp_last.sort_values("k").reset_index(drop=True)
    assert (m["rn"].to_numpy() == e["rn"].to_numpy()).all()
    assert (m["ewma"].to_numpy() == e["ewma"].to_numpy()).all()


def test_mode_by_group_deterministic_ties(ray_session):
    """mode_by_group picks max count then SMALLEST value; identical
    result across partitionings; null keys/values dropped."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.aggregates import mode_by_group

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 4 + [None, "c"],
        "v": [5, 5, 3, 3, 9, 9,        # a: tie 5/3/9 x2 -> smallest = 3
              7, 7, 7, 1,              # b: 7 wins outright
              2, None],                # null key / null value dropped
    })
    df["v"] = df["v"].astype("Int64")
    for parts in (1, 3):
        got = mode_by_group(
            rd.from_pandas(df).repartition(4), "k", "v",
            num_partitions=parts,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert list(got["k"]) == ["a", "b"]
        assert list(got["mode_v"]) == [3, 7]
        assert list(got["n"]) == [2, 3]


def test_ols_by_group_matches_closed_form(ray_session):
    """ols_by_group vs numpy polyfit on a planted linear relation per
    group (exact up to float noise), null rows skipped."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.aggregates import ols_by_group

    rng = np.random.default_rng(5)
    rows = []
    for g, (a, b) in {"g1": (2.5, 10.0), "g2": (-1.0, 3.0)}.items():
        x = rng.integers(1, 50, 400).astype(float)
        y = a * x + b + rng.normal(0, 0.5, 400)
        rows.append(pd.DataFrame({"k": g, "x": x, "y": y}))
    df = pd.concat(rows, ignore_index=True)
    df.loc[0, "y"] = np.nan  # skipped
    got = ols_by_group(rd.from_pandas(df).repartition(5), "k", "x", "y") \
        .to_pandas().set_index("k")
    for g in ("g1", "g2"):
        sub = df[(df["k"] == g) & df["y"].notna()]
        slope, intercept = np.polyfit(sub["x"], sub["y"], 1)
        assert abs(got.loc[g, "slope"] - slope) < 1e-8
        assert abs(got.loc[g, "intercept"] - intercept) < 1e-8
        assert got.loc[g, "n"] == len(sub)


def test_csv_export_null_vs_empty_roundtrip(ray_session, tmp_path):
    """The engine CSV dialect must keep NULL and '' distinct through the
    export_csv -> read_csv_source round trip (the pyarrow default dialect
    collapses both to '', silently merging two groups and breaking the
    export_roundtrip_counts contract on null keys)."""
    import ray.data as rd

    from gobblin_ray.sources.readers import read_csv_source
    from gobblin_ray.stages.sink import export_csv

    t = pa.table({
        "k": pa.array(["a", None, "", "x,y", '"q"'], pa.string()),
        "v": pa.array([1, None, 3, 4, 5], pa.int64()),
    })
    out = str(tmp_path / "csv")
    export_csv(rd.from_arrow(t), out)
    back = read_csv_source(out).to_pandas().sort_values(
        "v", na_position="first").reset_index(drop=True)
    want = t.to_pandas().sort_values(
        "v", na_position="first").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(back, want)


def test_distinct_count_by_window_exact(ray_session):
    """Windowed exact distinct vs a pandas oracle on crafted data with
    repeated keys inside windows, a key spanning windows, nulls, and a
    hot window; invariant across partitionings."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import distinct_count_by_window

    rng = np.random.default_rng(11)
    n = 5000
    base = pd.Timestamp("2026-01-01").value // 1000  # us
    us = base + rng.integers(0, 6 * 3600, n) * 1_000_000
    uid = rng.integers(0, 120, n)
    uid[::50] = 7  # hot user everywhere
    df = pd.DataFrame({
        "ts": pd.to_datetime(us, unit="us"),
        "user_id": uid.astype("int64"),
    })
    df.loc[0, "ts"] = pd.NaT
    df.loc[1, "user_id"] = pd.NA
    df["user_id"] = df["user_id"].astype("Int64")

    valid = df.dropna()
    ts_us = valid["ts"].astype("int64") // 1000  # pandas int64 is ns
    w = (ts_us // 3_600_000_000) * 3_600_000_000
    want = (pd.DataFrame({"w": w, "u": valid["user_id"]})
            .drop_duplicates().groupby("w").size())

    for parts in (3, 17):
        got = distinct_count_by_window(
            rd.from_pandas(df).repartition(parts), "ts", "user_id",
            3600, num_partitions=8).to_pandas()
        got = got.sort_values("window_start").reset_index(drop=True)
        got_us = got["window_start"].astype("int64").to_numpy()
        if got["window_start"].dtype == "datetime64[ns]":
            got_us = got_us // 1000
        assert list(got_us) == list(want.index)
        assert list(got["n_distinct"]) == list(want.values)


def test_cohort_retention_matches_bruteforce(ray_session):
    """cohort_retention vs a pandas oracle: multi-day keys, repeated
    activity in a day collapses, single-day keys land at offset 0 only,
    null rows drop; invariant across partitionings."""
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import cohort_retention

    rng = np.random.default_rng(3)
    n = 4000
    base = pd.Timestamp("2026-02-01").value // 1000
    us = base + rng.integers(0, 14, n) * 86_400_000_000 \
        + rng.integers(0, 86_400, n) * 1_000_000
    uid = rng.integers(0, 80, n)
    df = pd.DataFrame({"ts": pd.to_datetime(us, unit="us"),
                       "user_id": uid.astype("int64")})
    df.loc[5, "ts"] = pd.NaT

    valid = df.dropna()
    d = (valid["ts"].astype("int64") // 1000 // 86_400_000_000)
    a = pd.DataFrame({"u": valid["user_id"], "d": d}).drop_duplicates()
    d0 = a.groupby("u")["d"].min().rename("d0")
    j = a.join(d0, on="u")
    want = (j.assign(off=j["d"] - j["d0"])
            .groupby(["d0", "off"]).size().reset_index(name="n")
            .sort_values(["d0", "off"]).reset_index(drop=True))

    for parts in (2, 13):
        got = cohort_retention(
            rd.from_pandas(df).repartition(parts), "ts", "user_id",
            num_partitions=6).to_pandas()
        got = got.sort_values(["cohort_day", "day_offset"]) \
            .reset_index(drop=True)
        assert list(got["cohort_day"]) == list(want["d0"])
        assert list(got["day_offset"]) == list(want["off"])
        assert list(got["n_users"]) == list(want["n"])


def test_feed_integrity_audit_matches_sequential(ray_session):
    """The window-stitched distributed audit must equal the whole-feed
    sequential definition (sorted distinct seqs: diff>1 = gap; run
    counts>1 = dup), for window sizes that slice the planted defects
    every way: gaps interior to a window, crossing one boundary, and
    swallowing whole windows (driver stitch)."""
    import numpy as np
    import ray.data as rd

    from gobblin_ray.fixtures import planted_feed
    from gobblin_ray.stages.quality import feed_integrity_audit

    path = planted_feed()
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    pid = t.column("partition_id").to_numpy()
    seq = t.column("seq").to_numpy()

    want = set()
    for p in np.unique(pid):
        s = np.sort(seq[pid == p])
        uniq, counts = np.unique(s, return_counts=True)
        for v, c in zip(uniq[counts > 1], counts[counts > 1]):
            want.add((int(p), "dup", int(v), int(v), int(c)))
        d = np.diff(uniq)
        for i in np.flatnonzero(d > 1):
            want.add((int(p), "gap", int(uniq[i]) + 1,
                      int(uniq[i + 1]) - 1, int(d[i]) - 1))

    for window in (64, 256, 1 << 20):  # 1<<20: everything interior
        ds = rd.read_parquet(path, columns=["partition_id", "seq"])
        got_rows = feed_integrity_audit(
            ds, "partition_id", "seq", window=window, num_partitions=8
        ).take_all()
        got = {(r["partition_id"], r["kind"], r["seq_start"],
                r["seq_end"], r["n"]) for r in got_rows}
        assert got == want, f"window={window}"
        assert len(got_rows) == len(got)  # no duplicated findings


def test_resample_ffill_matches_pandas(ray_session):
    """Randomized parity: the one-exchange searchsorted fill must equal
    pandas' per-key resample().ffill() on an irregular multi-key series
    with duplicate timestamps inside buckets and multi-bucket gaps."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import resample_ffill

    rng = np.random.default_rng(7)
    n = 3000
    keys = rng.choice(["a", "b", "c", "longtail"], size=n,
                      p=[0.5, 0.3, 0.15, 0.05])
    base = np.int64(1_700_000_000_000_000)
    # sparse, gappy: hours 0..400 with holes; duplicate ts on purpose
    ts = base + rng.integers(0, 400, n) * 3_600_000_000 \
        + rng.integers(0, 3, n) * 60_000_000
    val = np.round(rng.normal(size=n), 3)
    df = pd.DataFrame({
        "k": keys, "ts": pd.to_datetime(ts, unit="us"), "v": val,
    })

    ds = rd.from_pandas(df)
    got = (
        resample_ffill(ds, "k", "ts", "v", every_s=3600, num_partitions=4)
        .to_pandas().sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    )

    # sequential oracle: per (key, hour) last-by-(ts, v); hourly grid; ffill
    o = df.copy()
    o["h"] = o["ts"].dt.floor("h")
    o = o.sort_values(["k", "h", "ts", "v"]).groupby(["k", "h"], as_index=False).last()
    parts = []
    for k, g in o.groupby("k"):
        g = g.set_index("h").resample("1h").ffill()
        parts.append(pd.DataFrame({
            "k": k, "bucket_ts": g.index, "v": g["v"].to_numpy(),
        }))
    want = (
        pd.concat(parts).sort_values(["k", "bucket_ts"])
        .reset_index(drop=True)
    )
    want["bucket_ts"] = want["bucket_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)


def test_transition_counts_matches_bruteforce(ray_session):
    """Randomized parity vs a sequential pandas lag: per-key ordered
    pairs with duplicate timestamps broken by the unique tiebreaker."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import transition_counts

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n).astype(str),
        "ts": rng.integers(0, 300, n),        # many duplicate ts per key
        "uid": np.arange(n),                  # unique tiebreaker
        "state": rng.choice(["a", "b", "c", "d"], n),
    })

    got = (
        transition_counts(rd.from_pandas(df), "k", ["ts", "uid"], "state",
                          num_partitions=4)
        .to_pandas().sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )

    o = df.sort_values(["k", "ts", "uid"])
    o["prev"] = o.groupby("k")["state"].shift(1)
    want = (
        o.dropna(subset=["prev"]).groupby(["prev", "state"])
        .size().reset_index(name="n")
        .rename(columns={"prev": "from_state", "state": "to_state"})
        .sort_values(["from_state", "to_state"]).reset_index(drop=True)
    )
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_zorder_pruned_read_both_axes(ray_session, tmp_path):
    """Z-order pays on the read: a predicate on EITHER axis must open a
    strict subset of files via the zone maps, and the pruned read plus
    residual filter must return exactly the brute-force rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.sorts import read_zorder_pruned, zorder_export

    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({
        "x": rng.uniform(0, 1000, n),
        "y": rng.uniform(0, 1000, n),
    })
    out = str(tmp_path / "zorder")
    stats = zorder_export(rd.from_pandas(df), "x", "y", out,
                          num_files=16).take_all()
    assert sum(r["rows"] for r in stats) == n

    for axis, rng_q in (("x", (100.0, 200.0)), ("y", (850.0, 900.0))):
        kw = {f"{axis}_range": rng_q}
        ds, opened, total = read_zorder_pruned(out, **kw)
        assert 0 < opened < total, f"no pruning on {axis}"
        got = ds.to_pandas()
        got = got[(got[axis] >= rng_q[0]) & (got[axis] <= rng_q[1])]
        want = df[(df[axis] >= rng_q[0]) & (df[axis] <= rng_q[1])]
        assert len(got) == len(want)
        assert np.isclose(got[axis].sum(), want[axis].sum())

    # both-axis predicate prunes at least as hard as either alone
    ds, opened_xy, total = read_zorder_pruned(
        out, x_range=(100.0, 200.0), y_range=(850.0, 900.0))
    assert opened_xy < total


def test_resample_ffill_int_keys_empty_partitions(ray_session):
    """Numeric keys + num_partitions >> distinct keys: empty hash
    partitions must emit the SAME schema as populated ones (the
    round-3 review's dtype-clash finding)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gobblin_ray.stages.windows import resample_ffill

    rng = np.random.default_rng(5)
    n = 500
    base = np.int64(1_700_000_000_000_000)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n),  # int64 keys, only 3 distinct
        "ts": pd.to_datetime(
            base + rng.integers(0, 48, n) * 3_600_000_000, unit="us"),
        "v": rng.normal(size=n),
    })
    got = resample_ffill(rd.from_pandas(df), "k", "ts", "v",
                         every_s=3600, num_partitions=16).to_pandas()
    assert got["k"].dtype.kind == "i"
    assert len(got) > 0 and got["v"].notna().all()


def test_shuffle_shard_export_properties(ray_session, tmp_path):
    """Shards are disjoint + exhaustive, within-shard order is the coin
    order, and a rerun (any partitioning) rewrites byte-identical files."""
    import hashlib
    import os

    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.sink import shuffle_shard_export

    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array([f"d{i}" for i in range(300)])})
    out = str(tmp_path / "shards")
    res = shuffle_shard_export(
        rd.from_arrow(t).repartition(5), out, n_shards=4,
        key_col="doc_id", salt=":x",
    ).take_all()
    ids = sorted(r["doc_id"] for r in res)
    assert ids == list(range(300))  # exhaustive, disjoint
    # within-shard order == md5 coin order
    by_shard: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["shard_id"], r["position"])):
        by_shard.setdefault(r["shard_id"], []).append(r["doc_id"])
    for sid, got in by_shard.items():
        want = sorted(
            got, key=lambda k: (hashlib.md5(f"{k}:x".encode()).hexdigest(), k)
        )
        assert got == want
    # extra columns ride along; rerun from a different partitioning is
    # byte-identical (deterministic shuffle contract)
    digests = {
        f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out))
    }
    shuffle_shard_export(
        rd.from_arrow(t).repartition(2), out, n_shards=4,
        key_col="doc_id", salt=":x",
    ).take_all()
    digests2 = {
        f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out))
    }
    assert digests == digests2


def test_shuffle_shard_export_clears_stale_output(ray_session, tmp_path):
    """A rerun with fewer shards must not leave (or read back) stale
    shard files from the previous parameterization."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from gobblin_ray.stages.sink import shuffle_shard_export

    t = pa.table({"doc_id": pa.array(range(120), pa.int64())})
    out = str(tmp_path / "restale")
    shuffle_shard_export(rd.from_arrow(t), out, n_shards=8,
                         key_col="doc_id").take_all()
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 8
    res = shuffle_shard_export(rd.from_arrow(t), out, n_shards=2,
                               key_col="doc_id").take_all()
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 2  # stale shard-00002..7 removed
    assert sorted(r["doc_id"] for r in res) == list(range(120))


# ------------------------------------------------- cluster-wide throttling

def test_throttle_service_bucket_math(monkeypatch):
    """Deterministic unit test of the shared token-bucket math (refill,
    burst cap, pay-then-wait debt) with a controlled clock."""
    from gobblin_ray.stages import limiter as lm

    clock = {"t": 100.0}
    monkeypatch.setattr(lm.time, "monotonic", lambda: clock["t"])
    svc = lm.ThrottleService(rows_per_sec=100, burst=50)
    assert svc.acquire(50) == 0.0          # burst covers it
    assert svc.acquire(100) == 1.0         # 100-permit debt at 100/s
    clock["t"] += 1.0                      # debt refilled exactly
    assert svc.acquire(10) == 0.1
    clock["t"] += 1000.0                   # long idle: refill caps at burst
    assert svc.acquire(60) == 0.1          # 50-burst bucket, not 100k
    assert svc.stats()["granted"] == 220


def test_throttle_service_shared_across_pipelines(ray_session):
    """Two CONCURRENT pipelines drawing from ONE ThrottleService together
    honor the single budget (the gobblin-restli-throttling shared-server
    semantics): 10k rows at 2000 rows/s with a 2000 burst cannot finish
    faster than ~4 s, while independent per-pipeline budgets would finish
    in ~half that. Lower-bound assert only (sleeps can stretch but never
    shrink)."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from gobblin_ray.stages.limiter import (limited_shared,
                                            start_throttle_service)

    svc = start_throttle_service(rows_per_sec=2000, burst=2000)

    def run_one(tag: int) -> int:
        ds = rd.from_arrow(pa.table({
            "x": pa.array(np.arange(5000) + tag, pa.int64())
        })).repartition(10)
        return limited_shared(ds, svc, concurrency=1, batch_size=500,
                              num_cpus=0.25).count()

    t0 = _time.monotonic()
    with ThreadPoolExecutor(2) as ex:
        counts = list(ex.map(run_one, [0, 1_000_000]))
    elapsed = _time.monotonic() - t0
    assert counts == [5000, 5000]
    # one shared budget: (10000 - 2000 burst) / 2000 = 4 s floor (minus
    # scheduling slack); a split-budget bug halves it
    assert elapsed >= 3.0, f"finished in {elapsed:.2f}s — budget not shared"
    assert ray.get(svc.stats.remote())["granted"] == 10000


def test_export_orc_identical_blocks_both_land(ray_session, tmp_path):
    """Two byte-identical blocks must produce two ORC files (block
    ordinal in the name): the old content-only naming silently collapsed
    them into one file while the lineage still reported both blocks'
    rows."""
    import ray
    import ray.data as rd

    from gobblin_ray.sources.readers import read_orc_source
    from gobblin_ray.stages.sink import export_orc

    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    ds = rd.from_arrow_refs([ray.put(t), ray.put(t)])
    out = str(tmp_path / "orc_dup")
    lineage = export_orc(ds, out)
    assert sum(r["rows"] for r in lineage.take_all()) == 4
    back = read_orc_source(out)
    assert back.count() == 4
