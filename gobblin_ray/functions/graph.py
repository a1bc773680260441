"""Distributed graph analytics over Ray Data.

PageRank is THE canonical iterative join+aggregate workload (Page et al.
1999, "The PageRank citation ranking"): each round every node sends
rank/out_degree along its out-edges and new ranks fold the incoming
sums. At web scale the rank vector is as big as the node set, so it can
NEVER be broadcast — the only shape that holds at 10^10 edges is the one
here: co-partition ranks with edges by source through ONE bounded
exchange (contributions computed partition-locally), then ONE
combiner-pre-aggregated groupby-sum by destination. 2 exchanges per
iteration, payload 2 ints/edge, no driver-side state at all.

Reference analog: Gobblin has no graph operators (SURVEY §2 gap-class);
this is a beyond-reference addition in the large-scale-pipeline family.

Exactness: computed entirely in scaled int64 — r0 = SCALE, contribution
= r // out_degree, r' = (15·SCALE)//100 + (85·sum)//100. Integer sums
are addition-order independent, so the result is bit-identical across
partitionings AND expressible in exact SQL (``//`` floor division), no
float tolerance anywhere. With SCALE = 10^9 the quantization error per
node per round is < 2e-9 of total mass; overflow headroom holds to
in-degrees of ~10^7 at rank ~SCALE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000_000


def pagerank(nodes, edges, node_col: str = "node", src_col: str = "src",
             dst_col: str = "dst", iterations: int = 3,
             scale: int = SCALE, damp_num: int = 85, damp_den: int = 100,
             num_partitions: int = 32):
    """Iterative PageRank: returns a Dataset (node_col, "pr") of scaled
    int64 ranks after ``iterations`` rounds.

    ``nodes`` must list every node once; ``edges`` rows are directed
    (src, dst) — parallel edges each carry a contribution. Dangling
    nodes (no out-edges) simply drop their mass, dangling DESTINATIONS
    (no in-edges) get the base rank: both the standard simplification.
    Edges whose src is not a node are ignored; dst values MUST be nodes
    (a phantom dst would materialize as a new node next round — semi-join
    edges against the node set upstream if the graph is dirty).

    Scale notes: ``edges`` is materialized once up front so the lineage
    (a synth/read chain) doesn't re-execute each round; the object store
    spills if the edge table outgrows memory, and at real scale persist
    edges to Parquet once instead. The per-iteration groupby("_kp")
    partitions are
    bounded by hash(node) % P, never per-key; the dst-sum uses Ray's
    native combiner tree so only O(distinct dst per block) rows cross
    the second exchange."""
    from ..schema import unify_additive
    from ..stages.joins import _co_partition

    base = (scale * (damp_den - damp_num)) // damp_den

    # Block-count hygiene: every iteration's sort-shuffles pay a per-block
    # constant, and reads on a many-CPU node split into far more blocks
    # than the exchange is wide — pin both inputs to the exchange width so
    # barrier cost is O(num_partitions) per round, not O(read splits)
    # compounding through the unions (measured 45s -> 8s on 5k nodes).
    nodes = nodes.repartition(num_partitions)
    edges = edges.repartition(num_partitions).materialize()
    ranks = nodes.map_batches(
        lambda t, s=scale: t.select([node_col]).append_column(
            "r", pa.array(np.full(t.num_rows, s, np.int64))),
        batch_format="pyarrow", batch_size=None,
    )
    r_schema = pa.schema([(node_col, pa.int64()), ("r", pa.int64())])
    e_schema = pa.schema([(src_col, pa.int64()), (dst_col, pa.int64())])
    union_schema = unify_additive(r_schema, e_schema).append(
        pa.field("_side", pa.string())
    )

    def contribute(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"]
        rg = g[g["_side"] == "r"]
        # seed rows keep zero-in-degree nodes present in the next fold
        seeds = pd.DataFrame({
            node_col: lg[node_col].to_numpy(np.int64),
            "c": np.zeros(len(lg), np.int64),
        })
        if rg.empty:
            return pa.Table.from_pandas(seeds, preserve_index=False)
        deg = rg.groupby(src_col, sort=False)[dst_col].transform(
            "size").to_numpy(np.int64)
        # LEFT join keeps len == len(rg) positionally aligned with deg;
        # edges whose src is not a node (phantom src) drop via the mask.
        # Nullable Int64 (not float64 + NaN upcast) so ranks past 2^53
        # survive the join exactly
        lr = lg[[node_col, "r"]].copy()
        lr["r"] = lr["r"].astype("Int64")
        m = rg[[src_col, dst_col]].merge(
            lr, left_on=src_col, right_on=node_col,
            how="left", sort=False,
        )
        kept = m["r"].notna().to_numpy()
        contrib = pd.DataFrame({
            node_col: m[dst_col].to_numpy(np.int64)[kept],
            "c": m["r"].to_numpy()[kept].astype(np.int64) // deg[kept],
        })
        out = pd.concat([seeds, contrib], ignore_index=True)
        # per-partition pre-sum: one row per dst leaves the partition, and
        # the downstream exchange aggregates ARROW blocks (the pandas-block
        # aggregate path is measurably slower per block)
        out = out.groupby(node_col, sort=False, as_index=False)["c"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    contribute.__name__ = "pr_contribute"

    for _ in range(iterations):
        both = _co_partition(
            [(ranks, "l", node_col, [node_col]),
             (edges, "r", src_col, [src_col, dst_col])],
            union_schema, num_partitions,
        )
        contribs = both.groupby("_kp").map_groups(
            lambda g: contribute(g.drop(columns=["_kp"])),
            batch_format="pandas",
        )
        summed = contribs.groupby(node_col).sum("c")

        def fold(t: pa.Table, b=base, dn=damp_num, dd=damp_den) -> pa.Table:
            s = pc.cast(t.column("sum(c)"), pa.int64())
            r = pc.add(b, pc.divide(pc.multiply(s, dn), dd))
            return pa.table({node_col: t.column(node_col), "r": r})

        fold.__name__ = "pr_fold"
        # re-pin the block count: the union doubles it every round otherwise
        ranks = summed.map_batches(fold, batch_format="pyarrow",
                                   batch_size=None).repartition(num_partitions)

    return ranks.map_batches(
        lambda t: t.rename_columns([node_col, "pr"]),
        batch_format="pyarrow", batch_size=None,
    )


# Public re-export: distributed min-label propagation (one groupby per
# round, edges never collected on the driver) — shared with the near-dup
# clustering path. See functions/dedup.connected_components for the
# algorithm and convergence contract.
from .dedup import connected_components  # noqa: E402,F401


def bfs_distances(edges, sources, src_col: str = "src",
                  dst_col: str = "dst", node_col: str = "node",
                  max_depth: int = 16, num_partitions: int = 32):
    """Multi-source BFS hop distances over a directed unit-weight graph:
    returns a Dataset ``(node_col, "dist")`` with the MINIMUM hop count
    from any source, for every node reachable within ``max_depth``.
    ``sources`` is a Dataset with one ``node_col`` column.

    The frontier-synchronous (level-synchronous / Pregel top-down) BFS:
    at round k the frontier is EXACTLY the nodes first reached at
    distance k — unit weights make discovery monotone by round, so a
    node never needs re-relaxation and the new frontier is simply the
    fold rows whose min dist == k+1 (no anti-join against the visited
    set). Reference analog: none (Gobblin has no graph operators) —
    beyond-reference addition alongside pagerank/connected_components.

    Scale shape, per round: ONE bounded co-partition exchange joins the
    frontier against edges by source (partitions = hash(node) %
    num_partitions, never per-key), messages are deduped per partition
    before leaving (O(distinct dst per partition) rows), then a
    combiner-pre-aggregated min-groupby folds messages into the distance
    table. The distance table is materialized each round — it is the
    algorithm's REQUIRED state, O(reached nodes) x 16 bytes (the same
    posture as connected_components' label table), and materializing
    keeps the iterative lineage from re-executing all prior rounds on
    every count. Driver state: one frontier COUNT per round (O(1)).
    Edge dst values must be nodes (a phantom dst materializes as a new
    node — semi-join dirty graphs upstream, same contract as pagerank).
    """
    from ..schema import unify_additive
    from ..stages.joins import _co_partition
    from ..stages.partition import keyed_map_groups

    # materialize the repartitioned edges ONCE: every one of up to
    # max_depth rounds re-reads them inside _co_partition, and an
    # unmaterialized lineage (a read + synth chain in bfs_documents)
    # would re-execute per round; at real graph scale persist edges to
    # Parquet instead (same contract as pagerank)
    edges = edges.repartition(num_partitions).materialize()
    dist = sources.map_batches(
        lambda t: pa.table({
            node_col: t.column(node_col).cast(pa.int64()),
            "dist": pa.array(np.zeros(t.num_rows, np.int64)),
        }),
        batch_format="pyarrow", batch_size=None,
    ).materialize()

    f_schema = pa.schema([(node_col, pa.int64())])
    e_schema = pa.schema([(src_col, pa.int64()), (dst_col, pa.int64())])
    union_schema = unify_additive(f_schema, e_schema).append(
        pa.field("_side", pa.string())
    )

    def relax(g: pd.DataFrame, k: int) -> pa.Table:
        fr = g[g["_side"] == "l"][node_col].to_numpy(np.int64)
        eg = g[g["_side"] == "r"]
        if not len(fr) or eg.empty:
            return pa.table({node_col: pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        m = np.isin(eg[src_col].to_numpy(np.int64), fr)
        # per-partition dedup: one row per discovered dst leaves here
        dsts = np.unique(eg[dst_col].to_numpy(np.int64)[m])
        return pa.table({
            node_col: pa.array(dsts),
            "dist": pa.array(np.full(len(dsts), k + 1, np.int64)),
        })

    frontier = dist
    for k in range(max_depth):
        if frontier.count() == 0:
            break
        both = _co_partition(
            [(frontier.select_columns([node_col]), "l", node_col,
              [node_col]),
             (edges, "r", src_col, [src_col, dst_col])],
            union_schema, num_partitions,
        )
        msgs = both.groupby("_kp").map_groups(
            lambda g, k=k: relax(g.drop(columns=["_kp"]), k),
            batch_format="pandas",
        )
        # fold: node is a HIGH-cardinality key, so never hand it to Ray's
        # groupby (its sort exchange degenerates on O(nodes) groups —
        # the repo-wide rule from the fuzzy-join A/B); route hash(node)
        # through ONE bounded exchange and let pyarrow's C++ hash groupby
        # resolve nodes inside each partition. Output is P blocks, which
        # also keeps the per-round block count pinned (without a pin the
        # round wall grew 2s -> 158s by round 7 on a 500-node graph).
        def fold_min(t: pa.Table) -> pa.Table:
            agg = pa.TableGroupBy(t, node_col).aggregate([("dist", "min")])
            return pa.table({
                node_col: agg.column(node_col).cast(pa.int64()),
                "dist": agg.column("dist_min").cast(pa.int64()),
            })

        fold_min.__name__ = "bfs_fold_min"
        # re-pin the block count before materializing: map_groups emits
        # ~2x its input blocks and the union feeds them back in, so
        # without the repartition the per-round sort pays a DOUBLING
        # per-block constant (measured blocks 10 -> 568 and round wall
        # 5s -> 34s by round 6 on a 500-node graph; flat with the pin)
        dist = keyed_map_groups(
            dist.union(msgs), node_col, fold_min,
            num_partitions=num_partitions, batch_format="pyarrow",
        ).repartition(num_partitions).materialize()
        frontier = dist.map_batches(
            lambda t, kk=k + 1: t.filter(pc.equal(t.column("dist"), kk)),
            batch_format="pyarrow", batch_size=None,
        )
    return dist


def count_triangles(edges, a_col: str = "a", b_col: str = "b",
                    num_partitions: int = 32):
    """Exact triangle count of an undirected simple graph — the
    node-iterator / oriented-wedge MR algorithm (Suri & Vassilvitskii
    2011, "Counting triangles and the curse of the last reducer"):

    1) orient every edge low->high (self-loops dropped; duplicate edges
       deduped in-partition AFTER the exchange, so dirty input is fine);
    2) co-partition edges by the LOW endpoint and emit every wedge
       (b_i, b_j) centered there — vectorized as shift-compare passes
       (one pass per neighbor-rank distance, each a whole-partition numpy
       compare), never per-node dispatch;
    3) ONE union exchange of wedges + edges on a pair hash; a wedge that
       meets its closing edge is a triangle (x<y<z counted exactly once).

    Exchange-2 payload is O(#wedges) = O(sum_v deg(v)^2 / 2) int pairs.
    The web-scale mitigation is orienting by (degree, id) instead of id —
    wedges then center on the lower-degree endpoint and the bound drops
    to O(m^{3/2}) (same paper) — a one-line change to the orient step,
    kept id-oriented here so the SQL oracle is a plain 3-way self-join.
    Node ids must fit uint32 (pairs pack into one uint64 for the
    vectorized membership probe). Returns a one-row Dataset
    ``{"triangles": int64}`` — the count is driver-sized by definition.
    """
    from ..stages.partition import key_partition  # noqa: F401 (same idiom)

    P = int(num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        return pa.table({
            "x": pa.array(lo), "y": pa.array(hi),
            "_kp": pa.array((lo % P).astype(np.int32)),
        })

    orient.__name__ = "orient_edges"

    def wedges(g: pa.Table) -> pa.Table:
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        uniq = np.ones(len(x), bool)
        uniq[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1])
        x, y = x[uniq], y[uniq]
        out_a, out_b = [], []
        d, n = 1, len(x)
        while d < n:  # loop depth = max degree IN THIS PARTITION
            m = x[: n - d] == x[d:]
            if not m.any():
                break
            out_a.append(y[: n - d][m])  # sorted neighbors => a < b
            out_b.append(y[d:][m])
            d += 1
        wa = (np.concatenate(out_a) if out_a else np.array([], np.int64))
        wb = (np.concatenate(out_b) if out_b else np.array([], np.int64))
        side = np.concatenate([
            np.zeros(len(x), np.int8), np.ones(len(wa), np.int8)
        ])
        px = np.concatenate([x, wa])
        py = np.concatenate([y, wb])
        kp = ((px.astype(np.uint64) * np.uint64(2654435761) +
               py.astype(np.uint64)) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "px": pa.array(px), "py": pa.array(py),
            "_is_wedge": pa.array(side), "_kp2": pa.array(kp),
        })

    wedges.__name__ = "emit_wedges"

    def close(g: pa.Table) -> pa.Table:
        px = g.column("px").to_numpy(zero_copy_only=False).astype(np.uint64)
        py = g.column("py").to_numpy(zero_copy_only=False).astype(np.uint64)
        if (px >= (1 << 32)).any() or (py >= (1 << 32)).any():
            raise ValueError("count_triangles: node ids must fit uint32")
        packed = (px << np.uint64(32)) | py
        is_w = g.column("_is_wedge").to_numpy(zero_copy_only=False) == 1
        eset = np.unique(packed[~is_w])
        n = int(np.isin(packed[is_w], eset, assume_unique=False).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    close.__name__ = "close_wedges"
    partials = (
        edges.map_batches(orient, batch_format="pyarrow", batch_size=None)
        .groupby("_kp").map_groups(wedges, batch_format="pyarrow")
        .groupby("_kp2").map_groups(close, batch_format="pyarrow")
    )
    import ray.data as rd
    from ray.data.aggregate import Sum

    total = partials.aggregate(Sum(on="n", alias_name="triangles"))
    val = int((total or {}).get("triangles") or 0)
    return rd.from_arrow(pa.table({"triangles": pa.array([val], pa.int64())}))


def resolve_chains(edges, src_col: str = "src", dst_col: str = "dst",
                   max_rounds: int = 20, num_partitions: int = 32,
                   on_cycle: str = "null"):
    """Resolve every node of a FUNCTIONAL graph (each src has exactly one
    outgoing edge) to its terminal destination by distributed pointer
    jumping — the redirect-chain resolution a web-crawl CDC pipeline runs
    so the lake keys on canonical final urls, not hop-by-hop 301 targets.

    Returns a Dataset ``(node, final_dst, hops)``: for every src in
    ``edges``, the end of its redirect chain and the number of edges
    walked. Nodes on (or draining into) a CYCLE have no terminal;
    ``on_cycle='null'`` emits them with null final_dst/hops,
    ``on_cycle='raise'`` raises.

    Reference analog: none (Gobblin has no graph operators) — beyond-
    reference addition alongside pagerank / bfs / connected_components.

    Scale shape: classic pointer doubling (Wyllie 1979 list ranking) —
    each round every unresolved pointer jumps to its pointer's pointer,
    so a chain of length L resolves in ceil(log2 L)+1 rounds, each round
    ONE bounded co-partition exchange (state keyed on ptr joined against
    state keyed on node, partitions = hash % P, never per-key dispatch)
    with payload 4 ints/row. The state table is O(srcs) and materialized
    per round (required iterative state, same posture as bfs_distances'
    distance table); resolved rows stop crossing the exchange. Driver
    state: one unresolved COUNT per round.

    Precondition: ``src_col`` values are unique (functional graph). A
    duplicated src would make the per-partition lookup multiply rows;
    dedup upstream (e.g. LWW on the redirect feed) first.
    """
    from ..schema import unify_additive
    from ..stages.joins import _co_partition

    if on_cycle not in ("null", "raise"):
        raise ValueError(f"on_cycle must be 'null'|'raise', got {on_cycle!r}")

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column(src_col).cast(pa.int64()),
            "ptr": t.column(dst_col).cast(pa.int64()),
            "hops": pa.array(np.ones(t.num_rows, np.int64)),
            "done": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    state = (
        edges.map_batches(init, batch_format="pyarrow", batch_size=None)
        .repartition(num_partitions).materialize()
    )
    # an acyclic chain over n edges is at most n hops long, and doubling
    # resolves distance d in ceil(log2 d)+1 rounds — so after
    # ceil(log2 n)+2 rounds anything still active is PROVABLY on or
    # draining into a cycle; don't burn the remaining max_rounds on it.
    # If max_rounds is the binding term instead, leftovers are merely
    # UNRESOLVED (chains longer than 2^(max_rounds-1) exist) — the error
    # message below distinguishes the two.
    n_edges = state.count()
    log_bound = int(np.ceil(np.log2(max(n_edges, 2)))) + 2
    rounds = min(max_rounds, log_bound)

    l_schema = pa.schema([
        ("node", pa.int64()), ("ptr", pa.int64()),
        ("hops", pa.int64()), ("done", pa.int8()),
    ])
    r_schema = pa.schema([
        ("rnode", pa.int64()), ("rptr", pa.int64()),
        ("rhops", pa.int64()), ("rdone", pa.int8()),
    ])
    union_schema = unify_additive(l_schema, r_schema).append(
        pa.field("_side", pa.string())
    )

    def as_rhs(t: pa.Table) -> pa.Table:
        return t.rename_columns(["rnode", "rptr", "rhops", "rdone"])

    def take_done(t: pa.Table, want: int) -> pa.Table:
        return t.filter(pc.equal(t.column("done"), want))

    def jump(g: pd.DataFrame) -> pa.Table:
        l = g[g["_side"] == "l"]
        r = g[g["_side"] == "r"]
        m = l[["node", "ptr", "hops"]].merge(
            r[["rnode", "rptr", "rhops", "rdone"]],
            left_on="ptr", right_on="rnode", how="left",
        )
        found = m["rnode"].notna().to_numpy()
        ptr = m["ptr"].to_numpy(np.int64)
        hops = m["hops"].to_numpy(np.int64)
        rptr = m["rptr"].to_numpy(na_value=0).astype(np.int64)
        rhops = m["rhops"].to_numpy(na_value=0).astype(np.int64)
        rdone = m["rdone"].to_numpy(na_value=0).astype(np.int64)
        return pa.table({
            "node": pa.array(m["node"].to_numpy(np.int64)),
            "ptr": pa.array(np.where(found, rptr, ptr)),
            "hops": pa.array(hops + np.where(found, rhops, 0)),
            "done": pa.array(
                np.where(found, rdone, 1).astype(np.int8)),
        })

    for _ in range(rounds):
        active = state.map_batches(
            lambda t: take_done(t, 0), batch_format="pyarrow",
            batch_size=None,
        )
        if active.count() == 0:
            break
        finished = state.map_batches(
            lambda t: take_done(t, 1), batch_format="pyarrow",
            batch_size=None,
        )
        both = _co_partition(
            [(active, "l", "ptr", ["ptr"]),
             (state.map_batches(as_rhs, batch_format="pyarrow",
                                batch_size=None), "r", "rnode", ["rnode"])],
            union_schema, num_partitions,
        )
        jumped = both.groupby("_kp").map_groups(
            lambda g: jump(g.drop(columns=["_kp"])), batch_format="pandas",
        )
        # re-pin blocks before materializing (map_groups ~doubles block
        # count per round; the bfs-measured degeneration without a pin)
        state = (
            finished.union(jumped)
            .repartition(num_partitions).materialize()
        )
    else:
        leftover = state.map_batches(
            lambda t: take_done(t, 0), batch_format="pyarrow",
            batch_size=None,
        ).count()
        if leftover and on_cycle == "raise":
            if rounds >= log_bound:
                raise ValueError(
                    f"resolve_chains: {leftover} nodes unresolved after "
                    f"{rounds} rounds — cycle in the redirect graph"
                )
            raise ValueError(
                f"resolve_chains: {leftover} nodes unresolved after "
                f"{rounds} rounds — max_rounds={max_rounds} is below the "
                f"provable bound {log_bound}; raise it to distinguish "
                "long chains from cycles"
            )

    def finish(t: pa.Table) -> pa.Table:
        done = pc.equal(t.column("done"), 1)
        return pa.table({
            "node": t.column("node"),
            "final_dst": pc.if_else(done, t.column("ptr"),
                                    pa.scalar(None, pa.int64())),
            "hops": pc.if_else(done, t.column("hops"),
                               pa.scalar(None, pa.int64())),
        })

    return state.map_batches(finish, batch_format="pyarrow",
                             batch_size=None)
