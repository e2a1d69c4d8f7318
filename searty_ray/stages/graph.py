"""Iterative vertex-program operators over edge tables — PageRank in exact
integer fixed-point arithmetic.

The reference engine has no graph surface (its only transitive structure is
the merge-time docId remap); this is net-new training-data machinery: link-
graph page scoring is a standard web-corpus quality prior (the original
PageRank use), and the same Pregel shape carries label propagation.

Algorithm: power iteration in MICRO-UNIT int64 arithmetic so every value is
bit-exact and the DuckDB oracle pins the whole matrix:

    r_0(v)     = 1_000_000
    r_{t+1}(v) = base_micro + Σ_{(u,v)∈E}  (r_t(u) · damp_pct) // (100 · outdeg(u))

(integer floor division — both sides compute the identical int64, no float
ever enters).  With base_micro = 150_000 and damp_pct = 85 this is the
standard d=0.85 PageRank up to the 1e6 scale factor.

Scale shape (the Pregel split):

* adjacency build: ONE edge-scale hash shuffle groups out-edges by source;
  inside each coarse partition the per-source destination lists are sliced
  zero-copy out of one sorted int64 buffer into a ``large_binary`` column
  (Acero joins reject list-typed payloads — NOTES item 6 — and bytes round-
  trip exactly).  One adjacency ROW per vertex, edge bytes as payload.
* per iteration: ONE vertex-scale hash join (ranks ⋈ adjacency on the
  vertex id) and ONE exchange of (dst, contribution) partials back to
  vertex scale.  The emit stage pre-combines per batch (factorize +
  bincount), so the exchange carries ≤ distinct-dst rows per batch, not
  one row per edge.  Iteration boundaries ``materialize()`` — re-executing
  a lazy 5-deep join lineage would be quadratic, and >1 live native-join
  aggregator pool deadlocks small sessions (NOTES item 6).
* nothing vertex- or edge-scale ever reaches the driver; the loop is a
  fixed iteration count (the classic fixed-budget production shape).

Partitioning contract: every vertex must have outdeg ≥ 1 (true for
symmetrised/undirected edge sets, which is how the gate derives its graph;
for directed graphs with sinks, pre-drop or self-loop them).  Dangling
mass is NOT redistributed — both the engine and the SQL mirror drop it,
which keeps the arithmetic exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

PR_ITERATIONS = 5
PR_DAMP_PCT = 85
PR_BASE_MICRO = 150_000
PR_INIT_MICRO = 1_000_000
NUM_PARTITIONS = 64


def _adjacency(edges: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """(src, dst) edges → one row per src: (node, deg, dst_bytes) with the
    destination ids packed little-endian int64 into ``large_binary``."""
    from .analytics import _pk_any

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["src", "dst"]].copy()
        out["__pk"] = _pk_any(b["src"], num_partitions)
        return out

    def pack(g: pd.DataFrame) -> pa.Table:
        src = g["src"].to_numpy(np.int64)
        dst = g["dst"].to_numpy(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        nodes, starts = np.unique(src, return_index=True)
        ends = np.append(starts[1:], len(src))
        # zero-copy large_binary: the sorted dst buffer IS the values
        # buffer; per-node byte ranges are the int64 offsets × 8
        offsets = np.append(starts, len(src)).astype(np.int64) * 8
        vals = pa.py_buffer(dst.tobytes())
        adj = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(nodes), [None, pa.py_buffer(offsets.tobytes()), vals]
        )
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "deg": pa.array((ends - starts).astype(np.int64), type=pa.int64()),
                "dst_bytes": adj,
            }
        )

    return (
        edges.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(pack, batch_format="pandas")
    )


def _fan(share: np.ndarray, col) -> "pa.Table":
    """Fan per-vertex int64 values to packed out-neighbors and sum-combine
    batch-locally (sorted reduceat, EXACT int64 — no float): ≤ distinct-dst
    rows leave the stage.  The shared emit kernel of the Pregel operators."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset :] // 8
    buf = np.frombuffer(arr.buffers()[2], dtype=np.int64)
    counts = np.diff(offs[: len(arr) + 1])
    dst_all = buf[offs[0] : offs[len(arr)]]
    share_all = np.repeat(share, counts)
    order = np.argsort(dst_all, kind="stable")
    uniq, bounds = np.unique(dst_all[order], return_index=True)
    exact = np.add.reduceat(share_all[order], bounds)
    return pa.table(
        {
            "dst": pa.array(uniq, type=pa.int64()),
            "c": pa.array(exact.astype(np.int64), type=pa.int64()),
        }
    )


def pagerank(
    edges: ray.data.Dataset,
    iterations: int = PR_ITERATIONS,
    damp_pct: int = PR_DAMP_PCT,
    base_micro: int = PR_BASE_MICRO,
    num_partitions: int = NUM_PARTITIONS,
    mode: str = "auto",
    broadcast_below: int = 2_000_000,
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over an edge Dataset with columns
    ``(src, dst)`` (int64 vertex ids, outdeg ≥ 1 per the module contract).
    Returns a Dataset of ``(node, rank_micro)``.

    ``mode``: ``"join"`` runs each iteration as a vertex-scale hash join —
    the any-scale path; ``"broadcast"`` ships the rank vector via
    ``ray.put`` and looks it up with a searchsorted inside the adjacency
    map — one join pool per iteration saved, rank state driver-resident
    (the bounded contract: ≤ ``broadcast_below`` vertices, the ranged-
    window-seed precedent).  ``"auto"`` picks broadcast below the
    threshold.  Both modes are bit-identical (pinned by pytest)."""
    import ray as _ray

    from .joins import adaptive_join_partitions, hash_join

    adj = _adjacency(edges, num_partitions).materialize()
    n_nodes = adj.count()
    use_bcast = mode == "broadcast" or (mode == "auto" and n_nodes <= broadcast_below)

    _EMPTY = pa.table(
        {"dst": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
    )

    if use_bcast:
        nodes_df = (
            adj.select_columns(["node"]).to_pandas()  # ≤ broadcast_below rows
        )
        nodes = np.sort(nodes_df["node"].to_numpy(np.int64))
        r = np.full(len(nodes), PR_INIT_MICRO, dtype=np.int64)
        for _ in range(iterations):
            ref = _ray.put((nodes, r))
            _cache: dict = {}

            def emit_bcast(b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return _EMPTY
                if "nr" not in _cache:
                    _cache["nr"] = _ray.get(ref)
                bn, br = _cache["nr"]
                node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
                deg = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
                rv = br[np.searchsorted(bn, node)]
                share = (rv * np.int64(damp_pct)) // (np.int64(100) * deg)
                return _fan(share, b["dst_bytes"])

            # per-batch partials are already ≤ distinct-dst rows; in
            # broadcast mode the rank state is driver-resident anyway, so
            # the final combine is a vertex-scale bincount on the driver —
            # no per-iteration aggregate pool (the join path keeps the
            # distributed groupby for the any-scale contract)
            parts = adj.map_batches(emit_bcast, batch_format="pyarrow").to_pandas()
            r = np.full(len(nodes), base_micro, dtype=np.int64)
            idx = np.searchsorted(nodes, parts["dst"].to_numpy(np.int64))
            np.add.at(r, idx, parts["c"].to_numpy(np.int64))
        ranks = ray.data.from_pandas(
            pd.DataFrame({"node": nodes, "r": r})
        )
    else:
        jp = adaptive_join_partitions(n_nodes)

        def init_ranks(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"],
                    "r": pa.array(
                        np.full(b.num_rows, PR_INIT_MICRO, dtype=np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        ranks = (
            adj.select_columns(["node"])
            .map_batches(init_ranks, batch_format="pyarrow")
            .materialize()
        )

        def emit(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _EMPTY
            r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            deg = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            share = (r * np.int64(damp_pct)) // (np.int64(100) * deg)
            return _fan(share, b["dst_bytes"])

        for _ in range(iterations):
            joined = hash_join(ranks, adj, on="node", num_partitions=jp)
            sums = (
                joined.map_batches(emit, batch_format="pyarrow")
                .groupby("dst")
                .aggregate(Sum("c", alias_name="s"))
            )

            def next_ranks(b: pa.Table) -> pa.Table:
                s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64)
                return pa.table(
                    {
                        "node": b["dst"],
                        "r": pa.array(s + np.int64(base_micro), type=pa.int64()),
                    }
                )

            ranks = sums.map_batches(next_ranks, batch_format="pyarrow").materialize()

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "rank_micro": b["r"]})

    return ranks.map_batches(out, batch_format="pyarrow")


CC_ITERATIONS = 8


def connected_components(
    edges: ray.data.Dataset,
    iterations: int = CC_ITERATIONS,
    num_partitions: int = NUM_PARTITIONS,
    mode: str = "auto",
    broadcast_below: int = 2_000_000,
    until_convergence: bool = False,
) -> ray.data.Dataset:
    """Connected components by min-label propagation — the label-propagation
    sibling of :func:`pagerank` on the same Pregel split (one adjacency
    build, one vertex-scale exchange per superstep).

    ``label_0(v) = v``; each superstep takes the min over the vertex's own
    label and its in-neighbors' labels, so ``label_K(v)`` is exactly the
    minimum vertex id within K hops.  On a symmetric edge set the fixpoint
    is the component's min id (the canonical cluster id — same contract as
    ``cluster.duplicate_clusters`` on near-dup pairs, generalized to any
    edge table).  ``until_convergence=True`` iterates to that fixpoint
    (ONE int64 scalar — the number of changed labels — reaches the driver
    per superstep); the default fixed budget keeps the result a pure
    K-step recurrence a chained-CTE SQL oracle pins bit-exactly.

    SCALE: identical to pagerank — per superstep the fan stage pre-combines
    (sorted ``minimum.reduceat``), so the exchange carries ≤ distinct-dst
    rows per batch, never one row per edge.  Broadcast mode holds the
    label vector driver-resident (bounded contract: ≤ ``broadcast_below``
    vertices); join mode is the any-scale path.  Bit-identical (pinned by
    pytest).  Returns ``(node, comp)``."""
    import ray as _ray

    from ray.data.aggregate import Min

    from .joins import adaptive_join_partitions, hash_join

    adj = _adjacency(edges, num_partitions).materialize()
    n_nodes = adj.count()
    use_bcast = mode == "broadcast" or (mode == "auto" and n_nodes <= broadcast_below)

    _EMPTY = pa.table(
        {"dst": pa.array([], type=pa.int64()), "lbl": pa.array([], type=pa.int64())}
    )

    def _fan_min(lbl: np.ndarray, col) -> pa.Table:
        # fan per-vertex labels to packed out-neighbors, min-combine
        # batch-local: ≤ distinct-dst rows leave the stage
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset :] // 8
        buf = np.frombuffer(arr.buffers()[2], dtype=np.int64)
        counts = np.diff(offs[: len(arr) + 1])
        dst_all = buf[offs[0] : offs[len(arr)]]
        lbl_all = np.repeat(lbl, counts)
        order = np.argsort(dst_all, kind="stable")
        uniq, bounds = np.unique(dst_all[order], return_index=True)
        mins = np.minimum.reduceat(lbl_all[order], bounds)
        return pa.table(
            {
                "dst": pa.array(uniq, type=pa.int64()),
                "lbl": pa.array(mins.astype(np.int64), type=pa.int64()),
            }
        )

    if use_bcast:
        nodes = np.sort(
            adj.select_columns(["node"]).to_pandas()["node"].to_numpy(np.int64)
        )
        lbl = nodes.copy()
        steps = iterations if not until_convergence else (1 << 30)
        for _ in range(steps):
            ref = _ray.put((nodes, lbl))
            _cache: dict = {}

            def emit_bcast(b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return _EMPTY
                if "nl" not in _cache:
                    _cache["nl"] = _ray.get(ref)
                bn, bl = _cache["nl"]
                node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
                return _fan_min(bl[np.searchsorted(bn, node)], b["dst_bytes"])

            parts = adj.map_batches(emit_bcast, batch_format="pyarrow").to_pandas()
            new = lbl.copy()
            idx = np.searchsorted(nodes, parts["dst"].to_numpy(np.int64))
            np.minimum.at(new, idx, parts["lbl"].to_numpy(np.int64))
            changed = int((new != lbl).sum())
            lbl = new
            if until_convergence and changed == 0:
                break
        labels = ray.data.from_pandas(pd.DataFrame({"node": nodes, "lbl": lbl}))
    else:
        jp = adaptive_join_partitions(n_nodes)

        def init_labels(b: pa.Table) -> pa.Table:
            return pa.table({"node": b["node"], "lbl": b["node"]})

        labels = (
            adj.select_columns(["node"])
            .map_batches(init_labels, batch_format="pyarrow")
            .materialize()
        )

        def emit(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _EMPTY
            lbl = b["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
            fan = _fan_min(lbl, b["dst_bytes"])
            # the vertex's OWN label competes in the same min groupby —
            # no second join needed
            own = pa.table({"dst": b["node"], "lbl": b["lbl"]})
            return pa.concat_tables([fan, own])

        steps = iterations if not until_convergence else (1 << 30)
        for _ in range(steps):
            joined = hash_join(labels, adj, on="node", num_partitions=jp)
            mins = (
                joined.map_batches(emit, batch_format="pyarrow")
                .groupby("dst")
                .aggregate(Min("lbl", alias_name="m"))
            )

            def next_labels(b: pa.Table) -> pa.Table:
                return pa.table({"node": b["dst"], "lbl": b["m"]})

            new_labels = mins.map_batches(
                next_labels, batch_format="pyarrow"
            ).materialize()
            if until_convergence:
                # labels are monotonically non-increasing, so any change
                # strictly lowers the total — ONE distributed-Sum scalar
                # per superstep reaches the driver, nothing vertex-scale
                old_sum = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
                new_sum = new_labels.aggregate(Sum("lbl", alias_name="s"))["s"]
                labels = new_labels
                if new_sum == old_sum:
                    break
            else:
                labels = new_labels

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "comp": b["lbl"]})

    return labels.map_batches(out, batch_format="pyarrow")


def _wedges(b: pa.Table) -> pa.Table:
    """Oriented-adjacency batch → all wedges (u, v, w), v<w both higher
    neighbors of u, as packed keys (v<<32)|w.  Banked GAP scan (the
    Rabin-Karp banking idiom): one vectorized slice pass per neighbor
    offset g — no per-node Python; the loop count is the batch's max
    out-degree, which the degree-ordered orientation bounds by ~sqrt(m)."""
    col = b["dst_bytes"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset :] // 8
    flat = np.frombuffer(arr.buffers()[2], dtype=np.int64)[
        offs[0] : offs[len(arr)]
    ]
    starts = (offs[: len(arr) + 1] - offs[0])[:-1]
    ends = (offs[: len(arr) + 1] - offs[0])[1:]
    k = ends - starts
    node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.arange(len(flat), dtype=np.int64)
    node_of = np.repeat(node, k)
    end_of = np.repeat(ends, k)
    us, keys = [], []
    g = 1
    while True:
        mask = pos + g < end_of
        if not mask.any():
            break
        p = pos[mask]
        us.append(node_of[mask])
        keys.append((flat[p] << np.int64(32)) | flat[p + g])
        g += 1
    if not us:
        return pa.table(
            {"u": pa.array([], type=pa.int64()), "key": pa.array([], type=pa.int64())}
        )
    return pa.table(
        {
            "u": pa.array(np.concatenate(us), type=pa.int64()),
            "key": pa.array(np.concatenate(keys), type=pa.int64()),
        }
    )


def triangle_counts(
    edges: ray.data.Dataset,
    mode: str = "auto",
    broadcast_below: int = 20_000_000,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Per-node triangle counts over a DISTINCT canonical edge list
    ``(u, v)`` with ``u < v`` (int64 ids < 2^31 — pairs pack into one
    int64 key).  → ``(node, n_tri)`` for every node on ≥1 triangle.

    Node-iterator algorithm on the ORIENTED graph: each edge u→v points
    low→high, so every triangle {u<v<w} is generated exactly once as a
    wedge (v, w) out of its lowest vertex u, then closed by an edge-set
    membership test on the packed key.  Wedge generation is the banked
    gap scan in :func:`_wedges` (vectorized, no per-node Python).

    SCALE: wedge volume is Σ C(outdeg, 2); orienting low→high by VERTEX ID
    is worst-case quadratic on skewed graphs — the production swap point
    is degree-ordered orientation (relabel by ascending degree; outdeg then
    ≤ ~sqrt(m), the classic bound) which composes with this exact code.
    Closure check: ``broadcast`` ships the sorted key array once via
    ``ray.put`` (bounded contract: ≤ ``broadcast_below`` edges, 8 B/edge);
    ``join`` is the any-scale path — wedges hash-join the edge key table,
    nothing edge-scale reaches the driver.  Both bit-identical (pytest)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from .joins import adaptive_join_partitions, hash_join

    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (
            min(u.min(), v.min()) < 0 or max(u.max(), v.max()) >= (1 << 31)
        ):
            raise ValueError(
                "triangle_counts requires vertex ids in [0, 2^31) — "
                "(v<<32)|w key packing would overflow int64"
            )
        keep = u != v  # self-loops are never triangle corners
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "src": pa.array(np.minimum(u, v), type=pa.int64()),
                "dst": pa.array(np.maximum(u, v), type=pa.int64()),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow").materialize()
    n_edges = oriented.count()
    adj = _adjacency(oriented, num_partitions).materialize()
    use_bcast = mode == "broadcast" or (mode == "auto" and n_edges <= broadcast_below)

    def keyed(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array((s << np.int64(32)) | d, type=pa.int64())})

    def count_partial(u: np.ndarray, keys: np.ndarray) -> pa.Table:
        # tally all three corners of each closed wedge, batch-combined
        v = (keys >> np.int64(32)).astype(np.int64)
        w = (keys & np.int64(0xFFFFFFFF)).astype(np.int64)
        nodes = np.concatenate([u, v, w])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    _EMPTY = pa.table(
        {"node": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
    )

    if use_bcast:
        key_pd = (
            oriented.map_batches(keyed, batch_format="pyarrow").to_pandas()
        )  # ≤ broadcast_below rows, 8 B each
        ref = _ray.put(np.sort(key_pd["key"].to_numpy(np.int64)))
        _cache: dict = {}

        def close_bcast(b: pa.Table) -> pa.Table:
            wt = _wedges(b)
            if wt.num_rows == 0:
                return _EMPTY
            if "k" not in _cache:
                _cache["k"] = _ray.get(ref)
            ek = _cache["k"]
            if len(ek) == 0:
                return _EMPTY
            keys = wt["key"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ek, keys)
            idx[idx == len(ek)] = 0
            hit = ek[idx] == keys
            if not hit.any():
                return _EMPTY
            return count_partial(
                wt["u"].to_numpy(zero_copy_only=False)[hit], keys[hit]
            )

        parts = adj.map_batches(close_bcast, batch_format="pyarrow")
    else:
        wedges = adj.map_batches(_wedges, batch_format="pyarrow").materialize()
        ekeys = (
            oriented.map_batches(keyed, batch_format="pyarrow").materialize()
        )
        jp = adaptive_join_partitions(n_edges, wedges.count())
        closed = hash_join(wedges, ekeys, on="key", num_partitions=jp).materialize()

        def tally(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _EMPTY
            return count_partial(
                b["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            )

        parts = closed.map_batches(tally, batch_format="pyarrow")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "n_tri": b["s"]})

    return (
        parts.groupby("node")
        .aggregate(Sum("c", alias_name="s"))
        .map_batches(rename, batch_format="pyarrow")
    )


def degree_assortativity_sums(edges: ray.data.Dataset) -> pd.DataFrame:
    """Degree-assortativity MOMENT SUMS over a symmetric edge Dataset
    ``(src, dst)`` — one row of exact int64 sums over the directed edge
    list: ``(n_edges, sx, sy, sxy, sxx, syy)`` where x/y are the
    endpoint degrees.  The Pearson coefficient r = (n·sxy − sx·sy) /
    √((n·sxx − sx²)(n·syy − sy²)) is driver-side float by definition —
    the INTEGER sums are the oracle-pinned contract (the vocab_zipf /
    embedding_gram house pattern: ship exact moments, not the float).

    SCALE: degrees from one groupby-count pass; the vertex→degree array
    ships ONCE via ``ray.put`` (8 B/vertex bounded contract — past ~10⁹
    vertices swap the lookup for a degree hash join); per batch the six
    sums reduce to ONE partial row, so the driver sees #batches rows."""
    import ray as _ray

    from ray.data.aggregate import Count

    deg_pd = (
        edges.groupby("src")
        .aggregate(Count(alias_name="deg"))
        .to_pandas()  # vertex-scale, bounded contract (docstring)
        .sort_values("src")
    )
    nodes = deg_pd["src"].to_numpy(np.int64)
    degs = deg_pd["deg"].to_numpy(np.int64)
    ref = _ray.put((nodes, degs))
    _cache: dict = {}

    def partial(b: pa.Table) -> pa.Table:
        cols = ["n_edges", "sx", "sy", "sxy", "sxx", "syy"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        if "nd" not in _cache:
            _cache["nd"] = _ray.get(ref)
        bn, bd = _cache["nd"]
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = bd[np.searchsorted(bn, s)]
        y = bd[np.searchsorted(bn, d)]
        vals = [
            np.int64(len(x)),
            x.sum(),
            y.sum(),
            (x * y).sum(),
            (x * x).sum(),
            (y * y).sum(),
        ]
        return pa.table(
            {c: pa.array([np.int64(v)], type=pa.int64()) for c, v in zip(cols, vals)}
        )

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        parts.sum().to_frame().T.astype("int64")
        [["n_edges", "sx", "sy", "sxy", "sxx", "syy"]]
    )


HITS_ITERATIONS = 4
HITS_SCALE = 1_000_000


def hits(
    edges: ray.data.Dataset,
    iterations: int = HITS_ITERATIONS,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """HITS hubs & authorities over a DIRECTED edge Dataset ``(src, dst)``
    in exact integer fixed point — mean-normalized (Kleinberg's L2 norm is
    a sqrt, which no integer mirror survives; dividing by the mean keeps
    scores ~SCALE on average and preserves the ranking, the quantity HITS
    is used for):

        a_t(v) = (Σ_{u→v} h_{t-1}(u)) · S // max(A // n, 1)   A = Σ araw
        h_t(v) = (Σ_{v→w} a_t(w))     · S // max(H // n, 1)   H = Σ hraw

    (missing rows are exact zeros — sources have auth 0, sinks hub 0).
    Returns ``(node, hub_micro, auth_micro)`` for every vertex.

    SCALE: two adjacency maps (out + reversed) built once; per half-step
    ONE streaming fan pass (the shared :func:`_fan` kernel, ≤ distinct-dst
    partials per batch) and one global-sum scalar.  Vectors driver-resident
    via ray.put (the pagerank-broadcast bounded contract, ≤ ~2M vertices;
    the any-scale swap point is pagerank's per-iteration hash-join loop).
    Int64 bound: n·S² < 2^63 ⇒ n ≤ ~9·10⁶ vertices at S=10⁶ (assert)."""
    import ray as _ray

    adj_out = _adjacency(edges, num_partitions).materialize()

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["dst"], "dst": b["src"]})

    adj_in = _adjacency(
        edges.map_batches(rev, batch_format="pyarrow"), num_partitions
    ).materialize()

    def uniq_nodes(ds: ray.data.Dataset) -> np.ndarray:
        return ds.select_columns(["node"]).to_pandas()["node"].to_numpy(np.int64)

    nodes = np.unique(np.concatenate([uniq_nodes(adj_out), uniq_nodes(adj_in)]))
    n = len(nodes)
    if n * HITS_SCALE**2 >= (1 << 63):
        raise ValueError("hits: n*S^2 overflows int64 — reduce scale or vertices")

    _EMPTY = pa.table(
        {"dst": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
    )

    def fan_pass(adj: ray.data.Dataset, vec: np.ndarray) -> np.ndarray:
        """One half-step: fan `vec` along `adj`, return the raw sums
        scattered over the global node array (zeros where absent)."""
        ref = _ray.put((nodes, vec))
        _cache: dict = {}

        def emit(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _EMPTY
            if "nv" not in _cache:
                _cache["nv"] = _ray.get(ref)
            bn, bv = _cache["nv"]
            node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _fan(bv[np.searchsorted(bn, node)], b["dst_bytes"])

        parts = adj.map_batches(emit, batch_format="pyarrow").to_pandas()
        raw = np.zeros(n, dtype=np.int64)
        if len(parts):
            idx = np.searchsorted(nodes, parts["dst"].to_numpy(np.int64))
            np.add.at(raw, idx, parts["c"].to_numpy(np.int64))
        return raw

    S = np.int64(HITS_SCALE)
    h = np.full(n, HITS_SCALE, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iterations):
        araw = fan_pass(adj_out, h)
        a = (araw * S) // max(int(araw.sum()) // n, 1)
        hraw = fan_pass(adj_in, a)
        h = (hraw * S) // max(int(hraw.sum()) // n, 1)
    return ray.data.from_pandas(
        pd.DataFrame({"node": nodes, "hub_micro": h, "auth_micro": a})
    )


KCORE_ROUNDS = 6


def kcore(
    edges: ray.data.Dataset,
    k: int,
    rounds: int = KCORE_ROUNDS,
    until_convergence: bool = False,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """k-core by iterative peeling over a SYMMETRIC edge Dataset
    ``(src, dst)``: each round drops every vertex whose degree within the
    surviving set is < k.  A fixed ``rounds`` budget keeps the result the
    pure R-step recurrence a chained-CTE oracle pins (HAVING count ≥ k per
    round); ``until_convergence`` peels to the true k-core (the survivor
    COUNT is the per-round driver scalar).  Returns ``(node, deg)`` — the
    survivors and their degree within the final surviving set.

    SCALE: each round is ONE streaming pass over the edge Dataset — a
    membership mask (searchsorted against the broadcast survivor array)
    and a batch-local bincount partial; per-batch partials reduce
    driver-side at vertex scale.  BOUNDED CONTRACT: the survivor id array
    ships via ``ray.put`` (8 B/vertex — ≤ ~10⁹ vertices per 8 GB worker
    heap); past that, swap the broadcast for the semi-join form (two
    ``semi_join`` + one groupby-count per round — same recurrence, noted
    here as the documented swap point)."""
    import ray as _ray

    _EMPTY = pa.table(
        {"node": pa.array([], type=pa.int64()), "deg": pa.array([], type=pa.int64())}
    )

    def masked_degrees(surv: np.ndarray) -> pd.DataFrame:
        ref = _ray.put(surv)
        _cache: dict = {}

        def deg_pass(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _EMPTY
            if "s" not in _cache:
                _cache["s"] = _ray.get(ref)
            sv = _cache["s"]
            if len(sv) == 0:
                return _EMPTY
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            si = np.searchsorted(sv, s)
            di = np.searchsorted(sv, d)
            si[si == len(sv)] = 0
            di[di == len(sv)] = 0
            keep = (sv[si] == s) & (sv[di] == d)
            uniq, cnt = np.unique(s[keep], return_counts=True)
            return pa.table(
                {
                    "node": pa.array(uniq, type=pa.int64()),
                    "deg": pa.array(cnt.astype(np.int64), type=pa.int64()),
                }
            )

        parts = edges.map_batches(deg_pass, batch_format="pyarrow").to_pandas()
        if parts.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"), "deg": pd.Series([], dtype="int64")}
            )
        return parts.groupby("node", as_index=False)["deg"].sum()

    def uniq_src(b: pa.Table) -> pa.Table:
        u = np.unique(b["src"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"node": pa.array(u, type=pa.int64())})

    nodes_pd = (
        edges.select_columns(["src"])
        .map_batches(uniq_src, batch_format="pyarrow")
        .to_pandas()
    )
    surv = np.unique(nodes_pd["node"].to_numpy(np.int64))
    steps = rounds if not until_convergence else (1 << 30)
    for _ in range(steps):
        deg = masked_degrees(surv)
        new = np.sort(deg.loc[deg["deg"] >= k, "node"].to_numpy(np.int64))
        if until_convergence and len(new) == len(surv):
            surv = new
            break
        if len(new) == 0:
            surv = new
            break
        surv = new
    final = masked_degrees(surv)
    final = final.sort_values("node").reset_index(drop=True)
    return ray.data.from_pandas(
        final.astype({"node": "int64", "deg": "int64"})
        if len(final)
        else pd.DataFrame({"node": pd.Series([], dtype="int64"), "deg": pd.Series([], dtype="int64")})
    )
