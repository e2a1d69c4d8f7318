"""PageRank (stages/graph.py) vs an independent DuckDB chained-CTE mirror of
the identical integer recurrence, plus structural invariants."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from searty_ray.stages.graph import (
    PR_BASE_MICRO,
    PR_DAMP_PCT,
    PR_INIT_MICRO,
    pagerank,
)


def _ref_sql(iterations: int) -> str:
    sql = f"""
WITH edges AS (SELECT src, dst FROM edf),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, {PR_INIT_MICRO}::BIGINT AS r FROM deg)"""
    prev = "r0"
    for t in range(1, iterations + 1):
        sql += f""",
r{t} AS (SELECT e.dst AS node,
               ({PR_BASE_MICRO} + sum((r.r * {PR_DAMP_PCT}) // (100 * d.deg)))::BIGINT AS r
        FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
        GROUP BY e.dst)"""
        prev = f"r{t}"
    return sql + f"\nSELECT node, r AS rank_micro FROM {prev} ORDER BY node"


def _undirected(pairs: pd.DataFrame) -> pd.DataFrame:
    return (
        pd.concat(
            [
                pairs.rename(columns={"a": "src", "b": "dst"}),
                pairs.rename(columns={"b": "src", "a": "dst"})[["src", "dst"]],
            ]
        )
        .astype("int64")
        .reset_index(drop=True)
    )


def _run(edges: pd.DataFrame, iterations: int = 5, blocks: int = 4) -> pd.DataFrame:
    ds = ray.data.from_pandas(edges, override_num_blocks=blocks)
    return (
        pagerank(ds, iterations=iterations)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "rank_micro": "int64"})
    )


def test_pagerank_matches_duckdb(ray_session):
    rng = np.random.default_rng(7)
    pairs = pd.DataFrame(
        {"a": rng.integers(0, 30, 400), "b": rng.integers(100, 140, 400)}
    ).drop_duplicates()
    edf = _undirected(pairs)
    got = _run(edf)
    ref = duckdb.sql(_ref_sql(5)).df().astype({"node": "int64", "rank_micro": "int64"})
    pd.testing.assert_frame_equal(got, ref)


def test_pagerank_layout_stable_and_sparse(ray_session):
    # a near-degenerate graph (3 edges) exercises empty hash partitions in
    # the adjacency groupby and the per-iteration exchange; layouts must
    # not change a single int
    pairs = pd.DataFrame({"a": [1, 2, 3], "b": [10, 10, 11]})
    edf = _undirected(pairs)
    a = _run(edf, blocks=1)
    b = _run(edf, blocks=6)
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(_ref_sql(5)).df().astype({"node": "int64", "rank_micro": "int64"})
    pd.testing.assert_frame_equal(a, ref)


def test_pagerank_star_graph_mass(ray_session):
    # K-star: hub 0 <-> leaves 1..k.  After any number of iterations every
    # leaf has the same rank and the hub dominates.
    k = 12
    pairs = pd.DataFrame({"a": np.zeros(k, dtype=np.int64), "b": np.arange(1, k + 1)})
    out = _run(_undirected(pairs))
    hub = out.loc[out["node"] == 0, "rank_micro"].iloc[0]
    leaves = out.loc[out["node"] != 0, "rank_micro"]
    assert leaves.nunique() == 1
    assert hub > leaves.iloc[0]


def test_pagerank_broadcast_equals_join_mode(ray_session):
    rng = np.random.default_rng(19)
    pairs = pd.DataFrame(
        {"a": rng.integers(0, 25, 300), "b": rng.integers(100, 130, 300)}
    ).drop_duplicates()
    edf = _undirected(pairs)
    ds = ray.data.from_pandas(edf, override_num_blocks=4)
    bc = (
        pagerank(ds, mode="broadcast")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "rank_micro": "int64"})
    )
    jn = (
        pagerank(ray.data.from_pandas(edf, override_num_blocks=4), mode="join")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "rank_micro": "int64"})
    )
    pd.testing.assert_frame_equal(bc, jn)


# --- connected components (min-label propagation) -------------------------


def _union_find_comps(edges: pd.DataFrame) -> dict:
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(edges["src"], edges["dst"]):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def _cc(edges: pd.DataFrame, blocks: int = 4, **kw) -> pd.DataFrame:
    from searty_ray.stages.graph import connected_components

    ds = ray.data.from_pandas(edges, override_num_blocks=blocks)
    return (
        connected_components(ds, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "comp": "int64"})
    )


def test_components_fixpoint_matches_union_find(ray_session):
    # sparse random bipartite graph -> many components; fixpoint labels
    # must equal a scalar union-find's canonical min ids
    rng = np.random.default_rng(23)
    pairs = pd.DataFrame(
        {"a": rng.integers(0, 200, 120), "b": rng.integers(1000, 1200, 120)}
    ).drop_duplicates()
    edf = _undirected(pairs)
    got = _cc(edf, until_convergence=True)
    ref = _union_find_comps(edf)
    assert dict(zip(got["node"], got["comp"])) == ref
    assert got["comp"].nunique() > 5  # genuinely fragmented input


def test_components_bounded_k_is_k_hop_min(ray_session):
    # a path graph 0-1-2-...-9: after K supersteps node v's label is
    # exactly min(0, v-K) = max(v-K, 0)
    n = 10
    pairs = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    edf = _undirected(pairs)
    for k in (1, 3):
        got = _cc(edf, iterations=k)
        exp = {v: max(v - k, 0) for v in range(n)}
        assert dict(zip(got["node"], got["comp"])) == exp


def test_components_broadcast_equals_join_mode(ray_session):
    rng = np.random.default_rng(31)
    pairs = pd.DataFrame(
        {"a": rng.integers(0, 40, 60), "b": rng.integers(500, 560, 60)}
    ).drop_duplicates()
    edf = _undirected(pairs)
    bc = _cc(edf, mode="broadcast", iterations=4)
    jn = _cc(edf, mode="join", iterations=4)
    pd.testing.assert_frame_equal(bc, jn)
    # join-mode convergence detection (distributed label-sum scalar)
    jc = _cc(edf, mode="join", until_convergence=True)
    assert dict(zip(jc["node"], jc["comp"])) == _union_find_comps(edf)


def test_components_layout_stable(ray_session):
    pairs = pd.DataFrame({"a": [1, 2, 3, 7], "b": [10, 10, 11, 12]})
    edf = _undirected(pairs)
    a = _cc(edf, blocks=1, iterations=6)
    b = _cc(edf, blocks=6, iterations=6)
    pd.testing.assert_frame_equal(a, b)


# --- triangle counts -------------------------------------------------------


def _brute_triangles(edges: pd.DataFrame) -> dict:
    es = set(map(tuple, edges[["u", "v"]].itertuples(index=False)))
    nodes = sorted({x for e in es for x in e})
    from collections import defaultdict

    cnt: dict = defaultdict(int)
    import itertools

    for u, v, w in itertools.combinations(nodes, 3):
        if (u, v) in es and (u, w) in es and (v, w) in es:
            cnt[u] += 1
            cnt[v] += 1
            cnt[w] += 1
    return dict(cnt)


def _tri(edges: pd.DataFrame, blocks: int = 4, **kw) -> dict:
    from searty_ray.stages.graph import triangle_counts

    ds = ray.data.from_pandas(edges, override_num_blocks=blocks)
    out = triangle_counts(ds, **kw).to_pandas()
    out = out.reindex(columns=["node", "n_tri"])  # empty-ds schema quirk
    return dict(zip(out["node"].astype(int), out["n_tri"].astype(int)))


def test_triangles_match_brute_force(ray_session):
    rng = np.random.default_rng(41)
    a = rng.integers(0, 25, 150)
    b = rng.integers(0, 25, 150)
    df = pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b)})
    df = df[df["u"] < df["v"]].drop_duplicates().reset_index(drop=True)
    got = _tri(df)
    assert got == _brute_triangles(df)


def test_triangles_broadcast_equals_join_mode(ray_session):
    rng = np.random.default_rng(43)
    a = rng.integers(0, 20, 120)
    b = rng.integers(0, 20, 120)
    df = pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b)})
    df = df[df["u"] < df["v"]].drop_duplicates().reset_index(drop=True)
    assert _tri(df, mode="broadcast") == _tri(df, mode="join")


def test_triangles_none_on_bipartite(ray_session):
    # bipartite graphs have no odd cycles: the count must be empty
    pairs = pd.DataFrame({"u": [0, 1, 2, 0, 1], "v": [10, 10, 11, 11, 12]})
    assert _tri(pairs) == {}


def test_triangles_accepts_unoriented_input(ray_session):
    # (v, u) rows with u>v must orient, not crash or double-count
    tri = pd.DataFrame({"u": [2, 1, 3], "v": [1, 3, 2]})
    assert _tri(tri) == {1: 1, 2: 1, 3: 1}


# --- k-core peeling --------------------------------------------------------


def _scalar_kcore(edges_sym: pd.DataFrame, k: int) -> dict:
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in zip(edges_sym["src"], edges_sym["dst"]):
        adj[int(s)].add(int(d))
    surv = set(adj)
    while True:
        drop = {v for v in surv if len(adj[v] & surv) < k}
        if not drop:
            break
        surv -= drop
    return {v: len(adj[v] & surv) for v in surv}


def _kc(edges_sym: pd.DataFrame, k: int, blocks: int = 4, **kw) -> dict:
    from searty_ray.stages.graph import kcore

    ds = ray.data.from_pandas(edges_sym, override_num_blocks=blocks)
    out = kcore(ds, k=k, **kw).to_pandas()
    out = out.reindex(columns=["node", "deg"])
    return dict(zip(out["node"].astype(int), out["deg"].astype(int)))


def test_kcore_fixpoint_matches_scalar_peeling(ray_session):
    rng = np.random.default_rng(47)
    a = rng.integers(0, 40, 250)
    b = rng.integers(0, 40, 250)
    pairs = pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b)})
    pairs = pairs[pairs["u"] < pairs["v"]].drop_duplicates()
    sym = pd.concat(
        [
            pairs.rename(columns={"u": "src", "v": "dst"}),
            pairs.rename(columns={"v": "src", "u": "dst"})[["src", "dst"]],
        ]
    ).reset_index(drop=True)
    for k in (2, 4):
        assert _kc(sym, k, until_convergence=True) == _scalar_kcore(sym, k)


def test_kcore_fixed_rounds_is_r_step_recurrence(ray_session):
    # path 0-1-2-3-4 with k=2: round 1 drops endpoints 0 and 4, round 2
    # drops 1 and 3, round 3 drops 2 -> empty.  A 1-round budget must stop
    # after the FIRST peel (nodes 1..3 survive with in-set degrees 1,2,1).
    pairs = pd.DataFrame({"u": [0, 1, 2, 3], "v": [1, 2, 3, 4]})
    sym = pd.concat(
        [
            pairs.rename(columns={"u": "src", "v": "dst"}),
            pairs.rename(columns={"v": "src", "u": "dst"})[["src", "dst"]],
        ]
    ).reset_index(drop=True)
    assert _kc(sym, 2, rounds=1) == {1: 1, 2: 2, 3: 1}
    assert _kc(sym, 2, until_convergence=True) == {}


def test_kcore_triangle_survives(ray_session):
    # a triangle is its own 2-core regardless of pendant vertices
    pairs = pd.DataFrame({"u": [0, 0, 1, 2, 3], "v": [1, 2, 2, 3, 4]})
    sym = pd.concat(
        [
            pairs.rename(columns={"u": "src", "v": "dst"}),
            pairs.rename(columns={"v": "src", "u": "dst"})[["src", "dst"]],
        ]
    ).reset_index(drop=True)
    assert _kc(sym, 2, until_convergence=True) == {0: 2, 1: 2, 2: 2}


def test_assortativity_sums_match_brute(ray_session):
    from searty_ray.stages.graph import degree_assortativity_sums

    rng = np.random.default_rng(53)
    a = rng.integers(0, 30, 200)
    b = rng.integers(0, 30, 200)
    pairs = pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b)})
    pairs = pairs[pairs["u"] < pairs["v"]].drop_duplicates()
    sym = pd.concat(
        [
            pairs.rename(columns={"u": "src", "v": "dst"}),
            pairs.rename(columns={"v": "src", "u": "dst"})[["src", "dst"]],
        ]
    ).reset_index(drop=True)
    got = degree_assortativity_sums(
        ray.data.from_pandas(sym, override_num_blocks=4)
    ).iloc[0]
    deg = sym.groupby("src").size()
    x = deg.loc[sym["src"]].to_numpy(np.int64)
    y = deg.loc[sym["dst"]].to_numpy(np.int64)
    assert got["n_edges"] == len(sym)
    assert got["sx"] == x.sum() and got["sy"] == y.sum()
    assert got["sxy"] == (x * y).sum()
    assert got["sxx"] == (x * x).sum() and got["syy"] == (y * y).sum()


def test_triangles_self_loops_dropped_and_ids_guarded(ray_session):
    # self-loops can never be triangle corners; out-of-range ids must
    # raise rather than silently corrupt the packed key
    tri = pd.DataFrame({"u": [1, 2, 3, 2], "v": [2, 3, 1, 2]})
    assert _tri(tri) == {1: 1, 2: 1, 3: 1}
    import pytest as _pytest
    from searty_ray.stages.graph import triangle_counts

    bad = ray.data.from_pandas(pd.DataFrame({"u": [1 << 31], "v": [2]}))
    with _pytest.raises(Exception):
        triangle_counts(bad).to_pandas()


# --- HITS ------------------------------------------------------------------


def _scalar_hits(edges: pd.DataFrame, iterations: int) -> pd.DataFrame:
    from searty_ray.stages.graph import HITS_SCALE

    S = HITS_SCALE
    nodes = np.unique(np.concatenate([edges["src"], edges["dst"]])).astype(np.int64)
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    h = np.full(n, S, dtype=object)  # python ints — the exact reference
    a = np.zeros(n, dtype=object)
    src = [idx[v] for v in edges["src"]]
    dst = [idx[v] for v in edges["dst"]]
    for _ in range(iterations):
        araw = np.zeros(n, dtype=object)
        for s_, d_ in zip(src, dst):
            araw[d_] += h[s_]
        a = (araw * S) // max(int(araw.sum()) // n, 1)
        hraw = np.zeros(n, dtype=object)
        for s_, d_ in zip(src, dst):
            hraw[s_] += a[d_]
        h = (hraw * S) // max(int(hraw.sum()) // n, 1)
    return pd.DataFrame(
        {
            "node": nodes,
            "hub_micro": [int(x) for x in h],
            "auth_micro": [int(x) for x in a],
        }
    )


def test_hits_matches_scalar_reference(ray_session):
    from searty_ray.stages.graph import HITS_ITERATIONS, hits

    rng = np.random.default_rng(71)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 30, 200).astype(np.int64),
            "dst": (rng.integers(0, 20, 200) + 100).astype(np.int64),
        }
    ).drop_duplicates()
    got = (
        hits(ray.data.from_pandas(edges, override_num_blocks=4))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "hub_micro": "int64", "auth_micro": "int64"})
    )
    ref = _scalar_hits(edges, HITS_ITERATIONS).astype(
        {"node": "int64", "hub_micro": "int64", "auth_micro": "int64"}
    )
    pd.testing.assert_frame_equal(got, ref)
    # bipartite structure: sources have auth 0, sinks hub 0
    srcs = set(edges["src"]) - set(edges["dst"])
    assert (got.loc[got["node"].isin(srcs), "auth_micro"] == 0).all()


def test_hits_star_sink_dominates(ray_session):
    from searty_ray.stages.graph import hits

    k = 8
    edges = pd.DataFrame(
        {"src": np.arange(1, k + 1, dtype=np.int64), "dst": np.zeros(k, np.int64)}
    )
    out = hits(ray.data.from_pandas(edges)).to_pandas().set_index("node")
    assert out.loc[0, "auth_micro"] > out.drop(0)["auth_micro"].max()
    assert out.loc[0, "hub_micro"] == 0
