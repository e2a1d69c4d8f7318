"""Connected-components clustering (stages/cluster.py) vs a union-find
brute force, including the shapes that stress the distributed rounds:
long chains (many propagation rounds) and a dominant clique (skew)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.stages import cluster


def _uf_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"]).astype("int64")


def _run(pairs: pd.DataFrame, **kw) -> pd.DataFrame:
    out = cluster.duplicate_clusters(pairs, **kw).to_pandas()
    # Ray Data drops the schema of fully-empty datasets — restore it
    out = out.reindex(columns=["doc_id", "cluster_id"])
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def test_chain_propagates_across_rounds():
    # a 40-node path: component min must travel the whole chain, which
    # takes several hash-to-min rounds
    pairs = pd.DataFrame({"doc_id_a": range(100, 139), "doc_id_b": range(101, 140)})
    got = _run(pairs, num_partitions=8)
    exp = _uf_clusters(pairs)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["cluster_id"] == 100).all()


def test_skewed_clique_plus_islands():
    rng = np.random.default_rng(7)
    # one 60-doc near-clique (what LSH emits for a mass-duplicated doc)...
    clique = [(a, b) for a in range(60) for b in range(a + 1, 60) if rng.random() < 0.2]
    # ...plus scattered 2-cycles and a triangle
    extra = [(200, 201), (300, 301), (301, 302), (400, 401)]
    pairs = pd.DataFrame(clique + extra, columns=["doc_id_a", "doc_id_b"])
    got = _run(pairs, num_partitions=8)
    exp = _uf_clusters(pairs)
    pd.testing.assert_frame_equal(got, exp)


def test_random_graphs_match_union_find():
    rng = np.random.default_rng(13)
    for trial in range(3):
        n = 120
        m = 90
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        pairs = pd.DataFrame(
            {"doc_id_a": np.minimum(a, b)[keep], "doc_id_b": np.maximum(a, b)[keep]}
        ).drop_duplicates()
        got = _run(pairs, num_partitions=8)
        exp = _uf_clusters(pairs)
        pd.testing.assert_frame_equal(got, exp)


def test_empty_pairs():
    pairs = pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                          "doc_id_b": pd.Series([], dtype="int64")})
    got = _run(pairs)
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "cluster_id"]


def test_dataset_input_equivalent():
    pairs = pd.DataFrame({"doc_id_a": [1, 2, 9], "doc_id_b": [2, 3, 10]})
    via_ds = _run(ray.data.from_pandas(pairs))
    via_df = _run(pairs)
    pd.testing.assert_frame_equal(via_ds, via_df)


def test_canonical_filter_keeps_min_per_component():
    pairs = pd.DataFrame({"doc_id_a": [1, 2, 7], "doc_id_b": [2, 3, 8]})
    clusters = cluster.duplicate_clusters(pairs)
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": range(12)}))
    kept = sorted(cluster.canonical_filter(docs, clusters).to_pandas()["doc_id"])
    # dropped: 2, 3 (cluster min 1) and 8 (cluster min 7)
    assert kept == [0, 1, 4, 5, 6, 7, 9, 10, 11]


def test_canonical_filter_no_clusters_is_identity():
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": range(5)}))
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cluster_id": pd.Series([], dtype="int64")})
    kept = sorted(cluster.canonical_filter(docs, empty).to_pandas()["doc_id"])
    assert kept == [0, 1, 2, 3, 4]
