"""Product quantization + ADC search (stages/knn.py): deterministic refits,
encode shape/dtype, self-match behaviour, recall floor on clustered data
(PQ's home turf), and the dim-divisibility guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from searty_ray.stages import knn


def _emb_ds(mat: np.ndarray):
    n, d = mat.shape
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), type=pa.float32()), d
            ),
        }
    )
    return ray.data.from_arrow(t)


def _clustered(n=600, d=64, n_clusters=12, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3
    assign = rng.integers(0, n_clusters, size=n)
    return centers[assign] + rng.normal(size=(n, d)) * 0.3


def test_pq_fit_deterministic_and_encode_shape(ray_session):
    ds = _emb_ds(_clustered())
    b1 = knn.pq_fit(ds, m=16, ks=32, seed=5)
    b2 = knn.pq_fit(ds, m=16, ks=32, seed=5)
    assert b1.shape == (16, 32, 4)
    assert np.array_equal(b1, b2)  # byte-identical refit
    codes = knn.pq_encode(ds, b1).to_pandas()
    arr = np.stack(codes.sort_values("vec_id")["code"].to_numpy())
    assert arr.shape == (600, 16) and arr.dtype == np.uint8
    assert arr.max() < 32


def test_pq_adc_recall_on_separated_vectors(ray_session):
    """Individually-separated vectors: ADC must recover the exact top-10.
    Measured m=32/ks=64 → 0.82 mean recall on this fixture; floor 0.7."""
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(400, 64))
    ds = _emb_ds(mat)
    queries = {int(i): mat[i] for i in range(5)}
    exact = knn.knn_brute_cosine(ds, queries, k=10).to_pandas()
    got = knn.knn_pq_adc(ds, queries, k=10, m=32, ks=64, seed=5).to_pandas()
    assert len(got) == 50
    recalls = []
    for q in range(5):
        e = set(exact[exact.query_id == q].vec_id)
        g = set(got[got.query_id == q].vec_id)
        recalls.append(len(e & g) / 10)
    # no self-match guarantee under ADC (a neighbour's code can score above
    # the query's own code) — the contract is aggregate recall
    assert np.mean(recalls) >= 0.7, recalls


def test_pq_adc_recovers_clusters(ray_session):
    """Tight clusters are PQ's EASY case for cluster recovery and its HARD
    case for within-cluster top-k (cluster mates share codes): the honest
    contract is that returned neighbours come from the query's own
    cluster."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(12, 64)) * 3
    assign = rng.integers(0, 12, size=600)
    mat = centers[assign] + rng.normal(size=(600, 64)) * 0.3
    ds = _emb_ds(mat)
    queries = {int(i): mat[i] for i in range(5)}
    got = knn.knn_pq_adc(ds, queries, k=10, m=16, ks=64, seed=5).to_pandas()
    for q in range(5):
        neigh = got[got.query_id == q].vec_id.to_numpy()
        frac_own = (assign[neigh] == assign[q]).mean()
        assert frac_own >= 0.9, (q, frac_own)


def test_pq_fit_rejects_indivisible_dim(ray_session):
    ds = _emb_ds(np.random.default_rng(0).normal(size=(50, 30)))
    with pytest.raises(ValueError):
        knn.pq_fit(ds, m=16, ks=8)


def _dir_bytes(d):
    import os

    return sum(
        os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(d) for f in fs
    )


def test_ivfpq_recall_and_compression(ray_session, tmp_path):
    """IVFADC composition: residual-PQ lists must (a) shrink the on-disk
    lists vs flat, (b) keep full-probe recall ≥ 0.8 at m=32/ks=256
    (measured 0.90 on this near-worst-case unstructured fixture), and
    (c) serve the same distributed batch-search path."""
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(800, 64))
    ds = _emb_ds(mat)
    queries = {int(i): mat[i] for i in range(5)}
    exact = knn.knn_brute_cosine(ds, queries, k=10).to_pandas()
    want = {q: set(exact[exact.query_id == q].vec_id) for q in range(5)}

    flat_dir, pq_dir = str(tmp_path / "flat"), str(tmp_path / "pq")
    knn.IVFIndex.build(ds, flat_dir, nlist=8)
    idx = knn.IVFIndex.build(ds, pq_dir, nlist=8, codes="pq", pq_m=32, pq_ks=256)

    recalls = []
    for q in range(5):
        ids, scores = idx.search(mat[q], k=10, nprobe=8)
        assert len(ids) == 10 and np.all(np.diff(scores) <= 1e-12)
        recalls.append(len(set(ids) & want[q]) / 10)
    assert np.mean(recalls) >= 0.8, recalls

    flat_lists = _dir_bytes(f"{flat_dir}/lists")
    pq_lists = _dir_bytes(f"{pq_dir}/lists")
    assert pq_lists < flat_lists / 2, (pq_lists, flat_lists)

    # the actor-pool batch search path serves pq indexes unchanged
    out = knn.knn_ivf_search_batch(pq_dir, ds.limit(8), k=5, nprobe=4).to_pandas()
    assert len(out) == 40 and set(out.columns) == {"query_id", "vec_id", "score"}


def test_ivfpq_books_deterministic(ray_session, tmp_path):
    ds = _emb_ds(np.random.default_rng(9).normal(size=(300, 64)))
    a = knn.IVFIndex.build(ds, str(tmp_path / "a"), nlist=4, codes="pq", pq_m=16, pq_ks=32)
    b = knn.IVFIndex.build(ds, str(tmp_path / "b"), nlist=4, codes="pq", pq_m=16, pq_ks=32)
    assert np.array_equal(a.books, b.books)
    assert np.array_equal(a.centroids, b.centroids)
