"""Integer Gram matrix + distributed PCA: pinned against direct full-data
numpy references (no engine kernels, no combiner)."""

import numpy as np
import pytest
import ray.data

from searty_ray.stages import knn


@pytest.fixture(scope="module")
def vecs(ray_session):
    rng = np.random.default_rng(7)
    # anisotropic cloud so PCA has a well-separated spectrum
    base = rng.normal(size=(300, 8)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1, 0.05, 0.01])
    rot = np.linalg.qr(rng.normal(size=(8, 8)))[0]
    x = (base @ rot).astype(np.float32)
    rows = [{"vec_id": i, "embedding": x[i].tolist()} for i in range(len(x))]
    return x, rows


def test_embedding_gram_exact(vecs, ray_session):
    x, rows = vecs
    ds = ray.data.from_items(rows).repartition(7)
    got = knn.embedding_gram(ds).to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
    q = (np.sign(x.astype(np.float64)) * np.floor(np.abs(x.astype(np.float64)) * 1000 + 0.5)).astype(np.int64)
    ref = q.T @ q
    iu, ju = np.triu_indices(8)
    assert len(got) == len(iu)
    for r, (i, j) in zip(got.itertuples(), zip(iu, ju)):
        assert (r.i, r.j) == (i, j)
        assert r.s == ref[i, j]


def test_embedding_pca_matches_direct(vecs, ray_session):
    x, rows = vecs
    k = 3
    ds = ray.data.from_items(rows).repartition(5)
    got = knn.embedding_pca(ds, k).to_pandas().sort_values("vec_id").reset_index(drop=True)

    # direct reference: same quantized covariance, eigh, sign fix, projection
    xf = x.astype(np.float64)
    q = (np.sign(xf) * np.floor(np.abs(xf) * 1000 + 0.5)).astype(np.int64)
    n = len(q)
    mu = q.sum(axis=0) / (n * 1000)
    cov = (q.T @ q) / (n * 1000 * 1000) - np.outer(mu, mu)
    vals, vecs_ = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comp = vecs_[:, order]
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(k)])
    comp = comp * flip
    ref = (xf - mu) @ comp

    proj = got[[f"pc{c}" for c in range(k)]].to_numpy()
    assert np.allclose(proj, ref, atol=1e-9)
    # the fitted BASIS is layout-stable (exact-integer moments); the float
    # projection itself is BLAS-blocked per batch shape, so cross-layout
    # agreement is to rounding, not bitwise (documented in embedding_pca)
    got2 = knn.embedding_pca(ray.data.from_items(rows).repartition(11), k).to_pandas()
    got2 = got2.sort_values("vec_id").reset_index(drop=True)
    assert np.allclose(proj, got2[[f"pc{c}" for c in range(k)]].to_numpy(), atol=1e-12)
    # variance ordering: pc0 var >= pc1 var >= pc2 var
    v = proj.var(axis=0)
    assert v[0] >= v[1] >= v[2]
