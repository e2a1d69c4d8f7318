"""int8 embedding quantization + quantized KNN (stages/knn.py): per-element
reconstruction bound, scale-cancellation score identity, recall vs the exact
brute path on the real gate fixture, and zero-vector edges."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from searty_ray.stages import knn


def test_quantize_mat_reconstruction_and_edges():
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(100, 32)) * rng.uniform(0.01, 10, size=(100, 1))
    mat[0] = 0.0  # all-zero vector
    codes, scale = knn._quantize_mat(mat)
    assert codes.dtype == np.int8
    assert scale[0] == 0.0 and not codes[0].any()
    # |x - code*scale| <= scale/2 element-wise (half-away rounding, no clip
    # active because scale = max|x|/127 puts every |y| <= 127)
    recon = codes.astype(np.float64) * np.where(scale == 0, 1.0, scale)[:, None]
    assert np.all(np.abs(mat - recon) <= np.where(scale == 0, 1.0, scale)[:, None] / 2 + 1e-12)
    # the max-|x| element always hits ±127 exactly
    assert np.all(np.abs(codes[1:]).max(axis=1) == 127)


def test_quantized_knn_recall_vs_exact(ray_session):
    rng = np.random.default_rng(11)
    n, d, k = 400, 64, 10
    mat = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), type=pa.float32()), d
            ),
        }
    )
    queries = {int(i): mat[i] for i in range(5)}
    exact = knn.knn_brute_cosine(ray.data.from_arrow(t), queries, k=k).to_pandas()
    quant = knn.knn_quantized_cosine(ray.data.from_arrow(t), queries, k=k).to_pandas()
    assert len(quant) == len(exact) == 5 * k
    # int8 cosine is a tight approximation: high top-k overlap with exact,
    # and the self-match (score 1.0) always ranks first
    recalls = []
    for q in range(5):
        e = set(exact[exact.query_id == q].vec_id)
        g = set(quant[quant.query_id == q].vec_id)
        recalls.append(len(e & g) / k)
        top = quant[quant.query_id == q].iloc[0]
        assert int(top.vec_id) == q and top.score == pytest.approx(1.0, abs=1e-6)
    assert np.mean(recalls) >= 0.8, recalls


def test_quantize_embeddings_roundtrip(ray_session):
    mat = np.array([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]])
    t = pa.table(
        {
            "vec_id": pa.array([10, 11], type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel(), type=pa.float32()), 3
            ),
        }
    )
    out = knn.quantize_embeddings(ray.data.from_arrow(t)).to_pandas().sort_values("vec_id")
    codes = np.stack(out["codes"].to_numpy())
    assert codes.tolist() == [[64, -127, 32], [0, 0, 0]]  # round(1/ (2/127)) = 63.5 → 64
    assert out["scale"].tolist() == [pytest.approx(2 / 127, abs=1e-6), 0.0]
