"""Similarity search over the ``embeddings`` table (driver instructions).

* :func:`knn_brute_cosine` — exact top-k cosine neighbors for a broadcast
  query matrix: numpy matmul per batch against `ray.put` queries, per-batch
  partial top-k, tiny driver-side merge.  The scale baseline: each batch does
  (batch × dim) @ (dim × nq), no shuffle, queries shipped once.

* :func:`embedding_near_dups` — EXACT cosine near-dup pairs via blocked
  all-pairs: the dataset is normalized once into B object-store blocks, and
  a Ray Data pipeline over the B·(B+1)/2 block pairs computes each
  (block_i × block_j) similarity tile on a worker.  The driver holds only
  block REFERENCES and the emitted pairs — never the embedding matrix.
  (All-pairs is inherently O(N²) dot products; at corpus scale the
  approximate path is :func:`ivf_near_dups` — within-cluster pairs over the
  IVF partitioning, same emit contract, probing cost O(N²/nlist).)

* :class:`IVFIndex` / :func:`knn_ivf_cosine` — IVF-flat, DISK-BACKED:
  k-means-ish centroids from a deterministic sample; posting lists written
  as ``cluster=NNN/`` parquet partitions by a streaming Ray pass (one
  groupby-free shuffle via partitioned write); search probes only the
  ``nprobe`` nearest cluster partitions (selective parquet reads + per-actor
  LRU).  Nothing is materialized on the driver at build or search time.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from ..functions.resources import actor_pool


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
        concurrency=actor_pool(),
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
    ).to_pandas()  # ≤ (#queries × k × #blocks) partial rows — small by contract
    return _topk_merge(partial, k)


def _topk_merge(partial, k: int) -> pa.Table:
    """Final per-query top-k over partial (query_id, vec_id, score) rows: one
    lexsort over the partial table + per-query rank mask (no per-group pandas
    loop); selection on EXACT scores, then the output re-ordered on rounded
    scores like the SQL oracle hashes them."""
    q = partial["query_id"].to_numpy()
    v = partial["vec_id"].to_numpy()
    s = partial["score"].to_numpy()
    order = np.lexsort((v, -s, q))
    q, v, s = q[order], v[order], s[order]
    starts = np.flatnonzero(np.concatenate(([True], q[1:] != q[:-1])))
    sizes = np.diff(np.concatenate((starts, [len(q)])))
    rank = np.arange(len(q)) - np.repeat(starts, sizes)
    keep = rank < k
    q, v = q[keep], v[keep]
    sr = np.round(s[keep], 6)
    order2 = np.lexsort((v, -sr, q))
    return pa.table(
        {
            "query_id": pa.array(q[order2], type=pa.int64()),
            "vec_id": pa.array(v[order2], type=pa.int64()),
            "score": pa.array(sr[order2], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# int8 quantization + quantized KNN
# ---------------------------------------------------------------------------


def _quantize_mat(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-vector int8: scale = max|x|/127, code = clamp(round-half-
    away(x/scale), ±127).  Half-away (not numpy's half-even) mirrors DuckDB
    ``floor(x/scale + 0.5)`` / the negated form, so codes are bit-equal to
    the SQL oracle.  All-zero vectors quantize to all-zero codes, scale 0."""
    scale = np.abs(mat).max(axis=1) / 127.0
    safe = np.where(scale == 0, 1.0, scale)
    y = mat / safe[:, None]
    codes = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5))
    return np.clip(codes, -127, 127).astype(np.int8), scale


def quantize_embeddings(embeddings: ray.data.Dataset) -> ray.data.Dataset:
    """→ (vec_id, scale round6, codes list<int8>): 4× smaller vectors for the
    ANN paths (object-store bandwidth and actor memory are the 100-TB cost).
    Zero shuffle, whole-batch numpy."""
    from ..functions.words import round6

    def f(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        codes, scale = _quantize_mat(mat)
        dim = codes.shape[1] if len(ids) else 0
        flat = pa.array(codes.ravel(), type=pa.int8())
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "scale": pa.array(round6(scale), type=pa.float64()),
                "codes": pa.FixedSizeListArray.from_arrays(flat, dim)
                if len(ids)
                else pa.array([], type=pa.list_(pa.int8(), 0)),
            }
        )

    return embeddings.map_batches(f, batch_format="pyarrow")


def _empty_partial() -> pa.Table:
    """Zero-row (query_id, vec_id, score) partial — the empty-block return
    for the search stages (quantize_embeddings already guards this case)."""
    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


class QuantKNN:
    """Actor-pool stage over QUANTIZED vectors: integer dot products against
    the broadcast quantized queries; cosine ≈ int-dot / (int-norm product) —
    the per-vector scales cancel, so scores derive from integers only and the
    SQL oracle reproduces them bit-for-bit.  d=64 int8 codes: |dot| ≤
    127²·64 ≈ 1.03e6, exact in int32."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q_ids = np.asarray(sorted(q.keys()), dtype=np.int64)
        qm = np.stack([np.asarray(q[i], dtype=np.float64) for i in self.q_ids])
        qc, _ = _quantize_mat(qm)
        self.qc = qc.astype(np.int32)
        self.qn = np.sqrt((self.qc.astype(np.int64) ** 2).sum(axis=1).astype(np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if not len(ids):  # empty block: dim would infer 0 and reshape crash
            return _empty_partial()
        col = batch["codes"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        dim = len(flat) // max(len(ids), 1)
        dc = flat.reshape(len(ids), dim)
        dn = np.sqrt((dc.astype(np.int64) ** 2).sum(axis=1).astype(np.float64))
        dots = dc @ self.qc.T  # int32 exact
        denom = dn[:, None] * self.qn[None, :]
        denom[denom == 0] = np.inf  # zero-norm vectors score 0
        sims = dots.astype(np.float64) / denom
        k = min(self.k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.q_ids)):
            s = sims[:, qi]
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


def knn_quantized_cosine(
    embeddings: ray.data.Dataset, queries: dict[int, np.ndarray], k: int = 10
) -> pa.Table:
    """Top-k per query over int8-quantized vectors → (query_id, vec_id,
    score rounded 1e-6), sorted.  Same partial/merge shape as
    knn_brute_cosine; the quantize pass streams (no materialization)."""
    qref = ray.put(queries)
    partial = quantize_embeddings(embeddings).map_batches(
        QuantKNN,
        batch_format="pyarrow",
        concurrency=actor_pool(),
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
    ).to_pandas()
    return _topk_merge(partial, k)


# ---------------------------------------------------------------------------
# exact near-dup: blocked all-pairs
# ---------------------------------------------------------------------------


def _normalize_block(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding) → (vec_id, unit-norm embedding as float64 list)."""
    if len(batch) == 0:  # dim is unknowable from an empty block
        return pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.large_list(pa.float64())),
            }
        )
    ids, mat = _emb_matrix(batch)
    unit = _unit_rows(mat)
    n, dim = unit.shape
    off = np.arange(0, (n + 1) * dim, dim, dtype=np.int64)
    emb = pa.LargeListArray.from_arrays(off, pa.array(unit.ravel(), type=pa.float64()))
    return pa.table({"vec_id": pa.array(ids, type=pa.int64()), "embedding": emb})


def _assign_clusters(batch: pa.Table, cent_ref) -> pa.Table:
    """Normalize a block and append its nearest-centroid ``cluster`` column —
    the ONE cluster-assignment kernel (IVF build and ivf_near_dups share it;
    empty blocks pass through with the cluster column attached)."""
    cm = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    t = _normalize_block(batch)
    if len(t) == 0:
        return t.append_column("cluster", pa.array([], type=pa.int32()))
    _, bmat = _emb_matrix(t)
    cluster = np.argmax(bmat @ cm.T, axis=1).astype(np.int32)
    return t.append_column("cluster", pa.array(cluster, type=pa.int32()))


class _TilePairs:
    """Block-pair tile: pulls two normalized blocks from the object store,
    emits only the (a < b, cosine ≥ threshold) matches of the tile."""

    def __init__(self, blocks_ref, threshold: float):
        self.blocks = ray.get(blocks_ref) if isinstance(blocks_ref, ray.ObjectRef) else blocks_ref
        self.t = threshold
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _block(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        if i not in self._cache:
            if len(self._cache) > 4:
                self._cache.clear()
            self._cache[i] = _emb_matrix(ray.get(self.blocks[i]))
        return self._cache[i]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_a, rows_b, rows_s = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, m_i = self._block(i)
            ids_j, m_j = self._block(j)
            sims = m_i @ m_j.T
            mask = sims >= self.t
            if i == j:  # diagonal tile: keep one orientation per pair
                mask = np.triu(mask, k=1)
            bi, bj = np.nonzero(mask)
            if len(bi):
                a = ids_i[bi]
                b = ids_j[bj]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                keep = lo < hi  # drops self-pairs on the diagonal tile
                rows_a.append(lo[keep])
                rows_b.append(hi[keep])
                rows_s.append(np.round(sims[bi, bj][keep], 6))
        if not rows_a:
            return _pairs_empty()
        return pa.table(
            {
                "vec_id_a": pa.array(np.concatenate(rows_a), type=pa.int64()),
                "vec_id_b": pa.array(np.concatenate(rows_b), type=pa.int64()),
                "cosine": pa.array(np.concatenate(rows_s), type=pa.float64()),
            }
        )


def _pairs_empty() -> pa.Table:
    return pa.table(
        {
            "vec_id_a": pa.array([], type=pa.int64()),
            "vec_id_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )


def embedding_near_dups(
    embeddings: ray.data.Dataset, threshold: float = 0.95, block_rows: int = 16384
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs, EXACT, blocked all-pairs.

    The normalized blocks live in the object store (spillable); the pipeline
    streams over block-pair indices with backpressure, so peak worker memory
    is two blocks + one tile, and driver memory is refs + matches."""
    # the dataset is consumed twice (count + block pass): materialize so the
    # upstream read/transform runs once, not per consumption
    embeddings = embeddings.materialize()
    n = embeddings.count()
    nblocks = max(1, -(-n // block_rows))
    blocks = (
        embeddings.repartition(nblocks)
        .map_batches(_normalize_block, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()
    )
    blocks_ref = ray.put(blocks)
    tiles = [{"i": i, "j": j} for i in range(len(blocks)) for j in range(i, len(blocks))]
    out = (
        ray.data.from_items(tiles)
        .map_batches(
            _TilePairs,
            batch_format="pyarrow",
            batch_size=4,
            concurrency=actor_pool(),
            fn_constructor_kwargs={"blocks_ref": blocks_ref, "threshold": threshold},
        )
        .to_pandas()  # matches only
    )
    if len(out) == 0:
        return _pairs_empty()
    out = out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# IVF-flat, disk-backed
# ---------------------------------------------------------------------------


def _sample_matrix(embeddings: ray.data.Dataset, seed: int, sample_rows: int = 4096) -> np.ndarray:
    """Deterministic bounded sample → unit-row matrix (≤ sample_rows × dim on
    the driver — the only driver-side collect either fit mode performs)."""
    n = embeddings.count()
    sample = embeddings if n <= sample_rows else embeddings.random_sample(sample_rows / n, seed=seed)
    parts = [
        _emb_matrix(b)[1]
        for b in sample.iter_batches(batch_format="pyarrow", batch_size=sample_rows)
    ]
    return _unit_rows(np.concatenate(parts, axis=0))


def _kmeans_centroids(
    embeddings: ray.data.Dataset, nlist: int, iters: int, seed: int, sample_rows: int = 4096
) -> np.ndarray:
    """Deterministic seeded k-means over a bounded sample (spherical)."""
    mat = _sample_matrix(embeddings, seed, sample_rows)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            sel = mat[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _unit_rows(cent)
    return cent


def _kmeans_init(embeddings: ray.data.Dataset, nlist: int, seed: int, sample_rows: int = 4096) -> np.ndarray:
    """Deterministic seeded centroid init from a bounded sample (the only
    driver-side step of the distributed fit; ≤ ``sample_rows`` × dim)."""
    mat = _sample_matrix(embeddings, seed, sample_rows)
    rng = np.random.default_rng(seed)
    return mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]


def _partial_empty() -> pa.Table:
    return pa.table(
        {
            "cluster": pa.array([], type=pa.int32()),
            "cnt": pa.array([], type=pa.int64()),
            "vsum": pa.array([], type=pa.large_binary()),
        }
    )


def _sum_partials(g: pa.Table) -> pa.Table:
    """Reduce one cluster's per-block partials to a single (cnt, vsum) row.
    Partials are folded in SORTED byte order so the float64 sum is
    deterministic regardless of which worker emitted which row first."""
    if len(g) == 0:
        return _partial_empty()
    bufs = sorted(g["vsum"].to_pylist())
    acc = np.frombuffer(bufs[0], dtype=np.float64).copy()
    for b in bufs[1:]:
        acc += np.frombuffer(b, dtype=np.float64)
    import pyarrow.compute as pc

    return pa.table(
        {
            "cluster": pa.array([g["cluster"][0].as_py()], type=pa.int32()),
            "cnt": pa.array([pc.sum(g["cnt"]).as_py()], type=pa.int64()),
            "vsum": pa.array([acc.tobytes()], type=pa.large_binary()),
        }
    )


def kmeans_fit_full(
    embeddings: ray.data.Dataset,
    nlist: int,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """DISTRIBUTED spherical k-means (Lloyd) over the FULL dataset.

    Each iteration is one streaming ``map_batches`` pass emitting per-block
    partial sums — (cluster, count, Σ unit-vectors as float64 bytes), one row
    per non-empty cluster per block — reduced by a narrow
    ``groupby(cluster).map_groups`` shuffle to exactly ``nlist`` rows.  The
    driver only ever holds k×(d+1) floats per iteration (the new centroids),
    never a vector row: the scale contract the sample-based
    :func:`_kmeans_centroids` (bounded driver sample) cannot give.

    Shuffle budget: iters × one exchange of ≤ blocks×nlist rows of d×8 bytes
    (at 1e6 blocks × 1024 lists × d=128 that is ~1 TB of partials worst-case;
    in practice a block only touches the clusters present in it).  Empty
    clusters keep their previous centroid (same rule as the sample fit).
    Determinism: partials fold in sorted byte order per cluster, so the fit
    is bit-stable for a fixed input block layout and allclose across layouts.
    """
    embeddings = embeddings.materialize()  # consumed iters+1 times
    cent = _kmeans_init(embeddings, nlist, seed)
    k = len(cent)
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            cm = ray.get(cent_ref)
            t = _normalize_block(batch)
            if len(t) == 0:
                return _partial_empty()
            _, m = _emb_matrix(t)
            a = np.argmax(m @ cm.T, axis=1)
            counts = np.bincount(a, minlength=len(cm))
            sums = np.zeros((len(cm), cm.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int32), type=pa.int32()),
                    "cnt": pa.array(counts[nz].astype(np.int64), type=pa.int64()),
                    "vsum": pa.array([sums[c].tobytes() for c in nz], type=pa.large_binary()),
                }
            )

        reduced = (
            embeddings.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(_sum_partials, batch_format="pyarrow")
            .to_pandas()  # exactly ≤ nlist rows by construction
        )
        new = cent.copy()
        for c, cnt, vsum in zip(reduced["cluster"], reduced["cnt"], reduced["vsum"]):
            if 0 <= int(c) < k and cnt > 0:
                new[int(c)] = np.frombuffer(vsum, dtype=np.float64) / float(cnt)
        cent = _unit_rows(new)
    return cent


class IVFIndex:
    """IVF-flat over unit vectors, lists on disk.

    Layout: ``index_dir/centroids.npy``, ``index_dir/ivf.json`` (manifest:
    nlist, dim, counts per cluster), ``index_dir/lists/cluster=NNN/*.parquet``
    (vec_id + unit embedding; with ``codes="pq"``: vec_id + m-byte residual
    code, plus ``pq_books.npy``).  Search reads only the probed partitions —
    at cluster scale each probe is a selective parquet read, and a query
    touches nprobe/nlist of the data."""

    def __init__(self, index_dir: str, cache_clusters: int = 8):
        self.index_dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        with open(os.path.join(index_dir, "ivf.json")) as f:
            self.meta = json.load(f)
        self.books = (
            np.load(os.path.join(index_dir, "pq_books.npy"))
            if self.meta.get("codes") == "pq"
            else None
        )
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cache_cap = cache_clusters

    @classmethod
    def build(
        cls,
        embeddings: ray.data.Dataset,
        index_dir: str,
        nlist: int = 16,
        iters: int = 5,
        seed: int = 42,
        fit: str = "sample",
        codes: str = "flat",
        pq_m: int = 16,
        pq_ks: int = 256,
    ) -> "IVFIndex":
        """``fit="sample"``: bounded-driver-sample k-means (fast, default);
        ``fit="full"``: :func:`kmeans_fit_full` distributed Lloyd over the
        whole dataset — the corpus-scale path (sampling bias-free centroids,
        driver holds k×d only).

        ``codes="pq"`` stores RESIDUAL PQ codes instead of full vectors
        (IVFADC, Jégou et al. 2011): lists hold (vec_id, m-byte code), so
        disk + probe bandwidth shrink dim·4/m× (16× at d=64, m=16); search
        scores q·x ≈ q·centroid + Σ_j lut[j, code_j] — the residual
        codebooks are fit on the same deterministic sample as the
        centroids."""
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        os.makedirs(index_dir, exist_ok=True)
        if fit == "full":
            cent = kmeans_fit_full(embeddings, nlist, iters, seed)
        else:
            cent = _kmeans_centroids(embeddings, nlist, iters, seed)
        cent_ref = ray.put(cent)

        books = None
        if codes == "pq":
            sample = _sample_matrix(embeddings, seed)
            a = np.argmax(sample @ cent.T, axis=1)  # the _assign_clusters rule
            books = _pq_fit_mat(sample - cent[a], pq_m, pq_ks, seed, iters=10)
            books_ref = ray.put(books)
            n_sub = books.shape[0]

            def assign_batch(batch: pa.Table) -> pa.Table:
                t = _assign_clusters(batch, cent_ref)
                if len(t) == 0:
                    return pa.table(
                        {
                            "vec_id": pa.array([], type=pa.int64()),
                            "cluster": pa.array([], type=pa.int32()),
                            "code": pa.array([], type=pa.list_(pa.uint8(), n_sub)),
                        }
                    )
                bks = ray.get(books_ref)
                cm = ray.get(cent_ref)
                _, mat = _emb_matrix(t)  # rows already normalized by _assign_clusters
                cl = t["cluster"].to_numpy(zero_copy_only=False)
                codes_arr = pq_encode_batch(mat - cm[cl], bks)
                flat = pa.array(codes_arr.ravel(), type=pa.uint8())
                return pa.table(
                    {
                        "vec_id": t["vec_id"],
                        "cluster": t["cluster"],
                        "code": pa.FixedSizeListArray.from_arrays(flat, n_sub),
                    }
                )

        else:

            def assign_batch(batch: pa.Table) -> pa.Table:
                return _assign_clusters(batch, cent_ref)

        # streaming partitioned write: lists land as cluster=NNN/ parquet
        # directories straight from the assign stage — the driver never sees
        # a vector
        embeddings.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
            os.path.join(index_dir, "lists"), partition_cols=["cluster"]
        )
        counts: dict[str, int] = {}
        lists_dir = os.path.join(index_dir, "lists")
        for d in sorted(os.listdir(lists_dir)):
            if d.startswith("cluster="):
                c = int(d.split("=")[1])
                counts[str(c)] = pads.dataset(os.path.join(lists_dir, d)).count_rows()
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        if books is not None:
            np.save(os.path.join(index_dir, "pq_books.npy"), books)
        with open(os.path.join(index_dir, "ivf.json"), "w") as f:
            json.dump(
                {
                    "nlist": int(len(cent)),
                    "dim": int(cent.shape[1]),
                    "counts": counts,
                    "codes": codes,
                },
                f,
            )
        return cls(index_dir)

    def _load_cluster(self, c: int) -> tuple[np.ndarray, np.ndarray] | None:
        if c in self._cache:
            return self._cache[c]
        part = os.path.join(self.index_dir, "lists", f"cluster={c}")
        if not os.path.isdir(part):
            return None
        if self.books is not None:
            t = pads.dataset(part).to_table(columns=["vec_id", "code"]).combine_chunks()
            vids = t["vec_id"].to_numpy(zero_copy_only=False)
            col = t["code"].combine_chunks() if isinstance(t["code"], pa.ChunkedArray) else t["code"]
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            got = (vids, flat.reshape(len(vids), self.books.shape[0]))
        else:
            t = pads.dataset(part).to_table(columns=["vec_id", "embedding"])
            got = _emb_matrix(t.combine_chunks())
        if len(self._cache) >= self._cache_cap:
            self._cache.pop(next(iter(self._cache)))
        self._cache[c] = got
        return got

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4):
        q = np.asarray(query, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ q))[:nprobe]
        lut = cols = None
        if self.books is not None:
            m, ks, dsub = self.books.shape
            # q·x = q·centroid + q·residual; the residual term is one LUT
            # gather per subspace (ADC) — the LUT is query-only, shared by
            # every probed cluster
            lut = np.einsum("jd,jcd->jc", q.reshape(m, dsub), self.books)
            cols = np.arange(m)
        ids_parts, score_parts = [], []
        for c in order:
            got = self._load_cluster(int(c))
            if got is None:
                continue
            vids, m = got
            ids_parts.append(vids)
            if lut is not None:
                score_parts.append(
                    lut[cols[None, :], m].sum(axis=1) + float(self.centroids[c] @ q)
                )
            else:
                score_parts.append(m @ q)
        if not ids_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(ids_parts)
        scores = np.concatenate(score_parts)
        top = np.lexsort((ids, -scores))[:k]
        return ids[top], scores[top]


def knn_ivf_cosine(
    index: IVFIndex, queries: dict[int, np.ndarray], k: int = 10, nprobe: int = 4
) -> pa.Table:
    """Batch IVF search → (query_id, vec_id, score rounded 1e-6), sorted.
    With nprobe = nlist this is exact (every list scanned) and matches the
    brute-force oracle; smaller nprobe trades recall for a nprobe/nlist scan
    fraction (recall asserted in pytest)."""
    rows = []
    for qid in sorted(queries):
        ids, scores = index.search(np.asarray(queries[qid], dtype=np.float64), k=k, nprobe=nprobe)
        for v, s in zip(ids, scores):
            rows.append((int(qid), int(v), round(float(s), 6)))
    rows.sort(key=lambda t: (t[0], -t[2], t[1]))
    return pa.table(
        {
            "query_id": pa.array([a for a, _, _ in rows], type=pa.int64()),
            "vec_id": pa.array([b for _, b, _ in rows], type=pa.int64()),
            "score": pa.array([c for _, _, c in rows], type=pa.float64()),
        }
    )


class _IVFSearchStage:
    """Actor-pool IVF search: each actor opens the disk-backed index once
    (centroids + cluster-partition LRU in ``__init__``) and serves query
    batches — the multi-node search path: queries stream as a Dataset, the
    lists stay parquet partitions on shared storage, and each probe is a
    selective read."""

    def __init__(self, index_dir: str, k: int, nprobe: int):
        self.index = IVFIndex(index_dir)
        self.k = k
        self.nprobe = nprobe

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, vids, scores = [], [], []
        ids, mat = _emb_matrix(batch.select(["vec_id", "embedding"]).combine_chunks())
        for i in range(len(ids)):
            top_ids, top_scores = self.index.search(mat[i], k=self.k, nprobe=self.nprobe)
            qids.append(np.full(len(top_ids), ids[i], dtype=np.int64))
            vids.append(top_ids)
            scores.append(top_scores)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids) if qids else [], type=pa.int64()),
                "vec_id": pa.array(np.concatenate(vids) if vids else [], type=pa.int64()),
                "score": pa.array(np.concatenate(scores) if scores else [], type=pa.float64()),
            }
        )


def knn_ivf_search_batch(
    index_dir: str,
    queries: ray.data.Dataset,
    k: int = 10,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """Distributed IVF search over a query Dataset (vec_id, embedding) →
    (query_id, vec_id, score) rows, k per query."""
    return queries.map_batches(
        _IVFSearchStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=actor_pool(),
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "nprobe": nprobe},
    )


def _within_group_pairs(g: pa.Table, threshold: float) -> pa.Table:
    """All (a < b, cosine ≥ threshold) pairs WITHIN one already-normalized
    group — the shared per-block kernel of every blocked near-dup variant
    (IVF clusters, sign-grid cells).  One matmul, no Python pair loop."""
    ids, m = _emb_matrix(g.select(["vec_id", "embedding"]).combine_chunks())
    sims = m @ m.T
    bi, bj = np.nonzero(np.triu(sims >= threshold, k=1))
    if len(bi) == 0:
        return _pairs_empty()
    a = np.minimum(ids[bi], ids[bj])
    b = np.maximum(ids[bi], ids[bj])
    return pa.table(
        {
            "vec_id_a": pa.array(a, type=pa.int64()),
            "vec_id_b": pa.array(b, type=pa.int64()),
            "cosine": pa.array(np.round(sims[bi, bj], 6), type=pa.float64()),
        }
    )


def _blocked_pairs(
    assigned: ray.data.Dataset, key: str, threshold: float
) -> pa.Table:
    """groupby(key) → within-group pairs → sorted driver-side match table
    (matches only — the contract every near-dup variant shares)."""
    out = (
        assigned.groupby(key)
        .map_groups(lambda g: _within_group_pairs(g, threshold), batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return _pairs_empty()
    out = out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def ivf_near_dups(
    embeddings: ray.data.Dataset, threshold: float = 0.95, nlist: int = 16, seed: int = 42
) -> pa.Table:
    """APPROXIMATE near-dup pairs via IVF-bucketed blocking: vectors are
    assigned to their nearest centroid, pairs are emitted within each
    cluster only (groupby → vectorized all-pairs per cluster).  Scan cost
    ~O(N²/nlist); cross-cluster near-dups are missed by construction (the
    exact path is :func:`embedding_near_dups`).  Same emit contract."""
    cent = _kmeans_centroids(embeddings, nlist, iters=5, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        return _assign_clusters(batch, cent_ref)

    return _blocked_pairs(
        embeddings.map_batches(assign, batch_format="pyarrow"), "cluster", threshold
    )


def semdedup(
    embeddings: ray.data.Dataset, threshold: float = 0.95, bits: int = 6
) -> ray.data.Dataset:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023): drop all but one
    member of every semantic-near-duplicate component over the embedding
    column, END TO END — block (deterministic sign-grid cells, the
    SQL-expressible LSH of :func:`grid_near_dups`), pair within blocks
    (cosine ≥ threshold), connect components (cluster.duplicate_clusters —
    Hash-to-Min over edge-scale state, O(log d) rounds), keep the canonical
    min-id member per component (cluster.canonical_filter — drop-set
    broadcast, ids stream through a vectorized isin).

    Returns the KEPT vec_ids as a streaming Dataset.  The paper keeps the
    member farthest from the cluster centroid; this engine keeps min-id so
    the whole pipeline (blocking included) carries a bit-exact SQL oracle —
    the keep-rule is a one-line swap documented here, not a structural
    difference.

    Scale contract: pairs/components are candidate-scale (≪ corpus, the
    near-dup contract shared with dedup_canonical); the embedding table
    itself never shuffles — cells are computed per batch and only matching
    pairs leave the groupby."""
    from .cluster import canonical_filter, duplicate_clusters

    pairs = (
        grid_near_dups(embeddings, threshold=threshold, bits=bits)
        .to_pandas()
        .rename(columns={"vec_id_a": "doc_id_a", "vec_id_b": "doc_id_b"})
    )
    clusters = duplicate_clusters(pairs)
    return canonical_filter(
        embeddings.select_columns(["vec_id"]), clusters, id_col="vec_id"
    )


def grid_near_dups(
    embeddings: ray.data.Dataset, threshold: float = 0.95, bits: int = 6
) -> pa.Table:
    """APPROXIMATE near-dup pairs via DETERMINISTIC sign-grid blocking —
    random-hyperplane LSH with axis-aligned planes: a vector's cell is the
    sign bit-pattern of its first ``bits`` dimensions (sign is invariant
    under normalization, so the cell is computable from the raw column and
    therefore exactly SQL-expressible — unlike the k-means blocking of
    :func:`ivf_near_dups`, this variant carries a full value-hash oracle).

    Pairs are emitted within a cell only: scan cost ~O(Σ cell²) ≈
    O(N²/2^bits) for balanced signs; a pair differing in any of the first
    ``bits`` signs is missed by construction (the exact path is
    :func:`embedding_near_dups`).  Same emit contract.  At corpus scale a
    skewed sign distribution concentrates cells — raise ``bits`` (cells are
    data-independent, so re-blocking is a metadata change, not a re-train)."""
    weights = (1 << np.arange(bits, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        t = _normalize_block(batch)
        if len(t) == 0:
            return t.append_column("cell", pa.array([], type=pa.int64()))
        _, m = _emb_matrix(t)
        cell = ((m[:, :bits] >= 0).astype(np.int64) * weights).sum(axis=1)
        return t.append_column("cell", pa.array(cell, type=pa.int64()))

    return _blocked_pairs(
        embeddings.map_batches(assign, batch_format="pyarrow"), "cell", threshold
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) + ADC search
# ---------------------------------------------------------------------------


def pq_fit(
    embeddings: ray.data.Dataset,
    m: int = 16,
    ks: int = 256,
    seed: int = 7,
    sample_rows: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Per-subspace k-means codebooks → (m, ks, dim/m) float64.

    Jégou et al. 2011 (PQ): split unit vectors into ``m`` subvectors, run a
    small Lloyd's k-means per subspace on a DETERMINISTIC bounded sample
    (the ``_sample_matrix`` contract — the only driver-side collect), so
    refits reproduce byte-identical codebooks.  Empty clusters keep their
    previous centroid (standard Lloyd degeneracy guard).

    ks=256 is classic 8-bit PQ (codes stay uint8, max index 255).  Measured
    recall@10 vs exact on the d=64 synthetic gate fixture (near-worst-case
    unstructured vectors): m=16/ks=256 → 0.90 at 16× compression;
    m=32/ks=128 → 0.94 at 8×; m=16/ks=16 → 0.46 (too coarse)."""
    return _pq_fit_mat(_sample_matrix(embeddings, seed, sample_rows), m, ks, seed, iters)


def _pq_fit_mat(x: np.ndarray, m: int, ks: int, seed: int, iters: int) -> np.ndarray:
    """Per-subspace Lloyd over an in-memory (n, dim) matrix (the sample —
    bounded by the _sample_matrix contract)."""
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if ks > 256:
        # codes are uint8 (pq_encode_batch): a larger ks would silently
        # wrap argmin indices into corrupt codes
        raise ValueError(f"ks={ks} exceeds the uint8 code space (max 256)")
    dsub = dim // m
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        rng = np.random.default_rng(seed * 1_000_003 + j)
        cent = xj[rng.choice(n, size=min(ks, n), replace=False)].copy()
        if len(cent) < ks:  # degenerate tiny corpus: pad by repeating
            cent = np.concatenate([cent] * (ks // len(cent) + 1))[:ks].copy()
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                sel = assign == c
                if sel.any():
                    cent[c] = xj[sel].mean(axis=0)
        books[j] = cent
    return books


def pq_encode_batch(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) unit rows → (n, m) uint8 codes: per-subspace nearest
    centroid, vectorized (one argmin over the (n, ks) distance matrix per
    subspace)."""
    n = len(mat)
    m, ks, dsub = books.shape
    if ks > 256:
        raise ValueError(f"ks={ks} exceeds the uint8 code space (max 256)")
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        xj = mat[:, j * dsub : (j + 1) * dsub]
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row for argmin
        d2 = -2.0 * (xj @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(embeddings: ray.data.Dataset, books: np.ndarray) -> ray.data.Dataset:
    """→ (vec_id, code fixed_size_list<uint8, m>): dim·4 bytes → m bytes per
    vector (16× at d=64, m=16) — the storage/bandwidth form vector search
    ships at 100 TB.  Codebooks broadcast once via ``ray.put``."""
    bref = ray.put(books)

    class Encode:
        def __init__(self):
            self.books = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _emb_matrix(batch)
            codes = pq_encode_batch(_unit_rows(mat), self.books)
            flat = pa.array(codes.ravel(), type=pa.uint8())
            return pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "code": pa.FixedSizeListArray.from_arrays(flat, self.books.shape[0])
                    if len(ids)
                    else pa.array([], type=pa.list_(pa.uint8(), self.books.shape[0])),
                }
            )

    return embeddings.map_batches(Encode, batch_format="pyarrow", concurrency=actor_pool())


class PQSearch:
    """Actor-pool ADC search: per actor, build one (m, ks) inner-product
    lookup table per query from the float query vs the codebooks
    (``__init__``); per batch, encode and score = Σ_j lut[j, code_j] — a
    single fancy-gather per subspace, approximating cosine on unit rows.
    At scale the encode happens once at ingest (pq_encode) and only the
    m-byte codes stream through search."""

    def __init__(self, books_ref, queries_ref, k: int):
        books = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.books = books
        self.q_ids = np.asarray(sorted(q.keys()), dtype=np.int64)
        qm = _unit_rows(np.stack([np.asarray(q[i], dtype=np.float64) for i in self.q_ids]))
        m, ks, dsub = books.shape
        # lut[qi, j, c] = q_sub_j · books[j, c]
        self.lut = np.einsum("qjd,jcd->qjc", qm.reshape(len(qm), m, dsub), books)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        if not len(ids):  # empty block: same guard as QuantKNN
            return _empty_partial()
        codes = pq_encode_batch(_unit_rows(mat), self.books)
        m = self.books.shape[0]
        cols = np.arange(m)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi in range(len(self.q_ids)):
            s = self.lut[qi][cols[None, :], codes].sum(axis=1)
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


def knn_pq_adc(
    embeddings: ray.data.Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    m: int = 16,
    ks: int = 256,
    seed: int = 7,
    books: np.ndarray | None = None,
) -> pa.Table:
    """Approximate top-k cosine via PQ codes + ADC → (query_id, vec_id,
    score rounded 1e-6).  Codebooks are engine-defined (k-means), so this
    op is rows-only at the gate; its recall is measured against the exact
    knn_brute_cosine sibling (pytest + gate log), the dedup_embedding_ivf
    precedent."""
    if books is None:
        books = pq_fit(embeddings, m=m, ks=ks, seed=seed)
    bref, qref = ray.put(books), ray.put(queries)
    partial = embeddings.map_batches(
        PQSearch,
        batch_format="pyarrow",
        concurrency=actor_pool(),
        fn_constructor_kwargs={"books_ref": bref, "queries_ref": qref, "k": k},
    ).to_pandas()
    return _topk_merge(partial, k)


# ===========================================================================
# integer Gram matrix + distributed PCA over the embedding column
# ===========================================================================

GRAM_SCALE = 1000


def _milli_quantize(mat: np.ndarray, scale: int = GRAM_SCALE) -> np.ndarray:
    """Half-away-from-zero fixed-point quantization (== DuckDB
    ``round(x · scale)``), so integer products are bit-reproducible at any
    summation order — the float-determinism house rule for shuffled sums."""
    return (np.sign(mat) * np.floor(np.abs(mat) * scale + 0.5)).astype(np.int64)


def embedding_gram(
    embeddings: ray.data.Dataset, *, scale: int = GRAM_SCALE
) -> ray.data.Dataset:
    """EXACT-INTEGER second-moment (Gram) matrix of the embedding column —
    the one-pass statistic under PCA / whitening / covariance dedup.

    Per batch: quantize to fixed-point, one ``QᵀQ`` int64 matmul, emit the
    d(d+1)/2 upper-triangle rows (i, j, s).  One groupby over (i, j) merges
    partials — the shuffle is O(d² · batches) rows of 24 B, NEVER the
    embeddings.  Sums are exact int64, so the result is identical at any
    parallelism and fully value-hash oracled in SQL (pairwise self-join on
    vec_id).  Magnitude contract: |q| ≤ scale·max|x|; Σ q_i·q_j over N rows
    needs N · (scale·max|x|)² < 2⁶³ — at 10¹² rows drop ``scale`` to 100
    (the bound is documented, not silent)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        if mat.size == 0:
            return pa.table(
                {
                    "i": pa.array([], type=pa.int64()),
                    "j": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.int64()),
                }
            )
        q = _milli_quantize(mat, scale)
        g = q.T @ q  # exact int64
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "s": pa.array(g[iu, ju]),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="s"))
    )


def _gram_moments(
    embeddings: ray.data.Dataset, scale: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """(S = Σ qqᵀ, m = Σ q, n) in one streaming pass — d×d int64 partials
    per batch, merged on the driver (d² ints, constant-size)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        q = _milli_quantize(mat, scale)
        d = q.shape[1] if q.size else 0
        g = (q.T @ q).ravel() if d else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "d": pa.array([d], type=pa.int64()),
                "n": pa.array([len(q)], type=pa.int64()),
                "g": pa.array([g.tobytes()], type=pa.large_binary()),
                "m": pa.array([q.sum(axis=0, dtype=np.int64).tobytes()], type=pa.large_binary()),
            }
        )

    parts = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts[parts["d"] > 0]
    d = int(parts["d"].iloc[0])
    S = np.zeros((d, d), dtype=np.int64)
    m = np.zeros(d, dtype=np.int64)
    for g, mm in zip(parts["g"], parts["m"]):
        S += np.frombuffer(g, dtype=np.int64).reshape(d, d)
        m += np.frombuffer(mm, dtype=np.int64)
    return S, m, int(parts["n"].sum())


def embedding_pca(
    embeddings: ray.data.Dataset, k: int, *, scale: int = GRAM_SCALE
) -> ray.data.Dataset:
    """Distributed PCA projection: covariance from ONE streaming
    moment pass (:func:`_gram_moments` — exact-int partials, so the fitted
    basis is identical at any parallelism), eigh of the d×d matrix on the
    driver (d² floats — trivially driver-scale), components broadcast once,
    projection streams with zero shuffle.

    Sign convention: each component's largest-|coefficient| entry is made
    positive, so the basis is unique despite eigh's sign ambiguity.  The
    BASIS is bitwise layout-stable; the float projection is BLAS-blocked
    per batch shape, so cross-layout agreement is to rounding (~1e-15),
    not bitwise — the reason this op is a rows-only gate while its moment
    pass (embedding_gram) carries the value-hash oracle.
    → (vec_id, pc0..pc{k-1}) float columns."""
    import ray as _ray

    S, m, n = _gram_moments(embeddings, scale)
    mu = m.astype(np.float64) / (n * scale)
    cov = S.astype(np.float64) / (n * scale * scale) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order]  # (d, k)
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(comp.shape[1])])
    flip[flip == 0] = 1.0
    comp = comp * flip
    comp_ref = _ray.put((mu, comp))

    class Project:
        def __init__(self):
            self.mu, self.comp = _ray.get(comp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _emb_matrix(batch)
            proj = (mat - self.mu) @ self.comp
            cols = {"vec_id": pa.array(ids)}
            for c in range(self.comp.shape[1]):
                cols[f"pc{c}"] = pa.array(proj[:, c], type=pa.float64())
            return pa.table(cols)

    return embeddings.map_batches(Project, batch_format="pyarrow", concurrency=actor_pool())
