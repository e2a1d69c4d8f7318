"""Deduplication operators (driver instructions: exact, MinHash+LSH, SimHash,
n-gram Jaccard) over the ``documents`` table.

Scale shapes:
* exact       — hash column in map_batches → groupby(hash) → min/count
                (one shuffle of (hash, doc_id) pairs only, never content).
* jaccard     — blocked pairwise: groupby(block key) → vectorized pairwise
                word-set Jaccard inside each group (block sizes bounded by the
                blocking key; for unblocked corpora use minhash_lsh instead).
* minhash_lsh — shingle → 64 minhash perms → band rows (band_id, band_hash,
                doc_id) → groupby(band) → candidate pairs → exact-Jaccard
                verify.  The classic near-dup pipeline; candidate generation
                never compares all pairs.
* simhash     — 64-bit simhash per doc in map_batches; near-dup candidates =
                equal value in any of 4 16-bit bands (hamming ≤ 3 heuristic),
                verified by true hamming distance.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import mix64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_md5_batch(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch[["doc_id", "text"]].copy()
    batch["text_md5"] = batch["text"].map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
    return batch[["doc_id", "text_md5"]]


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """→ (doc_id = min id per distinct text, n_dups).  D3 exact dedup."""
    from ray.data.aggregate import Count, Min

    hashed = docs.map_batches(add_md5_batch, batch_format="pandas")
    return hashed.groupby("text_md5").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    ).select_columns(["doc_id", "n_dups"])


# ---------------------------------------------------------------------------
# word-set Jaccard within blocks
# ---------------------------------------------------------------------------


def _word_sets(texts: list[str]) -> list[set[str]]:
    return [set(t.split()) for t in texts]


def jaccard_pairs_group(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    ids = group["doc_id"].to_numpy()
    sets = _word_sets(group["text"].tolist())
    a_ids, b_ids, sims = [], [], []
    for i, j in combinations(range(len(ids)), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        sim = inter / union if union else 0.0
        if sim >= threshold:
            lo, hi = (i, j) if ids[i] < ids[j] else (j, i)
            a_ids.append(ids[lo])
            b_ids.append(ids[hi])
            sims.append(round(sim, 6))
    return pd.DataFrame({"doc_id_a": a_ids, "doc_id_b": b_ids, "jaccard": sims})


def jaccard_dedup_pairs(
    docs: ray.data.Dataset, block_cols: list[str], threshold: float = 0.5
) -> ray.data.Dataset:
    """Near-dup candidate pairs with exact word-set Jaccard ≥ threshold,
    blocked by ``block_cols`` (pairs only compared within a block)."""
    return docs.groupby(block_cols).map_groups(
        lambda g: jaccard_pairs_group(g, threshold), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS


def _shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Word w-shingles → uint64 hashes (vectorized rolling mix)."""
    words = text.split()
    if len(words) < w:
        return np.asarray([mix64(np.uint64(len(words)))], dtype=np.uint64) if words else np.empty(0, np.uint64)
    base = np.array(
        [hash_word(word) for word in words], dtype=np.uint64
    )
    h = base[: len(words) - w + 1].copy()
    for i in range(1, w):
        h = mix64(h ^ base[i : i + len(h)])
    return np.unique(h)


_hash_word_cache: dict[str, int] = {}


def hash_word(word: str) -> int:
    h = _hash_word_cache.get(word)
    if h is None:
        if len(_hash_word_cache) > 1 << 20:
            _hash_word_cache.clear()
        h = _hash_word_cache[word] = int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")
    return h


def minhash_signature(text: str, seeds: np.ndarray) -> np.ndarray:
    """Permutation minima in ONE vectorized mix over the (perm, shingle) matrix."""
    sh = _shingle_hashes(text)
    if len(sh) == 0:
        return np.zeros(len(seeds), dtype=np.uint64)
    return mix64(sh[None, :] ^ seeds[:, None]).min(axis=1)


class MinHashStage:
    """Actor-pool stage: documents → LSH band rows (band, band_hash, doc_id).

    Seeds are built once per actor (__init__), signatures per batch."""

    def __init__(self):
        self.seeds = mix64(np.arange(1, N_PERM + 1, dtype=np.uint64) * np.uint64(0x9E3779B9))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_band, rows_hash = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = minhash_signature(text, self.seeds)
            for b in range(N_BANDS):
                band = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                acc = np.uint64(b)  # positional combine: band equality ⇔ same values in order
                for v in band:
                    acc = np.uint64(mix64(acc ^ v))
                rows_doc.append(doc_id)
                rows_band.append(b)
                rows_hash.append(int(acc))
        return pd.DataFrame(
            {"band": rows_band, "band_hash": rows_hash, "doc_id": rows_doc}
        ).astype({"band": "int32", "band_hash": "uint64", "doc_id": "int64"})


def minhash_lsh_pairs(docs: ray.data.Dataset, threshold: float = 0.5) -> pd.DataFrame:
    """Candidate pairs from LSH buckets, verified with exact shingle Jaccard.

    → pandas (doc_id_a, doc_id_b, jaccard) sorted; candidate sets are small
    by construction so the verify step broadcasts the candidate doc texts.
    """
    bands = docs.map_batches(MinHashStage, batch_format="pandas", concurrency=2)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"doc_id_a": [], "doc_id_b": []})
        a, b = zip(*combinations(ids, 2))
        return pd.DataFrame({"doc_id_a": a, "doc_id_b": b})

    cand = (
        bands.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_id_a": [], "doc_id_b": [], "jaccard": []})
    texts = _fetch_texts(docs, sorted(set(cand["doc_id_a"]) | set(cand["doc_id_b"])))
    sh = {d: _shingle_hashes(t) for d, t in texts.items()}
    out = []
    for a, b in zip(cand["doc_id_a"], cand["doc_id_b"]):
        inter = len(np.intersect1d(sh[a], sh[b]))
        union = len(np.union1d(sh[a], sh[b]))
        j = inter / union if union else 0.0
        if j >= threshold:
            out.append((int(a), int(b), round(j, 6)))
    out.sort()
    return pd.DataFrame(out, columns=["doc_id_a", "doc_id_b", "jaccard"])


def _fetch_texts(docs: ray.data.Dataset, ids: list[int]) -> dict[int, str]:
    """Selective semi-join fetch of candidate texts (broadcast the id set)."""
    id_set = set(ids)
    t = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(lambda b: b[b["doc_id"].isin(id_set)], batch_format="pandas")
        .to_pandas()
    )
    return dict(zip(t["doc_id"], t["text"]))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word-unigram hashes (Charikar 2002)."""
    words = text.split()
    if not words:
        return 0
    hs = np.array([hash_word(w) for w in words], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    sig = batch["text"].map(simhash64).to_numpy(dtype=np.uint64)
    out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "simhash": sig})
    for b in range(4):  # pandas Series >> int rejects uint64 — shift in numpy
        out[f"band{b}"] = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def simhash_near_dups(docs: ray.data.Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """Candidate pairs sharing any 16-bit simhash band, verified by true
    hamming distance.  Banding runs as a Ray groupby (melted band rows), like
    the MinHash path; only the candidate pairs + their signatures come back
    to the driver (provably small for near-dup workloads)."""
    sigs = docs.map_batches(simhash_batch, batch_format="pandas")

    def melt(b: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame(
                {"band": b4, "value": b[f"band{b4}"], "doc_id": b["doc_id"], "simhash": b["simhash"]}
            )
            for b4 in range(4)
        ]
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_id_a": [], "doc_id_b": [], "sig_a": [], "sig_b": []})
        rows = sorted(zip(g["doc_id"], g["simhash"]))
        pairs = list(combinations(rows, 2))
        return pd.DataFrame(
            {
                "doc_id_a": [a for (a, _), _2 in pairs],
                "doc_id_b": [b for _1, (b, _) in pairs],
                "sig_a": [sa for (_, sa), _2 in pairs],
                "sig_b": [sb for _1, (_, sb) in pairs],
            }
        )

    cand = (
        sigs.map_batches(melt, batch_format="pandas")
        .groupby(["band", "value"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["doc_id_a", "doc_id_b"])
    )
    out = []
    for a, b2, sa, sb in zip(cand["doc_id_a"], cand["doc_id_b"], cand["sig_a"], cand["sig_b"]):
        d = bin(int(sa) ^ int(sb)).count("1")
        if d <= max_hamming:
            out.append((int(a), int(b2), d))
    out.sort()
    return pd.DataFrame(out, columns=["doc_id_a", "doc_id_b", "hamming"])
