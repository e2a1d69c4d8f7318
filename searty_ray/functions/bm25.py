"""BM25 scoring — the single shared scalar definition.

Both the Ray engine and the pure-Python oracle import THESE functions, so
"rank-identical scores" is well-defined: float64 everywhere, terms summed in
ascending-term order, ties broken by (-score, doc_id)  (FIXTURES.md §4).

The reference has no scoring at all (SURVEY.md preamble); this layer is the
new surface the north rule adds on top of searty's data model.
"""

from __future__ import annotations

import numpy as np

from ..schema import BM25_B, BM25_K1


def idf(n_docs: int, df: int | np.ndarray) -> float | np.ndarray:
    """ln(1 + (N - df + 0.5) / (df + 0.5))"""
    df = np.asarray(df, dtype=np.float64)
    out = np.log1p((n_docs - df + 0.5) / (df + 0.5))
    return float(out) if out.ndim == 0 else out


def tf_norm(tf: np.ndarray, doc_len: np.ndarray, avgdl: float) -> np.ndarray:
    """tf*(k1+1) / (tf + k1*(1 - b + b*|D|/avgdl)) — float64, vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    return tf * (BM25_K1 + 1.0) / denom


def term_scores(tf: np.ndarray, doc_len: np.ndarray, df: int, n_docs: int, avgdl: float) -> np.ndarray:
    """Per-doc contribution of one term."""
    return idf(n_docs, df) * tf_norm(tf, doc_len, avgdl)


def term_upper_bound(max_tf: np.ndarray | int, df: int, n_docs: int, avgdl: float) -> np.ndarray | float:
    """Upper bound of a term's contribution for block-max WAND.

    tf_norm is increasing in tf and decreasing in doc_len; the bound uses the
    block's max tf and the minimum possible doc length (dl ≥ tf, since a doc
    containing a term tf times has at least tf tokens).
    """
    mtf = np.asarray(max_tf, dtype=np.float64)
    bound = idf(n_docs, df) * tf_norm(mtf, np.maximum(mtf, 1.0), avgdl)
    return float(bound) if bound.ndim == 0 else bound


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (-score, doc_id), deterministic."""
    order = np.lexsort((doc_ids, -scores))
    return order[:k]


def topk_dense(scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k over a dense per-doc score array (index == doc_id); zero scores
    mean "no matching term" and never appear in results.

    argpartition narrows the field to ~k before the exact (-score, doc_id)
    sort, so cost is O(N) + O(k log k) instead of O(N log N)."""
    kk = min(k, len(scores))
    if kk <= 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    part = np.argpartition(-scores, kk - 1)[:kk]
    kth = scores[part].min()
    cand = np.nonzero(scores >= max(kth, np.nextafter(0, 1)))[0]  # ties kept, zeros dropped
    order = np.lexsort((cand, -scores[cand]))[:k]
    top = cand[order]
    return top.astype(np.int64), scores[top]


RRF_K = 60


def rrf_fuse(rankings, k_rrf: int = RRF_K):
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked (doc_id,
    score) lists in EXACT integer micro-units:

        rrf_micro(d) = Σ_lists 1_000_000 // (k_rrf + rank_list(d))

    Ranks are RE-DERIVED here by the canonical (round-6 score DESC,
    doc_id ASC) order so the fusion is independent of each engine's
    internal tie-break and bit-exact against a row_number() SQL mirror.
    Input lists are top-k (driver-resident by construction); returns a
    DataFrame (doc_id, rrf_micro) ordered by fused score."""
    import pandas as pd

    acc: dict[int, int] = {}
    for df in rankings:
        sub = df[["doc_id", "score"]].copy()
        sub = sub.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        for rank, doc in enumerate(sub["doc_id"], start=1):
            acc[int(doc)] = acc.get(int(doc), 0) + 1_000_000 // (k_rrf + rank)
    out = pd.DataFrame(
        {"doc_id": list(acc.keys()), "rrf_micro": list(acc.values())}
    ).astype({"doc_id": "int64", "rrf_micro": "int64"})
    return out.sort_values(
        ["rrf_micro", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
