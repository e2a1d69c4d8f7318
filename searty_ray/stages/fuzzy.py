"""Fuzzy (edit-distance ≤ 1) word matching pushed into the corpus scan.

Typo-tolerant lookup of identifier words — "DOC-7" also finds DOC-1 /
DOC-77 / DOC.7.  The reference engine only has exact symbol lookup
(`/root/reference/lib/searcher/definition_searcher.go:12-33`); this is the
tolerant sibling, expressed as a scan-side PUSHDOWN: the ed≤1 predicate is
evaluated vectorized inside every read batch, so only matching word
occurrences (a handful of rows per batch) ever reach the shuffle — the
same shape as a filter pushed below an aggregate.

The ed≤1 test is exact and fully vectorized — no per-word Python and no
DP matrix.  For strings a, b with prefix length p = lcp(a, b) and suffix
length s = lcp(reverse(a), reverse(b)):

* |a| == |b|:  ed(a,b) ≤ 1  ⇔  p + s ≥ |a| − 1
  (positions outside the prefix/suffix overlap number |a|−p−s ≤ 1 → at
  most one substitution; conversely one substitution at i gives p ≥ i,
  s ≥ |a|−i−1);
* ||a|−|b|| == 1:  ed(a,b) ≤ 1  ⇔  p + s ≥ min(|a|, |b|)
  (deleting position i of the longer aligns prefix i + suffix rest).

Words are maximal runs of the Lisp symbol-constituent class (the same
class the symbol index and the SQL oracles use), uppercased; the kernel
works on CODEPOINTS, so its distance equals DuckDB ``levenshtein`` on
characters (ASCII uppercasing — the corpus is ASCII; non-ASCII codepoints
are non-constituent in this class and never form words).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.tokenize import _SYMBOL_ASCII
from .analytics import _pk_any


def _batch_symbol_words(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All symbol-class words of a batch, uppercased, as slices of one
    codepoint buffer: → (cps, starts, lens, docrep).  One decode pass + one
    boolean run scan for the whole batch."""
    if not texts:
        e = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint32), e, e, e
    joined = "\x00".join(texts)  # NUL is non-constituent → never inside a word
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).copy()
    lower = (cps >= 97) & (cps <= 122)
    cps[lower] -= 32
    mask = np.zeros(len(cps), dtype=bool)
    a = cps < 128
    mask[a] = _SYMBOL_ASCII[cps[a]]
    starts = np.flatnonzero(mask & ~np.r_[False, mask[:-1]])
    ends = np.flatnonzero(mask & ~np.r_[mask[1:], False]) + 1
    dlens = np.array([len(t) for t in texts], dtype=np.int64)
    doffs = np.cumsum(dlens + 1) - (dlens + 1)  # start offset of each doc
    docrep = np.searchsorted(doffs, starts, side="right") - 1
    return cps, starts.astype(np.int64), (ends - starts).astype(np.int64), docrep


def ed1_mask(
    cps: np.ndarray, starts: np.ndarray, lens: np.ndarray, query: str
) -> np.ndarray:
    """Boolean mask: which of the given codepoint slices are within edit
    distance 1 of ``query`` (already uppercased by the caller)."""
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    lq = len(q)
    out = np.zeros(len(starts), dtype=bool)
    band = np.abs(lens - lq) <= 1
    idx = np.flatnonzero(band)
    if len(idx) == 0:
        return out
    s, l = starts[idx], lens[idx]
    n = len(idx)
    w = int(max(l.max(), lq))
    # padded codepoint matrix (ragged gather, one fancy index)
    mat = np.zeros((n, w), dtype=np.uint32)
    row = np.repeat(np.arange(n), l)
    col = np.arange(int(l.sum()), dtype=np.int64) - np.repeat(np.cumsum(l) - l, l)
    mat[row, col] = cps[np.repeat(s, l) + col]

    qpad = np.zeros(w, dtype=np.uint32)
    qpad[:lq] = q
    minl = np.minimum(l, lq)
    jj = np.arange(w)
    past = jj[None, :] >= minl[:, None]
    neq = (mat != qpad[None, :]) | past
    lcp = np.where(neq.any(axis=1), neq.argmax(axis=1), minl)

    ridx = l[:, None] - 1 - jj[None, :]
    matr = np.where(ridx >= 0, mat[np.arange(n)[:, None], np.maximum(ridx, 0)], 0)
    qr = np.zeros(w, dtype=np.uint32)
    qr[:lq] = q[::-1]
    neqr = (matr != qr[None, :]) | past
    lcs = np.where(neqr.any(axis=1), neqr.argmax(axis=1), minl)

    ok = np.where(l == lq, lcp + lcs >= lq - 1, lcp + lcs >= minl)
    out[idx] = ok
    return out


def _cps_to_str(cps: np.ndarray) -> str:
    return cps.astype("<u4").tobytes().decode("utf-32-le")


def fuzzy_word_stats(
    corpus: ray.data.Dataset,
    query: str,
    num_partitions: int = 16,
    text_col: str = "content",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(word, df, cf) for every corpus word within edit distance 1 of
    ``query``.  The fuzzy predicate runs inside the scan (combiner shape:
    per-batch (word, doc) counts), so the shuffle moves only matching
    words; df sums correctly because each doc lives in exactly one batch."""
    qu = query.upper()

    import pyarrow as pa

    def partial(b: pd.DataFrame) -> "pa.Table":
        # arrow large_string partials (not pandas object dtype) so the
        # shuffle blocks keep a size estimate — the word_counts/word_cooc
        # lesson (r5)
        cps, starts, lens, docrep = _batch_symbol_words(b[text_col].tolist())
        m = ed1_mask(cps, starts, lens, qu)
        if not m.any():
            return pa.table(
                {
                    "word": pa.array([], type=pa.large_string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "cf": pa.array([], type=pa.int64()),
                    "pgrp": pa.array([], type=pa.int64()),
                }
            )
        ids = b[id_col].to_numpy()[docrep[m]]
        words = [_cps_to_str(cps[a : a + ln]) for a, ln in zip(starts[m], lens[m])]
        g = (
            pd.DataFrame({"word": words, "doc_id": ids})
            .groupby(["word", "doc_id"], as_index=False)
            .size()
            .rename(columns={"size": "cf"})
        )
        return pa.table(
            {
                "word": pa.array(g["word"], type=pa.large_string()),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "cf": pa.array(g["cf"].to_numpy(np.int64)),
                "pgrp": pa.array(_pk_any(g["word"], num_partitions), type=pa.int64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        # (word, doc) rows are globally unique (one batch per doc), so
        # df = row count and cf = plain sum
        r = (
            g.groupby("word", as_index=False)
            .agg(df=("doc_id", "size"), cf=("cf", "sum"))
            .astype({"df": "int64", "cf": "int64"})
        )
        return r

    return (
        corpus.select_columns([id_col, text_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("pgrp")
        .map_groups(final, batch_format="pandas")
    )
