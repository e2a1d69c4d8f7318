"""Distributed BPE tokenizer training + application (Sennrich et al. 2016,
arXiv:1508.07909; apply = the canonical rank-priority encoder of GPT-2).

Train: ONE distributed corpus pass reduces to a (word, count) vocabulary
table — per-batch value_counts combiners, one vocab-scale groupby; nothing
corpus-scale ever reaches the driver.  The merge loop itself runs on the
driver over the VOCAB-SCALE table (the shape every production BPE trainer
uses — pair statistics over word counts, not over the corpus), with the
standard incremental pair index: O(affected words) per merge.

SCALE CONTRACT: the capped vocabulary (``min_count``) must fit the driver
— the word_cooc_capped / tfidf-broadcast house contract.  Zipf makes the
cap cheap: at web scale min_count=10 cuts the tail hapaxes that BPE
statistics cannot use anyway.

Apply: the merges table broadcasts ONCE (``ray.put``); each batch
factorizes its token stream and encodes each DISTINCT word once (per-actor
LRU word cache — the GPT-2 encoder shape), so per-batch cost is
distinct-words × merge depth, never tokens × depth.

Determinism: merge selection is (max count, then lexicographically
smallest pair); the corpus pass is a sum — order-free — so training is
identical at any parallelism / layout / resume point.

Symbols are unicode codepoints; merges act strictly within words (no
end-of-word marker — documented simplification, the marker variant is the
same machinery with a sentinel appended per word).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.words import WORD_RE

BPE_CACHE_CAP = 1 << 17


def bpe_word_counts(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """(word, cnt) over the whitespace-word stream — combiner-first: one
    value_counts row per (word, batch) shuffles, 64 coarse hash partitions,
    count filter applied AFTER the global sum (still distributed)."""
    import pyarrow.compute as pc

    from .analytics import _pk_any

    def partial(b: pd.DataFrame) -> pa.Table:
        vc = b[text_col].str.findall(WORD_RE).explode().dropna().value_counts()
        words = vc.index.to_numpy(dtype=object)
        return pa.table(
            {
                "word": pa.array(words, type=pa.large_string()),
                "cnt": pa.array(vc.to_numpy(np.int64)),
                "pgrp": pa.array(_pk_any(pd.Series(words), num_partitions), type=pa.int64()),
            }
        )

    def final(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("word", as_index=False)["cnt"].sum()
        # arrow out (house rule): object-dtype pandas blocks defeat Ray's
        # block-size estimator and poison downstream exchanges
        return pa.table(
            {
                "word": pa.array(out["word"].to_numpy(dtype=object), type=pa.large_string()),
                "cnt": pa.array(out["cnt"].to_numpy(np.int64)),
            }
        )

    wc = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("pgrp")
        .map_groups(final, batch_format="pandas")
    )
    if min_count > 1:
        wc = wc.map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)),
            batch_format="pyarrow",
        )
    return wc


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Merge every non-overlapping (a, b) occurrence, leftmost first."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    docs: ray.data.Dataset,
    num_merges: int,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges → DataFrame (rank, left, right).

    Driver loop over the vocab-scale count table with an incremental pair
    index: merging pair p touches only the words currently containing p
    (subtract that word's pair multiset, rewrite, add back — exact)."""
    import heapq

    wc = bpe_word_counts(docs, text_col=text_col, min_count=min_count).to_pandas()
    # vocab-scale by the min_count contract (module docstring)
    words: list[list[str]] = [list(w) for w in wc["word"].to_numpy(dtype=object)]
    counts = wc["cnt"].to_numpy(np.int64)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []  # lazy (-count, pair)

    def add_word(wi: int, sign: int) -> None:
        syms, c = words[wi], int(counts[wi]) * sign
        for x, y in zip(syms, syms[1:]):
            p = (x, y)
            nc = pair_counts.get(p, 0) + c
            pair_counts[p] = nc
            heapq.heappush(heap, (-nc, p))
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # pop stale heap entries until the top matches the live count;
        # (-c, p) ordering = max count, then lexicographically smallest
        # pair — the deterministic selection rule
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if -negc > 0 and pair_counts.get(p, 0) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        affected = [wi for wi in pair_words.get(best, ()) if _contains(words[wi], best)]
        for wi in affected:
            add_word(wi, -1)
            words[wi] = _merge_word(words[wi], best[0], best[1])
            add_word(wi, +1)
        # spent pair: exact count is now 0 by construction
        pair_counts.pop(best, None)
        pair_words.pop(best, None)

    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )


def _contains(syms: list[str], p: tuple[str, str]) -> bool:
    return any(x == p[0] and y == p[1] for x, y in zip(syms, syms[1:]))


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical rank-priority encoder: repeatedly merge the present pair
    with the LOWEST training rank (all its occurrences, leftmost first)
    until no learned pair remains — reproduces training segmentation."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        syms = _merge_word(syms, best[0], best[1])
    return syms


class BpeEncodeStage:
    """Actor-pool apply stage: merges fetched once per actor in
    ``__init__``; per batch, factorize the word stream and encode each
    DISTINCT word once through a persistent capped word cache."""

    def __init__(self, merges_ref, text_col: str, id_col: str):
        import ray as _ray

        m = _ray.get(merges_ref)
        self.ranks = {(l, r): i for i, (l, r) in enumerate(m)}
        self.text_col, self.id_col = text_col, id_col
        self.cache: dict[str, int] = {}

    def _token_len(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(bpe_encode_word(word, self.ranks))
            if len(self.cache) < BPE_CACHE_CAP:
                self.cache[word] = n
        return n

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        lists = b[self.text_col].str.findall(WORD_RE)
        n_words = lists.str.len().fillna(0).to_numpy(np.int64)
        toks = lists.explode().dropna()
        if len(toks):
            codes, uniq = pd.factorize(toks.to_numpy())
            lens = np.array([self._token_len(w) for w in uniq], dtype=np.int64)
            per_tok = lens[codes]
            row_ids = np.repeat(np.arange(len(b)), n_words)
            n_bpe = np.bincount(row_ids, weights=per_tok, minlength=len(b)).astype(np.int64)
        else:
            n_bpe = np.zeros(len(b), dtype=np.int64)
        return pd.DataFrame(
            {
                self.id_col: b[self.id_col].to_numpy(),
                "n_words": n_words,
                "n_bpe_tokens": n_bpe,
            }
        )


def bpe_apply(
    docs: ray.data.Dataset,
    merges: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """→ (id, n_words, n_bpe_tokens) per doc; zero shuffle, merges
    broadcast once."""
    import ray as _ray

    from ..functions.resources import actor_pool

    merges_ref = _ray.put(list(zip(merges["left"], merges["right"])))
    return docs.map_batches(
        BpeEncodeStage,
        batch_format="pandas",
        concurrency=actor_pool(),
        fn_constructor_kwargs={
            "merges_ref": merges_ref,
            "text_col": text_col,
            "id_col": id_col,
        },
    )
