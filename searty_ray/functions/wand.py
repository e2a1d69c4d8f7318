"""Block-max WAND top-k (Ding & Suel, SIGIR 2011) over decoded term cursors.

The reference has no ranking; this implements the north rule's "BM25 top-k
with block-max WAND pruning" (SURVEY.md §2.6 O4).  Works on per-term numpy
arrays (doc_ids asc, tfs) plus the per-block metadata produced at encode
time (block_last_doc, idf-free score core); movement uses galloping
``searchsorted``.  Exact: tested equal to the exhaustive DAAT scorer.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from . import bm25


@dataclass
class TermCursor:
    doc_ids: np.ndarray  # ascending
    tfs: np.ndarray
    block_last_doc: np.ndarray
    block_core: np.ndarray  # idf-free tf_norm upper bound per block
    idf: float
    max_score: float = 0.0
    pos: int = 0
    tp: object | None = None  # backing TermPostings (per-term contrib cache)

    def __post_init__(self):
        self.max_score = float(self.idf * self.block_core.max()) if len(self.block_core) else 0.0

    @property
    def cur_doc(self) -> int:
        return int(self.doc_ids[self.pos]) if self.pos < len(self.doc_ids) else _INF

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (galloping)."""
        if self.pos < len(self.doc_ids) and self.doc_ids[self.pos] < target:
            self.pos += int(np.searchsorted(self.doc_ids[self.pos :], target, side="left"))

    def block_max(self, doc: int) -> float:
        """Upper bound of this term's score for the block containing doc."""
        b = int(np.searchsorted(self.block_last_doc, doc, side="left"))
        if b >= len(self.block_core):
            return 0.0
        return float(self.idf * self.block_core[b])


_INF = 1 << 62


def wand_topk(
    cursors: list[TermCursor],
    doc_len_fn,
    avgdl: float,
    n_docs: int,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_ids, scores) of the exact top-k by (-score, doc_id).

    ``doc_len_fn(doc_ids: np.ndarray) -> np.ndarray`` resolves BM25 doc
    lengths (norms lookup).
    """
    if k <= 0:  # match the exhaustive path (topk_dense returns empty)
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cursors = [c for c in cursors if len(c.doc_ids)]
    # heap of (-score, doc_id) equivalents: python heapq is a min-heap over
    # (score, -doc_id) so the weakest (lowest score, then highest doc) pops first
    heap: list[tuple[float, int]] = []
    threshold = -np.inf

    while True:
        live = [c for c in cursors if c.cur_doc < _INF]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc)
        # pivot: smallest prefix whose max_score sum exceeds the threshold
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.max_score
            # >= (not >): a doc whose bound equals the threshold can still
            # enter the heap via the (-score, doc_id) tie-break
            if acc >= threshold or len(heap) < k:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break
        pivot_doc = live[pivot_idx].cur_doc

        if live[0].cur_doc == pivot_doc:
            # block-max check before full evaluation
            bm = sum(c.block_max(pivot_doc) for c in live if c.cur_doc <= pivot_doc)
            if len(heap) >= k and bm < threshold:  # strict: ties must be evaluated
                # Skip past the current blocks — but cap the skip at the next
                # cursor's doc: docs beyond it gain that cursor's contribution
                # and the block bound `bm` no longer covers them (Ding–Suel
                # GetNewCandidate).
                ends = []
                for c in live:
                    if c.cur_doc > pivot_doc:
                        continue
                    b = int(np.searchsorted(c.block_last_doc, pivot_doc, side="left"))
                    if b < len(c.block_last_doc):
                        ends.append(int(c.block_last_doc[b]))
                boundary = min(ends, default=pivot_doc)
                nxt = min((c.cur_doc for c in live if c.cur_doc > pivot_doc), default=_INF)
                boundary = max(pivot_doc, min(boundary, nxt - 1))
                for c in live:
                    if c.cur_doc <= boundary:
                        c.seek(boundary + 1)
                continue
            dl = float(doc_len_fn(np.array([pivot_doc]))[0])
            score = 0.0
            for c in live:  # live is doc-sorted; restrict to cursors on pivot
                if c.cur_doc == pivot_doc:
                    tf = float(c.tfs[c.pos])
                    score += c.idf * float(bm25.tf_norm(np.array([tf]), np.array([dl]), avgdl)[0])
                    c.seek(pivot_doc + 1)
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= k:
                threshold = heap[0][0]
        else:
            # advance all cursors before the pivot up to it
            for c in live:
                if c.cur_doc >= pivot_doc:
                    break
                c.seek(pivot_doc)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return (
        np.array([-d for _, d in out], dtype=np.int64),
        np.array([s for s, _ in out], dtype=np.float64),
    )
