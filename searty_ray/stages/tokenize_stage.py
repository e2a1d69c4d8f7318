"""Tokenize + batch-level combine: corpus batches → posting *runs*.

This stage fuses searty's tokenizer (M1) with the per-document half of the
posting aggregation (A1) **and** a free combiner: it groups the
(term, doc, position) occurrences of the WHOLE batch by (term, chunk),
emitting ONE run row per distinct (term, chunk) per batch, so the
groupby-shuffle moves compact compressed runs instead of one row per
(term, doc).  For the head-heavy trigram distribution of code this
collapses a batch of B docs from ~B·(runes-2) posting rows to ~|vocab|
run rows.

Batch-GLOBAL vectorization: all documents' codepoints are decoded in one
pass over the joined text, every trigram window key is computed in one
shifted-add, and a single stable lexsort by (term, doc) yields the final
occurrence order (chunk is monotone in doc, and stability keeps per-doc
positions ascending — the invariant the reference asserts in
postinglist.go:96-106).  The only Python loop is the symbol-regex scan per
document (optional, ``trigram+symbols``).

A "chunk" is ``doc_id // chunk_span``: posting lists are doc-range-sharded
so a df≈N term is built and queried as independent chunks (SURVEY.md §7
skew handling; scale path for 10^12 docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import position_gaps, varint_encode, varint_sizes
from ..functions.tokenize import _SHIFT1, _SHIFT2, SYMBOL_RE, codepoints, symbol_key


def _expand_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens) + np.repeat(starts, lens)


class TokenizeCombine:
    """Callable for ``map_batches(..., batch_format="pyarrow")``.

    Holds the per-process symbol-key cache (symbols repeat heavily across
    documents; md5 runs once per distinct identifier)."""

    def __init__(self, chunk_span: int, emit_symbols: bool = False):
        self.chunk_span = chunk_span
        self.emit_symbols = emit_symbols
        self._sym_cache: dict[str, int] = {}

    def _symbol_occurrences(
        self, texts: list[str], doc_ids: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        keys: list[int] = []
        docs: list[int] = []
        pos: list[int] = []
        cache = self._sym_cache
        for d, text in zip(doc_ids, texts):
            for mt in SYMBOL_RE.finditer(text):
                s = mt.group(0)
                k = cache.get(s)
                if k is None:
                    if len(cache) > 1 << 20:
                        cache.clear()
                    k = cache[s] = symbol_key(s)
                keys.append(k)
                docs.append(int(d))
                pos.append(mt.start())
        return (
            np.array(keys, dtype=np.uint64),
            np.array(docs, dtype=np.int64),
            np.array(pos, dtype=np.int32),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts: list[str] = batch["content"].to_pylist()
        if len(doc_ids) > 1 and np.any(np.diff(doc_ids) < 0):
            # the grouping sort below relies on pre-sort occurrence order
            # being (doc asc, position asc) — reorder rows by doc id first
            # (hash-id corpora arrive in file order, not id order)
            o = np.argsort(doc_ids, kind="stable")
            doc_ids = doc_ids[o]
            texts = [texts[i] for i in o]

        # ---- trigram occurrences, batch-global ----
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        cps = codepoints("".join(texts))
        if len(cps) >= 3:
            c = cps.astype(np.uint64)
            gkeys = (c[:-2] << _SHIFT1) | (c[1:-1] << _SHIFT2) | c[2:]
        else:
            gkeys = np.empty(0, dtype=np.uint64)
        off = np.cumsum(lens) - lens
        nw = np.clip(lens - 2, 0, None)
        widx = _expand_ranges(off, nw)  # global index of each window start
        wkeys = gkeys[widx] if len(widx) else np.empty(0, dtype=np.uint64)
        wdoc = np.repeat(doc_ids, nw)
        wpos = (widx - np.repeat(off, nw)).astype(np.int32)

        if self.emit_symbols:
            sk, sd_, sp = self._symbol_occurrences(texts, doc_ids)
            if len(sk):
                wkeys = np.concatenate([wkeys, sk])
                wdoc = np.concatenate([wdoc, sd_])
                wpos = np.concatenate([wpos, sp])

        n_occ = len(wkeys)
        if n_occ == 0:
            return _empty_runs()

        # Group by term WITHOUT a comparison sort on sparse uint64 keys
        # (np.lexsort was 44% of stage CPU): hash-factorize the keys to
        # dense codes (per-batch vocab is small — hundreds to thousands),
        # then VALUE-sort the composite ``code·n + occurrence_index`` —
        # unique keys make quicksort order-deterministic, and the recovered
        # permutation is exactly the stable grouping whose within-term
        # order is the original (doc asc, position asc) occurrence order.
        # Trigram (bit63=0) and symbol (bit63=1) key spaces are disjoint,
        # so concatenating the two streams can't interleave one term.
        if n_occ < (1 << 31):
            import pandas as pd

            codes = pd.factorize(wkeys)[0]
            comp = codes.astype(np.uint64) * np.uint64(n_occ) + np.arange(
                n_occ, dtype=np.uint64
            )
            order = (np.sort(comp) % np.uint64(n_occ)).astype(np.int64)
            # within-term original order is doc-ascending only because the
            # batch was; term order across runs is first-appearance (the
            # partition encode re-sorts, so run emission order is free)
        else:  # pathological single-batch size: fall back to the O(n log n) lexsort
            order = np.lexsort((wdoc, wkeys))
        k_occ, d_occ, out_pos = wkeys[order], wdoc[order], wpos[order]

        # row boundaries: change of (term, doc) → one row per (doc, term)
        new_row = np.empty(n_occ, dtype=bool)
        new_row[0] = True
        new_row[1:] = (k_occ[1:] != k_occ[:-1]) | (d_occ[1:] != d_occ[:-1])
        row_starts = np.nonzero(new_row)[0]
        sk_r = k_occ[row_starts]
        sd_r = d_occ[row_starts]
        stf = np.diff(np.append(row_starts, n_occ)).astype(np.int64)
        sc_r = sd_r // self.chunk_span

        # delta+varbyte-compress positions HERE, before the shuffle: the
        # groupby then moves ~1.2 bytes/position instead of 4, and the
        # reducer never rebuilds numeric position arrays (it reorders byte
        # slices).  Compress-early is the scale-defining choice of this
        # pipeline (north rule: delta+varbyte posting lists).
        pg = position_gaps(out_pos, stf)
        sizes = varint_sizes(pg)
        data = varint_encode(pg, sizes=sizes)
        entry_bytes = np.add.reduceat(sizes, row_starts).astype(np.int64)

        # run boundaries: change of (term, chunk) over the rows
        n = len(sk_r)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (sk_r[1:] != sk_r[:-1]) | (sc_r[1:] != sc_r[:-1])
        run_starts = np.nonzero(new_run)[0]
        run_counts = np.diff(np.append(run_starts, n))

        # The entry metadata (doc ids / tfs / slice lengths) dominates shuffle
        # volume at ~16 B per (term, doc) pair if shipped numeric — compress
        # those streams too: doc GAPS (reset per run, first absolute) + tfs +
        # byte lengths, each one varint stream sliced per run.  The shuffle
        # then moves ~3-4 B per entry + ~1.2 B per position.
        dgap = np.empty(n, dtype=np.int64)
        dgap[1:] = sd_r[1:] - sd_r[:-1]
        dgap[run_starts] = sd_r[run_starts]

        from .encode_stage import _binary_from

        def _stream(values: np.ndarray) -> pa.Array:
            sizes_ = varint_sizes(values)
            data_ = varint_encode(values, sizes=sizes_)
            per_run = np.add.reduceat(sizes_, run_starts)
            offs = np.concatenate(([0], np.cumsum(per_run))).astype(np.int64)
            return _binary_from(offs, data_)

        run_byte_counts = np.add.reduceat(entry_bytes, run_starts)
        byte_offsets = np.concatenate(([0], np.cumsum(run_byte_counts))).astype(np.int64)
        pos_blob = _binary_from(byte_offsets, data)
        return pa.table(
            {
                "term_key": pa.array(sk_r[run_starts], type=pa.uint64()),
                "chunk": pa.array(sc_r[run_starts], type=pa.int64()),
                "n_docs": pa.array(run_counts.astype(np.int64), type=pa.int64()),  # int32 would wrap past 2^31 postings per (term, chunk) run at 10^12-doc spans
                "doc_blob": _stream(dgap.astype(np.uint64)),
                "tf_blob": _stream(stf.astype(np.uint64)),
                "len_blob": _stream(entry_bytes.astype(np.uint64)),
                "pos_blob": pos_blob,
            }
        )


def _empty_runs() -> pa.Table:
    return pa.table(
        {
            "term_key": pa.array([], type=pa.uint64()),
            "chunk": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "doc_blob": pa.array([], type=pa.large_binary()),
            "tf_blob": pa.array([], type=pa.large_binary()),
            "len_blob": pa.array([], type=pa.large_binary()),
            "pos_blob": pa.array([], type=pa.large_binary()),
        }
    )
