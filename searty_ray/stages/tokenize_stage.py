"""Tokenize + batch-level combine: corpus batches → posting *runs*.

This stage fuses searty's tokenizer (M1) with the per-document half of the
posting aggregation (A1) **and** a free combiner: within each Arrow batch it
groups the (term, doc, positions) triples by (term, chunk), emitting ONE run
row per distinct (term, chunk) per batch, so the groupby-shuffle moves
compact list-typed runs instead of one row per (term, doc).  For the
head-heavy trigram distribution of code this collapses a batch of B docs
from ~B·(runes-2) posting rows to ~|vocab| run rows.

Everything is numpy; the only Python loop is over the documents of the
batch (inner work is vectorized per doc, O(runes · log runes)).

A "chunk" is ``doc_id // chunk_span``: posting lists are doc-range-sharded
so a df≈N term is built and queried as independent chunks (SURVEY.md §7
skew handling; scale path for 10^12 docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import position_gaps, varint_encode, varint_sizes
from ..functions.tokenize import tokenize_doc, tokenize_doc_symbols


class TokenizeCombine:
    """Callable for ``map_batches(..., batch_format="pyarrow")``.

    Stateless in spirit, but declared as a class so the build pipeline can
    run it in an actor pool and amortize nothing-yet / future tokenizer
    state (e.g. alternative analyzers from the tokenizer registry).
    """

    def __init__(self, chunk_span: int, emit_symbols: bool = False):
        self.chunk_span = chunk_span
        self.emit_symbols = emit_symbols

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        contents = batch["content"]

        per_doc = []  # (doc_id, uniq_terms, tfs, positions)
        for i in range(len(batch)):
            text = contents[i].as_py()
            uniq, tfs, positions = tokenize_doc(text)
            if self.emit_symbols:
                sk, stf_, sp = tokenize_doc_symbols(text)
                if len(sk):  # symbol keys have the high bit set: disjoint range
                    uniq = np.concatenate([uniq, sk])
                    tfs = np.concatenate([tfs, stf_])
                    positions = np.concatenate([positions, sp])
            if len(uniq):
                per_doc.append((int(doc_ids[i]), uniq, tfs, positions))

        if not per_doc:
            return _empty_runs()

        # row-level arrays: one row per (doc, term)
        rk = np.concatenate([u for _, u, _, _ in per_doc])
        rtf = np.concatenate([t for _, _, t, _ in per_doc]).astype(np.int64)
        rdoc = np.concatenate(
            [np.full(len(u), d, dtype=np.int64) for d, u, _, _ in per_doc]
        )
        pos_all = np.concatenate([p for _, _, _, p in per_doc])
        # start offset of each row's position slice within pos_all
        row_start = np.concatenate(
            [np.cumsum(t, dtype=np.int64) - t for _, _, t, _ in per_doc]
        )
        doc_pos_base = np.cumsum([0] + [len(p) for _, _, _, p in per_doc[:-1]], dtype=np.int64)
        row_start = row_start + np.repeat(
            doc_pos_base, [len(u) for _, u, _, _ in per_doc]
        )

        rchunk = rdoc // self.chunk_span

        order = np.lexsort((rdoc, rchunk, rk))
        sk, sc, sd, stf, sstart = rk[order], rchunk[order], rdoc[order], rtf[order], row_start[order]

        # gather positions into run order (expand-ranges trick, no loop)
        total = int(stf.sum())
        ends = np.cumsum(stf)
        idx = np.arange(total, dtype=np.int64) - np.repeat(ends - stf, stf) + np.repeat(sstart, stf)
        out_pos = pos_all[idx]

        # delta+varbyte-compress positions HERE, before the shuffle: the
        # groupby then moves ~1.2 bytes/position instead of 4, and the
        # reducer never rebuilds numeric position arrays (it reorders byte
        # slices).  Compress-early is the scale-defining choice of this
        # pipeline (north rule: delta+varbyte posting lists).
        pg = position_gaps(out_pos, stf)
        sizes = varint_sizes(pg)
        data = varint_encode(pg)
        entry_bytes = np.add.reduceat(sizes, ends - stf).astype(np.int32) if total else np.empty(0, np.int32)

        # run boundaries: change of (term, chunk)
        n = len(sk)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (sk[1:] != sk[:-1]) | (sc[1:] != sc[:-1])
        run_starts = np.nonzero(new_run)[0]
        run_counts = np.diff(np.append(run_starts, n))

        # The entry metadata (doc ids / tfs / slice lengths) dominates shuffle
        # volume at ~16 B per (term, doc) pair if shipped numeric — compress
        # those streams too: doc GAPS (reset per run, first absolute) + tfs +
        # byte lengths, each one varint stream sliced per run.  The shuffle
        # then moves ~3-4 B per entry + ~1.2 B per position.
        dgap = np.empty(n, dtype=np.int64)
        dgap[1:] = sd[1:] - sd[:-1]
        dgap[run_starts] = sd[run_starts]

        def _stream(values: np.ndarray) -> pa.Array:
            sizes = varint_sizes(values)
            data_ = varint_encode(values)
            per_run = np.add.reduceat(sizes, run_starts)
            offs = np.concatenate(([0], np.cumsum(per_run))).astype(np.int64)
            return pa.Array.from_buffers(
                pa.large_binary(),
                len(run_starts),
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data_.tobytes())],
            )

        run_byte_counts = np.add.reduceat(entry_bytes.astype(np.int64), run_starts)
        byte_offsets = np.concatenate(([0], np.cumsum(run_byte_counts))).astype(np.int64)
        pos_blob = pa.Array.from_buffers(
            pa.large_binary(),
            len(run_starts),
            [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(data.tobytes())],
        )
        return pa.table(
            {
                "term_key": pa.array(sk[run_starts], type=pa.uint64()),
                "chunk": pa.array(sc[run_starts], type=pa.int64()),
                "n_docs": pa.array(run_counts.astype(np.int32), type=pa.int32()),
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
            "n_docs": pa.array([], type=pa.int32()),
            "doc_blob": pa.array([], type=pa.large_binary()),
            "tf_blob": pa.array([], type=pa.large_binary()),
            "len_blob": pa.array([], type=pa.large_binary()),
            "pos_blob": pa.array([], type=pa.large_binary()),
        }
    )
