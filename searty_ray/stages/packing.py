"""Training-sequence packing: concatenate-and-chunk documents into
fixed-token-budget sequences (the standard LLM pretraining layout — docs are
concatenated in a deterministic global order and the token stream is cut
into ``budget``-sized sequences; a doc may span a boundary).

The core is a DISTRIBUTED EXCLUSIVE PREFIX SUM over per-doc token counts in
global ``doc_id`` order — the classic two-level scan:

1. one narrow ``map_batches`` pass counts tokens per doc and emits per-batch
   PARTIAL sums per doc-id bucket (``doc_id // bucket_span``) — combiner-
   first, so the driver never sees per-doc rows;
2. the driver prefix-sums the small bucket table (≤ N/bucket_span rows —
   at 10^12 docs pick bucket_span=10^6 and the table is 10^6 rows; for
   deeper scale the same scan recurses) and broadcasts the per-bucket seed
   offsets via ``ray.put``;
3. a ``groupby(bucket).map_groups`` pass sorts each bucket by ``doc_id``,
   cumsums locally (int64 — exact, no float regrouping concerns), adds the
   bucket seed, and derives the sequence ids arithmetically.

Partitioning assumption: one bucket (≤ ``bucket_span`` docs' COUNT rows,
~16 B each) fits a worker — the narrow-table analogue of the windows
stages' (key, range) contract.  Content never moves: only
(doc_id, n_tokens) rows shuffle.

Token definition = ASCII-whitespace words (functions/words.WORD_RE), the
same primitive the token_counts / quality ops use, so the DuckDB oracle
(pipelines/gate.py SQL_PACK_SEQUENCES) mirrors it with the shared
``string_split_regex`` idiom and a window cumsum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.words import WORD_RE


def _bucket_seed_offsets(docs, key: str, text: str, span: np.int64):
    """Shared level-1 scan: per-bucket EXCLUSIVE token-prefix offsets.

    One narrow pass emits per-batch bucket partials (combiner — ≤ one row
    per bucket per batch reaches the driver); the driver prefix-sums the
    small bucket table and broadcasts it.  Returns the ``ray.put`` ref of
    the {bucket: offset} dict ({} for an empty corpus — Ray drops the
    schema of fully-empty datasets, the documented gotcha)."""
    import ray as _ray

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "n_tokens": batch[text].str.count(WORD_RE).astype("int64"),
                "__bkt": ids // span,
            }
        )

    def bucket_partials(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("__bkt", sort=False, as_index=False)["n_tokens"].sum()

    partials = (
        docs.map_batches(count, batch_format="pandas")
        .map_batches(bucket_partials, batch_format="pandas")
        .to_pandas()
    )
    if "__bkt" not in partials.columns:  # empty corpus → schema-less frame
        return _ray.put({})
    sums = partials.groupby("__bkt", sort=True)["n_tokens"].sum().astype("int64")
    return _ray.put((sums.cumsum() - sums).to_dict())


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int = 2048,
    *,
    key: str = "doc_id",
    text: str = "text",
    bucket_span: int = 4096,
) -> ray.data.Dataset:
    """→ one row per doc: (doc_id, n_tokens, tok_offset, seq_first, seq_last,
    seq_pos) where ``tok_offset`` counts tokens strictly before the doc in
    global ``key`` order, ``seq_first``/``seq_last`` are the first/last
    sequence index the doc's tokens land in (empty docs: both = the
    sequence their offset points at), and ``seq_pos`` = offset within
    ``seq_first``.
    """
    import ray as _ray

    span = np.int64(bucket_span)

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                key: ids,
                "n_tokens": batch[text].str.count(WORD_RE).astype("int64"),
                "__bkt": ids // span,
            }
        )

    counts = docs.map_batches(count, batch_format="pandas")
    seeds_ref = _bucket_seed_offsets(docs, key, text, span)
    _cache: dict = {}

    b = np.int64(budget)

    def within_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if "seeds" not in _cache:
            _cache["seeds"] = _ray.get(seeds_ref)
        g = g.sort_values(key, kind="mergesort")
        n = g["n_tokens"].to_numpy()
        seed = np.int64(_cache["seeds"][int(g["__bkt"].iloc[0])])
        off = np.cumsum(n) - n + seed
        last_tok = off + np.maximum(n, 1) - 1  # empty doc pins to its offset
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "n_tokens": n,
                "tok_offset": off,
                "seq_first": off // b,
                "seq_last": last_tok // b,
                "seq_pos": off % b,
            }
        )

    return counts.groupby("__bkt").map_groups(within_bucket, batch_format="pandas")


def assemble_sequences(
    docs: ray.data.Dataset,
    budget: int = 2048,
    *,
    key: str = "doc_id",
    text: str = "text",
    bucket_span: int = 4096,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Materialize the PACKED training sequences themselves: the corpus's
    whitespace tokens, concatenated in global ``key`` order and cut into
    ``budget``-token sequences (the final sequence may be short) →
    (seq_id, n_tokens, text) with fragments re-joined by single spaces.

    Pipeline: the same two-level prefix scan as :func:`pack_sequences`
    computes per-bucket offsets; a per-bucket pass slices each doc's words
    across its sequence boundaries and emits FRAGMENT rows (seq_id,
    tok_offset, n_tokens, frag); one hash exchange on seq_id co-locates a
    sequence's fragments; assembly is an ordered per-sequence join.
    Content moves exactly once (as fragments).  Per-fragment string joins
    are inherent string assembly (the line_dedup reassembly precedent);
    everything positional is numpy.
    """
    import ray as _ray

    span = np.int64(bucket_span)
    B = np.int64(budget)
    P = np.int64(num_partitions)

    seeds_ref = _bucket_seed_offsets(docs, key, text, span)
    _cache: dict = {}

    def tag_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, text]].copy()
        out["__bkt"] = out[key].to_numpy().astype(np.int64) // span
        return out

    def fragments(g: pd.DataFrame) -> pd.DataFrame:
        if "seeds" not in _cache:
            _cache["seeds"] = _ray.get(seeds_ref)
        g = g.sort_values(key, kind="mergesort")
        words = g[text].str.findall(WORD_RE)
        n = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        seed = np.int64(_cache["seeds"][int(g["__bkt"].iloc[0])])
        off = np.cumsum(n) - n + seed
        f = off // B
        l = (off + np.maximum(n, 1) - 1) // B
        spans = np.where(n > 0, l - f + 1, 0)
        total = int(spans.sum())
        if total == 0:
            return pd.DataFrame(
                {"seq_id": np.empty(0, np.int64), "tok_offset": np.empty(0, np.int64),
                 "n_tokens": np.empty(0, np.int64), "frag": np.empty(0, object),
                 "__sp": np.empty(0, np.int64)}
            )
        docrep = np.repeat(np.arange(len(g)), spans)
        k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(spans) - spans, spans)
        s = f[docrep] + k
        a = np.maximum(s * B, off[docrep])
        bnd = np.minimum((s + 1) * B, off[docrep] + n[docrep])
        wl = words.to_numpy()
        od = off[docrep]
        frag = [
            " ".join(wl[d][int(aa - o): int(bb - o)])
            for d, aa, bb, o in zip(docrep, a, bnd, od)
        ]
        return pd.DataFrame(
            {"seq_id": s, "tok_offset": a, "n_tokens": bnd - a, "frag": frag,
             "__sp": s % P}
        )

    frags = (
        docs.map_batches(tag_bucket, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(fragments, batch_format="pandas")
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["seq_id", "tok_offset"], kind="mergesort")
        gb = s.groupby("seq_id", sort=False)
        out = gb.agg(n_tokens=("n_tokens", "sum"), text=("frag", " ".join)).reset_index()
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out

    return frags.groupby("__sp").map_groups(assemble, batch_format="pandas")


def chunk_offsets(
    docs: "ray.data.Dataset",
    *,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Overlapping-window chunk boundaries per document — the RAG /
    training-window splitter: chunk k covers codepoints
    [k·stride, k·stride + min(window, n − k·stride)) for k < ceil(n/stride)
    (zero chunks for empty docs).  Offsets are CODEPOINT units (the line
    extractor's rune convention), so extraction composes with the existing
    slice machinery; DuckDB's length()/substr() mirror them exactly.

    SCALE: stateless per-batch integer kernel (utf8_length + one repeat /
    cumsum-slice pass), zero shuffle, no text movement — the output is
    ~32 B per chunk regardless of document size."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        k = -(-n // stride)  # ceil; 0 for empty docs
        row = np.repeat(np.arange(len(n)), k)
        # chunk_id = position within each row's run (cumsum-of-run trick)
        ends = np.cumsum(k)
        starts_run = ends - k
        cid = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            starts_run, k
        )
        start = cid * stride
        length = np.minimum(window, n[row] - start)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[row]
        return pa.table(
            {
                id_col: pa.array(ids),
                "chunk_id": pa.array(cid),
                "start": pa.array(start),
                "length": pa.array(length),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow")
