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

    # combiner partials: ≤ one row per bucket per BATCH reaches the driver
    def bucket_partials(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("__bkt", sort=False, as_index=False)["n_tokens"].sum()

    partials = counts.map_batches(bucket_partials, batch_format="pandas").to_pandas()
    sums = (
        partials.groupby("__bkt", sort=True)["n_tokens"].sum().astype("int64")
    )
    seeds = (sums.cumsum() - sums).to_dict()  # exclusive prefix per bucket
    seeds_ref = _ray.put(seeds)
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
