"""Partition encoder: posting runs → encoded segment rows.

One call handles an entire hash partition of (term, chunk) segments.
Positions arrive ALREADY delta+varbyte-compressed from the tokenize stage
(pos_blob byte slices per (term, doc) entry), so this reducer:

* reorders the E entry-level (term, chunk, doc) triples with one lexsort,
* gathers the compressed position bytes into final order (uint8 gather —
  ~1.2 B/position instead of rebuilding numeric arrays),
* varint-encodes the per-term metadata stream ``[df, doc_gaps…, tfs…]`` in
  a single vectorized pass for the whole partition,
* emits per-term blobs as zero-copy slices of the two streams (byte ranges
  are contiguous in term order, so the Arrow large_binary columns are built
  straight from the offsets).

Replaces searty's single-threaded merge + encode
(/root/reference/lib/indexer/merge.go:240-268, encoder.go:35-65) with a
shuffle-parallel reducer.  Temporaries are kept E-sized (entries, not
positions) because first-touch page faults dominate large-array work on
sandboxed hosts (see searty_ray.__init__._tune_allocator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import bm25
from ..functions.codec import segmented_undelta, varint_decode, varint_encode, varint_sizes
from ..functions.tokenize import unpack_terms
from ..schema import BLOCK_SIZE, SEGMENT_SCHEMA


def _decode_and_sort_runs(runs: pa.Table):
    """Decode a table of compressed runs into (term, chunk, doc)-sorted
    entry arrays + the gathered compressed position stream.

    → (st, sc, sd, stf, sbytes, pos_stream): terms, chunks, docs, tfs,
    per-entry position byte counts (entry order), position bytes (entry
    order, back-to-back)."""
    runs = runs.combine_chunks()
    run_term = runs["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    run_chunk = runs["chunk"].to_numpy(zero_copy_only=False)
    run_len = runs["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    blob_col = runs.column("pos_blob").chunk(0)

    # decode the three compressed entry streams in one varint pass each —
    # run blobs are stored back-to-back, so the concatenated buffer IS the
    # partition-wide stream
    dgap = varint_decode(_binary_values(runs.column("doc_blob").chunk(0)))
    D_raw = segmented_undelta(dgap, run_len)
    T_raw = varint_decode(_binary_values(runs.column("tf_blob").chunk(0))).astype(np.int64)
    PB_raw = varint_decode(_binary_values(runs.column("len_blob").chunk(0))).astype(np.int64)

    # compressed position bytes of the whole partition (uint8) + per-run offsets
    blob_buf = np.frombuffer(_binary_values(blob_col), dtype=np.uint8)
    run_blob_off = _binary_offsets(blob_col)

    # entry-level (one entry = one (term, chunk, doc)) arrays, in run order
    e_term = np.repeat(run_term, run_len)
    e_chunk = np.repeat(run_chunk, run_len)
    e_doc = D_raw
    e_tf = T_raw
    # byte-start of each entry's compressed positions (within-run cumsum + run base)
    within = np.cumsum(PB_raw) - PB_raw
    run_first_entry = np.cumsum(run_len) - run_len
    run_base = run_blob_off[:-1] - within[np.minimum(run_first_entry, max(len(within) - 1, 0))]
    e_byte_start = within + np.repeat(run_base, run_len)

    order = np.lexsort((e_doc, e_chunk, e_term))
    st, sc, sd, stf = e_term[order], e_chunk[order], e_doc[order], e_tf[order]
    sbytes = PB_raw[order]
    sstart = e_byte_start[order]

    # gather compressed position bytes into final order (expand-ranges)
    total_bytes = int(sbytes.sum())
    bends = np.cumsum(sbytes)
    gidx = (
        np.arange(total_bytes, dtype=np.int64)
        - np.repeat(bends - sbytes, sbytes)
        + np.repeat(sstart, sbytes)
    )
    return st, sc, sd, stf, sbytes, blob_buf[gidx]


def entries_to_runs(
    st: np.ndarray,
    sc: np.ndarray,
    sd: np.ndarray,
    stf: np.ndarray,
    sbytes: np.ndarray,
    pos_stream: np.ndarray,
) -> pa.Table:
    """(term, chunk, doc)-sorted entry arrays + their compressed position
    stream → run-schema rows, one per (term, chunk)."""
    E = len(sd)
    new_run = np.empty(E, dtype=bool)
    new_run[0] = True
    new_run[1:] = (st[1:] != st[:-1]) | (sc[1:] != sc[:-1])
    run_starts = np.nonzero(new_run)[0]
    run_counts = np.diff(np.append(run_starts, E))

    dgap = np.empty(E, dtype=np.int64)
    dgap[1:] = sd[1:] - sd[:-1]
    dgap[run_starts] = sd[run_starts]  # first value absolute (run contract)

    def _stream(values: np.ndarray) -> pa.Array:
        sizes = varint_sizes(values)
        data_ = varint_encode(values)
        per_run = np.add.reduceat(sizes, run_starts)
        offs = np.concatenate(([0], np.cumsum(per_run))).astype(np.int64)
        return _binary_from(offs, data_)

    run_byte_counts = np.add.reduceat(sbytes, run_starts)
    byte_offsets = np.concatenate(([0], np.cumsum(run_byte_counts))).astype(np.int64)
    return pa.table(
        {
            "term_key": pa.array(st[run_starts], type=pa.uint64()),
            "chunk": pa.array(sc[run_starts], type=pa.int64()),
            "n_docs": pa.array(run_counts.astype(np.int64), type=pa.int64()),  # int32 would wrap past 2^31 postings per (term, chunk) run at 10^12-doc spans
            "doc_blob": _stream(dgap.astype(np.uint64)),
            "tf_blob": _stream(stf.astype(np.uint64)),
            "len_blob": _stream(sbytes.astype(np.uint64)),
            "pos_blob": _binary_from(byte_offsets, pos_stream),
        }
    )


def combine_runs(runs: pa.Table) -> pa.Table:
    """Phase-1 combiner of the salted two-phase merge (SURVEY.md §2.5 A2):
    merge MANY small runs into ONE combined run per (term, chunk).

    Output rows use the run schema, so phase 2 is the unchanged
    ``encode_partition`` — its lexsort degenerates to a k-way merge of the
    ≤ salt combined runs per (term, chunk), and the final bytes are
    IDENTICAL to the unsalted build (the encode is a pure function of the
    entry multiset; pinned by pytest)."""
    if len(runs) == 0:
        return runs
    st, sc, sd, stf, sbytes, pos_stream = _decode_and_sort_runs(runs)
    return entries_to_runs(st, sc, sd, stf, sbytes, pos_stream)


def segment_rows_to_entries(t: pa.Table, old_span: int):
    """Encoded segment rows → entry-level arrays, in stored (row-major) order.

    → (term, docs_old, tfs, pos_lens, byte_starts, pos_buf): one entry per
    (term, chunk, doc) posting; ``byte_starts``/``pos_lens`` address each
    entry's compressed position slice inside ``pos_buf``.  The inverse of
    :func:`encode_partition`'s packing, decoded with the same bulk varint
    passes the query reader uses."""
    t = t.combine_chunks()
    df_col = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = t["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
    tk = t["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64)

    from ..functions.codec import meta_blob_entries

    gaps, tfs, _rank = meta_blob_entries(_binary_values(t.column("meta_blob").chunk(0)), df_col)
    E = int(df_col.sum())
    docs_old = segmented_undelta(gaps, df_col) + np.repeat(chunk * old_span, df_col)

    pos_lens = varint_decode(_binary_values(t.column("pos_len_blob").chunk(0))).astype(np.int64)
    pos_col = t.column("pos_blob").chunk(0)
    pos_buf = np.frombuffer(_binary_values(pos_col), dtype=np.uint8)
    row_blob_off = _binary_offsets(pos_col)
    within = np.cumsum(pos_lens) - pos_lens
    row_first_entry = np.cumsum(df_col) - df_col
    base = row_blob_off[:-1] - within[np.minimum(row_first_entry, max(E - 1, 0))]
    byte_starts = within + np.repeat(base, df_col)

    term = np.repeat(tk, df_col)
    return term, docs_old, tfs, pos_lens, byte_starts, pos_buf


def shard_remap(
    remap: tuple[np.ndarray, np.ndarray, np.ndarray], old_span: int
) -> dict[int, object]:
    """Split one index's (old_ids, new_ids, kept) remap into per-old-chunk
    shards, each placed in the object store once.  Stages ship only the dict
    of refs (O(#chunks)) and resolve the shards their batches touch — never
    the whole O(docs) remap (the 10^12-doc merge path)."""
    import ray

    old_ids, new_ids, kept_mask = remap
    if len(old_ids) == 0:
        return {}
    chunks = old_ids // old_span
    bounds = np.flatnonzero(np.concatenate(([True], chunks[1:] != chunks[:-1])))
    bounds = np.concatenate((bounds, [len(old_ids)]))
    out: dict[int, object] = {}
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        out[int(chunks[lo])] = ray.put(
            (old_ids[lo:hi], new_ids[lo:hi], kept_mask[lo:hi])
        )
    return out


_REMAP_CACHE_SHARDS = 64  # bounded per-actor residency: shards × chunk_span


def resolve_shards(
    shards: dict[int, object], needed_chunks: np.ndarray, cache: dict | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenated (old_ids, new_ids, kept) covering ``needed_chunks`` only
    (np.unique gives ascending chunks → ascending old ids, so the callers'
    searchsorted lookups are unaffected)."""
    import ray

    parts = []
    for c in np.asarray(needed_chunks).tolist():
        c = int(c)
        ref = shards.get(c)
        if ref is None:
            continue
        if cache is not None and c in cache:
            parts.append(cache[c])
            continue
        val = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if cache is not None:
            cache[c] = val
            while len(cache) > _REMAP_CACHE_SHARDS:
                cache.pop(next(iter(cache)))
        parts.append(val)
    if not parts:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), np.empty(0, dtype=bool)
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))


class SegmentsToRuns:
    """Merge-time stage: one index's segment rows → run-schema rows with doc
    ids remapped into the merged id space (dropped duplicates filtered).

    This is what lets :func:`pipelines.merge.merge_indexes` reuse the build
    shuffle WITHOUT re-tokenizing: positions stay compressed byte slices end
    to end — only doc ids, chunks and gaps are recomputed.  The remap
    arrives as per-old-chunk shards; each actor resolves only the shards its
    batches cover (bounded cache), not the whole index's remap."""

    def __init__(self, remap_shards: dict[int, object], old_span: int, new_span: int):
        self.shards = remap_shards
        self.cache: dict[int, tuple] = {}
        self.old_span = old_span
        self.new_span = new_span

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.tokenize_stage import _empty_runs

        if len(batch) == 0 or not self.shards:
            return _empty_runs()
        needed = np.unique(batch["chunk"].to_numpy(zero_copy_only=False))
        old_ids, new_ids, kept = resolve_shards(self.shards, needed, self.cache)
        if len(old_ids) == 0:
            return _empty_runs()
        term, docs_old, tfs, pos_lens, byte_starts, pos_buf = segment_rows_to_entries(
            batch, self.old_span
        )
        idx = np.minimum(np.searchsorted(old_ids, docs_old), len(old_ids) - 1)
        keep = (old_ids[idx] == docs_old) & kept[idx]
        term, tfs = term[keep], tfs[keep]
        pos_lens, byte_starts = pos_lens[keep], byte_starts[keep]
        if len(term) == 0:
            return _empty_runs()
        new_docs = new_ids[idx[keep]]
        new_chunk = new_docs // self.new_span
        order = np.lexsort((new_docs, new_chunk, term))
        st, sc, sd = term[order], new_chunk[order], new_docs[order]
        stf, sbytes, sstart = tfs[order], pos_lens[order], byte_starts[order]
        total = int(sbytes.sum())
        ends = np.cumsum(sbytes)
        gidx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(ends - sbytes, sbytes)
            + np.repeat(sstart, sbytes)
        )
        return entries_to_runs(st, sc, sd, stf, sbytes, pos_buf[gidx])


def encode_partition(runs: pa.Table, avgdl: float, chunk_span: int, part: int) -> pa.Table:
    """Encode all runs of one partition → SEGMENT_SCHEMA table."""
    if len(runs) == 0:
        return SEGMENT_SCHEMA.empty_table()

    st, sc, sd, stf, sbytes, pos_stream = _decode_and_sort_runs(runs)
    E = len(sd)

    # group boundaries: (term, chunk)
    new_g = np.empty(E, dtype=bool)
    new_g[0] = True
    new_g[1:] = (st[1:] != st[:-1]) | (sc[1:] != sc[:-1])
    g_start = np.nonzero(new_g)[0]
    G = len(g_start)
    df = np.diff(np.append(g_start, E))
    cf = np.add.reduceat(stf, g_start)
    g_term = st[g_start]
    g_chunk = sc[g_start]
    first_doc = sd[g_start]

    # ---- metadata stream [df, doc_gaps…, tfs…] per term, one varint pass ----
    L = 1 + 2 * df
    S = np.cumsum(L) - L
    V = np.empty(int(L.sum()), dtype=np.uint64)
    V[S] = df
    rank = np.arange(E, dtype=np.int64) - np.repeat(g_start, df)
    dg = np.empty(E, dtype=np.int64)
    dg[1:] = sd[1:] - sd[:-1]
    dg[g_start] = sd[g_start] - g_chunk * chunk_span
    V[np.repeat(S + 1, df) + rank] = dg.astype(np.uint64)
    V[np.repeat(S + 1 + df, df) + rank] = stf.astype(np.uint64)
    sizes = varint_sizes(V)
    B = np.concatenate(([0], np.cumsum(sizes)))
    meta_stream = varint_encode(V)
    meta_offsets = np.append(B[S], len(meta_stream)).astype(np.int64)
    meta_blob = _binary_from(meta_offsets, meta_stream)

    # per-term byte ranges of the position stream (contiguous in term order)
    pos_group_bytes = np.add.reduceat(sbytes, g_start)
    pos_offsets = np.concatenate(([0], np.cumsum(pos_group_bytes))).astype(np.int64)
    pos_blob = _binary_from(pos_offsets, pos_stream)

    # per-doc position byte lengths (varint stream per term): lets the query
    # side decode positions for a SUBSET of docs (phrase candidates) without
    # scanning the whole position stream
    pl_sizes = varint_sizes(sbytes.astype(np.uint64))
    pl_stream = varint_encode(sbytes.astype(np.uint64))
    pl_offsets = np.concatenate(
        ([0], np.cumsum(np.add.reduceat(pl_sizes, g_start)))
    ).astype(np.int64)
    pos_len_blob = _binary_from(pl_offsets, pl_stream)

    # ---- block-max metadata (BLOCK_SIZE docs per block) ----
    is_block_start = rank % BLOCK_SIZE == 0
    b_start = np.nonzero(is_block_start)[0]
    b_end = np.append(b_start[1:], E) - 1
    blk_last_doc = sd[b_end]
    blk_max_tf = np.maximum.reduceat(stf, b_start)
    # idf-free score core: upper bound = idf(global df) * core at query time.
    # nextafter keeps the float32 cast an UPPER bound of the float64 core
    # (a round-down would break WAND's exactness guarantee).
    blk_core = np.nextafter(
        bm25.tf_norm(blk_max_tf, np.maximum(blk_max_tf, 1), avgdl).astype(np.float32),
        np.float32(np.inf),
    )
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_off = np.concatenate(([0], np.cumsum(nblocks))).astype(np.int64)

    return pa.table(
        {
            "part": pa.array(np.full(G, part, dtype=np.int32)),
            "term_key": pa.array(g_term, type=pa.uint64()),
            "term": pa.array(unpack_terms(g_term), type=pa.string()),
            "kind": pa.array((g_term >> np.uint64(63)).astype(np.int8), type=pa.int8()),
            "chunk": pa.array(g_chunk, type=pa.int64()),
            "df": pa.array(df, type=pa.int64()),
            "cf": pa.array(cf, type=pa.int64()),
            "first_doc": pa.array(first_doc, type=pa.int64()),
            "meta_blob": meta_blob,
            "pos_len_blob": pos_len_blob,
            "pos_blob": pos_blob,
            "block_last_doc": pa.LargeListArray.from_arrays(blk_off, pa.array(blk_last_doc, type=pa.int64())),
            "block_max_tf": pa.LargeListArray.from_arrays(blk_off, pa.array(blk_max_tf.astype(np.int32), type=pa.int32())),
            "block_max_score": pa.LargeListArray.from_arrays(blk_off, pa.array(blk_core, type=pa.float32())),
        },
        schema=_segment_schema_large(),
    )


def _raw_binary_offsets(arr: pa.Array) -> np.ndarray:
    """Slice-aware int64 offsets of a binary/string array (no .offsets attr
    in pyarrow).  Handles both offset widths: large_* types carry int64
    offsets, plain binary/string int32 (e.g. content read back from parquet
    written by another writer)."""
    if len(arr) == 0:
        return np.zeros(1, dtype=np.int64)
    wide = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64 if wide else np.int32)
    off = off[arr.offset : arr.offset + len(arr) + 1]
    return off if wide else off.astype(np.int64)


def _binary_values(arr: pa.Array) -> memoryview:
    off = _raw_binary_offsets(arr)
    return memoryview(arr.buffers()[2])[int(off[0]) : int(off[-1])] if len(arr) else memoryview(b"")


def _binary_offsets(arr: pa.Array) -> np.ndarray:
    off = _raw_binary_offsets(arr)
    return off - off[0]


def _binary_from(offsets: np.ndarray, data: np.ndarray) -> pa.Array:
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _segment_schema_large() -> pa.Schema:
    """SEGMENT_SCHEMA with large_list for the block columns (builder output)."""
    fields = []
    for f in SEGMENT_SCHEMA:
        if pa.types.is_list(f.type):
            fields.append(pa.field(f.name, pa.large_list(f.type.value_type)))
        else:
            fields.append(f)
    return pa.schema(fields)
