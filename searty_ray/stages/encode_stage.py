"""Partition encoder: posting runs → encoded segment rows.

One call handles an entire hash partition of (term, chunk) segments and is
fully vectorized: the value sequences of EVERY posting list in the partition
are laid out into one uint64 array and varint-encoded in a single call;
per-list blobs are then zero-copy slices of the resulting byte stream (their
byte ranges are contiguous, so the Arrow large_binary column is built
directly from the offsets — no per-term Python loop, no copies).

Replaces searty's single-threaded merge + encode
(/root/reference/lib/indexer/merge.go:240-268, encoder.go:35-65) with a
shuffle-parallel reducer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import bm25
from ..functions.codec import varint_encode, varint_sizes
from ..functions.tokenize import unpack_terms
from ..schema import BLOCK_SIZE, SEGMENT_SCHEMA


def encode_partition(runs: pa.Table, avgdl: float, chunk_span: int, part: int) -> pa.Table:
    """Encode all runs of one partition → SEGMENT_SCHEMA table."""
    if len(runs) == 0:
        return SEGMENT_SCHEMA.empty_table()

    runs = runs.combine_chunks()
    run_term = runs["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    run_chunk = runs["chunk"].to_numpy(zero_copy_only=False)
    doc_col = runs.column("doc_ids").chunk(0)
    tf_col = runs.column("tfs").chunk(0)
    pos_col = runs.column("positions").chunk(0)

    # flatten() is slice-safe; rebase offsets so they index the flattened values
    D_raw = doc_col.flatten().to_numpy(zero_copy_only=False)
    T_raw = tf_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    P_raw = pos_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    run_doc_off = doc_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    run_doc_off = run_doc_off - run_doc_off[0]
    run_pos_off = pos_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    run_pos_off = run_pos_off - run_pos_off[0]
    run_len = np.diff(run_doc_off)

    # entry-level (one entry = one (term, chunk, doc)) arrays, in run order
    e_term = np.repeat(run_term, run_len)
    e_chunk = np.repeat(run_chunk, run_len)
    e_doc = D_raw
    e_tf = T_raw
    # start of each entry's position slice (within-run cumsum + run base)
    within = np.cumsum(e_tf) - e_tf
    run_first_entry = np.cumsum(run_len) - run_len
    run_pos_base = run_pos_off[:-1] - within[np.minimum(run_first_entry, max(len(within) - 1, 0))]
    e_pos_start = within + np.repeat(run_pos_base, run_len)

    order = np.lexsort((e_doc, e_chunk, e_term))
    st, sc, sd, stf = e_term[order], e_chunk[order], e_doc[order], e_tf[order]
    sstart = e_pos_start[order]

    E = len(sd)
    total_pos = int(stf.sum())
    ends = np.cumsum(stf)
    gidx = np.arange(total_pos, dtype=np.int64) - np.repeat(ends - stf, stf) + np.repeat(sstart, stf)
    PP = P_raw[gidx]

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
    g_base = g_chunk * chunk_span
    first_doc = sd[g_start]

    # ---- build the global value sequence [df, doc_gaps, tfs, pos_gaps]* ----
    L = 1 + 2 * df + cf
    S = np.cumsum(L) - L  # group section starts
    V = np.empty(int(L.sum()), dtype=np.uint64)

    V[S] = df

    rank = np.arange(E, dtype=np.int64) - np.repeat(g_start, df)
    dg = np.empty(E, dtype=np.int64)
    dg[1:] = sd[1:] - sd[:-1]
    dg[g_start] = sd[g_start] - g_base
    V[np.repeat(S + 1, df) + rank] = dg.astype(np.uint64)
    V[np.repeat(S + 1 + df, df) + rank] = stf.astype(np.uint64)

    pg = np.empty(total_pos, dtype=np.int64)
    pg[1:] = PP[1:] - PP[:-1]
    entry_pos_start = ends - stf
    pg[entry_pos_start] = PP[entry_pos_start]  # absolute at each doc's first position
    prank = np.arange(total_pos, dtype=np.int64) - np.repeat(
        np.cumsum(cf) - cf, cf
    )
    V[np.repeat(S + 1 + 2 * df, cf) + prank] = pg.astype(np.uint64)

    # ---- one varint pass for the whole partition ----
    sizes = varint_sizes(V)
    B = np.concatenate(([0], np.cumsum(sizes)))  # byte offset of each value
    data = varint_encode(V)
    blob_offsets = np.append(B[S], len(data)).astype(np.int64)
    blob_arr = pa.Array.from_buffers(
        pa.large_binary(),
        G,
        [None, pa.py_buffer(blob_offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )

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
            "chunk": pa.array(g_chunk, type=pa.int64()),
            "df": pa.array(df, type=pa.int64()),
            "cf": pa.array(cf, type=pa.int64()),
            "first_doc": pa.array(first_doc, type=pa.int64()),
            "blob": blob_arr,
            "block_last_doc": pa.LargeListArray.from_arrays(blk_off, pa.array(blk_last_doc, type=pa.int64())),
            "block_max_tf": pa.LargeListArray.from_arrays(blk_off, pa.array(blk_max_tf.astype(np.int32), type=pa.int32())),
            "block_max_score": pa.LargeListArray.from_arrays(blk_off, pa.array(blk_core, type=pa.float32())),
        },
        schema=_segment_schema_large(),
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
