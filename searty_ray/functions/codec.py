"""Posting-list codecs.

Two wire formats:

* **native** — the engine's own columnar delta+varbyte layout (doc-id gaps,
  term frequencies, position gaps), designed so that an entire *partition* of
  posting lists can be encoded with a handful of numpy passes (no per-term
  Python loop in the hot path).  This is the "delta+varbyte" compression the
  north rule asks for; the reference stores absolute values only
  (see /root/reference/lib/invertedindex/encoder.go:35-65).

* **compat** — byte-identical to the reference's format
  (/root/reference/lib/invertedindex/encoder.go:15-65,
  decoder.go:17-55): big-endian 7-bit varint groups, continuation bit 0x80 on
  every byte except the last, postings written as
  ``varint(count) [varint(docId) varint(nPos) varint(pos)*]*`` with ABSOLUTE
  doc ids / positions.  Kept only so unit tests can lock the reference's
  published byte vectors (encode_decode_test.go:10-57).

The varint itself is shared: both formats use the big-endian 7-bit group
encoding, so one vectorized encoder/decoder serves both.
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_U0X7F = np.uint64(0x7F)

# ---------------------------------------------------------------------------
# varint (big-endian 7-bit groups, 0x80 continuation on all but last byte)
# ---------------------------------------------------------------------------


def varint_encode(values: np.ndarray, sizes: np.ndarray | None = None) -> np.ndarray:
    """Encode an array of non-negative ints to one concatenated byte stream.

    Vectorized: O(max_bytes) numpy passes, no per-value Python loop.  Pass
    ``sizes`` (= ``varint_sizes(values)``) when the caller already computed
    it — the tokenize hot path needs both and shouldn't pay twice.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    nb = sizes if sizes is not None else varint_sizes(v)
    ends = np.cumsum(nb)
    if int(ends[-1]) == n:  # every value < 128: the bytes ARE the values
        return v.astype(np.uint8)
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    maxb = int(nb.max())
    for k in range(maxb):
        mask = nb > k
        idx = ends[mask] - 1 - k
        byte = ((v[mask] >> np.uint64(7 * k)) & _U0X7F).astype(np.uint8)
        if k > 0:
            byte |= np.uint8(0x80)
        out[idx] = byte
    return out


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Byte length of each value's varint encoding (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += tmp > 0
        tmp = tmp >> _U7
    return nb


def varint_decode(buf: np.ndarray | bytes | memoryview) -> np.ndarray:
    """Decode a concatenated varint byte stream into a uint64 array.

    Vectorized, skew-aware: the low 7 bits of every value come from ONE bulk
    gather of the terminal bytes; each higher byte position is then OR-ed in
    for only the values long enough to have one.  Position-gap streams are
    ~90% single-byte, so the common case is a single gather (plus the
    all-single-byte fast path, which is a bare cast).  (A reduceat-based
    single-pass variant is ~25% faster warm but allocates byte-sized int64
    temporaries — 2.6× slower cold on fault-bound hosts.)
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    cont = b & np.uint8(0x80)
    if not cont.any():  # every value is one byte: the buffer IS the values
        return b.astype(np.uint64)
    ends = np.nonzero(cont == 0)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts
    vals = b[ends].astype(np.uint64)  # terminal bytes carry no high bit
    for k in range(1, int(lengths.max()) + 1):
        sel = np.nonzero(lengths >= k)[0]
        vals[sel] |= (b[ends[sel] - k].astype(np.uint64) & _U0X7F) << np.uint64(7 * k)
    return vals


# ---------------------------------------------------------------------------
# native columnar delta layout (per posting list)
# ---------------------------------------------------------------------------
#
# One posting list for one (term, chunk):
#     varint(df)
#     varint(doc_gap)   * df      # doc_ids[0] - first_doc_base, then diffs
#     varint(tf)        * df
#     varint(pos_gap)   * cf      # per doc: positions[0], then diffs (reset per doc)
#
# ``first_doc_base`` is carried outside the blob (segment row column), so a
# chunked posting list re-bases cleanly per chunk.


def build_value_sequence(
    doc_ids: np.ndarray, tfs: np.ndarray, positions: np.ndarray, first_doc_base: int = 0
) -> np.ndarray:
    """Build the [df, doc_gaps…, tfs…, pos_gaps…] value sequence for ONE list.

    ``doc_ids`` strictly ascending; ``positions`` is the flattened ascending
    per-doc position arrays, ``tfs`` their per-doc lengths.
    """
    df = len(doc_ids)
    doc_gaps = np.empty(df, dtype=np.uint64)
    if df:
        doc_gaps[0] = np.uint64(int(doc_ids[0]) - first_doc_base)
        np.subtract(doc_ids[1:], doc_ids[:-1], out=doc_gaps[1:], casting="unsafe")
    pos_gaps = position_gaps(positions, tfs)
    seq = np.empty(1 + 2 * df + len(positions), dtype=np.uint64)
    seq[0] = df
    seq[1 : 1 + df] = doc_gaps
    seq[1 + df : 1 + 2 * df] = tfs
    seq[1 + 2 * df :] = pos_gaps
    return seq


def position_gaps(positions: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Delta-encode flattened per-doc positions, resetting at doc boundaries."""
    p = np.asarray(positions, dtype=np.int64)
    if len(p) == 0:
        return np.empty(0, dtype=np.uint64)
    gaps = np.empty(len(p), dtype=np.int64)
    gaps[0] = p[0]
    gaps[1:] = p[1:] - p[:-1]
    # reset delta chain at the first position of each doc
    starts = np.zeros(len(p), dtype=bool)
    starts[np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]] = True
    starts[0] = True
    gaps[starts] = p[starts]
    return gaps.astype(np.uint64)


def encode_posting_list(
    doc_ids: np.ndarray, tfs: np.ndarray, positions: np.ndarray, first_doc_base: int = 0
) -> bytes:
    """Encode one posting list to the native blob (convenience / oracle path)."""
    return varint_encode(build_value_sequence(doc_ids, tfs, positions, first_doc_base)).tobytes()


def decode_meta_blob(
    blob: bytes | memoryview | np.ndarray, first_doc_base: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a segment metadata stream [df, doc_gaps…, tfs…] → (doc_ids, tfs)."""
    vals = varint_decode(blob).astype(np.int64)
    df = int(vals[0]) if len(vals) else 0
    doc_ids = np.cumsum(vals[1 : 1 + df]) + first_doc_base
    tfs = vals[1 + df : 1 + 2 * df].astype(np.int32)
    return doc_ids.astype(np.int64), tfs


def meta_blob_entries(
    meta_values: bytes | memoryview | np.ndarray,
    df_col: np.ndarray,
    order: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bulk decode of CONCATENATED segment meta blobs ([df, gaps…, tfs…] per
    row) → per-entry (doc_gaps, tfs, rank) arrays, one varint pass for the
    whole stream.  ``order`` permutes rows (e.g. (term, chunk) sort) before
    the entry gather; ``rank`` is each entry's ordinal within its row.  The
    ONE place the wire-format entry layout is interpreted — both the query
    reader and the merge path (encode_stage.segment_rows_to_entries) build
    on it."""
    meta_vals = varint_decode(meta_values).astype(np.int64)
    row_off = np.concatenate(([0], np.cumsum(1 + 2 * df_col)))[:-1]
    if order is None:
        df_o, off_o = df_col, row_off
    else:
        df_o, off_o = df_col[order], row_off[order]
    E = int(df_o.sum())
    rank = np.arange(E, dtype=np.int64) - np.repeat(np.cumsum(df_o) - df_o, df_o)
    gaps = meta_vals[np.repeat(off_o + 1, df_o) + rank]
    tfs = meta_vals[np.repeat(off_o + 1 + df_o, df_o) + rank]
    return gaps, tfs, rank


def decode_pos_blob(blob: bytes | memoryview | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Decode a compressed position stream given the per-doc tfs."""
    pg = varint_decode(blob)
    return _undelta_positions(pg, tfs)


def decode_posting_list(
    blob: bytes | memoryview | np.ndarray, first_doc_base: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a native blob → (doc_ids int64, tfs int32, positions int32)."""
    vals = varint_decode(blob).astype(np.int64)
    df = int(vals[0]) if len(vals) else 0
    doc_gaps = vals[1 : 1 + df]
    tfs = vals[1 + df : 1 + 2 * df]
    pos_gaps = vals[1 + 2 * df :]
    doc_ids = np.cumsum(doc_gaps) + first_doc_base
    positions = _undelta_positions(pos_gaps, tfs)
    return doc_ids.astype(np.int64), tfs.astype(np.int32), positions


def segmented_undelta(gaps: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Invert per-segment delta encoding (first value absolute) → int64.

    Same construction as :func:`_undelta_positions` but int64-valued, used
    for doc-id gap streams segmented by run lengths."""
    g = np.asarray(gaps, dtype=np.int64)
    if len(g) == 0:
        return np.empty(0, dtype=np.int64)
    c = np.cumsum(g)
    boundary = np.cumsum(np.asarray(counts, dtype=np.int64))[:-1]
    base = np.zeros(len(g), dtype=np.int64)
    base[boundary] = c[boundary - 1]
    base = np.maximum.accumulate(base)
    return c - base


def _undelta_positions(pos_gaps: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Invert :func:`position_gaps` — vectorized segmented cumsum.

    With ``c = cumsum(gaps)`` and a segment starting at index ``s``,
    ``pos[i] = c[i] - c[s-1]`` (0 for the first segment), because the first
    gap of each segment is stored absolute.  ``c`` is nondecreasing, so a
    ``maximum.accumulate`` forward-fills the per-segment base.
    """
    if len(pos_gaps) == 0:
        return np.empty(0, dtype=np.int32)
    c = np.cumsum(pos_gaps.astype(np.int64))
    boundary = np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]  # starts of segments 2..n
    base = np.zeros(len(pos_gaps), dtype=np.int64)
    base[boundary] = c[boundary - 1]
    base = np.maximum.accumulate(base)
    return (c - base).astype(np.int32)


# ---------------------------------------------------------------------------
# compat codec (reference byte format; tests only)
# ---------------------------------------------------------------------------


def compat_encode_uint(value: int) -> bytes:
    """Single-value reference varint (encoder.go:15-26); shared format."""
    return varint_encode(np.array([value], dtype=np.uint64)).tobytes()


def compat_decode_uint(buf: bytes) -> int:
    return int(varint_decode(buf)[0])


def compat_encode_posting_list(postings: list[tuple[int, list[int]]]) -> bytes:
    """Reference blob layout with ABSOLUTE ids/positions (encoder.go:35-65).

    ``postings`` ascending by doc id; written count-first, postings in the
    reference's decode-friendly order (the reference writes descending and
    rebuilds ascending via prepend — the byte stream it produces is
    descending doc id; we reproduce that exactly).
    """
    vals: list[int] = [len(postings)]
    for doc_id, positions in reversed(postings):
        vals.append(doc_id)
        vals.append(len(positions))
        vals.extend(positions)
    return varint_encode(np.array(vals, dtype=np.uint64)).tobytes()


def compat_decode_posting_list(blob: bytes) -> list[tuple[int, list[int]]]:
    vals = varint_decode(blob).astype(np.int64)
    i = 1
    out: list[tuple[int, list[int]]] = []
    for _ in range(int(vals[0]) if len(vals) else 0):
        doc_id = int(vals[i])
        npos = int(vals[i + 1])
        out.append((doc_id, [int(x) for x in vals[i + 2 : i + 2 + npos]]))
        i += 2 + npos
    out.reverse()  # stream is descending; present ascending like decoder.go:48-55
    return out
