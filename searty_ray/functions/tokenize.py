"""Character-trigram tokenization, vectorized over Arrow batches.

Semantics match the reference tokenizer exactly
(/root/reference/lib/tokenizer/tokenizer.go:9-33):

* terms are overlapping windows of 3 **runes** (Unicode codepoints) over the
  raw text — no normalization, no case folding; whitespace participates;
* a text of R runes yields ``max(R-2, 0)`` terms;
* the position of a term is its token ordinal == the rune offset of the
  window's first character (SURVEY.md §1.2).

Representation: a trigram is packed into a single ``uint64`` *term key*
(3 × 21-bit codepoints, first rune in the high bits), so the shuffle/group
key is a fixed-width integer instead of a string and all hot-path work is
numpy.  Packing is order-preserving: comparing term keys == comparing the
trigram strings by codepoint, which matches DuckDB's binary collation for
ASCII and keeps "sorted by term" well-defined.
"""

from __future__ import annotations

import numpy as np

_SHIFT1 = np.uint64(42)
_SHIFT2 = np.uint64(21)
_MASK = np.uint64(0x1FFFFF)


def codepoints(text: str) -> np.ndarray:
    """Decode a Python string to a uint32 codepoint array (no Python loop)."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def pack_trigrams(cps: np.ndarray) -> np.ndarray:
    """All R-2 packed trigram keys of a codepoint array (empty if R < 3)."""
    r = len(cps)
    if r < 3:
        return np.empty(0, dtype=np.uint64)
    c = cps.astype(np.uint64)
    return (c[:-2] << _SHIFT1) | (c[1:-1] << _SHIFT2) | c[2:]


def pack_term(term: str) -> int:
    """Pack one 3-rune term string to its uint64 key."""
    cps = codepoints(term)
    if len(cps) != 3:
        raise ValueError(f"term must be exactly 3 runes, got {term!r}")
    return int(pack_trigrams(cps)[0])


def unpack_term(key: int) -> str:
    """Inverse of :func:`pack_term`."""
    k = int(key)
    return "".join(chr(c) for c in ((k >> 42) & 0x1FFFFF, (k >> 21) & 0x1FFFFF, k & 0x1FFFFF))


def unpack_terms(keys: np.ndarray) -> list[str]:
    k = np.asarray(keys, dtype=np.uint64)
    a = ((k >> _SHIFT1) & _MASK).astype(np.uint32)
    b = ((k >> _SHIFT2) & _MASK).astype(np.uint32)
    c = (k & _MASK).astype(np.uint32)
    stacked = np.column_stack([a, b, c]).astype("<u4")
    return [bytes(row).decode("utf-32-le") for row in stacked]


def tokenize_query(text: str) -> tuple[np.ndarray, list[np.ndarray]]:
    """Query-side tokenize → (unique term_keys asc, offsets per unique key).

    ``offsets`` are the rune offsets of each unique trigram within the query
    (needed for the relative-position phrase intersect, D2 in SURVEY.md
    §2.7).  Keys are deduped for the AND phase but every offset is kept per
    unique key, which gives correct phrase semantics for self-overlapping
    queries like "aaaa" — the reference panics on those; we define them
    (SURVEY.md §3.3).
    """
    keys = pack_trigrams(codepoints(text))
    if len(keys) == 0:
        return np.empty(0, dtype=np.uint64), []
    uniq, inv = np.unique(keys, return_inverse=True)
    all_offs = np.arange(len(keys), dtype=np.int64)
    offsets = [all_offs[inv == i] for i in range(len(uniq))]
    return uniq, offsets


def tokenize_doc(text: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One document → (unique term_keys asc, tfs, flattened ascending positions).

    Groups the R-2 (term, position) pairs by term with a stable argsort, so
    positions within each term stay ascending (the build-time invariant the
    reference asserts in postinglist.go:96-106).
    """
    keys = pack_trigrams(codepoints(text))
    n = len(keys)
    if n == 0:
        e64 = np.empty(0, dtype=np.uint64)
        return e64, np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int32)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    boundaries = np.empty(n, dtype=bool)
    boundaries[0] = True
    np.not_equal(sk[1:], sk[:-1], out=boundaries[1:])
    uniq = sk[boundaries]
    tfs = np.diff(np.append(np.nonzero(boundaries)[0], n)).astype(np.int32)
    positions = order.astype(np.int32)  # position == token ordinal == rune offset
    return uniq, tfs, positions


def doc_length(text: str) -> int:
    """Token count of a document: max(R-2, 0) (SURVEY.md §2.5 A7)."""
    return max(len(text.encode("utf-32-le")) // 4 - 2, 0)
