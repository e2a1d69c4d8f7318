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
    """Term strings for trigram keys; symbol keys (high bit) are hashes of
    their term, so they render as an opaque ``#sym:<hex>`` marker."""
    k = np.asarray(keys, dtype=np.uint64)
    a = ((k >> _SHIFT1) & _MASK).astype(np.uint32)
    b = ((k >> _SHIFT2) & _MASK).astype(np.uint32)
    c = (k & _MASK).astype(np.uint32)
    stacked = np.column_stack([a, b, c]).astype("<u4")
    is_sym = (k >> np.uint64(63)).astype(bool)
    return [
        f"#sym:{int(key):016x}" if sym else bytes(row).decode("utf-32-le")
        for key, sym, row in zip(k, is_sym, stacked)
    ]


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


# ---------------------------------------------------------------------------
# symbol terms (the reference's second analyzer: Lisp-aware token kinds,
# tests/lisp-tokenizer.lisp; the token `kind` vestige of schema.sql:11-17)
# ---------------------------------------------------------------------------

import hashlib
import re

#: Lisp symbol constituent characters (identifier tokens of the CL reader)
SYMBOL_RE = re.compile(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+")

#: term keys ≥ 2^63 are symbol terms; trigram keys use at most 63 bits
SYMBOL_KIND_BIT = 1 << 63

KIND_TRIGRAM = 0
KIND_SYMBOL = 1


def symbol_key(symbol: str) -> int:
    """Packed term key of an UPPERCASED symbol term (high bit set).

    The key is the top 63 bits of md5 — two distinct identifiers colliding
    would silently merge their posting lists.  Accepted risk, documented:
    birthday bound ≈ V²/2^64, i.e. ~5·10⁻⁹ at 10⁴ distinct symbols per
    system (the reference's scale) and ~0.05 at an extreme 10⁹-symbol
    corpus; at that scale switch the symbol index to a string-keyed segment
    table (the ``term`` column already exists for it)."""
    h = hashlib.md5(symbol.upper().encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") | SYMBOL_KIND_BIT


def term_kind(key: int | np.ndarray) -> int | np.ndarray:
    k = np.asarray(key, dtype=np.uint64) >> np.uint64(63)
    return int(k) if np.ndim(key) == 0 else k.astype(np.int8)


def tokenize_doc_symbols(text: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symbol terms of one document → (unique keys asc, tfs, positions).

    Positions are rune offsets of each occurrence's first character, matching
    the trigram position model; terms are uppercased like searty symbols
    (definition_searcher.go:12-20).  Python ``re`` iterates str (rune
    offsets), so multibyte content is handled exactly.
    """
    occ: dict[int, list[int]] = {}
    for mt in SYMBOL_RE.finditer(text):
        occ.setdefault(symbol_key(mt.group(0)), []).append(mt.start())
    if not occ:
        e = np.empty(0, dtype=np.uint64)
        return e, np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int32)
    keys = np.array(sorted(occ), dtype=np.uint64)
    tfs = np.array([len(occ[int(k)]) for k in keys], dtype=np.int32)
    positions = np.concatenate([np.array(occ[int(k)], dtype=np.int32) for k in keys])
    return keys, tfs, positions


_SYMBOL_ASCII = np.zeros(128, dtype=bool)
for _ch in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-*+/<>=!?_&%$.":
    _SYMBOL_ASCII[ord(_ch)] = True


def symbol_doc_length(text: str) -> int:
    """Symbol-token count of a document (BM25 |D| for the symbol index).

    Vectorized: tokens are maximal runs of symbol-class codepoints, counted
    as class-entry transitions — no per-token regex work.  Non-ASCII
    codepoints are non-constituent, exactly like SYMBOL_RE's class.
    """
    cps = codepoints(text)
    if len(cps) == 0:
        return 0
    mask = np.zeros(len(cps), dtype=bool)
    ascii_sel = cps < 128
    mask[ascii_sel] = _SYMBOL_ASCII[cps[ascii_sel]]
    return int(mask[0]) + int(np.count_nonzero(mask[1:] & ~mask[:-1]))
