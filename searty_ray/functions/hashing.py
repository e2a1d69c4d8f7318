"""Deterministic vectorized hashing (splitmix64) for partitioning keys.

Partition assignment must be identical across processes and parallelism
levels (resume + rank determinism), so we use our own mix instead of
``hash()``.  numpy uint64 arithmetic wraps silently, which is what we want.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray | int) -> np.ndarray | int:
    # NB: always computed on ≥1-d arrays — numpy SCALAR uint64 arithmetic
    # silently promotes to float64 in mixed expressions and corrupts hashes.
    scalar = np.ndim(x) == 0
    v = np.atleast_1d(np.asarray(x, dtype=np.uint64))
    with np.errstate(over="ignore"):
        v = v + _C1
        v = v ^ (v >> np.uint64(30))
        v = v * _C2
        v = v ^ (v >> np.uint64(27))
        v = v * _C3
        v = v ^ (v >> np.uint64(31))
    return int(v[0]) if scalar else v


def term_part(term_key: np.ndarray | int, num_parts: int) -> np.ndarray | int:
    """Hash partition of a term: ALL of a term's chunks live in one partition
    directory, so a query resolves each term with exactly one partition read."""
    scalar = np.ndim(term_key) == 0
    tk = np.atleast_1d(np.asarray(term_key, dtype=np.uint64))
    out = (mix64(tk) % np.uint64(num_parts)).astype(np.int32)
    return int(out[0]) if scalar else out


def partition_group(
    term_key: np.ndarray, chunk: np.ndarray, num_parts: int, sub_splits: int
) -> np.ndarray:
    """Reducer group key = part × SUB + (chunk % SUB).

    The doc-range sub-split is the structural skew handling for df≈N trigrams
    (SURVEY.md §7): a hot term's chunks are encoded by up to ``sub_splits``
    independent reducers (separate files in the same partition directory), so
    no reducer sees more than ~1/SUB of any term's postings.  ``sub_splits``
    scales with corpus size (256+ at 10^12 docs); queries are unaffected —
    they read the term's one partition directory either way.
    """
    p = term_part(np.asarray(term_key, dtype=np.uint64), num_parts).astype(np.int64)
    cg = np.asarray(chunk, dtype=np.int64) % sub_splits
    return (p * sub_splits + cg).astype(np.int32)


# ---------------------------------------------------------------------------
# Vectorized byte-string hash + its DuckDB mirror (dedup word/shingle hashes)
# ---------------------------------------------------------------------------

def gather_padded(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, width: int
) -> np.ndarray:
    """Scatter n ragged byte slices of ``buf`` into one zero-padded
    (n, width) uint8 matrix with a single fancy-index gather — the shared
    kernel under the byte-hash, doc-id-hash and multimodal header parsers.
    Every ``lens[i]`` must be ≤ width (clamp before calling)."""
    n = len(starts)
    mat = np.zeros((n, width), dtype=np.uint8)
    total = int(np.sum(lens))
    if total:
        row = np.repeat(np.arange(n), lens)
        col = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        mat[row, col] = buf[np.repeat(starts, lens) + col]
    return mat


def hash_bytes_u64(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, salt: int = 0
) -> np.ndarray:
    """uint64 hash of n byte slices of ``buf`` — a length-seeded splitmix64
    fold over big-endian 8-byte chunks (last chunk zero-padded; the length
    seed keeps prefixes distinct, so padding is unambiguous).

    This is the dedup pipeline's word/shingle hash primitive.  It is chosen
    to be BOTH numpy-vectorizable (≈6 ops per 8 bytes over the whole batch —
    no per-string Python, unlike a hashlib loop) AND bit-exactly expressible
    in DuckDB (:func:`sql_hash_expr`), so the correctness gate mirrors
    candidate generation end to end.  Rows are bucketed by chunk count: each
    bucket runs with a fixed-width padded matrix, so one pathological huge
    slice can't widen everyone's.

    ``salt`` xors into the length seed: two salts give two independent
    64-bit hashes of the same slices (the exact-dedup 128-bit key) at one
    extra xor; salt=0 is the historical hash, bit-for-bit.

    Buckets are CEIL-POWER-OF-2 chunk counts, not exact counts: whole-doc
    hashing (exact dedup) sees hundreds of distinct lengths, and one bucket
    per exact length degenerated into ~200k tiny mix64 calls.  Within a
    bucket the fold iterates to each row's own chunk count via a shrinking
    active mask — identical output, ≤2× padding, and the per-iteration work
    stays one vectorized mix64 over the bucket.
    """
    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    wlens = (lens + 7) // 8
    cls = np.searchsorted(2 ** np.arange(42, dtype=np.int64), wlens, side="left")
    for c in np.unique(cls):
        sel = np.where(cls == c)[0]
        out[sel] = _hash_bucket(buf, starts[sel], lens[sel], wlens[sel], salt)
    return out


def _hash_bucket(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, wlens: np.ndarray, salt: int = 0
) -> np.ndarray:
    h = mix64(lens.astype(np.uint64) ^ np.uint64(salt))
    W = int(wlens.max()) if len(wlens) else 0
    if W == 0:  # empty slices: hash = mix64(len seed)
        return h
    mat = gather_padded(buf, starts, lens, W * 8)
    words = mat.view(">u8")  # big-endian chunks == the SQL mirror's hex substr
    for j in range(W):
        active = wlens > j
        if active.all():
            h = mix64(h ^ words[:, j].astype(np.uint64))
        else:
            idx = np.nonzero(active)[0]
            h[idx] = mix64(h[idx] ^ words[idx, j].astype(np.uint64))
    return h


def hash_str_u64(s: str, salt: int = 0) -> int:
    """Scalar convenience wrapper over :func:`hash_bytes_u64`."""
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    return int(
        hash_bytes_u64(
            b, np.zeros(1, dtype=np.int64), np.array([len(b)], dtype=np.int64), salt=salt
        )[0]
    )


_SQL_U64 = "18446744073709551616"
_SQL_C = (11400714819323198485, 13787848793156543929, 10723151780598845931)


def _sql_mul64(c: int, v: str) -> str:
    """``(c * v) mod 2^64`` via HUGEINT hi/lo split — DuckDB UBIGINT
    arithmetic errors on overflow instead of wrapping."""
    return (
        f"(({c}::HUGEINT * (({v}) % 4294967296)"
        f" + (({c}::HUGEINT * (({v}) // 4294967296)) % 4294967296) * 4294967296)"
        f" % {_SQL_U64})::UBIGINT"
    )


def _sql_mix64(x: str) -> str:
    """Inline DuckDB expression computing ``mix64(x)``.  Each step is
    let-bound via a single-element ``list_transform`` lambda so it evaluates
    ONCE — naive textual nesting re-evaluates the whole prefix at every
    reference (2^steps blowup)."""
    c1, c2, c3 = _SQL_C
    return (
        f"list_transform([((({x})::HUGEINT + {c1}) % {_SQL_U64})::UBIGINT], mx1 -> "
        f"list_transform([xor(mx1, mx1 >> 30)], mx2 -> "
        f"list_transform([{_sql_mul64(c2, 'mx2')}], mx3 -> "
        f"list_transform([xor(mx3, mx3 >> 27)], mx4 -> "
        f"list_transform([{_sql_mul64(c3, 'mx4')}], mx5 -> "
        f"xor(mx5, mx5 >> 31))[1])[1])[1])[1])[1]"
    )


def sql_mix64_expr(x: str) -> str:
    """DuckDB expression bit-identical to ``mix64(x)`` for a non-negative
    integer expression ``x`` (cast to UBIGINT) — the mirror under the KMV
    approximate-distinct sketch's value hash."""
    return f"({_sql_mix64(f'({x})::UBIGINT')})::UBIGINT"


def sql_hash_expr(s: str, salt: int = 0) -> str:
    """DuckDB expression bit-identical to ``hash_str_u64(s)`` (or
    ``hash_bytes_u64(..., salt=salt)``) for a VARCHAR expression ``s``:
    big-endian 8-byte chunks come from the hex dump of the UTF-8 bytes
    (right-padded = zero-padded last chunk), the (salted) length seed is
    prepended, and ``list_reduce`` performs the same fold."""
    words = (
        f"list_transform(range(0, (octet_length(encode({s})) + 7) // 8), "
        f"j -> ('0x' || rpad(substr(hex(encode({s})), (j*16 + 1)::INT, 16), 16, '0'))::UBIGINT)"
    )
    length = f"octet_length(encode({s}))"
    seed = _sql_mix64(
        f"xor(({length})::UBIGINT, {salt}::UBIGINT)" if salt else length
    )
    return (
        f"list_reduce(list_prepend(({seed})::UBIGINT, {words}), "
        f"(h, w) -> ({_sql_mix64('xor(h, w)')})::UBIGINT)"
    )
