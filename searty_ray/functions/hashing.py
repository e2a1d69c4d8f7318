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
