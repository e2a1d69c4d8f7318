"""Documents stage: corpus batches → document rows (metadata + body).

Searty's ``document`` table stores the full body alongside metadata
(schema.sql:2-6); we keep one Parquet table too — Parquet's columnar layout
means the query path reads only the metadata pages unless it explicitly asks
for ``content`` (pretty-printing), so the meta/body split is free
(SURVEY.md §1.4) and the corpus streams through ONE documents pass.

The per-row invariant demanded by BASELINE.json input_hint is computed here:
``content_sha256`` (hex) of the exact UTF-8 content bytes.

This stage touches every corpus byte, so everything except the sha256 digest
itself is batch-vectorized: rune counts via the Arrow ``utf8_length`` kernel,
symbol-token counts via a byte-level transition kernel over the batch's one
UTF-8 buffer, and the digests over memoryview slices of that same buffer
(no per-row ``as_py``/``encode`` round-trips — those made the first version
~17 MB/s per core; sha256 alone streams ~1 GB/s).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import _SYMBOL_ASCII

# byte-level symbol class: symbol-constituent codepoints are all ASCII, and
# UTF-8 continuation/lead bytes are ≥ 0x80 → automatically non-constituent,
# so a codepoint-level symbol run is exactly a byte-level run of these.
_SYMBOL_BYTE = np.zeros(256, dtype=bool)
_SYMBOL_BYTE[:128] = _SYMBOL_ASCII


def _symbol_lengths(buf: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-row symbol-token count (maximal symbol-class runs) over one
    concatenated UTF-8 buffer — the batch-global twin of
    :func:`searty_ray.functions.tokenize.symbol_doc_length` (pinned equal by
    a property test)."""
    n = len(offs) - 1
    if len(buf) == 0:
        return np.zeros(n, dtype=np.int64)
    mask = _SYMBOL_BYTE[buf]
    entries = np.empty(len(buf), dtype=np.int64)
    entries[0] = mask[0]
    # run entry = symbol byte whose predecessor isn't one
    entries[1:] = mask[1:] > mask[:-1]
    cs = np.concatenate(([0], np.cumsum(entries)))
    s, e = offs[:-1], offs[1:]
    cnt = cs[e] - cs[s]
    # a row starting mid-"run" of the previous row's trailing symbol bytes
    # still opens its own run
    fix = (s > 0) & (e > s)
    cnt[fix] += mask[s[fix]] & mask[s[fix] - 1]
    return cnt


def document_meta_batch(batch: pa.Table) -> pa.Table:
    from .encode_stage import _binary_offsets, _binary_values

    content = batch["content"]
    arr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
    offs = _binary_offsets(arr)
    values = _binary_values(arr)
    buf = np.frombuffer(values, dtype=np.uint8)

    n_runes = pc.utf8_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
    shas = [
        hashlib.sha256(values[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(arr))
    ]  # the digest itself is per-row by nature; input slices are zero-copy

    filename = pc.binary_join_element_wise(batch["repo"], batch["path"], "/")
    # NB the reference joins root-relative paths the same way (indexer.go:36-44)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "filename": filename,
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "n_tokens": pa.array(np.maximum(n_runes - 2, 0), type=pa.int64()),
            "n_sym_tokens": pa.array(_symbol_lengths(buf, offs), type=pa.int64()),
            "n_runes": pa.array(n_runes, type=pa.int64()),
            "content_sha256": pa.array(shas, type=pa.string()),
            "content": pc.cast(content, pa.large_string()),
        }
    )
