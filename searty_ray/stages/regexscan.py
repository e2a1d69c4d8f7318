"""Distributed regex scan — the fallback when the trigram index can't prune.

A pattern with no required literal ≥ 3 runes (``b[ai]g``, ``x*``, a
case-insensitive query, …) constrains no posting list, so the only
correct plan is a full scan.  Expressed Ray-Data-first: one vectorized
``map_batches`` over the corpus with pyarrow's RE2 kernels
(``count_substring_regex`` / ``extract_regex``) — no Python in the
per-row path, matches-only rows leave each batch, and the stream never
materializes.  The SAME RE2 engine backs the DuckDB oracle's regexp
functions, so engine and oracle cannot diverge on regex semantics.

At 100 TB this is exactly a grep: read-bound, embarrassingly parallel,
pruned to (id, filename, text) columns at the parquet scan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.regexplan import group_neutral


def regex_scan(
    docs: ray.data.Dataset,
    pattern: str,
    text_col: str = "content",
    id_col: str = "doc_id",
    filename_col: str | None = None,
) -> ray.data.Dataset:
    """→ rows ``(id_col[, filename], n_matches, first_match)`` where the
    RE2 pattern matches ``text_col`` at least once (non-overlapping count,
    leftmost first match — ``re.finditer`` / ``regexp_extract_all``
    semantics)."""
    wrapped = f"(?P<m>{group_neutral(pattern)})"

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.count_substring_regex(text, pattern)
        cols: dict = {id_col: batch[id_col]}
        if filename_col is not None:
            cols["filename"] = batch[filename_col]
        cols["n_matches"] = n.cast(pa.int64())
        cols["first_match"] = pc.struct_field(pc.extract_regex(text, wrapped), "m")
        return pa.table(cols).filter(pc.greater(n, 0))

    return docs.map_batches(kernel, batch_format="pyarrow")
