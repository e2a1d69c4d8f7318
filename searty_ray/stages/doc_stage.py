"""Documents stage: corpus batches → document rows (metadata + body).

Searty's ``document`` table stores the full body alongside metadata
(schema.sql:2-6); we keep one Parquet table too — Parquet's columnar layout
means the query path reads only the metadata pages unless it explicitly asks
for ``content`` (pretty-printing), so the meta/body split is free
(SURVEY.md §1.4) and the corpus streams through ONE documents pass.

The per-row invariant demanded by BASELINE.json input_hint is computed here:
``content_sha256`` (hex) of the exact UTF-8 content bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import symbol_doc_length


def document_meta_batch(batch: pa.Table) -> pa.Table:
    content = batch["content"]
    n_runes = np.empty(len(batch), dtype=np.int64)
    shas = []
    for i, v in enumerate(content):
        s = v.as_py()
        n_runes[i] = len(s)
        shas.append(hashlib.sha256(s.encode("utf-8")).hexdigest())
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
            "n_sym_tokens": pa.array(
                [symbol_doc_length(v.as_py()) for v in content], type=pa.int64()
            ),
            "n_runes": pa.array(n_runes, type=pa.int64()),
            "content_sha256": pa.array(shas, type=pa.string()),
            "content": pc.cast(content, pa.large_string()),
        }
    )
