"""Arrow schemas and layout constants for the searty-ray index.

The index layout replaces searty's single SQLite file
(/root/reference/lib/database/schema.sql) with partitioned Parquet + a JSON
manifest (SURVEY.md §1.4):

    <index_dir>/
      documents/part-*.parquet       # doc metadata (searty `document` minus body)
      content/part-*.parquet         # doc_id → content sidecar (pretty-print / phrase lines)
      segments/part=<p>/…parquet     # posting lists, hash-partitioned by term key
      symbols/*.parquet              # symbol/package definition side tables
      manifest.json                  # global stats + per-partition lineage/metrics
"""

from __future__ import annotations

import pyarrow as pa

# BM25 constants (Robertson–Zaragoza; FIXTURES.md §4 golden_topk)
BM25_K1 = 1.2
BM25_B = 0.75

# posting-list chunking: one blob covers at most this many doc ids' worth of
# doc-id range, so a df≈N term is encoded/queried as many independent chunks
# (parallel reducers, no single-reducer bottleneck; SURVEY.md §7).
DEFAULT_CHUNK_SPAN = 1 << 20  # doc ids per chunk at scale
# block-max granularity inside a chunk (docs per block) for WAND pruning.
BLOCK_SIZE = 128

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("filename", pa.string()),  # repo-relative display path (repo "/" path)
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("n_tokens", pa.int64()),  # max(runes-2, 0): BM25 doc length
        ("n_sym_tokens", pa.int64()),  # symbol-token count: BM25 |D| for the symbol index
        ("n_runes", pa.int64()),
        ("content_sha256", pa.string()),  # hex; per-row invariant vs source table
    ]
)

CONTENT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("content", pa.large_string())])

# Shuffle rows ("runs"): one row per (term, chunk) per tokenize batch.  ALL
# entry streams are varint-compressed before the shuffle (doc-id gaps, tfs,
# per-doc position byte lengths, delta positions) — the groupby moves
# ~3-4 B/(term,doc) + ~1.2 B/position instead of 16 B + 4 B numeric.
POSTINGS_RUN_SCHEMA = pa.schema(
    [
        ("term_key", pa.uint64()),
        ("chunk", pa.int64()),
        ("n_docs", pa.int32()),
        ("doc_blob", pa.large_binary()),  # varint doc gaps (first absolute)
        ("tf_blob", pa.large_binary()),  # varint tfs
        ("len_blob", pa.large_binary()),  # varint per-doc position byte lengths
        ("pos_blob", pa.large_binary()),  # delta+varbyte positions (per-doc streams)
    ]
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),  # hash partition of term_key
        ("term_key", pa.uint64()),
        ("term", pa.string()),
        ("kind", pa.int8()),  # 0 = trigram, 1 = symbol term (schema.sql:11-17 kind)
        ("chunk", pa.int64()),  # doc-range chunk ordinal
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("first_doc", pa.int64()),  # base for delta chain in meta_blob
        ("meta_blob", pa.large_binary()),  # varint [df, doc_gaps…, tfs…]
        ("pos_len_blob", pa.large_binary()),  # varint per-doc position byte lengths
        ("pos_blob", pa.large_binary()),  # delta+varbyte positions, doc-major
        ("block_last_doc", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_max_score", pa.list_(pa.float32())),  # BM25 upper bound per block
    ]
)

SYMBOLS_SCHEMA = pa.schema(
    [
        ("identifier_type", pa.string()),  # "symbol" | "package"
        ("name", pa.string()),  # UPPERCASED
        ("package", pa.string()),  # UPPERCASED home package; "" for packages
        ("specifier", pa.string()),  # DEFUN / DEFMACRO / DEFVAR / DEFPACKAGE …
        ("doc_id", pa.int64()),
        ("position", pa.int64()),  # rune offset of the defining form
    ]
)
