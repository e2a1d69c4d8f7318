"""Line-delimited JSON source for the documents table.

The reference ingests exactly two formats: spec JSON + raw files
(`/root/reference/lib/spec/spec.go`, `lib/indexer/indexer.go:30-60`);
this adds the ubiquitous data-lake interchange format as a first-class
source.  `ray.data.read_json` is the pyarrow streaming JSONL reader —
schema-inferred, block-parallel, no driver materialization — so a JSONL
corpus drops into every pipeline that takes the parquet documents table.
"""

from __future__ import annotations

import ray.data


def documents_from_jsonl(path: str | list[str]) -> ray.data.Dataset:
    """documents table from .jsonl file(s): one JSON object per line with
    the parquet table's fields (doc_id, text, lang, source, n_chars…)."""
    return ray.data.read_json(path)


def write_documents_jsonl(parquet_path: str, out_path: str) -> str:
    """Test/gate helper: JSONL copy of a documents parquet file."""
    import pyarrow.parquet as pq

    df = pq.read_table(parquet_path).to_pandas()
    df.to_json(out_path, orient="records", lines=True, force_ascii=False)
    return out_path
