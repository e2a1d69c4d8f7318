"""Index manifest: global stats + per-partition lineage/metrics.

Replaces searty's SQLite transactionality (database.go:79-105) with an
immutable-Parquet + manifest commit protocol (SURVEY.md §4): each segment
partition is written to a temp file and atomically renamed, and records a
``manifest/part-<p>.json`` sidecar; the build is complete when
``manifest.json`` (global stats + the full partition list) exists.  Resume =
skip partitions whose sidecar exists (write-once, unlike the reference's
silent conflict-ignore upsert, database.go:193-194).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class Manifest:
    version: int = 1
    n_docs: int = 0
    total_tokens: int = 0
    avgdl: float = 0.0
    total_sym_tokens: int = 0
    avg_sym_dl: float = 0.0
    tokenizer: str = "trigram"
    max_doc_id: int = -1
    chunk_span: int = 0
    num_parts: int = 0
    sub_splits: int = 1
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)

    @property
    def n_chunks(self) -> int:
        return self.max_doc_id // self.chunk_span + 1 if self.max_doc_id >= 0 else 0

    def save(self, index_dir: str) -> None:
        atomic_write_json(os.path.join(index_dir, "manifest.json"), asdict(self))

    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return cls(**json.load(f))


def atomic_write_json(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def partition_sidecar_path(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "manifest", f"part-{part:05d}.json")


def finished_partitions(index_dir: str) -> set[int]:
    d = os.path.join(index_dir, "manifest")
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            out.add(int(name[5:-5]))
    return out
