"""The index build pipeline — searty's indexer+merger as ONE Ray Data job.

    read corpus → [doc-id assign] → documents/ + content/ writes
                → tokenize+combine (map_batches, zero-copy Arrow)
                → groupby(part = hash(term, chunk))          # the one big shuffle
                → vectorized partition encode + atomic write # stateful reducers
                → manifest (global stats + per-partition lineage/metrics)

Replaces the reference's per-system SQLite shards + single-threaded merge
(/root/reference/lib/indexer/indexer.go:179-229, merge.go:455-502): the
map/merge split dissolves into the shuffle, and the merger's all-ids-in-RAM
reconciliation (merge.go:176-238) dissolves into term-keyed grouping
(SURVEY.md §3.4).

Scale notes:
* the corpus is streamed twice (documents pass, postings pass) — never
  materialized;
* ``num_parts`` is fixed (layout-deterministic, independent of cluster
  size), so output bytes are identical at any parallelism;
* a partition is written to a temp file and renamed, then records a
  manifest sidecar: resume skips finished partitions (checkpoint = the
  partition, lineage = its sidecar).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..functions.hashing import segment_part
from ..schema import DEFAULT_CHUNK_SPAN
from ..stages.doc_ids import assign_doc_ids
from ..stages.doc_stage import content_sidecar_batch, document_meta_batch
from ..stages.encode_stage import encode_partition
from ..stages.tokenize_stage import TokenizeCombine
from ..state.manifest import (
    Manifest,
    atomic_write_json,
    finished_partitions,
    partition_sidecar_path,
)

DEFAULT_NUM_PARTS = 32
TOKENIZE_BATCH_SIZE = 256  # docs per batch; content rows can be MB-scale


def build_index(
    corpus: ray.data.Dataset,
    index_dir: str,
    *,
    num_parts: int = DEFAULT_NUM_PARTS,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    resume: bool = False,
    id_mode: str = "sort",
    write_content: bool = True,
) -> Manifest:
    t0 = time.monotonic()
    _prepare_dirs(index_dir, resume)
    corpus = assign_doc_ids(corpus, mode=id_mode)

    # ---- documents + content sidecar (streaming writes) ----
    docs_dir = os.path.join(index_dir, "documents")
    if not (resume and os.path.isdir(docs_dir) and os.listdir(docs_dir)):
        corpus.map_batches(document_meta_batch, batch_format="pyarrow").write_parquet(docs_dir)
        if write_content:
            corpus.map_batches(content_sidecar_batch, batch_format="pyarrow").write_parquet(
                os.path.join(index_dir, "content")
            )
    t_docs = time.monotonic()

    # ---- global stats (small aggregate over written metadata) ----
    stats = (
        ray.data.read_parquet(docs_dir, columns=["doc_id", "n_tokens"])
        .aggregate(Sum("n_tokens"), Count(), Max("doc_id"))
    )
    n_docs = int(stats["count()"])
    total_tokens = int(stats["sum(n_tokens)"] or 0)
    max_doc_id = int(stats["max(doc_id)"]) if n_docs else -1
    avgdl = total_tokens / n_docs if n_docs else 0.0

    # ---- postings: tokenize → shuffle → encode+write per partition ----
    finished = finished_partitions(index_dir) if resume else set()
    seg_root = os.path.join(index_dir, "segments")

    def add_part(batch: pa.Table) -> pa.Table:
        part = segment_part(
            batch["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64),
            batch["chunk"].to_numpy(zero_copy_only=False),
            num_parts,
        )
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def encode_and_write(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        if part in finished:
            return _summary(part, 0, 0, 0, 0.0, skipped=True)
        g0 = time.monotonic()
        seg = encode_partition(group.drop_columns(["part"]), avgdl, chunk_span, part)
        part_dir = os.path.join(seg_root, f"part={part:05d}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, ".data.parquet.tmp")
        out = os.path.join(part_dir, "data.parquet")
        # the hive dir name (part=NNNNN) carries the partition id; storing the
        # column too would clash with partition inference on read
        pq.write_table(seg.drop_columns(["part"]), tmp, row_group_size=4096)
        os.replace(tmp, out)
        wall = time.monotonic() - g0
        nbytes = os.path.getsize(out)
        atomic_write_json(
            partition_sidecar_path(index_dir, part),
            {
                "part": part,
                "segments": len(seg),
                "rows": int(group.num_rows),
                "bytes": nbytes,
                "wall_s": round(wall, 4),
                "file": out,
            },
        )
        return _summary(part, len(seg), int(group.num_rows), nbytes, wall)

    runs = corpus.map_batches(
        TokenizeCombine(chunk_span),
        batch_format="pyarrow",
        batch_size=TOKENIZE_BATCH_SIZE,
    ).map_batches(add_part, batch_format="pyarrow")

    summaries = (
        runs.groupby("part")
        .map_groups(encode_and_write, batch_format="pyarrow")
        .take_all()
    )  # ≤ num_parts tiny rows
    t_end = time.monotonic()

    manifest = Manifest(
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=avgdl,
        max_doc_id=max_doc_id,
        chunk_span=chunk_span,
        num_parts=num_parts,
        partitions={
            str(s["part"]): {k: s[k] for k in ("segments", "rows", "bytes", "wall_s", "skipped")}
            for s in summaries
        },
        metrics={
            "docs_stage_s": round(t_docs - t0, 3),
            "postings_stage_s": round(t_end - t_docs, 3),
            "total_s": round(t_end - t0, 3),
        },
    )
    manifest.save(index_dir)
    return manifest


def _prepare_dirs(index_dir: str, resume: bool) -> None:
    if not resume and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    for sub in ("documents", "content", "segments", "manifest", "symbols"):
        os.makedirs(os.path.join(index_dir, sub), exist_ok=True)


def _summary(part: int, segments: int, rows: int, nbytes: int, wall: float, skipped: bool = False) -> pa.Table:
    return pa.table(
        {
            "part": pa.array([part], type=pa.int32()),
            "segments": pa.array([segments], type=pa.int64()),
            "rows": pa.array([rows], type=pa.int64()),
            "bytes": pa.array([nbytes], type=pa.int64()),
            "wall_s": pa.array([wall], type=pa.float64()),
            "skipped": pa.array([skipped]),
        }
    )
