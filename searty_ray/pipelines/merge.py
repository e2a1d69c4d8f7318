"""Index-level merge: N built indexes → one index, WITHOUT re-tokenizing.

The reference's ``searty-merge`` (cmd/searty-merge/merge.go:12-27,
lib/indexer/merge.go:455-502) merges SQLite index databases: documents are
deduplicated by filename (first shard wins, merge.go:164-171), ids are
reconciled, and posting lists are decoded, remapped and re-encoded
single-threaded.  This pipeline does the same job as Ray Data stages:

1. doc keys of every index → dedupe by filename (repo, path), first index
   wins → new dense ids from the SAME global (repo, path, commit) sort the
   build uses, so a merge of disjoint indexes is byte-identical to a direct
   build over the union corpus (pinned by pytest);
2. documents / docmeta / symbols rewritten with remapped ids (streaming
   ``map_batches``; remaps ship as per-old-chunk shards resolved on demand,
   never a whole O(docs) broadcast per index);
3. segments → :class:`SegmentsToRuns` (decode metadata, remap ids, gather
   the still-compressed position slices) → the build's own
   ``shuffle_encode_runs``.  Tokenization — the dominant CPU cost at
   corpus scale — never runs; position bytes move but are never re-encoded.

The corpus-level ``merge`` CLI (union of corpora → build) remains for when
inputs are raw tables; this is the path for merging ALREADY-BUILT indexes
(e.g. per-repo incremental shards).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.encode_stage import SegmentsToRuns, resolve_shards, shard_remap
from ..state.manifest import Manifest, finished_partitions
from .build import (
    DEFAULT_NUM_PARTS,
    DEFAULT_SUB_SPLITS,
    _prepare_dirs,
    pick_chunk_span,
    shuffle_encode_runs,
)


def _doc_keys(index_dir: str) -> pd.DataFrame:
    t = pq.read_table(
        os.path.join(index_dir, "documents"), columns=["doc_id", "repo", "path", "commit"]
    )
    return t.to_pandas()


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    *,
    num_parts: int = DEFAULT_NUM_PARTS,
    sub_splits: int = DEFAULT_SUB_SPLITS,
    chunk_span: int | None = None,
    preserve_ids: bool = False,
    resume: bool = False,
    drop_doc_ids: "tuple[int, np.ndarray] | None" = None,
) -> Manifest:
    t0 = time.monotonic()
    manifests = [Manifest.load(d) for d in index_dirs]
    tokenizer = manifests[0].tokenizer
    if any(m.tokenizer != tokenizer for m in manifests):
        raise ValueError("cannot merge indexes built with different tokenizers")
    _prepare_dirs(out_dir, resume=resume)

    # ---- id reconciliation (metadata only — no content moves here) ----
    # Dedupe by filename (repo, path), FIRST index wins (merge.go:164-171);
    # new ids from the global (repo, path, commit) sort, identical to
    # assign_doc_ids' ordering.
    frames = []
    for src, d in enumerate(index_dirs):
        f = _doc_keys(d)
        f["src"] = src
        frames.append(f)
    all_keys = pd.concat(frames, ignore_index=True)
    all_keys = all_keys.sort_values(["src", "doc_id"], kind="stable")
    all_keys["kept"] = ~all_keys.duplicated(subset=["repo", "path"], keep="first")
    if drop_doc_ids is not None:
        # removal rides the merge path: a dropped key goes through the same
        # kept=False machinery duplicate filenames already use, so documents,
        # docmeta, symbols, postings, df and stats all update consistently
        src, ids = drop_doc_ids
        dropped = (all_keys["src"] == src) & all_keys["doc_id"].isin(ids)
        all_keys["kept"] &= ~dropped
    kept = all_keys[all_keys["kept"]].copy()
    if preserve_ids:
        # explicit opt-in for caller-assigned global ids (hash mode /
        # incremental re-merges needing id stability).  Never auto-detected:
        # two sort-mode shards whose dense ranges coincidentally don't
        # overlap would otherwise silently violate the byte-identical-to-
        # direct-build contract (dense ids come from the GLOBAL sort).
        if not kept["doc_id"].is_unique:
            raise ValueError("preserve_ids=True but doc ids collide across indexes")
        kept = kept.reset_index(drop=True)
        kept["new_id"] = kept["doc_id"].to_numpy(dtype=np.int64)
    else:
        # reassign from the same global (repo, path, commit) sort the
        # build's assign_doc_ids uses
        kept = kept.sort_values(["repo", "path", "commit"], kind="stable").reset_index(drop=True)
        kept["new_id"] = np.arange(len(kept), dtype=np.int64)

    remaps: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for src in range(len(index_dirs)):
        mine = all_keys[all_keys["src"] == src][["doc_id", "kept"]].merge(
            kept[kept["src"] == src][["doc_id", "new_id"]], on="doc_id", how="left"
        )
        mine = mine.sort_values("doc_id")
        old_ids = mine["doc_id"].to_numpy(dtype=np.int64)
        kept_mask = mine["kept"].to_numpy(dtype=bool)
        new_ids = mine["new_id"].fillna(-1).to_numpy(dtype=np.int64)
        remaps.append((old_ids, new_ids, kept_mask))

    n_docs = len(kept)
    max_doc_id = int(kept["new_id"].max()) if n_docs else -1
    if chunk_span is None:
        # span from the ID RANGE, exactly like build_index (build.py): with
        # preserve_ids over hash-mode (63-bit) ids, spanning n_docs would
        # make nearly every (term, doc) its own chunk
        chunk_span = pick_chunk_span(max_doc_id + 1)

    # ---- remaps SHARDED by old-chunk range, not broadcast whole ----
    # Each index's remap is split along the chunk ranges its segments files
    # already use; stages resolve only the shards their batches touch (LRU),
    # so per-actor remap residency is O(shards touched × chunk_span), never
    # O(index docs) — the 10^12-doc path.  Only the dict of ObjectRefs
    # (O(#chunks), tiny) ships to every task.
    remap_shards = [
        shard_remap(r, m.chunk_span) for r, m in zip(remaps, manifests)
    ]

    def remap_stage(src: int, id_col: str = "doc_id"):
        shards = remap_shards[src]
        old_span = manifests[src].chunk_span

        def fn(batch: pa.Table) -> pa.Table:
            if not shards:  # empty source index: nothing survives
                return batch.slice(0, 0)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            old_ids, new_ids, kept_mask = resolve_shards(
                shards, np.unique(ids // old_span)
            )
            if len(old_ids) == 0:
                return batch.slice(0, 0)
            idx = np.minimum(np.searchsorted(old_ids, ids), len(old_ids) - 1)
            keep = (old_ids[idx] == ids) & kept_mask[idx]
            t = batch.filter(pa.array(keep))
            new_col = pa.array(new_ids[idx[keep]], type=pa.int64())
            return t.set_column(t.schema.get_field_index(id_col), id_col, new_col)

        return fn

    # documents / docmeta / symbols: the remap is a pure function of the
    # inputs, so a resumed merge skips a pass — but ONLY when its completion
    # marker exists (a non-empty dir may be a crashed partial write; trusting
    # it would silently drop documents and corrupt the avgdl stats)
    def _marker(name: str) -> str:
        return os.path.join(out_dir, f".{name}.done")

    def _pass_done(name: str) -> bool:
        return resume and os.path.exists(_marker(name))

    def _mark_done(name: str) -> None:
        with open(_marker(name), "w") as f:
            f.write("ok\n")

    docs_out = os.path.join(out_dir, "documents")
    if not _pass_done("documents"):
        if os.path.isdir(docs_out):  # clear any partial write
            for f in os.listdir(docs_out):
                os.remove(os.path.join(docs_out, f))
        ds = None
        for src, d in enumerate(index_dirs):
            part = ray.data.read_parquet(os.path.join(d, "documents")).map_batches(
                remap_stage(src), batch_format="pyarrow"
            )
            ds = part if ds is None else ds.union(part)
        ds.write_parquet(docs_out)
        _mark_done("documents")
    meta_out = os.path.join(out_dir, "docmeta")
    if not _pass_done("docmeta"):
        if os.path.isdir(meta_out):
            for f in os.listdir(meta_out):
                os.remove(os.path.join(meta_out, f))
        ray.data.read_parquet(
            docs_out, columns=["doc_id", "filename", "n_tokens", "n_sym_tokens"]
        ).write_parquet(meta_out)
        _mark_done("docmeta")

    sym_out = os.path.join(out_dir, "symbols")
    if not _pass_done("symbols"):
        if os.path.isdir(sym_out):
            for f in os.listdir(sym_out):
                os.remove(os.path.join(sym_out, f))
        sym = None
        for src, d in enumerate(index_dirs):
            sdir = os.path.join(d, "symbols")
            if not (os.path.isdir(sdir) and os.listdir(sdir)):
                continue
            part = ray.data.read_parquet(sdir).map_batches(
                remap_stage(src), batch_format="pyarrow"
            )
            sym = part if sym is None else sym.union(part)
        if sym is not None:
            sym.write_parquet(sym_out)
        _mark_done("symbols")

    # ---- stats from the merged metadata ----
    meta = pq.read_table(os.path.join(out_dir, "docmeta"), columns=["n_tokens", "n_sym_tokens"])
    total_tokens = int(pa.compute.sum(meta["n_tokens"]).as_py() or 0)
    total_sym_tokens = int(pa.compute.sum(meta["n_sym_tokens"]).as_py() or 0)
    avgdl = total_tokens / n_docs if n_docs else 0.0
    avg_sym_dl = total_sym_tokens / n_docs if n_docs else 0.0
    t_docs = time.monotonic()

    # ---- segments → remapped runs → the build's own shuffle+encode ----
    runs = None
    for src, (d, m) in enumerate(zip(index_dirs, manifests)):
        part = ray.data.read_parquet(
            os.path.join(d, "segments"),
            columns=["term_key", "chunk", "df", "meta_blob", "pos_len_blob", "pos_blob"],
        ).map_batches(
            SegmentsToRuns,
            batch_format="pyarrow",
            concurrency=(1, max(2, num_parts)),
            fn_constructor_kwargs={
                "remap_shards": remap_shards[src],
                "old_span": m.chunk_span,
                "new_span": chunk_span,
            },
        )
        runs = part if runs is None else runs.union(part)
    finished = finished_partitions(out_dir) if resume else set()
    summaries = shuffle_encode_runs(
        runs, out_dir, avgdl, chunk_span, num_parts, sub_splits, finished
    )
    t_end = time.monotonic()

    manifest = Manifest(
        n_docs=n_docs,
        total_tokens=total_tokens,
        avgdl=avgdl,
        total_sym_tokens=total_sym_tokens,
        avg_sym_dl=avg_sym_dl,
        tokenizer=tokenizer,
        max_doc_id=max_doc_id,
        chunk_span=chunk_span,
        num_parts=num_parts,
        sub_splits=sub_splits,
        partitions={
            str(s["pgrp"]): {k: s[k] for k in ("segments", "rows", "bytes", "wall_s", "skipped")}
            for s in summaries
        },
        metrics={
            "docs_stage_s": round(t_docs - t0, 3),
            "postings_stage_s": round(t_end - t_docs, 3),
            "total_s": round(t_end - t0, 3),
        },
    )
    manifest.save(out_dir)
    return manifest


def add_documents(
    index_dir: str,
    corpus: "ray.data.Dataset",
    out_dir: str,
    *,
    delta_dir: str | None = None,
    id_mode: str = "sort",
    preserve_ids: bool = False,
    resume: bool = False,
) -> Manifest:
    """Incremental indexing: extend an EXISTING index with new documents
    without re-tokenizing what is already built.

    The reference's index is write-once (conflict-ignore upsert,
    database.go:193-194; SURVEY.md §2.9) — its only growth path is a full
    re-merge of SQLite shards.  Here the same workflow is two existing
    primitives: build a small *delta* index over just the new corpus, then
    index-level-merge ``[existing, delta]`` (decode-remap-gather of
    compressed runs; tokenization runs ONLY over the new documents).

    Duplicate filenames keep the EXISTING document (first index wins —
    ``merge.go:164-171`` parity), making re-submission of already-indexed
    files idempotent.  With the default reassign mode the result is
    byte-identical to a direct build over the union corpus (pinned by
    pytest); ``preserve_ids=True`` keeps caller-assigned global ids stable
    across increments (hash-id corpora).
    """
    from .build import build_index

    existing = Manifest.load(index_dir)
    delta_dir = delta_dir or out_dir.rstrip("/") + ".delta"
    build_index(
        corpus,
        delta_dir,
        num_parts=existing.num_parts,
        sub_splits=existing.sub_splits,
        id_mode=id_mode,
        tokenizer=existing.tokenizer,
        resume=resume,
    )
    return merge_indexes(
        [index_dir, delta_dir],
        out_dir,
        num_parts=existing.num_parts,
        sub_splits=existing.sub_splits,
        preserve_ids=preserve_ids,
        resume=resume,
    )


def remove_documents(
    index_dir: str,
    out_dir: str,
    *,
    filenames: "list[str] | None" = None,
    doc_ids: "list[int] | np.ndarray | None" = None,
    preserve_ids: bool = False,
    resume: bool = False,
) -> Manifest:
    """Incremental deletion: drop documents from an EXISTING index without
    re-tokenizing anything that stays.

    The reference's SQLite index is write-once (SURVEY.md §2.9) — its
    deletion story is a full rebuild.  Here removal rides the index-level
    merge machinery: the dropped keys take the same ``kept=False`` path
    duplicate filenames take during a merge, so every artifact updates
    consistently — documents/docmeta/symbols are filtered in the remap
    stages, posting lists are filtered in SegmentsToRuns (still-compressed
    position bytes of surviving docs move untouched), df/cf are recomputed
    by the encode, and avgdl/BM25 stats come from the surviving docmeta.

    With the default reassign mode the result is BYTE-IDENTICAL to a
    direct build over the surviving corpus (pinned by pytest);
    ``preserve_ids=True`` keeps surviving ids stable (the incremental
    workflow: queries and external references stay valid).  Removing a
    filename that is not in the index is a no-op, so retries are
    idempotent.
    """
    if (filenames is None) == (doc_ids is None):
        raise ValueError("remove_documents: pass exactly one of filenames / doc_ids")
    existing = Manifest.load(index_dir)
    if filenames is not None:
        meta = pq.read_table(
            os.path.join(index_dir, "docmeta"), columns=["doc_id", "filename"]
        )
        # explicit string type: pa.array([]) infers null and is_in raises
        mask = pa.compute.is_in(
            meta["filename"], value_set=pa.array(filenames, type=pa.string())
        )
        ids = meta.filter(mask)["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        ids = np.asarray(doc_ids, dtype=np.int64)
    return merge_indexes(
        [index_dir],
        out_dir,
        num_parts=existing.num_parts,
        sub_splits=existing.sub_splits,
        preserve_ids=preserve_ids,
        resume=resume,
        drop_doc_ids=(0, ids),
    )


def update_documents(
    index_dir: str,
    corpus: "ray.data.Dataset",
    out_dir: str,
    *,
    id_mode: str = "sort",
    resume: bool = False,
) -> Manifest:
    """Incremental UPDATE: replace documents whose filename already exists
    in the index with the new corpus's version (and add the rest).

    Composition of the two existing primitives — remove the incoming
    filenames (no-op for genuinely-new files), then add the new corpus —
    so every consistency property is inherited: still-compressed postings
    of untouched docs move without re-tokenization, df/cf/avgdl recompute
    in the encode, and with the default reassign mode the result is
    BYTE-IDENTICAL to a direct build over (old − updated) ∪ new (pinned
    by pytest).  The filename list is the only driver-resident state —
    update-batch-sized, not index-sized.
    """
    import shutil

    def _names(b: pd.DataFrame) -> pd.DataFrame:
        # same join the doc stage writes (indexer.go:36-44 parity)
        return pd.DataFrame({"filename": b["repo"] + "/" + b["path"]})

    # pin the update batch once: the names pass AND the add phase's delta
    # build both consume it — re-executing a derived/non-deterministic
    # lineage could desync names from the docs actually added (update
    # batches are small by this function's contract)
    corpus = corpus.materialize()
    names = [
        fn
        for b in corpus.select_columns(["repo", "path"])
            .map_batches(_names, batch_format="pandas")
            .iter_batches(batch_format="pandas")
        for fn in b["filename"]
    ]
    # the intermediate shrunk index lives BESIDE the output (same storage
    # root, so multi-node workers writing/reading it see shared storage, not
    # node-local /tmp) under a DETERMINISTIC name (so resume=True can pick
    # up a finished remove phase instead of redoing it under a fresh
    # random dir); removed only after the add phase succeeds
    if not names:
        # empty update batch → the output IS the input index (a delta build
        # over zero docs has no work to do; copying keeps out_dir's contract)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        shutil.copytree(index_dir, out_dir)
        from ..query import IndexReader

        return IndexReader(out_dir).manifest
    shrunk = os.path.normpath(out_dir) + ".shrunk"
    if not resume and os.path.exists(shrunk):
        shutil.rmtree(shrunk)  # stale intermediate from an older update
    remove_documents(index_dir, shrunk, filenames=names, resume=resume)
    manifest = add_documents(shrunk, corpus, out_dir, id_mode=id_mode, resume=resume)
    shutil.rmtree(shrunk, ignore_errors=True)
    return manifest
