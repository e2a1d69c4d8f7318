"""The index build pipeline — searty's indexer+merger as ONE Ray Data job.

    read corpus → [doc-id assign] → documents/ write (meta + body columns)
                → tokenize+combine (map_batches, zero-copy Arrow)
                → groupby(pgrp = hash(term)×SUB + chunk%SUB) # the one big shuffle
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
import pyarrow.compute  # noqa: F401  (enables pa.compute.*)
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..functions.hashing import partition_group
from ..stages.doc_ids import assign_doc_ids
from ..stages.doc_stage import document_meta_batch
from ..stages.encode_stage import encode_partition
from ..stages.tokenize_stage import TokenizeCombine
from ..state.manifest import (
    Manifest,
    atomic_write_json,
    finished_partitions,
    partition_sidecar_path,
)

# Layout constants are cluster-size-independent ⇒ byte-identical output at any
# parallelism.  num_parts × sub_splits reducer groups; keeping groups ≥ 4× the
# worker count also lets each reducer worker encode several groups and reuse
# its allocator pool (first-touch page faults dominate cold workers on this
# host class: 13.5s cold vs 0.5s warm for an identical partition).
DEFAULT_NUM_PARTS = 32
DEFAULT_SUB_SPLITS = 8  # doc-range sub-reducers per partition (hot-term skew)
TOKENIZE_BATCH_SIZE = 256  # docs per batch; content rows can be MB-scale
#: docs per committed documents range file (see write_documents_resumable)
DOC_WRITE_BATCH = int(os.environ.get("SEARTY_DOC_WRITE_BATCH", "2048"))


def _confirmed_doc_ranges(docs_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Sidecar-confirmed [lo, hi] doc-id ranges already on disk, sorted by
    lo.  Any parquet WITHOUT a sidecar (a crashed, uncommitted write or a
    pre-resumable-format leftover) is deleted so the pass rewrites it;
    any sidecar without its parquet is dropped too."""
    import json

    los: list[int] = []
    his: list[int] = []
    if not os.path.isdir(docs_dir):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    names = set(os.listdir(docs_dir))
    for name in sorted(names):
        if name.startswith(".docs-") and name.endswith(".done.json"):
            if name[1 : -len(".done.json")] + ".parquet" in names:
                with open(os.path.join(docs_dir, name)) as f:
                    sc = json.load(f)
                los.append(int(sc["lo"]))
                his.append(int(sc["hi"]))
            else:
                os.remove(os.path.join(docs_dir, name))
        elif name.endswith((".parquet", ".parquet.tmp")):
            stem = name.split(".parquet")[0]
            if f".{stem}.done.json" not in names:
                os.remove(os.path.join(docs_dir, name))
    order = np.argsort(np.asarray(los, dtype=np.int64))
    return (
        np.asarray(los, dtype=np.int64)[order],
        np.asarray(his, dtype=np.int64)[order],
    )


def write_documents_resumable(corpus: "ray.data.Dataset", docs_dir: str) -> int:
    """Range-committed documents writer — partition-granular resume for the
    pass that was previously all-or-nothing (the north rule's resumable
    checkpoint requirement, applied to the metadata third of build cost).

    Each batch is split at doc-id discontinuities and every CONTIGUOUS run
    becomes one parquet file named by its exact [lo, hi] range, committed
    tmp → rename + a JSON sidecar (lineage: range, rows, bytes).  A file
    therefore contains EVERY id in its range, so on resume "id falls in a
    confirmed range" ⇔ "row already written": batches drop covered rows
    BEFORE the sha256/token-count compute and rewrite only the gaps.
    Requires contiguous-run batches to be non-degenerate — true for
    sort-mode dense ids (each block is a slice of the global order); hash
    ids would fragment into per-row files, so build_index gates this path
    on ``id_mode="sort"``.  Readers are unaffected: gap-fill files whose
    ranges interleave older files' are handled by DocRangeMeta's
    membership filter.  Returns the number of rows written (not skipped)."""
    os.makedirs(docs_dir, exist_ok=True)
    los, his = _confirmed_doc_ranges(docs_dir)

    def write_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(los) and len(ids):
            j = np.searchsorted(los, ids, side="right") - 1
            covered = (j >= 0) & (ids <= his[np.clip(j, 0, None)])
            if covered.any():
                batch = batch.filter(pa.array(~covered))
                ids = ids[~covered]
        if len(ids) == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        meta = document_meta_batch(batch)
        cut = np.flatnonzero(np.diff(ids) != 1) + 1
        starts = np.concatenate(([0], cut))
        ends = np.concatenate((cut, [len(ids)]))
        out_lo, out_hi, out_n = [], [], []
        for s, e in zip(starts, ends):
            lo, hi = int(ids[s]), int(ids[e - 1])
            stem = f"docs-{lo:012d}-{hi:012d}"
            tmp = os.path.join(docs_dir, f".{stem}.parquet.tmp")
            dst = os.path.join(docs_dir, f"{stem}.parquet")
            pq.write_table(meta.slice(s, e - s), tmp, row_group_size=4096)
            os.replace(tmp, dst)
            atomic_write_json(
                os.path.join(docs_dir, f".{stem}.done.json"),
                {"lo": lo, "hi": hi, "rows": int(e - s), "bytes": os.path.getsize(dst)},
            )
            out_lo.append(lo)
            out_hi.append(hi)
            out_n.append(int(e - s))
        return pa.table({"lo": pa.array(out_lo, pa.int64()), "hi": pa.array(out_hi, pa.int64()),
                         "rows": pa.array(out_n, pa.int64())})

    # Explicit batch_size: the writer must NOT run at upstream block
    # granularity — a derive stage emitting 78-row blocks would commit one
    # range FILE per block (measured: 2,560 files for 200k docs), and every
    # downstream pass (docmeta re-read, tokenize scan, query-actor range
    # metadata) then pays one parquet footer per file (a 6.7 s Ray read for
    # a 4-column 200k-row table).  Coalescing to DOC_WRITE_BATCH docs/file
    # keeps resume granularity fine while making the file count
    # ∝ corpus/batch.  Batch bytes ≈ batch × doc size: lower the knob for
    # MB-scale documents (2048 × 100 KB ≈ 200 MB worker-heap worst case).
    summary = corpus.map_batches(
        write_batch, batch_format="pyarrow", batch_size=DOC_WRITE_BATCH
    ).to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def pick_chunk_span(n_docs: int) -> int:
    """Power-of-two doc-range chunk size ≈ n_docs/64, floor 1024: hot terms
    split into ~64 chunks (≥ sub_splits) regardless of corpus size."""
    span = 1024
    while span * 64 < max(n_docs, 1):
        span *= 2
    return span


def build_index(
    corpus: ray.data.Dataset,
    index_dir: str,
    *,
    num_parts: int = DEFAULT_NUM_PARTS,
    sub_splits: int = DEFAULT_SUB_SPLITS,
    chunk_span: int | None = None,
    resume: bool = False,
    id_mode: str = "sort",
    extract_symbols: bool = True,
    tokenizer: str = "trigram",  # "trigram" | "trigram+symbols" (registry, SURVEY.md §2.10)
    salt: int = 0,  # >1 enables the two-phase salted merge (SURVEY.md §2.5 A2)
) -> Manifest:
    t0 = time.monotonic()
    _prepare_dirs(index_dir, resume)
    corpus = assign_doc_ids(corpus, mode=id_mode)

    # Completion markers gate each metadata stage on resume: a non-empty
    # directory can be a crashed PARTIAL write — trusting it would commit a
    # truncated index (wrong n_docs/avgdl, missing postings).  Segments have
    # their own per-partition sidecars; these passes get one marker each.
    def _marker(name: str) -> str:
        return os.path.join(index_dir, f".{name}.done")

    def _stage_done(name: str) -> bool:
        return resume and os.path.exists(_marker(name))

    def _mark_done(name: str) -> None:
        with open(_marker(name), "w") as f:
            f.write("ok\n")

    def _clear_dir(d: str) -> None:
        if os.path.isdir(d):
            for f in os.listdir(d):
                os.remove(os.path.join(d, f))

    # ---- documents + content sidecar (streaming writes) ----
    docs_dir = os.path.join(index_dir, "documents")
    if not _stage_done("documents"):
        if id_mode == "sort":
            # range-committed writes: a crashed run resumes by rewriting
            # only the uncovered doc ranges (sidecar-confirmed files skip)
            if not resume:
                _clear_dir(docs_dir)
            write_documents_resumable(corpus, docs_dir)
        else:
            # hash ids are non-contiguous — range files would degenerate
            # to one per row; the pass stays all-or-nothing
            _clear_dir(docs_dir)
            corpus.map_batches(document_meta_batch, batch_format="pyarrow").write_parquet(docs_dir)
        _mark_done("documents")
    t_docwrite = time.monotonic()

    # ---- symbols pass CONCURRENT with docmeta+stats ----
    # Both only read the just-written documents table, so the definitions
    # extraction runs in a sidecar thread while the main thread writes the
    # docmeta sidecar and scans stats — the phases were strictly sequential
    # before, a pure serial-fraction tax on multi-core scaling (two
    # concurrent Dataset executions share the streaming executor's CPU
    # budget; each is small).
    sym_err: list[BaseException] = []

    do_symbols = extract_symbols and not _stage_done("symbols")
    # word-INDEXED builds also get the term dictionary sidecar (worddict/):
    # the segments store symbol terms as irreversible #sym:<hash>
    # placeholders, so prefix/wildcard search needs the string→key map
    # (stages/worddict.py).  Trigram-only builds skip it (nothing enumerable).
    do_worddict = "symbols" in tokenizer and not _stage_done("worddict")

    def _symbols_pass() -> None:
        try:
            sym_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
            if do_symbols:
                from .symbols import build_symbols_from_corpus

                _clear_dir(os.path.join(index_dir, "symbols"))
                build_symbols_from_corpus(
                    ray.data.read_parquet(
                        docs_dir, columns=["doc_id", "content"], override_num_blocks=sym_blocks
                    ),
                    index_dir,
                )
                _mark_done("symbols")
            if do_worddict:
                from ..stages.worddict import write_word_dictionary

                wd_dir = os.path.join(index_dir, "worddict")
                _clear_dir(wd_dir)
                write_word_dictionary(
                    ray.data.read_parquet(
                        docs_dir, columns=["doc_id", "content"], override_num_blocks=sym_blocks
                    ),
                    index_dir,
                )
                _mark_done("worddict")
        except BaseException as e:  # re-raised on join
            sym_err.append(e)

    sym_thread = None
    if do_symbols or do_worddict:
        import threading

        _pin_fsspec_http_probe()
        sym_thread = threading.Thread(target=_symbols_pass, name="symbols-pass")
        sym_thread.start()

    # ---- doc-metadata sidecar: (doc_id, filename, n_tokens, n_sym_tokens) ----
    # Query actors load norms + doc_id→filename at init; reading them from
    # the full documents files decodes past the content column's pages.  A
    # dedicated narrow sidecar makes actor init a ~MB-scale read.
    meta_dir = os.path.join(index_dir, "docmeta")
    if not _stage_done("docmeta"):
        _clear_dir(meta_dir)
        ray.data.read_parquet(
            docs_dir, columns=["doc_id", "filename", "n_tokens", "n_sym_tokens"]
        ).write_parquet(meta_dir)
        _mark_done("docmeta")

    # ---- global stats over the narrow docmeta sidecar ----
    # Below ~50M rows a local columnar scan of the three int64 columns beats
    # the Ray aggregate's fixed pipeline cost by seconds; above it (real
    # scale) the distributed aggregate amortizes and is required.
    meta_rows = sum(
        pq.read_metadata(os.path.join(meta_dir, f)).num_rows
        for f in os.listdir(meta_dir)
        if f.endswith(".parquet")
    )
    if meta_rows < 50_000_000:
        t = pq.read_table(meta_dir, columns=["doc_id", "n_tokens", "n_sym_tokens"])
        n_docs = t.num_rows
        total_tokens = int(pa.compute.sum(t["n_tokens"]).as_py() or 0)
        total_sym_tokens = int(pa.compute.sum(t["n_sym_tokens"]).as_py() or 0)
        max_doc_id = int(pa.compute.max(t["doc_id"]).as_py()) if n_docs else -1
    else:
        stats = (
            ray.data.read_parquet(meta_dir, columns=["doc_id", "n_tokens", "n_sym_tokens"])
            .aggregate(Sum("n_tokens"), Sum("n_sym_tokens"), Count(), Max("doc_id"))
        )
        n_docs = int(stats["count()"])
        total_tokens = int(stats["sum(n_tokens)"] or 0)
        total_sym_tokens = int(stats["sum(n_sym_tokens)"] or 0)
        max_doc_id = int(stats["max(doc_id)"]) if n_docs else -1
    if sym_thread is not None:
        sym_thread.join()
        if sym_err:
            raise sym_err[0]
    t_docs = time.monotonic()
    avgdl = total_tokens / n_docs if n_docs else 0.0
    avg_sym_dl = total_sym_tokens / n_docs if n_docs else 0.0
    if chunk_span is None:
        chunk_span = pick_chunk_span(max_doc_id + 1)

    # ---- postings: tokenize → shuffle → encode+write per reducer group ----
    finished = finished_partitions(index_dir) if resume else set()

    # tokenize reads BACK the written documents table (doc_id + content
    # pages only): the corpus derivation/sort runs once, and the postings
    # pass splits across the documents part files regardless of how
    # splittable the original source was.  Explicit block count: the default
    # 128MB-target read coalesces small part files into ~2 tasks and
    # strangles the map side of the shuffle.
    reader_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 4)
    runs = ray.data.read_parquet(
        docs_dir, columns=["doc_id", "content"], override_num_blocks=reader_blocks
    ).map_batches(
        TokenizeCombine(chunk_span, emit_symbols=tokenizer == "trigram+symbols"),
        batch_format="pyarrow",
        batch_size=TOKENIZE_BATCH_SIZE,
    )

    if salt > 1:
        # Two-phase salted merge (SURVEY.md §2.5 A2; the pathological
        # one-term-one-chunk case): phase 1 spreads a (term, chunk)'s MANY
        # small runs across `salt` reducers keyed by a content hash of each
        # run's first doc id, each combining its share into ONE partial run;
        # phase 2 (the unchanged encode) k-way-merges the ≤ salt combined
        # runs.  Output bytes are identical to the unsalted build (the
        # encode is a pure function of the entry multiset; pinned by pytest).
        from ..stages.encode_stage import combine_runs

        def add_sgrp(batch: pa.Table) -> pa.Table:
            from ..functions.hashing import mix64

            pgrp = partition_group(
                batch["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64),
                batch["chunk"].to_numpy(zero_copy_only=False),
                num_parts,
                sub_splits,
            ).astype(np.int64)
            first = _first_varints(batch.column("doc_blob").combine_chunks())
            s = (mix64(first) % np.uint64(salt)).astype(np.int64)
            return batch.append_column(
                "sgrp", pa.array((pgrp * salt + s).astype(np.int32), type=pa.int32())
            )

        runs = (
            runs.map_batches(add_sgrp, batch_format="pyarrow")
            .groupby("sgrp")
            .map_groups(
                lambda g: combine_runs(g.drop_columns(["sgrp"])), batch_format="pyarrow"
            )
        )

    summaries = shuffle_encode_runs(
        runs, index_dir, avgdl, chunk_span, num_parts, sub_splits, finished
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
            "doc_write_s": round(t_docwrite - t0, 3),
            "meta_stats_s": round(t_docs - t_docwrite, 3),  # symbols ∥ docmeta+stats
            "postings_stage_s": round(t_end - t_docs, 3),
            "total_s": round(t_end - t0, 3),
        },
    )
    manifest.save(index_dir)
    return manifest


def shuffle_encode_runs(
    runs: "ray.data.Dataset",
    index_dir: str,
    avgdl: float,
    chunk_span: int,
    num_parts: int,
    sub_splits: int,
    finished: set[int] | None = None,
) -> list[dict]:
    """The shared back half of every index-producing pipeline: run-schema
    rows → pgrp shuffle → vectorized partition encode → atomic writes +
    sidecars.  Used by :func:`build_index` (runs from the tokenizer) and
    :func:`searty_ray.pipelines.merge.merge_indexes` (runs re-derived from
    existing segments)."""
    finished = finished or set()
    seg_root = os.path.join(index_dir, "segments")

    def add_pgrp(batch: pa.Table) -> pa.Table:
        pgrp = partition_group(
            batch["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64),
            batch["chunk"].to_numpy(zero_copy_only=False),
            num_parts,
            sub_splits,
        )
        return batch.append_column("pgrp", pa.array(pgrp, type=pa.int32()))

    def encode_and_write(group: pa.Table) -> pa.Table:
        pgrp = int(group["pgrp"][0].as_py())
        if pgrp in finished:
            # report the REAL lineage from the finished partition's sidecar,
            # so a resumed build's manifest matches a clean build's
            import json

            try:
                with open(partition_sidecar_path(index_dir, pgrp)) as f:
                    sc = json.load(f)
                return _summary(
                    pgrp, sc["segments"], sc["rows"], sc["bytes"], sc["wall_s"], skipped=True
                )
            except (OSError, KeyError, ValueError):
                return _summary(pgrp, 0, 0, 0, 0.0, skipped=True)
        part, cg = divmod(pgrp, sub_splits)
        g0 = time.monotonic()
        seg = encode_partition(group.drop_columns(["pgrp"]), avgdl, chunk_span, part)
        part_dir = os.path.join(seg_root, f"part={part:05d}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".cg-{cg:03d}.parquet.tmp")
        out = os.path.join(part_dir, f"cg-{cg:03d}.parquet")
        # the hive dir name (part=NNNNN) carries the partition id; storing the
        # column too would clash with partition inference on read
        pq.write_table(
            seg.drop_columns(["part"]),
            tmp,
            row_group_size=4096,
            # blobs are already varbyte-compressed — snappy re-compression
            # costs CPU per reducer for ~no size win
            compression={"meta_blob": "NONE", "pos_len_blob": "NONE", "pos_blob": "NONE"},
        )
        os.replace(tmp, out)
        wall = time.monotonic() - g0
        nbytes = os.path.getsize(out)
        atomic_write_json(
            partition_sidecar_path(index_dir, pgrp),
            {
                "pgrp": pgrp,
                "part": part,
                "chunk_group": cg,
                "segments": len(seg),
                "rows": int(group.num_rows),
                "bytes": nbytes,
                "wall_s": round(wall, 4),
                "file": out,
            },
        )
        return _summary(pgrp, len(seg), int(group.num_rows), nbytes, wall)

    # The groupby sort is a barrier anyway; materializing the runs first
    # keeps the upstream map stage at full parallelism (the streaming
    # executor throttles an AllToAll's upstream maps to a fraction of the
    # CPU slots).  Re-measured on Ray 2.49.2 (2026-08-17): NEUTRAL at 32
    # cpus (10.7s vs 10.7s) but still +20-25% at a 2-cpu pin — the
    # throttling persists at low parallelism, so the materialize stays.
    # The materialized runs are the compressed shuffle rows (~4 B/entry),
    # and the object store spills them if they exceed memory — same cost
    # the sort would pay internally.  SEARTY_NO_MATERIALIZE=1 is the A/B
    # knob for re-evaluating per Ray release.
    runs = runs.map_batches(add_pgrp, batch_format="pyarrow")
    if not os.environ.get("SEARTY_NO_MATERIALIZE"):
        runs = runs.materialize()
    return (
        runs.groupby("pgrp").map_groups(encode_and_write, batch_format="pyarrow").take_all()
    )  # ≤ num_parts × sub_splits tiny rows


def _first_varints(col: pa.Array) -> np.ndarray:
    """First varint value of each binary blob (vectorized masked passes) —
    for doc_blob runs this is the run's absolute first doc id."""
    from ..stages.encode_stage import _binary_offsets, _binary_values

    off = _binary_offsets(col)
    buf = np.frombuffer(_binary_values(col), dtype=np.uint8)
    n = len(col)
    vals = np.zeros(n, dtype=np.uint64)
    done = off[1:] == off[:-1]  # empty blobs stay 0
    starts = off[:-1].copy()
    for k in range(10):
        act = ~done
        if not act.any():
            break
        b = buf[starts[act] + k]
        vals[act] = (vals[act] << np.uint64(7)) | (b.astype(np.uint64) & np.uint64(0x7F))
        fin = (b & 0x80) == 0
        idx = np.nonzero(act)[0]
        done[idx[fin]] = True
    return vals


def _pin_fsspec_http_probe() -> None:
    """Make Ray's lazy ``fsspec.implementations.http`` probe race-safe.

    ``read_parquet``/``write_parquet`` probe that import per call; with
    aiohttp absent it FAILS each time, and a failed import retries on every
    attempt — so two driver threads executing datasets concurrently can race
    the half-initialized module and surface a spurious plain ``ImportError``
    that Ray's ``except ModuleNotFoundError`` does not catch.  Installing a
    sentinel module makes the import succeed permanently; Ray only uses the
    class in ``isinstance`` checks, and nothing is an instance of the
    sentinel, so ``_is_http_filesystem`` still returns False — identical
    behavior, no race."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _prepare_dirs(index_dir: str, resume: bool) -> None:
    if not resume and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    for sub in ("documents", "docmeta", "segments", "manifest", "symbols"):
        os.makedirs(os.path.join(index_dir, sub), exist_ok=True)


def _summary(pgrp: int, segments: int, rows: int, nbytes: int, wall: float, skipped: bool = False) -> pa.Table:
    return pa.table(
        {
            "pgrp": pa.array([pgrp], type=pa.int32()),
            "segments": pa.array([segments], type=pa.int64()),
            "rows": pa.array([rows], type=pa.int64()),
            "bytes": pa.array([nbytes], type=pa.int64()),
            "wall_s": pa.array([wall], type=pa.float64()),
            "skipped": pa.array([skipped]),
        }
    )
