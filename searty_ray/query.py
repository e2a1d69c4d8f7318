"""Query engine: segment reader + phrase / BM25 / symbol / file searchers.

Replaces searty's SQLite query path (/root/reference/cmd/searty/searty.go:28-75,
lib/searcher/*.go) with selective Parquet reads over the partitioned segment
layout.  A term's partitions are *computed* (hash of (term, chunk)), so a
lookup touches only the files that can contain it; inside a file, row-group
statistics on the sorted ``term_key`` column prune reads further.

``QueryEngine`` is the actor-pool entry point: construct once per actor
(manifest + norms + LRU posting cache), call per query batch (SURVEY.md
§2.3 ST6).
"""

from __future__ import annotations

import os
import re
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .functions import bm25
from .functions.codec import decode_pos_blob, varint_decode
from .stages.encode_stage import _binary_offsets, _binary_values
from .functions.hashing import term_part
from .functions.regexplan import group_neutral, literal_alternatives
from .functions.tokenize import codepoints, pack_trigrams, tokenize_query
from .functions.wand import TermCursor, wand_topk
from .oracle.oracle import parse_symbol
from .state.manifest import Manifest


@dataclass
class TermPostings:
    """Fully merged postings of one term across chunks (ascending doc_id).

    Positions are decoded LAZILY from the stored varbyte blobs — ranked
    (BM25) queries only touch doc_ids/tfs, so they never pay the position
    decode; the phrase path triggers it on first access."""

    df: int
    cf: int
    doc_ids: np.ndarray
    tfs: np.ndarray
    block_last_doc: np.ndarray
    block_core: np.ndarray
    pos_blob: np.ndarray | None = None  # concatenated varbyte stream (uint8)
    pos_lens: np.ndarray | None = None  # per-doc byte lengths within pos_blob

    _positions: np.ndarray | None = None
    # lazy BM25 contribution vector idf·tf_norm(tfs, dl) — term+corpus
    # constants only, so it's reusable across queries (set by the dense
    # ranked path; dies with the cache entry)
    _contrib: np.ndarray | None = None

    @property
    def positions(self) -> np.ndarray:
        """Flattened per-doc positions (lengths = tfs); decoded on demand.
        Chunk streams concatenate cleanly: position gaps reset per doc and
        ``tfs`` carries every doc boundary."""
        if self._positions is None:
            if self.pos_blob is None:
                if self.cf > 0:
                    # position-free entry (need_positions=False read) — a
                    # silent empty here would corrupt phrase results; the
                    # caller must re-lookup with need_positions=True
                    raise RuntimeError(
                        "TermPostings was read position-free; re-lookup with need_positions=True"
                    )
                self._positions = np.empty(0, dtype=np.int32)
            elif len(self.pos_blob) == 0:
                self._positions = np.empty(0, dtype=np.int32)
            else:
                self._positions = decode_pos_blob(self.pos_blob, self.tfs)
        return self._positions

    def positions_for(self, idx: np.ndarray) -> np.ndarray:
        """Positions of the docs at ``idx`` (indices into ``doc_ids``),
        concatenated in idx order — decoding ONLY those docs' byte slices
        (the per-doc byte lengths make the sub-stream addressable).  Falls
        back to slicing the cached full decode when available, and decodes
        everything once if the subset is most of the list anyway."""
        tf_sel = self.tfs[idx].astype(np.int64)
        if self._positions is None and (
            self.pos_lens is None or len(idx) * 2 >= len(self.doc_ids)
        ):
            _ = self.positions  # full decode (cached)
        if self._positions is not None:
            starts = (np.cumsum(self.tfs, dtype=np.int64) - self.tfs)[idx]
            return self._positions[_expand_ranges(starts, tf_sel)]
        byte_off = np.cumsum(self.pos_lens, dtype=np.int64) - self.pos_lens
        b_starts = byte_off[idx]
        b_lens = self.pos_lens[idx].astype(np.int64)
        sub = self.pos_blob[_expand_ranges(b_starts, b_lens)]
        return decode_pos_blob(sub, tf_sel)


@dataclass
class RankedMeta:
    """Per-chunk ranked metadata of one term — block maxima only, no
    posting bytes.  Feeds the pruned BM25 path's chunk selection."""

    df: int  # total document frequency (Σ chunk_df)
    cf: int  # total collection frequency (for cache promotion)
    chunks: np.ndarray  # chunk ids, ascending
    chunk_df: np.ndarray  # postings per chunk
    chunk_ub_core: np.ndarray  # per-chunk max idf-free score core (upper bound)


def _expand_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """[s0..s0+l0) ++ [s1..s1+l1) ++ … as one index array (no Python loop)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens) + np.repeat(starts, lens)


class DocRangeMeta:
    """Doc-range-sharded docmeta lookups: the 10^12-doc query-actor state.

    The ``docmeta`` sidecar is written from doc-id-sorted blocks, so each
    parquet row group covers a contiguous-ish doc range.  This store reads
    ONLY row-group STATISTICS up front (an O(#row-groups) range index, no
    data pages), then resolves the row groups a lookup's doc ids actually
    hit, keeping at most ``cap`` row groups resident (LRU).  A query actor
    therefore holds O(ranges touched × row-group size) of norms/filenames,
    never the whole corpus."""

    def __init__(self, meta_dir: str, cap: int = 64, columns: list[str] | None = None):
        self.meta_dir = meta_dir
        self.cap = cap
        self.columns = columns  # row-group read projection (None = all)
        self._index: list[tuple[int, int, str, int]] | None = None  # (min,max,file,rg)
        self._mins: np.ndarray | None = None
        self._maxs: np.ndarray | None = None
        self._cache: OrderedDict[tuple[str, int], pa.Table] = OrderedDict()
        # instrumentation: bounded SAMPLE of resolved row groups + a total
        # counter (an unbounded set would leak in long-lived query actors)
        self.resolved: set[tuple[str, int]] = set()
        self.n_resolved = 0

    _RESOLVED_SAMPLE_CAP = 4096

    def _range_index(self) -> list[tuple[int, int, str, int]]:
        if self._index is None:
            idx = []
            for name in sorted(os.listdir(self.meta_dir)):
                if not name.endswith(".parquet"):
                    continue
                path = os.path.join(self.meta_dir, name)
                pf = pq.ParquetFile(path)
                ci = pf.schema_arrow.get_field_index("doc_id")
                for rg in range(pf.metadata.num_row_groups):
                    st = pf.metadata.row_group(rg).column(ci).statistics
                    idx.append((int(st.min), int(st.max), path, rg))
            self._index = sorted(idx)
            self._mins = np.array([r[0] for r in self._index], dtype=np.int64)
            self._maxs = np.array([r[1] for r in self._index], dtype=np.int64)
        return self._index

    def _resolve(self, path: str, rg: int) -> pa.Table:
        key = (path, rg)
        t = self._cache.get(key)
        if t is None:
            t = pq.ParquetFile(path).read_row_group(rg, columns=self.columns)
            self._cache[key] = t
            self.n_resolved += 1
            if len(self.resolved) < self._RESOLVED_SAMPLE_CAP:
                self.resolved.add(key)
            while len(self._cache) > self.cap:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(key)
        return t

    def gather(self, doc_ids: np.ndarray, columns: list[str]) -> pa.Table:
        """Rows for ``doc_ids`` (order-aligned, duplicates preserved).

        Per-call residency is bounded by the OUTPUT size, not the row
        groups touched: each hit group contributes only its requested rows
        (a take), so a corpus-spanning request holds ~len(doc_ids) rows,
        never every hit group whole.  (The LRU cache separately bounds the
        resident raw groups at ``cap``.)"""
        index = self._range_index()
        if not index:
            raise KeyError("docmeta has no row groups")
        uniq = np.unique(np.asarray(doc_ids, dtype=np.int64))
        if len(uniq) == 0:
            # schema-correct empty result (zero-row slice of any group)
            first = index[0]
            return self._resolve(first[2], first[3]).slice(0, 0).select(["doc_id", *columns])
        # row groups whose [min, max] contains any requested id
        lo = np.searchsorted(uniq, self._mins, side="left")
        hi = np.searchsorted(uniq, self._maxs, side="right")
        hit = hi > lo
        parts = []
        for i in np.flatnonzero(hit):
            g = self._resolve(index[i][2], index[i][3])
            g_ids = g["doc_id"].to_numpy()
            p = np.minimum(np.searchsorted(uniq, g_ids), len(uniq) - 1)
            m = uniq[p] == g_ids
            if m.any():
                parts.append(
                    g.select(["doc_id", *columns]).take(
                        pa.array(np.flatnonzero(m), type=pa.int64())
                    )
                )
        if not parts:
            raise KeyError("doc ids outside every docmeta row-group range")
        tbl = pa.concat_tables(parts)
        ids = tbl["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], np.asarray(doc_ids, dtype=np.int64))
        sel = order[np.minimum(pos, len(order) - 1)]
        if not (ids[sel] == np.asarray(doc_ids)).all():
            raise KeyError("doc id missing from docmeta")
        return tbl.take(pa.array(sel, type=pa.int64()))


class IndexReader:
    """Read-side view of one index directory (manifest + lazy doc metadata).

    ``sharded_meta``: None = auto (doc-range-sharded docmeta lookups above
    ``SHARDED_META_MIN_DOCS`` docs, whole-corpus per-actor arrays below —
    the small-corpus arrays are faster and fit trivially); True/False
    forces the mode."""

    SHARDED_META_MIN_DOCS = 5_000_000

    def __init__(
        self, index_dir: str, cache_terms: int = 4096, sharded_meta: bool | None = None
    ):
        self.index_dir = index_dir
        self.manifest = Manifest.load(index_dir)
        self.seg_root = os.path.join(index_dir, "segments")
        self._norm_ids: np.ndarray | None = None
        self._norm_len: np.ndarray | None = None
        self._meta_ids: np.ndarray | None = None
        self._meta_filenames: np.ndarray | None = None
        self._cache: OrderedDict[int, TermPostings | None] = OrderedDict()
        self._rmeta_cache: OrderedDict[int, RankedMeta | None] = OrderedDict()
        self._chunk_cache: OrderedDict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self._cache_cap = cache_terms
        self._part_ds: dict[int, object] = {}  # partition → pads.dataset handle
        self._content_store: DocRangeMeta | None = None
        self._pool: ThreadPoolExecutor | None = None
        self._sidecar_lock = threading.Lock()
        if sharded_meta is None:
            sharded_meta = self.manifest.n_docs > self.SHARDED_META_MIN_DOCS
        meta_dir = os.path.join(index_dir, "docmeta")
        self.range_meta = (
            DocRangeMeta(meta_dir)
            if sharded_meta and os.path.isdir(meta_dir) and os.listdir(meta_dir)
            else None
        )

    # -- shared read pool ---------------------------------------------------

    @property
    def pool(self) -> ThreadPoolExecutor:
        """Persistent per-reader thread pool for parquet reads + decode.

        Spawning a fresh executor per lookup cost ~80 ms on the cold query
        path (thread start + teardown, measured); one pool amortizes it
        across the reader's lifetime (per query actor)."""
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=8, thread_name_prefix="ixread")
        return self._pool

    def prefetch_sidecars(self, norms: bool = False, meta: bool = False) -> None:
        """Kick doc-norm / filename sidecar loads onto the reader pool so
        they overlap the posting-list partition reads of a cold query
        (sequentially they add ~75 ms each at 600k docs).  No-ops when the
        sidecar is already resident or served shard-wise (range_meta)."""
        if norms and self.range_meta is None and self._norm_ids is None:
            self.pool.submit(self._load_norms)
        if meta and self.range_meta is None and self._meta_ids is None:
            self.pool.submit(self._load_meta)

    # -- documents ----------------------------------------------------------

    _META_COLS = frozenset({"doc_id", "filename", "n_tokens", "n_sym_tokens"})

    def documents(self, columns: list[str] | None = None) -> pa.Table:
        """Doc metadata; narrow projections are served from the ``docmeta``
        sidecar (no content pages touched), full reads from ``documents``."""
        meta_dir = os.path.join(self.index_dir, "docmeta")
        if columns and set(columns) <= self._META_COLS and os.path.isdir(meta_dir) and os.listdir(meta_dir):
            return pq.read_table(meta_dir, columns=columns)
        return pq.read_table(os.path.join(self.index_dir, "documents"), columns=columns)

    def _load_norms(self) -> None:
        if self._norm_ids is None:
            with self._sidecar_lock:
                if self._norm_ids is not None:
                    return
                t = self.documents(["doc_id", "n_tokens"])
                ids = t["doc_id"].to_numpy()
                order = np.argsort(ids)
                self._norm_len = t["n_tokens"].to_numpy()[order]
                self._norm_ids = ids[order]  # publish last (readers gate on it)

    def doc_len(self, doc_ids: np.ndarray) -> np.ndarray:
        """Norms lookup (BM25 |D|).  Whole-corpus per-actor arrays at small
        scale; doc-range-sharded row-group reads (``range_meta``) above
        SHARDED_META_MIN_DOCS."""
        if self.range_meta is not None:
            return self.range_meta.gather(doc_ids, ["n_tokens"])["n_tokens"].to_numpy()
        self._load_norms()
        idx = np.searchsorted(self._norm_ids, doc_ids)
        return self._norm_len[idx]

    def sym_doc_len(self, doc_ids: np.ndarray) -> np.ndarray:
        """Symbol-token norms (BM25 |D| for the symbol-term index)."""
        if self.range_meta is not None:
            return self.range_meta.gather(doc_ids, ["n_sym_tokens"])["n_sym_tokens"].to_numpy()
        if getattr(self, "_sym_norm_len", None) is None:
            t = self.documents(["doc_id", "n_sym_tokens"])
            ids = t["doc_id"].to_numpy()
            order = np.argsort(ids)
            self._sym_norm_ids = ids[order]
            self._sym_norm_len = t["n_sym_tokens"].to_numpy()[order]
        idx = np.searchsorted(self._sym_norm_ids, doc_ids)
        return self._sym_norm_len[idx]

    def _load_meta(self) -> None:
        if self._meta_ids is None:
            with self._sidecar_lock:
                if self._meta_ids is not None:
                    return
                t = self.documents(["doc_id", "filename"])
                ids = t["doc_id"].to_numpy()
                order = np.argsort(ids)
                # stays an Arrow array: no per-string Python materialization
                self._meta_filenames = t["filename"].combine_chunks().take(
                    pa.array(order, type=pa.int64())
                )
                self._meta_ids = ids[order]  # publish last (readers gate on it)

    def resolve_docs(self, doc_ids: np.ndarray, columns: list[str]) -> pa.Table:
        """Selective metadata fetch for result docs (J1 broadcast-side join).

        Cached doc_id→filename arrays per reader (the per-actor broadcast
        side); at 10^12 docs this becomes a doc-range-sharded selective
        parquet read like :meth:`content_for`."""
        if columns == ["filename"]:
            uniq = np.unique(doc_ids)
            if self.range_meta is not None:
                t = self.range_meta.gather(uniq, ["filename"])
                return pa.table(
                    {
                        "doc_id": pa.array(uniq, type=pa.int64()),
                        "filename": t["filename"],
                    }
                )
            self._load_meta()
            idx = np.searchsorted(self._meta_ids, uniq)
            return pa.table(
                {
                    "doc_id": pa.array(uniq, type=pa.int64()),
                    "filename": self._meta_filenames.take(pa.array(idx, type=pa.int64())),
                }
            )
        t = self.documents(["doc_id", *columns])
        mask = pc.is_in(t["doc_id"], value_set=pa.array(np.unique(doc_ids), type=pa.int64()))
        return t.filter(mask)

    def content_for(self, doc_ids: np.ndarray) -> dict[int, str]:
        """Body fetch from the content sidecar (J2 semi-join by doc_id).

        Served through the same row-group range index as :class:`DocRangeMeta`
        — a pyarrow ``isin`` dataset filter decodes EVERY content page (3.3 s
        for 5 docs at 600k, measured), while range-pruned row-group reads
        touch only the groups the ids hit (LRU-capped at 8 resident groups —
        content groups are big)."""
        if self._content_store is None:
            self._content_store = DocRangeMeta(
                os.path.join(self.index_dir, "documents"),
                cap=8,
                columns=["doc_id", "content"],
            )
        uniq = np.unique(np.asarray(doc_ids, dtype=np.int64))
        t = self._content_store.gather(uniq, ["content"])
        return dict(zip(uniq.tolist(), t["content"].to_pylist()))

    # -- postings -----------------------------------------------------------

    def prewarm_hot_terms(self, top_n: int = 32) -> int:
        """Pre-decode the ``top_n`` highest-df terms into the LRU cache.

        One thin columnar scan of (term_key, df) across the segment files
        picks the heads of the df distribution — exactly the lists whose
        first-decode cost otherwise lands on an unlucky query's tail
        latency.  Runs at actor construction; returns #terms warmed."""
        try:
            t = pq.read_table(self.seg_root, columns=["term_key", "df"])
        except Exception:
            return 0
        if t.num_rows == 0:
            return 0
        tk = t["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(tk)
        tk_s, df_s = tk[order], df[order]
        new_t = np.empty(len(tk_s), dtype=bool)
        new_t[0] = True
        new_t[1:] = tk_s[1:] != tk_s[:-1]
        starts = np.nonzero(new_t)[0]
        totals = np.add.reduceat(df_s, starts)
        uniq = tk_s[starts]
        top = uniq[np.argsort(-totals)[: min(top_n, len(uniq))]]
        self.lookup(top)
        return len(top)

    def lookup(
        self, term_keys: np.ndarray, need_positions: bool = True
    ) -> dict[int, TermPostings | None]:
        """Posting lists for the given packed term keys (None = absent).

        Batches the parquet reads per partition file, merges chunks in chunk
        order (doc-disjoint by construction), caches per-term results (LRU).

        ``need_positions=False`` (ranked queries) skips the ``pos_blob`` /
        ``pos_len_blob`` columns entirely — for hot terms the position bytes
        are the dominant read volume (≈ 1.2 B × cf, tens of MB per df≈N term
        at corpus scale) and BM25 never touches them.  A cached position-free
        entry is upgraded (re-read in full) the first time a phrase query
        needs it.
        """
        out: dict[int, TermPostings | None] = {}
        missing: list[int] = []
        for key in (int(k) for k in term_keys):
            if key in self._cache and not (
                need_positions
                and self._cache[key] is not None
                and self._cache[key].pos_blob is None
            ):
                self._cache.move_to_end(key)
                out[key] = self._cache[key]
            else:
                missing.append(key)
        if not missing:
            return out

        m = self.manifest
        by_part: dict[int, set[int]] = {}
        for key in missing:
            p = term_part(np.uint64(key), m.num_parts)
            by_part.setdefault(int(p), set()).add(key)

        cols = ["term_key", "chunk", "df", "cf", "meta_blob", "block_last_doc", "block_max_score"]
        if need_positions:
            cols[5:5] = ["pos_len_blob", "pos_blob"]

        def read_part(item: tuple[int, set[int]]) -> pa.Table | None:
            part, keys = item
            # cache the pads.dataset handle per partition: its construction
            # (dir listing + parquet footer parse) is ~40% of a pruned read
            # (~0.9 ms/partition measured), repaid on every later cold term
            # that hashes into the same partition.  dict ops are atomic
            # under the GIL; a rare race just constructs the handle twice.
            ds = self._part_ds.get(part)
            if ds is None:
                part_dir = os.path.join(self.seg_root, f"part={part:05d}")
                if not os.path.isdir(part_dir):
                    return None
                ds = self._part_ds[part] = pads.dataset(part_dir)
            # one batched read across the partition's chunk-group files —
            # row-group statistics on the sorted term_key column prune I/O.
            # block_max_tf stays on disk: the query path scores with
            # block_max_score; don't decode pages nobody reads
            t = ds.to_table(
                filter=pads.field("term_key").isin([np.uint64(k) for k in keys]),
                columns=cols,
            ).combine_chunks()
            return t if len(t) else None

        def read_and_decode(item: tuple[int, set[int]]) -> dict[int, TermPostings]:
            t = read_part(item)
            return self._decode_partition(t, with_positions=need_positions) if t is not None else {}

        found: dict[int, TermPostings] = {}
        items = sorted(by_part.items())
        if len(items) > 1:
            # parquet reads AND the vectorized decode release the GIL:
            # each partition reads+decodes in its own thread (shared reader
            # pool — no per-lookup executor spin-up), so decode of early
            # partitions overlaps I/O of later ones
            for d in self.pool.map(read_and_decode, items):
                found.update(d)
        else:
            found.update(read_and_decode(items[0]))

        for key in missing:
            out[key] = tp = found.get(key)
            self._cache[key] = tp
            if len(self._cache) > self._cache_cap:
                self._cache.popitem(last=False)
        return out

    def has_cached_postings(self, key: int) -> bool:
        """True when the term's postings are already decoded in the LRU
        (doc_ids/tfs resident — positions optional)."""
        tp = self._cache.get(int(key))
        return tp is not None

    def lookup_ranked_meta(self, term_keys: np.ndarray) -> dict[int, "RankedMeta | None"]:
        """Per-chunk ranked METADATA for the given terms — no posting bytes.

        Reads only (term_key, chunk, df, block_max_score): for a hot term
        this is O(df / BLOCK_SIZE) floats instead of O(df) varint bytes, so
        the pruned ranked path can pick candidate chunks before any posting
        decode.  Cached per reader (tiny rows)."""
        out: dict[int, RankedMeta | None] = {}
        missing: list[int] = []
        for key in (int(k) for k in term_keys):
            if key in self._rmeta_cache:
                self._rmeta_cache.move_to_end(key)
                out[key] = self._rmeta_cache[key]
            else:
                missing.append(key)
        if not missing:
            return out
        m = self.manifest
        by_part: dict[int, set[int]] = {}
        for key in missing:
            p = term_part(np.uint64(key), m.num_parts)
            by_part.setdefault(int(p), set()).add(key)

        def read_meta(item: tuple[int, set[int]]) -> dict[int, RankedMeta]:
            part, keys = item
            ds = self._part_ds.get(part)
            if ds is None:
                part_dir = os.path.join(self.seg_root, f"part={part:05d}")
                if not os.path.isdir(part_dir):
                    return {}
                ds = self._part_ds[part] = pads.dataset(part_dir)
            t = ds.to_table(
                filter=pads.field("term_key").isin([np.uint64(k) for k in keys]),
                columns=["term_key", "chunk", "df", "cf", "block_max_score"],
            ).combine_chunks()
            if len(t) == 0:
                return {}
            tk = t["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            chunk = t["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
            df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            cf = t["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
            bc = t.column("block_max_score").chunk(0)
            bc_off = np.asarray(bc.offsets)
            bc_vals = bc.values.to_numpy(zero_copy_only=False).astype(np.float64)
            # per-row max core (rows are (term, chunk) — one reduceat over
            # the flat block values; empty rows impossible: df ≥ 1 per row)
            row_max = np.maximum.reduceat(bc_vals, bc_off[:-1])
            order = np.lexsort((chunk, tk))
            tk_s = tk[order]
            new_t = np.empty(len(tk_s), dtype=bool)
            new_t[0] = True
            new_t[1:] = tk_s[1:] != tk_s[:-1]
            g_start = np.nonzero(new_t)[0]
            g_end = np.append(g_start[1:], len(tk_s))
            found: dict[int, RankedMeta] = {}
            for gs, ge in zip(g_start, g_end):
                rows = order[gs:ge]
                found[int(tk_s[gs])] = RankedMeta(
                    df=int(df[rows].sum()),
                    cf=int(cf[rows].sum()),
                    chunks=chunk[rows],
                    chunk_df=df[rows],
                    chunk_ub_core=row_max[rows],
                )
            return found

        found: dict[int, RankedMeta] = {}
        items = sorted(by_part.items())
        if len(items) > 1:
            for d in self.pool.map(read_meta, items):
                found.update(d)
        else:
            found.update(read_meta(items[0]))
        for key in missing:
            out[key] = rm = found.get(key)
            self._rmeta_cache[key] = rm
            if len(self._rmeta_cache) > self._cache_cap:
                self._rmeta_cache.popitem(last=False)
        return out

    #: (term, chunk) decoded-slice LRU entries — bounds repeat-query decode
    #: for the pruned ranked path without ever letting a PARTIAL read
    #: satisfy a whole-term ``lookup``
    _CHUNK_CACHE_CAP = 8192

    def lookup_doc_chunks(
        self, term_keys: list[int], chunks: np.ndarray
    ) -> dict[int, TermPostings | None]:
        """Decode postings of the given terms RESTRICTED to the given doc-range
        chunks (the pruned ranked path's selective read).  Chunks are global
        doc ranges (doc_id // chunk_span), so a doc's postings for every term
        live in the same chunk — chunk-wise scoring is complete per doc.

        Caching is per (term, chunk) in a separate LRU (absent combinations
        cache as empty slices), so repeated hot-term queries decode each
        chunk once; the whole-term LRU stays untouched — a partial read must
        never satisfy a later ``lookup``."""
        m = self.manifest
        span = m.chunk_span
        chunk_arr = np.unique(np.asarray(chunks, dtype=np.int64))
        keys = [int(k) for k in term_keys]
        # resolve cached slices; collect the (term → missing chunks) map
        cached: dict[int, list[tuple[int, tuple]]] = {}
        miss_chunks: set[int] = set()
        miss_keys: set[int] = set()
        for key in keys:
            # a whole-term cache hit serves every chunk by slicing (zero
            # decode); blocks never span chunks (encode is per (term, chunk)
            # row), so the block slice is the value range within the chunk
            tp_full = self._cache.get(key)
            for c in (int(x) for x in chunk_arr):
                ck = (key, c)
                ent = self._chunk_cache.get(ck)
                if ent is None and tp_full is not None:
                    lo = int(np.searchsorted(tp_full.doc_ids, c * span))
                    hi = int(np.searchsorted(tp_full.doc_ids, (c + 1) * span))
                    blo = int(np.searchsorted(tp_full.block_last_doc, c * span))
                    bhi = int(np.searchsorted(tp_full.block_last_doc, (c + 1) * span))
                    # .copy(): a cached VIEW would pin the whole-term (or
                    # partition-read-wide) base array alive long after the
                    # term LRU evicts it — the entry cap bounds count, the
                    # copies bound bytes
                    ent = (
                        tp_full.doc_ids[lo:hi].copy(),
                        tp_full.tfs[lo:hi].copy(),
                        tp_full.block_last_doc[blo:bhi].copy(),
                        tp_full.block_core[blo:bhi].copy(),
                    )
                    self._chunk_cache[ck] = ent
                if ent is not None:
                    self._chunk_cache.move_to_end(ck)
                    cached.setdefault(key, []).append((c, ent))
                else:
                    miss_chunks.add(c)
                    miss_keys.add(key)

        if miss_keys:
            by_part: dict[int, set[int]] = {}
            for key in miss_keys:
                p = term_part(np.uint64(key), m.num_parts)
                by_part.setdefault(int(p), set()).add(key)
            chunk_list = sorted(miss_chunks)
            cols = ["term_key", "chunk", "df", "cf", "meta_blob", "block_last_doc", "block_max_score"]

            def read_chunks(item: tuple[int, set[int]]) -> dict[int, TermPostings]:
                part, pkeys = item
                ds = self._part_ds.get(part)
                if ds is None:
                    part_dir = os.path.join(self.seg_root, f"part={part:05d}")
                    if not os.path.isdir(part_dir):
                        return {}
                    ds = self._part_ds[part] = pads.dataset(part_dir)
                t = ds.to_table(
                    filter=pads.field("term_key").isin([np.uint64(k) for k in pkeys])
                    & pads.field("chunk").isin(chunk_list),
                    columns=cols,
                ).combine_chunks()
                return self._decode_partition(t, with_positions=False) if len(t) else {}

            found: dict[int, TermPostings] = {}
            items = sorted(by_part.items())
            if len(items) > 1:
                for d in self.pool.map(read_chunks, items):
                    found.update(d)
            else:
                found.update(read_chunks(items[0]))
            # split each decoded term into per-chunk slices and cache them
            # (requested-but-absent combinations cache as empty — negative
            # entries stop the re-read on the next hot query)
            empty_ent = (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int32),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
            for key in miss_keys:
                tp = found.get(key)
                for c in chunk_list:
                    ck = (key, c)
                    if ck in self._chunk_cache:
                        continue  # already resolved above for another term
                    if tp is None:
                        ent = empty_ent
                    else:
                        lo = int(np.searchsorted(tp.doc_ids, c * span))
                        hi = int(np.searchsorted(tp.doc_ids, (c + 1) * span))
                        blo = int(np.searchsorted(tp.block_last_doc, c * span))
                        bhi = int(np.searchsorted(tp.block_last_doc, (c + 1) * span))
                        # .copy() — see the slicing note above (these views
                        # would pin the partition-read decode arrays)
                        ent = (
                            tp.doc_ids[lo:hi].copy(),
                            tp.tfs[lo:hi].copy(),
                            tp.block_last_doc[blo:bhi].copy(),
                            tp.block_core[blo:bhi].copy(),
                        )
                    self._chunk_cache[ck] = ent
                    cached.setdefault(key, []).append((c, ent))
            while len(self._chunk_cache) > self._CHUNK_CACHE_CAP:
                self._chunk_cache.popitem(last=False)

        out: dict[int, TermPostings | None] = {}
        for key in keys:
            slices = [e for _, e in sorted(cached.get(key, []), key=lambda x: x[0])]
            parts_ids = [e[0] for e in slices if len(e[0])]
            if not parts_ids:  # chunk-ascending → doc-ascending
                out[key] = None
                continue
            doc_ids = parts_ids[0] if len(parts_ids) == 1 else np.concatenate(parts_ids)
            tfs = np.concatenate([e[1] for e in slices if len(e[1])])
            out[key] = TermPostings(
                df=len(doc_ids),
                cf=0,  # partial view — promotion overrides with the true cf
                doc_ids=doc_ids,
                tfs=tfs,
                block_last_doc=np.concatenate([e[2] for e in slices]),
                block_core=np.concatenate([e[3] for e in slices]),
            )
        return out

    def promote_postings(self, key: int, tp: TermPostings) -> None:
        """Install a fully-assembled position-free posting list into the
        whole-term LRU (the pruned ranked path calls this when it ended up
        decoding EVERY chunk of a term anyway — repeats then take the
        warm exhaustive path).  Never downgrades an entry that already
        holds positions; ``lookup`` upgrades position-free entries on the
        first phrase access, so correctness is unaffected."""
        key = int(key)
        cur = self._cache.get(key)
        if cur is not None and cur.pos_blob is not None:
            return
        self._cache[key] = tp
        self._cache.move_to_end(key)
        if len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)

    def _decode_partition(self, t: pa.Table, with_positions: bool = True) -> dict[int, TermPostings]:
        """Columnar decode of one filtered partition read → TermPostings.

        All O(df)/O(bytes) work is vectorized over the whole read: one varint
        pass for every meta blob, one segmented cumsum for every doc-id
        stream, zero-copy views + one per-term memcpy for position bytes and
        block metadata.  The only per-row Python is boundary slicing."""
        from .functions.codec import meta_blob_entries, segmented_undelta

        span = self.manifest.chunk_span
        tk = t["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        chunk = t["chunk"].to_numpy(zero_copy_only=False)
        df_col = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        cf_col = t["cf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((chunk, tk))
        tk_s, chunk_s, df_s, cf_s = tk[order], chunk[order], df_col[order], cf_col[order]

        # bulk meta decode in (term, chunk)-sorted entry coordinates — the
        # shared wire-format interpreter (codec.meta_blob_entries)
        meta_col = t.column("meta_blob").chunk(0)
        gaps, tfs_raw, rank = meta_blob_entries(_binary_values(meta_col), df_col, order)
        tfs_all = tfs_raw.astype(np.int32)
        docs_all = segmented_undelta(gaps, df_s) + np.repeat(chunk_s * span, df_s)

        if with_positions:
            pos_col = t.column("pos_blob").chunk(0)
            pos_off = _binary_offsets(pos_col)
            pos_buf = np.frombuffer(_binary_values(pos_col), dtype=np.uint8)
            # per-doc position byte lengths: ONE varint pass for the whole
            # read, entries in the same sorted-entry coordinates as docs/tfs
            pl_col = t.column("pos_len_blob").chunk(0)
            pl_all = varint_decode(_binary_values(pl_col)).astype(np.int64)
            pl_row_off = np.concatenate(([0], np.cumsum(df_col)))[:-1]
            pos_lens_all = pl_all[np.repeat(pl_row_off[order], df_s) + rank]
        bl_chunk = t.column("block_last_doc").chunk(0)
        bl_off = np.asarray(bl_chunk.offsets)
        bl_vals = bl_chunk.values.to_numpy(zero_copy_only=False).astype(np.int64)
        bc_chunk = t.column("block_max_score").chunk(0)
        bc_vals = bc_chunk.values.to_numpy(zero_copy_only=False).astype(np.float64)

        # term group boundaries over the sorted rows
        new_t = np.empty(len(tk_s), dtype=bool)
        new_t[0] = True
        new_t[1:] = tk_s[1:] != tk_s[:-1]
        g_start = np.nonzero(new_t)[0]
        g_end = np.append(g_start[1:], len(tk_s))
        e_start = np.concatenate(([0], np.cumsum(df_s)))

        out: dict[int, TermPostings] = {}
        for gs, ge in zip(g_start, g_end):
            rows = order[gs:ge]  # original row indices, chunk-ascending
            a, b = int(e_start[gs]), int(e_start[ge])
            pos_blob = None
            if with_positions:
                pos_blob = (
                    pos_buf[int(pos_off[rows[0]]) : int(pos_off[rows[0] + 1])]
                    if len(rows) == 1
                    else np.concatenate(
                        [pos_buf[int(pos_off[r]) : int(pos_off[r + 1])] for r in rows]
                    )
                )
            blk_l = (
                bl_vals[int(bl_off[rows[0]]) : int(bl_off[rows[0] + 1])]
                if len(rows) == 1
                else np.concatenate([bl_vals[int(bl_off[r]) : int(bl_off[r + 1])] for r in rows])
            )
            blk_c = (
                bc_vals[int(bl_off[rows[0]]) : int(bl_off[rows[0] + 1])]
                if len(rows) == 1
                else np.concatenate([bc_vals[int(bl_off[r]) : int(bl_off[r + 1])] for r in rows])
            )
            out[int(tk_s[gs])] = TermPostings(
                df=b - a,
                cf=int(cf_s[gs:ge].sum()),
                doc_ids=docs_all[a:b],
                tfs=tfs_all[a:b],
                block_last_doc=blk_l,
                block_core=blk_c,
                pos_blob=pos_blob,
                pos_lens=pos_lens_all[a:b] if with_positions else None,
            )
        return out


# ---------------------------------------------------------------------------
# searchers (Searcher protocol, searcher.go:3-5)
# ---------------------------------------------------------------------------


class PhraseSearcher:
    """Trigram AND + relative-position intersect (phrase_searcher.go:211-245).

    Divergences-by-definition (SURVEY.md §3.3): queries <3 runes → empty;
    repeated trigrams deduped for AND but all offsets constrain positions.
    """

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def base_positions(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """→ (doc_ids, base_positions) of every full-phrase match, doc-major.

        Two-level intersect: (1) doc-level AND over the term doc-id lists
        (rarest-first searchsorted cascade, meta only — positions stay
        compressed); (2) positions are decoded ONLY for the surviving
        candidate docs (per-doc byte lengths make the sub-streams
        addressable), then the (doc, pos) key cascade runs on those."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        keys, offsets = tokenize_query(query)
        if len(keys) == 0:
            return empty
        plists = self.reader.lookup(keys)
        if any(plists[int(k)] is None for k in keys):
            return empty  # any missing term ⇒ nil results (phrase_searcher.go:219-221)

        # (1) doc-level AND, rarest first
        tps = sorted((plists[int(k)] for k in keys), key=lambda tp: len(tp.doc_ids))
        cand = tps[0].doc_ids
        for tp in tps[1:]:
            if len(cand) == 0:
                return empty
            i = np.searchsorted(tp.doc_ids, cand)
            i[i == len(tp.doc_ids)] = 0
            cand = cand[tp.doc_ids[i] == cand]
        if len(cand) == 0:
            return empty

        # (2) INCREMENTAL position cascade, rarest term first: every term's
        # constraint intersect shrinks the surviving doc set, so each later
        # (hotter) term decodes positions for the SURVIVORS only — for a
        # typical multi-word phrase the two rarest trigrams (usually the
        # word-boundary ones) cut the candidate set 10-100× before the hot
        # word-internal trigrams ever decode.  The old all-terms-upfront
        # decode paid the full candidate volume per term, which profiling
        # showed was the warm-phrase p50 driver (hot-term decode, not I/O —
        # posting bytes are LRU-cached).
        # keys pack the candidate RANK (index into the sorted cand array),
        # never the raw doc id: rank < len(cand) < 2^30 by memory alone, so
        # rank * 2^33 + pos cannot overflow int64 — raw ids would wrap for
        # hash-mode (63-bit) ids or >2^30-doc corpora
        term_order = sorted(range(len(keys)), key=lambda i: len(plists[int(keys[i])].doc_ids))
        surv = np.arange(len(cand), dtype=np.int64)  # surviving ranks into cand
        cur: np.ndarray | None = None
        for ti in term_order:
            tp = plists[int(keys[ti])]
            idx = np.searchsorted(tp.doc_ids, cand[surv])
            pos = tp.positions_for(idx).astype(np.int64)
            tf_sel = tp.tfs[idx].astype(np.int64)
            # ascending by construction: surv ascending, per-doc positions
            # ascending (delta decode) ⇒ searchsorted-safe without a sort
            bk = np.repeat(surv, tf_sel) * _POS_SPAN + pos
            for off in offsets[ti]:
                if off == 0:
                    c = bk
                else:
                    # drop occurrences whose pos < off (would wrap into the
                    # previous doc's key range)
                    c = (bk - int(off))[pos >= off]
                if cur is None:
                    cur = c
                    continue
                if len(cur) == 0 or len(c) == 0:
                    return empty
                j = np.searchsorted(c, cur)
                j[j == len(c)] = 0  # safe gather; mismatch filtered below
                cur = cur[c[j] == cur]
            # every key carries ≥1 offset (it exists because it occurred at
            # one), so cur is always set here
            if len(cur) == 0:
                return empty
            new_surv = np.unique(cur // _POS_SPAN)
            if len(new_surv) < len(surv):
                surv = new_surv
        return cand[(cur // _POS_SPAN).astype(np.int64)], (cur % _POS_SPAN).astype(np.int64)

    def search(self, query: str, limit: int | None = None) -> pa.Table:
        """→ (doc_id, filename, start, end), ranges merged, sorted (filename, start).

        ``limit=None`` keeps the reference's print-everything semantics
        (pretty_print.go:56-76).  With a limit, the result is exactly the
        head of the unlimited ordering (pinned by pytest), but only those
        rows materialize Arrow strings — the sort runs on integer rank
        arrays, so a >10k-match phrase no longer pays a full resolve+sort
        tail.  The filename join is vectorized either way (searchsorted into
        the doc_id-sorted cache + one take; no per-row dict lookups)."""
        # filename sidecar loads on the pool WHILE postings read + intersect
        self.reader.prefetch_sidecars(meta=True)
        docs, bases = self.base_positions(query)
        qlen = len(query)
        starts, ends, out_docs = _merge_ranges_vec(docs, bases, qlen)
        if len(out_docs) == 0:
            return _phrase_empty()
        meta = self.reader.resolve_docs(out_docs, ["filename"])  # unique, doc_id-sorted
        m_ids = meta["doc_id"].to_numpy()
        fnames = meta["filename"].combine_chunks()
        sort_idx = pc.sort_indices(fnames).to_numpy()
        # DENSE rank (equal filenames share a rank): two docs with the same
        # filename must interleave their matches by start, exactly like the
        # reference's (filename, start) sort — a per-doc rank would group
        # doc A's rows before doc B's
        sorted_f = fnames.take(pa.array(sort_idx, type=pa.int64()))
        new_f = np.ones(len(m_ids), dtype=bool)
        if len(m_ids) > 1:
            new_f[1:] = np.asarray(
                pc.not_equal(sorted_f.slice(1), sorted_f.slice(0, len(m_ids) - 1))
            )
        rank = np.empty(len(m_ids), dtype=np.int64)
        rank[sort_idx] = np.cumsum(new_f) - 1
        codes = np.searchsorted(m_ids, out_docs)
        order = np.lexsort((starts, rank[codes]))
        if limit is not None:
            order = order[:limit]
        return pa.table(
            {
                "doc_id": pa.array(out_docs[order], type=pa.int64()),
                "filename": fnames.take(pa.array(codes[order], type=pa.int64())),
                "start": pa.array(starts[order], type=pa.int64()),
                "end": pa.array(ends[order], type=pa.int64()),
            }
        )


_POS_SPAN = np.int64(1) << np.int64(33)


def _merge_ranges_vec(docs: np.ndarray, bases: np.ndarray, qlen: int):
    """Merge overlapping/touching [p, p+qlen] per doc (phrase_searcher.go:154-186)."""
    if len(docs) == 0:
        return (np.empty(0, np.int64),) * 3
    order = np.lexsort((bases, docs))
    d, b = docs[order], bases[order]
    e = b + qlen
    # a new merged range starts where doc changes or start > previous end
    new = np.empty(len(d), dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (b[1:] > e[:-1])
    # merged end = max end within run (ends ascending within doc since starts asc, fixed len)
    run_id = np.cumsum(new) - 1
    starts = b[new]
    ends = np.maximum.reduceat(e, np.nonzero(new)[0])
    return starts, ends, d[new]


def _phrase_empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "filename": pa.array([], type=pa.string()),
            "start": pa.array([], type=pa.int64()),
            "end": pa.array([], type=pa.int64()),
        }
    )


#: bool mini-syntax token: optional +/- prefix, then a quoted phrase or a
#: bare word.  `+x` must match, `-x` must not, bare → should (≥1 matches).
_BOOL_TOKEN_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


def parse_bool_query(q: str) -> tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]:
    """Parse `+"merge part" window|−customer`-style bool syntax →
    (must, should, must_not).  The symbol-query parser's sibling (M5) for
    boolean composition; quoted phrases keep their spaces."""
    must, should, must_not = [], [], []
    for sign, quoted, bare in _BOOL_TOKEN_RE.findall(q):
        text = quoted if quoted else bare
        if not text:
            continue
        (must if sign == "+" else must_not if sign == "-" else should).append(text)
    return tuple(must), tuple(should), tuple(must_not)


class BoolSearcher:
    """Boolean phrase composition over the index: must=AND, should=OR(≥1),
    must_not=NOT — a generalization of the reference CLI's union across
    query kinds (D5; `/root/reference/cmd/searty/main.go` runs one kind per
    invocation, set ops are new surface).

    Doc-level output (positions are a phrase-query concern).  Every leaf
    phrase is EXACT — full trigram AND + positional verification via
    PhraseSearcher.base_positions, so a trigram-candidate superset can
    never leak through a NOT.  Set algebra runs on sorted unique doc-id
    arrays (searchsorted intersect / union / setdiff — no Python sets)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader
        self._phrase = PhraseSearcher(reader)

    def _docs(self, phrase: str) -> np.ndarray:
        return np.unique(self._phrase.base_positions(phrase)[0])

    def search(
        self,
        must: tuple[str, ...] = (),
        should: tuple[str, ...] = (),
        must_not: tuple[str, ...] = (),
    ) -> pa.Table:
        """→ (doc_id, filename) ascending by doc_id."""
        if not must and not should:
            raise ValueError("bool query needs at least one must or should phrase")
        # every operand is sorted-unique (np.unique in _docs), so numpy's
        # assume_unique set ops apply directly and outputs stay sorted
        if must:
            cur = self._docs(must[0])
            for p in must[1:]:
                if len(cur) == 0:
                    break
                cur = np.intersect1d(cur, self._docs(p), assume_unique=True)
        else:
            cur = None
        if should:
            uni = np.unique(np.concatenate([self._docs(p) for p in should]))
            cur = uni if cur is None else np.intersect1d(cur, uni, assume_unique=True)
        for p in must_not:
            if len(cur) == 0:
                break
            cur = np.setdiff1d(cur, self._docs(p), assume_unique=True)
        if len(cur) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "filename": pa.array([], type=pa.string())}
            )
        meta = self.reader.resolve_docs(cur, ["filename"])
        return pa.table(
            {"doc_id": pa.array(meta["doc_id"], type=pa.int64()),
             "filename": meta["filename"]}
        )

    def search_str(self, q: str) -> pa.Table:
        """Parse bool mini-syntax (see :func:`parse_bool_query`) and search."""
        must, should, must_not = parse_bool_query(q)
        return self.search(must=must, should=should, must_not=must_not)


class BM25Searcher:
    """Exhaustive DAAT (baseline) and block-max WAND top-k (O4)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def _cursors(self, query: str) -> list[TermCursor]:
        keys, _ = tokenize_query(query)
        if len(keys) == 0:
            return []
        # norms sidecar loads on the pool WHILE the postings partitions read
        self.reader.prefetch_sidecars(norms=True)
        # ranked scoring never touches positions — skip the dominant read
        # volume (pos_blob ≈ 1.2 B × cf vs meta ≈ 3 B × df)
        plists = self.reader.lookup(keys, need_positions=False)
        m = self.reader.manifest
        cursors = []
        for k in keys:  # ascending term order (np.unique) — defines sum order
            tp = plists[int(k)]
            if tp is None:
                continue
            cursors.append(
                TermCursor(
                    doc_ids=tp.doc_ids,
                    tfs=tp.tfs,
                    block_last_doc=tp.block_last_doc,
                    block_core=tp.block_core,
                    idf=bm25.idf(m.n_docs, tp.df),
                    tp=tp,
                )
            )
        return cursors

    #: pruned-path trigger: total UNCACHED df above which the chunk-pruned
    #: two-phase read is worth attempting.  Deliberately high: below it the
    #: exhaustive path's ONE filtered read + term-LRU reuse beats the pruned
    #: path's metadata read + per-batch chunk reads (measured at 200k docs:
    #: 2× on the bench's repeated-vocab ranked batch; at 600k docs uniform
    #: synthetic data gives the bound sort nothing to skip).  Above it the
    #: full decode itself is the wall and chunk skipping + batch-local
    #: top-k win whenever real corpora give the per-chunk maxima any skew.
    PRUNE_MIN_DF = 1 << 22

    def topk(self, query: str, k: int, mode: str = "auto") -> pa.Table:
        """Exact BM25 top-k by (-score, doc_id).

        ``mode="auto"`` (default): exhaustive DAAT for cheap/cached terms;
        the block-max chunk-pruned path (:meth:`topk_pruned`) when the
        uncached posting volume crosses ``PRUNE_MIN_DF``.  Both paths are
        exact — rank-identical by construction (pinned by pytest)."""
        if mode == "pruned":
            return self.topk_pruned(query, k)
        if mode == "auto":
            keys, _ = tokenize_query(query)
            if len(keys) == 0:
                return _topk_empty()
            uncached = [kk for kk in keys if not self.reader.has_cached_postings(int(kk))]
            if uncached:
                # fetch meta for ALL terms up front and hand it to the pruned
                # path — otherwise routing pays the metadata read twice
                metas = self.reader.lookup_ranked_meta(keys)
                df_uncached = sum(
                    m.df
                    for kk in uncached
                    if (m := metas.get(int(kk))) is not None
                )
                if df_uncached >= self.PRUNE_MIN_DF:
                    return self.topk_pruned(query, k, _metas=metas)
        return self._topk_exhaustive(query, k)

    def _topk_exhaustive(self, query: str, k: int) -> pa.Table:
        """Exhaustive DAAT: vectorized per-term accumulation in ascending-term
        order.  With dense doc ids (sort-mode assignment) scores accumulate
        into a doc-indexed array — no unique/searchsorted per term."""
        cursors = self._cursors(query)
        m = self.reader.manifest
        if not cursors:
            return _topk_empty()
        # dense-id fast path needs the whole-corpus norms array resident —
        # only when the reader is in whole-corpus (unsharded) meta mode
        if m.max_doc_id + 1 == m.n_docs and self.reader.range_meta is None:
            self.reader._load_norms()
            dl = self.reader._norm_len  # norms sorted by doc_id == index
            scores = np.zeros(m.n_docs, dtype=np.float64)
            for c in cursors:
                # per-term contribution idf·tf_norm(tf, |D|) depends only on
                # the term and corpus constants — cache it on the posting
                # entry so every reuse of a hot term skips the norms gather
                # and the tf_norm vector math (bit-identical float64: the
                # cached array IS the expression below).  +8 B/posting on
                # cached ranked-hot terms (cf. _positions at 4 B×cf).
                contrib = getattr(c.tp, "_contrib", None) if c.tp is not None else None
                if contrib is None:
                    contrib = c.idf * bm25.tf_norm(c.tfs, dl[c.doc_ids], m.avgdl)
                    if c.tp is not None:
                        c.tp._contrib = contrib
                scores[c.doc_ids] += contrib
            docs, s = bm25.topk_dense(scores, k)
            return _topk_table(docs, s)
        candidates = np.unique(np.concatenate([c.doc_ids for c in cursors]))
        dl = self.reader.doc_len(candidates).astype(np.float64)
        scores = np.zeros(len(candidates), dtype=np.float64)
        for c in cursors:
            idx = np.searchsorted(candidates, c.doc_ids)
            scores[idx] += c.idf * bm25.tf_norm(c.tfs, dl[idx], m.avgdl)
        top = bm25.topk_order(scores, candidates, k)
        return _topk_table(candidates[top], scores[top])

    #: target decoded postings per pruned-path read batch — amortizes the
    #: per-read parquet overhead while keeping early-exit granularity
    PRUNE_BATCH_POSTINGS = 1 << 19

    def topk_pruned(self, query: str, k: int, _metas=None) -> pa.Table:
        """Vectorized block-max chunk pruning (VERDICT r3 item 4).

        Phase 1 reads per-chunk METADATA only (block maxima — O(df/BLOCK)
        floats, no posting bytes) and computes, per doc-range chunk, an
        upper bound of any doc's score: Σ_terms idf·max(block core in
        chunk).  Chunks are global doc ranges, so one doc's postings for
        every term share a chunk — chunk-wise scoring is complete per doc.

        Phase 2 decodes chunks in DESCENDING bound order (batched reads of
        ``PRUNE_BATCH_POSTINGS`` estimated postings), scoring each batch
        with the same vectorized DAAT kernel and keeping a running top-k.
        It stops as soon as the k-th best score STRICTLY exceeds the next
        chunk's bound — remaining docs score ≤ bound < k-th, so they can't
        enter the result even on ties ((-score, doc_id) order).  Exact by
        the encode-time invariant that block_core is a float-safe upper
        bound of every doc's idf-free contribution (encode_stage.py:342).

        No per-doc Python: bounds, ordering and scoring are all numpy; the
        per-BATCH loop runs O(selected_chunks / batch) times.  Worst case
        (uniform score distribution) decodes everything the exhaustive path
        decodes, in two reads instead of one."""
        keys, _ = tokenize_query(query)
        m = self.reader.manifest
        if len(keys) == 0:
            return _topk_empty()
        self.reader.prefetch_sidecars(norms=True)
        metas = _metas if _metas is not None else self.reader.lookup_ranked_meta(keys)
        terms = [(int(kk), metas[int(kk)]) for kk in keys if metas[int(kk)] is not None]
        if not terms:
            return _topk_empty()
        idf = {kk: bm25.idf(m.n_docs, meta.df) for kk, meta in terms}
        all_chunks = np.unique(np.concatenate([meta.chunks for _, meta in terms]))
        ub = np.zeros(len(all_chunks), dtype=np.float64)
        est_df = np.zeros(len(all_chunks), dtype=np.int64)
        for kk, meta in terms:
            pos = np.searchsorted(all_chunks, meta.chunks)
            ub[pos] += idf[kk] * meta.chunk_ub_core
            est_df[pos] += meta.chunk_df
        order = np.argsort(-ub, kind="stable")
        term_keys = [kk for kk, _ in terms]
        # dense fast path (mirrors the exhaustive scorer): whole-corpus norms
        # resident, per-batch accumulation into a doc-indexed array — no
        # unique/searchsorted per term
        dense = m.max_doc_id + 1 == m.n_docs and self.reader.range_meta is None
        if dense:
            self.reader._load_norms()
            dl_all = self.reader._norm_len
        best_docs = np.empty(0, dtype=np.int64)
        best_scores = np.empty(0, dtype=np.float64)
        threshold = -np.inf
        i = 0
        while i < len(order):
            if len(best_docs) >= k and threshold > ub[order[i]]:
                break
            j, acc = i, 0
            while j < len(order) and (j == i or acc < self.PRUNE_BATCH_POSTINGS):
                acc += int(est_df[order[j]])
                j += 1
            batch_chunks = all_chunks[order[i:j]]
            tps = self.reader.lookup_doc_chunks(term_keys, batch_chunks)
            arrs = [
                (kk, tp) for kk, tp in tps.items() if tp is not None and len(tp.doc_ids)
            ]
            if arrs:
                # batch-local exact top-k first: a doc lives in exactly ONE
                # chunk (hence one batch), so any doc outside its batch's
                # top-k is dominated by ≥k batch-mates — the global merge
                # only ever sees ≤ 2k rows.  Dense accumulation (no unique/
                # searchsorted) only pays when the batch is a large corpus
                # fraction — a small batch would still zero + scan all
                # n_docs, O(n_batches × n_docs) on uniform data.
                batch_postings = sum(len(tp.doc_ids) for _, tp in arrs)
                if dense and batch_postings * 4 >= m.n_docs:
                    scores_d = np.zeros(m.n_docs, dtype=np.float64)
                    for kk, tp in arrs:  # ascending-term sum order
                        scores_d[tp.doc_ids] += idf[kk] * bm25.tf_norm(
                            tp.tfs, dl_all[tp.doc_ids], m.avgdl
                        )
                    docs_b, sc_b = bm25.topk_dense(scores_d, k)
                else:
                    candidates = np.unique(np.concatenate([tp.doc_ids for _, tp in arrs]))
                    dl = self.reader.doc_len(candidates).astype(np.float64)
                    scores = np.zeros(len(candidates), dtype=np.float64)
                    for kk, tp in arrs:  # ascending-term sum order
                        pos2 = np.searchsorted(candidates, tp.doc_ids)
                        scores[pos2] += idf[kk] * bm25.tf_norm(tp.tfs, dl[pos2], m.avgdl)
                    top_b = bm25.topk_order(scores, candidates, k)
                    docs_b, sc_b = candidates[top_b], scores[top_b]
                docs_all = np.concatenate([best_docs, docs_b])
                sc_all = np.concatenate([best_scores, sc_b])
                top = bm25.topk_order(sc_all, docs_all, k)
                best_docs, best_scores = docs_all[top], sc_all[top]
                if len(best_docs) >= k:
                    threshold = float(best_scores[-1])
            i = j
        if i >= len(order):
            # no early exit — every chunk of every term was decoded, i.e. the
            # pruned run paid the full-list cost anyway.  Assemble whole-term
            # entries from the (term, chunk) cache (pure concatenation) and
            # promote them, so REPEATS of this query take the warm exhaustive
            # path instead of re-walking the chunks (measured 2.2× on the
            # bench's repeated-vocab ranked batch).
            full = self.reader.lookup_doc_chunks(term_keys, all_chunks)
            for kk, meta in terms:
                tp = full.get(kk)
                if tp is not None and tp.df == meta.df:
                    tp.cf = meta.cf
                    self.reader.promote_postings(kk, tp)
        return _topk_table(best_docs, best_scores)

    def topk_wand(self, query: str, k: int) -> pa.Table:
        cursors = self._cursors(query)
        m = self.reader.manifest
        if not cursors:
            return _topk_empty()
        docs, scores = wand_topk(cursors, self.reader.doc_len, m.avgdl, m.n_docs, k)
        return _topk_table(docs, scores)


def _topk_table(docs: np.ndarray, scores: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(docs) + 1, dtype=np.int64)),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def _topk_empty() -> pa.Table:
    return _topk_table(np.empty(0, np.int64), np.empty(0, np.float64))


class WordSearcher:
    """BM25 + occurrence lookup over SYMBOL terms (whole identifiers).

    Requires an index built with ``tokenizer="trigram+symbols"``; terms are
    uppercased symbols hashed into the high-bit key range
    (functions/tokenize.py).  Scoring uses the symbol-token norms/avgdl, so
    this is classic word-level BM25 alongside the trigram index.
    """

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def topk(self, query: str, k: int) -> pa.Table:
        from .functions.tokenize import SYMBOL_RE, symbol_key

        words = sorted({m.group(0).upper() for m in SYMBOL_RE.finditer(query)})
        if not words:
            return _topk_empty()
        keys = np.array([symbol_key(w) for w in words], dtype=np.uint64)
        plists = self.reader.lookup(keys, need_positions=False)
        m = self.reader.manifest
        present = [(w, plists[int(symbol_key(w))]) for w in words]
        present = [(w, tp) for w, tp in present if tp is not None]
        if not present:
            return _topk_empty()
        if m.max_doc_id + 1 == m.n_docs and self.reader.range_meta is None:
            # dense-id fast path (whole-corpus norms; sharded readers take
            # the candidate path, whose sym_doc_len gathers by doc range)
            self.reader.sym_doc_len(np.empty(0, dtype=np.int64))  # ensure norms loaded
            dl = self.reader._sym_norm_len
            scores = np.zeros(m.n_docs, dtype=np.float64)
            for _, tp in present:  # ascending word order defines the sum order
                scores[tp.doc_ids] += bm25.idf(m.n_docs, tp.df) * bm25.tf_norm(
                    tp.tfs, dl[tp.doc_ids], m.avg_sym_dl
                )
            docs, s = bm25.topk_dense(scores, k)
            return _topk_table(docs, s)
        candidates = np.unique(np.concatenate([tp.doc_ids for _, tp in present]))
        dl = self.reader.sym_doc_len(candidates).astype(np.float64)
        scores = np.zeros(len(candidates), dtype=np.float64)
        for _, tp in present:  # ascending word order defines the sum order
            idx = np.searchsorted(candidates, tp.doc_ids)
            scores[idx] += bm25.idf(m.n_docs, tp.df) * bm25.tf_norm(tp.tfs, dl[idx], m.avg_sym_dl)
        top = bm25.topk_order(scores, candidates, k)
        return _topk_table(candidates[top], scores[top])

    def occurrences(self, word: str) -> pa.Table:
        """All (doc_id, position) occurrences of one symbol term."""
        from .functions.tokenize import symbol_key

        key = symbol_key(word)
        tp = self.reader.lookup(np.array([key], dtype=np.uint64))[key]
        if tp is None:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()), "pos": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(tp.doc_ids, tp.tfs), type=pa.int64()),
                "pos": pa.array(tp.positions.astype(np.int64), type=pa.int64()),
            }
        )


class ProximitySearcher:
    """NEAR/k proximity search over the symbol-word index (new surface —
    the reference has exact lookup and phrase only; NEAR is the classic
    fulltext third kind).

    ``near(a, b, k)`` returns every doc where some occurrence of ``a`` and
    some occurrence of ``b`` start within ``k`` characters of each other,
    with the pair count and the minimum gap.  Both words' postings come
    through the ordinary pruned lookup (positions decoded lazily, same as
    the phrase path); docs intersect FIRST so the window scan only touches
    co-occurrence docs, then the whole gap computation is two
    ``searchsorted`` passes over the doc-major ``doc*2^41 + pos`` key
    stream — no per-doc Python.

    Scale contract: cost is occurrence-scale for the two query terms only
    (the phrase-search contract); nothing corpus-scale materializes.
    Positions are char offsets < 2^41 per doc, so doc-strided keys cannot
    collide across docs for any realistic k.
    """

    def __init__(self, reader: IndexReader):
        self.reader = reader

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "filename": pa.array([], type=pa.string()),
                "n_pairs": pa.array([], type=pa.int64()),
                "min_gap": pa.array([], type=pa.int64()),
            }
        )

    def near(self, word_a: str, word_b: str, k: int, ordered: bool = False) -> pa.Table:
        """``ordered=False``: |pos_a − pos_b| ≤ k (classic NEAR).
        ``ordered=True``: 0 < pos_b − pos_a ≤ k (word_b strictly AFTER
        word_a — the sloppy-phrase direction)."""
        from .functions.tokenize import symbol_key

        key_a, key_b = symbol_key(word_a), symbol_key(word_b)
        if key_a == key_b:
            # NEAR(w, w) would pair every occurrence with itself (min_gap 0,
            # n_pairs = tf) — reject rather than return a degenerate answer
            raise ValueError(f"near: identical words {word_a!r} / {word_b!r}")
        got = self.reader.lookup(np.array([key_a, key_b], dtype=np.uint64))
        tpa, tpb = got[key_a], got[key_b]
        if tpa is None or tpb is None:
            return self._empty()
        shared = np.intersect1d(tpa.doc_ids, tpb.doc_ids)
        if len(shared) == 0:
            return self._empty()

        def occ(tp) -> tuple[np.ndarray, np.ndarray]:
            sel = np.isin(tp.doc_ids, shared, assume_unique=True)
            mask = np.repeat(sel, tp.tfs)
            d = np.repeat(tp.doc_ids, tp.tfs)[mask].astype(np.int64)
            return d, tp.positions[mask].astype(np.int64)

        da, pos_a = occ(tpa)
        db, pos_b = occ(tpb)
        stride = np.int64(1) << np.int64(41)
        ka = da * stride + pos_a
        kb = db * stride + pos_b
        lo = np.searchsorted(kb, ka + 1 if ordered else ka - k, side="left")
        hi = np.searchsorted(kb, ka + k, side="right")
        cnt = (hi - lo).astype(np.int64)
        inf = np.int64(1) << np.int64(60)
        has = cnt > 0
        if ordered:
            # kb sorted ⇒ the first b after a is the nearest in (a, a+k]
            g = np.where(has, kb[np.minimum(lo, len(kb) - 1)] - ka, inf)
        else:
            # nearest-neighbour gap per a-occurrence (valid only where cnt > 0)
            idx = np.searchsorted(kb, ka)
            gl = np.where(has & (idx - 1 >= lo), ka - kb[np.maximum(idx - 1, 0)], inf)
            gr = np.where(has & (idx < hi), kb[np.minimum(idx, len(kb) - 1)] - ka, inf)
            g = np.minimum(gl, gr)
        uniq, starts = np.unique(da, return_index=True)
        n_pairs = np.add.reduceat(cnt, starts)
        min_gap = np.minimum.reduceat(g, starts)
        keep = n_pairs > 0
        uniq, n_pairs, min_gap = uniq[keep], n_pairs[keep], min_gap[keep]
        if len(uniq) == 0:
            return self._empty()
        meta = self.reader.resolve_docs(uniq, ["filename"])
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "filename": meta["filename"],
                "n_pairs": pa.array(n_pairs, type=pa.int64()),
                "min_gap": pa.array(min_gap, type=pa.int64()),
            }
        )


class PrefixSearcher:
    """Prefix / wildcard word search (``doc-1*``) over the term dictionary.

    The segments store symbol terms as irreversible ``#sym:<hash>``
    placeholders, so enumeration goes through the ``worddict/`` sidecar
    (stages/worddict.py): each reader loads it ONCE as term-sorted arrays —
    the symbols-table pattern — and every prefix query is a binary-search
    range slice.  Matched terms then resolve through the ordinary postings
    lookup (reader.lookup), so doc results reuse partition pruning and the
    term LRU.  Extends the reference's exact-only symbol lookup
    (`/root/reference/lib/searcher/definition_searcher.go:12-33`).

    Scale contract: the dictionary is vocab-scale (sorted arrays fit a
    query actor for any realistic identifier vocabulary); at 10^9+ terms
    shard ``worddict/`` by term range (DocRangeMeta pattern, documented in
    stages/worddict.py)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader
        self.dict_path = os.path.join(reader.index_dir, "worddict")

    def _dict(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
        cached = getattr(self.reader, "_word_dict", None)
        if cached is None:
            if not os.path.isdir(self.dict_path) or not os.listdir(self.dict_path):
                return None
            t = pads.dataset(self.dict_path).to_table().sort_by("term")
            cached = (
                t["term"].to_numpy(zero_copy_only=False),  # object array: O(log n) cmp
                t["term_key"].to_numpy(),
                t["df"].to_numpy(),
                t["cf"].to_numpy(),
            )
            self.reader._word_dict = cached
            if "rev_term" in t.column_names:  # persisted reversed dictionary
                self.reader._word_dict_rev_raw = t["rev_term"].to_numpy(
                    zero_copy_only=False
                )
        return cached

    def _rev_dict(self) -> tuple[np.ndarray, np.ndarray]:
        """Reversed-term dictionary view: (rev-sorted reversed terms,
        main-dict index per position).  Served from the sidecar's persisted
        ``rev_term`` column (stages/worddict.py — r4 verdict item 6); a
        pre-r5 sidecar without the column derives it in memory at the same
        vocab-scale cost as the load-time term sort.  Sorted once per
        actor, cached on the reader like the forward dictionary."""
        cached = getattr(self.reader, "_word_dict_rev", None)
        if cached is None:
            terms = self._dict_or_raise()[0]
            rev = getattr(self.reader, "_word_dict_rev_raw", None)
            if rev is None:
                rev = np.array([t[::-1] for t in terms], dtype=object)
            order = np.argsort(rev, kind="stable").astype(np.int64)
            cached = (rev[order], order)
            self.reader._word_dict_rev = cached
        return cached

    def _dict_or_raise(self):
        d = self._dict()
        if d is None:
            raise FileNotFoundError(
                f"no worddict sidecar under {self.reader.index_dir} — build the "
                "index with tokenizer='trigram+symbols'"
            )
        return d

    def _range(self, prefix: str) -> tuple[int, int]:
        d = self._dict_or_raise()
        p = prefix.upper()
        terms = d[0]
        # [p, p + U+10FFFF) covers exactly the strings with prefix p
        return int(np.searchsorted(terms, p, side="left")), int(
            np.searchsorted(terms, p + "\U0010ffff", side="left")
        )

    def terms(self, prefix: str) -> pa.Table:
        """(term, df, cf) of every word with the given prefix, term-sorted."""
        lo, hi = self._range(prefix)
        terms, _, df, cf = self._dict()
        return pa.table(
            {
                "term": pa.array(terms[lo:hi], type=pa.string()),
                "df": pa.array(df[lo:hi], type=pa.int64()),
                "cf": pa.array(cf[lo:hi], type=pa.int64()),
            }
        )

    def docs(self, prefix: str) -> pa.Table:
        """(doc_id, filename, n_terms, total_tf) of every doc containing a
        word with the given prefix — n_terms = distinct matching words in
        the doc, total_tf = their summed occurrences; filename-sorted."""
        lo, hi = self._range(prefix)
        return self._docs_for_indices(np.arange(lo, hi))

    # -- wildcard extension: *suf, *mid*, pre*suf (Lucene-style single-`*`
    # patterns) over the same dictionary ---------------------------------

    def _terms_u(self) -> np.ndarray:
        """Fixed-width unicode copy of the term column for vectorized
        numpy.char scans, cached on the reader alongside the dict."""
        u = getattr(self.reader, "_word_dict_u", None)
        if u is None:
            u = self._dict_or_raise()[0].astype("U")
            self.reader._word_dict_u = u
        return u

    def _match_indices(self, pattern: str) -> np.ndarray:
        """Ascending dictionary indices whose term matches the wildcard
        pattern (at most two literal segments around ``*``, case-folded).

        ``pre*`` is a binary-search range slice on the term-sorted
        dictionary; ``*suf`` is the SAME range-slice shape on the
        REVERSED-term dictionary (persisted ``rev_term`` column — the
        classic Lucene reversed-wildcard trick, r4 verdict item 6), so
        neither anchored form ever scans the vocabulary.  Only the
        unanchored ``*mid*`` scans (one numpy.char kernel — vocab-scale by
        the class contract; the general no-scan structure would be a
        permuterm/suffix-automaton sidecar, not warranted here)."""
        p = pattern.upper()
        n_star = p.count("*")
        if n_star == 0:
            d = self._dict_or_raise()
            lo = int(np.searchsorted(d[0], p, side="left"))
            hi = int(np.searchsorted(d[0], p, side="right"))
            return np.arange(lo, hi)
        if n_star == 1 and p.endswith("*"):
            lo, hi = self._range(p[:-1])
            return np.arange(lo, hi)
        if n_star == 1 and p.startswith("*"):
            rev, order = self._rev_dict()
            rp = p[1:][::-1]
            lo = int(np.searchsorted(rev, rp, side="left"))
            hi = int(np.searchsorted(rev, rp + "\U0010ffff", side="left"))
            return np.sort(order[lo:hi])
        if n_star == 2 and p.startswith("*") and p.endswith("*"):
            return np.flatnonzero(np.char.find(self._terms_u(), p[1:-1]) >= 0)
        if n_star == 1:  # pre*suf
            pre, _, suf = p.partition("*")
            lo, hi = self._range(pre)
            u = self._terms_u()[lo:hi]
            ok = np.char.endswith(u, suf) & (np.char.str_len(u) >= len(pre) + len(suf))
            return np.arange(lo, hi)[ok]
        raise ValueError(f"unsupported wildcard pattern: {pattern!r}")

    def wildcard_terms(self, pattern: str) -> pa.Table:
        """(term, df, cf) of every word matching the pattern, term-sorted."""
        idx = self._match_indices(pattern)
        terms, _, df, cf = self._dict_or_raise()
        return pa.table(
            {
                "term": pa.array(terms[idx], type=pa.string()),
                "df": pa.array(df[idx], type=pa.int64()),
                "cf": pa.array(cf[idx], type=pa.int64()),
            }
        )

    def wildcard_docs(self, pattern: str) -> pa.Table:
        """Docs containing any word matching the pattern (prefix_docs
        contract: n_terms distinct matches, total_tf summed; filename-
        sorted).  Matched keys go through the ordinary pruned lookup."""
        return self._docs_for_indices(self._match_indices(pattern))

    def _docs_for_indices(self, idx: np.ndarray) -> pa.Table:
        _, keys, _, _ = self._dict_or_raise()
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "filename": pa.array([], type=pa.string()),
                "n_terms": pa.array([], type=pa.int64()),
                "total_tf": pa.array([], type=pa.int64()),
            }
        )
        if len(idx) == 0:
            return empty
        plists = self.reader.lookup(keys[idx].astype(np.uint64), need_positions=False)
        present = [tp for tp in plists.values() if tp is not None]
        if not present:
            return empty
        doc_ids = np.concatenate([tp.doc_ids for tp in present])
        tfs = np.concatenate([tp.tfs for tp in present]).astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs = doc_ids[order], tfs[order]
        uniq, starts = np.unique(doc_ids, return_index=True)
        total_tf = np.add.reduceat(tfs, starts)
        n_terms = np.diff(np.append(starts, len(doc_ids)))
        meta = self.reader.resolve_docs(uniq, ["filename"])  # unique, doc_id-sorted
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "filename": meta["filename"],
                "n_terms": pa.array(n_terms, type=pa.int64()),
                "total_tf": pa.array(total_tf, type=pa.int64()),
            }
        ).sort_by("filename")


class SymbolSearcher:
    """Symbol-definition lookup (definition_searcher.go:102-125).

    The definitions table is metadata-scale (a few rows per source file), so
    each reader loads it ONCE, sorted by name, and every query is a
    binary-search slice — the reference's indexed `symbol.name` lookup, not
    a per-query parquet scan."""

    def __init__(self, reader: IndexReader):
        self.reader = reader
        self.symbols_path = os.path.join(reader.index_dir, "symbols")

    def _table(self) -> pa.Table | None:
        t = getattr(self.reader, "_symbols_sorted", None)
        if t is None:
            if not os.path.isdir(self.symbols_path) or not os.listdir(self.symbols_path):
                return None
            t = pads.dataset(self.symbols_path).to_table().sort_by("name")
            self.reader._symbols_sorted = t
            # object array: searchsorted does O(log n) Python comparisons —
            # no O(n) fixed-width unicode conversion at load
            self.reader._symbols_names = t["name"].to_numpy(zero_copy_only=False)
        return t

    def search(self, query: str) -> pa.Table:
        name, package = parse_symbol(query)
        allt = self._table()
        if allt is None:
            return _symbol_empty()
        names = self.reader._symbols_names
        lo, hi = np.searchsorted(names, name, side="left"), np.searchsorted(names, name, side="right")
        if lo == hi:
            return _symbol_empty()
        t = allt.slice(lo, hi - lo)
        mask = pc.equal(t["identifier_type"], "symbol")
        if package is not None:
            mask = pc.and_(mask, pc.equal(t["package"], package))
        t = t.filter(mask)
        if len(t) == 0:
            return _symbol_empty()
        meta = self.reader.resolve_docs(t["doc_id"].to_numpy(), ["filename"])
        fn = dict(zip(meta["doc_id"].to_pylist(), meta["filename"].to_pylist()))
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "filename": pa.array([fn[int(d)] for d in t["doc_id"].to_pylist()]),
                "position": t["position"],
                "specifier": t["specifier"],
                "symbol_name": t["name"],
                "package_name": t["package"],
            }
        )
        return out.sort_by(
            [("filename", "ascending"), ("position", "ascending"), ("specifier", "ascending")]
        )


def _symbol_empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "filename": pa.array([], type=pa.string()),
            "position": pa.array([], type=pa.int64()),
            "specifier": pa.array([], type=pa.string()),
            "symbol_name": pa.array([], type=pa.string()),
            "package_name": pa.array([], type=pa.string()),
        }
    )


class FileSearcher:
    """Filename substring filter — a real filter, unlike the reference's
    print-only stub (file_searcher.go:20-33).  Runs the match kernel over
    the reader's cached doc_id→filename arrays (loaded once per actor), not
    a fresh parquet read per query."""

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def search(self, query: str) -> pa.Table:
        r = self.reader
        if r.range_meta is not None:
            # sharded mode: stream docmeta row groups through the C substring
            # kernel — only matches accumulate, the corpus never does
            index = r.range_meta._range_index()
            parts = []
            seen = set()
            for _mn, _mx, path, _rg in index:
                if path in seen:
                    continue
                seen.add(path)
                for rb in pq.ParquetFile(path).iter_batches(columns=["doc_id", "filename"]):
                    t = pa.Table.from_batches([rb])
                    parts.append(t.filter(pc.match_substring(t["filename"], query)))
            if not parts:
                return pa.table(
                    {"doc_id": pa.array([], type=pa.int64()),
                     "filename": pa.array([], type=pa.string())}
                )
            return pa.concat_tables(parts).sort_by("filename")
        r._load_meta()
        t = pa.table(
            {
                "doc_id": pa.array(r._meta_ids, type=pa.int64()),
                "filename": r._meta_filenames,
            }
        )
        return t.filter(pc.match_substring(t["filename"], query)).sort_by("filename")


class RegexSearcher:
    """Trigram-index-accelerated regex search — the flagship derived query
    of a trigram-shaped index (Cox, "Regular Expression Matching with a
    Trigram Index", 2012; PostgreSQL pg_trgm does the same).  Not in the
    reference's surface, but its index (tokenizer.go:9-33) is exactly the
    structure this query exists for.

    Plan: required-literal OR-of-AND analysis (functions/regexplan.py) →
    per-alternative doc-id AND over the literals' trigram posting lists
    (meta-only lookups — ``need_positions=False``; regex verification never
    touches positions) → union across alternatives → RE2 verification over
    ONLY the candidate bodies via pyarrow ``count_substring_regex`` /
    ``extract_regex``.  The same RE2 library backs DuckDB's regexp
    functions, so engine and oracle cannot diverge on regex semantics.

    An unprunable pattern raises ValueError: a whole-corpus scan must never
    hide inside a query actor — callers fall back to the DISTRIBUTED scan
    (stages/regexscan.py) explicitly.
    """

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def candidates(self, pattern: str) -> np.ndarray | None:
        """Sorted candidate doc ids from the index, or None if unprunable."""
        alts = literal_alternatives(pattern)
        if alts is None:
            return None
        per_alt: list[np.ndarray] = []
        union: set[int] = set()
        for alt in alts:
            keys = np.unique(np.concatenate([pack_trigrams(codepoints(lit)) for lit in alt]))
            per_alt.append(keys)
            union.update(int(k) for k in keys)
        plists = self.reader.lookup(
            np.array(sorted(union), dtype=np.uint64), need_positions=False
        )
        cands: list[np.ndarray] = []
        for keys in per_alt:
            tps = [plists[int(k)] for k in keys]
            if any(tp is None for tp in tps):
                continue  # an absent trigram kills this alternative only
            tps.sort(key=lambda tp: len(tp.doc_ids))
            cand = tps[0].doc_ids
            for tp in tps[1:]:
                if len(cand) == 0:
                    break
                i = np.searchsorted(tp.doc_ids, cand)
                i[i == len(tp.doc_ids)] = 0
                cand = cand[tp.doc_ids[i] == cand]
            if len(cand):
                cands.append(cand)
        if not cands:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(cands))

    def search(self, pattern: str) -> pa.Table:
        """→ (doc_id, filename, n_matches, first_match) for matching docs,
        doc_id-sorted.  Counts are non-overlapping leftmost (``finditer`` /
        ``regexp_extract_all`` semantics)."""
        cand = self.candidates(pattern)
        if cand is None:
            raise ValueError(
                "pattern has no required trigram literal — use the distributed "
                "scan (stages.regexscan.regex_scan), not an in-actor corpus scan"
            )
        if len(cand) == 0:
            return _regex_empty()
        bodies = self.reader.content_for(cand)
        text = pa.array([bodies[int(d)] for d in cand], type=pa.string())
        n = pc.count_substring_regex(text, pattern).to_numpy(zero_copy_only=False)
        hit = n > 0
        if not hit.any():
            return _regex_empty()
        first = pc.struct_field(
            pc.extract_regex(text, f"(?P<m>{group_neutral(pattern)})"), "m"
        )
        docs = cand[hit]
        meta = self.reader.resolve_docs(docs, ["filename"])  # unique, doc_id-sorted
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "filename": meta["filename"],
                "n_matches": pa.array(n[hit].astype(np.int64), type=pa.int64()),
                "first_match": first.filter(pa.array(hit)),
            }
        )


def _regex_empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "filename": pa.array([], type=pa.string()),
            "n_matches": pa.array([], type=pa.int64()),
            "first_match": pa.array([], type=pa.string()),
        }
    )


class PrettyPrinter:
    """filename:start:end:line result rendering (pretty_print.go:56-76).

    Doc-major streamed: results arrive sorted by (filename, start) with one
    filename per doc, so each doc's rows are contiguous; bodies are fetched
    ``doc_batch`` docs at a time and released — memory is bounded by the
    chunk, not the result set.  Line boundaries per doc come from one
    C-regex newline scan + searchsorted over all of that doc's matches."""

    _NL = re.compile("\n")

    def __init__(self, reader: IndexReader, doc_batch: int = 256):
        self.reader = reader
        self.doc_batch = doc_batch

    def render(self, phrase_results: pa.Table) -> pa.Table:
        n = len(phrase_results)
        if n == 0:
            return phrase_results.append_column("line", pa.array([], type=pa.string()))
        docs = phrase_results["doc_id"].to_numpy()
        starts = phrase_results["start"].to_numpy()
        ends = phrase_results["end"].to_numpy()
        bounds = np.concatenate(([0], np.nonzero(docs[1:] != docs[:-1])[0] + 1, [n]))
        group_docs = docs[bounds[:-1]]
        lines: list[str | None] = [None] * n
        for gi in range(0, len(group_docs), self.doc_batch):
            bodies = self.reader.content_for(group_docs[gi : gi + self.doc_batch])
            for g in range(gi, min(gi + self.doc_batch, len(group_docs))):
                text = bodies[int(group_docs[g])]
                lo, hi = int(bounds[g]), int(bounds[g + 1])
                nls = np.array([m.start() for m in self._NL.finditer(text)], dtype=np.int64)
                s, e = starts[lo:hi], ends[lo:hi]
                if len(nls):
                    k = np.searchsorted(nls, s)  # rfind("\n", 0, start) + 1
                    ls = np.where(k > 0, nls[np.maximum(k - 1, 0)] + 1, 0)
                    k2 = np.searchsorted(nls, e)  # find("\n", end)
                    le = np.where(k2 < len(nls), nls[np.minimum(k2, len(nls) - 1)], len(text))
                else:
                    ls = np.zeros(hi - lo, dtype=np.int64)
                    le = np.full(hi - lo, len(text), dtype=np.int64)
                for r in range(hi - lo):
                    lines[lo + r] = text[ls[r] : le[r]]
        return phrase_results.append_column("line", pa.array(lines, type=pa.string()))

    def snippets(self, phrase_results: pa.Table, window: int = 20) -> pa.Table:
        """KWIC rendering: a ``window``-rune context slice around each match
        instead of the enclosing line.  Same doc-major streamed body fetch
        as :meth:`render` (memory bounded by ``doc_batch``); offsets are
        rune offsets, so Python slicing == SQL ``substr`` on characters."""
        n = len(phrase_results)
        if n == 0:
            return phrase_results.append_column("snippet", pa.array([], type=pa.string()))
        docs = phrase_results["doc_id"].to_numpy()
        starts = phrase_results["start"].to_numpy()
        ends = phrase_results["end"].to_numpy()
        bounds = np.concatenate(([0], np.nonzero(docs[1:] != docs[:-1])[0] + 1, [n]))
        group_docs = docs[bounds[:-1]]
        snips: list[str | None] = [None] * n
        for gi in range(0, len(group_docs), self.doc_batch):
            bodies = self.reader.content_for(group_docs[gi : gi + self.doc_batch])
            for g in range(gi, min(gi + self.doc_batch, len(group_docs))):
                text = bodies[int(group_docs[g])]
                lo, hi = int(bounds[g]), int(bounds[g + 1])
                s = np.maximum(starts[lo:hi] - window, 0)
                e = np.minimum(ends[lo:hi] + window, len(text))
                for r in range(hi - lo):
                    snips[lo + r] = text[s[r] : e[r]]
        return phrase_results.append_column("snippet", pa.array(snips, type=pa.string()))


class QueryEngine:
    """Actor-pool query evaluator for ``map_batches`` over a query table.

    Input batch columns: query_id:int64, kind:string
    (phrase|ranked|ranked_words|symbol|bool|file|near|wildcard),
    query:string, k:int32 (top-k; for kind=near, the char window).
    Output: query_id, kind, n_results, top JSON-ish summary columns kept
    scalar for Arrow friendliness.
    """

    def __init__(self, index_dir: str, prewarm: bool = True, phrase_limit: int | None = None):
        # phrase_limit=None = reference print-all parity; a bound is the
        # practical scale knob for >10k-match phrases (limited == head of the
        # unlimited ordering, so n_results/head stay comparable)
        self.phrase_limit = phrase_limit
        self.reader = IndexReader(index_dir)
        self.phrase = PhraseSearcher(self.reader)
        self.ranked = BM25Searcher(self.reader)
        self.words = WordSearcher(self.reader)
        self.symbol = SymbolSearcher(self.reader)
        self.file = FileSearcher(self.reader)
        self.bool = BoolSearcher(self.reader)
        self.prox = ProximitySearcher(self.reader)
        self.prefix = PrefixSearcher(self.reader)
        if prewarm:
            # per-actor one-time loads happen at actor CONSTRUCTION (the
            # actor-pool contract: setup in __init__), not inside the first
            # unlucky query: norms, doc_id→filename, the sorted symbols
            # table, and the hottest posting lists (by df).  In sharded-meta
            # mode only the O(#row-groups) range index is prewarmed — data
            # pages resolve per query, bounded by the LRU.
            if self.reader.range_meta is None:
                self.reader._load_norms()
                self.reader._load_meta()
                # hot-term prewarm reads (term_key, df) of the whole segments
                # dataset — fine at whole-corpus-arrays scale, unbounded at
                # sharded scale, so sharded actors warm terms via the LRU
                self.reader.prewarm_hot_terms()
            else:
                self.reader.range_meta._range_index()
            self.symbol._table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        qids, kinds, ns, first, walls = [], [], [], [], []
        for row in batch.to_pylist():
            kind, q = row["kind"], row["query"]
            k = 10 if row.get("k") is None else int(row["k"])  # k=0 is valid
            t0 = time.monotonic()
            if kind == "phrase":
                res = self.phrase.search(q, limit=self.phrase_limit)
                head = res["filename"][0].as_py() if len(res) else ""
            elif kind == "ranked":
                # exhaustive DAAT is the fast path for trigram queries (every
                # term is hot ⇒ WAND's skip potential is low and its per-doc
                # loop costs more than the vectorized scan); topk_wand stays
                # available for selective/high-idf workloads
                res = self.ranked.topk(q, k)
                head = str(res["doc_id"][0].as_py()) if len(res) else ""
            elif kind == "ranked_words":
                res = self.words.topk(q, k)
                head = str(res["doc_id"][0].as_py()) if len(res) else ""
            elif kind == "symbol":
                res = self.symbol.search(q)
                head = res["filename"][0].as_py() if len(res) else ""
            elif kind == "bool":
                res = self.bool.search_str(q)
                head = res["filename"][0].as_py() if len(res) else ""
            elif kind == "near":
                a, _, b = q.partition(" ")
                res = self.prox.near(a, b, k)
                head = res["filename"][0].as_py() if len(res) else ""
            elif kind == "wildcard":
                res = self.prefix.wildcard_docs(q)
                head = res["filename"][0].as_py() if len(res) else ""
            else:
                res = self.file.search(q)
                head = res["filename"][0].as_py() if len(res) else ""
            qids.append(row["query_id"])
            kinds.append(kind)
            ns.append(len(res))
            first.append(head)
            walls.append((time.monotonic() - t0) * 1000.0)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "n_results": pa.array(ns, type=pa.int64()),
                "first_hit": pa.array(first, type=pa.string()),
                "wall_ms": pa.array(walls, type=pa.float64()),
            }
        )
