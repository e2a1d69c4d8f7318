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
from collections import OrderedDict
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
from .functions.tokenize import tokenize_query
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
    pos_blobs: list[tuple[bytes, np.ndarray]] | None = None  # (blob, chunk tfs)

    _positions: np.ndarray | None = None
    _base_keys: np.ndarray | None = None

    @property
    def positions(self) -> np.ndarray:
        """Flattened per-doc positions (lengths = tfs); decoded on demand."""
        if self._positions is None:
            if not self.pos_blobs:
                self._positions = np.empty(0, dtype=np.int32)
            else:
                self._positions = np.concatenate(
                    [decode_pos_blob(blob, t) for blob, t in self.pos_blobs]
                )
        return self._positions

    def base_keys(self) -> np.ndarray:
        """Ascending (doc << 33 | pos) keys of every occurrence (cached):
        the phrase intersect operates on shifted views of these."""
        if self._base_keys is None:
            self._base_keys = (
                np.repeat(self.doc_ids, self.tfs) * _POS_SPAN + self.positions.astype(np.int64)
            )
        return self._base_keys

    def pos_slices(self) -> np.ndarray:
        return np.cumsum(self.tfs) - self.tfs

    def doc_positions(self, doc_id: int) -> np.ndarray:
        i = int(np.searchsorted(self.doc_ids, doc_id))
        if i >= len(self.doc_ids) or self.doc_ids[i] != doc_id:
            return np.empty(0, dtype=np.int32)
        s = int(self.pos_slices()[i])
        return self.positions[s : s + int(self.tfs[i])]


class IndexReader:
    """Read-side view of one index directory (manifest + lazy doc metadata)."""

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        self.index_dir = index_dir
        self.manifest = Manifest.load(index_dir)
        self.seg_root = os.path.join(index_dir, "segments")
        self._norm_ids: np.ndarray | None = None
        self._norm_len: np.ndarray | None = None
        self._meta_ids: np.ndarray | None = None
        self._meta_filenames: np.ndarray | None = None
        self._cache: OrderedDict[int, TermPostings | None] = OrderedDict()
        self._cache_cap = cache_terms

    # -- documents ----------------------------------------------------------

    def documents(self, columns: list[str] | None = None) -> pa.Table:
        return pq.read_table(os.path.join(self.index_dir, "documents"), columns=columns)

    def _load_norms(self) -> None:
        if self._norm_ids is None:
            t = self.documents(["doc_id", "n_tokens"])
            ids = t["doc_id"].to_numpy()
            order = np.argsort(ids)
            self._norm_ids = ids[order]
            self._norm_len = t["n_tokens"].to_numpy()[order]

    def doc_len(self, doc_ids: np.ndarray) -> np.ndarray:
        """Norms lookup (BM25 |D|).  In-memory per actor at sandbox scale; at
        10^12 docs this shards by doc range alongside the segment chunks."""
        self._load_norms()
        idx = np.searchsorted(self._norm_ids, doc_ids)
        return self._norm_len[idx]

    def sym_doc_len(self, doc_ids: np.ndarray) -> np.ndarray:
        """Symbol-token norms (BM25 |D| for the symbol-term index)."""
        if getattr(self, "_sym_norm_len", None) is None:
            t = self.documents(["doc_id", "n_sym_tokens"])
            ids = t["doc_id"].to_numpy()
            order = np.argsort(ids)
            self._sym_norm_ids = ids[order]
            self._sym_norm_len = t["n_sym_tokens"].to_numpy()[order]
        idx = np.searchsorted(self._sym_norm_ids, doc_ids)
        return self._sym_norm_len[idx]

    def resolve_docs(self, doc_ids: np.ndarray, columns: list[str]) -> pa.Table:
        """Selective metadata fetch for result docs (J1 broadcast-side join).

        Cached doc_id→filename arrays per reader (the per-actor broadcast
        side); at 10^12 docs this becomes a doc-range-sharded selective
        parquet read like :meth:`content_for`."""
        if columns == ["filename"]:
            if self._meta_ids is None:
                t = self.documents(["doc_id", "filename"])
                ids = t["doc_id"].to_numpy()
                order = np.argsort(ids)
                self._meta_ids = ids[order]
                self._meta_filenames = np.asarray(t["filename"].to_pylist(), dtype=object)[order]
            uniq = np.unique(doc_ids)
            idx = np.searchsorted(self._meta_ids, uniq)
            return pa.table(
                {
                    "doc_id": pa.array(uniq, type=pa.int64()),
                    "filename": pa.array(self._meta_filenames[idx].tolist(), type=pa.string()),
                }
            )
        t = self.documents(["doc_id", *columns])
        mask = pc.is_in(t["doc_id"], value_set=pa.array(np.unique(doc_ids), type=pa.int64()))
        return t.filter(mask)

    def content_for(self, doc_ids: np.ndarray) -> dict[int, str]:
        """Body fetch from the content sidecar (J2 semi-join by doc_id)."""
        ds = pads.dataset(os.path.join(self.index_dir, "documents"))
        t = ds.to_table(filter=pads.field("doc_id").isin([int(d) for d in np.unique(doc_ids)]))
        return dict(zip(t["doc_id"].to_pylist(), t["content"].to_pylist()))

    # -- postings -----------------------------------------------------------

    def lookup(self, term_keys: np.ndarray) -> dict[int, TermPostings | None]:
        """Posting lists for the given packed term keys (None = absent).

        Batches the parquet reads per partition file, merges chunks in chunk
        order (doc-disjoint by construction), caches per-term results (LRU).
        """
        out: dict[int, TermPostings | None] = {}
        missing: list[int] = []
        for key in (int(k) for k in term_keys):
            if key in self._cache:
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

        rows: dict[int, list[tuple]] = {k: [] for k in missing}
        span = self.manifest.chunk_span
        for part, keys in sorted(by_part.items()):
            part_dir = os.path.join(self.seg_root, f"part={part:05d}")
            if not os.path.isdir(part_dir):
                continue
            # one batched read across the partition's chunk-group files —
            # row-group statistics on the sorted term_key column prune I/O
            t = pads.dataset(part_dir).to_table(
                filter=pads.field("term_key").isin([np.uint64(k) for k in keys]),
                columns=["term_key", "chunk", "df", "cf", "meta_blob", "pos_blob", "block_last_doc", "block_max_tf", "block_max_score"],
            ).combine_chunks()
            if len(t) == 0:
                continue
            tk = t["term_key"].to_numpy(zero_copy_only=False)
            chunk = t["chunk"].to_numpy(zero_copy_only=False)
            df_col = t["df"].to_numpy(zero_copy_only=False)
            cf_col = t["cf"].to_numpy(zero_copy_only=False)
            # bulk meta decode: row blobs are adjacent → ONE varint pass for
            # the whole read; per-row slices recovered from [1+2·df] counts
            meta_col = t.column("meta_blob").chunk(0)
            meta_vals = varint_decode(_binary_values(meta_col)).astype(np.int64)
            row_nvals = 1 + 2 * df_col
            row_off = np.concatenate(([0], np.cumsum(row_nvals)))
            pos_col = t.column("pos_blob").chunk(0)
            pos_off = _binary_offsets(pos_col)
            pos_buf = _binary_values(pos_col)
            bl_col = t.column("block_last_doc").chunk(0)
            bc_col = t.column("block_max_score").chunk(0)
            for i in range(len(t)):
                o, df_i = int(row_off[i]), int(df_col[i])
                gaps = meta_vals[o + 1 : o + 1 + df_i]
                d = np.cumsum(gaps) + int(chunk[i]) * span
                tf = meta_vals[o + 1 + df_i : o + 1 + 2 * df_i].astype(np.int32)
                blob = bytes(pos_buf[int(pos_off[i]) : int(pos_off[i + 1])])
                rows[int(tk[i])].append(
                    (
                        int(chunk[i]),
                        int(df_i),
                        int(cf_col[i]),
                        d,
                        tf,
                        blob,
                        np.asarray(bl_col[i].as_py(), dtype=np.int64),
                        np.asarray(bc_col[i].as_py(), dtype=np.float64),
                    )
                )

        for key in missing:
            out[key] = tp = self._merge_chunks(rows[key])
            self._cache[key] = tp
            if len(self._cache) > self._cache_cap:
                self._cache.popitem(last=False)
        return out

    def _merge_chunks(self, chunk_rows: list[tuple]) -> TermPostings | None:
        if not chunk_rows:
            return None
        chunk_rows.sort(key=lambda r: r[0])
        return TermPostings(
            df=sum(r[1] for r in chunk_rows),
            cf=sum(r[2] for r in chunk_rows),
            doc_ids=np.concatenate([r[3] for r in chunk_rows]),
            tfs=np.concatenate([r[4] for r in chunk_rows]),
            block_last_doc=np.concatenate([r[6] for r in chunk_rows]),
            block_core=np.concatenate([r[7] for r in chunk_rows]),
            pos_blobs=[(r[5], r[4]) for r in chunk_rows],
        )


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
        """→ (doc_ids, base_positions) of every full-phrase match, doc-major."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        keys, offsets = tokenize_query(query)
        if len(keys) == 0:
            return empty
        plists = self.reader.lookup(keys)
        if any(plists[int(k)] is None for k in keys):
            return empty  # any missing term ⇒ nil results (phrase_searcher.go:219-221)

        # one sorted (doc, base) key array per constraint; rarest-first
        # intersection via searchsorted keeps cost ~ |rarest| · #constraints
        # instead of a global sort of every term's postings.  Keys are
        # already ascending: doc_ids asc, per-doc positions asc.
        constraints = []
        for k, offs in zip(keys, offsets):
            tp = plists[int(k)]
            bk = tp.base_keys()
            for off in offs:
                if off == 0:
                    constraints.append(bk)
                else:
                    shifted = bk - int(off)
                    # drop occurrences whose pos < off (would wrap into the
                    # previous doc's key range)
                    constraints.append(shifted[tp.positions >= off])
        constraints.sort(key=len)
        cur = constraints[0]
        for other in constraints[1:]:
            if len(cur) == 0 or len(other) == 0:
                cur = cur[:0]
                break
            idx = np.searchsorted(other, cur)
            idx[idx == len(other)] = 0  # safe gather; mismatch filtered below
            cur = cur[other[idx] == cur]
        return (cur // _POS_SPAN).astype(np.int64), (cur % _POS_SPAN).astype(np.int64)

    def search(self, query: str) -> pa.Table:
        """→ (doc_id, filename, start, end), ranges merged, sorted (filename, start)."""
        docs, bases = self.base_positions(query)
        qlen = len(query)
        starts, ends, out_docs = _merge_ranges_vec(docs, bases, qlen)
        if len(out_docs) == 0:
            return _phrase_empty()
        meta = self.reader.resolve_docs(out_docs, ["filename"])
        fn = dict(zip(meta["doc_id"].to_pylist(), meta["filename"].to_pylist()))
        filenames = [fn[int(d)] for d in out_docs]
        t = pa.table(
            {
                "doc_id": pa.array(out_docs, type=pa.int64()),
                "filename": pa.array(filenames, type=pa.string()),
                "start": pa.array(starts, type=pa.int64()),
                "end": pa.array(ends, type=pa.int64()),
            }
        )
        return t.sort_by([("filename", "ascending"), ("start", "ascending")])


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


class BM25Searcher:
    """Exhaustive DAAT (baseline) and block-max WAND top-k (O4)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def _cursors(self, query: str) -> list[TermCursor]:
        keys, _ = tokenize_query(query)
        if len(keys) == 0:
            return []
        plists = self.reader.lookup(keys)
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
                )
            )
        return cursors

    def topk(self, query: str, k: int) -> pa.Table:
        """Exhaustive DAAT: vectorized per-term accumulation in ascending-term
        order.  With dense doc ids (sort-mode assignment) scores accumulate
        into a doc-indexed array — no unique/searchsorted per term."""
        cursors = self._cursors(query)
        m = self.reader.manifest
        if not cursors:
            return _topk_empty()
        if m.max_doc_id + 1 == m.n_docs:  # dense ids fast path
            self.reader._load_norms()
            dl = self.reader._norm_len  # norms sorted by doc_id == index
            scores = np.zeros(m.n_docs, dtype=np.float64)
            for c in cursors:
                scores[c.doc_ids] += c.idf * bm25.tf_norm(c.tfs, dl[c.doc_ids], m.avgdl)
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
        plists = self.reader.lookup(keys)
        m = self.reader.manifest
        present = [(w, plists[int(symbol_key(w))]) for w in words]
        present = [(w, tp) for w, tp in present if tp is not None]
        if not present:
            return _topk_empty()
        if m.max_doc_id + 1 == m.n_docs:  # dense ids fast path
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


class SymbolSearcher:
    """Symbol-definition lookup (definition_searcher.go:102-125)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader
        self.symbols_path = os.path.join(reader.index_dir, "symbols")

    def search(self, query: str) -> pa.Table:
        name, package = parse_symbol(query)
        if not os.path.isdir(self.symbols_path) or not os.listdir(self.symbols_path):
            return _symbol_empty()
        ds = pads.dataset(self.symbols_path)
        flt = (pads.field("name") == name) & (pads.field("identifier_type") == "symbol")
        if package is not None:
            flt = flt & (pads.field("package") == package)
        t = ds.to_table(filter=flt)
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
    print-only stub (file_searcher.go:20-33)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def search(self, query: str) -> pa.Table:
        t = self.reader.documents(["doc_id", "filename"])
        return t.filter(pc.match_substring(t["filename"], query)).sort_by("filename")


class PrettyPrinter:
    """filename:start:end:line result rendering (pretty_print.go:56-76)."""

    def __init__(self, reader: IndexReader):
        self.reader = reader

    def render(self, phrase_results: pa.Table) -> pa.Table:
        doc_ids = phrase_results["doc_id"].to_numpy()
        if len(doc_ids) == 0:
            return phrase_results.append_column("line", pa.array([], type=pa.string()))
        bodies = self.reader.content_for(doc_ids)
        lines = []
        for row in phrase_results.to_pylist():
            text = bodies[row["doc_id"]]
            ls = text.rfind("\n", 0, row["start"]) + 1
            le = text.find("\n", row["end"])
            lines.append(text[ls : le if le >= 0 else len(text)])
        return phrase_results.append_column("line", pa.array(lines, type=pa.string()))


class QueryEngine:
    """Actor-pool query evaluator for ``map_batches`` over a query table.

    Input batch columns: query_id:int64, kind:string (phrase|ranked|symbol|file),
    query:string, k:int32.  Output: query_id, kind, n_results, top JSON-ish
    summary columns kept scalar for Arrow friendliness.
    """

    def __init__(self, index_dir: str):
        self.reader = IndexReader(index_dir)
        self.phrase = PhraseSearcher(self.reader)
        self.ranked = BM25Searcher(self.reader)
        self.words = WordSearcher(self.reader)
        self.symbol = SymbolSearcher(self.reader)
        self.file = FileSearcher(self.reader)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        qids, kinds, ns, first, walls = [], [], [], [], []
        for row in batch.to_pylist():
            kind, q = row["kind"], row["query"]
            k = int(row.get("k") or 10)
            t0 = time.monotonic()
            if kind == "phrase":
                res = self.phrase.search(q)
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
