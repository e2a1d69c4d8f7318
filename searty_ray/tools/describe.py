"""Index describe/dump tooling (SURVEY.md §2.2 M12, §2.5 A8).

``describe`` prints manifest stats and per-partition metrics (the reference's
describe.go dumps).  ``golden_dump`` reproduces the reference's index
snapshot format — sorted filenames, then every term with its count and
per-doc positions (lib/indexer/test/indexer_test.go:42-80) — used by the
pytest golden test; it also re-runs the ascending-docId corruption check
(postinglist.go:96-106) on every list it touches.
"""

from __future__ import annotations

import os
import sys
from typing import TextIO

import numpy as np
import pyarrow.parquet as pq

from ..functions.codec import decode_meta_blob, decode_pos_blob
from ..state.manifest import Manifest


def describe(index_dir: str, dump_terms: bool = False, out: TextIO = sys.stdout) -> None:
    m = Manifest.load(index_dir)
    out.write(
        f"index {index_dir}\n"
        f"  docs={m.n_docs} tokens={m.total_tokens} avgdl={m.avgdl:.3f} "
        f"sym_tokens={m.total_sym_tokens} tokenizer={m.tokenizer}\n"
        f"  chunk_span={m.chunk_span} num_parts={m.num_parts} sub_splits={m.sub_splits}\n"
    )
    total_bytes = sum(p.get("bytes", 0) for p in m.partitions.values())
    total_segments = sum(p.get("segments", 0) for p in m.partitions.values())
    out.write(f"  partitions={len(m.partitions)} segments={total_segments} bytes={total_bytes}\n")
    for k in ("docs_stage_s", "postings_stage_s", "total_s"):
        if k in m.metrics:
            out.write(f"  {k}={m.metrics[k]}\n")
    if dump_terms:
        for line in golden_dump(index_dir):
            out.write(line + "\n")


def _go_quote(s: str) -> str:
    """Go ``%#v`` string quoting for the character set the corpus uses
    (ASCII + printable unicode + \\t \\n \\r): json.dumps matches
    strconv.Quote for these; exotic control chars may diverge (documented)."""
    import json

    return json.dumps(s, ensure_ascii=False)


def reference_snapshot_dump(index_dir: str) -> list[str]:
    """The EXACT reference index-snapshot shape
    (/root/reference/lib/indexer/test/indexer_test.go:42-80, .snapshot):

        <filename>                      (all docs, sorted by filename)
        "<term>": count = <df>          (terms sorted byte-wise, Go-quoted)
        <filename> [p1 p2 ...]          (per doc, ascending doc id)

    Built from the engine's own segments; corruption checks (ascending doc
    ids, postinglist.go:96-106) run on every list."""
    m = Manifest.load(index_dir)
    docs = pq.read_table(os.path.join(index_dir, "documents"), columns=["doc_id", "filename"])
    fn = dict(zip(docs["doc_id"].to_pylist(), docs["filename"].to_pylist()))
    lines = sorted(fn.values())

    seg = pq.read_table(
        os.path.join(index_dir, "segments"),
        columns=["term_key", "term", "kind", "chunk", "meta_blob", "pos_blob"],
    )
    by_term: dict[str, list[dict]] = {}
    for r in seg.to_pylist():
        if r["kind"] != 0:  # trigram terms only — the reference has no symbol terms
            continue
        by_term.setdefault(r["term"], []).append(r)

    for term in sorted(by_term, key=lambda t: t.encode("utf-8")):
        rows = sorted(by_term[term], key=lambda r: r["chunk"])
        doc_lines: list[str] = []
        prev_doc = -1
        for r in rows:
            d, t = decode_meta_blob(r["meta_blob"], first_doc_base=r["chunk"] * m.chunk_span)
            p = decode_pos_blob(r["pos_blob"], t)
            assert len(d) == 0 or (np.diff(d) > 0).all(), f"corrupt list for {term!r}"
            assert prev_doc < (int(d[0]) if len(d) else prev_doc + 1), f"chunk overlap for {term!r}"
            if len(d):
                prev_doc = int(d[-1])
            off = np.cumsum(t)[:-1]
            for doc, pp in zip(d, np.split(p, off)):
                doc_lines.append(f"{fn[int(doc)]} [{' '.join(str(int(x)) for x in pp)}]")
        lines.append(f"{_go_quote(term)}: count = {len(doc_lines)}")
        lines.extend(doc_lines)
    return lines


def reference_phrase_dump(index_dir: str, query: str) -> list[str]:
    """The EXACT Test_SearchPhrase output shape
    (lib/searcher/searcher_test.go:12-31, pretty_print.go:56-76):
    ``filename:start:end:line`` per merged match range."""
    from ..query import IndexReader, PhraseSearcher, PrettyPrinter

    reader = IndexReader(index_dir)
    res = PrettyPrinter(reader).render(PhraseSearcher(reader).search(query))
    return [f"{r['filename']}:{r['start']}:{r['end']}:{r['line']}" for r in res.to_pylist()]


def golden_dump(index_dir: str, kinds: tuple[int, ...] = (0,)) -> list[str]:
    """Reference-snapshot-shaped dump: filenames, then term → postings."""
    m = Manifest.load(index_dir)
    docs = pq.read_table(os.path.join(index_dir, "documents"), columns=["doc_id", "filename"])
    fn = dict(zip(docs["doc_id"].to_pylist(), docs["filename"].to_pylist()))
    lines = [f"file: {name}" for name in sorted(fn.values())]

    seg = pq.read_table(
        os.path.join(index_dir, "segments"),
        columns=["term_key", "term", "kind", "chunk", "meta_blob", "pos_blob"],
    )
    by_term: dict[tuple[int, str], list[dict]] = {}
    for r in seg.to_pylist():
        if r["kind"] not in kinds:
            continue
        by_term.setdefault((int(r["term_key"]), r["term"]), []).append(r)

    for (_, term), rows in sorted(by_term.items(), key=lambda kv: kv[0][1]):
        rows.sort(key=lambda r: r["chunk"])
        total = 0
        doc_lines = []
        prev_doc = -1
        for r in rows:
            d, t = decode_meta_blob(r["meta_blob"], first_doc_base=r["chunk"] * m.chunk_span)
            p = decode_pos_blob(r["pos_blob"], t)
            assert len(d) == 0 or (np.diff(d) > 0).all(), f"corrupt list for {term!r}"
            assert prev_doc < (int(d[0]) if len(d) else prev_doc + 1), f"chunk overlap for {term!r}"
            if len(d):
                prev_doc = int(d[-1])
            off = np.cumsum(t)[:-1]
            for doc, pp in zip(d, np.split(p, off)):
                total += len(pp)
                doc_lines.append(f"  {fn[int(doc)]}: {list(map(int, pp))}")
        lines.append(f"term: {term!r} count: {total}")
        lines.extend(sorted(doc_lines))
    return lines
