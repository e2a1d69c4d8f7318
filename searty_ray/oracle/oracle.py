"""Single-process pure-Python oracle (SURVEY.md §5).

An independent implementation of the engine's semantics — dict-of-lists
inverted index, Python string slicing for tokenization (strings are
rune-indexed natively, so rune-offset semantics are free) — used as the
golden source for pytest.  Deliberately does NOT use the numpy packed-key
tokenizer or the codec, so it cross-checks them; it shares only the scalar
BM25 formula (functions/bm25.py), which defines "rank-identical scores".

Semantics locked to the reference:
* trigram windows over runes, position = rune offset
  (/root/reference/lib/tokenizer/tokenizer.go:9-33)
* phrase = trigram AND + relative-position intersect, match range
  [p, p+len(query_runes)], overlapping ranges merged, results sorted by
  (filename, start)  (/root/reference/lib/searcher/phrase_searcher.go:71-186)
* symbol query parsing: "pkg::name" | "pkg:name" | "name", uppercased
  (/root/reference/lib/searcher/definition_searcher.go:12-55)
* defined divergences (SURVEY.md §3.3): queries shorter than 3 runes return
  empty; repeated trigrams are deduped for AND but all offsets participate
  in the positional intersect.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from ..functions import bm25


@dataclass
class OracleDoc:
    doc_id: int
    filename: str
    content: str

    @property
    def n_tokens(self) -> int:
        return max(len(self.content) - 2, 0)

    @property
    def sha256(self) -> str:
        return hashlib.sha256(self.content.encode("utf-8")).hexdigest()


@dataclass
class OracleIndex:
    docs: dict[int, OracleDoc] = field(default_factory=dict)
    postings: dict[str, dict[int, list[int]]] = field(default_factory=dict)

    @classmethod
    def build(cls, rows: list[tuple[int, str, str]]) -> "OracleIndex":
        """rows = [(doc_id, filename, content)]"""
        ix = cls()
        for doc_id, filename, content in rows:
            ix.docs[doc_id] = OracleDoc(doc_id, filename, content)
            for pos in range(len(content) - 2):
                term = content[pos : pos + 3]
                ix.postings.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        return ix

    # -- stats ---------------------------------------------------------------

    @property
    def n_docs(self) -> int:
        return len(self.docs)

    @property
    def avgdl(self) -> float:
        return sum(d.n_tokens for d in self.docs.values()) / max(self.n_docs, 1)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(len(v) for v in self.postings.get(term, {}).values())

    # -- phrase search -------------------------------------------------------

    def phrase_search(self, query: str) -> list[tuple[int, str, int, int]]:
        """→ [(doc_id, filename, start, end)] merged, sorted by (filename, start)."""
        bases = self.phrase_base_positions(query)
        results = []
        qlen = len(query)
        for doc_id, starts in bases.items():
            for s, e in _merge_ranges([(p, p + qlen) for p in sorted(starts)]):
                results.append((doc_id, self.docs[doc_id].filename, s, e))
        results.sort(key=lambda r: (r[1], r[2]))
        return results

    def phrase_base_positions(self, query: str) -> dict[int, list[int]]:
        """doc_id → ascending base positions where the full phrase matches."""
        if len(query) < 3:
            return {}
        offsets_by_term: dict[str, list[int]] = {}
        for off in range(len(query) - 2):
            offsets_by_term.setdefault(query[off : off + 3], []).append(off)
        for term in offsets_by_term:
            if term not in self.postings:
                return {}
        doc_sets = [set(self.postings[t]) for t in offsets_by_term]
        candidates = set.intersection(*doc_sets)
        out: dict[int, list[int]] = {}
        for doc_id in candidates:
            base: set[int] | None = None
            for term, offs in offsets_by_term.items():
                pos = set(self.postings[term][doc_id])
                for off in offs:
                    shifted = {p - off for p in pos if p - off >= 0}
                    base = shifted if base is None else (base & shifted)
                    if not base:
                        break
                if not base:
                    break
            if base:
                out[doc_id] = sorted(base)
        return out

    # -- BM25 ----------------------------------------------------------------

    def bm25_topk(self, query: str, k: int) -> list[tuple[int, float]]:
        """Ranked top-k over the query's unique trigrams, OR semantics.

        Terms summed in ascending-term order; ties broken (-score, doc_id).
        """
        terms = sorted({query[i : i + 3] for i in range(len(query) - 2)})
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w = bm25.idf(n, len(plist))
            for doc_id, positions in plist.items():
                tf = len(positions)
                dl = self.docs[doc_id].n_tokens
                contrib = w * float(bm25.tf_norm(np.array([tf]), np.array([dl]), avgdl)[0])
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # -- symbol terms (word-level index; mirrors functions/tokenize.py) ------

    _SYMBOL_RE = None

    def _sym_tokens(self, text: str) -> list[tuple[str, int]]:
        import re

        if OracleIndex._SYMBOL_RE is None:
            OracleIndex._SYMBOL_RE = re.compile(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+")
        return [(m.group(0).upper(), m.start()) for m in OracleIndex._SYMBOL_RE.finditer(text)]

    def sym_postings(self) -> dict[str, dict[int, list[int]]]:
        if not hasattr(self, "_sym_cache"):
            out: dict[str, dict[int, list[int]]] = {}
            for doc_id, doc in self.docs.items():
                for term, pos in self._sym_tokens(doc.content):
                    out.setdefault(term, {}).setdefault(doc_id, []).append(pos)
            self._sym_cache = out
        return self._sym_cache

    def bm25_words(self, query: str, k: int) -> list[tuple[int, float]]:
        """Word-level BM25 over symbol terms; |D| = symbol-token count."""
        words = sorted({t for t, _ in self._sym_tokens(query)})
        sp = self.sym_postings()
        dls = {d: len(self._sym_tokens(doc.content)) for d, doc in self.docs.items()}
        avgdl = sum(dls.values()) / max(len(dls), 1)
        scores: dict[int, float] = {}
        for w in words:
            pl = sp.get(w)
            if not pl:
                continue
            widf = bm25.idf(self.n_docs, len(pl))
            for doc_id, positions in pl.items():
                contrib = widf * float(
                    bm25.tf_norm(np.array([len(positions)]), np.array([dls[doc_id]]), avgdl)[0]
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # -- lines ---------------------------------------------------------------

    def line_for(self, doc_id: int, start: int, end: int) -> str:
        """Enclosing line text (pretty_print.go:11-41): scan to surrounding \\n."""
        text = self.docs[doc_id].content
        ls = text.rfind("\n", 0, start) + 1
        le = text.find("\n", end)
        return text[ls : le if le >= 0 else len(text)]


def _merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Merge overlapping/touching [start, end] intervals (phrase_searcher.go:154-186)."""
    out: list[tuple[int, int]] = []
    for s, e in ranges:
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def parse_symbol(query: str) -> tuple[str, str | None]:
    """'pkg::name' | 'pkg:name' | 'name' → (NAME, PACKAGE|None), uppercased.

    Internal '::' is tried first, like definition_searcher.go:32-55.
    """
    if "::" in query:
        pkg, name = query.split("::", 1)
        return name.upper(), pkg.upper()
    if ":" in query:
        pkg, name = query.split(":", 1)
        return name.upper(), pkg.upper()
    return query.upper(), None
