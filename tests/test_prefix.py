"""Prefix / wildcard word search: worddict sidecar + PrefixSearcher vs an
independent Python-``re`` reference over the engine's own documents output."""

import os
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from searty_ray.query import IndexReader, PrefixSearcher

SYM = re.compile(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+")


def _reference(index_dir: str, prefix: str):
    docs = pq.read_table(
        os.path.join(index_dir, "documents"), columns=["doc_id", "filename", "content"]
    )
    p = prefix.upper()
    term_df, term_cf = Counter(), Counter()
    per_doc = {}
    for d, fn, c in zip(
        docs["doc_id"].to_pylist(), docs["filename"].to_pylist(), docs["content"].to_pylist()
    ):
        words = [w.upper() for w in SYM.findall(c)]
        hits = [w for w in words if w.startswith(p)]
        if hits:
            cnt = Counter(hits)
            for w, n in cnt.items():
                term_df[w] += 1
                term_cf[w] += n
            per_doc[d] = (fn, len(cnt), sum(cnt.values()))
    return term_df, term_cf, per_doc


def test_prefix_terms_and_docs_match_reference(fixture_index):
    index_dir, _ = fixture_index
    searcher = PrefixSearcher(IndexReader(index_dir))
    for prefix in ["defu", "doc", "pack"]:
        term_df, term_cf, per_doc = _reference(index_dir, prefix)

        t = searcher.terms(prefix)
        assert t["term"].to_pylist() == sorted(term_df)
        assert dict(zip(t["term"].to_pylist(), t["df"].to_pylist())) == dict(term_df)
        assert dict(zip(t["term"].to_pylist(), t["cf"].to_pylist())) == dict(term_cf)

        d = searcher.docs(prefix)
        got = {
            int(i): (fn, int(nt), int(tf))
            for i, fn, nt, tf in zip(
                d["doc_id"].to_pylist(),
                d["filename"].to_pylist(),
                d["n_terms"].to_pylist(),
                d["total_tf"].to_pylist(),
            )
        }
        assert got == per_doc
        # filename-sorted output contract
        assert d["filename"].to_pylist() == sorted(d["filename"].to_pylist())


def test_prefix_no_match_returns_empty(fixture_index):
    index_dir, _ = fixture_index
    searcher = PrefixSearcher(IndexReader(index_dir))
    assert len(searcher.terms("zzzznope")) == 0
    assert len(searcher.docs("zzzznope")) == 0


def test_prefix_requires_worddict(ray_session, tmp_path):
    """Trigram-only builds have no dictionary — the searcher must say so
    rather than return empty results."""
    import ray

    from searty_ray.pipelines.build import build_index
    from searty_ray.sources.corpus import generate_fixture_corpus

    corpus_t, _ = generate_fixture_corpus()
    index_dir = str(tmp_path / "ix_trigram_only")
    build_index(ray.data.from_arrow(corpus_t), index_dir, num_parts=4, chunk_span=16)
    with pytest.raises(FileNotFoundError):
        PrefixSearcher(IndexReader(index_dir)).terms("doc")


def test_worddict_df_cf_consistency(fixture_index):
    """Dictionary df/cf for a prefix range equal the summed postings stats
    of the same keys (two independent build paths must agree)."""
    index_dir, _ = fixture_index
    reader = IndexReader(index_dir)
    searcher = PrefixSearcher(reader)
    lo, hi = searcher._range("doc")
    terms, keys, df, cf = searcher._dict()
    plists = reader.lookup(keys[lo:hi].astype(np.uint64), need_positions=False)
    for i in range(lo, hi):
        tp = plists[int(keys[i])]
        assert tp is not None, terms[i]
        assert tp.df == df[i]
        assert int(tp.tfs.sum()) == cf[i]


def _wild_reference(index_dir: str, pattern: str):
    """Independent wildcard matcher: Python fnmatch-style on upper terms."""
    import fnmatch

    docs = pq.read_table(
        os.path.join(index_dir, "documents"), columns=["doc_id", "filename", "content"]
    )
    p = pattern.upper()
    term_df, term_cf = Counter(), Counter()
    per_doc = {}
    for d, fn, c in zip(
        docs["doc_id"].to_pylist(), docs["filename"].to_pylist(), docs["content"].to_pylist()
    ):
        words = [w.upper() for w in SYM.findall(c)]
        # fnmatch treats [] as classes; terms here never contain brackets
        hits = [w for w in words if fnmatch.fnmatchcase(w, p)]
        if hits:
            cnt = Counter(hits)
            for w, n in cnt.items():
                term_df[w] += 1
                term_cf[w] += n
            per_doc[d] = (fn, len(cnt), sum(cnt.values()))
    return term_df, term_cf, per_doc


@pytest.mark.parametrize(
    "pattern",
    [
        "*un",  # suffix: DEFUN
        "*efu*",  # contains
        "d*n",  # pre*suf: DEFUN, DEFMACRO excluded
        "defun",  # no star: exact term
        "*-3-*",  # contains with dashes (generated names)
        "aa*aa",  # pre*suf at the exact length boundary (AAAA: 4 == 2+2)
    ],
)
def test_wildcard_terms_and_docs_match_reference(fixture_index, pattern):
    index_dir, _ = fixture_index
    searcher = PrefixSearcher(IndexReader(index_dir))
    term_df, term_cf, per_doc = _wild_reference(index_dir, pattern)

    t = searcher.wildcard_terms(pattern)
    assert t["term"].to_pylist() == sorted(term_df)
    assert dict(zip(t["term"].to_pylist(), t["df"].to_pylist())) == dict(term_df)
    assert dict(zip(t["term"].to_pylist(), t["cf"].to_pylist())) == dict(term_cf)

    d = searcher.wildcard_docs(pattern)
    got = {
        int(i): (fn, int(nt), int(tf))
        for i, fn, nt, tf in zip(
            d["doc_id"].to_pylist(),
            d["filename"].to_pylist(),
            d["n_terms"].to_pylist(),
            d["total_tf"].to_pylist(),
        )
    }
    assert got == per_doc


def test_wildcard_overlap_guard(fixture_index):
    """'ab*b' must not match the 2-char term 'AB' (prefix and suffix may not
    overlap) — fnmatch agrees, but a naive startswith&endswith check fails."""
    index_dir, _ = fixture_index
    searcher = PrefixSearcher(IndexReader(index_dir))
    for term in searcher.wildcard_terms("aa*a")["term"].to_pylist():
        assert len(term) >= 3


def test_wildcard_unsupported_pattern_raises(fixture_index):
    index_dir, _ = fixture_index
    searcher = PrefixSearcher(IndexReader(index_dir))
    with pytest.raises(ValueError):
        searcher.wildcard_terms("a*b*c")


def test_reversed_dict_equals_scan(fixture_index):
    """``*suffix`` is served from the persisted reversed-term dictionary
    (binary-search range slice — worddict.py r5); pin it index-for-index
    against the old vectorized vocabulary scan, through both the sidecar
    column and the pre-r5 derived-in-memory fallback."""
    index_dir, _ = fixture_index
    searcher = PrefixSearcher(IndexReader(index_dir))
    t = pq.read_table(os.path.join(index_dir, "worddict"))
    assert "rev_term" in t.schema.names
    assert t["rev_term"].to_pylist() == [s[::-1] for s in t["term"].to_pylist()]

    def check(sufs):
        for suf in sufs:
            got = searcher._match_indices("*" + suf)
            want = np.flatnonzero(np.char.endswith(searcher._terms_u(), suf))
            assert got.tolist() == sorted(want.tolist()), suf

    check(["UN", "N", "A", "ZZZ-NOPE", ""])
    # pre-r5 sidecar fallback: drop the persisted column, re-derive
    searcher.reader._word_dict_rev = None
    searcher.reader._word_dict_rev_raw = None
    check(["UN", "O"])
