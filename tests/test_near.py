"""NEAR/k proximity search (query.ProximitySearcher) vs an independent
Python-``re`` reference over the engine's own documents output — covers
multi-occurrence pair counting, the k window boundary (inclusive), rune
offsets on the multibyte doc, and the both-words-present-but-far drop path."""

import os
import re

import pyarrow.parquet as pq
import pytest

from searty_ray.query import IndexReader, ProximitySearcher

SYM = re.compile(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+")


def _reference(index_dir: str, a: str, b: str, k: int):
    docs = pq.read_table(
        os.path.join(index_dir, "documents"), columns=["doc_id", "filename", "content"]
    )
    au, bu = a.upper(), b.upper()
    out = {}
    for d, fn, c in zip(
        docs["doc_id"].to_pylist(), docs["filename"].to_pylist(), docs["content"].to_pylist()
    ):
        pos_a = [m.start() for m in SYM.finditer(c) if m.group(0).upper() == au]
        pos_b = [m.start() for m in SYM.finditer(c) if m.group(0).upper() == bu]
        gaps = [abs(x - y) for x in pos_a for y in pos_b if abs(x - y) <= k]
        if gaps:
            out[int(d)] = (fn, len(gaps), min(gaps))
    return out


@pytest.mark.parametrize(
    "a,b,k",
    [
        ("defun", "x", 12),
        ("defun", "x", 40),  # wider window: more pairs per doc
        ("x", "defun", 12),  # symmetry
        ("aaaa", "bbb", 5),  # exact boundary: both gaps == 5 (inclusive)
        ("aaaa", "bbb", 4),  # just under: no pair survives
        ("defvar", "*x*", 8),  # symbol chars in the word
    ],
)
def test_near_matches_reference(fixture_index, a, b, k):
    index_dir, _ = fixture_index
    got_t = ProximitySearcher(IndexReader(index_dir)).near(a, b, k)
    got = {
        int(d): (fn, int(n), int(g))
        for d, fn, n, g in zip(
            got_t["doc_id"].to_pylist(),
            got_t["filename"].to_pylist(),
            got_t["n_pairs"].to_pylist(),
            got_t["min_gap"].to_pylist(),
        )
    }
    assert got == _reference(index_dir, a, b, k)
    # doc_id-ascending output contract
    ids = got_t["doc_id"].to_pylist()
    assert ids == sorted(ids)


def test_near_multibyte_doc_uses_rune_offsets(fixture_index):
    """The multibyte fixture doc prefixes (defun あいう (x) x) with a CJK
    comment — 'defun' and 'x' offsets only agree with the Python-str
    reference if the index stores RUNE offsets, not bytes."""
    index_dir, _ = fixture_index
    got_t = ProximitySearcher(IndexReader(index_dir)).near("defun", "x", 40)
    by_file = dict(zip(got_t["filename"].to_pylist(), got_t["min_gap"].to_pylist()))
    fn = "cl-ppcre/src/multibyte.lisp"
    assert fn in by_file
    want = _reference(index_dir, "defun", "x", 40)
    want_gap = {v[0]: v[2] for v in want.values()}[fn]
    assert int(by_file[fn]) == want_gap


def test_near_absent_word_returns_empty(fixture_index):
    index_dir, _ = fixture_index
    s = ProximitySearcher(IndexReader(index_dir))
    assert len(s.near("defun", "zzzznope", 100)) == 0
    assert len(s.near("zzzznope", "defun", 100)) == 0


@pytest.mark.parametrize("a,b,k", [("defun", "x", 12), ("x", "defun", 12), ("aaaa", "bbb", 5)])
def test_near_ordered_matches_reference(fixture_index, a, b, k):
    """Ordered NEAR: b strictly AFTER a within k — asymmetric by design."""
    index_dir, _ = fixture_index
    docs_t = pq.read_table(
        os.path.join(index_dir, "documents"), columns=["doc_id", "filename", "content"]
    )
    au, bu = a.upper(), b.upper()
    want = {}
    for d, fn, c in zip(
        docs_t["doc_id"].to_pylist(), docs_t["filename"].to_pylist(),
        docs_t["content"].to_pylist(),
    ):
        pos_a = [m.start() for m in SYM.finditer(c) if m.group(0).upper() == au]
        pos_b = [m.start() for m in SYM.finditer(c) if m.group(0).upper() == bu]
        gaps = [y - x for x in pos_a for y in pos_b if 0 < y - x <= k]
        if gaps:
            want[int(d)] = (fn, len(gaps), min(gaps))
    got_t = ProximitySearcher(IndexReader(index_dir)).near(a, b, k, ordered=True)
    got = {
        int(d): (fn, int(n), int(g))
        for d, fn, n, g in zip(
            got_t["doc_id"].to_pylist(), got_t["filename"].to_pylist(),
            got_t["n_pairs"].to_pylist(), got_t["min_gap"].to_pylist(),
        )
    }
    assert got == want
