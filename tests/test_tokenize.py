"""Tokenizer tests replicating the reference's cases
(/root/reference/lib/tokenizer/tokenizer_test.go:8-28) plus packing."""

import numpy as np

from searty_ray.functions import tokenize as tk


def _terms(s):
    return tk.unpack_terms(tk.pack_trigrams(tk.codepoints(s)))


def test_reference_cases():
    assert _terms("abcd") == ["abc", "bcd"]
    assert _terms("あいうえお") == ["あいう", "いうえ", "うえお"]
    assert _terms("") == []
    assert _terms("ab") == []
    assert _terms("abc") == ["abc"]


def test_pack_order_preserving():
    words = ["aaa", "aab", "ab\t", "zzz", "あいう", "  (", "\n\n("]
    keys = [tk.pack_term(w) for w in words]
    assert sorted(words) == [w for _, w in sorted(zip(keys, words))]


def test_pack_unpack_roundtrip():
    for s in ["abc", "あいう", "\t\n\r", "a b", "((("]:
        assert tk.unpack_term(tk.pack_term(s)) == s


def test_tokenize_doc_groups_positions():
    uniq, tfs, pos = tk.tokenize_doc("abcabc")
    terms = tk.unpack_terms(uniq)
    assert terms == sorted(terms)
    got = {
        t: list(p)
        for t, p in zip(terms, np.split(pos, np.cumsum(tfs[:-1])))
    }
    assert got == {"abc": [0, 3], "bca": [1], "cab": [2]}


def test_tokenize_query_dedup():
    uniq, offs = tk.tokenize_query("aaaa")
    assert len(uniq) == 1 and list(offs[0]) == [0, 1]
    uniq, offs = tk.tokenize_query("ab")
    assert len(uniq) == 0


def test_doc_length():
    assert tk.doc_length("あいうえお") == 3
    assert tk.doc_length("ab") == 0
    assert tk.doc_length("") == 0
