"""Word-level (symbol-term) index tests vs the oracle: occurrences, BM25,
and the kind column."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from searty_ray.functions.codec import decode_meta_blob, decode_pos_blob
from searty_ray.query import IndexReader, WordSearcher


@pytest.fixture(scope="module")
def word_searcher(fixture_index):
    return WordSearcher(IndexReader(fixture_index[0]))


def test_symbol_postings_match_oracle(fixture_index, fixture_oracle):
    index_dir, manifest = fixture_index
    seg = pq.read_table(os.path.join(index_dir, "segments"))
    sym_rows = [r for r in seg.to_pylist() if r["kind"] == 1]
    assert sym_rows, "symbol terms must be present (tokenizer=trigram+symbols)"
    from searty_ray.functions.tokenize import symbol_key

    oracle_sp = fixture_oracle.sym_postings()
    key_to_term = {symbol_key(t): t for t in oracle_sp}
    engine: dict[str, dict[int, list[int]]] = {}
    for r in sorted(sym_rows, key=lambda r: (r["term_key"], r["chunk"])):
        d, t = decode_meta_blob(r["meta_blob"], first_doc_base=r["chunk"] * manifest.chunk_span)
        p = decode_pos_blob(r["pos_blob"], t)
        term = key_to_term.get(int(r["term_key"]))
        assert term is not None, f"engine symbol key {r['term_key']:#x} unknown to oracle"
        tgt = engine.setdefault(term, {})
        off = np.cumsum(t)[:-1]
        for doc, pp in zip(d, np.split(p, off)):
            tgt[int(doc)] = list(pp)
    assert set(engine) == set(oracle_sp)
    for term, pl in engine.items():
        assert pl == oracle_sp[term], term


@pytest.mark.parametrize("word", ["defun", "CONS", "nosuchword-xyz"])
def test_word_occurrences(word_searcher, fixture_oracle, word):
    occ = word_searcher.occurrences(word).to_pylist()
    ora = fixture_oracle.sym_postings().get(word.upper(), {})
    expect = [
        {"doc_id": d, "pos": p} for d in sorted(ora) for p in ora[d]
    ]
    assert occ == expect


@pytest.mark.parametrize("query", ["defun cons", "loop lambda format", "zzz"])
@pytest.mark.parametrize("k", [5, 50])
def test_bm25_words_rank_identical(word_searcher, fixture_oracle, query, k):
    eng = [(r["doc_id"], r["score"]) for r in word_searcher.topk(query, k).to_pylist()]
    assert eng == fixture_oracle.bm25_words(query, k)


def test_sym_doc_len(fixture_index, fixture_oracle):
    reader = IndexReader(fixture_index[0])
    ids = np.array(sorted(fixture_oracle.docs), dtype=np.int64)
    got = reader.sym_doc_len(ids)
    for doc_id, n in zip(ids, got):
        assert n == len(fixture_oracle._sym_tokens(fixture_oracle.docs[int(doc_id)].content))
