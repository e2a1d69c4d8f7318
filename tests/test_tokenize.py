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


def test_tokenize_combine_batch_global_equals_per_doc():
    """Property: the batch-GLOBAL TokenizeCombine (one joined codepoint pass
    + one lexsort) emits exactly the runs a per-document tokenize_doc oracle
    would — random unicode content, short docs, empties, multibyte."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    from searty_ray.functions.codec import decode_pos_blob, varint_decode, segmented_undelta
    from searty_ray.functions.tokenize import tokenize_doc, tokenize_doc_symbols
    from searty_ray.stages.encode_stage import _binary_values
    from searty_ray.stages.tokenize_stage import TokenizeCombine

    alphabet = st.sampled_from(list("ab z\n()-*日本語x"))
    texts_s = st.lists(st.text(alphabet, min_size=0, max_size=40), min_size=1, max_size=8)

    @settings(max_examples=40, deadline=None)
    @given(texts=texts_s)
    def check(texts):
        span = 8
        batch = pa.table(
            {
                "doc_id": pa.array(list(range(0, 3 * len(texts), 3)), type=pa.int64()),
                "content": pa.array(texts, type=pa.large_string()),
            }
        )
        runs = TokenizeCombine(span, emit_symbols=True)(batch)
        # decode the emitted runs back into (term -> {doc -> positions})
        got: dict[int, dict[int, list[int]]] = {}
        if len(runs):
            n_docs = runs["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
            dgap = varint_decode(_binary_values(runs.column("doc_blob").combine_chunks()))
            docs = segmented_undelta(dgap, n_docs)
            tfs = varint_decode(_binary_values(runs.column("tf_blob").combine_chunks())).astype(np.int64)
            pos = decode_pos_blob(_binary_values(runs.column("pos_blob").combine_chunks()), tfs)
            tk = np.repeat(runs["term_key"].to_numpy(zero_copy_only=False).astype(np.uint64), n_docs)
            off = np.cumsum(tfs) - tfs
            for i, (k, d) in enumerate(zip(tk, docs)):
                got.setdefault(int(k), {})[int(d)] = pos[off[i] : off[i] + tfs[i]].tolist()
        # per-doc oracle
        want: dict[int, dict[int, list[int]]] = {}
        for di, text in zip(batch["doc_id"].to_pylist(), texts):
            for fn in (tokenize_doc, tokenize_doc_symbols):
                uniq, tfs_d, positions = fn(text)
                o = np.cumsum(tfs_d) - tfs_d
                for j, k in enumerate(uniq):
                    want.setdefault(int(k), {})[di] = positions[o[j] : o[j] + tfs_d[j]].tolist()
        assert got == want

    check()


def test_symbol_lengths_batch_equals_per_row():
    """Property: the byte-level batch kernel in doc_stage equals the per-row
    codepoint-level symbol_doc_length on random unicode (multibyte chars are
    non-constituent in both; row boundaries can't leak runs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    from searty_ray.functions.tokenize import symbol_doc_length
    from searty_ray.stages.doc_stage import _symbol_lengths
    from searty_ray.stages.encode_stage import _binary_offsets, _binary_values

    alphabet = st.sampled_from(list("ab z\n()-*+?日本語語x09_."))
    texts_s = st.lists(st.text(alphabet, min_size=0, max_size=30), min_size=1, max_size=10)

    @settings(max_examples=60, deadline=None)
    @given(texts=texts_s)
    def check(texts):
        arr = pa.array(texts, type=pa.large_string())
        offs = _binary_offsets(arr)
        buf = np.frombuffer(_binary_values(arr), dtype=np.uint8)
        got = _symbol_lengths(buf, offs).tolist()
        assert got == [symbol_doc_length(t) for t in texts]

    check()
