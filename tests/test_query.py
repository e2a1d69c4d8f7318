"""Query-side golden tests vs the oracle: phrase, BM25 (exhaustive + WAND),
symbols, file filter, pretty-print lines (SURVEY.md §5)."""

import numpy as np
import pytest

from searty_ray.query import (
    BM25Searcher,
    FileSearcher,
    IndexReader,
    PhraseSearcher,
    PrettyPrinter,
    SymbolSearcher,
)

PHRASE_QUERIES = [
    "defun",
    "(defpackage",
    "aaaa",  # self-overlapping trigram (defined divergence, SURVEY.md §3.3)
    "identical content",
    "zzzz-nohit",
    "ab",  # <3 runes → empty by definition
    "あいう",  # multibyte
    "cons",
    "a\t  b",  # whitespace participates in trigrams
]

RANKED_QUERIES = ["defun cons", "loop setf lambda", "あいう", "format", "qqq", "identical content here"]


@pytest.fixture(scope="module")
def reader(fixture_index):
    return IndexReader(fixture_index[0])


@pytest.mark.parametrize("query", PHRASE_QUERIES)
def test_phrase_matches_oracle(reader, fixture_oracle, query):
    eng = PhraseSearcher(reader).search(query).to_pylist()
    ora = [
        {"doc_id": d, "filename": f, "start": s, "end": e}
        for d, f, s, e in fixture_oracle.phrase_search(query)
    ]
    assert eng == ora


@pytest.mark.parametrize("query", RANKED_QUERIES)
@pytest.mark.parametrize("k", [1, 5, 20, 1000])
def test_bm25_rank_identical(reader, fixture_oracle, query, k):
    bm = BM25Searcher(reader)
    eng = [(r["doc_id"], r["score"]) for r in bm.topk(query, k).to_pylist()]
    wnd = [(r["doc_id"], r["score"]) for r in bm.topk_wand(query, k).to_pylist()]
    prn = [(r["doc_id"], r["score"]) for r in bm.topk_pruned(query, k).to_pylist()]
    ora = fixture_oracle.bm25_topk(query, k)
    assert eng == ora  # exact float64 equality: shared scoring, same sum order
    assert wnd == eng  # block-max WAND is exact
    assert prn == eng  # chunk-pruned block-max path is exact too


def test_symbol_search(reader):
    sy = SymbolSearcher(reader)
    r1 = sy.search("PKG0::CONS-0-1") if len(sy.search("pkg0::cons-0-1")) == 0 else sy.search("pkg0::cons-0-1")
    all_defuns = sy.search("cons-0-1")
    # qualified lookup is a subset of unqualified
    assert len(r1) <= len(all_defuns)
    for row in all_defuns.to_pylist():
        assert row["symbol_name"] == "CONS-0-1"
    none = sy.search("does-not-exist-xyz")
    assert len(none) == 0


def test_file_search(reader):
    fs = FileSearcher(reader)
    hits = fs.search("file00")
    assert len(hits) > 0
    assert all("file00" in f for f in hits["filename"].to_pylist())
    assert len(fs.search("zzz-no-such-file")) == 0


def test_pretty_print_lines(reader, fixture_oracle):
    ph = PhraseSearcher(reader)
    res = PrettyPrinter(reader).render(ph.search("defun"))
    for row in res.to_pylist():
        assert row["line"] == fixture_oracle.line_for(row["doc_id"], row["start"], row["end"])
        assert "defun" in row["line"]


def test_phrase_multibyte_rune_offsets(reader, fixture_oracle):
    """Offsets into multibyte content are rune offsets, not bytes."""
    res = PhraseSearcher(reader).search("あいう").to_pylist()
    assert res, "multibyte phrase must hit the fixture file"
    for row in res:
        doc = fixture_oracle.docs[row["doc_id"]]
        assert doc.content[row["start"] : row["start"] + 3] == "あいう"


def test_phrase_limit_is_head_of_unlimited(reader):
    """limit= materializes exactly the first rows of the print-all ordering
    (reference parity stays the default; the bound is the scale knob)."""
    ph = PhraseSearcher(reader)
    full = ph.search("defun")
    assert len(full) > 3
    for lim in (1, 3, len(full), len(full) + 10):
        head = ph.search("defun", limit=lim)
        assert head.equals(full.slice(0, min(lim, len(full))))


def test_pretty_print_small_doc_batch(reader, fixture_oracle):
    """Doc-major streaming with a tiny chunk renders identically."""
    ph = PhraseSearcher(reader)
    res = ph.search("defun")
    a = PrettyPrinter(reader).render(res)
    b = PrettyPrinter(reader, doc_batch=1).render(res)
    assert a.equals(b)


def test_sharded_meta_reader_partial_residency(ray_session, tmp_path):
    """sharded_meta=True serves identical query results while resolving only
    the docmeta row groups the queried doc ids hit (the 10^12-doc
    query-actor state: never whole-corpus norms/filename arrays)."""
    import numpy as np
    import ray.data

    from searty_ray.pipelines.build import build_index
    from searty_ray.query import BM25Searcher, FileSearcher, IndexReader, PhraseSearcher
    from searty_ray.sources.corpus import generate_fixture_corpus

    corpus, _ = generate_fixture_corpus(n_files=40, seed=5)
    d = str(tmp_path / "ix")
    build_index(ray.data.from_arrow(corpus).repartition(8), d, num_parts=4, chunk_span=8,
                tokenizer="trigram+symbols")

    full = IndexReader(d, sharded_meta=False)
    shard = IndexReader(d, sharded_meta=True)
    assert shard.range_meta is not None
    total_rgs = len(shard.range_meta._range_index())
    assert total_rgs > 1, "need multiple docmeta row groups for this test"

    # a lookup touching one narrow id range resolves a strict subset
    one = shard.doc_len(np.array([0], dtype=np.int64))
    assert one == full.doc_len(np.array([0], dtype=np.int64))
    assert 0 < len(shard.range_meta.resolved) < total_rgs

    # full query-path equality across modes
    for q in ("defun", "あいう"):
        a = PhraseSearcher(full).search(q)
        b = PhraseSearcher(shard).search(q)
        assert a.equals(b)
    assert BM25Searcher(full).topk("list cons", 10).equals(
        BM25Searcher(shard).topk("list cons", 10)
    )
    assert FileSearcher(full).search("file00").equals(FileSearcher(shard).search("file00"))
    # WordSearcher (symbol BM25) too — its dense fast path must not assume
    # whole-corpus norms under a sharded reader
    from searty_ray.query import WordSearcher

    assert WordSearcher(full).topk("defun doc", 10).equals(
        WordSearcher(shard).topk("defun doc", 10)
    )


def test_pruned_bm25_skips_chunks_on_skew(ray_session, tmp_path):
    """On a score-skewed corpus the pruned path must (a) return exactly the
    exhaustive ranking and (b) STOP decoding once the k-th score beats the
    next chunk bound — the block-max contract.  One chunk holds massively
    hot documents; every other chunk holds the term once per doc."""
    import pyarrow as pa
    import ray.data

    from searty_ray.pipelines.build import build_index

    rows = []
    for i in range(128):
        hot = i < 8  # sorted-path doc ids: a0000.. sort first → chunk 0
        body = ("zzzz " * 60) if hot else "zzzz "
        rows.append(
            {
                "repo": "r",
                "path": f"a{i:04d}.lisp",
                "commit": "c",
                "lang": "lisp",
                "content": body + f"filler text number {i} common words here",
            }
        )
    corpus = pa.Table.from_pylist(rows)
    d = str(tmp_path / "ix_skew")
    build_index(ray.data.from_arrow(corpus), d, num_parts=4, chunk_span=8)

    r = IndexReader(d)
    bm = BM25Searcher(r)
    bm.PRUNE_BATCH_POSTINGS = 1  # one chunk per read batch → fine-grained exit
    requested: list[int] = []
    orig = r.lookup_doc_chunks

    def spy(keys, chunks):
        requested.extend(int(c) for c in chunks)
        return orig(keys, chunks)

    r.lookup_doc_chunks = spy
    got = bm.topk_pruned("zzzz", 5)  # pruned FIRST: cache untouched by DAAT
    n_chunks = 128 // 8
    assert len(set(requested)) < n_chunks, (
        f"pruned path decoded {len(set(requested))}/{n_chunks} chunks — "
        "no early exit on a skewed corpus"
    )
    # early exit ⇒ no full decode ⇒ the term must NOT have been promoted
    from searty_ray.functions.tokenize import tokenize_query

    keys, _ = tokenize_query("zzzz")
    assert all(int(k) not in r._cache for k in keys)
    exact = bm._topk_exhaustive("zzzz", 5)
    assert got.equals(exact)


def test_position_free_lookup_and_upgrade(fixture_index, fixture_oracle):
    """Ranked lookups skip pos_blob entirely; a later phrase query on the
    SAME reader upgrades the cached position-free entries transparently and
    still matches the oracle. Touching positions on a position-free entry
    without re-lookup fails loudly (never a silent empty)."""
    from searty_ray.functions.tokenize import tokenize_query

    r = IndexReader(fixture_index[0])
    # BM25 first → cache holds position-free entries for the query terms
    bm = BM25Searcher(r)
    eng = [(x["doc_id"], x["score"]) for x in bm.topk("defun cons", 5).to_pylist()]
    assert eng == fixture_oracle.bm25_topk("defun cons", 5)
    keys, _ = tokenize_query("defun cons")
    present = [r._cache[int(k)] for k in keys if r._cache.get(int(k)) is not None]
    assert present, "at least one query term must exist in the fixture corpus"
    tp = present[0]
    assert tp.pos_blob is None, "ranked lookup must be position-free"
    with pytest.raises(RuntimeError, match="position-free"):
        _ = tp.positions
    # phrase on the same reader upgrades the cache in place
    res = PhraseSearcher(r).search("defun").to_pylist()
    ora = [
        {"doc_id": d, "filename": f, "start": s, "end": e}
        for d, f, s, e in fixture_oracle.phrase_search("defun")
    ]
    assert res == ora
    # and a ranked lookup after the upgrade serves the full cached entry
    assert [(x["doc_id"], x["score"]) for x in bm.topk("defun cons", 5).to_pylist()] == eng


def test_random_phrases_match_oracle(reader, fixture_oracle, fixture_index):
    """Drill: 40 substrings sampled from real corpus bodies (random offset
    and length, crossing token/whitespace/paren boundaries) — engine phrase
    results must equal the pure-Python oracle exactly, ranges included."""
    import pyarrow.parquet as pq

    texts = pq.read_table(
        fixture_index[0] + "/documents", columns=["content"]
    )["content"].to_pylist()
    rng = np.random.default_rng(77)
    checked = 0
    ps = PhraseSearcher(reader)
    while checked < 40:
        t = texts[int(rng.integers(len(texts)))]
        if len(t) < 6:
            continue
        ln = int(rng.integers(3, 12))
        st = int(rng.integers(0, max(1, len(t) - ln)))
        q = t[st : st + ln]
        if len(q) < 3:
            continue
        eng = ps.search(q).to_pylist()
        ora = [
            {"doc_id": d, "filename": f, "start": s, "end": e}
            for d, f, s, e in fixture_oracle.phrase_search(q)
        ]
        assert eng == ora, repr(q)
        checked += 1


def test_bool_search_matches_content_oracle(reader, fixture_oracle):
    from searty_ray.query import BoolSearcher

    bs = BoolSearcher(reader)
    cases = [
        (("defun",), ("cons", "setf"), ("zzzz-nohit",)),
        (("defun", "(defpackage"), (), ()),
        ((), ("identical content", "format"), ("cons",)),
        (("defun",), (), ("defun",)),  # self-contradiction → empty
    ]
    for must, should, must_not in cases:
        got = bs.search(must=must, should=should, must_not=must_not)
        exp = sorted(
            d
            for d, doc in fixture_oracle.docs.items()
            if all(p in doc.content for p in must)
            and (not should or any(p in doc.content for p in should))
            and not any(p in doc.content for p in must_not)
        )
        assert got["doc_id"].to_pylist() == exp, (must, should, must_not)

    with pytest.raises(ValueError):
        bs.search(must_not=("defun",))


def test_snippets_are_window_slices(reader, fixture_oracle):
    from searty_ray.query import PrettyPrinter

    ps = PhraseSearcher(reader)
    res = ps.search("defun")
    out = PrettyPrinter(reader).snippets(res, window=7)
    assert out.num_rows == res.num_rows
    for row in out.to_pylist()[:50]:
        text = fixture_oracle.docs[row["doc_id"]].content
        lo = max(row["start"] - 7, 0)
        hi = min(row["end"] + 7, len(text))
        assert row["snippet"] == text[lo:hi]


def test_parse_bool_query():
    from searty_ray.query import parse_bool_query

    must, should, must_not = parse_bool_query('+"merge part" window stream -customer')
    assert must == ("merge part",)
    assert should == ("window", "stream")
    assert must_not == ("customer",)
    assert parse_bool_query('+a -"b c" d') == (("a",), ("d",), ("b c",))
    assert parse_bool_query("") == ((), (), ())


def test_query_engine_bool_kind(fixture_index):
    import ray.data

    from searty_ray.query import BoolSearcher, IndexReader, QueryEngine

    index_dir, _ = fixture_index
    qds = ray.data.from_items(
        [{"query_id": 0, "kind": "bool", "query": '+defun -"zzzz-nohit"', "k": 10}]
    )
    out = qds.map_batches(
        QueryEngine, batch_format="pyarrow", batch_size=4, concurrency=1,
        fn_constructor_kwargs={"index_dir": index_dir},
    ).to_pandas()
    direct = BoolSearcher(IndexReader(index_dir)).search_str('+defun -"zzzz-nohit"')
    assert out["n_results"].iloc[0] == direct.num_rows > 0


def test_snippets_multibyte_rune_offsets(reader, fixture_oracle):
    from searty_ray.query import PrettyPrinter

    res = PhraseSearcher(reader).search("あいう")
    assert res.num_rows > 0, "multibyte phrase must hit the fixture corpus"
    out = PrettyPrinter(reader).snippets(res, window=4)
    for row in out.to_pylist():
        text = fixture_oracle.docs[row["doc_id"]].content
        lo = max(row["start"] - 4, 0)
        hi = min(row["end"] + 4, len(text))
        # offsets are RUNE offsets: Python slicing == substr on characters
        assert row["snippet"] == text[lo:hi]


def test_rrf_fuse_matches_scalar():
    import pandas as pd

    from searty_ray.functions.bm25 import rrf_fuse

    a = pd.DataFrame({"doc_id": [3, 1, 2], "score": [0.9, 0.8, 0.8]})
    b = pd.DataFrame({"doc_id": [2, 9], "score": [1.0, 0.5]})
    out = rrf_fuse([a, b])
    # canonical ranks: a -> 3:1, 1:2 (tie 0.8 broken by doc_id), 2:3
    #                  b -> 2:1, 9:2
    exp = {
        3: 10**6 // 61,
        1: 10**6 // 62,
        2: 10**6 // 63 + 10**6 // 61,
        9: 10**6 // 62,
    }
    got = dict(zip(out["doc_id"], out["rrf_micro"]))
    assert got == exp
    # fused order: descending rrf, doc_id ascending on ties
    assert list(out["doc_id"]) == sorted(exp, key=lambda d: (-exp[d], d))
