"""End-to-end build correctness vs the pure-Python oracle (SURVEY.md §5):
postings equality, sha256 invariant, ascending-docId corruption check,
manifest stats, chunked segments, resume."""

import os

import numpy as np
import pyarrow.parquet as pq

from searty_ray.functions.codec import decode_meta_blob, decode_pos_blob
from searty_ray.functions.tokenize import unpack_term


def _decode_row(r, chunk_span):
    d, t = decode_meta_blob(r["meta_blob"], first_doc_base=r["chunk"] * chunk_span)
    p = decode_pos_blob(r["pos_blob"], t)
    return d, t, p


def test_manifest_stats(fixture_index, fixture_oracle):
    _, manifest = fixture_index
    assert manifest.n_docs == fixture_oracle.n_docs
    assert abs(manifest.avgdl - fixture_oracle.avgdl) < 1e-9
    assert manifest.n_chunks == manifest.max_doc_id // manifest.chunk_span + 1


def test_sha256_invariant(fixture_index):
    """input_hint per-row invariant: documents.content_sha256 == sha256(source content)."""
    import hashlib

    index_dir, _ = fixture_index
    joined = pq.read_table(os.path.join(index_dir, "documents")).to_pandas()
    for _, row in joined.iterrows():
        assert row.content_sha256 == hashlib.sha256(row.content.encode()).hexdigest()
        assert row.n_tokens == max(len(row.content) - 2, 0)


def test_doc_ids_deterministic_sort(fixture_index):
    index_dir, _ = fixture_index
    docs = pq.read_table(os.path.join(index_dir, "documents")).to_pandas().sort_values("doc_id")
    keys = list(zip(docs.repo, docs.path, docs["commit"]))
    assert keys == sorted(keys)
    assert list(docs.doc_id) == list(range(len(docs)))


def test_postings_match_oracle(fixture_index, fixture_oracle):
    """Every (term, doc, positions) triple identical to the oracle index, and
    every posting list ascending (postinglist.go:96-106 CheckCorruption)."""
    index_dir, manifest = fixture_index
    seg = pq.read_table(os.path.join(index_dir, "segments"))
    engine: dict[str, dict[int, list[int]]] = {}
    rows = [r for r in seg.to_pylist() if r["kind"] == 0]
    rows.sort(key=lambda r: (r["term_key"], r["chunk"]))
    for r in rows:
        d, t, p = _decode_row(r, manifest.chunk_span)
        assert (np.diff(d) > 0).all()
        assert r["df"] == len(d)
        assert r["cf"] == int(t.sum())
        assert r["first_doc"] == int(d[0])
        # chunk invariant: all docs inside the chunk's doc range
        assert (d // manifest.chunk_span == r["chunk"]).all()
        term = unpack_term(r["term_key"])
        tgt = engine.setdefault(term, {})
        off = np.cumsum(t)[:-1]
        for doc, pp in zip(d, np.split(p, off)):
            assert doc not in tgt
            tgt[int(doc)] = list(pp)
            assert list(pp) == sorted(pp)
    oracle = {t: {d: v for d, v in pl.items()} for t, pl in fixture_oracle.postings.items()}
    assert set(engine) == set(oracle)
    for term, pl in engine.items():
        assert pl == oracle[term], term


def test_block_metadata(fixture_index):
    index_dir, _ = fixture_index
    seg = pq.read_table(os.path.join(index_dir, "segments"))
    for r in seg.to_pylist():
        d, t, _ = _decode_row(r, 16)
        nblocks = (len(d) + 127) // 128
        assert len(r["block_last_doc"]) == nblocks
        assert r["block_last_doc"][-1] == d[-1]
        assert max(r["block_max_tf"]) == int(t.max())


def test_documents_pass_gap_fill_resume(ray_session, fixture_corpus, tmp_path, monkeypatch):
    """Crash mid-documents-pass: resume rewrites ONLY the uncovered doc
    ranges (confirmed range files skip via their sidecars), deletes
    uncommitted strays, and the refilled table equals the direct build."""
    import ray

    from searty_ray.pipelines import build as build_mod
    from searty_ray.pipelines.build import build_index

    # the production coalesce (DOC_WRITE_BATCH docs/file) would put this
    # 60-doc fixture in ONE range file; force file-per-block granularity so
    # the crash simulation has files to lose
    monkeypatch.setattr(build_mod, "DOC_WRITE_BATCH", 16)
    corpus_t, _ = fixture_corpus
    d1 = str(tmp_path / "ixd1")
    build_index(
        ray.data.from_arrow(corpus_t).repartition(5), d1, num_parts=4, chunk_span=16
    )
    docs_dir = os.path.join(d1, "documents")
    want = pq.read_table(docs_dir).sort_by("doc_id")
    files = sorted(f for f in os.listdir(docs_dir) if f.endswith(".parquet"))
    assert len(files) >= 2, "fixture must produce multiple range files"

    # simulate the crash: stage marker gone, one confirmed file lost, one
    # uncommitted stray present, downstream markers gone too
    os.remove(os.path.join(d1, ".documents.done"))
    victim = files[len(files) // 2]
    os.remove(os.path.join(docs_dir, victim))
    os.remove(os.path.join(docs_dir, f".{victim[:-len('.parquet')]}.done.json"))
    stray = os.path.join(docs_dir, "docs-999999999000-999999999001.parquet")
    with open(stray, "wb") as f:
        f.write(b"not a parquet footer")
    for mk in (".docmeta.done", ".symbols.done"):
        if os.path.exists(os.path.join(d1, mk)):
            os.remove(os.path.join(d1, mk))
    survivors = {
        f: os.path.getmtime(os.path.join(docs_dir, f))
        for f in os.listdir(docs_dir)
        if f.endswith(".parquet") and f != victim and not f.startswith("docs-9999")
    }

    build_index(
        ray.data.from_arrow(corpus_t).repartition(3),  # different layout on purpose
        d1, num_parts=4, chunk_span=16, resume=True,
    )
    assert not os.path.exists(stray), "uncommitted stray must be cleaned"
    got = pq.read_table(docs_dir).sort_by("doc_id")
    assert got.equals(want)
    for f, mtime in survivors.items():
        assert os.path.getmtime(os.path.join(docs_dir, f)) == mtime, (
            f"confirmed file {f} was rewritten on resume"
        )


def test_resume_skips_finished(fixture_index, fixture_corpus, tmp_path):
    """Kill-and-resume: second run with resume=True skips finished partitions
    and produces byte-identical segments."""
    import ray

    from searty_ray.pipelines.build import build_index

    import json

    corpus_t, _ = fixture_corpus
    d1 = str(tmp_path / "ix1")
    m1 = build_index(ray.data.from_arrow(corpus_t), d1, num_parts=4, chunk_span=16)
    # simulate a crash that lost one reducer group's sidecar+file
    sidecars = sorted(os.listdir(os.path.join(d1, "manifest")))
    victim = sidecars[len(sidecars) // 2]
    with open(os.path.join(d1, "manifest", victim)) as f:
        victim_meta = json.load(f)
    os.remove(os.path.join(d1, "manifest", victim))
    os.remove(victim_meta["file"])
    survivors = {
        f: os.path.getmtime(f)
        for f in (
            os.path.join(r, n)
            for r, _, ns in os.walk(os.path.join(d1, "segments"))
            for n in ns
        )
    }
    m2 = build_index(ray.data.from_arrow(corpus_t), d1, num_parts=4, chunk_span=16, resume=True)
    skipped = {p for p, s in m2.partitions.items() if s["skipped"]}
    assert str(victim_meta["pgrp"]) not in skipped
    assert len(skipped) == len(sidecars) - 1
    for f, mtime in survivors.items():
        assert os.path.getmtime(f) == mtime, f"survivor {f} was rewritten"
    # the rebuilt group matches a from-scratch build byte for byte
    d2dir = str(tmp_path / "ix2")
    build_index(ray.data.from_arrow(corpus_t), d2dir, num_parts=4, chunk_span=16)
    rel = os.path.relpath(victim_meta["file"], d1)
    t1 = pq.read_table(victim_meta["file"])
    t2 = pq.read_table(os.path.join(d2dir, rel))
    assert t1.equals(t2)


def test_build_deterministic_across_parallelism(fixture_corpus, tmp_path):
    """Segment tables must be identical regardless of input block layout
    (the batch boundaries change which runs exist, the lexsorted encode must
    not care) — the in-sandbox proxy for N-node vs 4N-node determinism."""
    import ray

    from searty_ray.pipelines.build import build_index

    corpus_t, _ = fixture_corpus
    dirs = []
    for blocks in (2, 7):
        d = str(tmp_path / f"ix_b{blocks}")
        ds = ray.data.from_arrow(corpus_t).repartition(blocks)
        build_index(ds, d, num_parts=4, chunk_span=16)
        dirs.append(d)
    a = pq.read_table(os.path.join(dirs[0], "segments"))
    b = pq.read_table(os.path.join(dirs[1], "segments"))
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    assert a.sort_by(order).equals(b.sort_by(order))


def test_salted_two_phase_merge_bytes_identical(fixture_corpus, tmp_path):
    """SURVEY.md §2.5 A2 pathological case: a df≈N hot term confined to ONE
    chunk.  With salt>1, phase 1 must spread that (term, chunk)'s runs over
    >1 combiner (measured via the salt-group key), and the final segment
    bytes must equal the unsalted build exactly."""
    import numpy as np
    import pyarrow as pa
    import ray

    from searty_ray.functions.hashing import mix64, partition_group
    from searty_ray.pipelines.build import build_index

    # corpus where EVERY doc contains the trigram "zzz" and fits one chunk
    rows = [
        {
            "repo": "hot",
            "path": f"f{i:03d}.lisp",
            "commit": f"c{i}",
            "lang": "commonlisp",
            "content": f"zzzz hot-{i} zzz common text {i}",
        }
        for i in range(64)
    ]
    t = pa.table(
        {
            k: pa.array([r[k] for r in rows],
                        type=pa.large_string() if k == "content" else pa.string())
            for k in ("repo", "path", "commit", "lang", "content")
        }
    )
    dirs = {}
    for salt in (0, 4):
        d = str(tmp_path / f"ix_s{salt}")
        ds = ray.data.from_arrow(t).repartition(8)  # many batches → many runs
        build_index(ds, d, num_parts=4, chunk_span=1024, salt=salt)
        dirs[salt] = d
    a = pq.read_table(os.path.join(dirs[0], "segments"))
    b = pq.read_table(os.path.join(dirs[4], "segments"))
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    assert a.sort_by(order).equals(b.sort_by(order))
    # the hot term lives in exactly one chunk (df == n_docs, chunk 0)
    hot = b.filter(pa.compute.field("term") == "zzz")
    assert hot.num_rows == 1 and hot["df"][0].as_py() == 64
    # >1 phase-1 reducer participates: runs of (zzz, chunk 0) from different
    # batches hash (via their first doc) to >1 salt group
    first_docs = np.arange(0, 64, 8, dtype=np.uint64)  # one run per 8-doc block
    salts = set((mix64(first_docs) % np.uint64(4)).tolist())
    assert len(salts) > 1


def test_hash_doc_ids_batch_composition_independent():
    """Hash-mode ids are a pure function of (repo, path, commit) — the same key
    must hash identically no matter what else shares its batch (mixing only
    real key bytes per row, never batch-max padding rounds)."""
    import pyarrow as pa

    from searty_ray.stages.doc_ids import _hash_ids_batch

    def tbl(rows):
        return pa.table(
            {
                k: pa.array([r[i] for r in rows], type=pa.string())
                for i, k in enumerate(("repo", "path", "commit"))
            }
        )

    short = ("r", "a.lisp", "c1")
    alone = _hash_ids_batch(tbl([short]))["doc_id"][0].as_py()
    with_long = _hash_ids_batch(
        tbl([short, ("repo-with-a-much-longer-name", "deep/nested/path/file.lisp", "c2" * 20)])
    )["doc_id"][0].as_py()
    assert alone == with_long
    # and distinct keys still get distinct ids
    t = _hash_ids_batch(tbl([short, ("r", "a.lisp", "c2"), ("r", "b.lisp", "c1")]))
    ids = t["doc_id"].to_pylist()
    assert len(set(ids)) == 3


def test_build_resume_redoes_partial_documents(ray_session, tmp_path, monkeypatch):
    """A non-empty documents/ dir without its completion marker (crash mid
    write) is rebuilt on resume — never trusted as complete."""
    import glob

    import ray.data

    from searty_ray.pipelines import build as build_mod
    from searty_ray.pipelines.build import build_index
    from searty_ray.sources.corpus import generate_fixture_corpus

    monkeypatch.setattr(build_mod, "DOC_WRITE_BATCH", 4)  # see gap-fill test

    corpus, _ = generate_fixture_corpus(n_files=12, seed=31)
    d = str(tmp_path / "ix")
    m0 = build_index(ray.data.from_arrow(corpus).repartition(4), d, num_parts=2, chunk_span=16)

    files = sorted(glob.glob(os.path.join(d, "documents", "*.parquet")))
    assert len(files) > 1
    os.remove(files[0])  # simulate partial write
    os.remove(os.path.join(d, ".documents.done"))
    os.remove(os.path.join(d, ".docmeta.done"))
    m1 = build_index(ray.data.from_arrow(corpus).repartition(4), d, num_parts=2,
                     chunk_span=16, resume=True)
    assert m1.n_docs == m0.n_docs
    assert pq.read_table(os.path.join(d, "documents")).num_rows == m0.n_docs
    # postings partitions were finished → resumed manifest reports their REAL
    # lineage (not zeros)
    assert all(v.get("skipped") for v in m1.partitions.values())
    assert sum(v["segments"] for v in m1.partitions.values()) == sum(
        v["segments"] for v in m0.partitions.values()
    )


def test_adversarial_skew_corpus(ray_session, tmp_path):
    """Skew drill: a trigram that appears in EVERY doc, one megadoc ~100×
    larger than the rest, and a duplicated path — through the salted build,
    the integrity sweep, and phrase/BM25 queries checked against an
    independent Python scan of the corpus."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from searty_ray.pipelines.build import build_index
    from searty_ray.query import BM25Searcher, IndexReader, PhraseSearcher
    from searty_ray.tools.verify_index import verify_index

    unit = "common phrase alpha beta "      # hot phrase in every doc
    rows = []
    for i in range(120):
        body = unit + f"unique-{i} " + unit
        rows.append(("repo%d" % (i % 3), f"src/f{i:03d}.lisp", body))
    rows.append(("repo0", "src/mega.lisp", unit * 4000))  # ~100 KB megadoc
    corpus = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array(
                [hashlib.sha1(f"{r[0]}/{r[1]}".encode()).hexdigest() for r in rows]
            ),
            "lang": pa.array(["commonlisp"] * len(rows)),
            "content": pa.array([r[2] for r in rows], type=pa.large_string()),
        }
    )
    out = str(tmp_path / "ix_skew")
    build_index(
        ray.data.from_arrow(corpus), out,
        num_parts=4, chunk_span=16, salt=4, extract_symbols=False,
    )
    res = verify_index(out)
    assert res["ok"], res["first_errors"]

    r = IndexReader(out)
    hits = PhraseSearcher(r).search("common phrase")
    # independent oracle: non-overlapping occurrences never merge ranges,
    # so result rows == raw substring occurrences
    expect = sum(_count_occ(r_[2], "common phrase") for r_ in rows)
    assert hits.num_rows == expect
    top = BM25Searcher(r).topk("common phrase", 3)
    assert top.num_rows == 3  # hot term everywhere: scoring still ranks

    # salted output byte-identical to unsalted under this skew
    import pyarrow.parquet as pq

    out0 = str(tmp_path / "ix_skew0")
    build_index(
        ray.data.from_arrow(corpus), out0,
        num_parts=4, chunk_span=16, salt=0, extract_symbols=False,
    )
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    assert (
        pq.read_table(out + "/segments").sort_by(order)
        .equals(pq.read_table(out0 + "/segments").sort_by(order))
    )


def _count_occ(text: str, needle: str) -> int:
    n, start = 0, 0
    while True:
        i = text.find(needle, start)
        if i < 0:
            return n
        n += 1
        start = i + 1
