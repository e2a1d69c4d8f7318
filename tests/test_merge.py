"""Index-level merge: N built indexes → one, no re-tokenization
(pipelines/merge.py; reference parity with searty-merge, merge.go:455-502)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from searty_ray.pipelines.build import build_index
from searty_ray.pipelines.merge import merge_indexes
from searty_ray.query import BM25Searcher, IndexReader, PhraseSearcher, SymbolSearcher
from searty_ray.sources.corpus import generate_fixture_corpus


def _split(corpus: pa.Table, pred) -> pa.Table:
    import pyarrow.compute as pc

    mask = pred(corpus["repo"])
    return corpus.filter(mask)


@pytest.fixture(scope="module")
def merged_setup(ray_session, tmp_path_factory):
    import pyarrow.compute as pc

    root = tmp_path_factory.mktemp("merge")
    corpus, _defs = generate_fixture_corpus(n_files=30, seed=13)
    a = corpus.filter(pc.equal(corpus["repo"], "cl-ppcre"))
    b = corpus.filter(pc.not_equal(corpus["repo"], "cl-ppcre"))
    dirs = {}
    for name, tbl in [("a", a), ("b", b), ("union", corpus)]:
        d = str(root / f"ix_{name}")
        build_index(ray.data.from_arrow(tbl), d, num_parts=4, chunk_span=16,
                    tokenizer="trigram+symbols")
        dirs[name] = d
    out = str(root / "ix_merged")
    merge_indexes([dirs["a"], dirs["b"]], out, num_parts=4, chunk_span=16)
    return dirs, out


def test_merge_segments_byte_identical_to_direct_build(merged_setup):
    """Disjoint shards: merged segments == direct build over the union
    corpus, byte for byte (same ids from the same global sort, same encode
    over the same entry multiset)."""
    dirs, out = merged_setup
    a = pq.read_table(os.path.join(dirs["union"], "segments"))
    b = pq.read_table(os.path.join(out, "segments"))
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    assert a.sort_by(order).equals(b.sort_by(order))


def test_merge_manifest_and_queries(merged_setup):
    dirs, out = merged_setup
    from searty_ray.state.manifest import Manifest

    mu = Manifest.load(dirs["union"])
    mm = Manifest.load(out)
    assert (mm.n_docs, mm.total_tokens, mm.max_doc_id) == (mu.n_docs, mu.total_tokens, mu.max_doc_id)
    ru, rm = IndexReader(dirs["union"]), IndexReader(out)
    pu = PhraseSearcher(ru).search("defun").to_pydict()
    pm = PhraseSearcher(rm).search("defun").to_pydict()
    assert pu == pm
    bu = BM25Searcher(ru).topk("list cons", 10).to_pydict()
    bm = BM25Searcher(rm).topk("list cons", 10).to_pydict()
    assert bu == bm
    su = SymbolSearcher(ru).search("PKG1").to_pydict()
    sm = SymbolSearcher(rm).search("PKG1").to_pydict()
    assert su == sm


def test_merge_dedupes_duplicate_filenames_first_wins(ray_session, tmp_path):
    """Reference semantics (merge.go:164-171): same (repo, path) in two
    shards → the FIRST index's document survives."""

    def mk(content: str) -> pa.Table:
        return pa.table(
            {
                "repo": ["r"],
                "path": ["src/x.lisp"],
                "commit": ["c1"],
                "lang": ["commonlisp"],
                "content": pa.array([content], type=pa.large_string()),
            }
        )

    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(ray.data.from_arrow(mk("alpha unique-one")), d1, num_parts=2, chunk_span=16)
    build_index(ray.data.from_arrow(mk("beta unique-two")), d2, num_parts=2, chunk_span=16)
    out = str(tmp_path / "im")
    m = merge_indexes([d1, d2], out, num_parts=2, chunk_span=16)
    assert m.n_docs == 1
    r = IndexReader(out)
    assert PhraseSearcher(r).search("unique-one").num_rows == 1  # first index wins
    assert PhraseSearcher(r).search("unique-two").num_rows == 0


def test_merge_with_empty_index(ray_session, tmp_path):
    """Merging an index that contributed zero documents (e.g. an all-duplicate
    shard) must not crash on its empty remap array."""

    def mk(path: str, content: str) -> pa.Table:
        return pa.table(
            {
                "repo": ["r"],
                "path": [path],
                "commit": ["c1"],
                "lang": ["commonlisp"],
                "content": pa.array([content], type=pa.large_string()),
            }
        )

    d1, d2, d3 = (str(tmp_path / f"i{i}") for i in range(3))
    build_index(ray.data.from_arrow(mk("a.lisp", "alpha unique-one")), d1, num_parts=2, chunk_span=16)
    # d2 duplicates d1's only filename — after first-wins dedupe it keeps 0 docs
    build_index(ray.data.from_arrow(mk("a.lisp", "beta unique-two")), d2, num_parts=2, chunk_span=16)
    build_index(ray.data.from_arrow(mk("b.lisp", "gamma unique-three")), d3, num_parts=2, chunk_span=16)
    out = str(tmp_path / "im")
    m = merge_indexes([d1, d2, d3], out, num_parts=2, chunk_span=16)
    assert m.n_docs == 2
    r = IndexReader(out)
    assert PhraseSearcher(r).search("unique-one").num_rows == 1
    assert PhraseSearcher(r).search("unique-two").num_rows == 0
    assert PhraseSearcher(r).search("unique-three").num_rows == 1


def test_merge_preserve_ids_requires_flag_and_uniqueness(ray_session, tmp_path):
    """Id preservation is explicit opt-in (never auto-detected from a
    coincidentally-collision-free union), and colliding ids reject it."""
    corpus, _ = generate_fixture_corpus(n_files=8, seed=7)
    import pyarrow.compute as pc

    a = corpus.filter(pc.equal(corpus["repo"], corpus["repo"][0]))
    b = corpus.filter(pc.not_equal(corpus["repo"], corpus["repo"][0]))
    d1, d2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    build_index(ray.data.from_arrow(a), d1, num_parts=2, chunk_span=16)
    build_index(ray.data.from_arrow(b), d2, num_parts=2, chunk_span=16)
    with pytest.raises(ValueError, match="preserve_ids"):
        merge_indexes([d1, d2], str(tmp_path / "pm"), num_parts=2, chunk_span=16,
                      preserve_ids=True)


def test_segments_to_runs_resolves_only_touched_shards(ray_session, tmp_path):
    """Per-actor remap residency is bounded by the shards a batch touches,
    not the index's O(docs) remap: a batch covering one old chunk resolves
    exactly that chunk's shard (and each shard is ≤ chunk_span entries)."""
    import numpy as np
    import pyarrow.compute as pc

    from searty_ray.stages.encode_stage import SegmentsToRuns

    corpus, _ = generate_fixture_corpus(n_files=12, seed=3)
    d = str(tmp_path / "ix")
    build_index(ray.data.from_arrow(corpus), d, num_parts=2, chunk_span=4)
    seg = pq.read_table(os.path.join(d, "segments"))
    assert len(set(seg["chunk"].to_pylist())) > 1, "need multiple chunks"
    batch = seg.filter(pc.equal(seg["chunk"], 0))

    fetched = []

    class CountingShards(dict):
        def get(self, k, default=None):
            v = super().get(k, default)
            if v is not None:
                fetched.append(k)
            return v

    span = 4
    shards = CountingShards()
    for c in range(4):  # identity remap, sharded by old chunk
        ids = np.arange(c * span, (c + 1) * span, dtype=np.int64)
        shards[c] = (ids, ids, np.ones(span, dtype=bool))
        assert len(ids) <= span  # shard size bounded by chunk_span
    out = SegmentsToRuns(shards, old_span=span, new_span=span)(batch)
    assert out.num_rows > 0
    assert set(fetched) == {0}, f"resolved shards {set(fetched)}, expected only chunk 0"


def test_merge_resume_skips_finished(ray_session, tmp_path):
    """A resumed merge rebuilds ONLY the partitions whose sidecars are
    missing; output is byte-identical to the uninterrupted merge."""
    import glob
    import shutil

    corpus, _ = generate_fixture_corpus(n_files=20, seed=11)
    import pyarrow.compute as pc

    a = corpus.filter(pc.equal(corpus["repo"], "cl-ppcre"))
    b = corpus.filter(pc.not_equal(corpus["repo"], "cl-ppcre"))
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(ray.data.from_arrow(a), d1, num_parts=2, chunk_span=16)
    build_index(ray.data.from_arrow(b), d2, num_parts=2, chunk_span=16)

    ref = str(tmp_path / "m_ref")
    merge_indexes([d1, d2], ref, num_parts=2, chunk_span=16)
    out = str(tmp_path / "m_resume")
    merge_indexes([d1, d2], out, num_parts=2, chunk_span=16)

    # simulate a crash that lost one reducer partition: remove one segment
    # file AND its sidecar
    seg_files = sorted(glob.glob(os.path.join(out, "segments", "part=*", "cg-*.parquet")))
    assert len(seg_files) > 1
    victim = seg_files[0]
    os.remove(victim)
    sidecars = sorted(glob.glob(os.path.join(out, "manifest", "part-*.json")))
    removed = 0
    import json
    for sc in sidecars:
        if json.load(open(sc)).get("file") == victim:
            os.remove(sc)
            removed += 1
    assert removed == 1

    m = merge_indexes([d1, d2], out, num_parts=2, chunk_span=16, resume=True)
    skipped = [v for v in m.partitions.values() if v.get("skipped")]
    assert skipped, "resume must skip the finished partitions"
    ra = pq.read_table(os.path.join(ref, "segments"))
    rb = pq.read_table(os.path.join(out, "segments"))
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    assert ra.sort_by(order).equals(rb.sort_by(order))


def test_merge_resume_redoes_partial_metadata(ray_session, tmp_path):
    """A non-empty documents/ dir WITHOUT its completion marker (crash mid
    write) is rebuilt on resume, not trusted."""
    corpus, _ = generate_fixture_corpus(n_files=10, seed=19)
    import pyarrow.compute as pc

    a = corpus.filter(pc.equal(corpus["repo"], corpus["repo"][0]))
    b = corpus.filter(pc.not_equal(corpus["repo"], corpus["repo"][0]))
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(ray.data.from_arrow(a), d1, num_parts=2, chunk_span=16)
    build_index(ray.data.from_arrow(b), d2, num_parts=2, chunk_span=16)
    out = str(tmp_path / "m")
    merge_indexes([d1, d2], out, num_parts=2, chunk_span=16)
    full_docs = pq.read_table(os.path.join(out, "documents")).num_rows

    # simulate a crash mid documents-write: delete one parquet file AND the
    # completion marker; resume must rebuild the documents pass
    import glob

    files = sorted(glob.glob(os.path.join(out, "documents", "*.parquet")))
    os.remove(files[0])
    os.remove(os.path.join(out, ".documents.done"))
    os.remove(os.path.join(out, ".docmeta.done"))  # derived from documents
    m = merge_indexes([d1, d2], out, num_parts=2, chunk_span=16, resume=True)
    assert pq.read_table(os.path.join(out, "documents")).num_rows == full_docs
    assert m.n_docs == full_docs


def test_add_documents_incremental_equals_direct_build(ray_session, tmp_path):
    """add_documents (delta build + index-level merge) over new docs equals
    a direct build over the union corpus byte-for-byte, and re-adding
    already-indexed filenames is idempotent (existing doc wins)."""
    import pyarrow.compute as pc

    from searty_ray.pipelines.merge import add_documents

    corpus, _defs = generate_fixture_corpus(n_files=24, seed=29)
    a = corpus.filter(pc.equal(corpus["repo"], "cl-ppcre"))
    b = corpus.filter(pc.not_equal(corpus["repo"], "cl-ppcre"))
    base = str(tmp_path / "ix_base")
    union = str(tmp_path / "ix_union")
    out = str(tmp_path / "ix_grown")
    build_index(ray.data.from_arrow(a), base, num_parts=4, tokenizer="trigram+symbols")
    build_index(ray.data.from_arrow(corpus), union, num_parts=4, tokenizer="trigram+symbols")
    m = add_documents(base, ray.data.from_arrow(b), out)
    mu = IndexReader(union).manifest
    assert (m.n_docs, m.total_tokens, m.max_doc_id) == (mu.n_docs, mu.total_tokens, mu.max_doc_id)
    su = pq.read_table(os.path.join(union, "segments"))
    sg = pq.read_table(os.path.join(out, "segments"))
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    assert su.sort_by(order).equals(sg.sort_by(order))

    # idempotent re-add: same filenames again -> nothing changes
    out2 = str(tmp_path / "ix_regrown")
    m2 = add_documents(out, ray.data.from_arrow(b), out2)
    assert m2.n_docs == m.n_docs
    s2 = pq.read_table(os.path.join(out2, "segments"))
    assert su.sort_by(order).equals(s2.sort_by(order))


def test_remove_documents_equals_direct_build(ray_session, tmp_path):
    """remove_documents over one repo's filenames equals a direct build
    over the surviving corpus byte-for-byte (default reassign mode), and
    removing unknown filenames is a no-op."""
    import pyarrow.compute as pc

    from searty_ray.pipelines.merge import remove_documents

    corpus, _defs = generate_fixture_corpus(n_files=24, seed=31)
    drop = pc.equal(corpus["repo"], "cl-ppcre")
    survivors = corpus.filter(pc.invert(drop))
    dropped = corpus.filter(drop)
    drop_files = [
        f"{r}/{p}" for r, p in zip(dropped["repo"].to_pylist(), dropped["path"].to_pylist())
    ]
    full = str(tmp_path / "ix_full")
    direct = str(tmp_path / "ix_direct")
    out = str(tmp_path / "ix_removed")
    build_index(ray.data.from_arrow(corpus), full, num_parts=4, tokenizer="trigram+symbols")
    build_index(ray.data.from_arrow(survivors), direct, num_parts=4,
                tokenizer="trigram+symbols")
    m = remove_documents(full, out, filenames=drop_files)
    md = IndexReader(direct).manifest
    assert (m.n_docs, m.total_tokens, m.max_doc_id) == (md.n_docs, md.total_tokens, md.max_doc_id)
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    sd = pq.read_table(os.path.join(direct, "segments"))
    sr = pq.read_table(os.path.join(out, "segments"))
    assert sd.sort_by(order).equals(sr.sort_by(order))
    # documents/docmeta agree too (same ids from the same surviving sort)
    du = pq.read_table(os.path.join(direct, "docmeta")).sort_by([("doc_id", "ascending")])
    dr = pq.read_table(os.path.join(out, "docmeta")).sort_by([("doc_id", "ascending")])
    assert du.equals(dr)

    # unknown filenames: a no-op shrink (idempotent retries)
    out2 = str(tmp_path / "ix_noop")
    m2 = remove_documents(out, out2, filenames=["nope/missing.lisp"])
    assert m2.n_docs == m.n_docs
    s2 = pq.read_table(os.path.join(out2, "segments"))
    assert sd.sort_by(order).equals(s2.sort_by(order))


def test_remove_documents_preserve_ids_keeps_survivor_ids(ray_session, tmp_path):
    """preserve_ids=True: surviving doc ids (and their query results) are
    unchanged — external references into the index stay valid."""
    import pyarrow.compute as pc

    from searty_ray.pipelines.merge import remove_documents

    corpus, _defs = generate_fixture_corpus(n_files=20, seed=37)
    full = str(tmp_path / "ix_full")
    out = str(tmp_path / "ix_removed")
    build_index(ray.data.from_arrow(corpus), full, num_parts=4, tokenizer="trigram+symbols")
    meta = pq.read_table(os.path.join(full, "docmeta"), columns=["doc_id", "filename"])
    files = meta["filename"].to_pylist()
    ids = meta["doc_id"].to_pylist()
    drop_files = files[::3]
    survivors = {f: i for f, i in zip(files, ids) if f not in set(drop_files)}
    remove_documents(full, out, filenames=drop_files, preserve_ids=True)
    got = pq.read_table(os.path.join(out, "docmeta"), columns=["doc_id", "filename"])
    assert {f: i for f, i in zip(got["filename"].to_pylist(), got["doc_id"].to_pylist())} == survivors
    # a phrase present in a surviving doc still resolves to the SAME ids
    r = IndexReader(out)
    res = PhraseSearcher(r).search("defun")
    assert res.num_rows > 0
    assert set(res["doc_id"].to_pylist()) <= set(survivors.values())


def test_remove_documents_arg_validation(ray_session, tmp_path):
    from searty_ray.pipelines.merge import remove_documents

    corpus, _defs = generate_fixture_corpus(n_files=6, seed=41)
    full = str(tmp_path / "ix_full")
    build_index(ray.data.from_arrow(corpus), full, num_parts=2, tokenizer="trigram")
    with pytest.raises(ValueError):
        remove_documents(full, str(tmp_path / "x"))
    with pytest.raises(ValueError):
        remove_documents(full, str(tmp_path / "y"), filenames=["a"], doc_ids=[1])


def test_update_documents_equals_direct_build(ray_session, tmp_path):
    """update_documents (remove incoming filenames + add new versions)
    equals a direct build over (old − updated) ∪ new byte-for-byte;
    genuinely-new filenames in the update batch are plain adds."""
    import pyarrow.compute as pc

    from searty_ray.pipelines.merge import update_documents

    corpus, _defs = generate_fixture_corpus(n_files=24, seed=37)
    base = str(tmp_path / "ixu_base")
    build_index(ray.data.from_arrow(corpus), base, num_parts=4, tokenizer="trigram+symbols")

    # new versions of one repo's files (content changed), plus one new file
    upd = corpus.filter(pc.equal(corpus["repo"], "cl-ppcre")).to_pandas()
    upd["content"] = upd["content"] + "\n(defun updated-fn (x) x)\n"
    new_row = upd.iloc[[0]].copy()
    new_row["path"] = "src/brand-new.lisp"
    new_row["content"] = "(defpackage :brand-new)\n(defun brand-new () nil)\n"
    upd = pd.concat([upd, new_row], ignore_index=True)

    out = str(tmp_path / "ixu_out")
    m = update_documents(base, ray.data.from_pandas(upd), out)

    # reference: direct build over survivors ∪ updated versions
    keep = corpus.filter(pc.not_equal(corpus["repo"], "cl-ppcre")).to_pandas()
    ref_corpus = pd.concat([keep, upd], ignore_index=True)
    ref = str(tmp_path / "ixu_ref")
    build_index(ray.data.from_pandas(ref_corpus), ref, num_parts=4, tokenizer="trigram+symbols")

    mr = IndexReader(ref).manifest
    assert (m.n_docs, m.total_tokens, m.max_doc_id) == (mr.n_docs, mr.total_tokens, mr.max_doc_id)
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    sr = pq.read_table(os.path.join(ref, "segments"))
    so = pq.read_table(os.path.join(out, "segments"))
    assert sr.sort_by(order).equals(so.sort_by(order))

    # the updated content is actually searchable
    from searty_ray.query import PhraseSearcher

    assert PhraseSearcher(IndexReader(out)).search("updated-fn").num_rows > 0
    assert PhraseSearcher(IndexReader(base)).search("updated-fn").num_rows == 0


def test_update_documents_clears_stale_intermediate(ray_session, tmp_path):
    """A leftover .shrunk dir from a crashed older update must not poison a
    fresh (resume=False) run."""
    import pyarrow.compute as pc

    from searty_ray.pipelines.merge import update_documents

    corpus, _defs = generate_fixture_corpus(n_files=12, seed=41)
    base = str(tmp_path / "ixs_base")
    build_index(ray.data.from_arrow(corpus), base, num_parts=4, tokenizer="trigram+symbols")

    out = str(tmp_path / "ixs_out")
    stale = out + ".shrunk"
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "garbage"), "w") as f:
        f.write("stale")

    upd = corpus.filter(pc.equal(corpus["repo"], "alexandria")).to_pandas()
    upd["content"] = upd["content"] + "\n(defun patched () t)\n"
    m = update_documents(base, ray.data.from_pandas(upd), out)
    assert m.n_docs == IndexReader(base).manifest.n_docs  # replace-only update
    assert not os.path.exists(stale)  # intermediate cleaned up on success
    from searty_ray.query import PhraseSearcher

    assert PhraseSearcher(IndexReader(out)).search("patched").num_rows > 0


def test_update_documents_empty_batch_is_noop(ray_session, tmp_path):
    """An empty update batch (no changed files) must yield an index
    equivalent to the input, not crash in Arrow on an empty value set."""
    corpus, _defs = generate_fixture_corpus(n_files=10, seed=43)
    base = str(tmp_path / "ixe_base")
    build_index(ray.data.from_arrow(corpus), base, num_parts=4, tokenizer="trigram+symbols")

    from searty_ray.pipelines.merge import update_documents

    empty = corpus.to_pandas().head(0)
    out = str(tmp_path / "ixe_out")
    m = update_documents(base, ray.data.from_pandas(empty), out)
    mb = IndexReader(base).manifest
    assert (m.n_docs, m.total_tokens) == (mb.n_docs, mb.total_tokens)
    order = [("term_key", "ascending"), ("chunk", "ascending")]
    sb = pq.read_table(os.path.join(base, "segments"))
    so = pq.read_table(os.path.join(out, "segments"))
    assert sb.sort_by(order).equals(so.sort_by(order))
