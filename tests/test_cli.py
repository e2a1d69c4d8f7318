"""CLI + describe tooling tests (cmd parity, M12/A8)."""

import io
import os

import pyarrow.parquet as pq

from searty_ray.cli import main as cli_main
from searty_ray.tools.describe import describe, golden_dump


def test_cli_search_phrase(fixture_index, capsys):
    index_dir, _ = fixture_index
    rc = cli_main(["search", "-d", index_dir, "defun"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) > 50
    first = out[0]
    # filename:start:end:line shape (pretty_print.go:31-41)
    parts = first.split(":", 3)
    assert parts[1].isdigit() and parts[2].isdigit()
    assert "defun" in parts[3]


def test_cli_search_symbol_and_ranked(fixture_index, fixture_corpus, capsys):
    index_dir, _ = fixture_index
    _, defs = fixture_corpus
    name = next(
        n for n, t in zip(defs["name"].to_pylist(), defs["identifier_type"].to_pylist())
        if t == "symbol"
    )
    rc = cli_main(["search", "-d", index_dir, "--symbol", name.lower(), "--ranked", "defun cons", "-k", "3"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert any(name in line for line in out)
    assert sum(1 for line in out if "\t" in line) == 3


def test_cli_search_regex_both_paths(fixture_index, capsys):
    index_dir, _ = fixture_index
    # prunable → indexed path
    rc = cli_main(["search", "-d", index_dir, "--regex", r"\(defun [a-z-]+"])
    assert rc == 0
    indexed_out = capsys.readouterr().out.strip().splitlines()
    assert indexed_out and all(line.count(":") >= 2 for line in indexed_out)
    # unprunable → distributed scan; defun appears in every generated file,
    # so the scan must print at least as many lines as some indexed subset
    rc = cli_main(["search", "-d", index_dir, "--regex", r"d[ae]fun"])
    assert rc == 0
    scan_out = capsys.readouterr().out.strip().splitlines()
    assert len(scan_out) >= len(indexed_out)


def test_cli_index_and_describe(fixture_corpus, tmp_path, capsys):
    corpus_t, _ = fixture_corpus
    src = str(tmp_path / "corpus.parquet")
    pq.write_table(corpus_t, src)
    out_dir = str(tmp_path / "ix")
    rc = cli_main(["index", "-o", out_dir, src, "--tokenizer", "trigram"])
    assert rc == 0
    assert "indexed 60 docs" in capsys.readouterr().out
    buf = io.StringIO()
    describe(out_dir, out=buf)
    text = buf.getvalue()
    assert "docs=60" in text and "partitions=" in text


def test_golden_dump_matches_oracle(fixture_index, fixture_oracle):
    index_dir, _ = fixture_index
    lines = golden_dump(index_dir)
    # every oracle term appears once with the right total count
    term_lines = [l for l in lines if l.startswith("term: ")]
    assert len(term_lines) == len(fixture_oracle.postings)
    for tl in term_lines[:50]:
        term = eval(tl.split("term: ")[1].split(" count:")[0])  # repr round-trip
        count = int(tl.rsplit("count: ", 1)[1])
        assert count == fixture_oracle.cf(term)


def test_cli_merge_unions_corpora(fixture_corpus, tmp_path, capsys):
    corpus_t, _ = fixture_corpus
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(corpus_t.slice(0, 30), a)
    pq.write_table(corpus_t.slice(30), b)
    out_dir = str(tmp_path / "merged")
    rc = cli_main(["merge", "-o", out_dir, a, b, "--tokenizer", "trigram"])
    assert rc == 0
    assert "indexed 60 docs" in capsys.readouterr().out
    docs = pq.read_table(os.path.join(out_dir, "documents"), columns=["doc_id"])
    assert docs.num_rows == 60


def test_verify_index_clean_and_corrupted(ray_session, tmp_path):
    """verify_index passes a fresh build and pinpoints a corrupted blob
    (CheckCorruption parity, postinglist.go:96-106, whole-index sweep)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from searty_ray.pipelines.build import build_index
    from searty_ray.sources.corpus import generate_fixture_corpus
    from searty_ray.tools.verify_index import verify_index

    corpus, _ = generate_fixture_corpus(n_files=12, seed=23)
    d = str(tmp_path / "ix")
    build_index(ray.data.from_arrow(corpus), d, num_parts=2, chunk_span=16)
    res = verify_index(d)
    assert res["ok"], res
    assert res["rows"] > 0 and res["errors"] == 0

    # corrupt one segment row's meta blob: swap the first two doc gaps by
    # rewriting the file with a doctored blob
    f = sorted(glob.glob(os.path.join(d, "segments", "part=*", "*.parquet")))[0]
    t = pq.read_table(f)
    metas = t["meta_blob"].to_pylist()
    dfs = t["df"].to_pylist()
    victim = next(i for i, x in enumerate(dfs) if x >= 2)
    blob = bytearray(metas[victim])
    from searty_ray.functions.codec import varint_decode, varint_encode
    import numpy as np

    vals = varint_decode(bytes(blob)).astype(np.int64)
    vals[1], vals[2] = vals[2] + 1, 0  # non-ascending doc ids after undelta
    metas[victim] = varint_encode(vals.astype(np.uint64)).tobytes()
    t = t.set_column(
        t.schema.get_field_index("meta_blob"), "meta_blob",
        pa.array(metas, type=pa.large_binary()),
    )
    pq.write_table(t, f)
    res2 = verify_index(d)
    assert not res2["ok"] and res2["errors"] >= 1


def test_cli_remove_shrinks_index(fixture_index, tmp_path, capsys):
    index_dir, _ = fixture_index
    meta = pq.read_table(os.path.join(index_dir, "docmeta"), columns=["doc_id", "filename"])
    files = meta["filename"].to_pylist()
    out = str(tmp_path / "shrunk")
    rc = cli_main(["remove", "-d", index_dir, "-o", out, "--preserve-ids", files[0], files[1]])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "shrunk" in msg
    got = pq.read_table(os.path.join(out, "docmeta"), columns=["filename"])
    remaining = set(got["filename"].to_pylist())
    assert files[0] not in remaining and files[1] not in remaining
    assert len(remaining) == len(files) - 2


def test_cli_search_bool_and_fuzzy(fixture_index, capsys):
    index_dir, _ = fixture_index
    rc = cli_main(
        ["search", "-d", index_dir, "--must", "defun", "--must-not", "zzzz-nohit",
         "--fuzzy", "cons"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    bool_rows = [l for l in out if l.endswith(tuple("0123456789")) and "\t" in l and not l.startswith("CONS")]
    assert bool_rows, out
    # fuzzy rows: word \t df \t cf, CONS itself must appear
    assert any(l.split("\t")[0] == "CONS" for l in out)


def test_cli_search_near_and_wildcard(fixture_index, capsys):
    index_dir, _ = fixture_index
    rc = cli_main(["search", "-d", index_dir, "--near", "defun", "x", "--near-window", "40"])
    assert rc == 0
    near_rows = capsys.readouterr().out.strip().splitlines()
    assert near_rows  # every generated file has (defun name (x) …)
    for line in near_rows:  # filename \t n_pairs \t min_gap, gap within window
        fn, n_pairs, min_gap = line.split("\t")
        assert int(n_pairs) > 0 and 0 < int(min_gap) <= 40

    rc = cli_main(["search", "-d", index_dir, "--wildcard", "*efun"])
    assert rc == 0
    wild_rows = capsys.readouterr().out.strip().splitlines()
    assert wild_rows and all(int(l.split("\t")[1]) >= 1 for l in wild_rows)
