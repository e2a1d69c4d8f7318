"""Reference-snapshot compat goldens.

The reference's own specs aren't runnable here (absolute paths in testdata,
SURVEY.md §5), so this locks a synthesized equivalent: build the
deterministic fixture corpus, emit BOTH reference snapshot shapes —

* the index dump of lib/indexer/test/indexer_test.go:42-80
  (sorted filenames; ``"term": count = df``; ``filename [positions]``), and
* the ``Test_SearchPhrase("defun")`` output of
  lib/searcher/searcher_test.go:12-31 (``filename:start:end:line``)

— and compare byte-for-byte against committed goldens
(tests/goldens/*.snapshot).  The postings that feed the dump are also
round-tripped through the compat codec (the reference's exact byte format,
lib/invertedindex/encode_decode_test.go:10-57), tying the golden to a
compat-encoded index.
"""

import os

import numpy as np
import pytest
import ray.data

from searty_ray.functions.codec import (
    compat_decode_posting_list,
    compat_encode_posting_list,
    decode_meta_blob,
    decode_pos_blob,
)
from searty_ray.pipelines.build import build_index
from searty_ray.sources.corpus import generate_fixture_corpus
from searty_ray.state.manifest import Manifest
from searty_ray.tools.describe import reference_phrase_dump, reference_snapshot_dump

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def compat_index(ray_session, tmp_path_factory):
    corpus, _defs = generate_fixture_corpus(n_files=12, seed=7)
    index_dir = str(tmp_path_factory.mktemp("compat") / "idx")
    build_index(ray.data.from_arrow(corpus), index_dir, tokenizer="trigram")
    return index_dir


def _check_golden(name: str, lines: list[str]) -> None:
    path = os.path.join(GOLDEN_DIR, name)
    text = "\n".join(lines) + "\n"
    if not os.path.exists(path):  # first run writes the golden (committed)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        pytest.skip(f"golden {name} written; re-run to compare")
    with open(path) as f:
        assert f.read() == text, f"{name} diverged from committed golden"


def test_reference_index_snapshot_shape(compat_index):
    lines = reference_snapshot_dump(compat_index)
    # structural sanity of the shape itself
    n_docs = Manifest.load(compat_index).n_docs
    assert lines[:n_docs] == sorted(lines[:n_docs])  # filename header block
    term_lines = [l for l in lines if ": count = " in l]
    assert term_lines and all(l.startswith('"') for l in term_lines)
    i = lines.index(term_lines[0])
    df = int(term_lines[0].rsplit("= ", 1)[1])
    assert all("[" in l and l.endswith("]") for l in lines[i + 1 : i + 1 + df])
    _check_golden("indexer.snapshot", lines)


def test_reference_phrase_snapshot_shape(compat_index):
    lines = reference_phrase_dump(compat_index, "defun")
    assert lines, "fixture corpus must contain 'defun'"
    for l in lines:
        fn, start, end, _line = l.split(":", 3)
        assert fn.endswith(".lisp") and int(end) >= int(start) + len("defun")
    _check_golden("phrase_defun.snapshot", lines)


def test_compat_codec_roundtrip_of_index_postings(compat_index):
    """Every posting list in the fixture index survives the reference's
    exact byte format (delta+varbyte with reverse trick, encoder.go:35-65)."""
    import pyarrow.parquet as pq

    m = Manifest.load(compat_index)
    seg = pq.read_table(
        os.path.join(compat_index, "segments"),
        columns=["term", "chunk", "meta_blob", "pos_blob"],
    )
    n_checked = 0
    for r in seg.to_pylist()[:500]:
        d, t = decode_meta_blob(r["meta_blob"], first_doc_base=r["chunk"] * m.chunk_span)
        p = decode_pos_blob(r["pos_blob"], t)
        off = np.cumsum(t)[:-1]
        postings = [
            (int(doc), [int(x) for x in pp]) for doc, pp in zip(d, np.split(p, off))
        ]
        blob = compat_encode_posting_list(postings)
        assert compat_decode_posting_list(blob) == postings
        n_checked += 1
    assert n_checked > 50
