"""Spec-JSON ingest: a synthesized searty spec (+ file tree) → full index
(corpus, postings, symbols from the spec's definitions[], asd_system
provenance), queried end-to-end."""

import json

import pyarrow.parquet as pq
import pytest

from searty_ray.query import IndexReader, PhraseSearcher, SymbolSearcher
from searty_ray.sources.spec import (
    corpus_from_spec,
    definitions_from_spec,
    index_spec,
    relative_path,
)


@pytest.fixture(scope="module")
def spec_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("quicklisp") / "cl-demo"
    src = root / "src"
    src.mkdir(parents=True)
    asd = root / "cl-demo.asd"
    asd.write_text('(defsystem :cl-demo :components ((:file "src/main")))\n')
    main = src / "main.lisp"
    main.write_text("(defpackage :cl-demo (:use :cl))\n(defun greet (x)\n  (format t \"hello\" x))\n")
    util = src / "util.lisp"
    util.write_text("(in-package :cl-demo)\n(defmacro with-greet (x) `(greet ,x))\n")
    spec = {
        "system_name": "cl-demo",
        "asd_file": str(asd),
        "root_directory": str(root),
        "files": [str(main), str(util)],
        "definitions": [
            {
                "identifier": {"type": "package", "name": "CL-DEMO", "package": ""},
                "locations": [{"specifier": "DEFPACKAGE", "file": str(main), "position": 0}],
            },
            {
                "identifier": {"type": "symbol", "name": "GREET", "package": "CL-DEMO"},
                "locations": [{"specifier": "DEFUN", "file": str(main), "position": 33}],
            },
            {
                "identifier": {"type": "symbol", "name": "WITH-GREET", "package": "CL-DEMO"},
                "locations": [{"specifier": "DEFMACRO", "file": str(util), "position": 24}],
            },
        ],
        "time": 12.5,
    }
    spec_path = root / "cl-demo.json"
    spec_path.write_text(json.dumps(spec))
    return str(spec_path), str(root)


def test_relative_path_semantics():
    assert relative_path("/a/b/src/x.lisp", "/a/b") == "src/x.lisp"
    # reference's lenient branch: not under root → kept verbatim
    assert relative_path("/elsewhere/x.lisp", "/a/b") == "/elsewhere/x.lisp"


def test_corpus_and_definitions_tables(ray_session, spec_tree):
    spec_path, _root = spec_tree
    corpus = corpus_from_spec(spec_path).to_pandas().sort_values("path")
    assert list(corpus["path"]) == ["cl-demo.asd", "src/main.lisp", "src/util.lisp"]
    assert (corpus["repo"] == "cl-demo").all()
    assert corpus[corpus["path"] == "src/main.lisp"]["content"].iloc[0].startswith("(defpackage")
    defs = definitions_from_spec(spec_path).to_pandas()
    assert len(defs) == 3
    assert set(defs["identifier_type"]) == {"package", "symbol"}
    assert defs[defs["name"] == "WITH-GREET"]["path"].iloc[0] == "src/util.lisp"


def test_index_spec_end_to_end(ray_session, spec_tree, tmp_path):
    spec_path, _root = spec_tree
    index_dir = str(tmp_path / "idx")
    manifest = index_spec([spec_path], index_dir)
    assert manifest.n_docs == 3
    reader = IndexReader(index_dir)
    # definitions came from the spec (not regex extraction): symbol lookup
    res = SymbolSearcher(reader).search("cl-demo::greet")
    assert len(res) == 1
    assert res["filename"][0].as_py() == "cl-demo/src/main.lisp"
    assert res["position"][0].as_py() == 33
    # phrase search over spec-read content
    hits = PhraseSearcher(reader).search("defmacro with-greet")
    assert hits["filename"].to_pylist() == ["cl-demo/src/util.lisp"]
    # asd_system provenance row
    sys_t = pq.read_table(f"{index_dir}/system").to_pandas()
    assert list(sys_t["system_name"]) == ["cl-demo"]
    assert sys_t["analyzed_time"].iloc[0] == 12.5
    root_doc = sys_t["root_doc_id"].iloc[0]
    docs = pq.read_table(f"{index_dir}/documents", columns=["doc_id", "path"]).to_pandas()
    assert docs[docs["doc_id"] == root_doc]["path"].iloc[0] == "cl-demo.asd"


def test_index_spec_multi_system(ray_session, spec_tree, tmp_path):
    """Two specs → one index (the reference's merge workflow, spec-level):
    both systems' docs, symbols and provenance rows land in one index."""
    import json

    spec_path, _root = spec_tree
    root2 = tmp_path / "other-sys"
    (root2 / "src").mkdir(parents=True)
    asd2 = root2 / "other-sys.asd"
    asd2.write_text('(defsystem :other-sys)\n')
    f2 = root2 / "src" / "core.lisp"
    f2.write_text("(defpackage :other-sys (:use :cl))\n(defun widget-maker (x) x)\n")
    spec2 = {
        "system_name": "other-sys",
        "asd_file": str(asd2),
        "root_directory": str(root2),
        "files": [str(f2)],
        "definitions": [
            {
                "identifier": {"type": "symbol", "name": "WIDGET-MAKER", "package": "OTHER-SYS"},
                "locations": [{"specifier": "DEFUN", "file": str(f2), "position": 33}],
            }
        ],
        "time": 1.0,
    }
    p2 = root2 / "other-sys.json"
    p2.write_text(json.dumps(spec2))

    index_dir = str(tmp_path / "multi")
    m = index_spec([spec_path, str(p2)], index_dir)
    assert m.n_docs == 5  # 3 from cl-demo + 2 from other-sys
    r = IndexReader(index_dir)
    assert len(SymbolSearcher(r).search("other-sys::widget-maker")) == 1
    assert len(SymbolSearcher(r).search("cl-demo::greet")) == 1
    sys_t = pq.read_table(f"{index_dir}/system").to_pandas().sort_values("system_name")
    assert list(sys_t["system_name"]) == ["cl-demo", "other-sys"]
    assert (sys_t["root_doc_id"] >= 0).all()
