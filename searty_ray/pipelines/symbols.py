"""Symbol/package definition side tables (SURVEY.md §2.2 M4, §2.4 J3).

The reference's SBCL analyzer output arrives as a ``definitions`` table
(FIXTURES.md §2); this pipeline remaps (repo, path) → doc_id with a
broadcast join (documents metadata is the small side: `ray.put` once, dict
lookup per batch — no shuffle) and writes the ``symbols/`` Parquet.

Also provides :func:`extract_definitions`, a lightweight pure-Python
replacement for the analyzer (M13): recognizes top-level
``(defun|defmacro|defvar|defparameter|defpackage NAME …)`` forms with their
rune offsets, vectorized via one compiled regex per batch.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..schema import SYMBOLS_SCHEMA

_DEF_RE = re.compile(
    r"\((def(?:un|macro|var|parameter|package))\s+:?([^\s()\"]+)", re.IGNORECASE
)


class ExtractDefinitions:
    """corpus batches → definition rows (doc_id, type, name, specifier, position).

    Positions are rune offsets of the opening paren; Python's ``re`` works on
    str (rune-indexed), so offsets are correct for multibyte content.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, types, names, pkgs, specs, positions = [], [], [], [], [], []
        ids = batch["doc_id"].to_pylist()
        for i, v in enumerate(batch["content"]):
            text = v.as_py()
            current_pkg = ""
            for mt in _DEF_RE.finditer(text):
                spec = mt.group(1).upper()
                name = mt.group(2).upper()
                is_pkg = spec == "DEFPACKAGE"
                if is_pkg:
                    current_pkg = name
                doc_ids.append(ids[i])
                types.append("package" if is_pkg else "symbol")
                names.append(name)
                pkgs.append("" if is_pkg else current_pkg)
                specs.append(spec)
                positions.append(mt.start())
        return pa.table(
            {
                "identifier_type": pa.array(types, type=pa.string()),
                "name": pa.array(names, type=pa.string()),
                "package": pa.array(pkgs, type=pa.string()),
                "specifier": pa.array(specs, type=pa.string()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "position": pa.array(positions, type=pa.int64()),
            },
            schema=SYMBOLS_SCHEMA,
        )


def build_symbols_from_corpus(corpus: ray.data.Dataset, index_dir: str) -> None:
    """Regex-extract definitions straight from corpus content (M13-lite)."""
    out = os.path.join(index_dir, "symbols")
    corpus.map_batches(ExtractDefinitions(), batch_format="pyarrow").write_parquet(out)


def build_symbols_from_definitions(
    definitions: ray.data.Dataset | pa.Table, index_dir: str
) -> None:
    """definitions(repo, path, …, position) → symbols/ with doc_id remapped.

    Broadcast join: documents metadata keyed by (repo, path) — first match
    wins on duplicate paths across shards, like mergeDocuments
    (merge.go:164-171), except our global ids make true dups impossible.
    """
    docs = pq.read_table(
        os.path.join(index_dir, "documents"), columns=["doc_id", "repo", "path"]
    )
    fmap: dict[tuple[str, str], int] = {}
    for r, p, d in zip(
        docs["repo"].to_pylist(), docs["path"].to_pylist(), docs["doc_id"].to_pylist()
    ):
        fmap.setdefault((r, p), d)
    fmap_ref = ray.put(fmap)

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(fmap_ref)
        ids = [
            m.get((r, p), -1)
            for r, p in zip(batch["repo"].to_pylist(), batch["path"].to_pylist())
        ]
        t = pa.table(
            {
                "identifier_type": batch["identifier_type"],
                "name": batch["name"],
                "package": batch["package"],
                "specifier": batch["specifier"],
                "doc_id": pa.array(ids, type=pa.int64()),
                "position": batch["position"],
            },
            schema=SYMBOLS_SCHEMA,
        )
        return t.filter(pa.compute.field("doc_id") >= 0)

    ds = definitions if isinstance(definitions, ray.data.Dataset) else ray.data.from_arrow(definitions)
    ds.map_batches(remap, batch_format="pyarrow").write_parquet(os.path.join(index_dir, "symbols"))
