"""searty spec-JSON ingest (SURVEY.md §2.1 S1; /root/reference/lib/spec/spec.go:27-48).

A reference-produced spec is ``{system_name, asd_file, root_directory,
files[], definitions[{identifier{type,name,package}, locations[{specifier,
file, position}]}], time}``.  This module turns one (or several) such specs
plus their file trees into the engine's corpus + definitions tables, so a
user holding reference specs can index them directly:

* file contents are read INSIDE ``map_batches`` workers (the spec only
  ships the path list — at cluster scale files come off shared storage in
  parallel, the driver never holds content);
* paths are projected relative to ``root_directory`` exactly like
  ``computeRelativePath`` (indexer.go:36-44), including its lenient
  "not under root → keep verbatim" branch;
* the per-system provenance row (name, root asd document, analyzed_time) —
  the reference's ``asd_system`` table (schema.sql:67-72,
  indexer.go:198-215) — is written as a ``system/`` parquet table.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import ray.data


def load_spec(path: str) -> dict:
    with open(path) as f:
        spec = json.load(f)
    for key in ("system_name", "asd_file", "root_directory", "files"):
        if key not in spec:
            raise ValueError(f"spec {path}: missing {key!r}")
    return spec


def relative_path(file: str, root_directory: str) -> str:
    """computeRelativePath (indexer.go:36-44): strip ``root_directory`` + '/';
    files not under the root are kept verbatim (reference TODO branch)."""
    n = len(root_directory)
    if file[:n] != root_directory:
        return file
    return file[n + 1 :]


class _ReadFiles:
    """Worker-side file reader: (abs_path, rel_path) rows → corpus rows."""

    def __init__(self, system_name: str):
        self.system = system_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents, commits = [], []
        for p in batch["abs_path"].to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            contents.append(data.decode("utf-8"))
            commits.append(hashlib.sha1(data).hexdigest())
        return pa.table(
            {
                "repo": pa.array([self.system] * len(batch), type=pa.string()),
                "path": batch["rel_path"].cast(pa.string()),
                "commit": pa.array(commits, type=pa.string()),
                "lang": pa.array(["commonlisp"] * len(batch), type=pa.string()),
                "content": pa.array(contents, type=pa.large_string()),
            }
        )


def corpus_from_spec(spec_path: str) -> ray.data.Dataset:
    """spec JSON → corpus Dataset (asd file first, then files[], like
    indexer.go:198,217 — order only matters for dense-id aesthetics; ids are
    assigned by the deterministic global sort either way)."""
    spec = load_spec(spec_path)
    root = spec["root_directory"]
    paths = [spec["asd_file"], *spec["files"]]
    rows = [{"abs_path": p, "rel_path": relative_path(p, root)} for p in paths]
    return ray.data.from_items(rows).map_batches(
        _ReadFiles(spec["system_name"]), batch_format="pyarrow", batch_size=64
    )


def definitions_from_spec(spec_path: str) -> pa.Table:
    """definitions[] → (repo, path, identifier_type, name, package,
    specifier, position) rows, one per (definition, location) —
    indexDefinition flattened (indexer.go:117-166).  Locations name files by
    absolute path; the (repo, relative path) pair is the join key that
    ``build_symbols_from_definitions`` remaps to doc ids (the fileIdMap
    dissolved, SURVEY.md §2.3 ST3)."""
    spec = load_spec(spec_path)
    root = spec["root_directory"]
    sysname = spec["system_name"]
    rows = []
    for d in spec.get("definitions", []):
        ident = d["identifier"]
        if ident["type"] not in ("package", "symbol"):
            raise ValueError(f"unexpected identifier.type: {ident['type']!r}")
        for loc in d["locations"]:
            rows.append(
                {
                    "repo": sysname,
                    "path": relative_path(loc["file"], root),
                    "identifier_type": ident["type"],
                    "name": ident["name"],
                    "package": ident.get("package", "") if ident["type"] == "symbol" else "",
                    "specifier": loc["specifier"],
                    "position": int(loc["position"]),
                }
            )
    cols = ["repo", "path", "identifier_type", "name", "package", "specifier"]
    return pa.table(
        {c: pa.array([r[c] for r in rows], type=pa.string()) for c in cols}
        | {"position": pa.array([r["position"] for r in rows], type=pa.int64())}
    )


def system_row(spec_path: str) -> dict:
    spec = load_spec(spec_path)
    return {
        "system_name": spec["system_name"],
        "root_document_path": relative_path(spec["asd_file"], spec["root_directory"]),
        "analyzed_time": float(spec.get("time", 0.0)),
    }


def index_spec(spec_paths: list[str], index_dir: str, **build_kwargs) -> "object":
    """Index one or more searty specs into one index (multi-spec = the
    reference's merge: union of corpora, term-keyed shuffle does the rest).

    Writes the standard index layout plus ``system/`` (asd_system parity:
    system name, root document id, analyzed_time)."""
    import pyarrow.parquet as pq

    from ..pipelines.build import build_index
    from ..pipelines.symbols import build_symbols_from_definitions

    corpus = corpus_from_spec(spec_paths[0])
    for p in spec_paths[1:]:
        corpus = corpus.union(corpus_from_spec(p))
    manifest = build_index(corpus, index_dir, extract_symbols=False, **build_kwargs)

    defs = pa.concat_tables([definitions_from_spec(p) for p in spec_paths])
    build_symbols_from_definitions(defs, index_dir)

    # asd_system parity table: resolve each system's root document id
    docs = pq.read_table(os.path.join(index_dir, "documents"), columns=["doc_id", "repo", "path"])
    doc_of = {
        (r, p): d
        for r, p, d in zip(
            docs["repo"].to_pylist(), docs["path"].to_pylist(), docs["doc_id"].to_pylist()
        )
    }
    sys_rows = [system_row(p) for p in spec_paths]
    t = pa.table(
        {
            "system_name": pa.array([r["system_name"] for r in sys_rows], type=pa.string()),
            "root_doc_id": pa.array(
                [doc_of.get((r["system_name"], r["root_document_path"]), -1) for r in sys_rows],
                type=pa.int64(),
            ),
            "root_document_path": pa.array(
                [r["root_document_path"] for r in sys_rows], type=pa.string()
            ),
            "analyzed_time": pa.array([r["analyzed_time"] for r in sys_rows], type=pa.float64()),
        }
    )
    os.makedirs(os.path.join(index_dir, "system"), exist_ok=True)
    pq.write_table(t, os.path.join(index_dir, "system", "systems.parquet"))
    return manifest
