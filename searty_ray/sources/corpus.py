"""Corpus sources.

The engine's primary input is a Parquet table of source files with columns
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint), plus an
optional ``doc_id``.  Two providers:

* :func:`corpus_from_documents` — derives that table **deterministically**
  from the driver's ``documents`` test table (doc_id/text/lang/source), with
  a Lisp-form header prepended so phrase/symbol semantics are exercised.
  :data:`CORPUS_CTE` is the exact DuckDB mirror of the derivation, used by
  every ``oracle_sql`` entry, so the correctness gate compares the Ray
  pipeline and SQL on byte-identical corpora.

* :func:`generate_fixture_corpus` — the richer synthetic Lisp corpus from
  FIXTURES.md §1 (multibyte, 0/1/2-rune files, "aaaa", duplicate paths &
  contents, tabs/newlines), pytest-only, seeded, with an exact
  ``definitions`` side table (FIXTURES.md §2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _derive_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,lang,source) → corpus(doc_id,repo,path,commit,lang,content)."""
    doc_id = batch["doc_id"]
    sid = pc.cast(doc_id, pa.string())
    source = batch["source"]
    path = pc.binary_join_element_wise("doc_", sid, ".lisp", "")
    commit = _commit_hex_batch(sid)
    header = pc.binary_join_element_wise(
        "(defpackage :", pc.utf8_upper(source), ")\n(defun doc-", sid, " (x) nil)\n", ""
    )
    content = pc.cast(pc.binary_join_element_wise(header, batch["text"], ""), pa.large_string())
    return pa.table(
        {
            "doc_id": doc_id,
            "repo": source,
            "path": path,
            "commit": commit,
            "lang": batch["lang"],
            "content": content,
        }
    )


def _commit_hex_batch(sid: pa.ChunkedArray | pa.Array) -> pa.Array:
    """24-hex-char synthetic commit id per doc: ``hex16(h('c'||id)) ||
    hex16(h(hex16))[:8]`` with ``h`` = the engine's splitmix64 chunk-fold
    (functions/hashing.hash_bytes_u64) — fully vectorized over the batch (a
    per-row hashlib loop here was a flat ~2s tax on every bench build) and
    bit-exactly mirrored in :data:`CORPUS_CTE`."""
    from ..functions.hashing import hash_bytes_u64

    keys = pc.binary_join_element_wise("c", sid, "").cast(pa.large_binary())
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    h1 = hash_bytes_u64(buf, offs[:-1], np.diff(offs))
    hex1 = np.frombuffer(h1.astype(">u8").tobytes().hex().encode("ascii"), dtype="S16")
    buf2 = np.frombuffer(hex1.tobytes(), dtype=np.uint8)  # contiguous 16-byte rows
    h2 = hash_bytes_u64(
        buf2, np.arange(n, dtype=np.int64) * 16, np.full(n, 16, dtype=np.int64)
    )
    hex2_8 = np.frombuffer(
        (h2 >> np.uint64(32)).astype(">u4").tobytes().hex().encode("ascii"), dtype="S8"
    )
    return pa.array(np.char.add(hex1.astype("U16"), hex2_8.astype("U8")), type=pa.string())


def corpus_from_documents(
    sf_dir: str, replicate: int = 1, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Read ``documents.parquet`` and derive the corpus table (streaming).

    ``replicate=R`` amplifies the corpus R× for benchmarking (same driver
    test data, doc ids offset per copy so every row is distinct) — used to
    reach a compute-bound regime; correctness gates always run with R=1.
    """
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    if override_num_blocks:
        # the test file has ONE row group, so the read itself can't split —
        # without this repartition the amplify+derive chain below would fuse
        # into a single serial task
        ds = ds.repartition(override_num_blocks)
    if replicate > 1:
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

        def amplify(batch: pa.Table) -> pa.Table:
            # Copy ids TILE the batch's own id range (copy r of base ids
            # [lo, hi] gets [lo·R + r·cnt, …)) so an amplified block stays
            # ONE contiguous run: the global-offset scheme (id + r·n) turned
            # every block into R interleaved 78-row runs, and the
            # range-committed documents writer then emitted one tiny file
            # per run (2,560 files for the 200k-doc bench — a parquet-footer
            # tax on every downstream scan).  Blocks partition [0, n), so
            # the tiles partition [0, n·R): ids stay dense and distinct.
            # Non-contiguous input ids (never produced by the sorted test
            # tables) fall back to the global-offset scheme.
            import numpy as np

            ids = batch["doc_id"].to_numpy()
            cnt = len(ids)
            contiguous = cnt > 0 and ids[-1] - ids[0] + 1 == cnt and bool(
                np.all(np.diff(ids) == 1)
            )
            copies = []
            for r in range(replicate):
                new_ids = (
                    pa.array(int(ids[0]) * replicate + r * cnt + (ids - ids[0]))
                    if contiguous
                    else pc.add(batch["doc_id"], r * n)
                )
                copies.append(
                    batch.set_column(
                        batch.schema.get_field_index("doc_id"), "doc_id", new_ids
                    )
                )
            return pa.concat_tables(copies)

        ds = ds.map_batches(amplify, batch_format="pyarrow")
    return ds.map_batches(_derive_batch, batch_format="pyarrow")


def _commit_sql() -> str:
    """Bit-exact DuckDB mirror of :func:`_commit_hex_batch` (the engine's own
    splitmix64 primitive via hashing.sql_hash_expr, not an opaque md5)."""
    from ..functions.hashing import sql_hash_expr

    inner = sql_hash_expr("'c' || doc_id")
    hex16 = f"lower(lpad(hex({inner}), 16, '0'))"
    return f"{hex16} || substr(lower(lpad(hex({sql_hash_expr(hex16)}), 16, '0')), 1, 8)"


#: DuckDB mirror of :func:`_derive_batch` — prepend with "WITH corpus AS (…)".
CORPUS_CTE = f"""
corpus AS (
  SELECT
    doc_id,
    source AS repo,
    'doc_' || doc_id || '.lisp' AS path,
    {_commit_sql()} AS "commit",
    lang,
    '(defpackage :' || upper(source) || ')' || chr(10)
      || '(defun doc-' || doc_id || ' (x) nil)' || chr(10) || text AS content
  FROM documents
)
""".strip()


# ---------------------------------------------------------------------------
# deterministic fixture corpus (FIXTURES.md) — pytest-only
# ---------------------------------------------------------------------------

_VOCAB_HEAD = ["list", "cons", "car", "cdr", "loop", "setf", "when", "cond", "lambda", "format"]


def generate_fixture_corpus(n_files: int = 50, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Synthesize (corpus, definitions) tables.  No wall clock, no I/O.

    Edge-case rows appended after the generated files (FIXTURES.md §1):
    multibyte content, 0/1/2-rune files, "aaaa", duplicate (path) across
    repos, duplicate content across (repo,path), tabs/newlines/CR.
    """
    rng = np.random.default_rng(seed)
    repos = ["cl-ppcre", "alexandria", "1am"]
    rows: list[dict] = []
    defs: list[dict] = []

    # Zipfian word picks keep trigram df head-heavy like real code.
    zipf_p = 1.0 / np.arange(1, len(_VOCAB_HEAD) + 1)
    zipf_p /= zipf_p.sum()

    for i in range(n_files):
        repo = repos[i % len(repos)]
        path = f"src/file{i:03d}.lisp"
        pkg = f"PKG{i % 5}"
        parts: list[str] = [f"(defpackage :{pkg.lower()} (:use :cl))\n"]
        file_defs: list[tuple[str, str, str, int]] = []  # (type,name,specifier,pos)
        file_defs.append(("package", pkg, "DEFPACKAGE", 0))
        pos = len(parts[0])
        n_forms = int(rng.integers(3, 12))
        for j in range(n_forms):
            kind = ["defun", "defmacro", "defvar"][int(rng.integers(0, 3))]
            name = f"{rng.choice(_VOCAB_HEAD, p=zipf_p)}-{i}-{j}"
            body = " ".join(rng.choice(_VOCAB_HEAD, p=zipf_p, size=int(rng.integers(2, 9))))
            form = f"({kind} {name} (x)\n  ({body}))\n"
            file_defs.append(("symbol", name.upper(), kind.upper(), pos))
            parts.append(form)
            pos += len(form)
        content = "".join(parts)
        rows.append(_crow(repo, path, i, content))
        for dt, name, spec, p in file_defs:
            defs.append(
                {
                    "repo": repo,
                    "path": path,
                    "identifier_type": dt,
                    "name": name,
                    "package": "" if dt == "package" else pkg,
                    "specifier": spec,
                    "position": p,
                }
            )

    edge = [
        ("cl-ppcre", "src/multibyte.lisp", ";; あいうえお 日本語のコメント\n(defun あいう (x) x)\n"),
        ("cl-ppcre", "src/empty.lisp", ""),
        ("cl-ppcre", "src/one.lisp", "a"),
        ("cl-ppcre", "src/two.lisp", "ab"),
        ("cl-ppcre", "src/aaaa.lisp", "aaaa bbb aaaa\n"),
        ("alexandria", "src/shared-path.lisp", "(defvar *x* 1)\n"),
        ("1am", "src/shared-path.lisp", "(defvar *y* 2)\n"),  # same path, other repo
        ("alexandria", "src/dup-a.lisp", "identical content here\n"),
        ("1am", "src/dup-b.lisp", "identical content here\n"),
        ("cl-ppcre", "src/whitespace.lisp", "(a\t  b)\r\n\n(c)\n"),
    ]
    for k, (repo, path, content) in enumerate(edge):
        rows.append(_crow(repo, path, n_files + k, content))

    corpus = pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows]),
            "path": pa.array([r["path"] for r in rows]),
            "commit": pa.array([r["commit"] for r in rows]),
            "lang": pa.array(["commonlisp"] * len(rows)),
            "content": pa.array([r["content"] for r in rows], type=pa.large_string()),
        }
    )
    definitions = pa.table(
        {k: pa.array([d[k] for d in defs]) for k in ["repo", "path", "identifier_type", "name", "package", "specifier"]}
        | {"position": pa.array([d["position"] for d in defs], type=pa.int64())}
    )
    return corpus, definitions


def _crow(repo: str, path: str, i: int, content: str) -> dict:
    return {
        "repo": repo,
        "path": path,
        "commit": hashlib.sha1(f"{repo}/{path}@{i}".encode()).hexdigest(),
        "content": content,
    }
