"""Correctness-gate pipelines: one Ray implementation + one DuckDB oracle SQL
per operator (driver contract, __ray_entry__.py).

Every query runs over the driver's test tables at ``sf_dir``.  Index-backed
queries derive the corpus deterministically from ``documents``
(sources/corpus.py — the SQL side uses the exact :data:`CORPUS_CTE` mirror)
and build/cache the index once per sf_dir under /tmp.

Float-valued outputs are rounded to 6 decimals on BOTH sides; selection
orders use exact values with (value, id) tie-breaks so the rounded compare
is stable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import sql_hash_expr as _hash_sql
from ..functions.tokenize import pack_trigrams, codepoints, unpack_terms
from ..query import (
    BM25Searcher,
    FileSearcher,
    IndexReader,
    PhraseSearcher,
    PrettyPrinter,
    SymbolSearcher,
)
from ..sources.corpus import CORPUS_CTE, corpus_from_documents
from ..stages import cluster, dedup, knn, multimodal, textstats
from .build import build_index

# bump INDEX_LAYOUT_VERSION whenever segment layout / derivation changes so a
# stale /tmp cache from an older build can never serve the gate
INDEX_LAYOUT_VERSION = 6  # v5: splitmix commit derivation; v6: worddict sidecar
CACHE_ROOT = f"/tmp/searty_ray_gate/v{INDEX_LAYOUT_VERSION}"

# -- fixed gate parameters (mirrored in the SQL below) ----------------------
PHRASE_Q = "merge part"
PHRASE_OVERLAP_Q = "batch batch"
BM25_Q = "merge join"
BM25_K = 10
SYMBOL_Q = "doc-7"
FILE_Q = "doc_1"
LINE_Q = "window"
KNN_QUERY_IDS = [0, 1, 2, 3, 4]
KNN_K = 10
JACCARD_THRESHOLD = 0.6
TOPK_TERMS_N = 20


def _data_fingerprint(sf_dir: str) -> str:
    """Cheap fingerprint of the input table (size+mtime), so regenerated
    data or two sf_dirs sharing a basename can never serve a stale cache."""
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    return f"{st.st_size}_{int(st.st_mtime)}"


def _ensure_index(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_dir = os.path.join(CACHE_ROOT, f"{name}_{_data_fingerprint(sf_dir)}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        build_index(
            corpus_from_documents(sf_dir, override_num_blocks=16),
            index_dir,
            tokenizer="trigram+symbols",
        )
    return index_dir


def q_jsonl_ingest(sf_dir: str):
    """Format-independence: the documents table ingested from LINE-DELIMITED
    JSON (sources/text.documents_from_jsonl — pyarrow streaming JSONL read)
    must equal the parquet table row-for-row."""
    from ..sources.text import documents_from_jsonl, write_documents_jsonl

    path = os.path.join(
        CACHE_ROOT,
        f"docs_{os.path.basename(os.path.normpath(sf_dir))}_{_data_fingerprint(sf_dir)}.jsonl",
    )
    if not os.path.exists(path):
        # tmp + atomic rename: a run killed mid-write must not leave a
        # truncated file at the final (fingerprint-matching) cache path
        tmp = f"{path}.tmp.{os.getpid()}"
        write_documents_jsonl(f"{sf_dir}/documents.parquet", tmp)
        os.replace(tmp, path)
    out = documents_from_jsonl(path).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_JSONL_INGEST = "SELECT * FROM documents ORDER BY doc_id"


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """documents table; pass ``columns`` so the projection happens AT the
    parquet scan (Ray's planner runs select_columns as a separate Project
    operator after the read — it does not push down)."""
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _trigrams(s: str) -> list[str]:
    return sorted(set(unpack_terms(pack_trigrams(codepoints(s)))))


def _sql_str_list(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"[{quoted}]"


# the trigram-explosion CTE every index oracle shares (DuckDB 1.0: lateral
# range() can't take column args — unnest a scalar-list range instead)
TOKENS_CTE = """
tokens AS (
  SELECT doc_id, i - 1 AS pos, substr(content, i, 3) AS term
  FROM (SELECT doc_id, content,
               unnest(range(1, greatest(length(content) - 1, 1))) AS i
        FROM corpus)
)
""".strip()


# ===========================================================================
# searty-core queries
# ===========================================================================


def q_build_documents(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    return pq.read_table(
        os.path.join(index_dir, "documents"),
        columns=["doc_id", "filename", "repo", "path", "commit", "lang", "n_tokens", "n_sym_tokens", "n_runes", "content_sha256"],
    )


SQL_BUILD_DOCUMENTS = f"""
WITH {CORPUS_CTE}
SELECT doc_id,
       repo || '/' || path AS filename,
       repo, path, "commit", lang,
       greatest(length(content) - 2, 0) AS n_tokens,
       len(regexp_extract_all(content, '[A-Za-z0-9*+/<>=!?_&%$.-]+'))::BIGINT AS n_sym_tokens,
       length(content) AS n_runes,
       sha256(content) AS content_sha256
FROM corpus
"""


def q_corpus_stats(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    m = r.manifest
    return pa.table(
        {
            "n_docs": pa.array([m.n_docs], type=pa.int64()),
            "total_tokens": pa.array([m.total_tokens], type=pa.int64()),
            "avgdl": pa.array([round(m.avgdl, 6)], type=pa.float64()),
            "max_doc_id": pa.array([m.max_doc_id], type=pa.int64()),
        }
    )


SQL_CORPUS_STATS = f"""
WITH {CORPUS_CTE}
SELECT count(*) AS n_docs,
       sum(greatest(length(content) - 2, 0))::BIGINT AS total_tokens,
       round(avg(greatest(length(content) - 2, 0)), 6) AS avgdl,
       max(doc_id) AS max_doc_id
FROM corpus
"""

_PROBE_TERMS = sorted(set(_trigrams("defun doc") + _trigrams(" merge ")))


def q_term_stats(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    keys = np.array([int(pack_trigrams(codepoints(t))[0]) for t in _PROBE_TERMS], dtype=np.uint64)
    plists = r.lookup(keys, need_positions=False)  # df/cf only
    rows = [
        (t, plists[int(k)].df, plists[int(k)].cf)
        for t, k in zip(_PROBE_TERMS, keys)
        if plists[int(k)] is not None
    ]
    rows.sort()
    return pa.table(
        {
            "term": pa.array([a for a, _, _ in rows], type=pa.string()),
            "df": pa.array([b for _, b, _ in rows], type=pa.int64()),
            "cf": pa.array([c for _, _, c in rows], type=pa.int64()),
        }
    )


SQL_TERM_STATS = f"""
WITH {CORPUS_CTE}, {TOKENS_CTE}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM tokens
WHERE term IN (SELECT unnest({_sql_str_list(_PROBE_TERMS)}))
GROUP BY term
ORDER BY term
"""

_POSTING_PROBE = ["mer", "def", "doc"]


def q_postings_probe(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    keys = {t: int(pack_trigrams(codepoints(t))[0]) for t in _POSTING_PROBE}
    plists = r.lookup(np.array(list(keys.values()), dtype=np.uint64))
    terms, docs, poss = [], [], []
    for t in sorted(_POSTING_PROBE):
        tp = plists[keys[t]]
        if tp is None:
            continue
        expanded = np.repeat(tp.doc_ids, tp.tfs)
        terms.extend([t] * len(tp.positions))
        docs.extend(expanded.tolist())
        poss.extend(tp.positions.tolist())
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
        }
    )


SQL_POSTINGS_PROBE = f"""
WITH {CORPUS_CTE}, {TOKENS_CTE}
SELECT term, doc_id, pos
FROM tokens
WHERE term IN (SELECT unnest({_sql_str_list(sorted(_POSTING_PROBE))}))
ORDER BY term, doc_id, pos
"""


def _ensure_merged_index(sf_dir: str) -> str:
    """Two half-indexes (doc parity split) merged via the index-level merge
    — the merged index must answer EXACTLY like one built over the full
    corpus, so the full-corpus SQL oracles check the merge end to end."""
    from .merge import merge_indexes

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(CACHE_ROOT, f"merge_{name}_{_data_fingerprint(sf_dir)}")
    merged = os.path.join(base, "merged")
    if os.path.exists(os.path.join(merged, "manifest.json")):
        return merged
    halves = []
    for parity in (0, 1):
        d = os.path.join(base, f"half{parity}")

        def pick(batch, parity=parity):
            import pyarrow.compute as pc

            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["doc_id"], 1), parity)
            )

        corpus = corpus_from_documents(sf_dir, override_num_blocks=8).map_batches(
            pick, batch_format="pyarrow"
        )
        build_index(corpus, d, tokenizer="trigram+symbols")
        halves.append(d)
    # the halves carry CALLER-ASSIGNED global ids (the corpus doc_id column,
    # disjoint by parity) — exactly the explicit preserve_ids opt-in case;
    # the default reassign-from-(repo,path,commit)-sort would renumber them
    # away from the doc_ids the full-corpus SQL oracle checks against
    merge_indexes(halves, merged, preserve_ids=True)
    return merged


def q_merge_postings(sf_dir: str):
    """postings probe against the MERGED index — value-hash-checked against
    the same full-corpus SQL as ``postings_probe``."""
    index_dir = _ensure_merged_index(sf_dir)
    r = IndexReader(index_dir)
    keys = {t: int(pack_trigrams(codepoints(t))[0]) for t in _POSTING_PROBE}
    plists = r.lookup(np.array(list(keys.values()), dtype=np.uint64))
    terms, docs, poss = [], [], []
    for t in sorted(_POSTING_PROBE):
        tp = plists[keys[t]]
        if tp is None:
            continue
        expanded = np.repeat(tp.doc_ids, tp.tfs)
        terms.extend([t] * len(tp.positions))
        docs.extend(expanded.tolist())
        poss.extend(tp.positions.tolist())
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
        }
    )


def _ensure_removed_index(sf_dir: str) -> str:
    """Full-corpus index with every ODD-doc_id document removed via
    remove_documents (preserve_ids — survivors keep their corpus ids), so
    the even-subset SQL oracle checks incremental deletion end to end."""
    from .merge import remove_documents

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(CACHE_ROOT, f"removed_{name}_{_data_fingerprint(sf_dir)}")
    if os.path.exists(os.path.join(out, "manifest.json")):
        return out
    full = _ensure_index(sf_dir)
    meta = pq.read_table(os.path.join(full, "docmeta"), columns=["doc_id"])
    odd = meta["doc_id"].to_numpy(zero_copy_only=False)
    remove_documents(full, out, doc_ids=odd[odd % 2 == 1], preserve_ids=True)
    return out


def q_remove_postings(sf_dir: str):
    """postings probe against the SHRUNK index — value-hash-checked against
    the even-doc-id subset of the same full-corpus SQL oracle."""
    index_dir = _ensure_removed_index(sf_dir)
    r = IndexReader(index_dir)
    keys = {t: int(pack_trigrams(codepoints(t))[0]) for t in _POSTING_PROBE}
    plists = r.lookup(np.array(list(keys.values()), dtype=np.uint64))
    terms, docs, poss = [], [], []
    for t in sorted(_POSTING_PROBE):
        tp = plists[keys[t]]
        if tp is None:
            continue
        expanded = np.repeat(tp.doc_ids, tp.tfs)
        terms.extend([t] * len(tp.positions))
        docs.extend(expanded.tolist())
        poss.extend(tp.positions.tolist())
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
        }
    )


# removal drops whole documents, so the oracle is the SAME tokens CTE with
# an even-doc_id filter — any posting leakage from a removed doc, a broken
# df rewrite, or a corrupted surviving position blob breaks the hash
SQL_REMOVE_POSTINGS = f"""
WITH {CORPUS_CTE}, {TOKENS_CTE}
SELECT term, doc_id, pos
FROM tokens
WHERE term IN (SELECT unnest({_sql_str_list(sorted(_POSTING_PROBE))}))
  AND doc_id % 2 = 0
ORDER BY term, doc_id, pos
"""


def q_phrase_search(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    return PhraseSearcher(IndexReader(index_dir)).search(PHRASE_Q)


def _sql_phrase_matches(query: str) -> str:
    """The shared raw-match CTE body (quote-escaped) — ONE definition under
    every phrase oracle, so escaping can't silently diverge between them."""
    qlen = len(query)
    esc = query.replace("'", "''")
    return f"""
  SELECT doc_id, i - 1 AS start, i - 1 + {qlen} AS "end"
  FROM (SELECT doc_id, content,
               unnest(range(1, greatest(length(content) - {qlen} + 2, 1))) AS i
        FROM corpus)
  WHERE substr(content, i, {qlen}) = '{esc}'""".strip()


def _sql_phrase(query: str, extra_cols: str = "") -> str:
    # raw matches → interval merge via gaps-and-islands (overlap/touch merges)
    return f"""
WITH {CORPUS_CTE},
matches AS (
  {_sql_phrase_matches(query)}
),
flagged AS (
  SELECT *, CASE WHEN start > lag("end") OVER w THEN 1 ELSE 0 END AS brk
  FROM matches WINDOW w AS (PARTITION BY doc_id ORDER BY start)
),
grouped AS (
  SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY start
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
merged AS (
  SELECT doc_id, min(start) AS start, max("end") AS "end"
  FROM grouped GROUP BY doc_id, grp
)
SELECT m.doc_id, c.repo || '/' || c.path AS filename, m.start, m."end"{extra_cols}
FROM merged m JOIN corpus c USING (doc_id)
ORDER BY filename, start
"""


SQL_PHRASE_SEARCH = _sql_phrase(PHRASE_Q)


def q_phrase_ranges(sf_dir: str):
    """Self-overlapping phrase — exercises interval merge (A6/D2)."""
    index_dir = _ensure_index(sf_dir)
    return PhraseSearcher(IndexReader(index_dir)).search(PHRASE_OVERLAP_Q)


SQL_PHRASE_RANGES = _sql_phrase(PHRASE_OVERLAP_Q)


def q_phrase_counts(sf_dir: str):
    """grep -c analogue: per-document RAW match count for a phrase, straight
    from the positional index (base_positions — counts before interval
    merging, so overlapping hits count individually)."""
    index_dir = _ensure_index(sf_dir)
    docs, _bases = PhraseSearcher(IndexReader(index_dir)).base_positions(PHRASE_Q)
    uniq, cnt = np.unique(docs, return_counts=True)
    return pa.table(
        {"doc_id": pa.array(uniq, type=pa.int64()),
         "n_matches": pa.array(cnt, type=pa.int64())}
    )


SQL_PHRASE_COUNTS = f"""
WITH {CORPUS_CTE},
matches AS (
  {_sql_phrase_matches(PHRASE_Q)}
)
SELECT doc_id, count(*)::BIGINT AS n_matches
FROM matches GROUP BY doc_id ORDER BY doc_id
"""


SNIPPET_WINDOW = 20


def q_phrase_snippets(sf_dir: str):
    """KWIC: ±window-rune context around every merged phrase match
    (PrettyPrinter.snippets — doc-major streamed body fetch)."""
    from ..query import PrettyPrinter

    index_dir = _ensure_index(sf_dir)
    reader = IndexReader(index_dir)
    res = PhraseSearcher(reader).search(PHRASE_Q)
    return PrettyPrinter(reader).snippets(res, window=SNIPPET_WINDOW)


SQL_PHRASE_SNIPPETS = _sql_phrase(
    PHRASE_Q,
    extra_cols=f""",
       substr(c.content, greatest(m.start - {SNIPPET_WINDOW}, 0) + 1,
              least(m."end" + {SNIPPET_WINDOW}, length(c.content))
                - greatest(m.start - {SNIPPET_WINDOW}, 0)) AS snippet""",
)


BOOL_MUST = ("merge part",)
BOOL_SHOULD = ("window", "stream")
BOOL_NOT = ("customer",)


def q_bool_search(sf_dir: str):
    """Boolean phrase composition (query.BoolSearcher): AND/OR/NOT over
    exact (position-verified) phrase doc-sets; set algebra on sorted id
    arrays."""
    from ..query import BoolSearcher

    index_dir = _ensure_index(sf_dir)
    return BoolSearcher(IndexReader(index_dir)).search(
        must=BOOL_MUST, should=BOOL_SHOULD, must_not=BOOL_NOT
    )


SQL_BOOL_SEARCH = f"""
WITH {CORPUS_CTE}
SELECT doc_id, repo || '/' || path AS filename
FROM corpus
WHERE contains(content, '{BOOL_MUST[0]}')
  AND (contains(content, '{BOOL_SHOULD[0]}') OR contains(content, '{BOOL_SHOULD[1]}'))
  AND NOT contains(content, '{BOOL_NOT[0]}')
ORDER BY doc_id
"""

PHRASE_LIMIT_N = 20


def q_phrase_limited(sf_dir: str):
    """The bounded phrase path: limit= is exactly the head of the print-all
    (filename, start) ordering, so the oracle is the same SQL + LIMIT."""
    index_dir = _ensure_index(sf_dir)
    return PhraseSearcher(IndexReader(index_dir)).search(PHRASE_Q, limit=PHRASE_LIMIT_N)


SQL_PHRASE_LIMITED = _sql_phrase(PHRASE_Q).rstrip() + f"\nLIMIT {PHRASE_LIMIT_N}"


def q_bm25_topk(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    t = BM25Searcher(IndexReader(index_dir)).topk_wand(BM25_Q, BM25_K)
    score = pa.array(np.round(t["score"].to_numpy(), 6), type=pa.float64())
    return t.drop_columns(["score", "rank"]).append_column("score", score)


def _sql_bm25(query: str, k: int) -> str:
    terms = _trigrams(query)
    return f"""
WITH {CORPUS_CTE}, {TOKENS_CTE},
q AS (SELECT unnest({_sql_str_list(terms)}) AS term),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tokens JOIN q USING (term) GROUP BY doc_id, term
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens JOIN q USING (term) GROUP BY term),
stats AS (SELECT count(*) AS n, avg(greatest(length(content) - 2, 0)) AS avgdl FROM corpus),
dl AS (SELECT doc_id, greatest(length(content) - 2, 0) AS dl FROM corpus),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scores
ORDER BY scores.score DESC, doc_id
LIMIT {k}
"""


SQL_BM25_TOPK = _sql_bm25(BM25_Q, BM25_K)


def q_symbol_search(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    return SymbolSearcher(IndexReader(index_dir)).search(SYMBOL_Q)


SQL_SYMBOL_SEARCH = f"""
WITH {CORPUS_CTE}
SELECT doc_id,
       repo || '/' || path AS filename,
       length('(defpackage :' || upper(repo) || ')') + 1 AS position,
       'DEFUN' AS specifier,
       'DOC-' || doc_id AS symbol_name,
       upper(repo) AS package_name
FROM corpus
WHERE 'DOC-' || doc_id = upper('{SYMBOL_Q}')
ORDER BY filename
"""


def q_package_defs(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    # expression filter (pushed into the scan by the planner — no row lambda)
    syms = ray.data.read_parquet(os.path.join(index_dir, "symbols")).filter(
        expr="identifier_type == 'symbol'"
    )
    out = (syms.groupby("package").count()).to_pandas()
    out = out.rename(columns={"package": "package_name", "count()": "n_defs"})
    return out.sort_values("package_name").reset_index(drop=True)


SQL_PACKAGE_DEFS = """
SELECT upper(source) AS package_name, count(*) AS n_defs
FROM documents
GROUP BY upper(source)
ORDER BY package_name
"""


def q_file_search(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    return FileSearcher(IndexReader(index_dir)).search(FILE_Q).select(["doc_id", "filename"])


SQL_FILE_SEARCH = f"""
WITH {CORPUS_CTE}
SELECT doc_id, repo || '/' || path AS filename
FROM corpus
WHERE repo || '/' || path LIKE '%{FILE_Q}%'
ORDER BY filename
"""


def q_line_extract(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    res = PhraseSearcher(r).search(LINE_Q)
    return PrettyPrinter(r).render(res).select(["doc_id", "start", "line"])


SQL_LINE_EXTRACT = f"""
WITH {CORPUS_CTE},
matches AS (
  SELECT doc_id, content, i - 1 AS start
  FROM (SELECT doc_id, content,
               unnest(range(1, greatest(length(content) - {len(LINE_Q)} + 2, 1))) AS i
        FROM corpus)
  WHERE substr(content, i, {len(LINE_Q)}) = '{LINE_Q}'
)
SELECT doc_id, start,
       split_part(content, chr(10),
                  (length(substr(content, 1, start))
                   - length(replace(substr(content, 1, start), chr(10), '')) + 1)::INT
       ) AS line
FROM matches
ORDER BY doc_id, start
"""


WORD_Q = "merge"
_SYM_CLASS = "[A-Za-z0-9*+/<>=!?_&%$.-]"


def q_word_occurrences(sf_dir: str):
    """All (doc_id, pos) occurrences of one SYMBOL term from the word index."""
    from ..query import WordSearcher

    index_dir = _ensure_index(sf_dir)
    return WordSearcher(IndexReader(index_dir)).occurrences(WORD_Q)


SQL_WORD_OCCURRENCES = f"""
WITH {CORPUS_CTE},
scan AS (
  SELECT doc_id, content, i
  FROM (SELECT doc_id, content,
               unnest(range(1, greatest(length(content) - {len(WORD_Q)} + 2, 1))) AS i
        FROM corpus)
  WHERE upper(substr(content, i, {len(WORD_Q)})) = upper('{WORD_Q}')
    AND NOT regexp_matches(substr(content, i - 1, 1), '{_SYM_CLASS}')
    AND NOT regexp_matches(substr(content, i + {len(WORD_Q)}, 1), '{_SYM_CLASS}')
)
SELECT doc_id, i - 1 AS pos FROM scan ORDER BY doc_id, pos
"""


NEAR_A, NEAR_B, NEAR_K = "merge", "sort", 12  # ≈ two words apart in the corpus


def q_near_search(sf_dir: str):
    """NEAR/k proximity search (query.ProximitySearcher): docs where an
    occurrence of NEAR_A and one of NEAR_B start within NEAR_K chars, with
    pair count and min gap.  k=12 keeps only adjacent-ish pairs, so docs
    containing both words WITHOUT a close pair exercise the drop path."""
    from ..query import ProximitySearcher

    index_dir = _ensure_index(sf_dir)
    return ProximitySearcher(IndexReader(index_dir)).near(NEAR_A, NEAR_B, NEAR_K)


def q_near_ordered(sf_dir: str):
    """Ordered NEAR (sloppy-phrase direction): NEAR_B strictly after NEAR_A
    within NEAR_K chars (query.ProximitySearcher, ordered=True)."""
    from ..query import ProximitySearcher

    index_dir = _ensure_index(sf_dir)
    return ProximitySearcher(IndexReader(index_dir)).near(
        NEAR_A, NEAR_B, NEAR_K, ordered=True
    )


def _sql_word_occ(word: str) -> str:
    """Occurrence-scan CTE body for one symbol word (the SQL_WORD_OCCURRENCES
    scan, parameterized)."""
    return f"""
  SELECT doc_id, i - 1 AS pos
  FROM (SELECT doc_id, content,
               unnest(range(1, greatest(length(content) - {len(word)} + 2, 1))) AS i
        FROM corpus)
  WHERE upper(substr(content, i, {len(word)})) = upper('{word}')
    AND NOT regexp_matches(substr(content, i - 1, 1), '{_SYM_CLASS}')
    AND NOT regexp_matches(substr(content, i + {len(word)}, 1), '{_SYM_CLASS}')
"""


SQL_NEAR_SEARCH = f"""
WITH {CORPUS_CTE},
occ_a AS ({_sql_word_occ(NEAR_A)}),
occ_b AS ({_sql_word_occ(NEAR_B)}),
pairs AS (
  SELECT a.doc_id, abs(a.pos - b.pos) AS gap
  FROM occ_a a JOIN occ_b b USING (doc_id)
  WHERE abs(a.pos - b.pos) <= {NEAR_K}
)
SELECT p.doc_id, c.repo || '/' || c.path AS filename,
       count(*)::BIGINT AS n_pairs, min(gap)::BIGINT AS min_gap
FROM pairs p JOIN corpus c USING (doc_id)
GROUP BY p.doc_id, filename
ORDER BY p.doc_id
"""


SQL_NEAR_ORDERED = f"""
WITH {CORPUS_CTE},
occ_a AS ({_sql_word_occ(NEAR_A)}),
occ_b AS ({_sql_word_occ(NEAR_B)}),
pairs AS (
  SELECT a.doc_id, b.pos - a.pos AS gap
  FROM occ_a a JOIN occ_b b USING (doc_id)
  WHERE b.pos - a.pos BETWEEN 1 AND {NEAR_K}
)
SELECT p.doc_id, c.repo || '/' || c.path AS filename,
       count(*)::BIGINT AS n_pairs, min(gap)::BIGINT AS min_gap
FROM pairs p JOIN corpus c USING (doc_id)
GROUP BY p.doc_id, filename
ORDER BY p.doc_id
"""


PREFIX_Q = "doc-1"  # matches DOC-1, DOC-10…DOC-19, DOC-1xx — a real range slice


def q_prefix_terms(sf_dir: str):
    """Wildcard term enumeration (``doc-1*``): binary-search range over the
    worddict sidecar's sorted term dictionary (query.PrefixSearcher)."""
    from ..query import PrefixSearcher

    index_dir = _ensure_index(sf_dir)
    return PrefixSearcher(IndexReader(index_dir)).terms(PREFIX_Q)


SQL_PREFIX_TERMS = f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT doc_id, upper(unnest(regexp_extract_all(content, '{_SYM_CLASS}+'))) AS term
  FROM corpus
)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks
WHERE starts_with(term, upper('{PREFIX_Q}'))
GROUP BY term ORDER BY term
"""


def q_prefix_docs(sf_dir: str):
    """Wildcard word search (``doc-1*`` → docs): dictionary range slice, then
    the matched keys go through the ordinary pruned postings lookup."""
    from ..query import PrefixSearcher

    index_dir = _ensure_index(sf_dir)
    return PrefixSearcher(IndexReader(index_dir)).docs(PREFIX_Q)


SQL_PREFIX_DOCS = f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT doc_id, upper(unnest(regexp_extract_all(content, '{_SYM_CLASS}+'))) AS term
  FROM corpus
),
hits AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE starts_with(term, upper('{PREFIX_Q}')) GROUP BY doc_id, term
)
SELECT h.doc_id, c.repo || '/' || c.path AS filename,
       count(*)::BIGINT AS n_terms, sum(h.tf)::BIGINT AS total_tf
FROM hits h JOIN corpus c USING (doc_id)
GROUP BY h.doc_id, filename
ORDER BY filename
"""


WILD_SUF_Q = "*er"  # CUSTOMER, FILTER, ORDER, … — a real multi-term scan
WILD_INFIX_Q = "*or*"  # SORT, ORDER, VECTOR, …


def q_wildcard_terms(sf_dir: str):
    """Leading-star wildcard term enumeration (``*er``): vectorized
    numpy.char suffix scan over the worddict sidecar
    (query.PrefixSearcher.wildcard_terms)."""
    from ..query import PrefixSearcher

    index_dir = _ensure_index(sf_dir)
    return PrefixSearcher(IndexReader(index_dir)).wildcard_terms(WILD_SUF_Q)


SQL_WILDCARD_TERMS = f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT doc_id, upper(unnest(regexp_extract_all(content, '{_SYM_CLASS}+'))) AS term
  FROM corpus
)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks
WHERE ends_with(term, upper('{WILD_SUF_Q[1:]}'))
GROUP BY term ORDER BY term
"""


def q_wildcard_docs(sf_dir: str):
    """Contains-wildcard doc search (``*or*`` → docs): one dictionary scan,
    then the matched keys go through the ordinary pruned postings lookup
    (query.PrefixSearcher.wildcard_docs)."""
    from ..query import PrefixSearcher

    index_dir = _ensure_index(sf_dir)
    return PrefixSearcher(IndexReader(index_dir)).wildcard_docs(WILD_INFIX_Q)


SQL_WILDCARD_DOCS = f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT doc_id, upper(unnest(regexp_extract_all(content, '{_SYM_CLASS}+'))) AS term
  FROM corpus
),
hits AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE contains(term, upper('{WILD_INFIX_Q[1:-1]}')) GROUP BY doc_id, term
)
SELECT h.doc_id, c.repo || '/' || c.path AS filename,
       count(*)::BIGINT AS n_terms, sum(h.tf)::BIGINT AS total_tf
FROM hits h JOIN corpus c USING (doc_id)
GROUP BY h.doc_id, filename
ORDER BY filename
"""


FUZZY_Q = "DOC-7"


def q_fuzzy_words(sf_dir: str):
    """Edit-distance-≤1 word match pushed into the corpus scan
    (stages/fuzzy.py): the exact vectorized lcp+lcs ed≤1 kernel runs inside
    every read batch, so only fuzzy-matching occurrences reach the shuffle."""
    from ..stages import fuzzy

    out = fuzzy.fuzzy_word_stats(corpus_from_documents(sf_dir), FUZZY_Q).to_pandas()
    out = out.reindex(columns=["word", "df", "cf"])  # empty-ds schema quirk
    return out.sort_values("word").reset_index(drop=True)


SQL_FUZZY_WORDS = f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT doc_id, upper(unnest(regexp_extract_all(content, '{_SYM_CLASS}+'))) AS word
  FROM corpus
),
hits AS (SELECT word, doc_id FROM toks WHERE levenshtein(word, '{FUZZY_Q}') <= 1)
SELECT word, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM hits GROUP BY word ORDER BY word
"""


def q_bm25_words(sf_dir: str):
    """Word-level BM25 over symbol terms (|D| = symbol-token count)."""
    from ..query import WordSearcher

    index_dir = _ensure_index(sf_dir)
    t = WordSearcher(IndexReader(index_dir)).topk(BM25_Q, BM25_K)
    score = pa.array(np.round(t["score"].to_numpy(), 6), type=pa.float64())
    return t.drop_columns(["score", "rank"]).append_column("score", score)


def _sql_bm25_words(query: str, k: int) -> str:
    import re as _re

    words = sorted({w.upper() for w in _re.findall(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+", query)})
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT doc_id, regexp_extract_all(content, '{_SYM_CLASS}+') AS tokens FROM corpus
),
stats AS (SELECT count(*) AS n, avg(len(tokens)) AS avgdl FROM toks),
tok_rows AS (SELECT doc_id, upper(unnest(tokens)) AS w FROM toks),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok_rows
  WHERE w IN (SELECT unnest({_sql_str_list(words)})) GROUP BY doc_id, w
),
df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w),
dl AS (SELECT doc_id, len(tokens) AS dl FROM toks),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
  FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scores ORDER BY scores.score DESC, doc_id LIMIT {k}
"""


SQL_BM25_WORDS = _sql_bm25_words(BM25_Q, BM25_K)


def q_index_stats(sf_dir: str):
    """Whole-index global invariants per term kind: distinct terms, Σdf,
    Σcf — the oracle re-derives all three from the raw corpus, so any
    lost/duplicated posting anywhere in the index moves a total."""
    import pandas as pd

    index_dir = _ensure_index(sf_dir)
    seg = pq.read_table(
        os.path.join(index_dir, "segments"), columns=["term_key", "kind", "df", "cf"]
    ).to_pandas()
    g = (
        seg.groupby("kind", as_index=False)
        .agg(n_terms=("term_key", "nunique"), total_df=("df", "sum"), total_cf=("cf", "sum"))
        .astype({"kind": "int64", "n_terms": "int64", "total_df": "int64", "total_cf": "int64"})
    )
    return g.sort_values("kind").reset_index(drop=True)


SQL_INDEX_STATS = f"""
WITH {CORPUS_CTE}, {TOKENS_CTE},
symtok AS (
  SELECT doc_id, upper(unnest(regexp_extract_all(content, '{_SYM_CLASS}+'))) AS term
  FROM corpus
)
SELECT 0::BIGINT AS kind,
       count(DISTINCT term)::BIGINT AS n_terms,
       (SELECT count(*) FROM (SELECT DISTINCT term, doc_id FROM tokens))::BIGINT AS total_df,
       count(*)::BIGINT AS total_cf
FROM tokens
UNION ALL
SELECT 1::BIGINT,
       count(DISTINCT term)::BIGINT,
       (SELECT count(*) FROM (SELECT DISTINCT term, doc_id FROM symtok))::BIGINT,
       count(*)::BIGINT
FROM symtok
ORDER BY kind
"""


def q_topk_terms(sf_dir: str):
    index_dir = _ensure_index(sf_dir)
    seg = pq.read_table(os.path.join(index_dir, "segments"), columns=["term", "kind", "cf"])
    df = seg.to_pandas()
    df = df[df["kind"] == 0].groupby("term", as_index=False)["cf"].sum()
    df = df.sort_values(["cf", "term"], ascending=[False, True]).head(TOPK_TERMS_N)
    return pa.table(
        {
            "term": pa.array(df["term"].tolist(), type=pa.string()),
            "cf": pa.array(df["cf"].tolist(), type=pa.int64()),
        }
    )


SQL_TOPK_TERMS = f"""
WITH {CORPUS_CTE}, {TOKENS_CTE}
SELECT term, count(*) AS cf
FROM tokens
GROUP BY term
ORDER BY cf DESC, term
LIMIT {TOPK_TERMS_N}
"""


# ===========================================================================
# training-data pipeline queries (documents / embeddings tables)
# ===========================================================================


TOPK_WORDS_N = 20


def q_topk_words(sf_dir: str):
    """Corpus-wide frequent words: the canonical pre-aggregate pattern —
    per-batch C-speed word counts (combiner) shrink the shuffle to one row
    per (word, batch); the groupby then merges tiny partials."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.split().explode().dropna()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy()})

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    out = counts.sort_values(["n", "word"], ascending=[False, True]).head(TOPK_WORDS_N)
    return out.reset_index(drop=True).astype({"n": "int64"})


SQL_TOPK_WORDS = f"""
SELECT word, count(*)::BIGINT AS n
FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
      FROM documents)
GROUP BY word
ORDER BY n DESC, word
LIMIT {TOPK_WORDS_N}
"""


def q_topk_bigrams(sf_dir: str):
    """Corpus-wide frequent word BIGRAMS: same combiner-first shape as
    topk_words — consecutive-pair extraction is one explode + shift inside
    the batch, and only (bigram, count) partials ever shuffle."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..functions.words import WORD_RE

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                              "cnt": pd.Series([], dtype="int64")})
        ex = b["text"].str.findall(WORD_RE).explode().dropna()
        if len(ex) < 2:
            return empty
        # count INTEGER code pairs (one factorize + bincount — C speed);
        # bigram strings materialize once per DISTINCT pair, not per token
        codes, vocab = pd.factorize(ex.to_numpy(dtype=object))
        doc = ex.index.to_numpy()
        same = doc[1:] == doc[:-1]
        if not same.any():
            return empty
        pair = codes[:-1][same].astype(np.int64) * len(vocab) + codes[1:][same]
        uniq, cnt = np.unique(pair, return_counts=True)
        w1 = vocab[(uniq // len(vocab)).astype(np.int64)]
        w2 = vocab[(uniq % len(vocab)).astype(np.int64)]
        return pd.DataFrame(
            {"bigram": np.char.add(np.char.add(w1.astype(str), " "), w2.astype(str)),
             "cnt": cnt.astype(np.int64)}
        )

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    out = counts.sort_values(["n", "bigram"], ascending=[False, True]).head(TOPK_WORDS_N)
    return out.reset_index(drop=True).astype({"n": "int64"})


SQL_TOPK_BIGRAMS = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])) AS bigram
  FROM w
)
SELECT bigram, count(*)::BIGINT AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {TOPK_WORDS_N}
"""


def q_dedup_exact(sf_dir: str):
    return dedup.exact_dedup(_docs(sf_dir, ["doc_id", "text"])).to_pandas().sort_values("doc_id").reset_index(drop=True)


# mirrors the engine's 128-bit content key exactly: two independently-salted
# splitmix64 chunk-fold hashes of the raw text (stages/dedup.py
# add_content_hash_batch), not an opaque md5 — the gate checks the ACTUAL
# hash primitive the engine shuffles on
SQL_DEDUP_EXACT = f"""
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents
GROUP BY {_hash_sql('text')}, {_hash_sql('text', salt=dedup.EXACT_DEDUP_SALT)}
ORDER BY doc_id
"""


def _incremental_new(sf_dir: str) -> ray.data.Dataset:
    """Deterministic synthetic "today's crawl" derived from the documents
    table (no external data): even-id rows re-arrive verbatim (dups vs the
    snapshot), odd-id rows arrive mutated (genuinely new), and ids ≡ 1
    (mod 10) arrive in a SECOND mutated copy — a within-batch duplicate
    whose min-id copy must win."""

    def make_new(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        text = b["text"].to_numpy(zero_copy_only=False)
        odd = ids % 2 == 1
        t1 = np.where(odd, np.char.add(text.astype("U"), " v2"), text).astype(object)
        again = ids % 10 == 1
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids + 100000, ids[again] + 200000]), type=pa.int64()
                ),
                "text": pa.array(
                    np.concatenate([t1, np.char.add(text[again].astype("U"), " v2")]).astype(object),
                    type=pa.string(),
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(make_new, batch_format="pyarrow")


def q_dedup_incremental(sf_dir: str):
    """Cross-snapshot exact dedup (dedup.incremental_exact): new rows keep
    only first-in-batch keys that the existing snapshot has never seen —
    hash-only shuffles + one anti-join + one semi-join, content never moves."""
    out = (
        dedup.incremental_exact(_incremental_new(sf_dir), _docs(sf_dir, ["doc_id", "text"]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.reindex(columns=["doc_id", "text"])


SQL_DEDUP_INCREMENTAL = """
WITH newt AS (
  SELECT doc_id + 100000 AS doc_id,
         CASE WHEN doc_id % 2 = 1 THEN text || ' v2' ELSE text END AS text
  FROM documents
  UNION ALL
  SELECT doc_id + 200000, text || ' v2' FROM documents WHERE doc_id % 10 = 1
),
keep AS (
  SELECT min(doc_id) AS doc_id FROM newt
  WHERE text NOT IN (SELECT text FROM documents)
  GROUP BY text
)
SELECT n.doc_id, n.text FROM newt n JOIN keep USING (doc_id) ORDER BY n.doc_id
"""


LINE_DEDUP_MINLEN = 5


def q_line_dedup(sf_dir: str):
    """Corpus-wide exact LINE dedup with document reassembly (RefinedWeb
    repeated-span removal, stages/dedup.line_dedup): only (hash, doc, line)
    rows shuffle for the decision; content moves once through the reassembly
    join.  Runs over the DERIVED code corpus (multi-line files with real
    cross-file duplicate lines — the flat documents text is single-line).
    The oracle re-derives winners with the identical hash primitive and
    rebuilds every file with a window + ordered string_agg."""
    corpus = corpus_from_documents(sf_dir, override_num_blocks=16).select_columns(
        ["doc_id", "content"]
    )
    out = (
        dedup.line_dedup(corpus, text="content", min_len=LINE_DEDUP_MINLEN)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"n_dropped": "int64"})


SQL_LINE_DEDUP = f"""
WITH {CORPUS_CTE},
ls AS (
  SELECT doc_id, string_split(content, chr(10)) AS lines FROM corpus
),
l AS (
  SELECT doc_id, i - 1 AS line_no, lines[i] AS line
  FROM (SELECT doc_id, lines, unnest(range(1, len(lines) + 1)) AS i FROM ls)
),
q AS (
  SELECT doc_id, line_no, line, length(line) >= {LINE_DEDUP_MINLEN} AS qual FROM l
),
win AS (
  SELECT doc_id, line_no, line FROM (
    SELECT doc_id, line_no, line,
           row_number() OVER (PARTITION BY ({_hash_sql('line')})::HUGEINT
                              ORDER BY doc_id, line_no) AS rn
    FROM q WHERE qual
  ) WHERE rn = 1
),
kept AS (
  SELECT doc_id, line_no, line FROM q WHERE NOT qual
  UNION ALL
  SELECT doc_id, line_no, line FROM win
),
agg AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY line_no) AS clean,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
),
nl AS (SELECT doc_id, len(lines)::BIGINT AS n_lines FROM ls)
SELECT d.doc_id,
       coalesce(a.clean, '') AS clean,
       (nl.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
FROM documents d
JOIN nl USING (doc_id)
LEFT JOIN agg a ON a.doc_id = d.doc_id
ORDER BY d.doc_id
"""


SPAN_DEDUP_W = 5


def q_span_dedup(sf_dir: str):
    """Exact duplicate-SPAN removal (stages/dedup.span_dedup — the
    word-level Lee et al. 2022 exact-substring shape): every word 5-gram
    occurring more than once across the corpus keeps only its global first
    occurrence; other occurrences mask the 5 words they cover and documents
    are rebuilt whitespace-normalized.  The oracle re-derives winners with
    the identical chunk-fold gram hash and rebuilds every doc with a window
    + ordered string_agg (the line_dedup oracle pattern at word grain)."""
    out = (
        dedup.span_dedup(_docs(sf_dir, ["doc_id", "text"]), w=SPAN_DEDUP_W)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"n_masked": "int64"})


SQL_SPAN_DEDUP = f"""
WITH wl AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT doc_id, i - 1 AS pos,
         ({_hash_sql(f"array_to_string(words[i:i+{SPAN_DEDUP_W}-1], ' ')")})::HUGEINT AS h
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - {SPAN_DEDUP_W} + 2)) AS i FROM wl)
),
lose AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM g
  ) WHERE rn > 1
),
offs AS (SELECT unnest(range(0, {SPAN_DEDUP_W})) AS o),
cov AS (SELECT DISTINCT l.doc_id, l.pos + offs.o AS wp FROM lose l CROSS JOIN offs),
wpos AS (
  SELECT doc_id, i - 1 AS wp, words[i] AS word
  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM wl)
),
kept AS (
  SELECT p.doc_id, p.wp, p.word
  FROM wpos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.wp = p.wp
  WHERE c.doc_id IS NULL
),
agg AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY wp) AS clean,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
),
nw AS (SELECT doc_id, len(words)::BIGINT AS n FROM wl)
SELECT d.doc_id, coalesce(a.clean, '') AS clean,
       (nw.n - coalesce(a.n_kept, 0))::BIGINT AS n_masked
FROM documents d
JOIN nw USING (doc_id)
LEFT JOIN agg a ON a.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_dedup_jaccard(sf_dir: str):
    out = dedup.jaccard_dedup_pairs(
        _docs(sf_dir, ["doc_id", "text", "source", "lang"]),
        ["source", "lang"],
        JACCARD_THRESHOLD,
    )
    df = out.to_pandas().sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    return df.astype({"doc_id_a": "int64", "doc_id_b": "int64"})


SQL_DEDUP_JACCARD = f"""
WITH w AS (
  SELECT doc_id, source, lang,
         list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS words
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         len(list_intersect(a.words, b.words))::DOUBLE
           / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) AS j
  FROM w a JOIN w b
    ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, round(j, 6) AS jaccard
FROM pairs WHERE j >= {JACCARD_THRESHOLD}
ORDER BY doc_id_a, doc_id_b
"""


def q_dedup_minhash(sf_dir: str):
    return _minhash_pairs(sf_dir)


# DuckDB mirror of the ENTIRE MinHash+LSH pipeline — every hash primitive is
# SQL-expressible by design (stages/dedup.py): splitmix64 chunk-fold shingle
# hashes (hashing.sql_hash_expr, bit-identical to the vectorized numpy
# kernel), multiply-shift permutations (64-bit wrap via HUGEINT hi/lo split),
# band candidacy on raw value tuples, exact-Jaccard verify at the threshold.
_SQL_U64 = "18446744073709551616"


def _sql_dedup_minhash(threshold: float) -> str:
    perm_rows = ", ".join(
        f"({p}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for p, (a, b) in enumerate(zip(dedup.PERM_A, dedup.PERM_B))
    )
    r = dedup.ROWS_PER_BAND
    vcols = ",\n         ".join(
        f"min(CASE WHEN p % {r} = {i} THEN mh END) AS v{i}" for i in range(r)
    )
    vjoin = " AND ".join(f"a.v{i} = b.v{i}" for i in range(r))
    return f"""
WITH wordlists AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
shl AS (
  SELECT doc_id,
         list_distinct(CASE
           WHEN len(words) >= 3 THEN list_transform(range(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
           WHEN len(words) > 0 THEN [array_to_string(words, ' ')]
           ELSE []::VARCHAR[] END) AS shs
  FROM wordlists
),
shstr AS (SELECT doc_id, unnest(shs) AS s FROM shl),
sh AS (SELECT doc_id, ({_hash_sql('s')})::HUGEINT AS shh FROM shstr),
perms(p, a, b) AS (VALUES {perm_rows}),
mh AS (
  SELECT doc_id, p,
         min((a * (shh % 4294967296)
              + ((a * (shh // 4294967296)) % 4294967296) * 4294967296
              + b) % {_SQL_U64}) AS mh
  FROM sh CROSS JOIN perms GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {r} AS band,
         {vcols}
  FROM mh GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b ON a.band = b.band AND {vjoin} AND a.doc_id < b.doc_id
),
shsets AS (
  SELECT doc_id, list_distinct(list_transform(shs, s -> {_hash_sql('s')})) AS hs
  FROM shl
),
jac AS (
  SELECT c.doc_id_a, c.doc_id_b,
         len(list_intersect(x.hs, y.hs))::DOUBLE
           / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) AS j
  FROM cand c
  JOIN shsets x ON x.doc_id = c.doc_id_a
  JOIN shsets y ON y.doc_id = c.doc_id_b
  WHERE len(x.hs) > 0 AND len(y.hs) > 0
)
SELECT doc_id_a, doc_id_b, round(j, 6) AS jaccard
FROM jac WHERE j >= {threshold}
ORDER BY doc_id_a, doc_id_b
"""


SQL_DEDUP_MINHASH = _sql_dedup_minhash(0.5)


def _minhash_pairs(sf_dir: str):
    return dedup.minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]),
        threshold=0.5,
        source_path=f"{sf_dir}/documents.parquet",
    )


def q_dedup_clusters(sf_dir: str):
    """Near-dup pairs → connected components (stages/cluster.py hash-to-min):
    (doc_id, cluster_id = min doc_id of the component) for every doc in a
    verified MinHash pair."""
    out = cluster.duplicate_clusters(_minhash_pairs(sf_dir)).to_pandas()
    out = out.reindex(columns=["doc_id", "cluster_id"])  # empty-ds schema quirk
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


# transitive closure of the FULL minhash-pipeline pairs via a recursive CTE —
# the oracle re-derives candidate generation, verification AND the closure;
# ONE closure definition feeds both cluster oracles (no copy to desync)
def _sql_pair_closure(select: str) -> str:
    return f"""
WITH RECURSIVE pairs AS ({_sql_dedup_minhash(0.5)}),
edges AS (
  SELECT doc_id_a AS u, doc_id_b AS v FROM pairs
  UNION SELECT doc_id_b, doc_id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
clusters AS (
  SELECT u AS doc_id, least(min(v), u) AS cluster_id FROM reach GROUP BY u
)
{select}
"""


SQL_DEDUP_CLUSTERS = _sql_pair_closure(
    "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"
)


def q_dedup_canonical(sf_dir: str):
    """The keep-list: documents minus non-canonical cluster members (one
    canonical doc — the min id — survives per near-dup component).  The
    drop-set is broadcast; the corpus streams through a vectorized filter."""
    docs = _docs(sf_dir, ["doc_id"])
    clusters = cluster.duplicate_clusters(_minhash_pairs(sf_dir))
    out = cluster.canonical_filter(docs, clusters).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


SQL_DEDUP_CANONICAL = _sql_pair_closure(
    """SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
ORDER BY doc_id"""
)


def q_canonical_export(sf_dir: str):
    """Sink round-trip: the canonical keep-list streamed to HASH-PARTITIONED
    parquet (one directory per lang — the resumable-output layout) and read
    back; the value-hash oracle then checks the re-read table, so the gate
    covers write → storage → read, not just the in-memory result."""
    import shutil

    out_dir = os.path.join(CACHE_ROOT, f"canon_{_data_fingerprint(sf_dir)}")
    docs = _docs(sf_dir, ["doc_id", "lang"])
    clusters = cluster.duplicate_clusters(_minhash_pairs(sf_dir))
    kept = cluster.canonical_filter(docs, clusters)
    shutil.rmtree(out_dir, ignore_errors=True)
    kept.write_parquet(out_dir, partition_cols=["lang"])
    back = ray.data.read_parquet(out_dir).to_pandas()
    back["lang"] = back["lang"].astype(str)  # hive partition col reads back dictionary-encoded
    return (
        back[["doc_id", "lang"]]
        .astype({"doc_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_CANONICAL_EXPORT = _sql_pair_closure(
    """SELECT doc_id, lang FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
ORDER BY doc_id"""
)


def q_dedup_simhash(sf_dir: str):
    return dedup.simhash_near_dups(_docs(sf_dir, ["doc_id", "text"]))


# DuckDB mirror of SimHash near-dup: splitmix64 chunk-fold word hashes
# (hashing.sql_hash_expr), per-bit signed sums, signature rebuilt from 32-bit
# halves, hamming = bit_count(xor(…)).  The engine's 4×16-bit band candidacy
# has recall 1 for hamming ≤ 3 (pigeonhole), so "all pairs with hamming ≤ 3"
# is the exact output contract.
SQL_DEDUP_SIMHASH = f"""
WITH wordlists AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
wr AS (SELECT doc_id, unnest(words) AS word FROM wordlists),
wh AS (SELECT doc_id, {_hash_sql('word')} AS h FROM wr),
bitsum AS (
  SELECT doc_id, bb.b AS b,
         sum(CASE WHEN ((h >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
  FROM wh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
  GROUP BY doc_id, bb.b
),
halves AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 AND b < 32 THEN (1::BIGINT << b) ELSE 0 END) AS lo,
         sum(CASE WHEN v > 0 AND b >= 32 THEN (1::BIGINT << (b - 32)) ELSE 0 END) AS hi
  FROM bitsum GROUP BY doc_id
),
sim AS (
  SELECT d.doc_id,
         coalesce(((h.hi::HUGEINT * 4294967296 + h.lo) % 18446744073709551616)::UBIGINT,
                  0::UBIGINT) AS simhash
  FROM documents d LEFT JOIN halves h ON d.doc_id = h.doc_id
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_id_a, doc_id_b
"""


def q_knn_cosine(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return knn.knn_brute_cosine(emb, _knn_queries(sf_dir), k=KNN_K)


SQL_KNN_COSINE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id IN (SELECT unnest({KNN_QUERY_IDS}))),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, round(score, 6) AS score
FROM ranked WHERE rn <= {KNN_K}
ORDER BY query_id, score DESC, vec_id
"""


def _knn_queries(sf_dir: str) -> dict[int, np.ndarray]:
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    return {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in qt.itertuples()
        if int(r.vec_id) in KNN_QUERY_IDS
    }


def q_embedding_quantize(sf_dir: str):
    """Symmetric per-vector int8 quantization (knn.quantize_embeddings),
    exploded to (vec_id, dim, scale, code) integer rows for the value-hash
    oracle.  Codes are bit-equal to the SQL mirror (half-away rounding)."""
    ds = knn.quantize_embeddings(ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        scale = batch["scale"].to_numpy(zero_copy_only=False)
        col = batch["codes"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        dim = len(flat) // max(len(ids), 1)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, dim), type=pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(ids))),
                "scale": pa.array(np.repeat(scale, dim), type=pa.float64()),
                "code": pa.array(flat, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )


_SQL_QUANT_CODES = """
s AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         coalesce(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 0) / 127.0 AS scale
  FROM embeddings
),
u AS (SELECT vec_id, scale, generate_subscripts(e, 1) AS i, unnest(e) AS x FROM s),
codes AS (
  SELECT vec_id, (i - 1)::BIGINT AS dim, scale,
         (CASE WHEN scale = 0 THEN 0
               ELSE greatest(-127, least(127,
                    CASE WHEN x >= 0 THEN floor(x / scale + 0.5)
                         ELSE -floor(-x / scale + 0.5) END)) END)::BIGINT AS code
  FROM u
)"""


SQL_EMBEDDING_QUANTIZE = f"""
WITH {_SQL_QUANT_CODES}
SELECT vec_id, dim, round(scale, 6) AS scale, code
FROM codes ORDER BY vec_id, dim
"""


def q_knn_quantized(sf_dir: str):
    """Top-k cosine over int8-quantized vectors (knn.knn_quantized_cosine):
    integer dots / integer norms — scales cancel, so the SQL oracle
    reproduces scores bit-for-bit end to end (quantize + search)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return knn.knn_quantized_cosine(emb, _knn_queries(sf_dir), k=KNN_K)


SQL_KNN_QUANTIZED = f"""
WITH {_SQL_QUANT_CODES},
norms AS (SELECT vec_id, sqrt(sum(code * code)::DOUBLE) AS nrm FROM codes GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id, sum(c.code * q.code)::DOUBLE AS dot
  FROM codes c JOIN codes q USING (dim)
  WHERE q.vec_id IN (SELECT unnest({KNN_QUERY_IDS}))
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.vec_id,
         CASE WHEN n.nrm = 0 OR qn.nrm = 0 THEN 0.0 ELSE d.dot / (n.nrm * qn.nrm) END AS score
  FROM dots d JOIN norms n ON n.vec_id = d.vec_id JOIN norms qn ON qn.vec_id = d.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, round(score, 6) AS score
FROM ranked WHERE rn <= {KNN_K}
ORDER BY query_id, score DESC, vec_id
"""


def q_ann_pq(sf_dir: str):
    """PQ+ADC approximate top-k cosine (knn.knn_pq_adc): m-byte codes per
    vector (16× compression at d=64, m=16), scores from per-query
    (m, ks) lookup tables.  Engine-defined k-means codebooks → rows-only
    gate (the dedup_embedding_ivf precedent); measured recall vs the
    exact knn_brute_cosine sibling is computed and logged every run, and
    knn_quantized carries the fully-oracled quantized-search sibling."""
    import logging

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    queries = _knn_queries(sf_dir)
    got_t = knn.knn_pq_adc(emb, queries, k=KNN_K)
    exact = knn.knn_brute_cosine(emb, queries, k=KNN_K)
    got = set(zip(got_t["query_id"].to_pylist(), got_t["vec_id"].to_pylist()))
    want = set(zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()))
    recall = (len(got & want) / len(want)) if want else 1.0
    logging.getLogger(__name__).warning(
        "pq_adc measured recall@%d vs exact sibling: %.4f (%d/%d)",
        KNN_K, recall, len(got & want), len(want),
    )
    return got_t


EMB_DUP_THRESHOLD = 0.4  # synthetic embeddings: max pairwise cosine ~0.5


def q_dedup_embedding(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return knn.embedding_near_dups(emb, threshold=EMB_DUP_THRESHOLD)


def q_dedup_embedding_ivf(sf_dir: str):
    """IVF-bucketed approximate near-dup (the 100-TB path: within-cluster
    pairs only, ~O(N²/nlist) dots).  Engine-defined clustering → rows-only
    gate; exactness of the blocked path is covered by ``dedup_embedding``.

    Because this is the one rows-only entry, it carries QUANTITATIVE
    evidence instead: measured recall vs the exact sibling on the same
    input is computed and logged every gate run (precision is 1 by
    construction — within-cluster pairs are verified by true cosine, a
    pytest pins the subset property)."""
    import logging

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    ivf = knn.ivf_near_dups(emb, threshold=EMB_DUP_THRESHOLD, nlist=8)
    exact = knn.embedding_near_dups(emb, threshold=EMB_DUP_THRESHOLD)
    got = set(zip(ivf["vec_id_a"].to_pylist(), ivf["vec_id_b"].to_pylist()))
    want = set(zip(exact["vec_id_a"].to_pylist(), exact["vec_id_b"].to_pylist()))
    recall = (len(got & want) / len(want)) if want else 1.0
    logging.getLogger(__name__).warning(
        "ivf_near_dups measured recall vs exact sibling: %.4f (%d/%d pairs; "
        "spurious=%d)", recall, len(got & want), len(want), len(got - want),
    )
    return ivf


SQL_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}
ORDER BY vec_id_a, vec_id_b
"""


GRID_BITS = 6  # 2^6 = 64 sign-grid cells over the first 6 embedding dims


def q_dedup_embedding_grid(sf_dir: str):
    """Sign-grid-blocked near-dup (the deterministic LSH scale path:
    within-cell pairs only, ~O(N²/2^bits) dots).  The blocking is
    data-independent and SQL-expressible, so — unlike the k-means IVF
    variant — the FULL pipeline is value-hash-gated."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return knn.grid_near_dups(emb, threshold=EMB_DUP_THRESHOLD, bits=GRID_BITS)


# DuckDB lists are 1-based; sign on the raw column mirrors the stage's sign
# on the normalized vector exactly (normalization preserves sign)
_GRID_CELL_EXPR = " + ".join(
    f"{1 << d} * (CASE WHEN embedding[{d + 1}] >= 0 THEN 1 ELSE 0 END)"
    for d in range(GRID_BITS)
)

SQL_DEDUP_EMBEDDING_GRID = f"""
WITH cells AS (
  SELECT vec_id, embedding, {_GRID_CELL_EXPR} AS cell FROM embeddings
)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}
ORDER BY vec_id_a, vec_id_b
"""


def q_semdedup(sf_dir: str):
    """SemDeDup-shaped semantic dedup end-to-end (knn.semdedup): sign-grid
    blocking → within-cell cosine pairs → connected components → keep the
    canonical min-id member; returns the kept vec_ids."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = knn.semdedup(emb, threshold=EMB_DUP_THRESHOLD, bits=GRID_BITS).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True).astype("int64")


SQL_SEMDEDUP = f"""
WITH RECURSIVE cells AS (
  SELECT vec_id, embedding, {_GRID_CELL_EXPR} AS cell FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
clusters AS (SELECT u AS vec_id, least(min(v), u) AS cluster_id FROM reach GROUP BY u)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM clusters WHERE vec_id <> cluster_id)
ORDER BY vec_id
"""


IVF_NLIST = 16


def _ensure_ivf(sf_dir: str) -> knn.IVFIndex:
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    ivf_dir = os.path.join(CACHE_ROOT, f"ivf_{name}_{_data_fingerprint(sf_dir)}")
    if not os.path.exists(os.path.join(ivf_dir, "ivf.json")):
        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        return knn.IVFIndex.build(emb, ivf_dir, nlist=IVF_NLIST)
    return knn.IVFIndex(ivf_dir)


def q_ann_ivf(sf_dir: str):
    """Disk-backed IVF searched with nprobe = nlist: every partition probed,
    so the result is EXACT and the brute-force SQL is a true oracle (the
    nprobe < nlist recall path is pinned separately in pytest)."""
    index = _ensure_ivf(sf_dir)
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    queries = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in qt.itertuples()
        if int(r.vec_id) in KNN_QUERY_IDS
    }
    return knn.knn_ivf_cosine(index, queries, k=KNN_K, nprobe=IVF_NLIST)


SQL_ANN_IVF = SQL_KNN_COSINE


def q_lang_id(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.lang_id_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_lang_id() -> str:
    # NB DuckDB 1.0 forbids subqueries inside lambdas — use list_contains
    counts = ",\n         ".join(
        f"len(list_filter(words, w -> list_contains({_sql_str_list(list(mk))}, w))) AS c_{lang}"
        for lang, mk in textstats.LANG_MARKERS
    )
    langs = [lang for lang, _ in textstats.LANG_MARKERS]
    g = "greatest(" + ", ".join(f"c_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN c_{la} = {g} THEN '{la}'" for la in langs)
    return f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
c AS (
  SELECT doc_id,
         {counts}
  FROM w
)
SELECT doc_id, CASE WHEN {g} = 0 THEN 'und' {case} END AS pred_lang
FROM c ORDER BY doc_id
"""


SQL_LANG_ID = _sql_lang_id()


def q_gopher_rules(sf_dir: str):
    """Gopher rule filter (Rae et al. 2021 §A.1.1): integer-exact rule
    counters + pass flag, stateless per-batch map (textstats.gopher_rules_batch)."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.gopher_rules_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_gopher_rules() -> str:
    stop_sum = " + ".join(
        f"list_contains(words, '{w}')::BIGINT" for w in textstats.GOPHER_STOPWORDS
    )
    return f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
c AS (
  SELECT doc_id,
    len(words)::BIGINT AS n_words,
    coalesce(list_aggregate(list_transform(words, x -> length(x)), 'sum'), 0)::BIGINT AS word_chars,
    len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
    ({stop_sum})::BIGINT AS n_stop_words,
    (length(text) - length(replace(text, chr(10), '')) + 1)::BIGINT AS n_lines,
    len(regexp_extract_all(text, '(?m)^[\\t ]*[-*•]'))::BIGINT AS n_bullet_lines,
    len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$'))::BIGINT AS n_ellipsis_lines,
    (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.'))
     + len(regexp_extract_all(text, '…')))::BIGINT AS n_symbols
  FROM w
)
SELECT *,
       (n_words BETWEEN 50 AND 100000
        AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
        AND 10 * n_symbols <= n_words
        AND 10 * n_bullet_lines <= 9 * n_lines
        AND 10 * n_ellipsis_lines <= 3 * n_lines
        AND 5 * n_alpha_words >= 4 * n_words
        AND n_stop_words >= 2) AS gopher_pass
FROM c ORDER BY doc_id
"""


SQL_GOPHER_RULES = _sql_gopher_rules()


def q_c4_filters(sf_dir: str):
    """C4-style page cleaning (Raffel et al. 2020 §2.2): per-line terminal
    punctuation / ≥5-word / no-"javascript" keep, page-level brace +
    "lorem ipsum" + ≥3-kept-lines gate, rewritten page text.  Stateless
    per-batch map (textstats.c4_filters_batch), zero shuffle."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.c4_filters_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_C4_FILTERS = """
WITH k AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)), x ->
             regexp_matches(x, '[.!?"]$')
             AND len(list_filter(string_split_regex(x, '\\s+'), y -> y <> '')) >= 5
             AND NOT contains(lower(x), 'javascript')) AS kept
  FROM documents
)
SELECT doc_id,
       len(lines)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept_lines,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       contains(text, '{') AS has_brace,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       (NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')
        AND len(kept) >= 3) AS c4_keep
FROM k ORDER BY doc_id
"""


def q_normalize_text(sf_dir: str):
    """Unicode + whitespace normalization (textstats.normalize_text_batch):
    NFC, control strip, whitespace collapse, trim.  Zero shuffle."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.normalize_text_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_NORMALIZE_TEXT = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(nfc_normalize(text),
              '[\\x00-\\x08\\x0B\\x0E-\\x1F\\x7F]', '', 'g'),
              '[\\t\\n\\f\\r ]+', ' ', 'g'), ' ') AS norm_text
  FROM documents
)
SELECT doc_id, norm_text, (norm_text <> text) AS changed,
       length(norm_text)::BIGINT AS n_chars
FROM n ORDER BY doc_id
"""


BLOCKLIST = ("merge part", "slow join", "lorem ipsum")


def q_blocklist(sf_dir: str):
    """Banned-phrase filter (textstats.blocklist_filter): case-insensitive
    substring counts vs a broadcast blocklist, zero shuffle."""
    return (
        textstats.blocklist_filter(_docs(sf_dir, ["doc_id", "text"]), BLOCKLIST)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_blocklist_multi(sf_dir: str):
    """Banned-phrase filter through the LARGE-blocklist engine
    (textstats.blocklist_filter_multipattern — banked Rabin-Karp multi-set
    scan, per-batch cost independent of pattern count; actor pool, phrase
    banks built once per actor).  Same contract and oracle as
    ``blocklist``; the 10⁴-pattern evidence is the pytest pin against the
    scalar path."""
    return (
        textstats.blocklist_filter_multipattern(
            _docs(sf_dir, ["doc_id", "text"]), BLOCKLIST
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_blocklist() -> str:
    hits = " + ".join(
        f"(length(lower(text)) - length(replace(lower(text), '{p}', ''))) / {len(p)}"
        for p in BLOCKLIST
    )
    phr = " + ".join(
        f"contains(lower(text), '{p}')::BIGINT" for p in BLOCKLIST
    )
    return f"""
SELECT doc_id,
       ({hits})::BIGINT AS n_hits,
       ({phr})::BIGINT AS n_phrases,
       ({phr}) > 0 AS blocked
FROM documents ORDER BY doc_id
"""


SQL_BLOCKLIST = _sql_blocklist()


COOC_WINDOW, COOC_TOPK = 3, 20


def q_word_cooc(sf_dir: str):
    """Windowed word co-occurrence + PMI (textstats.word_cooccurrence):
    combiner-first integer pair counting, distributed totals + top-k."""
    out = textstats.word_cooccurrence(
        _docs(sf_dir, ["text"]), window=COOC_WINDOW, top_k=COOC_TOPK
    )
    return out.reset_index(drop=True)


SQL_WORD_COOC = f"""
WITH w AS (
  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS word
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
        FROM documents)
),
pairs AS (
  SELECT least(a.word, b.word) AS word_a, greatest(a.word, b.word) AS word_b
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND {COOC_WINDOW}
),
pcnt AS (SELECT word_a, word_b, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2),
tot AS (SELECT (SELECT count(*) FROM w)::DOUBLE AS nw,
               (SELECT count(*) FROM pairs)::DOUBLE AS np),
ucnt AS (SELECT word, count(*)::DOUBLE AS c FROM w GROUP BY word),
topk AS (SELECT * FROM pcnt ORDER BY n DESC, word_a, word_b LIMIT {COOC_TOPK})
SELECT t.word_a, t.word_b, t.n,
       round(log2((t.n::DOUBLE * tot.nw * tot.nw) / (tot.np * ua.c * ub.c)), 6) AS pmi
FROM topk t
CROSS JOIN tot
JOIN ucnt ua ON ua.word = t.word_a
JOIN ucnt ub ON ub.word = t.word_b
ORDER BY t.n DESC, t.word_a, t.word_b
"""


COOC_MIN = 920  # prunes the sf0.001/0.01 synthetic vocab 31 -> ~15 words


def q_word_cooc_capped(sf_dir: str):
    """Count-capped-vocabulary co-occurrence (word_cooccurrence
    ``min_count`` — the r5 scale path for web vocabularies): a distributed
    unigram pass keeps words with total count ≥ COOC_MIN, the keep set
    broadcasts once, and pair formation filters occurrences FIRST (pair
    table bounded by capped-vocab²).  Window distances stay
    original-token-stream (searchsorted exact-distance pairing), mirrored
    in SQL by filtering the exploded words against a HAVING-count vocab
    CTE while keeping the pre-filter subscripts."""
    out = textstats.word_cooccurrence(
        _docs(sf_dir, ["text"]),
        window=COOC_WINDOW,
        top_k=COOC_TOPK,
        min_count=COOC_MIN,
    )
    return out.reset_index(drop=True)


SQL_WORD_COOC_CAPPED = f"""
WITH w0 AS (
  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS word
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
        FROM documents)
),
vocab AS (SELECT word FROM w0 GROUP BY word HAVING count(*) >= {COOC_MIN}),
w AS (SELECT w0.* FROM w0 JOIN vocab USING (word)),
pairs AS (
  SELECT least(a.word, b.word) AS word_a, greatest(a.word, b.word) AS word_b
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND {COOC_WINDOW}
),
pcnt AS (SELECT word_a, word_b, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2),
tot AS (SELECT (SELECT count(*) FROM w)::DOUBLE AS nw,
               (SELECT count(*) FROM pairs)::DOUBLE AS np),
ucnt AS (SELECT word, count(*)::DOUBLE AS c FROM w GROUP BY word),
topk AS (SELECT * FROM pcnt ORDER BY n DESC, word_a, word_b LIMIT {COOC_TOPK})
SELECT t.word_a, t.word_b, t.n,
       round(log2((t.n::DOUBLE * tot.nw * tot.nw) / (tot.np * ua.c * ub.c)), 6) AS pmi
FROM topk t
CROSS JOIN tot
JOIN ucnt ua ON ua.word = t.word_a
JOIN ucnt ub ON ub.word = t.word_b
ORDER BY t.n DESC, t.word_a, t.word_b
"""


def q_quality(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.quality_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_QUALITY = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       len(words)::BIGINT AS n_words,
       round(len(list_filter(words, x -> list_contains({_sql_str_list(list(textstats.STOPWORDS))}, x)))::DOUBLE
             / greatest(len(words), 1), 6) AS stop_ratio,
       round(len(list_distinct(words))::DOUBLE / greatest(len(words), 1), 6) AS distinct_ratio,
       round(list_aggregate(list_transform(words, x -> length(x)), 'sum')::DOUBLE
             / greatest(len(words), 1), 6) AS mean_word_len
FROM w ORDER BY doc_id
"""


def q_quality_score(sf_dir: str):
    """Batched model inference: actor-pool stage loads the (deterministic)
    logistic model once per actor and scores whole batches (one matmul +
    sigmoid); weights are embedded verbatim in the SQL mirror."""
    from ..functions.resources import actor_pool

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            textstats.QualityModelStage,
            batch_format="pandas",
            batch_size=256,
            concurrency=actor_pool(),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_quality_score() -> str:
    w0, w1, w2, w3, w4 = textstats.QUALITY_MODEL_W
    return f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
q AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         round(len(list_filter(words, x -> list_contains({_sql_str_list(list(textstats.STOPWORDS))}, x)))::DOUBLE
               / greatest(len(words), 1), 6) AS stop_ratio,
         round(len(list_distinct(words))::DOUBLE / greatest(len(words), 1), 6) AS distinct_ratio,
         round(list_aggregate(list_transform(words, x -> length(x)), 'sum')::DOUBLE
               / greatest(len(words), 1), 6) AS mean_word_len
  FROM w
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({w0} + {w1} * (n_words / 100.0) + {w2} * stop_ratio
                               + {w3} * distinct_ratio + {w4} * (mean_word_len / 10.0)))), 6)
         AS quality_score
FROM q ORDER BY doc_id
"""


SQL_QUALITY_SCORE = _sql_quality_score()


QUALITY_FILTER_P = 0.75


def q_quality_filter(sf_dir: str):
    """Percentile-threshold quality filter (textstats.quality_quantile_filter):
    keep docs scoring ≥ the per-lang discrete 0.75-quantile.  Two passes —
    score (map_batches) → per-group order statistic (one narrow shuffle) →
    broadcast thresholds → vectorized keep filter."""
    out = (
        textstats.quality_quantile_filter(
            _docs(sf_dir, ["doc_id", "text", "lang"]), p=QUALITY_FILTER_P, by="lang"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def _sql_quality_filter() -> str:
    w0, w1, w2, w3, w4 = textstats.QUALITY_MODEL_W
    return f"""
WITH w AS (
  SELECT doc_id, lang, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         len(words)::BIGINT AS n_words,
         round(len(list_filter(words, x -> list_contains({_sql_str_list(list(textstats.STOPWORDS))}, x)))::DOUBLE
               / greatest(len(words), 1), 6) AS stop_ratio,
         round(len(list_distinct(words))::DOUBLE / greatest(len(words), 1), 6) AS distinct_ratio,
         round(list_aggregate(list_transform(words, x -> length(x)), 'sum')::DOUBLE
               / greatest(len(words), 1), 6) AS mean_word_len
  FROM w
),
scored AS (
  SELECT doc_id, lang,
         round(1.0 / (1.0 + exp(-({w0} + {w1} * (n_words / 100.0) + {w2} * stop_ratio
                                 + {w3} * distinct_ratio + {w4} * (mean_word_len / 10.0)))), 6)
           AS quality_score
  FROM q
),
thr AS (
  SELECT lang, quantile_disc(quality_score, {QUALITY_FILTER_P}) AS t
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.quality_score
FROM scored s JOIN thr USING (lang)
WHERE s.quality_score >= thr.t
ORDER BY s.doc_id
"""


SQL_QUALITY_FILTER = _sql_quality_filter()


def q_pii_scrub(sf_dir: str):
    """PII redaction (textstats.scrub_pii_batch): emails + multi-digit runs
    → placeholder tokens, single vectorized map_batches pass, no shuffle.
    Runs over the derived corpus (its doc-NNN identifiers exercise the
    digit-run path on every row)."""
    out = (
        corpus_from_documents(sf_dir)
        .select_columns(["doc_id", "content"])
        .map_batches(
            lambda b: textstats.scrub_pii_batch(b, text_col="content"),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


SQL_PII_SCRUB = f"""
WITH {CORPUS_CTE}
SELECT doc_id,
       regexp_replace(regexp_replace(content, '{textstats.PII_EMAIL_PAT}', '{textstats.PII_EMAIL_TOKEN}', 'g'),
                      '{textstats.PII_NUM_PAT}', '{textstats.PII_NUM_TOKEN}', 'g') AS clean,
       len(regexp_extract_all(content, '{textstats.PII_EMAIL_PAT}'))::BIGINT AS n_email,
       len(regexp_extract_all(regexp_replace(content, '{textstats.PII_EMAIL_PAT}', '{textstats.PII_EMAIL_TOKEN}', 'g'),
                              '{textstats.PII_NUM_PAT}'))::BIGINT AS n_num
FROM corpus ORDER BY doc_id
"""


def q_token_counts(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.token_counts_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS n_words,
       greatest(length(text) - 2, 0)::BIGINT AS n_trigrams,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+'))::BIGINT AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def q_fingerprint(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.fingerprint_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# mirrors the engine's own splitmix64 fingerprint primitive bit-exactly
# (stages/textstats.fingerprint_batch), not an opaque md5
_FP_NORM = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
SQL_FINGERPRINT = f"""
SELECT doc_id,
       lower(lpad(hex({_hash_sql(_FP_NORM)}), 16, '0')) AS fingerprint
FROM documents ORDER BY doc_id
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition signals (textstats.repetition_batch):
    duplicate-line fraction (row + char weighted) and top-word fraction —
    one vectorized map_batches pass, mirrored by line/word explode CTEs."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.repetition_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_DOC_REPETITION = """
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lc AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY doc_id, line),
lagg AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_lines,
         sum(c * length(line))::BIGINT AS line_chars,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup_lines,
         sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)::BIGINT AS dup_chars
  FROM lc GROUP BY doc_id
),
w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
wcn AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
wagg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_words, max(c)::BIGINT AS top_word
  FROM wcn GROUP BY doc_id
)
SELECT d.doc_id,
       lagg.n_lines,
       round(lagg.dup_lines / greatest(lagg.n_lines, 1)::DOUBLE, 6) AS dup_line_frac,
       round(lagg.dup_chars / greatest(lagg.line_chars, 1)::DOUBLE, 6) AS dup_line_char_frac,
       coalesce(wagg.n_words, 0)::BIGINT AS n_words,
       round(coalesce(wagg.top_word, 0)
             / greatest(coalesce(wagg.n_words, 0), 1)::DOUBLE, 6) AS top_word_frac
FROM documents d
JOIN lagg USING (doc_id)
LEFT JOIN wagg USING (doc_id)
ORDER BY d.doc_id
"""


PACK_BUDGET = 64
PACK_BUCKET_SPAN = 128


def q_pack_sequences(sf_dir: str):
    """Training-sequence packing (stages/packing.pack_sequences): distributed
    exclusive prefix sum over per-doc token counts in doc_id order →
    budget-sized sequence assignment; small budget/span so docs span
    boundaries and multiple buckets exist at gate scale."""
    from ..stages.packing import pack_sequences

    return (
        pack_sequences(
            _docs(sf_dir, ["doc_id", "text"]),
            budget=PACK_BUDGET,
            bucket_span=PACK_BUCKET_SPAN,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)::BIGINT AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
       tok_offset // {PACK_BUDGET} AS seq_first,
       (tok_offset + greatest(n_tokens, 1) - 1) // {PACK_BUDGET} AS seq_last,
       tok_offset % {PACK_BUDGET} AS seq_pos
FROM o ORDER BY doc_id
"""


def q_assemble_sequences(sf_dir: str):
    """Materialized packed training sequences (packing.assemble_sequences):
    corpus tokens in doc order cut into budget-sized sequences; fragments
    co-locate via one seq_id exchange and join ordered."""
    from ..stages.packing import assemble_sequences

    out = (
        assemble_sequences(
            _docs(sf_dir, ["doc_id", "text"]),
            budget=PACK_BUDGET,
            bucket_span=PACK_BUCKET_SPAN,
        )
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    return out.astype({"seq_id": "int64", "n_tokens": "int64"})


SQL_ASSEMBLE_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
o AS (
  SELECT doc_id, words, len(words)::BIGINT AS n_tokens,
         (sum(len(words)) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len(words))::BIGINT AS toff
  FROM t
),
frag AS (
  SELECT doc_id, words, n_tokens, toff,
         unnest(range(toff // {PACK_BUDGET},
                      (toff + n_tokens - 1) // {PACK_BUDGET} + 1)) AS seq_id
  FROM o WHERE n_tokens > 0
),
cut AS (
  SELECT seq_id,
         greatest(seq_id * {PACK_BUDGET}, toff) AS a,
         least((seq_id + 1) * {PACK_BUDGET}, toff + n_tokens) AS b,
         array_to_string(list_slice(words,
           (greatest(seq_id * {PACK_BUDGET}, toff) - toff + 1)::BIGINT,
           (least((seq_id + 1) * {PACK_BUDGET}, toff + n_tokens) - toff)::BIGINT), ' ') AS frag
  FROM frag
)
SELECT seq_id::BIGINT AS seq_id,
       sum(b - a)::BIGINT AS n_tokens,
       string_agg(frag, ' ' ORDER BY a) AS text
FROM cut GROUP BY seq_id ORDER BY seq_id
"""


CONTAM_BENCH_RATE = 0.2


def q_contamination(sf_dir: str):
    """Benchmark-contamination scan (textstats.contamination_check): per
    training doc, fraction of its distinct word 3-shingles appearing in the
    hash-sampled benchmark split; broadcast gram set, zero shuffle."""
    return (
        textstats.contamination_check(
            _docs(sf_dir, ["doc_id", "text"]), bench_rate=CONTAM_BENCH_RATE, w=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_contamination() -> str:
    from ..stages.sample import _threshold, sql_key_hash

    bench = f"({sql_key_hash('doc_id')})::HUGEINT < {_threshold(CONTAM_BENCH_RATE)}"
    return f"""
WITH wordlists AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
shl AS (
  SELECT doc_id,
         list_distinct(CASE
           WHEN len(words) >= 3 THEN list_transform(range(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
           WHEN len(words) > 0 THEN [array_to_string(words, ' ')]
           ELSE []::VARCHAR[] END) AS shs
  FROM wordlists
),
bset AS (
  SELECT DISTINCT ({_hash_sql('s')})::HUGEINT AS h
  FROM (SELECT unnest(shs) AS s FROM shl WHERE {bench})
),
train AS (
  SELECT doc_id,
         list_distinct(list_transform(shs, s -> ({_hash_sql('s')})::HUGEINT)) AS hs
  FROM shl WHERE NOT ({bench})
),
per AS (SELECT doc_id, unnest(hs) AS h FROM train),
hits AS (
  SELECT per.doc_id, count(*) AS c FROM per JOIN bset USING (h) GROUP BY per.doc_id
)
SELECT t.doc_id,
       len(t.hs)::BIGINT AS n_shingles,
       coalesce(h.c, 0)::BIGINT AS n_hits,
       round(coalesce(h.c, 0) / greatest(len(t.hs), 1)::DOUBLE, 6) AS contam_frac
FROM train t LEFT JOIN hits h USING (doc_id)
ORDER BY t.doc_id
"""


SQL_CONTAMINATION = _sql_contamination()


SAMPLE_RATE = 0.37
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_sample_bernoulli(sf_dir: str):
    """Deterministic hash sample (stages/sample.py): keep decision is a pure
    function of doc_id — identical at any parallelism/layout — and the SQL
    mirror recomputes the same mix64 threshold test bit-exactly."""
    from ..stages import sample

    return (
        sample.bernoulli_sample(_docs(sf_dir, ["doc_id"]), SAMPLE_RATE)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_split_assign(sf_dir: str):
    """Train/val/test hash split: disjoint, exhaustive, reshuffle-stable."""
    from ..stages import sample

    return (
        sample.hash_split(_docs(sf_dir, ["doc_id"]), SPLIT_FRACTIONS)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_keyed_split(sf_dir: str):
    """Leakage-safe split (sample.keyed_split): every row of one ``source``
    lands in the same split — assignment hashes the GROUP string, not the
    row id, so a source's near-duplicates can't straddle train/test.  Zero
    shuffle; bit-exact SQL mirror via sql_hash_expr(source)."""
    from ..stages import sample

    return (
        sample.keyed_split(_docs(sf_dir, ["doc_id", "source"]), SPLIT_FRACTIONS, group="source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_keyed_split() -> str:
    from ..functions.hashing import sql_hash_expr
    from ..stages.sample import DEFAULT_SALT, _threshold

    h = f"({sql_hash_expr('source', DEFAULT_SALT)})::HUGEINT"
    names = list(SPLIT_FRACTIONS)
    cum, cases = 0.0, []
    for n in names[:-1]:
        cum += SPLIT_FRACTIONS[n]
        cases.append(f"WHEN {h} < {_threshold(cum)} THEN '{n}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"SELECT doc_id, source, {case} AS split FROM documents ORDER BY doc_id"


SQL_KEYED_SPLIT = _sql_keyed_split()


def _sql_sample_exprs():
    from ..stages.sample import _threshold, sql_key_hash

    h = f"({sql_key_hash('doc_id')})::HUGEINT"
    t_keep = _threshold(SAMPLE_RATE)
    names = list(SPLIT_FRACTIONS)
    cum, cases = 0.0, []
    for n in names[:-1]:
        cum += SPLIT_FRACTIONS[n]
        cases.append(f"WHEN {h} < {_threshold(cum)} THEN '{n}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return h, t_keep, case


def _sample_sql() -> tuple[str, str]:
    h, t_keep, case = _sql_sample_exprs()
    return (
        f"SELECT doc_id FROM documents WHERE {h} < {t_keep} ORDER BY doc_id",
        f"SELECT doc_id, {case} AS split FROM documents ORDER BY doc_id",
    )


SQL_SAMPLE_BERNOULLI, SQL_SPLIT_ASSIGN = _sample_sql()


WEIGHTED_RATE, WEIGHTED_REF = 0.3, 300.0


def q_sample_weighted(sf_dir: str):
    """Weight-proportional deterministic sample (sample.weighted_sample):
    longer docs keep with higher probability; hash and per-row threshold
    compared as IEEE doubles on both sides."""
    from ..stages import sample

    return (
        sample.weighted_sample(
            _docs(sf_dir, ["doc_id", "n_chars"]),
            WEIGHTED_RATE, "n_chars", WEIGHTED_REF,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _sql_sample_weighted() -> str:
    from ..stages.sample import sql_key_hash

    return f"""
SELECT doc_id, n_chars FROM documents
WHERE CAST({sql_key_hash("doc_id")} AS DOUBLE)
      < least(greatest({WEIGHTED_RATE} * n_chars / {WEIGHTED_REF}, 0), 1)
        * 18446744073709551616.0
ORDER BY doc_id
"""


SQL_SAMPLE_WEIGHTED = _sql_sample_weighted()


UNIGRAM_VOCAB_K = 40


def q_unigram_bpw(sf_dir: str):
    """CCNet-shape perplexity filter signal (textstats.unigram_bits_per_word):
    pass 1 fits the global top-K unigram model with combiner partials; pass 2
    broadcasts it and scores every doc as bits-per-word.  K small enough that
    real OOV backoff happens at gate scale."""
    out = (
        textstats.unigram_bits_per_word(
            _docs(sf_dir, ["doc_id", "text"]), vocab_k=UNIGRAM_VOCAB_K
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"n_words": "int64"})


SQL_UNIGRAM_BPW = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
wh AS (SELECT doc_id, ({_hash_sql('word')})::HUGEINT AS h FROM w),
wc AS (SELECT h, count(*) AS c FROM wh GROUP BY h),
tot AS (SELECT sum(c)::DOUBLE AS n FROM wc),
vocab AS (SELECT h, c FROM wc ORDER BY c DESC, h ASC LIMIT {UNIGRAM_VOCAB_K}),
scored AS (
  SELECT wh.doc_id,
         log2((SELECT n FROM tot)) - log2(coalesce(v.c, 1)::DOUBLE) AS bits
  FROM wh LEFT JOIN vocab v USING (h)
),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_words, avg(bits) AS bpw FROM scored GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_words, 0)::BIGINT AS n_words,
       round(coalesce(a.bpw, 0), 4) AS bits_per_word
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


BIGRAM_VOCAB_K = 40
BIGRAM_TOPK = 80


def q_bigram_bpw(sf_dir: str):
    """Bigram-LM perplexity signal with stupid backoff
    (textstats.bigram_bits_per_word): one shared fit shuffle for both gram
    orders; K small enough that both the bigram hit and both backoff paths
    fire at gate scale."""
    out = (
        textstats.bigram_bits_per_word(
            _docs(sf_dir, ["doc_id", "text"]),
            vocab_k=BIGRAM_VOCAB_K,
            bigram_k=BIGRAM_TOPK,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"n_words": "int64"})


def _sql_bigram_bpw() -> str:
    from ..functions.hashing import sql_mix64_expr
    from ..stages.textstats import BIGRAM_BACKOFF_BITS

    hb = sql_mix64_expr(f"xor(hp, {sql_mix64_expr('h')})")
    return f"""
WITH w AS (
  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS word
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
        FROM documents)
),
wh AS (SELECT doc_id, i, ({_hash_sql('word')})::UBIGINT AS h FROM w),
seq AS (
  SELECT doc_id, i, h, lag(h) OVER (PARTITION BY doc_id ORDER BY i) AS hp
  FROM wh
),
seqb AS (
  SELECT doc_id, i, h, hp,
         CASE WHEN hp IS NULL THEN NULL ELSE ({hb})::UBIGINT END AS hb
  FROM seq
),
ucnt AS (SELECT h, count(*) AS c FROM wh GROUP BY h),
tot AS (SELECT sum(c)::DOUBLE AS n FROM ucnt),
vocab AS (SELECT h, c FROM ucnt ORDER BY c DESC, h ASC LIMIT {BIGRAM_VOCAB_K}),
bcnt AS (SELECT hb, count(*) AS c FROM seqb WHERE hb IS NOT NULL GROUP BY hb),
bvocab AS (SELECT hb, c FROM bcnt ORDER BY c DESC, hb ASC LIMIT {BIGRAM_TOPK}),
scored AS (
  SELECT s.doc_id,
         CASE
           WHEN s.hp IS NOT NULL AND vb.c IS NOT NULL AND vp.c IS NOT NULL
             THEN log2(vp.c::DOUBLE) - log2(vb.c::DOUBLE)
           WHEN s.hp IS NOT NULL
             THEN {BIGRAM_BACKOFF_BITS} + log2((SELECT n FROM tot)) - log2(coalesce(vu.c, 1)::DOUBLE)
           ELSE log2((SELECT n FROM tot)) - log2(coalesce(vu.c, 1)::DOUBLE)
         END AS bits
  FROM seqb s
  LEFT JOIN vocab vu ON vu.h = s.h
  LEFT JOIN vocab vp ON vp.h = s.hp
  LEFT JOIN bvocab vb ON vb.hb = s.hb
),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_words, avg(bits) AS bpw FROM scored GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_words, 0)::BIGINT AS n_words,
       round(coalesce(a.bpw, 0), 4) AS bits_per_word
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


SQL_BIGRAM_BPW = _sql_bigram_bpw()


MIX_WEIGHTS = {"en": 0.5, "fr": 0.25, "es": 0.125, "de": 0.0625, "zh": 0.0625}


def q_mix_sources(sf_dir: str):
    """Training-mix reweighting (sample.mix_sources): per-language targets
    realized exactly via integer order statistics over the deterministic
    hash rank — combiner-first counts + the mergeable top-k kernel."""
    from ..stages.sample import mix_sources

    out = mix_sources(
        _docs(sf_dir, ["doc_id", "lang"]), MIX_WEIGHTS, group="lang"
    ).to_pandas()
    # Ray drops the schema of fully-empty datasets (unsatisfiable mix)
    out = out.reindex(columns=["doc_id", "lang", "rank"])
    out = out.astype({"doc_id": "int64", "rank": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _sql_mix_sources() -> str:
    from ..stages.sample import sql_key_hash

    wvals = ", ".join(f"('{g}', {w})" for g, w in MIX_WEIGHTS.items())
    langs = ", ".join(f"'{g}'" for g in MIX_WEIGHTS)
    return f"""
WITH w(grp, wt) AS (VALUES {wvals}),
cnt AS (SELECT lang AS grp, count(*) AS n FROM documents GROUP BY lang),
t AS (
  SELECT min(floor(coalesce(cnt.n, 0) / w.wt))::BIGINT AS T
  FROM w LEFT JOIN cnt USING (grp)
),
keepn AS (SELECT grp, floor((SELECT T FROM t) * wt)::BIGINT AS k FROM w),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {sql_key_hash('doc_id')}, doc_id) AS rn
  FROM documents WHERE lang IN ({langs})
)
SELECT doc_id, lang, rn AS "rank"
FROM ranked JOIN keepn ON keepn.grp = ranked.lang
WHERE rn <= keepn.k
ORDER BY doc_id
"""


SQL_MIX_SOURCES = _sql_mix_sources()


STRATIFIED_N = 50


def q_events_stratified(sf_dir: str):
    """Deterministic n-per-group sample (stages/sample.stratified_sample):
    keep each event_type's n smallest mix64(event_id) ranks — per-stratum
    quota sampling via the combiner-first top-k kernel, reproducible at any
    parallelism and mirrored bit-exactly by a window re-derivation."""
    from ..stages.sample import stratified_sample

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    df = stratified_sample(ev, "event_type", STRATIFIED_N, key="event_id").to_pandas()
    df = df.astype({"event_id": "int64", "rank": "int64"})
    return df.sort_values(["event_type", "rank"]).reset_index(drop=True)


def _sql_events_stratified() -> str:
    from ..stages.sample import sql_key_hash

    return f"""
SELECT event_id, event_type, rn AS "rank" FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {sql_key_hash("event_id")}, event_id) AS rn
  FROM events
) WHERE rn <= {STRATIFIED_N}
ORDER BY event_type, "rank"
"""


def q_multimodal_meta(sf_dir: str):
    """Synthesize REAL P6 payloads, then parse them back byte-for-byte with
    the real decoder (stages/multimodal.py).  The SQL mirror reproduces the
    header geometry arithmetic, so a parser bug breaks the hash match."""
    from ..functions.resources import actor_pool

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(multimodal.attach_payload_batch, batch_format="pyarrow")
        .map_batches(
            multimodal.ImageDecodeStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=actor_pool(),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# n (runes) → P6 header "P6\n# frames=F\nW H\n255\n" + W·H·3 pixel bytes
SQL_MULTIMODAL_META = f"""
SELECT doc_id,
       (19 + length(((n % {multimodal.FRAMES_MOD}) + 1)::VARCHAR)
           + length(((n % {multimodal.IMG_W_MOD}) + 1)::VARCHAR)
           + length(((n % {multimodal.IMG_H_MOD}) + 1)::VARCHAR)
           + ((n % {multimodal.IMG_W_MOD}) + 1) * ((n % {multimodal.IMG_H_MOD}) + 1) * 3
       )::BIGINT AS n_bytes,
       ((n % {multimodal.IMG_W_MOD}) + 1)::BIGINT AS width,
       ((n % {multimodal.IMG_H_MOD}) + 1)::BIGINT AS height,
       ((n % {multimodal.FRAMES_MOD}) + 1)::BIGINT AS n_frames
FROM (SELECT doc_id, length(text) AS n FROM documents)
ORDER BY doc_id
"""


def q_frame_sample(sf_dir: str):
    from ..functions.resources import actor_pool

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(multimodal.attach_payload_batch, batch_format="pyarrow")
        .map_batches(
            multimodal.FrameSampleStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=actor_pool(),
            fn_constructor_kwargs={"stride": 10},
        )
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )


SQL_FRAME_SAMPLE = f"""
SELECT * FROM (
  SELECT doc_id, unnest(range(0, length(text) % {multimodal.FRAMES_MOD} + 1, 10))::BIGINT AS frame_idx
  FROM documents
) ORDER BY doc_id, frame_idx
"""


RESIZE_W, RESIZE_H = 16, 12


def q_image_resize(sf_dir: str):
    """Real nearest-neighbor resize over the decoded P6 rasters; the oracle
    checks the full plumbing geometry (every doc resized to fixed dims, P6
    re-encode size exact); pixel-level correctness is pinned against a numpy
    reference in pytest."""
    from ..functions.resources import actor_pool

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(multimodal.attach_payload_batch, batch_format="pyarrow")
        .map_batches(
            multimodal.ImageResizeStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=actor_pool(),
            fn_constructor_kwargs={"out_w": RESIZE_W, "out_h": RESIZE_H},
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out[["doc_id", "width", "height", "n_bytes"]]


_P6_HDR_LEN = len(f"P6\n{RESIZE_W} {RESIZE_H}\n255\n")
SQL_IMAGE_RESIZE = f"""
SELECT doc_id, {RESIZE_W}::BIGINT AS width, {RESIZE_H}::BIGINT AS height,
       ({_P6_HDR_LEN} + {RESIZE_W} * {RESIZE_H} * 3)::BIGINT AS n_bytes
FROM documents ORDER BY doc_id
"""


def q_image_features(sf_dir: str):
    """Numpy feature kernels over decoded rasters (mean RGB, luminance std,
    edge density).  Since r5 the kernels are INTEGER-DERIVED (milli-weight
    luminance, int64 sums — ImageFeatureStage docstring) so the whole stage
    carries a full value-hash SQL oracle that re-derives every pixel byte
    and mirrors the final float expressions token-for-token.  ASCII guard on
    both sides, same contract as ``image_channel_stats``."""
    import pandas as pd

    from ..functions.resources import actor_pool

    def ascii_only(b: pd.DataFrame) -> pd.DataFrame:
        n_runes = b["text"].str.len()
        n_bytes = b["text"].str.encode("utf-8").str.len()
        return b[(n_runes == n_bytes) & (n_runes > 0)]

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ascii_only, batch_format="pandas")
        .map_batches(multimodal.attach_payload_batch, batch_format="pyarrow")
        .map_batches(
            multimodal.ImageFeatureStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=actor_pool(),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_IMAGE_FEATURES = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         (length(text) % {multimodal.IMG_W_MOD} + 1) AS w,
         (length(text) % {multimodal.IMG_H_MOD} + 1) AS h
  FROM documents
  WHERE octet_length(encode(text)) = length(text) AND length(text) > 0
),
lum AS (
  SELECT doc_id, w, h, n, p, p % w AS x,
         ascii(substr(text, (((3*p) % n) + 1)::INT, 1)) AS r,
         ascii(substr(text, (((3*p+1) % n) + 1)::INT, 1)) AS g,
         ascii(substr(text, (((3*p+2) % n) + 1)::INT, 1)) AS b
  FROM (SELECT doc_id, text, n, w, h, unnest(range(0, w*h)) AS p FROM d)
),
l2 AS (SELECT *, (299*r + 587*g + 114*b)::BIGINT AS l FROM lum),
base AS (
  SELECT doc_id, w, h, count(*) AS n_px,
         sum(r) AS sum_r, sum(g) AS sum_g, sum(b) AS sum_b,
         sum(l) AS s1, sum(l*l) AS s2
  FROM l2 GROUP BY doc_id, w, h
),
gy AS (
  SELECT a.doc_id, sum(abs(a.l - b.l)) AS sgy
  FROM l2 a JOIN l2 b ON a.doc_id = b.doc_id AND b.p = a.p + a.w
  GROUP BY a.doc_id
),
gx AS (
  SELECT a.doc_id, sum(abs(a.l - b.l)) AS sgx
  FROM l2 a JOIN l2 b ON a.doc_id = b.doc_id AND b.p = a.p + 1 AND a.x < a.w - 1
  GROUP BY a.doc_id
)
SELECT base.doc_id,
       round(sum_r::DOUBLE / n_px, 6) AS mean_r,
       round(sum_g::DOUBLE / n_px, 6) AS mean_g,
       round(sum_b::DOUBLE / n_px, 6) AS mean_b,
       round(sqrt((n_px*s2 - s1*s1)::DOUBLE) / (n_px * 1000.0), 6) AS lum_std,
       round(CASE WHEN h > 1 THEN coalesce(sgy, 0)::DOUBLE / ((h-1)*w*1000.0)
                  ELSE 0.0 END
           + CASE WHEN w > 1 THEN coalesce(sgx, 0)::DOUBLE / (h*(w-1)*1000.0)
                  ELSE 0.0 END, 6) AS edge_density
FROM base LEFT JOIN gy USING (doc_id) LEFT JOIN gx USING (doc_id)
ORDER BY doc_id
"""


def q_image_channel_stats(sf_dir: str):
    """Integer-exact raster statistics (ImageChannelStatsStage): the SQL
    oracle re-derives every pixel byte (text bytes tiled over W·H·3, per
    _ppm_bytes) and aggregates the same int64 sums — the feature-extraction
    plumbing gets a FULL value-hash gate, like the (integer-derived since
    r5) ``image_features`` sibling.  ASCII guard on both sides: the
    engine tiles UTF-8 bytes, SQL reads codepoints, equal only for ASCII."""
    import pandas as pd

    from ..functions.resources import actor_pool

    def ascii_only(b: pd.DataFrame) -> pd.DataFrame:
        n_runes = b["text"].str.len()
        n_bytes = b["text"].str.encode("utf-8").str.len()
        return b[(n_runes == n_bytes) & (n_runes > 0)]

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ascii_only, batch_format="pandas")
        .map_batches(multimodal.attach_payload_batch, batch_format="pyarrow")
        .map_batches(
            multimodal.ImageChannelStatsStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=actor_pool(),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_IMAGE_CHANNEL_STATS = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents
  WHERE octet_length(encode(text)) = length(text) AND length(text) > 0
),
px AS (
  SELECT doc_id, i % 3 AS ch,
         ascii(substr(text, ((i % n) + 1)::INT, 1)) AS v
  FROM (
    SELECT doc_id, text, n,
           unnest(range(0, (n % {multimodal.IMG_W_MOD} + 1)
                         * (n % {multimodal.IMG_H_MOD} + 1) * 3)) AS i
    FROM d
  )
)
SELECT doc_id,
       sum(CASE WHEN ch = 0 THEN v ELSE 0 END)::BIGINT AS sum_r,
       sum(CASE WHEN ch = 1 THEN v ELSE 0 END)::BIGINT AS sum_g,
       sum(CASE WHEN ch = 2 THEN v ELSE 0 END)::BIGINT AS sum_b,
       min(v)::BIGINT AS px_min,
       max(v)::BIGINT AS px_max,
       count(*)::BIGINT AS n_px
FROM px GROUP BY doc_id ORDER BY doc_id
"""


def q_audio_meta(sf_dir: str):
    """REAL RIFF/WAVE payloads parsed back by chunk-walking (audio decode
    plumbing); SQL mirrors the synthesized geometry."""
    from ..functions.resources import actor_pool

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(multimodal.attach_audio_batch, batch_format="pyarrow")
        .map_batches(
            multimodal.AudioDecodeStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=actor_pool(),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_AUDIO_META = f"""
SELECT doc_id,
       ({multimodal.WAV_RATE_BASE} + (n % {multimodal.WAV_RATE_MOD}) * 1000)::BIGINT AS sample_rate,
       1::BIGINT AS channels,
       ((n % {multimodal.WAV_SAMPLES_MOD}) + 1)::BIGINT AS n_samples,
       (((n % {multimodal.WAV_SAMPLES_MOD}) + 1)::BIGINT * 1000000
        // ({multimodal.WAV_RATE_BASE} + (n % {multimodal.WAV_RATE_MOD}) * 1000))::BIGINT AS duration_us
FROM (SELECT doc_id, length(text) AS n FROM documents)
ORDER BY doc_id
"""


def q_events_tumbling(sf_dir: str):
    from ..stages.windows import tumbling_aggregate

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    out = tumbling_aggregate(ev, "event_type", 3600).to_pandas()
    out["sum_value"] = out["sum_value"].round(6)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


SQL_EVENTS_TUMBLING = """
SELECT event_type,
       (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS window_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


HOP_WINDOW_S, HOP_S = 3600, 1800


def q_events_hopping(sf_dir: str):
    from ..stages.windows import hopping_aggregate

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    out = hopping_aggregate(ev, "event_type", HOP_WINDOW_S, HOP_S).to_pandas()
    out["sum_value"] = out["sum_value"].round(6)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


SQL_EVENTS_HOPPING = f"""
SELECT event_type, ws AS window_start, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM (
  SELECT event_type, value,
         (CAST(floor(epoch(ts) / {HOP_S}) AS BIGINT) * {HOP_S} - j.j * {HOP_S}) AS ws
  FROM events CROSS JOIN (SELECT unnest(range(0, {HOP_WINDOW_S // HOP_S})) AS j) j
)
WHERE ws >= 0
GROUP BY event_type, ws
ORDER BY event_type, ws
"""


def q_events_sessions(sf_dir: str):
    from ..stages.windows import sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    out = sessionize(ev, gap_s=1800).to_pandas()
    return out.sort_values(["user_id", "session_start_us"]).reset_index(drop=True)


SQL_EVENTS_SESSIONS = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
grouped AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id,
       min(ts_us) AS session_start_us,
       count(*) AS n_events,
       max(ts_us) - min(ts_us) AS duration_us
FROM grouped GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""


# ---------------------------------------------------------------------------
# regex search: index-accelerated + distributed-scan fallback
# ---------------------------------------------------------------------------

# required literals "sort " / " scan" → trigram AND prunes to a small
# candidate set before RE2 verification
REGEX_Q = r"sort [a-z]+ scan"
# no literal ≥ 3 runes → unprunable → the distributed corpus scan
REGEX_SCAN_Q = r"b[ai]g"


def _sql_regex(pattern: str, over_corpus: bool) -> str:
    esc = pattern.replace("'", "''")
    if over_corpus:
        return f"""
WITH {CORPUS_CTE}
SELECT doc_id, repo || '/' || path AS filename,
       len(regexp_extract_all(content, '{esc}'))::BIGINT AS n_matches,
       regexp_extract(content, '{esc}') AS first_match
FROM corpus
WHERE regexp_matches(content, '{esc}')
ORDER BY doc_id
"""
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{esc}'))::BIGINT AS n_matches,
       regexp_extract(text, '{esc}') AS first_match
FROM documents
WHERE regexp_matches(text, '{esc}')
ORDER BY doc_id
"""


def q_regex_search(sf_dir: str):
    """Trigram-index-accelerated regex (Cox 2012 / pg_trgm): required-literal
    trigram AND → candidate docs → RE2 verify on candidate bodies only."""
    from ..query import RegexSearcher

    index_dir = _ensure_index(sf_dir)
    t = RegexSearcher(IndexReader(index_dir)).search(REGEX_Q)
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


SQL_REGEX_SEARCH = _sql_regex(REGEX_Q, over_corpus=True)


def q_regex_scan(sf_dir: str):
    """The unprunable-pattern path: a distributed vectorized RE2 scan
    (stages/regexscan.py) — one map_batches, matches-only rows survive."""
    from ..stages.regexscan import regex_scan

    out = regex_scan(_docs(sf_dir, ["doc_id", "text"]), REGEX_SCAN_Q, text_col="text")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


SQL_REGEX_SCAN = _sql_regex(REGEX_SCAN_Q, over_corpus=False)


# ---------------------------------------------------------------------------
# as-of join (temporal): purchases ← most recent signup per user
# ---------------------------------------------------------------------------


def q_events_asof(sf_dir: str):
    """Backward-inclusive as-of join, one hash shuffle + per-partition
    sorted merge_asof (stages/joins.py)."""
    import pandas as pd

    from ..stages.joins import asof_join

    def prep(kind: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_type"] == kind]
            return pd.DataFrame(
                {
                    "event_id": b["event_id"],
                    "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
                    "user_id": b["user_id"],
                    "value": b["value"],
                }
            )

        return f

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    left = ev.map_batches(prep("purchase"), batch_format="pandas")
    right = ev.map_batches(prep("signup"), batch_format="pandas")
    out = asof_join(
        left, right, on="ts_us", by="user_id", right_prefix="signup_", dedup_id="event_id"
    ).to_pandas()
    # gate compares the MATCHED rows (null-free output hashes identically on
    # both sides); the operator itself is a left join — unmatched-row
    # semantics are pinned by tests/test_ops.py instead
    out = out.dropna(subset=["signup_ts_us"])
    out["signup_ts_us"] = out["signup_ts_us"].astype("int64")
    out["value"] = out["value"].round(6)
    out["signup_value"] = out["signup_value"].astype("float64").round(6)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_ASOF = """
WITH p AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT user_id, epoch_us(ts) AS ts_us, arg_min(value, event_id) AS value
  FROM events WHERE event_type = 'signup' GROUP BY user_id, epoch_us(ts)
)
SELECT p.event_id, p.ts_us, p.user_id, round(p.value, 6) AS value,
       s.ts_us AS signup_ts_us, round(s.value, 6) AS signup_value
FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts_us >= s.ts_us
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: per-doc top-k by tf · idf (integer micro-units)
# ---------------------------------------------------------------------------

TFIDF_K = 5


def q_tfidf_topk(sf_dir: str):
    """Distributed TF-IDF (stages/textstats.tfidf_topk, mode="join" — the
    web-scale default): vocabulary df via a combiner groupby STAYS a
    Dataset, (doc, word, tf) rows hash-join it on the word key, one coarse
    doc-hash shuffle ranks per-doc top-k.  Scores are integer micro-units
    (tf × round(ln((N+1)/(df+1))·1e6)) so ordering and values reproduce
    EXACTLY in SQL — floats appear only at the final ÷1e6 display step,
    identical both sides."""
    from ..stages.textstats import tfidf_topk

    out = tfidf_topk(_docs(sf_dir, ["doc_id", "text"]), k=TFIDF_K).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


SQL_TFIDF_TOPK = f"""
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM w GROUP BY word),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         tf.tf * CAST(floor(ln((n.n + 1.0) / (df.df + 1.0)) * 1000000 + 0.5) AS BIGINT)
           AS score_micro
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, word) AS "rank"
  FROM scored
)
SELECT doc_id, word, tf, score_micro / 1000000.0 AS tfidf, "rank"
FROM ranked WHERE "rank" <= {TFIDF_K}
ORDER BY doc_id, "rank"
"""


# ---------------------------------------------------------------------------
# rolling window: per-user ordered last-5-rows aggregates
# ---------------------------------------------------------------------------

ROLL_WINDOW_ROWS = 5


def _purchase_events(sf_dir: str) -> "ray.data.Dataset":
    """purchase events as (event_id, ts_us, user_id, value) — the shared
    prep under every per-key window gate query (one definition, four
    consumers: rolling / lag / cumsum / and their SQL `p` CTE shape)."""
    import pandas as pd

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "purchase"]
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
                "user_id": b["user_id"],
                "value": b["value"],
            }
        )

    return ev.map_batches(purchases, batch_format="pandas")


def q_events_rolling(sf_dir: str):
    """Per-key ordered rolling sum/mean (stages/windows.rolling_aggregate)
    — SQL ROWS BETWEEN 4 PRECEDING AND CURRENT ROW semantics."""
    from ..stages.windows import rolling_aggregate

    out = rolling_aggregate(
        _purchase_events(sf_dir),
        by="user_id",
        order=("ts_us", "event_id"),
        value="value",
        window_rows=ROLL_WINDOW_ROWS,
    ).to_pandas()
    for c in ("value", "roll_sum", "roll_mean"):
        out[c] = out[c].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_ROLLING = f"""
WITH p AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, ts_us, user_id, round(value, 6) AS value,
       round(sum(value) OVER w, 6) AS roll_sum,
       round(avg(value) OVER w, 6) AS roll_mean
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN {ROLL_WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_events_zscore(sf_dir: str):
    """Per-group z-score normalization (analytics.zscore_normalize): moment
    combiner → broadcast (group → mean/std) → one streaming normalize map;
    the events themselves never shuffle."""
    import pandas as pd

    from ..stages.analytics import zscore_normalize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    out = zscore_normalize(ev, group="event_type", value="value").to_pandas()
    out["value"] = out["value"].round(6)
    out["z"] = out["z"].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_ZSCORE = """
SELECT event_id, event_type, round(value, 6) AS value,
       round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6) AS z
FROM events
WINDOW w AS (PARTITION BY event_type)
ORDER BY event_id
"""


HIST_LO, HIST_HI, HIST_BINS = 0.0, 330.0, 33


def q_events_histogram(sf_dir: str):
    """Fixed-width per-group histogram (analytics.histogram): per-batch
    bincount partials, one tiny groupby-sum — integer-exact."""
    from ..stages.analytics import histogram

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = histogram(
        ev, "value", lo=HIST_LO, hi=HIST_HI, bins=HIST_BINS, group="event_type"
    ).to_pandas()
    return (
        out.sort_values(["event_type", "bin"])
        .reset_index(drop=True)
        .astype({"bin": "int64", "n": "int64"})
    )


SQL_EVENTS_HISTOGRAM = f"""
SELECT event_type,
       least(greatest(floor((value - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS}), 0), {HIST_BINS - 1})::BIGINT AS bin,
       count(*)::BIGINT AS n
FROM events
WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


def q_events_cumsum(sf_dir: str):
    """Per-key running total (windows.cumulative_sum) over purchase events —
    SUM OVER ROWS UNBOUNDED PRECEDING parity."""
    from ..stages.windows import cumulative_sum

    out = cumulative_sum(
        _purchase_events(sf_dir),
        by="user_id",
        order=("ts_us", "event_id"),
        value="value",
    ).to_pandas()
    for c in ("value", "running_sum"):
        out[c] = out[c].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_CUMSUM = """
WITH p AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, ts_us, user_id, round(value, 6) AS value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_sum
FROM p
ORDER BY event_id
"""


def q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding (analytics.vector_centroids): one reduceat
    partial per batch, dim-length partials shuffle — never the vectors."""
    from ..stages.analytics import vector_centroids

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    out = vector_centroids(emb, group="label").to_pandas()
    out["centroid"] = out["centroid"].round(6)
    return (
        out.sort_values(["label", "pos"])
        .reset_index(drop=True)
        .astype({"label": "int64", "pos": "int64"})
    )


SQL_EMBEDDING_CENTROIDS = """
SELECT label::BIGINT AS label, i - 1 AS pos, round(avg(embedding[i]), 6) AS centroid
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, pos
ORDER BY label, pos
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def q_events_funnel(sf_dir: str):
    """Strict first-touch funnel (analytics.funnel_counts): per-(user,stage)
    min-ts combiner → per-partition chain test → |stages| counters."""
    import pandas as pd

    from ..stages.analytics import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    out = funnel_counts(ev.map_batches(prep, batch_format="pandas"), FUNNEL_STAGES)
    return out.astype({"users": "int64"})


SQL_EVENTS_FUNNEL = f"""
WITH m AS (
  SELECT user_id,
         min(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN epoch_us(ts) END) AS t0,
         min(CASE WHEN event_type = '{FUNNEL_STAGES[1]}' THEN epoch_us(ts) END) AS t1,
         min(CASE WHEN event_type = '{FUNNEL_STAGES[2]}' THEN epoch_us(ts) END) AS t2
  FROM events GROUP BY user_id
)
SELECT stage, users FROM (
  SELECT '{FUNNEL_STAGES[0]}' AS stage,
         count(*) FILTER (WHERE t0 IS NOT NULL)::BIGINT AS users FROM m
  UNION ALL
  SELECT '{FUNNEL_STAGES[1]}',
         count(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0)::BIGINT FROM m
  UNION ALL
  SELECT '{FUNNEL_STAGES[2]}',
         count(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0 AND t2 > t1)::BIGINT FROM m
)
"""


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_lineitem_profile(sf_dir: str):
    """Data-quality profile (analytics.profile_numeric): per-column n /
    nulls / min / max from per-batch mergeable partials — |columns| rows
    per batch shuffle, never data."""
    from ..stages.analytics import profile_numeric

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=PROFILE_COLS)
    out = profile_numeric(li, PROFILE_COLS)
    for c in ("min", "max"):
        out[c] = out[c].round(6)
    return out


SQL_LINEITEM_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column, count(*)::BIGINT AS n,
       (count(*) - count({c}))::BIGINT AS n_null,
       round(min({c}), 6) AS min, round(max({c}), 6) AS max FROM lineitem"""
    for c in PROFILE_COLS
)


def q_events_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer field out of the JSON
    ``props`` column with a C-regex kernel inside the scan (swap for a
    vectorized JSON parser for nested payloads — same stage shape), then
    the standard combiner-first aggregate per event_type."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # rows without an integer "k" degrade to NULL exactly like the
        # oracle's CAST(json_extract(...) AS BIGINT): counted in n, skipped
        # by sum/avg (the flat-props contract is in the docstring)
        k = pd.to_numeric(
            b["props"].str.extract(r'"k":\s*(-?\d+)', expand=False), errors="coerce"
        )
        g = pd.DataFrame({"event_type": b["event_type"], "k": k}).groupby(
            "event_type", sort=False, as_index=False
        ).agg(n=("k", "size"), n_k=("k", "count"), sum_k=("k", "sum"))
        return g.astype({"n": "int64", "n_k": "int64", "sum_k": "int64"})

    agg = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_k", alias_name="n_k"),
            Sum("sum_k", alias_name="sum_k"),
        )
        .to_pandas()
    )
    agg["avg_k"] = (agg["sum_k"] / agg["n_k"]).round(6)  # avg over non-null, like SQL avg()
    if (agg["n_k"] == 0).any():
        # SQL sum() over zero non-null values is NULL, and the presence of a
        # NULL makes duckdb's .df() column float — mirror both
        agg["sum_k"] = agg["sum_k"].astype("float64").where(agg["n_k"] > 0)
    agg = agg.drop(columns="n_k")
    return (
        agg.sort_values("event_type")
        .reset_index(drop=True)
        .astype({"n": "int64", "sum_k": "int64"})
    )


SQL_EVENTS_PROPS_STATS = """
SELECT event_type, count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k, round(avg(k), 6) AS avg_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
ORDER BY event_type
"""


APPROX_Q_K = 64


def q_events_approx_quantiles(sf_dir: str):
    """Mergeable approximate quantiles (analytics.approx_group_quantiles):
    deterministic bottom-k hash sample per group — ≤ k rows per group per
    batch shuffle at ANY cardinality; the oracle reconstructs the IDENTICAL
    sample via row_number over the mirrored mix64."""
    from ..stages.analytics import approx_group_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    out = approx_group_quantiles(
        ev, group="event_type", value="value", id_col="event_id", qs=(0.5, 0.9), k=APPROX_Q_K
    ).to_pandas()
    for c in ("q50", "q90"):
        out[c] = out[c].round(6)
    return out.sort_values("event_type").reset_index(drop=True)


def _sql_events_approx_quantiles() -> str:
    from ..functions.hashing import sql_mix64_expr

    return f"""
WITH h AS (
  SELECT event_type, value, {sql_mix64_expr("event_id")} AS hv FROM events
),
s AS (
  SELECT event_type, value FROM h
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY hv) <= {APPROX_Q_K}
)
SELECT event_type, round(quantile_cont(value, 0.5), 6) AS q50,
       round(quantile_cont(value, 0.9), 6) AS q90
FROM s GROUP BY event_type ORDER BY event_type
"""


SORT_HEAD_N = 1000


def q_events_sorted(sf_dir: str):
    """Ray Data's native distributed sort (range-partition all-to-all) +
    limit: global top-N by (value DESC, event_id) — the one exchange shape
    (ds.sort) the combiner-first top-k ops deliberately avoid, gate-covered
    here on its own."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    out = (
        ev.sort(["value", "event_id"], descending=[True, False])
        .limit(SORT_HEAD_N)
        .to_pandas()
    )
    out["value"] = out["value"].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_SORTED = f"""
SELECT event_id, round(value, 6) AS value
FROM events ORDER BY value DESC, event_id LIMIT {SORT_HEAD_N}
"""


def q_events_lag(sf_dir: str):
    """Per-key LAG + inter-event gap (stages/windows.lag_delta): one hash
    shuffle, per-partition vectorized groupby shift; NaN on each key's
    first row ≡ SQL NULL."""
    from ..stages.windows import lag_delta

    out = lag_delta(
        _purchase_events(sf_dir),
        by="user_id",
        order=("ts_us", "event_id"),
        value="value",
    ).to_pandas()
    for c in ("value", "prev_value"):
        out[c] = out[c].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_LAG = """
WITH p AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, ts_us, user_id, round(value, 6) AS value,
       (LAG(ts_us) OVER w)::DOUBLE AS prev_ts,
       round(LAG(value) OVER w, 6) AS prev_value,
       (ts_us - LAG(ts_us) OVER w)::DOUBLE AS gap_us
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY event_id
"""


# span chosen so the sf tables produce MANY (key, range) cells — the
# distributed-seed machinery (windows.py seed_mode="shuffle") is actually
# exercised, not bypassed
SHUFFLE_SEED_SPAN_US = 6 * 3_600_000_000


def q_events_rolling_shuffled(sf_dir: str):
    """events_rolling's contract through the (key, range)-partitioned path
    with FULLY DISTRIBUTED boundary seeds (seed_mode="shuffle": flagged seed
    rows ride the exchange; zero driver state) — same SQL oracle."""
    from ..stages.windows import rolling_aggregate_ranged

    out = rolling_aggregate_ranged(
        _purchase_events(sf_dir),
        by="user_id",
        order=("ts_us", "event_id"),
        value="value",
        window_rows=ROLL_WINDOW_ROWS,
        range_span_us=SHUFFLE_SEED_SPAN_US,
        seed_mode="shuffle",
    ).to_pandas()
    for c in ("value", "roll_sum", "roll_mean"):
        out[c] = out[c].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_lag_shuffled(sf_dir: str):
    """events_lag's contract through the distributed-seed ranged path
    (predecessor rows delivered through the exchange) — same SQL oracle."""
    from ..stages.windows import lag_delta_ranged

    out = lag_delta_ranged(
        _purchase_events(sf_dir),
        by="user_id",
        order=("ts_us", "event_id"),
        value="value",
        range_span_us=SHUFFLE_SEED_SPAN_US,
        seed_mode="shuffle",
    ).to_pandas()
    for c in ("value", "prev_value"):
        out[c] = out[c].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_cumsum_shuffled(sf_dir: str):
    """Running total through the distributed-seed ranged path (typed-null
    sentinel rows carry per-(key, range) prefix scalars).  The seed folds a
    prefix into one scalar, so sums regroup associatively vs the sequential
    SQL window — both sides round to 4 decimals (value scale ~10²,
    regrouping error ~1e-12: boundary-safe) instead of the exact-path 6."""
    from ..stages.windows import cumulative_sum_ranged

    out = cumulative_sum_ranged(
        _purchase_events(sf_dir),
        by="user_id",
        order=("ts_us", "event_id"),
        value="value",
        range_span_us=SHUFFLE_SEED_SPAN_US,
        seed_mode="shuffle",
    ).to_pandas()
    out["value"] = out["value"].round(6)
    out["running_sum"] = out["running_sum"].round(4)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_CUMSUM_SHUFFLED = """
WITH p AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, ts_us, user_id, round(value, 6) AS value,
       round(sum(value) OVER w, 4) AS running_sum
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# equi-joins: broadcast (fact × dimension) and native shuffle hash join
# ---------------------------------------------------------------------------


def q_orders_enriched(sf_dir: str):
    """Zero-shuffle dimension enrichment: orders × customer × nation, both
    small sides broadcast once via ray.put (stages/joins.broadcast_join)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    out = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey")
    out = broadcast_join(out, nat, on="c_nationkey", right_on="n_nationkey")
    df = out.to_pandas()[
        ["o_orderkey", "o_totalprice", "c_name", "c_mktsegment", "n_name"]
    ]
    df["o_totalprice"] = df["o_totalprice"].round(6)
    return df.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_ENRICHED = """
SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice,
       c_name, c_mktsegment, n_name
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY o_orderkey
"""


def q_lineitem_revenue(sf_dir: str):
    """Large × large: Ray Data's native hash shuffle join (stages/joins.
    hash_join), then a combiner-first aggregate (per-batch partial sums;
    only 5-row partials shuffle to the final groupby)."""
    import pandas as pd

    from ..stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=16)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        g = pd.DataFrame({"o_orderpriority": b["o_orderpriority"], "rev": rev}).groupby(
            "o_orderpriority", sort=False
        )["rev"]
        out = g.agg(n_lines="size", revenue="sum").reset_index()
        return out.astype({"n_lines": "int64"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "n_lines": np.array([g["n_lines"].sum()], dtype=np.int64),
                "revenue": [g["revenue"].sum()],
            }
        )

    df = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values("o_orderpriority").reset_index(drop=True)


Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q_regional_revenue(sf_dir: str):
    """TPC-H Q5 shape: six-table join with ONE large shuffle.  All four
    dimension sides (region→nation filter, customer→nation, supplier→
    nation) are broadcast once via ``ray.put`` and applied as vectorized
    map lookups inside the scan batches; the only all-to-all exchange is
    the unavoidable large×large lineitem ⋈ orders hash join, onto which
    the date filter and in-region customer semi-join are pushed BEFORE the
    shuffle (orders shrink ~6×).  Revenue aggregates combiner-first.

    PARTITIONING ASSUMPTION: customer/supplier are dimension-scale
    (broadcastable); at warehouse scale swap the customer lookup for a
    second hash_join — the policy point stages/joins.py documents.
    """
    import pandas as pd

    from ..stages.joins import hash_join

    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rk = region.loc[region["r_name"] == Q5_REGION, "r_regionkey"].iloc[0]
    nat = nation[nation["n_regionkey"] == rk]
    nat_keys = set(nat["n_nationkey"])
    n_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nat_keys)]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    c_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    s_ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))
    lo, hi = pd.Timestamp(Q5_DATE_LO), pd.Timestamp(Q5_DATE_HI)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def prep_orders(b: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(c_ref)
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        cn = b["o_custkey"].map(cmap)
        b = pd.DataFrame({"o_orderkey": b["o_orderkey"], "c_nationkey": cn})
        return b.dropna().astype({"c_nationkey": "int64"})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = hash_join(
        li,
        orders.map_batches(prep_orders, batch_format="pandas"),
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=16,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(s_ref)
        sn = b["l_suppkey"].map(smap).to_numpy(dtype=np.float64)
        keep = sn == b["c_nationkey"].to_numpy(dtype=np.float64)
        b = b[keep]
        rev = b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        out = (
            pd.DataFrame({"nationkey": b["c_nationkey"].to_numpy(), "revenue": rev})
            .groupby("nationkey", sort=False, as_index=False)["revenue"]
            .sum()
        )
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nationkey": np.array([g["nationkey"].iloc[0]], dtype=np.int64),
                "revenue": [g["revenue"].sum()],
            }
        )

    df = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("nationkey")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    df["n_name"] = df["nationkey"].map(n_name)
    df["revenue"] = df["revenue"].round(2)
    return (
        df[["n_name", "revenue"]]
        .sort_values(["revenue", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )


SQL_REGIONAL_REVENUE = f"""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO}' AND o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


SQL_LINEITEM_REVENUE = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# range (interval) join: purchases inside a 72h window after signup
# ---------------------------------------------------------------------------

RANGE_WINDOW_US = 72 * 3600 * 1_000_000


def q_events_range(sf_dir: str):
    import pandas as pd

    from ..stages.joins import range_join

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "purchase"]
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
                "user_id": b["user_id"],
                "value": b["value"],
            }
        )

    def signups(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "signup"]
        start = b["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "signup_id": b["event_id"],
                "user_id": b["user_id"],
                "start_us": start,
                "end_us": start + RANGE_WINDOW_US,
            }
        )

    out = range_join(
        ev.map_batches(purchases, batch_format="pandas"),
        ev.map_batches(signups, batch_format="pandas"),
        on="ts_us",
        by="user_id",
        start="start_us",
        end="end_us",
        right_prefix="s_",
        bucket_us=24 * 3600 * 1_000_000,
    ).to_pandas()
    out = out[["event_id", "ts_us", "user_id", "value", "s_signup_id", "s_start_us"]]
    out["value"] = out["value"].round(6)
    out = out.astype({"s_signup_id": "int64", "s_start_us": "int64"})
    return out.sort_values(["event_id", "s_signup_id"]).reset_index(drop=True)


SQL_EVENTS_RANGE = f"""
WITH p AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT event_id AS signup_id, user_id, epoch_us(ts) AS start_us
  FROM events WHERE event_type = 'signup'
)
SELECT p.event_id, p.ts_us, p.user_id, round(p.value, 6) AS value,
       s.signup_id AS s_signup_id, s.start_us AS s_start_us
FROM p JOIN s ON p.user_id = s.user_id
              AND p.ts_us >= s.start_us AND p.ts_us < s.start_us + {RANGE_WINDOW_US}
ORDER BY event_id, s_signup_id
"""


# ---------------------------------------------------------------------------
# grouped analytics: top-k per group, distinct counts, exact quantiles
# ---------------------------------------------------------------------------

TOPK_PER_CUST = 3


def q_orders_topk(sf_dir: str):
    """Combiner-first distributed top-k per key (stages/analytics.py):
    each batch keeps ≤ k rows per key before the shuffle."""
    from ..stages.analytics import topk_per_group

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    df = topk_per_group(
        orders, group="o_custkey", order="o_totalprice", k=TOPK_PER_CUST,
        tie_col="o_orderkey",
    ).to_pandas()[["o_custkey", "o_orderkey", "o_totalprice", "rank"]]
    df["o_totalprice"] = df["o_totalprice"].round(6)
    df = df.astype({"rank": "int64"})
    return df.sort_values(["o_custkey", "rank"]).reset_index(drop=True)


SQL_ORDERS_TOPK = f"""
SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS o_totalprice, "rank"
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS "rank"
  FROM orders
) WHERE "rank" <= {TOPK_PER_CUST}
ORDER BY o_custkey, "rank"
"""


def q_events_distinct(sf_dir: str):
    from ..stages.analytics import distinct_per_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    df = distinct_per_group(ev, "user_id", "event_type").to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_DISTINCT = """
SELECT user_id, count(DISTINCT event_type)::BIGINT AS n_distinct
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_events_quantiles(sf_dir: str):
    """Exact per-group quantiles — numpy 'linear' == DuckDB quantile_cont."""
    from ..stages.analytics import group_quantiles

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    df = group_quantiles(ev, "event_type", "value", (0.5, 0.9)).to_pandas()
    df["q50"] = df["q50"].round(6)
    df["q90"] = df["q90"].round(6)
    return df.sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS q50,
       round(quantile_cont(value, 0.9), 6) AS q90
FROM events GROUP BY event_type ORDER BY event_type
"""


KMV_GATE_K = 64


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir: str):
    """Wide conditional aggregate (analytics.pivot_counts): per-user counts
    of each declared event type as columns — each batch collapses to one
    wide partial row per user before the shuffle."""
    from ..stages.analytics import pivot_counts

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    df = pivot_counts(ev, "user_id", "event_type", EVENT_TYPES).to_pandas()
    df = df.astype({f"n_{c}": "int64" for c in EVENT_TYPES})
    return df.sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_PIVOT = (
    "SELECT user_id, "
    + ", ".join(
        f"count(*) FILTER (event_type = '{c}') AS n_{c}" for c in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id ORDER BY user_id"
)


def q_events_approx_users(sf_dir: str):
    """KMV approximate-distinct sketch (analytics.approx_distinct_per_group):
    mergeable k-minimum-values over mix64(user_id) — the combiner ships ≤ k
    hashes per group per batch no matter the user cardinality.  The sketch
    is deterministic given the hash, so the full pipeline (hash, truncation,
    estimator) is value-hash-gated against a window re-derivation in SQL."""
    from ..stages.analytics import approx_distinct_per_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    df = approx_distinct_per_group(ev, "event_type", "user_id", k=KMV_GATE_K).to_pandas()
    return df.sort_values("event_type").reset_index(drop=True)


def _sql_events_approx_users() -> str:
    from ..functions.hashing import sql_mix64_expr

    k = KMV_GATE_K
    return f"""
WITH d AS (
  SELECT DISTINCT event_type, {sql_mix64_expr("user_id")} AS hv FROM events
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM d
)
SELECT event_type,
       (CASE WHEN cnt < {k} THEN cnt::HUGEINT
             ELSE ({k - 1}::HUGEINT * 18446744073709551616::HUGEINT)
                  // greatest(hv::HUGEINT, 1)
        END)::BIGINT AS approx_distinct
FROM r WHERE rn = least(cnt, {k})
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped composed analytics: Q1-style multi-measure pricing summary
# and Q3-style revenue top-k over a broadcast+hash join chain
# ---------------------------------------------------------------------------

PRICING_CUTOFF = "2000-12-01"


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: scan-filter → per-batch MULTI-MEASURE partial sums
    (one combiner row per (flag, status) per batch shuffles — never the
    rows), final sums + exact avgs derived sum/count.  The aggregate keys
    are dimension-cardinality (~6 groups), so the final groupby is tiny."""
    import pandas as pd

    cutoff = pd.Timestamp(PRICING_CUTOFF)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )
    keys = ["l_returnflag", "l_linestatus"]

    measures = ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "sum_disc"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] <= cutoff]
        if len(b) == 0:
            # dtype-pinned empty partial: block schemas must agree whether
            # or not a batch survives the filter
            empty = pd.DataFrame({k: pd.Series(dtype="object") for k in keys})
            for c in measures:
                empty[c] = pd.Series(dtype="float64")
            empty["count_order"] = pd.Series(dtype="int64")
            return empty
        disc_price = b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        m = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": b["l_quantity"].to_numpy(),
                "sum_base_price": b["l_extendedprice"].to_numpy(),
                "sum_disc_price": disc_price,
                "sum_charge": disc_price * (1.0 + b["l_tax"].to_numpy()),
                "sum_disc": b["l_discount"].to_numpy(),
                "count_order": np.ones(len(b), dtype=np.int64),
            }
        )
        return m.groupby(keys, sort=False, as_index=False, observed=True).sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(keys, sort=False, as_index=False, observed=True).sum()
        n = s["count_order"].to_numpy()
        return pd.DataFrame(
            {
                "l_returnflag": s["l_returnflag"],
                "l_linestatus": s["l_linestatus"],
                "sum_qty": s["sum_qty"].round(4),
                "sum_base_price": s["sum_base_price"].round(4),
                "sum_disc_price": s["sum_disc_price"].round(4),
                "sum_charge": s["sum_charge"].round(4),
                "avg_qty": (s["sum_qty"].to_numpy() / n).round(6),
                "avg_price": (s["sum_base_price"].to_numpy() / n).round(6),
                "avg_disc": (s["sum_disc"].to_numpy() / n).round(6),
                "count_order": s["count_order"].astype("int64"),
            }
        )

    df = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return df.sort_values(keys).reset_index(drop=True)


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       round(sum(l_extendedprice) / count(*), 6) AS avg_price,
       round(sum(l_discount) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


UNSHIPPED_CUTOFF = "2000-01-01"


def q_orders_unshipped(sf_dir: str):
    """Distributed anti-join (stages/joins.semi_join): orders with NO
    lineitem shipped after the cutoff.  The lineitem side collapses to
    distinct order keys per batch before the one hash shuffle."""
    import pandas as pd

    from ..stages.joins import anti_join

    cutoff = pd.Timestamp(UNSHIPPED_CUTOFF)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderpriority"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(lambda b: b[b["l_shipdate"] > cutoff], batch_format="pandas")
    df = anti_join(
        orders, li, on="o_orderkey", right_on="l_orderkey", num_partitions=16
    ).to_pandas()
    df["o_totalprice"] = df["o_totalprice"].round(6)
    return df.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_UNSHIPPED = f"""
SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice, o_orderpriority
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > TIMESTAMP '{UNSHIPPED_CUTOFF}'
)
ORDER BY o_orderkey
"""


Q3_CUTOFF, Q3_SEGMENT, Q3_TOPK = "1998-06-01", "BUILDING", 10


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: broadcast the filtered customer dimension into the
    orders scan (zero-shuffle semi-join), hash-join lineitem × surviving
    orders on the order key (the one unavoidable shuffle), then
    analytics.sum_topk — partial revenue sums per batch, one partial
    shuffle, driver merges ≤ k·partitions candidates."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ..stages.analytics import sum_topk
    from ..stages.joins import broadcast_join, hash_join

    cutoff = pd.Timestamp(Q3_CUTOFF)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    cust = cust.filter(pc.equal(cust["c_mktsegment"], Q3_SEGMENT)).select(["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def filter_orders(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderdate"] < cutoff]
        out = pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"],
                "o_orderdate_us": b["o_orderdate"].astype("datetime64[us]").astype("int64"),
                "o_orderpriority": b["o_orderpriority"],
            }
        )
        return out

    # semi-join: keep orders whose o_custkey is in the broadcast key set
    # (c_custkey is unique, so the inner equi-join emits each order ≤ once)
    orders_f = broadcast_join(
        orders.map_batches(
            lambda b: b[b["o_orderdate"] < cutoff], batch_format="pandas"
        ),
        cust,
        on="o_custkey",
        right_on="c_custkey",
        how="inner",
    ).map_batches(filter_orders, batch_format="pandas")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_revenue(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cutoff]
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"],
                "revenue": b["l_extendedprice"].to_numpy()
                * (1.0 - b["l_discount"].to_numpy()),
            }
        )

    joined = hash_join(
        li.map_batches(li_revenue, batch_format="pandas"),
        orders_f,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=16,
    )
    df = sum_topk(
        joined,
        group=["l_orderkey", "o_orderdate_us", "o_orderpriority"],
        value="revenue",
        k=Q3_TOPK,
        tie_col="l_orderkey",
    )
    df["revenue"] = df["revenue"].round(4)
    df = df[["l_orderkey", "revenue", "o_orderdate_us", "o_orderpriority"]]
    return df.astype({"l_orderkey": "int64", "o_orderdate_us": "int64"}).reset_index(
        drop=True
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, round(revenue, 4) AS revenue, o_orderdate_us, o_orderpriority
FROM (
  SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue,
         epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
    AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY revenue DESC, l_orderkey
LIMIT {Q3_TOPK}
"""


# ---------------------------------------------------------------------------
# corpus_prep: the composed training-data pipeline (lang filter → quality
# model filter → exact dedup → train/val/test split) in one streaming pass
# ---------------------------------------------------------------------------

PREP_LANG, PREP_MIN_SCORE = "en", 0.5


def q_corpus_prep(sf_dir: str):
    from .prep import prep_corpus

    df = prep_corpus(
        _docs(sf_dir, ["doc_id", "text"]), lang=PREP_LANG, min_score=PREP_MIN_SCORE,
        fractions=SPLIT_FRACTIONS,
    ).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def _sql_corpus_prep() -> str:
    # language vote (mirrors _sql_lang_id)
    counts = ",\n         ".join(
        f"len(list_filter(words, w -> list_contains({_sql_str_list(list(mk))}, w))) AS c_{lang}"
        for lang, mk in textstats.LANG_MARKERS
    )
    langs = [lang for lang, _ in textstats.LANG_MARKERS]
    g = "greatest(" + ", ".join(f"c_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN c_{la} = {g} THEN '{la}'" for la in langs)
    # quality model (mirrors _sql_quality_score)
    w0, w1, w2, w3, w4 = textstats.QUALITY_MODEL_W
    # exact-dedup 128-bit content key + hash split (mirror the primitives)
    h1 = _hash_sql("text")
    h2 = _hash_sql("text", salt=dedup.EXACT_DEDUP_SALT)
    _, _, split_case = _sql_sample_exprs()
    return f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
lang AS (
  SELECT doc_id, CASE WHEN {g} = 0 THEN 'und' {case} END AS pred_lang
  FROM (SELECT doc_id, {counts} FROM w)
),
feat AS (
  SELECT doc_id,
         len(words)::BIGINT AS n_words,
         round(len(list_filter(words, x -> list_contains({_sql_str_list(list(textstats.STOPWORDS))}, x)))::DOUBLE
               / greatest(len(words), 1), 6) AS stop_ratio,
         round(len(list_distinct(words))::DOUBLE / greatest(len(words), 1), 6) AS distinct_ratio,
         round(list_aggregate(list_transform(words, x -> length(x)), 'sum')::DOUBLE
               / greatest(len(words), 1), 6) AS mean_word_len
  FROM w
),
score AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-({w0} + {w1} * (n_words / 100.0) + {w2} * stop_ratio
                                 + {w3} * distinct_ratio + {w4} * (mean_word_len / 10.0)))), 6)
           AS quality_score
  FROM feat
),
f AS (
  SELECT w.doc_id, lang.pred_lang, score.quality_score, w.text
  FROM w JOIN lang USING (doc_id) JOIN score USING (doc_id)
  WHERE lang.pred_lang = '{PREP_LANG}' AND score.quality_score >= {PREP_MIN_SCORE}
),
ded AS (
  SELECT doc_id, pred_lang, quality_score,
         row_number() OVER (PARTITION BY {h1}, {h2} ORDER BY doc_id) AS rn
  FROM f
)
SELECT doc_id, pred_lang, quality_score, {split_case} AS split
FROM ded WHERE rn = 1 ORDER BY doc_id
"""


SQL_CORPUS_PREP = _sql_corpus_prep()


# ===========================================================================
# DSIR importance resampling (stages/textstats.py; Xie et al. 2023)
# ===========================================================================

DSIR_SELECT_N = 100


def q_dsir_weights(sf_dir: str):
    """Hashed-feature importance weights for data selection (DSIR): two
    bag-of-words LMs (target = lang='en' docs, raw = all docs) over 4096
    hashed unigram buckets; per-doc log-ratio weight in exact micro-log
    int64 units.  Pass 1 = combiner bucket counts (≤ B rows shuffle);
    the B-int lam table broadcasts once; scoring streams — zero shuffle."""
    from ..stages import textstats

    return (
        textstats.dsir_weights(_docs(sf_dir, ["doc_id", "lang", "text"]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_dsir_select(sf_dir: str):
    """Temperature-0 DSIR selection: global top-N docs by importance weight
    (per-batch head-N partials bound the driver merge)."""
    from ..stages import textstats

    return textstats.dsir_select(
        _docs(sf_dir, ["doc_id", "lang", "text"]), DSIR_SELECT_N
    )


def _dsir_ctes(src: str) -> str:
    """The DSIR weight computation as a reusable CTE chain over relation
    ``src`` (must expose doc_id, lang, text); ends with CTE ``w``."""
    from ..functions.hashing import sql_hash_expr
    from ..stages.textstats import DSIR_BUCKETS, DSIR_SALT

    B = DSIR_BUCKETS
    h = sql_hash_expr("word", DSIR_SALT)

    def lnm(x: str) -> str:
        return f"floor(ln({x}) * 1e6 + 0.5)::BIGINT"

    return f"""toks AS (
  SELECT doc_id, lang, (({h}) % {B})::BIGINT AS bucket
  FROM (SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
        FROM {src})
),
rawc AS (SELECT bucket, count(*)::BIGINT AS cr FROM toks GROUP BY bucket),
tgtc AS (SELECT bucket, count(*)::BIGINT AS ct FROM toks WHERE lang = 'en' GROUP BY bucket),
lam AS (SELECT r.bucket,
               ({lnm('coalesce(t.ct, 0) + 1')} - {lnm('r.cr + 1')}) AS lam_micro
        FROM rawc r LEFT JOIN tgtc t USING (bucket)),
tots AS (SELECT (SELECT count(*) FROM toks) AS cr_tot,
                (SELECT count(*) FROM toks WHERE lang = 'en') AS ct_tot),
kk AS (SELECT ({lnm(f'cr_tot + {B}')} - {lnm(f'ct_tot + {B}')}) AS k_micro FROM tots),
per_doc AS (SELECT t.doc_id, sum(l.lam_micro)::BIGINT AS s, count(*)::BIGINT AS n
            FROM toks t JOIN lam l USING (bucket) GROUP BY t.doc_id),
w AS (SELECT d.doc_id,
             coalesce(p.n, 0)::BIGINT AS n_tokens,
             (coalesce(p.s, 0) + coalesce(p.n, 0) * kk.k_micro)::BIGINT AS dsir_weight_micro
      FROM {src} d LEFT JOIN per_doc p USING (doc_id) CROSS JOIN kk)"""


def _dsir_sql() -> tuple[str, str]:
    base = "WITH " + _dsir_ctes("documents") + "\n"
    return (
        base + "SELECT doc_id, n_tokens, dsir_weight_micro FROM w ORDER BY doc_id",
        base
        + f"SELECT doc_id, n_tokens, dsir_weight_micro FROM w "
        f"ORDER BY dsir_weight_micro DESC, doc_id LIMIT {DSIR_SELECT_N}",
    )


SQL_DSIR_WEIGHTS, SQL_DSIR_SELECT = _dsir_sql()


# ===========================================================================
# deterministic global shuffle for training-shard export (stages/sample.py)
# ===========================================================================

SHUFFLE_SHARDS = 16


def q_shuffle_export(sf_dir: str):
    """Deterministic global shuffle (shard, pos) assignment — the final
    export step of a training pipeline; permutation is a pure function of
    mix64(doc_id), so shards rebuild byte-identically after a failure."""
    from ..stages import sample

    return (
        sample.shuffle_export(_docs(sf_dir, ["doc_id"]), shards=SHUFFLE_SHARDS)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )


def _sql_shuffle_export() -> str:
    from ..stages.sample import sql_key_hash

    h = f"({sql_key_hash('doc_id')})"
    return f"""
WITH hh AS (SELECT doc_id, {h}::UBIGINT AS h FROM documents)
SELECT doc_id, (h % {SHUFFLE_SHARDS})::BIGINT AS shard,
       (row_number() OVER (PARTITION BY h % {SHUFFLE_SHARDS} ORDER BY h, doc_id) - 1)::BIGINT AS pos
FROM hh ORDER BY shard, pos
"""


SQL_SHUFFLE_EXPORT = _sql_shuffle_export()


# ===========================================================================
# integer Gram matrix + PCA over embeddings (stages/knn.py)
# ===========================================================================

PCA_K = 4


def q_embedding_gram(sf_dir: str):
    """Exact-integer second-moment matrix of the embedding column (the
    one-pass statistic under PCA/whitening): per-batch QᵀQ int64 partials,
    one (i,j) groupby — the shuffle is d²·batches tiny rows, never the
    vectors.  Fixed-point quantization makes the sums order-independent,
    so the SQL self-join oracle pins every value."""
    from ..stages import knn

    return (
        knn.embedding_gram(ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"))
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )


def q_embedding_pca(sf_dir: str):
    """Distributed PCA projection (rows-only gate: the eigenbasis comes
    from LAPACK eigh on the driver — not SQL-expressible; the moment pass
    feeding it IS value-hash oracled via embedding_gram, and
    tests/test_pca.py pins the projection against a direct full-data
    numpy reference)."""
    from ..stages import knn

    return (
        knn.embedding_pca(ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"), PCA_K)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


BPE_MERGES = 200
EXACT_N = 100
CHUNK_WINDOW, CHUNK_STRIDE = 120, 90


def q_sample_exact_n(sf_dir: str):
    """Global exact-n uniform sample without replacement: the n smallest
    mix64 ranks — deterministic, layout/resume-stable, per-batch bottom-n
    partials bound the driver merge."""
    from ..stages import sample

    return sample.exact_n_sample(_docs(sf_dir, ["doc_id"]), EXACT_N)


def q_doc_chunks(sf_dir: str):
    """Overlapping-window chunk boundaries (RAG / training-window
    splitter): stateless integer kernel, zero shuffle, ~32 B out per chunk
    regardless of doc size."""
    from ..stages import packing

    return (
        packing.chunk_offsets(
            _docs(sf_dir, ["doc_id", "text"]), window=CHUNK_WINDOW, stride=CHUNK_STRIDE
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )


def _sql_sample_exact_n() -> str:
    from ..stages.sample import sql_key_hash

    return (
        f"SELECT doc_id FROM documents "
        f"ORDER BY ({sql_key_hash('doc_id')})::UBIGINT, doc_id LIMIT {EXACT_N}"
    )


SQL_SAMPLE_EXACT_N = _sql_sample_exact_n()

SQL_DOC_CHUNKS = f"""
WITH d AS (SELECT doc_id, length(text)::BIGINT AS n FROM documents),
c AS (SELECT doc_id, n, unnest(range(0, (n + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS k FROM d)
SELECT doc_id, k::BIGINT AS chunk_id, (k * {CHUNK_STRIDE})::BIGINT AS start,
       least({CHUNK_WINDOW}, n - k * {CHUNK_STRIDE})::BIGINT AS length
FROM c ORDER BY doc_id, chunk_id
"""


def q_bpe_tokens(sf_dir: str):
    """BPE tokenizer training + apply (rows-only gate: the merge loop is
    iterative — not SQL-expressible; tests/test_bpe.py pins training AND
    encoding against a naive recount-per-round reference, and the one
    corpus-scale pass feeding it is the same combiner shape as the oracled
    topk_words)."""
    from ..stages import bpe

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = bpe.bpe_train(docs, BPE_MERGES)
    return (
        bpe.bpe_apply(docs, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


CM_WIDTH, CM_DEPTH, CM_EST_KEYS = 256, 4, 20


def _events_for_cm(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])


def q_events_cm_sketch(sf_dir: str):
    """Count-min sketch of per-user event counts — the mergeable-sketch
    path for per-key counts at unbounded key cardinality (the KMV
    approx-distinct sibling): ≤ depth·width partial rows per batch shuffle
    at ANY cardinality, cells merge by sum."""
    from ..stages import analytics

    return (
        analytics.cm_sketch(_events_for_cm(sf_dir), "user_id", width=CM_WIDTH, depth=CM_DEPTH)
        .to_pandas()
        .sort_values(["d", "bucket"])
        .reset_index(drop=True)
    )


def q_events_cm_estimates(sf_dir: str):
    """Point queries over the sketch: est(k) = min_d cell[d][h_d(k)] —
    deterministic overestimates, identical in SQL."""
    import numpy as np

    from ..stages import analytics

    sk = analytics.cm_sketch(
        _events_for_cm(sf_dir), "user_id", width=CM_WIDTH, depth=CM_DEPTH
    ).to_pandas()  # ≤ depth×width rows by construction
    est = analytics.cm_estimate(
        sk, np.arange(CM_EST_KEYS, dtype=np.int64), width=CM_WIDTH, depth=CM_DEPTH
    )
    import pandas as pd

    return pd.DataFrame(
        {"user_id": np.arange(CM_EST_KEYS, dtype=np.int64), "est_count": est}
    )


def _cm_sql() -> tuple[str, str]:
    from ..stages.analytics import _cm_salts, CM_SALT
    from ..stages.sample import sql_key_hash

    salts = _cm_salts(CM_DEPTH, CM_SALT)
    cells_parts = " UNION ALL ".join(
        f"SELECT {d} AS d, (({sql_key_hash('user_id', s)})::UBIGINT % {CM_WIDTH})::BIGINT AS bucket FROM events"
        for d, s in enumerate(salts)
    )
    sketch = (
        f"SELECT d, bucket, count(*)::BIGINT AS cnt FROM ({cells_parts}) "
        f"GROUP BY d, bucket ORDER BY d, bucket"
    )
    lk_parts = " UNION ALL ".join(
        f"SELECT user_id, {d} AS d, (({sql_key_hash('user_id', s)})::UBIGINT % {CM_WIDTH})::BIGINT AS bucket FROM users"
        for d, s in enumerate(salts)
    )
    est = f"""
WITH cells AS (SELECT d, bucket, count(*)::BIGINT AS cnt FROM ({cells_parts}) GROUP BY d, bucket),
users AS (SELECT unnest(range(0, {CM_EST_KEYS}))::BIGINT AS user_id),
lk AS ({lk_parts})
SELECT lk.user_id, min(coalesce(c.cnt, 0))::BIGINT AS est_count
FROM lk LEFT JOIN cells c USING (d, bucket)
GROUP BY lk.user_id ORDER BY user_id
"""
    return sketch, est


SQL_EVENTS_CM_SKETCH, SQL_EVENTS_CM_ESTIMATES = _cm_sql()


TRAIN_EXPORT_N, TRAIN_EXPORT_SHARDS = 150, 8


def q_training_export(sf_dir: str):
    """Composed data-selection flagship: exact dedup → DSIR weights →
    distributed top-N cutoff filter → deterministic shard export.  Every
    stage is an individually-gated operator; the composition is mirrored
    end-to-end in SQL so a regression anywhere breaks the value hash."""
    from . import prep

    return prep.training_export(
        _docs(sf_dir, ["doc_id", "lang", "text"]), TRAIN_EXPORT_N, TRAIN_EXPORT_SHARDS
    )


def _sql_training_export() -> str:
    from ..stages.sample import sql_key_hash

    h = f"({sql_key_hash('doc_id')})"
    return f"""
WITH winners AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY {_hash_sql('text')}, {_hash_sql('text', salt=dedup.EXACT_DEDUP_SALT)}
),
dd AS (SELECT d.doc_id, d.lang, d.text FROM documents d JOIN winners USING (doc_id)),
{_dsir_ctes('dd')},
sel AS (SELECT doc_id FROM w
        ORDER BY dsir_weight_micro DESC, doc_id LIMIT {TRAIN_EXPORT_N}),
hh AS (SELECT doc_id, {h}::UBIGINT AS h FROM sel)
SELECT doc_id, (h % {TRAIN_EXPORT_SHARDS})::BIGINT AS shard,
       (row_number() OVER (PARTITION BY h % {TRAIN_EXPORT_SHARDS} ORDER BY h, doc_id) - 1)::BIGINT AS pos
FROM hh ORDER BY shard, pos
"""


SQL_TRAINING_EXPORT = _sql_training_export()


def q_events_retention(sf_dir: str):
    """Retention-cohort matrix over the event stream: one distinct-pair
    reduction + one guarded hash join + a cohort²-scale count."""
    from ..stages import analytics

    return (
        analytics.retention_cohorts(
            ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        )
        .to_pandas()
        .sort_values(["cohort", "bucket"])
        .reset_index(drop=True)
        .astype({"cohort": "int64", "bucket": "int64", "n_users": "int64"})
    )


SQL_EVENTS_RETENTION = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // {86_400_000_000}) AS bucket FROM events
),
f AS (SELECT user_id, min(bucket) AS cohort FROM pairs GROUP BY user_id)
SELECT f.cohort::BIGINT AS cohort, p.bucket::BIGINT AS bucket, count(*)::BIGINT AS n_users
FROM pairs p JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


SQL_EMBEDDING_GRAM = f"""
WITH q AS (
  SELECT vec_id, (i - 1)::BIGINT AS i,
         (CASE WHEN x >= 0 THEN floor(x * 1000 + 0.5)
               ELSE -floor(-x * 1000 + 0.5) END)::BIGINT AS qx
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
)
SELECT a.i AS i, b.i AS j, sum(a.qx * b.qx)::BIGINT AS s
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY a.i, b.i
ORDER BY i, j
"""


def q_events_transitions(sf_dir: str):
    """Markov transition matrix over per-user event sequences: LEAD() pairs
    counted globally, conditional probability in exact integer micro units
    (stages/windows.transition_counts — ≤ |types|² rows leave the combiner)."""
    import pandas as pd

    from ..stages.windows import transition_counts

    cols = ["event_id", "ts", "user_id", "event_type"]
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "ts_us": b["ts"].astype("int64"),
                "user_id": b["user_id"],
                "event_type": b["event_type"],
            }
        )

    return transition_counts(ev.map_batches(prep, batch_format="pandas"))


SQL_EVENTS_TRANSITIONS = """
WITH e AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
),
c AS (
  SELECT event_type AS src, next_type AS dst, count(*)::BIGINT AS n_trans
  FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT src, sum(n_trans) AS tot FROM c GROUP BY src)
SELECT c.src, c.dst, c.n_trans,
       (c.n_trans * 1000000 // t.tot)::BIGINT AS p_micro
FROM c JOIN t USING (src)
ORDER BY src, dst
"""


PR_SUPP_OFFSET = 1_000_000


def q_graph_pagerank(sf_dir: str):
    """Integer fixed-point PageRank (stages/graph.pagerank) over the
    symmetrised customer–supplier trade graph: ONE order-key hash join +
    distinct-pair combiner derives the edges, then 5 Pregel iterations
    (vertex-scale join + pre-combined contribution exchange per step).
    Every rank is an exact int64 micro value — the SQL mirror is 5 chained
    CTEs over the identical integer recurrence."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    from ..stages.graph import pagerank
    from ..stages.joins import adaptive_join_partitions, hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    joined = hash_join(
        orders,
        li,
        on="o_orderkey",
        right_on="l_orderkey",
        num_partitions=adaptive_join_partitions(n_orders, n_li),
    ).materialize()

    def pair_partial(b: pa.Table) -> pa.Table:
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([c, s], axis=1), axis=0)
        return pa.table(
            {
                "c": pa.array(uniq[:, 0], type=pa.int64()),
                "s": pa.array(uniq[:, 1], type=pa.int64()),
            }
        )

    pair_ds = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["c", "s"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )

    def symmetrize(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64) + np.int64(
            PR_SUPP_OFFSET
        )
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s]), type=pa.int64()),
                "dst": pa.array(np.concatenate([s, c]), type=pa.int64()),
            }
        )

    edges = pair_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    return (
        pagerank(edges)
        .to_pandas()  # vertex-scale output of a 5-iteration fixed budget;
        # sorted for the compare — dimension-bounded at gate scale
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "rank_micro": "int64"})
    )


def _sql_pagerank() -> str:
    from ..stages.graph import PR_BASE_MICRO, PR_DAMP_PCT, PR_INIT_MICRO, PR_ITERATIONS

    sql = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT c AS src, s + {PR_SUPP_OFFSET} AS dst FROM pairs
  UNION ALL
  SELECT s + {PR_SUPP_OFFSET} AS src, c AS dst FROM pairs
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, {PR_INIT_MICRO}::BIGINT AS r FROM deg)"""
    prev = "r0"
    for t in range(1, PR_ITERATIONS + 1):
        sql += f""",
r{t} AS (SELECT e.dst AS node,
               ({PR_BASE_MICRO} + sum((r.r * {PR_DAMP_PCT}) // (100 * d.deg)))::BIGINT AS r
        FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
        GROUP BY e.dst)"""
        prev = f"r{t}"
    sql += f"\nSELECT node, r AS rank_micro FROM {prev} ORDER BY node"
    return sql


SQL_GRAPH_PAGERANK = _sql_pagerank()


def q_pricing_rollup(sf_dir: str):
    """GROUP BY ROLLUP over the Q1 keys (analytics.rollup_sums): measures
    quantized to exact centi-units so detail rows, subtotals and the grand
    total are the SAME integers at every level (float sums would drift
    between levels); ``lvl`` mirrors DuckDB's grouping() bitmask."""
    import pandas as pd

    from ..stages.analytics import rollup_sums

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def quantize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_centi": np.floor(b["l_quantity"].to_numpy() * 100.0 + 0.5).astype(
                    np.int64
                ),
                "price_centi": np.floor(
                    b["l_extendedprice"].to_numpy() * 100.0 + 0.5
                ).astype(np.int64),
            }
        )

    return rollup_sums(
        li.map_batches(quantize, batch_format="pandas"),
        keys=["l_returnflag", "l_linestatus"],
        measures=["qty_centi", "price_centi"],
    )


SQL_PRICING_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       sum(floor(l_quantity * 100.0 + 0.5)::BIGINT)::BIGINT AS qty_centi,
       sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT)::BIGINT AS price_centi,
       count(*)::BIGINT AS n_rows,
       grouping(l_returnflag, l_linestatus)::BIGINT AS lvl
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""


NTILE_N = 4


def q_events_ntile(sf_dir: str):
    """NTILE(4) per event_type over (value, event_id) order
    (stages/windows.group_ntile) — exact integer tile sizing, one shuffle."""
    import pandas as pd

    from ..stages.windows import group_ntile

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    out = group_ntile(ev, n_tiles=NTILE_N).to_pandas()
    out["value"] = out["value"].round(6)
    out["tile"] = out["tile"].astype("int64")
    return out[["event_id", "event_type", "value", "tile"]].sort_values(
        "event_id"
    ).reset_index(drop=True)


SQL_EVENTS_NTILE = f"""
SELECT event_id, event_type, round(value, 6) AS value,
       ntile({NTILE_N}) OVER (PARTITION BY event_type ORDER BY value, event_id)::BIGINT AS tile
FROM events
ORDER BY event_id
"""


def q_word_entropy(sf_dir: str):
    """Per-doc word-distribution entropy in exact integer micro-nats
    (textstats.word_entropy) — zero-shuffle quality/repetition signal."""
    return (
        textstats.word_entropy(_docs(sf_dir, ["doc_id", "text"]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"n_words": "int64", "entropy_micro": "int64"})
    )


SQL_WORD_ENTROPY = """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
c AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
s AS (SELECT doc_id, sum(c)::BIGINT AS n,
             sum(c * floor(ln(c) * 1000000 + 0.5)::BIGINT)::BIGINT AS sc
      FROM c GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(s.n, 0)::BIGINT AS n_words,
       coalesce((s.n * floor(ln(s.n) * 1000000 + 0.5)::BIGINT - s.sc) // s.n, 0)::BIGINT
         AS entropy_micro
FROM documents d LEFT JOIN s USING (doc_id)
ORDER BY doc_id
"""


def q_vocab_zipf(sf_dir: str):
    """Zipf rank–frequency OLS slope over the documents vocabulary in exact
    integer milli-log sums (textstats.vocab_zipf — no global rank shuffle:
    tie runs make Σln(rank) computable from the count histogram)."""
    return textstats.vocab_zipf(_docs(sf_dir, ["doc_id", "text"]))


SQL_VOCAB_ZIPF = """
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
  FROM documents
),
wc AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word),
r AS (SELECT row_number() OVER (ORDER BY c DESC, word) AS rnk, c FROM wc),
m AS (SELECT floor(ln(rnk) * 1000 + 0.5)::BIGINT AS x,
             floor(ln(c) * 1000 + 0.5)::BIGINT AS y FROM r),
s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy FROM m)
SELECT n AS n_vocab, sx, sy, sxx, sxy,
       ((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx))::BIGINT AS slope_micro
FROM s
"""


def q_events_percent_rank(sf_dir: str):
    """PERCENT_RANK per event_type over (value, event_id) order in exact
    integer micro units (stages/windows.group_percent_rank)."""
    import pandas as pd

    from ..stages.windows import group_percent_rank

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    out = group_percent_rank(ev).to_pandas()
    out["value"] = out["value"].round(6)
    return (
        out[["event_id", "event_type", "value", "pct_rank_micro"]]
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype({"pct_rank_micro": "int64"})
    )


SQL_EVENTS_PERCENT_RANK = """
SELECT event_id, event_type, round(value, 6) AS value,
       ((row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)) - 1)
         * 1000000
         // greatest(count(*) OVER (PARTITION BY event_type) - 1, 1) AS pct_rank_micro
FROM events
ORDER BY event_id
"""


MKT_NATION = "NATION_0"


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape: per order-year, one nation's share of total trade
    volume.  ONE order-key hash join (the two event-scale tables), supplier
    and nation broadcast once; volume quantized to exact centi-units at the
    row level so the year sums and the share division are pure integers."""
    import pandas as pd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..stages.joins import adaptive_join_partitions, broadcast_join, hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_ord = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    joined = hash_join(
        li,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=adaptive_join_partitions(n_ord, n_li),
    ).materialize()
    enriched = broadcast_join(joined, supp, on="l_suppkey", right_on="s_suppkey")
    enriched = broadcast_join(enriched, nat, on="s_nationkey", right_on="n_nationkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vol = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
            * 100.0
            + 0.5
        ).astype(np.int64)
        year = b["o_orderdate"].dt.year.to_numpy(np.int64)
        is_nat = (b["n_name"] == MKT_NATION).to_numpy()
        g = pd.DataFrame(
            {
                "o_year": year,
                "nation_vol_centi": np.where(is_nat, vol, 0),
                "total_vol_centi": vol,
            }
        )
        return g.groupby("o_year", sort=False, as_index=False).sum()

    out = (
        enriched.map_batches(partial, batch_format="pandas")
        .groupby("o_year")
        .aggregate(
            Sum("nation_vol_centi", alias_name="nation_vol_centi"),
            Sum("total_vol_centi", alias_name="total_vol_centi"),
        )
        .to_pandas()  # one row per order-year — dimension-scale
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    num = out["nation_vol_centi"].to_numpy(np.int64)
    den = out["total_vol_centi"].to_numpy(np.int64)
    out["share_micro"] = num * np.int64(1_000_000) // den
    return out.astype(
        {
            "o_year": "int64",
            "nation_vol_centi": "int64",
            "total_vol_centi": "int64",
            "share_micro": "int64",
        }
    )


SQL_MARKET_SHARE = f"""
WITH v AS (
  SELECT year(o_orderdate)::BIGINT AS o_year,
         floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)::BIGINT AS vol,
         n_name
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
),
s AS (
  SELECT o_year,
         sum(CASE WHEN n_name = '{MKT_NATION}' THEN vol ELSE 0 END)::BIGINT AS nation_vol_centi,
         sum(vol)::BIGINT AS total_vol_centi
  FROM v GROUP BY o_year
)
SELECT o_year, nation_vol_centi, total_vol_centi,
       (nation_vol_centi * 1000000 // total_vol_centi)::BIGINT AS share_micro
FROM s ORDER BY o_year
"""


BLOOM_M, BLOOM_K = 2048, 4


def q_orders_bloom(sf_dir: str):
    """Bloom-filter bits over the orders customer keys
    (analytics.bloom_bits — k·m-bounded mergeable membership sketch)."""
    from ..stages import analytics

    return (
        analytics.bloom_bits(
            ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
            "o_custkey",
            m_bits=BLOOM_M,
            k=BLOOM_K,
        )
        .to_pandas()  # ≤ k·m rows by construction
        .sort_values(["d", "bit"])
        .reset_index(drop=True)
        .astype({"d": "int64", "bit": "int64"})
    )


def q_customer_bloom_hits(sf_dir: str):
    """Customers testing positive against the orders-custkey bloom filter
    (analytics.bloom_prefilter) — the deterministic candidate superset a
    semi join would verify; false positives included BY DESIGN and pinned
    by the SQL mirror."""
    from ..stages import analytics

    bits = q_orders_bloom(sf_dir)
    out = analytics.bloom_prefilter(
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]),
        bits,
        "c_custkey",
        m_bits=BLOOM_M,
        k=BLOOM_K,
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True).astype({"c_custkey": "int64"})


def _bloom_sql() -> tuple[str, str]:
    from ..stages.analytics import _cm_salts, BLOOM_SALT
    from ..stages.sample import sql_key_hash

    salts = _cm_salts(BLOOM_K, BLOOM_SALT)
    bit_parts = " UNION ALL ".join(
        f"SELECT {d} AS d, (({sql_key_hash('o_custkey', s)})::UBIGINT % {BLOOM_M})::BIGINT AS bit FROM orders"
        for d, s in enumerate(salts)
    )
    bits = f"SELECT DISTINCT d, bit FROM ({bit_parts}) ORDER BY d, bit"
    lk_parts = " UNION ALL ".join(
        f"SELECT c_custkey, {d} AS d, (({sql_key_hash('c_custkey', s)})::UBIGINT % {BLOOM_M})::BIGINT AS bit FROM customer"
        for d, s in enumerate(salts)
    )
    hits = f"""
WITH bits AS (SELECT DISTINCT d, bit FROM ({bit_parts})),
lk AS ({lk_parts})
SELECT lk.c_custkey
FROM lk JOIN bits USING (d, bit)
GROUP BY lk.c_custkey HAVING count(*) = {BLOOM_K}
ORDER BY c_custkey
"""
    return bits, hits


SQL_ORDERS_BLOOM, SQL_CUSTOMER_BLOOM_HITS = _bloom_sql()


def q_events_mode(sf_dir: str):
    """Per-user most frequent event_type (analytics.group_mode): two
    narrow shuffles, deterministic lexicographic tiebreak."""
    from ..stages import analytics

    return (
        analytics.group_mode(
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
            ),
            "user_id",
            "event_type",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)[["user_id", "mode_value", "n_mode"]]
        .astype({"user_id": "int64", "n_mode": "int64"})
    )


SQL_EVENTS_MODE = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type AS mode_value, n AS n_mode,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT user_id, mode_value, n_mode FROM r WHERE rk = 1 ORDER BY user_id
"""


def q_events_mad(sf_dir: str):
    """Per-type median absolute deviation of event values
    (analytics.group_mad — two quantile_disc passes, no interpolation)."""
    from ..stages import analytics

    return analytics.group_mad(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"]),
        "event_type",
        "value",
    )


SQL_EVENTS_MAD = """
WITH m AS (
  SELECT event_type, quantile_disc(value, 0.5) AS median
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, quantile_disc(abs(e.value - m.median), 0.5) AS mad
  FROM events e JOIN m USING (event_type)
  GROUP BY e.event_type
)
SELECT m.event_type, round(m.median, 6) AS median, round(d.mad, 6) AS mad
FROM m JOIN d USING (event_type)
ORDER BY event_type
"""


def q_events_paths(sf_dir: str):
    """Common 3-step event paths per user (stages/windows.path_counts —
    the k-gram generalization of the transition matrix)."""
    import pandas as pd

    from ..stages.windows import path_counts

    cols = ["event_id", "ts", "user_id", "event_type"]
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "ts_us": b["ts"].astype("int64"),
                "user_id": b["user_id"],
                "event_type": b["event_type"],
            }
        )

    return path_counts(ev.map_batches(prep, batch_format="pandas"), length=3)


SQL_EVENTS_PATHS = """
WITH e AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT e1, e2, e3, count(*)::BIGINT AS n_paths
FROM e WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY e1, e2, e3
"""


MIX_TEMP_N = 200


def q_mix_temperature(sf_dir: str):
    """Temperature-scaled (τ=0.5) source mixing (sample.mix_temperature):
    per-source quotas ∝ √count, realized by deterministic hash-rank
    bottom-k — the multilingual-upsampling shape of multi-domain mixes."""
    from ..stages.sample import mix_temperature

    out = mix_temperature(
        _docs(sf_dir, ["doc_id", "source"]), MIX_TEMP_N, group="source"
    ).to_pandas()
    out = out.reindex(columns=["doc_id", "source", "rank"])
    out = out.astype({"doc_id": "int64", "rank": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _sql_mix_temperature() -> str:
    from ..stages.sample import sql_key_hash

    return f"""
WITH cnt AS (SELECT source AS grp, count(*)::BIGINT AS n FROM documents GROUP BY source),
w AS (SELECT grp, n, floor(sqrt(n) * 1000000 + 0.5)::BIGINT AS wt FROM cnt),
q AS (SELECT grp, least(n, {MIX_TEMP_N} * wt // (SELECT sum(wt) FROM w))::BIGINT AS quota FROM w),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY ({sql_key_hash('doc_id')})::UBIGINT, doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.source, r.rn AS "rank"
FROM r JOIN q ON r.source = q.grp
WHERE r.rn <= q.quota
ORDER BY doc_id
"""


SQL_MIX_TEMPERATURE = _sql_mix_temperature()


def q_events_bounce(sf_dir: str):
    """Daily bounce rate over gap sessions (stages/windows.sessionize →
    day-bucket aggregate): share of single-event sessions per day in exact
    integer micro units."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.windows import sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    sess = sessionize(ev, gap_s=1800)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["session_start_us"].to_numpy(np.int64) // 86_400_000_000).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "day": day,
                "n_sessions": np.ones(len(b), dtype=np.int64),
                "n_bounce": (b["n_events"].to_numpy(np.int64) == 1).astype(np.int64),
            }
        ).groupby("day", sort=False, as_index=False).sum()

    out = (
        sess.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_bounce", alias_name="n_bounce"),
        )
        .to_pandas()  # one row per day — dimension-scale
        .sort_values("day")
        .reset_index(drop=True)
        .astype({"day": "int64", "n_sessions": "int64", "n_bounce": "int64"})
    )
    out["bounce_micro"] = (
        out["n_bounce"].to_numpy(np.int64) * np.int64(1_000_000)
        // out["n_sessions"].to_numpy(np.int64)
    )
    return out


SQL_EVENTS_BOUNCE = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
grouped AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
),
sess AS (
  SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events
  FROM grouped GROUP BY user_id, sid
),
d AS (
  SELECT (session_start_us // 86400000000)::BIGINT AS day,
         count(*)::BIGINT AS n_sessions,
         sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounce
  FROM sess GROUP BY 1
)
SELECT day, n_sessions, n_bounce,
       (n_bounce * 1000000 // n_sessions)::BIGINT AS bounce_micro
FROM d ORDER BY day
"""


def q_integrity_audit(sf_dir: str):
    """Referential-integrity audit across the warehouse FKs — the data-QA
    pass a pipeline runs before training export: per FK edge, total rows
    and violations (child keys with no parent), via the distinct-key
    anti-join combiner (stages/joins.semi_join(anti=True) reduces the
    parent side to distinct keys per batch before ONE shuffle)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ..stages.joins import anti_join

    edges = [
        # (name, child table, child key, parent table, parent key)
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    rows = []
    for name, child, ck, parent, pk in edges:
        c_ds = ray.data.read_parquet(f"{sf_dir}/{child}.parquet", columns=[ck])
        p_ds = ray.data.read_parquet(f"{sf_dir}/{parent}.parquet", columns=[pk])
        n_rows = pq.read_metadata(f"{sf_dir}/{child}.parquet").num_rows
        n_viol = anti_join(c_ds, p_ds, on=ck, right_on=pk, num_partitions=4).count()
        rows.append((name, n_rows, n_viol))
    return pd.DataFrame(rows, columns=["fk", "n_rows", "n_violations"]).astype(
        {"n_rows": "int64", "n_violations": "int64"}
    )


SQL_INTEGRITY_AUDIT = """
SELECT 'orders->customer' AS fk, (SELECT count(*) FROM orders)::BIGINT AS n_rows,
       (SELECT count(*) FROM orders o WHERE NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_violations
UNION ALL
SELECT 'lineitem->orders', (SELECT count(*) FROM lineitem)::BIGINT,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT
UNION ALL
SELECT 'lineitem->supplier', (SELECT count(*) FROM lineitem)::BIGINT,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))::BIGINT
UNION ALL
SELECT 'lineitem->part', (SELECT count(*) FROM lineitem)::BIGINT,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))::BIGINT
UNION ALL
SELECT 'customer->nation', (SELECT count(*) FROM customer)::BIGINT,
       (SELECT count(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))::BIGINT
UNION ALL
SELECT 'supplier->nation', (SELECT count(*) FROM supplier)::BIGINT,
       (SELECT count(*) FROM supplier s WHERE NOT EXISTS
         (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))::BIGINT
"""


def q_session_copairs(sf_dir: str):
    """Pairwise event-type co-occurrence within gap sessions
    (stages/windows.session_copairs — the frequent-itemset primitive)."""
    import pandas as pd

    from ..stages.windows import session_copairs

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ts_us": b["ts"].astype("int64"),
                "user_id": b["user_id"],
                "event_type": b["event_type"],
            }
        )

    return session_copairs(ev.map_batches(prep, batch_format="pandas"))


SQL_SESSION_COPAIRS = """
WITH ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
grouped AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
),
st AS (SELECT DISTINCT user_id, sid, event_type FROM grouped)
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_sessions
FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
                    AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_customer_rfm(sf_dir: str):
    """RFM quartile scoring per customer (recency day / order count /
    centi-unit spend): aggregates run distributed (combiner-first), the
    three quartile thresholds come from exact integer value histograms
    (analytics.int_quantile_disc — the vocab_zipf distinct-value-scale
    contract, no global sort), and score assignment is a stateless
    threshold comparison: tile = 1 + Σ(v > q_p).  Threshold-based quartiles
    (boundary ties all take the lower tile) — deterministic and mirrored
    token-for-token in SQL via quantile_disc."""
    import pandas as pd
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.analytics import int_quantile_disc

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"],
                "day": (b["o_orderdate"].astype("int64") // 86_400_000_000).astype(
                    "int64"
                ),
                "price_centi": np.floor(
                    b["o_totalprice"].to_numpy() * 100.0 + 0.5
                ).astype(np.int64),
            }
        )

    agg = (
        orders.map_batches(prep, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(
            Max("day", alias_name="r_day"),
            Count(alias_name="f_orders"),
            Sum("price_centi", alias_name="m_centi"),
        )
        .materialize()
    )
    ps = (0.25, 0.5, 0.75)
    qs = {c: int_quantile_disc(agg, c, ps) for c in ("r_day", "f_orders", "m_centi")}

    def score(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        for c, short in (("r_day", "r"), ("f_orders", "f"), ("m_centi", "m")):
            v = b[c].to_numpy(np.int64)
            t = np.ones(len(b), dtype=np.int64)
            for q in qs[c]:
                t += (v > q).astype(np.int64)
            out[f"{short}_score"] = t
        return out

    return (
        agg.map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
        .astype(
            {
                "o_custkey": "int64",
                "r_day": "int64",
                "f_orders": "int64",
                "m_centi": "int64",
                "r_score": "int64",
                "f_score": "int64",
                "m_score": "int64",
            }
        )[
            ["o_custkey", "r_day", "f_orders", "m_centi", "r_score", "f_score", "m_score"]
        ]
    )


SQL_CUSTOMER_RFM = """
WITH a AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000)::BIGINT AS r_day,
         count(*)::BIGINT AS f_orders,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT AS m_centi
  FROM orders GROUP BY o_custkey
),
q AS (
  SELECT quantile_disc(r_day, 0.25) AS r1, quantile_disc(r_day, 0.5) AS r2,
         quantile_disc(r_day, 0.75) AS r3,
         quantile_disc(f_orders, 0.25) AS f1, quantile_disc(f_orders, 0.5) AS f2,
         quantile_disc(f_orders, 0.75) AS f3,
         quantile_disc(m_centi, 0.25) AS m1, quantile_disc(m_centi, 0.5) AS m2,
         quantile_disc(m_centi, 0.75) AS m3
  FROM a
)
SELECT o_custkey, r_day, f_orders, m_centi,
       (1 + (r_day > q.r1)::INT + (r_day > q.r2)::INT + (r_day > q.r3)::INT)::BIGINT AS r_score,
       (1 + (f_orders > q.f1)::INT + (f_orders > q.f2)::INT + (f_orders > q.f3)::INT)::BIGINT AS f_score,
       (1 + (m_centi > q.m1)::INT + (m_centi > q.m2)::INT + (m_centi > q.m3)::INT)::BIGINT AS m_score
FROM a, q ORDER BY o_custkey
"""


# --- graph_components: bounded min-label propagation over a sparse
# order-part graph (the label-propagation sibling of graph_pagerank) ------

CC_QTY_MIN = 48  # rare-quantity filter → a genuinely fragmented graph
CC_PART_OFFSET = 10_000_000  # part ids above the orderkey range
CC_GATE_ITERS = 6  # fixed superstep budget — both sides pin the SAME K


def q_graph_components(sf_dir: str):
    """Connected components (stages/graph.connected_components) over the
    symmetrised order-part graph restricted to rare high-quantity lines
    (l_quantity ≥ 48 — 138/1245 components at sf0.001/sf0.01, measured):
    ``comp`` = min vertex id within K=6 hops, the exact K-step recurrence
    the chained-CTE oracle mirrors.  Fixpoint semantics (until_convergence)
    are pinned separately by pytest against a scalar union-find."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    from ..stages.graph import connected_components

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        keep = q >= CC_QTY_MIN
        o = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        uniq = np.unique(np.stack([o, p], axis=1), axis=0)
        return pa.table(
            {
                "o": pa.array(uniq[:, 0], type=pa.int64()),
                "p": pa.array(uniq[:, 1], type=pa.int64()),
            }
        )

    pair_ds = (
        li.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["o", "p"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )

    def symmetrize(b: pa.Table) -> pa.Table:
        o = b["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["p"].to_numpy(zero_copy_only=False).astype(np.int64) + np.int64(
            CC_PART_OFFSET
        )
        return pa.table(
            {
                "src": pa.array(np.concatenate([o, p]), type=pa.int64()),
                "dst": pa.array(np.concatenate([p, o]), type=pa.int64()),
            }
        )

    edges = pair_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    return (
        connected_components(edges, iterations=CC_GATE_ITERS)
        .to_pandas()  # vertex-scale output, dimension-bounded at gate scale
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "comp": "int64"})
    )


def _sql_graph_components() -> str:
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey + {CC_PART_OFFSET} AS p
  FROM lineitem WHERE l_quantity >= {CC_QTY_MIN}
),
edges AS (
  SELECT o AS src, p AS dst FROM pairs
  UNION ALL
  SELECT p AS src, o AS dst FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
    prev = "l0"
    for t in range(1, CC_GATE_ITERS + 1):
        sql += f""",
l{t} AS (
  SELECT node, min(lbl)::BIGINT AS lbl FROM (
    SELECT node, lbl FROM {prev}
    UNION ALL
    SELECT e.dst AS node, q.lbl FROM edges e JOIN {prev} q ON q.node = e.src
  ) GROUP BY node)"""
        prev = f"l{t}"
    return sql + f"\nSELECT node, lbl AS comp FROM {prev} ORDER BY node"


SQL_GRAPH_COMPONENTS = _sql_graph_components()


# --- pricing_cube: all 2^k grouping sets (the CUBE sibling of ROLLUP) -----


def q_pricing_cube(sf_dir: str):
    """GROUP BY CUBE over the Q1 keys (analytics.cube_sums): the rollup
    derivation extended to all 4 grouping sets — centi-quantized integer
    measures keep every level bit-identical to the finest aggregate."""
    import pandas as pd

    from ..stages.analytics import cube_sums

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def quantize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_centi": np.floor(b["l_quantity"].to_numpy() * 100.0 + 0.5).astype(
                    np.int64
                ),
                "price_centi": np.floor(
                    b["l_extendedprice"].to_numpy() * 100.0 + 0.5
                ).astype(np.int64),
            }
        )

    return cube_sums(
        li.map_batches(quantize, batch_format="pandas"),
        keys=["l_returnflag", "l_linestatus"],
        measures=["qty_centi", "price_centi"],
    )


SQL_PRICING_CUBE = """
SELECT l_returnflag, l_linestatus,
       sum(floor(l_quantity * 100.0 + 0.5)::BIGINT)::BIGINT AS qty_centi,
       sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT)::BIGINT AS price_centi,
       count(*)::BIGINT AS n_rows,
       grouping(l_returnflag, l_linestatus)::BIGINT AS lvl
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""


# --- readability: integer Flesch-shaped score over documents -------------


def q_readability(sf_dir: str):
    """Per-doc readability (textstats.readability_batch): vowel-run
    syllables, terminal-punctuation-run sentences, house word count, and a
    Flesch score in exact integer milli-units (floor-division recurrence
    mirrored token-for-token by the oracle)."""
    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.readability_batch, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {
            "doc_id": "int64",
            "n_words": "int64",
            "n_sentences": "int64",
            "n_syllables": "int64",
            "flesch_milli": "int64",
        }
    )


SQL_READABILITY = """
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
         len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (206835
        - (1015 * greatest(n_words, 1)) // greatest(n_sentences, 1)
        - (84600 * greatest(n_syllables, 1)) // greatest(n_words, 1))::BIGINT
         AS flesch_milli
FROM c ORDER BY doc_id
"""


# --- lineitem_wq: weighted discrete quantiles per group ------------------

WQ_PCTS = (25, 50, 75)


def q_lineitem_wq(sf_dir: str):
    """Quantity-weighted price quantiles per return flag
    (analytics.weighted_quantiles): smallest centi-price whose cumulative
    centi-quantity weight reaches ceil(p·W/100) — all-integer order
    statistics, no interpolation, bit-exact vs the window-cumsum oracle."""
    import pandas as pd

    from ..stages.analytics import weighted_quantiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def quantize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "price_centi": np.floor(
                    b["l_extendedprice"].to_numpy() * 100.0 + 0.5
                ).astype(np.int64),
                "qty_centi": np.floor(b["l_quantity"].to_numpy() * 100.0 + 0.5).astype(
                    np.int64
                ),
            }
        )

    return weighted_quantiles(
        li.map_batches(quantize, batch_format="pandas"),
        group="l_returnflag",
        value="price_centi",
        weight="qty_centi",
        pcts=WQ_PCTS,
    )


SQL_LINEITEM_WQ = f"""
WITH w AS (
  SELECT l_returnflag, floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS price_centi,
         sum(floor(l_quantity * 100.0 + 0.5)::BIGINT)::BIGINT AS wt
  FROM lineitem GROUP BY 1, 2
),
tot AS (SELECT l_returnflag, sum(wt)::BIGINT AS tw FROM w GROUP BY 1),
cum AS (
  SELECT l_returnflag, price_centi,
         sum(wt) OVER (PARTITION BY l_returnflag ORDER BY price_centi)::BIGINT AS cw
  FROM w
)
SELECT c.l_returnflag, p.p::BIGINT AS p, min(c.price_centi)::BIGINT AS wq
FROM cum c
JOIN tot t USING (l_returnflag)
CROSS JOIN (VALUES {", ".join(f"({p})" for p in WQ_PCTS)}) p(p)
WHERE c.cw * 100 >= p.p * t.tw
GROUP BY c.l_returnflag, p.p
ORDER BY l_returnflag, p
"""


# --- events_latest: latest-state compaction (CDC "current snapshot") ------


def q_events_latest(sf_dir: str):
    """Per-(user, event_type) latest row (analytics.latest_by_key):
    argmax by (ts, event_id) — the upsert-compaction primitive, reduced
    combiner-first so only per-batch winners ever shuffle."""
    import pandas as pd

    from ..stages.analytics import latest_by_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": b["event_id"],
                "value": b["value"],
            }
        )

    out = latest_by_key(
        ev.map_batches(prep, batch_format="pandas"),
        keys=["user_id", "event_type"],
        order=["ts_us", "event_id"],
    ).to_pandas()
    out["value"] = out["value"].round(6)
    return (
        out.sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "ts_us": "int64", "event_id": "int64"})
    )[["user_id", "event_type", "ts_us", "event_id", "value"]]


SQL_EVENTS_LATEST = """
SELECT user_id, event_type, ts_us, event_id, round(value, 6) AS value
FROM (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
"""


# --- graph_triangles: per-node triangle counts over the co-purchase graph -

TRI_QTY_MIN = 40  # 226 / 1652 triangles at sf0.001 / sf0.01 (measured)


def _copurchase_edges(sf_dir: str, qty_min: int = None) -> ray.data.Dataset:
    """Canonical (u<v) DISTINCT part co-purchase edges (parts sharing an
    order, l_quantity ≥ qty_min).  PARTITIONING: per-order part lists
    co-locate via the coarse order hash (the session_copairs combiner
    contract); per-partition self-merge emits pair partials, one groupby
    dedups across orders."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count

    from ..stages.analytics import _pk_any

    qty = TRI_QTY_MIN if qty_min is None else qty_min
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_quantity"] >= qty]
        out = b[["l_orderkey", "l_partkey"]].drop_duplicates()
        out = out.copy()
        out["__pk"] = _pk_any(out["l_orderkey"], 64)
        return out

    def order_pairs(g: pd.DataFrame) -> pa.Table:
        it = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = it.merge(it, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        pairs = m[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
        return pa.table(
            {
                "u": pa.array(pairs["l_partkey_x"].to_numpy(np.int64)),
                "v": pa.array(pairs["l_partkey_y"].to_numpy(np.int64)),
            }
        )

    return (
        li.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(order_pairs, batch_format="pandas")
        .groupby(["u", "v"])  # distinct across orders
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
        .materialize()
    )


def q_graph_triangles(sf_dir: str):
    """Per-node triangle counts (stages/graph.triangle_counts) over the
    part co-purchase projection (parts sharing an order, l_quantity ≥ 40):
    oriented wedge generation + packed-key closure check — every triangle
    counted once per corner."""
    from ..stages.graph import triangle_counts

    return (
        triangle_counts(_copurchase_edges(sf_dir))
        .to_pandas()  # nodes-on-triangles — dimension-bounded at gate scale
        .reindex(columns=["node", "n_tri"])  # empty-ds schema quirk
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "n_tri": "int64"})
    )


SQL_GRAPH_TRIANGLES = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}
),
edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
),
tri AS (
  SELECT e1.u AS u, e1.v AS v, e2.v AS w
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT node, count(*)::BIGINT AS n_tri FROM corners GROUP BY node ORDER BY node
"""


# --- graph_kcore: iterative peeling over the co-purchase graph -----------

KCORE_K = 3


def q_graph_kcore(sf_dir: str):
    """k-core peeling (stages/graph.kcore, k=3, fixed 6-round budget) over
    the symmetrised part co-purchase graph: each round drops vertices with
    in-set degree < k — the exact R-step recurrence the chained HAVING-CTE
    oracle pins.  True-fixpoint semantics pinned separately by pytest
    (fixpoint reached in ≤4 rounds at both gate scales, measured)."""
    import pyarrow as pa

    from ..stages.graph import KCORE_ROUNDS, kcore

    def symmetrize(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    sym = (
        _copurchase_edges(sf_dir)
        .map_batches(symmetrize, batch_format="pyarrow")
        .materialize()
    )
    out = kcore(sym, k=KCORE_K, rounds=KCORE_ROUNDS).to_pandas()
    out = out.reindex(columns=["node", "deg"])  # empty-ds schema quirk
    return (
        out.sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "deg": "int64"})
    )


def _sql_graph_kcore() -> str:
    from ..stages.graph import KCORE_ROUNDS

    sql = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}
),
edges0 AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
),
edges AS (
  SELECT u AS src, v AS dst FROM edges0
  UNION ALL
  SELECT v AS src, u AS dst FROM edges0
),
s0 AS (SELECT DISTINCT src AS node FROM edges)"""
    prev = "s0"
    for t in range(1, KCORE_ROUNDS + 1):
        sql += f""",
s{t} AS (
  SELECT e.src AS node FROM edges e
  JOIN {prev} a ON e.src = a.node JOIN {prev} b ON e.dst = b.node
  GROUP BY e.src HAVING count(*) >= {KCORE_K})"""
        prev = f"s{t}"
    return sql + f"""
SELECT e.src AS node, count(*)::BIGINT AS deg
FROM edges e
JOIN {prev} a ON e.src = a.node JOIN {prev} b ON e.dst = b.node
GROUP BY e.src ORDER BY node
"""


SQL_GRAPH_KCORE = _sql_graph_kcore()


# --- events_outliers: grouped IQR (Tukey fence) outlier flags -------------


def q_events_outliers(sf_dir: str):
    """Tukey-fence outliers per event_type: values quantized to exact
    micro ints; q1/q3 = per-group quantile_disc via the unit-weight
    weighted-quantile kernel (histogram combiner — distinct values
    shuffle, never rows); the 1.5·IQR fences compare in doubled integer
    units (2·v <> 2·q ± 3·IQR) so no fraction ever appears.  The q-table
    is dimension-scale (one row per event_type) and broadcasts into a
    streaming filter."""
    import pandas as pd

    from ..functions.words import round6
    from ..stages.analytics import weighted_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value": b["value"],
                "vm": np.floor(b["value"].to_numpy() * 1e6 + 0.5).astype(np.int64),
                "one": np.ones(len(b), dtype=np.int64),
            }
        )

    prepped = ev.map_batches(prep, batch_format="pandas").materialize()
    q = weighted_quantiles(
        prepped.select_columns(["event_type", "vm", "one"]),
        group="event_type",
        value="vm",
        weight="one",
        pcts=(25, 75),
    )
    piv = q.pivot(index="event_type", columns="p", values="wq")
    bounds = pd.DataFrame(
        {
            "event_type": piv.index,
            "__q1": piv[25].to_numpy(np.int64),
            "__q3": piv[75].to_numpy(np.int64),
        }
    ).reset_index(drop=True)  # dimension-scale: one row per event_type

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        m = b.merge(bounds, on="event_type", how="left")
        q1 = m["__q1"].to_numpy(np.int64)
        q3 = m["__q3"].to_numpy(np.int64)
        vm2 = 2 * m["vm"].to_numpy(np.int64)
        iqr3 = 3 * (q3 - q1)
        keep = (vm2 < 2 * q1 - iqr3) | (vm2 > 2 * q3 + iqr3)
        out = m.loc[keep, ["event_id", "event_type", "value"]].copy()
        out["value"] = round6(out["value"].to_numpy())
        return out

    out = prepped.map_batches(flag, batch_format="pandas").to_pandas()
    out = out.reindex(columns=["event_id", "event_type", "value"])
    return (
        out.sort_values("event_id")
        .reset_index(drop=True)
        .astype({"event_id": "int64"})
    )


SQL_EVENTS_OUTLIERS = """
WITH v AS (
  SELECT event_id, event_type, value,
         floor(value * 1e6 + 0.5)::BIGINT AS vm
  FROM events
),
q AS (
  SELECT event_type,
         quantile_disc(vm, 0.25) AS q1, quantile_disc(vm, 0.75) AS q3
  FROM v GROUP BY event_type
)
SELECT event_id, event_type, round(value, 6) AS value
FROM v JOIN q USING (event_type)
WHERE 2 * vm < 2 * q1 - 3 * (q3 - q1) OR 2 * vm > 2 * q3 + 3 * (q3 - q1)
ORDER BY event_id
"""


# --- graph_assortativity: degree-correlation moment sums ------------------


def q_graph_assortativity(sf_dir: str):
    """Degree-assortativity moment sums (graph.degree_assortativity_sums)
    over the symmetrised co-purchase graph: one row of exact int64 sums
    (n, Σx, Σy, Σxy, Σx², Σy² over directed edges) — the float Pearson r
    derives driver-side; the integers ARE the oracle contract (the
    embedding_gram / vocab_zipf house pattern)."""
    import pyarrow as pa

    from ..stages.graph import degree_assortativity_sums

    def symmetrize(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    sym = (
        _copurchase_edges(sf_dir)
        .map_batches(symmetrize, batch_format="pyarrow")
        .materialize()
    )
    return degree_assortativity_sums(sym).reset_index(drop=True)


SQL_GRAPH_ASSORTATIVITY = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}
),
edges0 AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
),
edges AS (
  SELECT u AS src, v AS dst FROM edges0
  UNION ALL
  SELECT v AS src, u AS dst FROM edges0
),
deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src)
SELECT count(*)::BIGINT AS n_edges,
       sum(a.d)::BIGINT AS sx, sum(b.d)::BIGINT AS sy,
       sum(a.d * b.d)::BIGINT AS sxy,
       sum(a.d * a.d)::BIGINT AS sxx, sum(b.d * b.d)::BIGINT AS syy
FROM edges e JOIN deg a ON e.src = a.src JOIN deg b ON e.dst = b.src
"""


# --- events_corr: grouped correlation moment sums -------------------------


def q_events_corr(sf_dir: str):
    """Per-event-type correlation moment sums between centi-quantized value
    and hour-of-day (analytics.grouped_moment_sums): exact int64
    (n, sx, sy, sxy, sxx, syy) — one partial row per group per batch
    shuffles; the float Pearson r derives driver-side from the pinned
    integers (the assortativity house pattern)."""
    import pandas as pd

    from ..stages.analytics import grouped_moment_sums

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "x": np.floor(b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64),
                "y": (ts_us // 3_600_000_000) % 24,
            }
        )

    return grouped_moment_sums(
        ev.map_batches(prep, batch_format="pandas"), group="event_type", x="x", y="y"
    )


SQL_EVENTS_CORR = """
WITH v AS (
  SELECT event_type,
         floor(value * 100.0 + 0.5)::BIGINT AS x,
         ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS y
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n,
       sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
       sum(x * y)::BIGINT AS sxy,
       sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
FROM v GROUP BY event_type ORDER BY event_type
"""


# --- source_drift: chi-square histogram drift per corpus source -----------

DRIFT_BUCKET_W, DRIFT_BUCKETS = 20, 20


def q_source_drift(sf_dir: str):
    """Distribution drift per `source`: chi-square of each source's
    word-count histogram (width-20 buckets, capped at 20) against the
    pooled corpus histogram, in exact integer micro-units
    (analytics.chi2_drift — Python-int arithmetic over the dimension-scale
    count table; the SQL mirror runs the identical expression in HUGEINT).
    The (source, bucket) counts reduce combiner-first; rows never
    shuffle."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.analytics import chi2_drift
    from ..stages.textstats import WORD_RE

    docs = _docs(sf_dir, ["doc_id", "text", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        nw = b["text"].str.count(WORD_RE).to_numpy(np.int64)
        bucket = np.minimum(nw // DRIFT_BUCKET_W, DRIFT_BUCKETS - 1)
        g = (
            pd.DataFrame({"source": b["source"], "bucket": bucket})
            .groupby(["source", "bucket"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return g

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["source", "bucket"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # dimension-scale: sources × 20 buckets
    )
    return chi2_drift(counts, "source").sort_values("source").reset_index(drop=True)


SQL_SOURCE_DRIFT = f"""
WITH w AS (
  SELECT source, least(len(regexp_extract_all(text, '\\S+')) // {DRIFT_BUCKET_W},
                       {DRIFT_BUCKETS - 1})::BIGINT AS bucket
  FROM documents
),
c AS (SELECT source, bucket, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
d AS (SELECT bucket, sum(c)::BIGINT AS d FROM c GROUP BY bucket),
tot AS (SELECT sum(c)::BIGINT AS m FROM c),
ns AS (SELECT source, sum(c)::BIGINT AS n FROM c GROUP BY source),
cells AS (
  SELECT s.source, s.n, d.bucket, d.d, coalesce(cc.c, 0)::BIGINT AS c
  FROM ns s CROSS JOIN d
  LEFT JOIN c cc ON cc.source = s.source AND cc.bucket = d.bucket
)
SELECT source, any_value(n)::BIGINT AS n_docs,
       sum((1000000::HUGEINT * (c * t.m - d * n) * (c * t.m - d * n))
           // (t.m::HUGEINT * d * n))::BIGINT AS chi2_micro
FROM cells CROSS JOIN tot t
GROUP BY source ORDER BY source
"""


# --- graph_hits: integer HITS hubs/authorities -----------------------------


def q_graph_hits(sf_dir: str):
    """HITS (stages/graph.hits) over the DIRECTED customer→supplier trade
    graph: hubs = customers, authorities = suppliers.  Mean-normalized
    integer fixed point (L2 norm is a sqrt no integer mirror survives);
    every score is an exact int64 the 4-iteration chained-CTE oracle
    pins, including the exact zeros on pure sources/sinks."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    from ..stages.graph import hits
    from ..stages.joins import adaptive_join_partitions, hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    joined = hash_join(
        orders,
        li,
        on="o_orderkey",
        right_on="l_orderkey",
        num_partitions=adaptive_join_partitions(n_orders, n_li),
    ).materialize()

    def pair_partial(b: pa.Table) -> pa.Table:
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([c, sp], axis=1), axis=0)
        return pa.table(
            {
                "src": pa.array(uniq[:, 0], type=pa.int64()),
                "dst": pa.array(uniq[:, 1] + np.int64(PR_SUPP_OFFSET), type=pa.int64()),
            }
        )

    edges = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
        .materialize()
    )
    return (
        hits(edges)
        .to_pandas()  # vertex-scale, dimension-bounded at gate scale
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "hub_micro": "int64", "auth_micro": "int64"})
    )


def _sql_graph_hits() -> str:
    from ..stages.graph import HITS_ITERATIONS, HITS_SCALE

    S = HITS_SCALE
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT c AS src, s + {PR_SUPP_OFFSET} AS dst FROM pairs),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
h0 AS MATERIALIZED (SELECT node, {S}::BIGINT AS h FROM nodes)"""
    prev_h = "h0"
    for t in range(1, HITS_ITERATIONS + 1):
        sql += f""",
a{t}r AS MATERIALIZED (SELECT e.dst AS node, sum(h.h)::BIGINT AS v
          FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst),
a{t} AS MATERIALIZED (SELECT node, ((v * {S}) // greatest(
            (SELECT sum(v) FROM a{t}r) // (SELECT n FROM nn), 1))::BIGINT AS a
         FROM a{t}r),
h{t}r AS MATERIALIZED (SELECT e.src AS node, sum(a.a)::BIGINT AS v
          FROM edges e JOIN a{t} a ON a.node = e.dst GROUP BY e.src),
h{t} AS MATERIALIZED (SELECT node, ((v * {S}) // greatest(
            (SELECT sum(v) FROM h{t}r) // (SELECT n FROM nn), 1))::BIGINT AS h
         FROM h{t}r)"""
        prev_h = f"h{t}"
    k = HITS_ITERATIONS
    return sql + f"""
SELECT n.node, coalesce(h{k}.h, 0)::BIGINT AS hub_micro,
       coalesce(a{k}.a, 0)::BIGINT AS auth_micro
FROM nodes n
LEFT JOIN h{k} ON h{k}.node = n.node
LEFT JOIN a{k} ON a{k}.node = n.node
ORDER BY n.node
"""


SQL_GRAPH_HITS = _sql_graph_hits()


# --- rrf_fusion: reciprocal-rank fusion of the two BM25 rankings ----------


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (functions/bm25.rrf_fuse) of the trigram-BM25
    and word-BM25 top-k lists for the same query — the standard
    multi-retriever merge, in exact integer micro-units (1e6 // (60+rank));
    ranks re-derived by (round-6 score DESC, doc_id) on both sides so the
    mirror's row_number() sees the identical order.  The fusion input is
    two k-row driver-resident lists — the distributed work is the two
    searchers feeding it."""
    from ..functions.bm25 import rrf_fuse

    t1 = q_bm25_topk(sf_dir).to_pandas()
    t2 = q_bm25_words(sf_dir).to_pandas()
    return rrf_fuse([t1, t2])


SQL_RRF_FUSION = f"""
WITH r1 AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rnk
  FROM ({SQL_BM25_TOPK})
),
r2 AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rnk
  FROM ({SQL_BM25_WORDS})
),
u AS (SELECT doc_id FROM r1 UNION SELECT doc_id FROM r2)
SELECT u.doc_id,
       (coalesce(1000000 // (60 + r1.rnk), 0)
        + coalesce(1000000 // (60 + r2.rnk), 0))::BIGINT AS rrf_micro
FROM u LEFT JOIN r1 USING (doc_id) LEFT JOIN r2 USING (doc_id)
ORDER BY rrf_micro DESC, u.doc_id
"""


# ===========================================================================
# registry
# ===========================================================================

QUERIES = {
    # Registry order is load-bearing: the driver's per-round correctness
    # sweep verifies entries in dict order with a finite budget (50/round).
    # CORRECTNESS_r04 covered exactly the first 50 entries of the r4 order;
    # round 5 fronts (a) tfidf_topk — r4's one REAL failure, the
    # empty-pandas-block join poison, guard now built INTO hash_join —
    # (b) image_features — newly value-hash oracled via integerized
    # kernels — and (c) the 14 entries the r4 budget never reached, so
    # after this sweep every registry entry has ≥1 green driver row across
    # r1–r5.
    "tfidf_topk": q_tfidf_topk,  # r4 driver failure — re-queued first
    "image_features": q_image_features,  # newly oracled (was rows-only)
    "events_approx_quantiles": q_events_approx_quantiles,  # never reached
    "events_sorted": q_events_sorted,  # never reached
    "corpus_prep": q_corpus_prep,  # never reached
    "c4_filters": q_c4_filters,  # never reached
    "near_search": q_near_search,  # never reached
    "normalize_text": q_normalize_text,  # never reached
    "knn_quantized": q_knn_quantized,  # never reached
    "wildcard_terms": q_wildcard_terms,  # never reached
    "word_cooc": q_word_cooc,  # never reached
    "blocklist": q_blocklist,  # never reached
    "blocklist_multi": q_blocklist_multi,  # new in r5 (Rabin-Karp banks)
    "dsir_weights": q_dsir_weights,  # new in r5 (DSIR importance weights)
    "shuffle_export": q_shuffle_export,  # new in r5 (deterministic shuffle)
    "embedding_gram": q_embedding_gram,  # new in r5 (integer moment matrix)
    "sample_exact_n": q_sample_exact_n,  # new in r5 (exact-n uniform sample)
    "doc_chunks": q_doc_chunks,  # new in r5 (RAG chunk boundaries)
    "events_cm_sketch": q_events_cm_sketch,  # new in r5 (count-min sketch)
    "events_retention": q_events_retention,  # new in r5 (cohort matrix)
    "training_export": q_training_export,  # new in r5 (composed selection)
    "events_transitions": q_events_transitions,  # new in r5 (Markov matrix)
    "graph_pagerank": q_graph_pagerank,  # new in r5 (integer Pregel loop)
    "pricing_rollup": q_pricing_rollup,  # new in r5 (ROLLUP levels)
    "events_ntile": q_events_ntile,  # new in r5 (exact NTILE sizing)
    "word_entropy": q_word_entropy,  # new in r5 (integer micro-nats)
    "vocab_zipf": q_vocab_zipf,  # new in r5 (histogram-rank Zipf fit)
    "events_percent_rank": q_events_percent_rank,  # new in r5
    "market_share": q_market_share,  # new in r5 (Q8 shape, integer volume)
    "orders_bloom": q_orders_bloom,  # new in r5 (membership sketch)
    "events_mode": q_events_mode,  # new in r5 (grouped mode)
    "events_mad": q_events_mad,  # new in r5 (robust scale stat)
    "events_paths": q_events_paths,  # new in r5 (3-gram paths)
    "mix_temperature": q_mix_temperature,  # new in r5 (tau=0.5 mixing)
    "events_bounce": q_events_bounce,  # new in r5 (session bounce rate)
    "integrity_audit": q_integrity_audit,  # new in r5 (FK QA pass)
    "session_copairs": q_session_copairs,  # new in r5 (itemset pairs)
    "customer_rfm": q_customer_rfm,  # new in r5 (histogram-quantile scores)
    # 53 never-driver-verified candidates for the driver's 50-budget: the
    # novel-machinery gates all sit inside the window; the three overflow
    # slots go to sibling gates with an in-budget twin (see the overflow
    # comment below)
    "graph_components": q_graph_components,  # new in r5 (min-label Pregel)
    "readability": q_readability,  # new in r5 (integer Flesch milli-units)
    "events_latest": q_events_latest,  # new in r5 (CDC latest-state compaction)
    "graph_triangles": q_graph_triangles,  # new in r5 (wedge-closure counts)
    "graph_kcore": q_graph_kcore,  # new in r5 (iterative peeling)
    "graph_hits": q_graph_hits,  # new in r5 (integer HITS hubs/authorities)
    "rrf_fusion": q_rrf_fusion,  # new in r5 (multi-retriever RRF merge)
    "events_outliers": q_events_outliers,  # new in r5 (Tukey IQR fences)
    "graph_assortativity": q_graph_assortativity,  # new in r5 (moment sums)
    "events_corr": q_events_corr,  # new in r5 (grouped moment sums)
    "source_drift": q_source_drift,  # new in r5 (chi-square drift)
    "lineitem_wq": q_lineitem_wq,  # new in r5 (weighted discrete quantiles)
    # overflow slots (51+): sibling gates whose execution shape is already
    # driver-verified by an in-budget twin (cube ~ pricing_rollup,
    # prefilter ~ orders_bloom, estimates ~ events_cm_sketch, wildcard_docs
    # ~ wildcard_terms, near_ordered ~ near_search, cooc_capped ~
    # word_cooc) — all pass the full local sweep at sf0.001 AND sf0.01
    "embedding_quantize": q_embedding_quantize,  # twin: knn_quantized
    "dsir_select": q_dsir_select,  # new in r5 (twin: dsir_weights)
    "near_ordered": q_near_ordered,  # never reached (twin: near_search)
    "word_cooc_capped": q_word_cooc_capped,  # new in r5 (twin: word_cooc)
    "pricing_cube": q_pricing_cube,  # new in r5 (all 2^k grouping sets)
    "customer_bloom_hits": q_customer_bloom_hits,  # new in r5 (prefilter)
    "events_cm_estimates": q_events_cm_estimates,  # new in r5 (CM queries)
    "wildcard_docs": q_wildcard_docs,  # never reached
    # --- verified by the driver in r4 (CORRECTNESS_r04, all green) ---
    "span_dedup": q_span_dedup,
    "keyed_split": q_keyed_split,
    "prefix_terms": q_prefix_terms,
    "prefix_docs": q_prefix_docs,
    "gopher_rules": q_gopher_rules,
    "semdedup": q_semdedup,
    "bigram_bpw": q_bigram_bpw,
    "dedup_incremental": q_dedup_incremental,
    "sample_weighted": q_sample_weighted,
    "split_assign": q_split_assign,
    "events_stratified": q_events_stratified,
    "mix_sources": q_mix_sources,
    "unigram_bpw": q_unigram_bpw,
    "multimodal_meta": q_multimodal_meta,
    "frame_sample": q_frame_sample,
    "audio_meta": q_audio_meta,
    "image_resize": q_image_resize,
    "image_channel_stats": q_image_channel_stats,
    "events_tumbling": q_events_tumbling,
    "events_hopping": q_events_hopping,
    "events_sessions": q_events_sessions,
    "events_asof": q_events_asof,
    "events_rolling": q_events_rolling,
    "events_rolling_shuffled": q_events_rolling_shuffled,
    "events_lag": q_events_lag,
    "events_lag_shuffled": q_events_lag_shuffled,
    "events_cumsum_shuffled": q_events_cumsum_shuffled,
    "events_cumsum": q_events_cumsum,
    "events_zscore": q_events_zscore,
    "events_histogram": q_events_histogram,
    "events_funnel": q_events_funnel,
    "lineitem_profile": q_lineitem_profile,
    "events_props_stats": q_events_props_stats,
    "embedding_centroids": q_embedding_centroids,
    "regex_search": q_regex_search,
    "regex_scan": q_regex_scan,
    "orders_enriched": q_orders_enriched,
    "lineitem_revenue": q_lineitem_revenue,
    "regional_revenue": q_regional_revenue,
    "events_range": q_events_range,
    "orders_topk": q_orders_topk,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "events_approx_users": q_events_approx_users,
    "events_pivot": q_events_pivot,
    "orders_unshipped": q_orders_unshipped,
    "events_distinct": q_events_distinct,
    "events_quantiles": q_events_quantiles,
    # --- verified by driver oracles in rounds 1-3 (CORRECTNESS_r0{1,2,3}) ---
    "build_documents": q_build_documents,
    "jsonl_ingest": q_jsonl_ingest,
    "corpus_stats": q_corpus_stats,
    "term_stats": q_term_stats,
    "index_stats": q_index_stats,
    "postings_probe": q_postings_probe,
    "merge_postings": q_merge_postings,
    "remove_postings": q_remove_postings,
    "phrase_search": q_phrase_search,
    "phrase_limited": q_phrase_limited,
    "phrase_ranges": q_phrase_ranges,
    "bool_search": q_bool_search,
    "phrase_snippets": q_phrase_snippets,
    "phrase_counts": q_phrase_counts,
    "bm25_topk": q_bm25_topk,
    "symbol_search": q_symbol_search,
    "word_occurrences": q_word_occurrences,
    "bm25_words": q_bm25_words,
    "fuzzy_words": q_fuzzy_words,
    "package_defs": q_package_defs,
    "file_search": q_file_search,
    "line_extract": q_line_extract,
    "topk_terms": q_topk_terms,
    "topk_words": q_topk_words,
    "topk_bigrams": q_topk_bigrams,
    "dedup_exact": q_dedup_exact,
    "line_dedup": q_line_dedup,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    "dedup_canonical": q_dedup_canonical,
    "canonical_export": q_canonical_export,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_ivf": q_dedup_embedding_ivf,
    # rows-only by design (engine k-means codebooks; measured recall logged
    # per run, fully-oracled sibling knn_quantized) — kept past the budget
    "ann_pq": q_ann_pq,
    "dedup_embedding_grid": q_dedup_embedding_grid,
    "knn_cosine": q_knn_cosine,
    "ann_ivf": q_ann_ivf,
    "lang_id": q_lang_id,
    "quality": q_quality,
    "quality_score": q_quality_score,
    "quality_filter": q_quality_filter,
    "token_counts": q_token_counts,
    "pii_scrub": q_pii_scrub,
    "fingerprint": q_fingerprint,
    "doc_repetition": q_doc_repetition,
    "pack_sequences": q_pack_sequences,
    "assemble_sequences": q_assemble_sequences,
    "contamination": q_contamination,
    "sample_bernoulli": q_sample_bernoulli,
    # rows-only by design (LAPACK eigenbasis; the feeding moment pass is
    # value-hash oracled as embedding_gram) — kept past the driver budget
    "embedding_pca": q_embedding_pca,
    # rows-only by design (iterative merge loop; pinned vs a naive
    # reference in tests/test_bpe.py) — kept past the driver budget
    "bpe_tokens": q_bpe_tokens,
}

ORACLE_SQL = {
    "build_documents": SQL_BUILD_DOCUMENTS,
    "jsonl_ingest": SQL_JSONL_INGEST,
    "corpus_stats": SQL_CORPUS_STATS,
    "term_stats": SQL_TERM_STATS,
    "index_stats": SQL_INDEX_STATS,
    "postings_probe": SQL_POSTINGS_PROBE,
    "merge_postings": SQL_POSTINGS_PROBE,  # merged index ≡ full-corpus build
    "remove_postings": SQL_REMOVE_POSTINGS,
    "phrase_search": SQL_PHRASE_SEARCH,
    "phrase_limited": SQL_PHRASE_LIMITED,
    "phrase_ranges": SQL_PHRASE_RANGES,
    "bool_search": SQL_BOOL_SEARCH,
    "phrase_snippets": SQL_PHRASE_SNIPPETS,
    "phrase_counts": SQL_PHRASE_COUNTS,
    "bm25_topk": SQL_BM25_TOPK,
    "symbol_search": SQL_SYMBOL_SEARCH,
    "word_occurrences": SQL_WORD_OCCURRENCES,
    "near_search": SQL_NEAR_SEARCH,
    "near_ordered": SQL_NEAR_ORDERED,
    "bm25_words": SQL_BM25_WORDS,
    "fuzzy_words": SQL_FUZZY_WORDS,
    "package_defs": SQL_PACKAGE_DEFS,
    "file_search": SQL_FILE_SEARCH,
    "line_extract": SQL_LINE_EXTRACT,
    "topk_terms": SQL_TOPK_TERMS,
    "topk_words": SQL_TOPK_WORDS,
    "topk_bigrams": SQL_TOPK_BIGRAMS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "line_dedup": SQL_LINE_DEDUP,
    "span_dedup": SQL_SPAN_DEDUP,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_canonical": SQL_DEDUP_CANONICAL,
    "canonical_export": SQL_CANONICAL_EXPORT,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    # dedup_embedding_ivf: engine-defined k-means clustering — rows-only;
    # its deterministic sibling dedup_embedding_grid carries the full oracle
    "dedup_embedding_grid": SQL_DEDUP_EMBEDDING_GRID,
    "knn_cosine": SQL_KNN_COSINE,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
    "knn_quantized": SQL_KNN_QUANTIZED,
    "ann_ivf": SQL_ANN_IVF,
    "lang_id": SQL_LANG_ID,
    "quality": SQL_QUALITY,
    "quality_score": SQL_QUALITY_SCORE,
    "quality_filter": SQL_QUALITY_FILTER,
    "token_counts": SQL_TOKEN_COUNTS,
    "pii_scrub": SQL_PII_SCRUB,
    "fingerprint": SQL_FINGERPRINT,
    "doc_repetition": SQL_DOC_REPETITION,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "assemble_sequences": SQL_ASSEMBLE_SEQUENCES,
    "contamination": SQL_CONTAMINATION,
    "sample_bernoulli": SQL_SAMPLE_BERNOULLI,
    "sample_weighted": SQL_SAMPLE_WEIGHTED,
    "split_assign": SQL_SPLIT_ASSIGN,
    "keyed_split": SQL_KEYED_SPLIT,
    "prefix_terms": SQL_PREFIX_TERMS,
    "prefix_docs": SQL_PREFIX_DOCS,
    "wildcard_terms": SQL_WILDCARD_TERMS,
    "wildcard_docs": SQL_WILDCARD_DOCS,
    "gopher_rules": SQL_GOPHER_RULES,
    "c4_filters": SQL_C4_FILTERS,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "word_cooc": SQL_WORD_COOC,
    "word_cooc_capped": SQL_WORD_COOC_CAPPED,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "dsir_select": SQL_DSIR_SELECT,
    "shuffle_export": SQL_SHUFFLE_EXPORT,
    "embedding_gram": SQL_EMBEDDING_GRAM,
    "sample_exact_n": SQL_SAMPLE_EXACT_N,
    "doc_chunks": SQL_DOC_CHUNKS,
    "events_cm_sketch": SQL_EVENTS_CM_SKETCH,
    "events_cm_estimates": SQL_EVENTS_CM_ESTIMATES,
    "events_retention": SQL_EVENTS_RETENTION,
    "training_export": SQL_TRAINING_EXPORT,
    "events_transitions": SQL_EVENTS_TRANSITIONS,
    "graph_pagerank": SQL_GRAPH_PAGERANK,
    "pricing_rollup": SQL_PRICING_ROLLUP,
    "events_ntile": SQL_EVENTS_NTILE,
    "word_entropy": SQL_WORD_ENTROPY,
    "vocab_zipf": SQL_VOCAB_ZIPF,
    "events_percent_rank": SQL_EVENTS_PERCENT_RANK,
    "market_share": SQL_MARKET_SHARE,
    "orders_bloom": SQL_ORDERS_BLOOM,
    "customer_bloom_hits": SQL_CUSTOMER_BLOOM_HITS,
    "events_mode": SQL_EVENTS_MODE,
    "events_mad": SQL_EVENTS_MAD,
    "events_paths": SQL_EVENTS_PATHS,
    "mix_temperature": SQL_MIX_TEMPERATURE,
    "events_bounce": SQL_EVENTS_BOUNCE,
    "integrity_audit": SQL_INTEGRITY_AUDIT,
    "session_copairs": SQL_SESSION_COPAIRS,
    "customer_rfm": SQL_CUSTOMER_RFM,
    "graph_components": SQL_GRAPH_COMPONENTS,
    "pricing_cube": SQL_PRICING_CUBE,
    "readability": SQL_READABILITY,
    "lineitem_wq": SQL_LINEITEM_WQ,
    "events_latest": SQL_EVENTS_LATEST,
    "graph_triangles": SQL_GRAPH_TRIANGLES,
    "graph_kcore": SQL_GRAPH_KCORE,
    "graph_hits": SQL_GRAPH_HITS,
    "rrf_fusion": SQL_RRF_FUSION,
    "events_outliers": SQL_EVENTS_OUTLIERS,
    "graph_assortativity": SQL_GRAPH_ASSORTATIVITY,
    "events_corr": SQL_EVENTS_CORR,
    "source_drift": SQL_SOURCE_DRIFT,
    "blocklist": SQL_BLOCKLIST,
    "blocklist_multi": SQL_BLOCKLIST,  # same contract, multi-pattern engine
    "semdedup": SQL_SEMDEDUP,
    "bigram_bpw": SQL_BIGRAM_BPW,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "events_stratified": _sql_events_stratified(),
    "mix_sources": SQL_MIX_SOURCES,
    "unigram_bpw": SQL_UNIGRAM_BPW,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "frame_sample": SQL_FRAME_SAMPLE,
    "audio_meta": SQL_AUDIO_META,
    "image_resize": SQL_IMAGE_RESIZE,
    "image_features": SQL_IMAGE_FEATURES,  # integer-derived since r5
    "image_channel_stats": SQL_IMAGE_CHANNEL_STATS,
    "events_tumbling": SQL_EVENTS_TUMBLING,
    "events_hopping": SQL_EVENTS_HOPPING,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_asof": SQL_EVENTS_ASOF,
    "events_rolling": SQL_EVENTS_ROLLING,
    "events_rolling_shuffled": SQL_EVENTS_ROLLING,  # same contract, seed_mode=shuffle
    "events_lag": SQL_EVENTS_LAG,
    "events_lag_shuffled": SQL_EVENTS_LAG,  # same contract, seed_mode=shuffle
    "events_cumsum": SQL_EVENTS_CUMSUM,
    "events_cumsum_shuffled": SQL_EVENTS_CUMSUM_SHUFFLED,
    "events_zscore": SQL_EVENTS_ZSCORE,
    "events_histogram": SQL_EVENTS_HISTOGRAM,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "lineitem_profile": SQL_LINEITEM_PROFILE,
    "events_props_stats": SQL_EVENTS_PROPS_STATS,
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "regex_search": SQL_REGEX_SEARCH,
    "regex_scan": SQL_REGEX_SCAN,
    "orders_enriched": SQL_ORDERS_ENRICHED,
    "lineitem_revenue": SQL_LINEITEM_REVENUE,
    "regional_revenue": SQL_REGIONAL_REVENUE,
    "events_range": SQL_EVENTS_RANGE,
    "orders_topk": SQL_ORDERS_TOPK,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "events_approx_users": _sql_events_approx_users(),
    "events_pivot": SQL_EVENTS_PIVOT,
    "orders_unshipped": SQL_ORDERS_UNSHIPPED,
    "events_distinct": SQL_EVENTS_DISTINCT,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "events_approx_quantiles": _sql_events_approx_quantiles(),
    "events_sorted": SQL_EVENTS_SORTED,
    "corpus_prep": SQL_CORPUS_PREP,
}
