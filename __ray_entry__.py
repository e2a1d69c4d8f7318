"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in searty_ray) calls ray.init()/ray.shutdown().

* ``entry()`` — flagship pipeline at sf0.001: derive the corpus table from
  ``documents``, build the full trigram/BM25 inverted index (streaming
  map_batches → groupby(term,chunk) shuffle → encoded segment partitions),
  then run a mixed query batch (phrase / ranked / symbol / file) through the
  actor-pool query engine and return the per-query result table.
* ``queries()`` / ``oracle_sql()`` — one entry per operator from
  SURVEY.md §2 + the training-data ops; implementations and SQL mirrors
  live in searty_ray/pipelines/gate.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import ray.data

    from searty_ray.pipelines.gate import _ensure_index
    from searty_ray.query import QueryEngine

    sf_dir = "/root/testdata/sf0.001"
    index_dir = _ensure_index(sf_dir)

    query_rows = [
        {"query_id": 0, "kind": "phrase", "query": "merge part", "k": 10},
        {"query_id": 1, "kind": "phrase", "query": "defun doc-1 ", "k": 10},
        {"query_id": 2, "kind": "ranked", "query": "merge join", "k": 10},
        {"query_id": 3, "kind": "ranked", "query": "window batch stream", "k": 10},
        {"query_id": 7, "kind": "ranked_words", "query": "merge join window", "k": 10},
        {"query_id": 8, "kind": "bool", "query": '+"merge part" window stream -customer', "k": 10},
        {"query_id": 4, "kind": "symbol", "query": "doc-7", "k": 10},
        {"query_id": 5, "kind": "symbol", "query": "src0::doc-0", "k": 10},
        {"query_id": 6, "kind": "file", "query": "doc_1", "k": 10},
        {"query_id": 9, "kind": "near", "query": "merge sort", "k": 12},
        {"query_id": 10, "kind": "wildcard", "query": "*er", "k": 10},
    ]
    qds = ray.data.from_items(query_rows)
    return qds.map_batches(
        QueryEngine,
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
        fn_constructor_kwargs={"index_dir": index_dir},
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from searty_ray.pipelines.gate import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from searty_ray.pipelines.gate import ORACLE_SQL

    return dict(ORACLE_SQL)
