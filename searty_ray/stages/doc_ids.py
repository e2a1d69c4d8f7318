"""Deterministic global doc-id assignment (SURVEY.md §7 hard part #1).

The reference gets doc ids for free from SQLite AUTOINCREMENT
(database.go:112); under parallelism we provide two modes:

* ``sort`` (default, searty-equivalent dense ids): global
  ``sort(repo, path, commit)`` then a per-block row-count prefix sum.  The
  prefix sum is driver-coordinated over block *metadata* (row counts only —
  O(#blocks), not O(rows)), with the per-block id-attach running as Ray
  tasks.  This is one of the few places the Dataset API genuinely can't
  express the semantics (ordinal assignment), so we drop to raw Ray on the
  materialized sorted blocks; stable across parallelism levels because the
  sort key is a total order over rows.

* ``hash``: content-address ids ``mix64-cascade(sha1(repo␀path␀commit))``
  truncated to 63 bits — no sort, no coordination, the scale path when dense
  ids aren't required.  Collision probability at 10^12 rows ≈ 5e-5 per
  build; callers needing exactness use ``sort``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _count_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _attach_ids(t: pa.Table, offset: int) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64), type=pa.int64())
    return t.add_column(0, "doc_id", ids)


def assign_doc_ids(ds: ray.data.Dataset, mode: str = "sort") -> ray.data.Dataset:
    if "doc_id" in ds.schema().names:
        return ds
    if mode == "hash":
        return ds.map_batches(_hash_ids_batch, batch_format="pyarrow")
    sorted_ds = ds.sort(["repo", "path", "commit"]).materialize()
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    new_refs = [_attach_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(new_refs)


def _hash_ids_batch(batch: pa.Table) -> pa.Table:
    ids = np.empty(len(batch), dtype=np.int64)
    repo, path, commit = (batch[c].to_pylist() for c in ("repo", "path", "commit"))
    for i, (r, p, c) in enumerate(zip(repo, path, commit)):
        h = hashlib.sha1(f"{r}\0{p}\0{c}".encode()).digest()
        ids[i] = int.from_bytes(h[:8], "big") & 0x7FFFFFFFFFFFFFFF
    return batch.add_column(0, "doc_id", pa.array(ids, type=pa.int64()))
