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

* ``hash``: content-address ids — a vectorized splitmix64 cascade over the
  ``repo␀path␀commit`` key bytes (one ``mix64`` column pass per byte of the
  longest key in the batch, all rows at once) truncated to 63 bits — no
  sort, no coordination, the scale path when dense ids aren't required.
  Collision probability at 10^12 rows ≈ 5e-5 per build; callers needing
  exactness use ``sort``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import gather_padded, mix64


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
    import pyarrow.compute as pc

    keys = pc.binary_join_element_wise(
        batch["repo"], batch["path"], batch["commit"], "\0"
    ).cast(pa.large_binary())
    # pad keys to the batch max length and mix column-by-column: ≤ max_len
    # vectorized passes over all rows instead of a per-row digest loop
    n = len(batch)
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    lens = np.diff(offs)
    width = int(lens.max()) if n else 0
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    mat = gather_padded(buf, offs[:-1], lens, width)
    h = mix64(lens.astype(np.uint64))  # length seed keeps prefixes distinct
    # Mix only real key bytes per row (rows shorter than the batch max must
    # NOT absorb padding rounds, or the id would depend on batch composition).
    for j in range(width):
        sel = lens > j
        h[sel] = mix64(h[sel] ^ mat[sel, j].astype(np.uint64))
    ids = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return batch.add_column(0, "doc_id", pa.array(ids, type=pa.int64()))
