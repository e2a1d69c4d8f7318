"""Distributed index integrity verification.

The reference asserts per-list invariants with ``CheckCorruption``
(/root/reference/lib/invertedindex/postinglist.go:96-106: strictly
ascending doc ids).  This is the Ray-Data-native whole-index equivalent:
one ``map_batches`` sweep over the segments dataset decodes every posting
list with the SAME codec the query path uses and checks, per (term, chunk)
row:

* strictly ascending doc ids within the chunk (the reference invariant);
* every doc id inside the chunk's doc range;
* df == decoded entry count; cf == Σ tf; first_doc == decoded first id;
* per-doc positions strictly ascending, count == tf;
* position byte lengths consistent with the pos blob size;
* block metadata aligned (#blocks == ceil(df / 128), last block ends at
  the last doc).

Cross-row checks (driver-side over the tiny per-batch summaries): every
(term, chunk) pair unique across the index, manifest doc count == docmeta
rows.  CLI: ``python -m searty_ray verify -d INDEX_DIR``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.codec import decode_meta_blob, decode_pos_blob, varint_decode
from ..state.manifest import Manifest


def _verify_batch(batch: pa.Table, chunk_span: int, block_docs: int = 128) -> pa.Table:
    """→ one summary row per input row: (term_key, chunk, n_errors, first_error)."""
    n = len(batch)
    errs: list[str] = [""] * n
    nerr = np.zeros(n, dtype=np.int64)

    def fail(i: int, msg: str) -> None:
        nerr[i] += 1
        if not errs[i]:
            errs[i] = msg

    tk = batch["term_key"].to_numpy(zero_copy_only=False)
    chunk = batch["chunk"].to_numpy(zero_copy_only=False)
    df = batch["df"].to_numpy(zero_copy_only=False)
    cf = batch["cf"].to_numpy(zero_copy_only=False)
    first_doc = batch["first_doc"].to_numpy(zero_copy_only=False)
    meta = batch["meta_blob"]
    posb = batch["pos_blob"]
    poslen = batch["pos_len_blob"]
    bld = batch["block_last_doc"]
    for i in range(n):
        base = int(chunk[i]) * chunk_span
        docs, tfs = decode_meta_blob(meta[i].as_py(), first_doc_base=base)
        if len(docs) != df[i]:
            fail(i, f"df {df[i]} != decoded {len(docs)}")
            continue
        if int(tfs.sum()) != cf[i]:
            fail(i, f"cf {cf[i]} != sum(tf) {int(tfs.sum())}")
        if len(docs) and int(docs[0]) != first_doc[i]:
            fail(i, f"first_doc {first_doc[i]} != {int(docs[0])}")
        if len(docs) > 1 and not (np.diff(docs) > 0).all():
            fail(i, "doc ids not strictly ascending")  # postinglist.go:96-106
        if len(docs) and not ((docs // chunk_span) == chunk[i]).all():
            fail(i, "doc id outside chunk range")
        pls = varint_decode(poslen[i].as_py()).astype(np.int64)
        raw = posb[i].as_py()
        if len(pls) != len(docs):
            fail(i, "pos_len count != df")
        elif int(pls.sum()) != len(raw):
            fail(i, "pos byte lengths != pos blob size")
        else:
            pos = decode_pos_blob(raw, tfs)
            if len(pos) != int(tfs.sum()):
                fail(i, "position count != cf")
            else:
                off = np.cumsum(tfs)[:-1]
                for pp in np.split(pos, off):
                    if len(pp) > 1 and not (np.diff(pp) > 0).all():
                        fail(i, "positions not strictly ascending")
                        break
        nblk = len(bld[i])
        want_blk = (int(df[i]) + block_docs - 1) // block_docs
        if nblk != want_blk:
            fail(i, f"#blocks {nblk} != {want_blk}")
        elif nblk and int(bld[i][nblk - 1].as_py()) != int(docs[-1]):
            fail(i, "last block_last_doc != last doc")
    return pa.table(
        {
            "term_key": batch["term_key"],
            "chunk": batch["chunk"],
            "n_errors": pa.array(nerr, type=pa.int64()),
            "first_error": pa.array(errs, type=pa.string()),
        }
    )


def verify_index(index_dir: str) -> dict:
    """Full-index verification as a streaming Ray pipeline; returns a summary
    dict {rows, errors, first_errors, docmeta_ok, dup_term_chunk}."""
    m = Manifest.load(index_dir)
    seg = ray.data.read_parquet(os.path.join(index_dir, "segments"))
    out = seg.map_batches(
        lambda b: _verify_batch(b, m.chunk_span), batch_format="pyarrow"
    )
    rows = 0
    errors = 0
    firsts: list[str] = []
    seen: set[tuple[int, int]] = set()
    dup = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        rows += len(b)
        ne = b["n_errors"].to_numpy()
        errors += int(ne.sum())
        for e in b.filter(pa.compute.greater(b["n_errors"], 0))["first_error"].to_pylist():
            if len(firsts) < 10:
                firsts.append(e)
        for t, c in zip(b["term_key"].to_numpy(), b["chunk"].to_numpy()):
            key = (int(t), int(c))
            if key in seen:
                dup += 1
            seen.add(key)
    import pyarrow.parquet as pq

    n_meta = pq.read_table(os.path.join(index_dir, "docmeta"), columns=["doc_id"]).num_rows
    return {
        "rows": rows,
        "errors": errors,
        "first_errors": firsts,
        "dup_term_chunk": dup,
        "docmeta_rows": n_meta,
        "docmeta_ok": n_meta == m.n_docs,
        "ok": errors == 0 and dup == 0 and n_meta == m.n_docs,
    }
