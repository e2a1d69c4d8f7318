"""Connected components over duplicate-candidate pairs → cluster ids, and
the canonical-keep filter built on top of them.

The missing last step of every near-dup pipeline (MinHash / SimHash /
embedding near-dup all emit PAIRS): transitively close the pairs into
components and keep one canonical document per component
(``cluster_id`` = min doc_id in the component — deterministic, so reruns
and the SQL oracle agree).

Algorithm: **Hash-to-Min** (Rastogi et al. 2013, "Finding Connected
Components in Map-Reduce in Logarithmic Rounds").  State is an edge set
``(u, v)`` meaning "v ∈ C(u)", initialised to the symmetrised pairs plus
self-loops.  Each round, per node u with m = min C(u):

* emit ``(m, v)`` for every v ∈ C(u)  — the minimum learns u's whole set;
* emit ``(v, m)`` for every v ∈ C(u)  — every member learns the minimum.

Converges in O(log d) rounds (d = component diameter) to C(root) = the
component and C(member) = {root}; labels = per-u min.

Scale shape: the edge set is CANDIDATE-PAIR-sized (LSH output), orders of
magnitude smaller than the corpus, and never touches the driver.  Each
round is ONE hash shuffle of the edges over ``num_partitions`` coarse
partitions (pgrp = hash(u) % P — all rows of a node co-locate, so the
per-partition dedup + min are globally correct for that node) with the
star step fully vectorized inside the partition (lexsort + reduceat-style
gather, no per-node Python).  Each round's output is ``materialize()``d:
re-executing a lazy lineage every round would be quadratic, and the edge
set is bounded by O(pairs · log) — object-store-sized, not driver-sized.
Convergence is detected by a per-partition label-signature aggregate (two
scalars per partition reach the driver, never the labels themselves);
duplicate-cluster graphs from LSH are near-cliques, so 2-3 rounds in
practice.

Reference parity note: the reference engine has no clustering operator —
this is net-new training-data surface (driver instructions: dedup as a
first-class component), layered on the pair emitters in stages/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.hashing import mix64
from .analytics import _pk_any
from .joins import NUM_PARTITIONS

MAX_ROUNDS = 30


def _empty_clusters() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "cluster_id": pd.Series([], dtype="int64")}
    )


def _init_edges(b: pd.DataFrame) -> pd.DataFrame:
    """Symmetrise pairs and add self-loops (so min C(u) includes u)."""
    a = b["doc_id_a"].to_numpy(dtype=np.int64)
    c = b["doc_id_b"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "u": np.concatenate([a, c, a, c]),
            "v": np.concatenate([c, a, a, c]),
        }
    )


#: sentinel node ids carrying the per-partition convergence signature inside
#: the edge stream itself (doc ids are non-negative) — fused into the star
#: pass so each round costs ONE shuffle, not a second signature exchange
_SENT_N = np.int64(-1)
_SENT_H = np.int64(-2)


def _group_mins(part: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Dedup a u-partition and return (u, v, per-row group-min, group starts).

    The partition holds EVERY row of each of its u values (pgrp is a pure
    function of u), so the dedup and min are globally correct per node.
    Sentinel signature rows (u < 0) from the previous round are dropped.
    """
    df = part.loc[part["u"] >= 0, ["u", "v"]].drop_duplicates()
    u = df["u"].to_numpy(dtype=np.int64)
    v = df["v"].to_numpy(dtype=np.int64)
    order = np.lexsort((v, u))
    u = u[order]
    v = v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(u) else np.array([], dtype=np.int64)
    counts = np.diff(np.r_[starts, len(u)]) if len(u) else np.array([], dtype=np.int64)
    m = np.repeat(v[starts], counts) if len(u) else v
    return u, v, m, starts


def _star(part: pd.DataFrame) -> pd.DataFrame:
    u, v, m, starts = _group_mins(part)
    # hash-to-min emissions (see module docstring); locally deduped — the
    # cross-partition dedup happens in the NEXT round's _group_mins
    out = pd.DataFrame(
        {"u": np.concatenate([m, v]), "v": np.concatenate([v, m])}
    ).drop_duplicates()
    # convergence signature of THIS round's input labels, carried as two
    # sentinel rows — the driver folds them with a map-only pass, so no
    # second shuffle is ever needed
    if len(starts):
        gu = u[starts].astype(np.uint64)
        gl = m[starts].astype(np.uint64)
        h = np.int64(mix64(gu ^ mix64(gl)).sum(dtype=np.uint64).astype(np.int64))
        n = np.int64(len(starts))
    else:
        h = n = np.int64(0)
    sent = pd.DataFrame({"u": [_SENT_N, _SENT_H], "v": [n, h]})
    return pd.concat([out, sent], ignore_index=True)


def _labels(part: pd.DataFrame) -> pd.DataFrame:
    u, _, m, starts = _group_mins(part)
    if len(u) == 0:
        return _empty_clusters()
    return pd.DataFrame({"doc_id": u[starts], "cluster_id": m[starts]})


def _add_pgrp(b: pd.DataFrame, num_partitions: int) -> pd.DataFrame:
    b = b.copy()
    b["pgrp"] = _pk_any(b["u"], num_partitions)
    return b


def _by_node(edges: ray.data.Dataset, fn, num_partitions: int) -> ray.data.Dataset:
    return (
        edges.map_batches(
            lambda b: _add_pgrp(b, num_partitions), batch_format="pandas"
        )
        .groupby("pgrp")
        .map_groups(lambda g: fn(g), batch_format="pandas")
    )


def duplicate_clusters(
    pairs: ray.data.Dataset | pd.DataFrame,
    num_partitions: int = NUM_PARTITIONS,
    max_rounds: int = MAX_ROUNDS,
) -> ray.data.Dataset:
    """(doc_id, cluster_id) for every doc appearing in ``pairs``;
    cluster_id = min doc_id of its connected component."""
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return ray.data.from_pandas(_empty_clusters())
        pairs = ray.data.from_pandas(
            pairs[["doc_id_a", "doc_id_b"]].reset_index(drop=True)
        )

    edges = pairs.map_batches(_init_edges, batch_format="pandas").materialize()
    if edges.count() == 0:
        return ray.data.from_pandas(_empty_clusters())

    prev_sig: tuple[int, int] | None = None
    stable = 0
    for _ in range(max_rounds):
        edges = _by_node(edges, _star, num_partitions).materialize()
        # fold the sentinel signature rows: a map-only filter over the
        # materialized edges (wraps deterministically on int64 — only
        # equality between rounds matters)
        sig_df = edges.map_batches(
            lambda b: b[b["u"] < 0], batch_format="pandas"
        ).to_pandas()
        with np.errstate(over="ignore"):
            sig = (
                int(sig_df.loc[sig_df["u"] == _SENT_N, "v"].to_numpy().sum()),
                int(sig_df.loc[sig_df["u"] == _SENT_H, "v"].to_numpy(np.int64).view(np.uint64).sum(dtype=np.uint64)),
            )
        if sig == prev_sig:
            stable += 1
            # two consecutive identical label signatures → labels are at the
            # hash-to-min fixpoint (labels are monotone non-increasing, so a
            # stable signature means no label moved)
            if stable >= 2:
                break
        else:
            stable = 0
        prev_sig = sig
    return _by_node(edges, _labels, num_partitions)


def canonical_filter(
    docs: ray.data.Dataset,
    clusters: ray.data.Dataset | pd.DataFrame,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Drop every non-canonical cluster member from ``docs`` (keep rows whose
    id is not in clusters, plus each cluster's canonical min-id row).

    The drop-set is candidate-pair-sized (≪ corpus), so it is broadcast via
    ``ray.put`` once and read by every filter task — no shuffle of the
    corpus; documents stream straight through a vectorized isin filter.
    """
    if isinstance(clusters, ray.data.Dataset):
        clusters = clusters.to_pandas()  # candidate-sized by contract
    drop = clusters.loc[
        clusters["doc_id"] != clusters["cluster_id"], "doc_id"
    ].to_numpy(dtype=np.int64)
    drop_ref = ray.put(np.sort(drop))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        if len(d) == 0:
            return b
        ids = b[id_col].to_numpy(dtype=np.int64)
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return b[d[pos] != ids]

    return docs.map_batches(keep, batch_format="pandas")
