"""Deterministic sampling / dataset splitting for training-data pipelines.

At corpus scale, sampling must be a stateless per-batch filter — no global
pass, no RNG state, no coordination: the keep/assign decision is a pure
function of a row key through the engine's splitmix64 primitive
(functions/hashing.mix64), so the result is identical at any parallelism,
block layout, or resume point, and the DuckDB gate mirrors it bit-exactly
(hashing.sql_hash_expr's mix64 steps).

* :func:`bernoulli_sample` — keep a row iff ``mix64(key ^ salt) < rate·2⁶⁴``.
* :func:`hash_split` — assign every row a split label (train/val/test…)
  by cumulative thresholds over the same hash: a disjoint, exhaustive,
  reshuffle-stable partition of the corpus.

Changing ``salt`` draws an independent sample; the same salt always
reproduces the same subset (the property training pipelines need for
resumable preprocessing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import _sql_mix64, mix64

_U64 = 1 << 64
DEFAULT_SALT = 0x5EED5A17


def _key_hash(batch: pa.Table, key: str, salt: int) -> np.ndarray:
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return mix64(ids ^ np.uint64(salt))


def _threshold(rate: float) -> int:
    # embedded literally in the SQL mirror too — one shared constant, no
    # float re-derivation on the DuckDB side
    return min(_U64, max(0, int(rate * _U64)))


def bernoulli_sample(
    ds: ray.data.Dataset, rate: float, *, key: str = "doc_id", salt: int = DEFAULT_SALT
) -> ray.data.Dataset:
    """Deterministic rate-``rate`` sample: parallelism- and layout-stable."""
    thresh = np.uint64(_threshold(rate))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_key_hash(batch, key, salt) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def _split_edges(fractions: dict[str, float]) -> tuple[list[str], np.ndarray]:
    names = list(fractions)
    cum, edges = 0.0, []
    for n in names[:-1]:
        cum += fractions[n]
        edges.append(_threshold(cum))
    return names, np.array(edges, dtype=np.uint64)


def _split_labels(h: np.ndarray, names: list[str], edge_arr: np.ndarray) -> pa.Array:
    idx = np.searchsorted(edge_arr, h, side="right")
    return pa.array(np.array(names, dtype=object)[idx], type=pa.string())


def hash_split(
    ds: ray.data.Dataset,
    fractions: dict[str, float],
    *,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
    column: str = "split",
) -> ray.data.Dataset:
    """Label every row with a split name; fractions must sum to ≤ 1 (any
    remainder falls into the LAST split, keeping the partition exhaustive)."""
    names, edge_arr = _split_edges(fractions)

    def assign(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, key, salt)
        return batch.append_column(column, _split_labels(h, names, edge_arr))

    return ds.map_batches(assign, batch_format="pyarrow")


def _str_key_hash(batch: pa.Table, key: str, salt: int) -> np.ndarray:
    """uint64 hash of a STRING key column — the chunk-fold splitmix64
    (functions/hashing.hash_bytes_u64) computed zero-copy over the Arrow
    string buffers; the DuckDB mirror is ``sql_hash_expr(key, salt)``."""
    from ..functions.hashing import hash_bytes_u64
    from .encode_stage import _binary_offsets, _binary_values

    col = batch[key].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], type=pa.string())
    col = col.cast(pa.large_string())
    buf = np.frombuffer(_binary_values(col), dtype=np.uint8)
    offs = _binary_offsets(col)
    return hash_bytes_u64(
        buf, offs[:-1].astype(np.int64), np.diff(offs).astype(np.int64), salt=salt
    )


def keyed_split(
    ds: ray.data.Dataset,
    fractions: dict[str, float],
    *,
    group: str,
    salt: int = DEFAULT_SALT,
    column: str = "split",
) -> ray.data.Dataset:
    """LEAKAGE-SAFE split: every row sharing the same STRING ``group`` key
    (domain / repo / author) lands in the same split — assignment is a pure
    function of the group's bytes, so near-duplicate documents from one
    source can never straddle train and test (the contamination mode a
    per-row hash split cannot prevent; cf. the dedup-before-split guidance
    in RefinedWeb/Dolma-style pipelines).

    Same cumulative-threshold rule and contract as :func:`hash_split`:
    stateless per-batch map, ZERO shuffle (no groupby — the hash itself
    co-assigns the group), identical at any parallelism / block layout /
    resume point, and bit-exactly mirrored in SQL via
    ``functions.hashing.sql_hash_expr(group, salt)``."""
    names, edge_arr = _split_edges(fractions)

    def assign(batch: pa.Table) -> pa.Table:
        h = _str_key_hash(batch, group, salt)
        return batch.append_column(column, _split_labels(h, names, edge_arr))

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_key_hash(key_expr: str, salt: int = DEFAULT_SALT) -> str:
    """DuckDB expression bit-identical to :func:`_key_hash` for an int key."""
    return _sql_mix64(f"xor(({key_expr})::UBIGINT, {salt}::UBIGINT)")


def stratified_sample(
    ds: ray.data.Dataset,
    group: str,
    n: int,
    *,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Deterministic n-PER-GROUP sample (per-language / per-class quotas):
    rank rows by ``mix64(key ^ salt)`` and keep each group's ``n`` smallest
    ranks — a uniform without-replacement sample per stratum that is
    reproducible across runs, parallelism, and layout, and mergeable (the
    top-k kernel: each batch ships ≤ n candidate rows per group, never the
    stratum).  Output carries a 1-based ``rank`` column in hash order; a
    different ``salt`` draws an independent sample."""
    import pandas as pd

    from .analytics import topk_per_group

    def rank_col(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        ids = out[key].to_numpy().astype(np.int64).view(np.uint64)
        out["__rank"] = mix64(ids ^ np.uint64(salt))
        return out

    kwargs = {} if num_partitions is None else {"num_partitions": num_partitions}
    out = topk_per_group(
        ds.map_batches(rank_col, batch_format="pandas"),
        group=group,
        order="__rank",
        k=n,
        tie_col=key,
        descending=False,
        **kwargs,
    )
    return out.map_batches(
        lambda b: b.drop(columns="__rank"), batch_format="pandas"
    )


def weighted_sample(
    ds: ray.data.Dataset,
    base_rate: float,
    weight_col: str,
    w_ref: float,
    *,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
) -> ray.data.Dataset:
    """Deterministic WEIGHTED sample: keep probability ∝ a per-row weight
    (the "sample long documents more" knob) — keep a row iff
    ``mix64(key ^ salt) / 2⁶⁴ < clamp(base_rate · w / w_ref, 0, 1)``.

    Same contract as :func:`bernoulli_sample`: stateless per-batch filter,
    identical at any parallelism / layout / resume point, same-salt-same-
    subset.  The hash and the per-row threshold are both compared as IEEE
    doubles on the engine AND oracle sides (identical promotion), so the
    SQL mirror is bit-exact."""
    def keep(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, key, salt).astype(np.float64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.minimum(np.maximum(base_rate * w / w_ref, 0.0), 1.0)
        return batch.filter(pa.array(h < p * float(_U64)))

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_sources(
    ds: ray.data.Dataset,
    weights: dict[str, float],
    *,
    group: str = "source",
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Training-data MIX reweighting: downsample each source/domain so the
    kept rows realize the target proportions ``weights`` exactly, keeping as
    much data as possible (the data-mixing step of a pretraining pipeline).

    Math: with per-group counts ``n_g`` and targets ``w_g``, the largest
    total satisfying every group is ``T = min_g floor(n_g / w_g)``; each
    group keeps its ``floor(T · w_g)`` smallest ``mix64(key ^ salt)`` ranks
    (deterministic, layout-stable, without replacement).  Using integer
    order statistics — not float rate thresholds — keeps the DuckDB mirror
    bit-exact; use exact-binary weights (0.5, 0.25, …) so ``floor`` never
    sits on a float boundary.  Groups not in ``weights`` are dropped; a
    declared group with zero rows makes the mix unsatisfiable (T = 0).

    Scale shape: pass 1 is a combiner-first per-group count (one tiny row
    per group per batch to the driver); pass 2 reuses the mergeable top-k
    kernel — each batch ships at most max_k candidate rows per group, never
    the group.  → (key, group, rank) rows, rank 1-based in hash order.
    """
    import math

    import pandas as pd

    from .analytics import topk_per_group

    names = list(weights)

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(group, sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = (
        ds.map_batches(cnt_partial, batch_format="pandas").to_pandas()
    )
    counts = parts.groupby(group)["n"].sum().to_dict()
    T = min(math.floor(counts.get(g, 0) / weights[g]) for g in names)
    n_keep = {g: math.floor(T * weights[g]) for g in names}
    max_k = max(n_keep.values(), default=0)
    if max_k == 0:
        names = []  # unsatisfiable mix → empty result below

    def rank_col(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch[group].isin(names)].copy()
        ids = out[key].to_numpy().astype(np.int64).view(np.uint64)
        out["__rank"] = mix64(ids ^ np.uint64(salt))
        return out

    kwargs = {} if num_partitions is None else {"num_partitions": num_partitions}
    ranked = topk_per_group(
        ds.map_batches(rank_col, batch_format="pandas"),
        group=group,
        order="__rank",
        k=max(max_k, 1),
        tie_col=key,
        descending=False,
        **kwargs,
    )

    def trim(b: pd.DataFrame) -> pd.DataFrame:
        cut = b[group].map(n_keep).fillna(0).to_numpy(dtype=np.int64)
        out = b[b["rank"].to_numpy() <= cut]
        return out.drop(columns="__rank")

    return ranked.map_batches(trim, batch_format="pandas")


def shuffle_export(
    ds: ray.data.Dataset,
    *,
    shards: int,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
) -> ray.data.Dataset:
    """Deterministic GLOBAL shuffle for training-shard export — the final
    step of every training-data pipeline: assign each row a shard and a
    position such that reading shards in order yields a fixed pseudo-random
    permutation of the corpus.

    Shard and position are pure functions of ``mix64(key ^ salt)`` (shard =
    h % shards; position = rank of (h, key) within the shard), so the
    permutation is identical at any parallelism, block layout, or resume
    point — rerunning after a failure reproduces every shard byte-for-byte
    (no ``random_shuffle`` nondeterminism), and the DuckDB mirror is
    ``row_number() OVER (PARTITION BY shard ORDER BY h, key)``.

    SCALE: ONE hash shuffle (groupby shard); ranks are a per-shard lexsort.
    Contract: one shard's rows fit a worker — shards is chosen as
    corpus_rows / rows_per_output_file, which is exactly the training-shard
    file-size contract (e.g. 100 TB / 1 GB files = 10⁵ shards), so the
    bound holds by construction.  Hash keys are uniform, so shard skew is
    binomial-tight.  → (key…, shard, pos) rows, pos 0-based within shard.
    """

    def assign(batch: pa.Table) -> pa.Table:
        # drop parquet/pandas schema metadata: the sort's reduce phase
        # tries to hash schemas for deduplication and warns on the
        # (unhashable) metadata dict every merge — pure log spam
        batch = batch.replace_schema_metadata(None)
        h = _key_hash(batch, key, salt)
        batch = batch.append_column("__h", pa.array(h.astype(np.uint64), type=pa.uint64()))
        return batch.append_column(
            "shard", pa.array((h % np.uint64(shards)).astype(np.int64), type=pa.int64())
        )

    def rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    "shard": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                }
            )
        h = g["__h"].to_numpy(zero_copy_only=False)
        ids = g[key].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return pa.table(
            {
                key: pa.array(ids, type=pa.int64()),
                "shard": g["shard"],
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pyarrow")
    )


def exact_n_sample(
    ds: ray.data.Dataset,
    n: int,
    *,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
) -> "pd.DataFrame":
    """GLOBAL exact-``n`` uniform sample without replacement: the ``n``
    smallest ``mix64(key ^ salt)`` ranks (ties break ascending on the key).
    Unlike :func:`bernoulli_sample` the size is exact, and unlike a
    reservoir it is deterministic and layout/resume-stable — the same salt
    always picks the same rows.

    SCALE: per-batch bottom-``n`` partials bound the driver merge at
    n·blocks rows (the sum_topk contract); the corpus never moves."""
    import pandas as pd

    def head(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, key, salt)
        order = np.lexsort((batch[key].to_numpy(zero_copy_only=False), h))[:n]
        out = batch.take(pa.array(order))
        return out.append_column("__h", pa.array(h[order].astype(np.uint64), type=pa.uint64()))

    cand = ds.map_batches(head, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["__h", key]).head(n)
    return cand.drop(columns="__h").reset_index(drop=True)


def mix_temperature(
    ds: ray.data.Dataset,
    n_out: int,
    *,
    group: str = "source",
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Temperature-scaled source mixing (the multinomial τ-sampling of
    multilingual/multi-domain pretraining, τ = 0.5): per-source quotas
    ∝ √count — upweights small sources relative to proportional mixing —
    realized as deterministic hash-rank selection.

    τ is FIXED at 0.5 because IEEE sqrt is correctly rounded (a general
    ``pow`` is not), so the weight quantization
    ``w = floor(sqrt(n)·1e6 + 0.5)`` and the integer quota
    ``min(n, n_out·w // Σw)`` are bit-exact against the SQL mirror.

    Scale shape: identical to :func:`mix_sources` — a combiner-first count
    pass (one row per source per batch), then the mergeable bottom-k
    kernel (≤ max-quota candidate rows per source per batch, never the
    corpus).  → (key, group, rank) rows."""
    import pandas as pd

    from .analytics import topk_per_group

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(group, sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = ds.map_batches(cnt_partial, batch_format="pandas").to_pandas()
    counts = parts.groupby(group)["n"].sum().to_dict()  # dimension-scale
    w = {
        g: int(np.floor(np.sqrt(np.float64(n)) * 1e6 + 0.5)) for g, n in counts.items()
    }
    tot_w = sum(w.values())
    n_keep = {g: min(counts[g], n_out * w[g] // tot_w) for g in counts}
    max_k = max(n_keep.values(), default=0)

    def rank_col(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        ids = out[key].to_numpy().astype(np.int64).view(np.uint64)
        out["__rank"] = mix64(ids ^ np.uint64(salt))
        return out

    kwargs = {} if num_partitions is None else {"num_partitions": num_partitions}
    ranked = topk_per_group(
        ds.map_batches(rank_col, batch_format="pandas"),
        group=group,
        order="__rank",
        k=max(max_k, 1),
        tie_col=key,
        descending=False,
        **kwargs,
    )

    def trim(b: pd.DataFrame) -> pd.DataFrame:
        cut = b[group].map(n_keep).fillna(0).to_numpy(dtype=np.int64)
        out = b[b["rank"].to_numpy() <= cut]
        return out.drop(columns="__rank")

    return ranked.map_batches(trim, batch_format="pandas")
