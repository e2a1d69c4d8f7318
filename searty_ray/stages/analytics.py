"""Grouped analytics operators with scale-first shapes.

* :func:`topk_per_group` — top-k rows per key by a value column.  Per-batch
  PARTIAL top-k first (each batch keeps ≤ k rows per key it sees — a
  combiner, so the shuffle moves at most k·keys_per_batch rows, never the
  corpus), then ONE hash shuffle over coarse partitions and a final
  vectorized head-k per key.  Deterministic: ties break on ``tie_col``.
* :func:`distinct_per_group` — count(distinct value) per key.  Per-batch
  dedup of (key, value) pairs first (the combiner — only distinct pairs
  shuffle), then a per-partition global dedup + vectorized value_counts.
* :func:`group_quantiles` — exact linear-interpolation quantiles per key
  (numpy 'linear' == DuckDB ``quantile_cont``).  Exact quantiles need a
  key's full value set in one place: ONE hash shuffle on the key over
  coarse partitions, per-partition vectorized sort + interpolation.

PARTITIONING ASSUMPTION (quantiles): one key's rows fit one partition —
true for dimension-cardinality keys (event_type, language, label).  For
billion-value keys switch to a mergeable sketch (t-digest / KLL); exact
and sketched must not silently swap, so that is a different function.

All three group by a coarse ``pk = hash(key) % num_partitions`` and do
per-key work vectorized INSIDE the partition (NOTES.md: per-group overhead
is ~0.7 ms — pay it per partition, not per key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .joins import NUM_PARTITIONS, _MIX


def _pk_any(keys: pd.Series, num_partitions: int) -> np.ndarray:
    """Coarse partition id for int-like or string keys."""
    if pd.api.types.is_integer_dtype(keys):
        k = keys.to_numpy().astype(np.int64).view(np.uint64)
    else:
        # factorize is a C pass; partition on the code — co-location only
        # needs same-key-same-partition WITHIN this batch's tag, which a
        # value-stable hash gives; use pandas' stable utf8 hash
        k = pd.util.hash_array(keys.to_numpy(dtype=object)).astype(np.uint64)
    return ((k * _MIX) >> np.uint64(40)).astype(np.int64) % num_partitions


def _head_k_per_key(
    df: pd.DataFrame, group: list[str], order: str, k: int, tie: str, ascending: bool
) -> pd.DataFrame:
    s = df.sort_values(
        [*group, order, tie], ascending=[True] * len(group) + [ascending, True],
        kind="mergesort",
    )
    return s.groupby(group, sort=False, observed=True).head(k)


def topk_per_group(
    ds: ray.data.Dataset,
    group: str | list[str],
    order: str,
    k: int,
    tie_col: str,
    descending: bool = True,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Top-``k`` rows per ``group`` by ``order`` (desc by default), with a
    ``rank`` column (1-based).  Ties break ascending on ``tie_col`` so the
    result is unique — the same ROW_NUMBER() OVER (PARTITION BY … ORDER BY
    order DESC, tie ASC) ≤ k a SQL engine computes."""
    group = [group] if isinstance(group, str) else list(group)
    asc = not descending

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = _head_k_per_key(batch, group, order, k, tie_col, asc)
        out = out.copy()
        out["__pk"] = _pk_any(out[group[0]], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = _head_k_per_key(g, group, order, k, tie_col, asc).drop(columns="__pk")
        out["rank"] = out.groupby(group, sort=False, observed=True).cumcount() + 1
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def distinct_per_group(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Exact count(distinct value) per group — combiner-first so only
    distinct (group, value) pairs ever shuffle."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[group, value]].drop_duplicates()
        out = out.copy()
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        counts = (
            g[[group, value]].drop_duplicates().groupby(group, sort=False)[value].size()
        )
        return pd.DataFrame({group: counts.index, "n_distinct": counts.to_numpy(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def sum_topk(
    ds: ray.data.Dataset,
    group: str | list[str],
    value: str,
    k: int,
    tie_col: str,
    num_partitions: int = NUM_PARTITIONS,
) -> pd.DataFrame:
    """GLOBAL top-``k`` groups by ``sum(value)`` — the "top URLs by bytes
    at 100 TB" shape.  Three-level reduction so group cardinality never
    concentrates: (1) per-batch partial sums (combiner — at most one row
    per group PER BATCH shuffles, never the raw rows), (2) ONE hash
    shuffle of partials over coarse partitions keyed on ``group[0]`` with
    per-partition exact sums + local top-k, (3) driver merges the
    ≤ k·num_partitions candidate rows (contract-small).  Extra columns in
    ``group`` ride along as composite key parts (functional dependents of
    the first key, e.g. a dimension attribute carried through a join).
    Ties break ascending on ``tie_col`` for a deterministic result."""
    group = [group] if isinstance(group, str) else list(group)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby(group, sort=False, as_index=False, observed=True)[value].sum()
        out["__pk"] = _pk_any(out[group[0]], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        sums = g.groupby(group, sort=False, as_index=False, observed=True)[value].sum()
        return sums.sort_values([value, tie_col], ascending=[False, True]).head(k)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values([value, tie_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def pivot_counts(
    ds: ray.data.Dataset,
    group: str,
    cat: str,
    categories: list[str],
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Wide conditional aggregate (the feature-engineering pivot): one row
    per ``group``, one ``n_<category>`` count column per declared category.

    Categories are DECLARED, not discovered — a distributed pipeline's
    output schema cannot depend on a mid-stream data scan (blocks must
    agree on schema before the shuffle); rows with undeclared categories
    simply count toward no column.  Combiner-first: each batch collapses
    to ≤ one partial row per group it sees (counts are already summed
    wide), so the shuffle moves partials, never events."""
    cols = [f"n_{c}" for c in categories]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.DataFrame({group: batch[group]})
        cv = batch[cat].to_numpy()
        for c, name in zip(categories, cols):
            m[name] = (cv == c).astype(np.int64)
        out = m.groupby(group, sort=False, as_index=False, observed=True).sum()
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g[[group, *cols]].groupby(group, sort=False, as_index=False, observed=True).sum()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


KMV_K = 64


def approx_distinct_per_group(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    k: int = KMV_K,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Approximate count(distinct value) per group via a KMV (k-minimum-
    values) sketch — the MERGEABLE scale path :func:`distinct_per_group`'s
    docstring promises for billion-value keys, where shipping every
    distinct (group, value) pair is itself the bottleneck.

    Sketch: hash each value with the deterministic splitmix64 ``mix64``;
    a group's sketch is its ``k`` smallest distinct hashes.  Sketches
    merge by union + re-truncate (k smallest of a union of per-part
    k-smallest IS the global k-smallest), so the combiner shuffles at
    most k rows per group per batch regardless of value cardinality.
    Estimator (integer-exact on both sides of the oracle): if a group's
    merged sketch holds fewer than k hashes the count is EXACT (nothing
    was ever truncated); otherwise ``(k-1) * 2^64 // kth_smallest`` —
    standard KMV, relative error ~1/sqrt(k-2).

    Deterministic given the hash, so the FULL pipeline carries a DuckDB
    value-hash oracle (``sql_mix64_expr`` + window re-derivation) — unlike
    HLL-class sketches whose register layout is engine-defined.

    ``value`` must be integer-typed (hashed via mix64; use
    ``hash_bytes_u64`` upstream for strings)."""
    from ..functions.hashing import mix64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[[group, value]].drop_duplicates()
        hv = mix64(d[value].to_numpy().astype(np.int64).view(np.uint64))
        out = pd.DataFrame({group: d[group].to_numpy(), "hv": hv})
        out = out.sort_values([group, "hv"], kind="mergesort")
        out = out.groupby(group, sort=False, observed=True).head(k)
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g[[group, "hv"]]
            .drop_duplicates()
            .sort_values([group, "hv"], kind="mergesort")
            .reset_index(drop=True)
        )
        gb = d.groupby(group, sort=False, observed=True)
        rn = gb.cumcount().to_numpy() + 1
        cnt = gb["hv"].transform("size").to_numpy()
        pick = d[rn == np.minimum(cnt, k)].reset_index(drop=True)
        cnt_pick = cnt[rn == np.minimum(cnt, k)]
        est = np.empty(len(pick), dtype=np.int64)
        for i, (c, h) in enumerate(zip(cnt_pick, pick["hv"].to_numpy())):
            est[i] = int(c) if c < k else (k - 1) * (1 << 64) // max(int(h), 1)
        return pd.DataFrame({group: pick[group], "approx_distinct": est})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def group_quantiles(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Exact per-group quantiles (linear interpolation — DuckDB
    ``quantile_cont`` semantics).  One hash shuffle; see the module
    docstring for the partitioning assumption and the sketch escape hatch."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[group, value]].copy()
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    names = [f"q{round(q * 100)}" for q in qs]  # round: int() truncates 0.29*100 -> 28

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, vals in g.groupby(group, sort=False)[value]:
            arr = np.sort(vals.to_numpy(np.float64))
            rows.append((key, *np.quantile(arr, qs, method="linear")))
        return pd.DataFrame(rows, columns=[group, *names])

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def zscore_normalize(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Per-group z-score feature normalization: (v − mean_g) / stddev_g
    (sample stddev, SQL ``stddev_samp``); z = NaN (SQL NULL) for groups of
    one.  Two passes, moments-first:

    1. per-batch partial moments (n, Σv, Σv²) — the combiner, so the
       moment shuffle is one row per (group, batch); a tiny per-group
       moment table reaches the driver and broadcasts via ``ray.put``;
    2. the data streams once through a vectorized normalize map — the
       corpus itself never shuffles.
    """
    import ray as _ray

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value].to_numpy(dtype=np.float64)
        g = pd.DataFrame({group: b[group], "v": v, "v2": v * v})
        out = g.groupby(group, sort=False, as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        )
        return out.astype({"n": "int64"})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(group, sort=False, as_index=False)[["n", "s", "s2"]].sum()

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__pk"] = _pk_any(b[group], num_partitions)
        return b

    moments = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(lambda g: merge(g.drop(columns="__pk")), batch_format="pandas")
        .to_pandas()  # one row per group — dimension-scale
    )
    n = moments["n"].to_numpy(dtype=np.float64)
    mean = moments["s"].to_numpy() / n
    # sample variance from raw moments; clamp the tiny negative residue
    # cancellation can leave so sqrt never NaNs a legitimate zero-variance
    var = np.maximum((moments["s2"].to_numpy() - n * mean * mean), 0.0) / np.maximum(n - 1, 1)
    sd = np.sqrt(var)
    sd[n < 2] = np.nan
    stats_ref = _ray.put(
        (
            dict(zip(moments[group], mean)),
            dict(zip(moments[group], sd)),
        )
    )

    def normalize(b: pd.DataFrame) -> pd.DataFrame:
        mean_by, sd_by = _ray.get(stats_ref)
        # Series.map(dict) is the C-level lookup path (no per-row lambda)
        ms = b[group].map(mean_by).to_numpy(dtype=np.float64)
        sds = b[group].map(sd_by).to_numpy(dtype=np.float64)
        out = b.copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (b[value].to_numpy(dtype=np.float64) - ms) / sds
        z[sds == 0.0] = np.nan
        out["z"] = z
        return out

    return ds.map_batches(normalize, batch_format="pandas")


def histogram(
    ds: ray.data.Dataset,
    value: str,
    lo: float,
    hi: float,
    bins: int,
    group: str | None = None,
) -> ray.data.Dataset:
    """Fixed-width histogram of ``value`` over [lo, hi) (underflow → bin 0,
    overflow → bin ``bins-1``), optionally per ``group``.  Combiner-first:
    per-batch ``np.bincount`` partials (≤ bins rows per batch), then one
    tiny groupby-sum — bin ids are integers, so the result is exact."""
    from ray.data.aggregate import Sum

    width = (hi - lo) / bins

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)  # nulls are EXCLUDED, not binned: NaN→int64 is
        # undefined (lands in bin 0 on x86) and SQL keeps NULL out of groups
        if group is not None:
            b = b[ok]
        v = v[ok]
        ids = np.clip(np.floor((v - lo) / width).astype(np.int64), 0, bins - 1)
        if group is None:
            c = np.bincount(ids, minlength=bins)
            nz = np.flatnonzero(c)
            return pd.DataFrame({"bin": nz.astype("int64"), "cnt": c[nz].astype("int64")})
        g = pd.DataFrame({group: b[group], "bin": ids})
        out = g.groupby([group, "bin"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": "int64"})

    keys = ["bin"] if group is None else [group, "bin"]
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .aggregate(Sum("cnt", alias_name="n"))
    )


def vector_centroids(
    ds: ray.data.Dataset,
    group: str,
    vec: str = "embedding",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group mean vector (class centroids over an embedding column) in
    long form → (group, pos, centroid).  Combiner-first: each batch folds
    its vectors into ONE (group → sum-vector, n) partial with a single
    reduceat per group — the shuffle moves dim-length partials per
    (group, batch), never the embeddings."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray(np.stack(b[vec].to_numpy()), dtype=np.float64)
        keys, inv = np.unique(b[group].to_numpy(), return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.flatnonzero(np.r_[True, inv[order][1:] != inv[order][:-1]])
        sums = np.add.reduceat(mat[order], starts, axis=0)
        n = np.diff(np.r_[starts, len(order)])
        dim = mat.shape[1]
        return pd.DataFrame(
            {
                group: np.repeat(keys, dim),
                "pos": np.tile(np.arange(dim, dtype=np.int64), len(keys)),
                "s": sums.ravel(),
                "n": np.repeat(n, dim).astype(np.int64),
            }
        )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__pk"] = _pk_any(b[group], num_partitions)
        return b

    def final(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby([group, "pos"], sort=False, as_index=False)[["s", "n"]].sum()
        r["centroid"] = r["s"] / r["n"]
        return r[[group, "pos", "centroid"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def funnel_counts(
    ds: ray.data.Dataset,
    stages: tuple[str, ...],
    user: str = "user_id",
    event_type: str = "event_type",
    ts: str = "ts_us",
    num_partitions: int = NUM_PARTITIONS,
) -> pd.DataFrame:
    """Strict first-touch funnel: a user converts at stage k when their
    FIRST stage-i timestamps are strictly increasing through i ≤ k
    (min(t₁) < min(t₂) < … — the simple funnel semantics a SQL mirror can
    state exactly).  → (stage, users) with cumulative conversion counts.

    Shape: per-batch (user, stage, min-ts) partials — the combiner, so the
    shuffle carries ≤ |stages| rows per user per batch; per-partition
    vectorized pivot + chain test; only |stages| counters reach the driver.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[event_type].isin(stages)]
        return b.groupby([user, event_type], sort=False, as_index=False)[ts].min()

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__pk"] = _pk_any(b[user], num_partitions)
        return b

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby([user, event_type], sort=False)[ts].min().unstack(event_type)
        ok = np.ones(len(m), dtype=bool)
        prev = None
        out = np.zeros(len(stages), dtype=np.int64)
        for i, st in enumerate(stages):
            cur = m[st].to_numpy(dtype=np.float64) if st in m.columns else np.full(len(m), np.nan)
            if prev is None:
                ok = ok & ~np.isnan(cur)
            else:
                with np.errstate(invalid="ignore"):
                    ok = ok & ~np.isnan(cur) & (cur > prev)
            out[i] = int(ok.sum())
            prev = cur
        return pd.DataFrame({"stage": list(stages), "users": out})

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(counts, batch_format="pandas")
        .to_pandas()  # |stages| rows per partition
    )
    agg = parts.groupby("stage", sort=False, as_index=False)["users"].sum()
    order = {s: i for i, s in enumerate(stages)}
    return agg.sort_values("stage", key=lambda s: s.map(order)).reset_index(drop=True)


def profile_numeric(
    ds: ray.data.Dataset,
    columns: list[str],
) -> pd.DataFrame:
    """Data-quality profile of numeric columns → one row per column:
    (column, n, n_null, min, max).  All statistics are mergeable, so each
    batch folds to |columns| partial rows (the combiner) and the final
    reduce handles |columns| × #batches rows on the driver — bytes, not
    data.  Exact distinct-cardinality profiling is deliberately NOT here:
    that is a shuffle (or the KMV sketch, analytics.approx_distinct_per_group
    — the 100-TB path)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:  # per-COLUMN loop — dimension-scale
            col = b[c]
            null = col.isna()
            vals = col[~null].to_numpy(dtype=np.float64)
            rows.append(
                (
                    c,
                    len(col),
                    int(null.sum()),
                    float(vals.min()) if len(vals) else np.nan,
                    float(vals.max()) if len(vals) else np.nan,
                )
            )
        return pd.DataFrame(rows, columns=["column", "n", "n_null", "min", "max"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("column", sort=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"), min=("min", "min"), max=("max", "max")
    )
    out = agg.reindex(columns).reset_index().rename(columns={"index": "column"})
    return out.astype({"n": "int64", "n_null": "int64"})


def approx_group_quantiles(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    id_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    k: int = 64,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """MERGEABLE approximate per-group quantiles — the billion-value-key
    escape the exact :func:`group_quantiles` contract names.  The sketch is
    a deterministic bottom-k hash sample: keep the k rows with the smallest
    ``mix64(id)`` per group (a uniform sample because the hash is uniform;
    deterministic because the hash is seedless — reruns, any parallelism,
    and the SQL oracle all pick the IDENTICAL sample), then interpolate
    quantiles over the sample.  Bottom-k is a semigroup (bottom-k of a
    union = bottom-k of concatenated bottom-ks), so each batch contributes
    ≤ k rows per group to the shuffle no matter how many rows it holds.

    Error: standard order-statistic sampling bounds, ~O(1/√k) in rank;
    a pytest pins the observed error against exact quantiles.
    """
    from ..functions.hashing import mix64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = mix64(b[id_col].to_numpy().astype(np.int64).view(np.uint64))
        t = pd.DataFrame({group: b[group], "v": b[value], "h": h})  # h stays uint64:
        # int64-viewed hashes would sort sign-flipped vs the SQL's UBIGINT order
        # per-group bottom-k by hash (sort once, head per group)
        t = t.sort_values([group, "h"], kind="mergesort")
        out = t.groupby(group, sort=False, observed=True).head(k)
        out = out.copy()
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    names = [f"q{round(q * 100)}" for q in qs]  # round: int() truncates 0.29*100 -> 28

    def final(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values([group, "h"], kind="mergesort")
        t = t.groupby(group, sort=False, observed=True).head(k)
        rows = []
        for key, vals in t.groupby(group, sort=False)["v"]:
            # null rows STAY in the hash sample (the SQL mirror's QUALIFY
            # samples them too) but are skipped by the quantile, exactly
            # like quantile_cont skips NULL; all-null → NaN ≡ SQL NULL
            arr = vals.to_numpy(np.float64)
            arr = np.sort(arr[~np.isnan(arr)])
            if len(arr) == 0:
                rows.append((key, *([np.nan] * len(qs))))
            else:
                rows.append((key, *np.quantile(arr, qs, method="linear")))
        return pd.DataFrame(rows, columns=[group, *names])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# count-min sketch: approximate per-key counts at UNBOUNDED key cardinality
# ---------------------------------------------------------------------------

CM_SALT = 0xC0117_817
CM_STEP = 0x9E3779B9  # per-depth salt stride (golden-ratio odd constant)


def _cm_salts(depth: int, salt: int) -> list[int]:
    return [(salt + d * CM_STEP) & ((1 << 64) - 1) for d in range(depth)]


def cm_sketch(
    ds: ray.data.Dataset,
    key: str,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: int = CM_SALT,
) -> ray.data.Dataset:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of an integer key
    column → (d, bucket, cnt) rows, nonzero cells only.

    The per-key-count sibling of the KMV approx-distinct sketch: exact
    per-key counts at billion-key cardinality need a corpus-scale shuffle;
    the sketch bounds EVERYTHING at depth×width cells.  Per batch: depth
    bincounts (a combiner — ≤ depth·width partial rows per batch shuffle at
    ANY cardinality); one (d, bucket) groupby merges partials.  Cells are a
    SEMIGROUP (elementwise sum), so sketches also merge across snapshots /
    streams.  mix64 hashing makes the sketch deterministic and bit-exactly
    SQL-mirrorable; estimates overcount by ≤ εN with ε ≈ e/width at
    standard depths."""
    from ..functions.hashing import mix64

    salts = _cm_salts(depth, salt)

    def partial(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ds_, ws_, cs_ = [], [], []
        for d, s in enumerate(salts):
            cols = (mix64(ids ^ np.uint64(s)) % np.uint64(width)).astype(np.int64)
            cnt = np.bincount(cols, minlength=width)
            nz = np.flatnonzero(cnt)
            ds_.append(np.full(len(nz), d, dtype=np.int64))
            ws_.append(nz)
            cs_.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "d": pa.array(np.concatenate(ds_)),
                "bucket": pa.array(np.concatenate(ws_)),
                "cnt": pa.array(np.concatenate(cs_)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cm_estimate(
    sketch: pd.DataFrame,
    keys: np.ndarray,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: int = CM_SALT,
) -> np.ndarray:
    """Point-query the sketch (driver-side: the sketch is ≤ depth×width
    rows BY CONSTRUCTION): estimate(k) = min over d of cell[d][h_d(k)]."""
    from ..functions.hashing import mix64

    cells = np.zeros((depth, width), dtype=np.int64)
    cells[sketch["d"].to_numpy(np.int64), sketch["bucket"].to_numpy(np.int64)] = (
        sketch["cnt"].to_numpy(np.int64)
    )
    ids = np.asarray(keys, dtype=np.int64).view(np.uint64)
    est = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    for d, s in enumerate(_cm_salts(depth, salt)):
        cols = (mix64(ids ^ np.uint64(s)) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, cells[d, cols])
    return est


RETENTION_SPAN_US = 86_400_000_000  # day buckets


def retention_cohorts(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    span_us: int = RETENTION_SPAN_US,
) -> ray.data.Dataset:
    """Retention-cohort matrix: users grouped by FIRST-active time bucket
    (cohort), counted in every bucket they are active → (cohort, bucket,
    n_users), bucket ≥ cohort.

    SCALE: ONE events pass reduces to distinct (user, bucket) pairs
    (per-batch dedup combiner — only distinct pairs shuffle, never the
    stream); cohorts derive from the SAME pair table (groupby(user).min —
    identical to a min over raw events); one guarded native hash join
    co-locates a user's pairs with its cohort; the final (cohort, bucket)
    count is cohort²-scale.  Nothing user-scale touches the driver."""
    import pyarrow as pa

    from ray.data.aggregate import Count, Min

    from .joins import adaptive_join_partitions, hash_join

    def pairs(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        b = us.astype("datetime64[us]").view(np.int64) // span_us
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, b], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({user_col: pa.array(uniq[:, 0]), "bucket": pa.array(uniq[:, 1])})

    pair_ds = (
        events.map_batches(pairs, batch_format="pyarrow")
        .groupby([user_col, "bucket"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )
    # materialize at every stage boundary around the native join: the
    # join's aggregator pool must not coexist with another pool (NOTES
    # item 6), and the pool must be sized to the DATA and the session —
    # the 64-actor default deadlocks a 4-cpu session (measured on this
    # exact chain; the line_dedup lesson)
    pair_mat = pair_ds.materialize()
    first = pair_mat.groupby(user_col).aggregate(
        Min("bucket", alias_name="cohort")
    ).materialize()
    jp = adaptive_join_partitions(first.count(), pair_mat.count())
    joined = hash_join(
        pair_mat, first, on=user_col, num_partitions=jp
    ).materialize()
    return (
        joined.groupby(["cohort", "bucket"])
        .aggregate(Count(alias_name="n_users"))
    )


def rollup_sums(
    ds: ray.data.Dataset,
    keys: list[str],
    measures: list[str],
    num_partitions: int = 8,
) -> pd.DataFrame:
    """GROUP BY ROLLUP(keys): the finest-level aggregate runs distributed
    (per-batch multi-measure partial sums — one combiner row per key tuple
    per batch shuffles, never the rows); every coarser ROLLUP level is then
    an exact re-aggregation OF THE FINEST LEVEL, which is dimension-scale
    by definition — so the driver-side derivation is a bounded contract and
    the measures must be INTEGERS (exact under re-aggregation; float sums
    would drift between levels).  ``lvl`` mirrors DuckDB's
    ``grouping(keys...)`` bitmask (0 = detail … 2^k−1 = grand total)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, sort=False, as_index=False, observed=True)[measures].sum()
        n = b.groupby(keys, sort=False, observed=True).size().reset_index(name="n_rows")
        return g.merge(n, on=keys)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False, observed=True)[
            measures + ["n_rows"]
        ].sum()

    finest = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(final, batch_format="pandas")
        .to_pandas()  # dimension-scale by definition of a grouped rollup
    )
    levels = [finest.assign(lvl=np.int64(0))]
    for j in range(1, len(keys) + 1):
        kept = keys[: len(keys) - j]
        mask = (1 << j) - 1
        if kept:
            lv = finest.groupby(kept, as_index=False, observed=True)[
                measures + ["n_rows"]
            ].sum()
        else:
            lv = finest[measures + ["n_rows"]].sum().to_frame().T
        for dropped in keys[len(keys) - j :]:
            lv[dropped] = None
        lv["lvl"] = np.int64(mask)
        levels.append(lv)
    out = pd.concat(levels, ignore_index=True)[keys + measures + ["n_rows", "lvl"]]
    for m in measures + ["n_rows", "lvl"]:
        out[m] = out[m].astype("int64")
    return out.sort_values(["lvl", *keys], na_position="last").reset_index(drop=True)


def cube_sums(
    ds: ray.data.Dataset,
    keys: list[str],
    measures: list[str],
) -> pd.DataFrame:
    """GROUP BY CUBE(keys) — all 2^k grouping sets, derived exactly like
    :func:`rollup_sums`: ONE distributed finest-level aggregate (per-batch
    combiner partials → key-tuple groupby), then every coarser grouping
    set is an exact integer re-aggregation OF THE FINEST LEVEL on the
    driver (dimension-scale by definition; measures must be integers so
    the levels agree bit-for-bit).  ``lvl`` mirrors DuckDB's
    ``grouping(keys...)`` bitmask — bit (k−1−i) set ⇔ keys[i] rolled up."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, sort=False, as_index=False, observed=True)[measures].sum()
        n = b.groupby(keys, sort=False, observed=True).size().reset_index(name="n_rows")
        return g.merge(n, on=keys)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False, observed=True)[
            measures + ["n_rows"]
        ].sum()

    finest = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(final, batch_format="pandas")
        .to_pandas()  # dimension-scale by definition of a grouped cube
    )
    k = len(keys)
    levels = []
    for mask in range(1 << k):
        kept = [keys[i] for i in range(k) if not (mask >> (k - 1 - i)) & 1]
        if kept:
            lv = finest.groupby(kept, as_index=False, observed=True)[
                measures + ["n_rows"]
            ].sum()
        else:
            lv = finest[measures + ["n_rows"]].sum().to_frame().T
        for i in range(k):
            if (mask >> (k - 1 - i)) & 1:
                lv[keys[i]] = None
        lv["lvl"] = np.int64(mask)
        levels.append(lv)
    out = pd.concat(levels, ignore_index=True)[keys + measures + ["n_rows", "lvl"]]
    for m in measures + ["n_rows", "lvl"]:
        out[m] = out[m].astype("int64")
    return out.sort_values(["lvl", *keys], na_position="last").reset_index(drop=True)


def weighted_quantiles(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    weight: str,
    pcts: tuple[int, ...] = (25, 50, 75),
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Weighted discrete quantiles per group — for each percentile p the
    SMALLEST value v whose cumulative weight reaches ceil(p·W/100) (the
    lower weighted median generalized; all-integer, no interpolation, so
    the SQL window mirror is bit-exact).

    SCALE: ONE shuffle — per-batch lexsort+reduceat partials reduce to
    (group, value, w) histogram rows (only distinct pairs leave a batch),
    then the per-GROUP map_groups merges partials (sorted reduceat) and
    scans the cumsum thresholds.  No row-cardinality hash aggregate: on
    near-unique value domains (e.g. raw centi prices) the combiner can't
    reduce, and routing 600k one-row groups through a keyed aggregate +
    second exchange cost 48 s at bench scale (measured) vs one sort
    exchange.  PARTITIONING: the per-group distinct-VALUE set must fit an
    actor (bounded-domain contract — quantized grids, not open floats;
    document per call site); group count is dimension-scale."""
    import pyarrow as pa

    def partials(b: pd.DataFrame) -> "pa.Table":
        codes, uniq_g = pd.factorize(b[group], sort=False)
        v = b[value].to_numpy(np.int64)
        w = b[weight].to_numpy(np.int64)
        order = np.lexsort((v, codes))
        c2, v2, w2 = codes[order], v[order], w[order]
        change = np.empty(len(c2), dtype=bool)
        if len(c2):
            change[0] = True
            change[1:] = (c2[1:] != c2[:-1]) | (v2[1:] != v2[:-1])
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(w2, starts) if len(starts) else np.array([], np.int64)
        return pa.table(
            {
                group: pa.array(
                    np.asarray(uniq_g)[c2[starts]] if len(starts) else [],
                    type=pa.large_string(),
                ),
                value: pa.array(v2[starts], type=pa.int64()),
                "__w": pa.array(sums.astype(np.int64), type=pa.int64()),
            }
        )

    def per_group(g: pd.DataFrame) -> "pa.Table":
        # return ARROW: map_groups' empty hash partitions emit zero-column
        # pandas blocks otherwise (NOTES empty-block pathology)
        vals = g[value].to_numpy(np.int64)
        wts = g["__w"].to_numpy(np.int64)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        # merge duplicate values across batch partials
        change = np.empty(len(vals), dtype=bool)
        change[0] = True
        change[1:] = vals[1:] != vals[:-1]
        starts = np.flatnonzero(change)
        vals = vals[starts]
        wts = np.add.reduceat(wts, starts)
        cum = np.cumsum(wts)
        W = int(cum[-1])
        # ceil(p·W/100) in exact ints; searchsorted('left') finds the
        # smallest value whose cumweight >= threshold
        thr = np.array([-(-p * W // 100) for p in pcts], dtype=np.int64)
        idx = np.searchsorted(cum, thr, side="left")
        return pa.table(
            {
                group: pa.array([g[group].iloc[0]] * len(pcts), type=pa.large_string()),
                "p": pa.array(np.array(pcts, dtype=np.int64)),
                "wq": pa.array(vals[idx], type=pa.int64()),
            }
        )

    out = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby(group)
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()  # groups × pcts — dimension-scale
    )
    out["p"] = out["p"].astype("int64")
    out["wq"] = out["wq"].astype("int64")
    return out.sort_values([group, "p"]).reset_index(drop=True)


def grouped_moment_sums(
    ds: ray.data.Dataset,
    group: str,
    x: str,
    y: str,
) -> pd.DataFrame:
    """Per-group exact int64 correlation MOMENT SUMS: ``(group, n, sx, sy,
    sxy, sxx, syy)`` — the Pearson r derives driver-side; the integers are
    the oracle contract (the assortativity / embedding_gram house
    pattern).  CALLER must pre-quantize x/y so n·max(x)² fits int64.

    SCALE: factorize+reduceat per batch reduces to ONE partial row per
    group per batch — only (group × batches) rows shuffle; the final
    groupby sums them at dimension scale."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> "pa.Table":
        codes, uniq_g = pd.factorize(b[group], sort=False)
        xv = b[x].to_numpy(np.int64)
        yv = b[y].to_numpy(np.int64)
        order = np.argsort(codes, kind="stable")
        c2 = codes[order]
        xs, ys = xv[order], yv[order]
        change = np.empty(len(c2), dtype=bool)
        if len(c2):
            change[0] = True
            change[1:] = c2[1:] != c2[:-1]
        starts = np.flatnonzero(change)
        red = lambda a: np.add.reduceat(a, starts) if len(starts) else np.array([], np.int64)
        return pa.table(
            {
                group: pa.array(
                    np.asarray(uniq_g)[c2[starts]] if len(starts) else [],
                    type=pa.large_string(),
                ),
                "n": pa.array(red(np.ones(len(c2), np.int64)), type=pa.int64()),
                "sx": pa.array(red(xs), type=pa.int64()),
                "sy": pa.array(red(ys), type=pa.int64()),
                "sxy": pa.array(red(xs * ys), type=pa.int64()),
                "sxx": pa.array(red(xs * xs), type=pa.int64()),
                "syy": pa.array(red(ys * ys), type=pa.int64()),
            }
        )

    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()  # dimension-scale
        .sort_values(group)
        .reset_index(drop=True)
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[[group, *cols]]


def chi2_drift(counts: pd.DataFrame, group: str) -> pd.DataFrame:
    """Chi-square drift of each group's histogram against the pooled
    one, in exact integer micro-units: for observed c_i, pooled d_i,
    group total N and grand total M,

        chi2_micro = Σ_i (10⁶ · (c_i·M − d_i·N)²) // (M · d_i · N)

    computed with PYTHON ints (arbitrary precision — the squares overflow
    int64 at corpus scale) over the DIMENSION-SCALE (group × bucket)
    count table; the SQL mirror runs the identical expression in HUGEINT.
    Input: (group, bucket, c) counts — the distributed combiner output."""
    d = counts.groupby("bucket")["c"].sum()
    M = int(counts["c"].sum())
    rows = []
    for g, sub in counts.groupby(group, sort=True):
        N = int(sub["c"].sum())
        byb = dict(zip(sub["bucket"], sub["c"]))
        chi2 = 0
        for bucket, di in d.items():
            ci = int(byb.get(bucket, 0))
            di = int(di)
            diff = ci * M - di * N
            chi2 += (1_000_000 * diff * diff) // (M * di * N)
        rows.append({group: g, "n_docs": N, "chi2_micro": chi2})
    return pd.DataFrame(rows).astype({"n_docs": "int64", "chi2_micro": "int64"})


def latest_by_key(
    ds: ray.data.Dataset,
    keys: list[str],
    order: list[str],
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Latest-state compaction — the CDC / upsert "current snapshot"
    primitive: for each key tuple keep the single row that is maximal in
    the ``order`` columns (e.g. ``["ts_us", "event_id"]`` — the id
    tie-break makes the winner total-ordered and deterministic).

    SCALE: argmax is associative, so a per-BATCH combiner (one mergesort +
    ``duplicated(keep='last')`` C-pass) reduces each batch to ≤ one row
    per key BEFORE the shuffle — only surviving candidates move; the
    per-partition final pass applies the identical kernel.  PARTITIONING:
    all candidates of one key co-locate via the coarse ``_pk_any`` hash
    (the map_groups-cost rule: 64 partitions, vectorized inside)."""

    def reduce_kernel(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values([*keys, *order], kind="mergesort")
        return s[~s.duplicated(subset=keys, keep="last")]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = reduce_kernel(b)
        out = out.copy()
        out["__pk"] = _pk_any(out[keys[0]], num_partitions)
        return out

    def final(g: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        # return ARROW (empty-pandas-block pathology, NOTES)
        return pa.Table.from_pandas(
            reduce_kernel(g).drop(columns="__pk"), preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


BLOOM_SALT = 0xB100F_117


def bloom_bits(
    ds: ray.data.Dataset,
    key: str,
    *,
    m_bits: int = 2048,
    k: int = 4,
    salt: int = BLOOM_SALT,
) -> ray.data.Dataset:
    """Bloom filter of an integer key column → (d, bit) rows, the set bits
    of k salted hash planes — the MEMBERSHIP sibling of cm_sketch: bounded
    at k·m_bits cells at ANY key cardinality, mergeable across shards by
    set union (the groupby here), no false negatives ever.  Per batch: k
    vectorized hash+dedup partials (≤ k·m_bits rows per batch shuffle);
    one (d, bit) groupby unions them.  mix64 hashing keeps it bit-exactly
    SQL-mirrorable."""
    from ray.data.aggregate import Count

    from ..functions.hashing import mix64
    from .analytics import _cm_salts

    salts = _cm_salts(k, salt)

    def partial(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ds_, bs_ = [], []
        for d, s in enumerate(salts):
            bits = np.unique((mix64(ids ^ np.uint64(s)) % np.uint64(m_bits)).astype(np.int64))
            ds_.append(np.full(len(bits), d, dtype=np.int64))
            bs_.append(bits)
        return pa.table(
            {"d": pa.array(np.concatenate(ds_)), "bit": pa.array(np.concatenate(bs_))}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "bit"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )


def bloom_prefilter(
    probe: ray.data.Dataset,
    bits: pd.DataFrame,
    key: str,
    *,
    m_bits: int = 2048,
    k: int = 4,
    salt: int = BLOOM_SALT,
) -> ray.data.Dataset:
    """Keep probe rows whose key tests POSITIVE against a built bloom
    filter (``bits`` = the k·m_bits-bounded output of :func:`bloom_bits` —
    broadcast once via ray.put, read per actor).  Deterministic superset of
    the true matches (false positives possible, never negatives): the
    cheap pre-filter before an exact semi join, cutting the probe-side
    exchange to candidates only."""
    import ray as _ray

    from ..functions.hashing import mix64

    salts = _cm_salts(k, salt)
    table = np.zeros((k, m_bits), dtype=bool)
    table[bits["d"].to_numpy(np.int64), bits["bit"].to_numpy(np.int64)] = True
    ref = _ray.put(table)
    _cache: dict = {}

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        if "t" not in _cache:
            _cache["t"] = _ray.get(ref)
        t = _cache["t"]
        ids = batch[key].to_numpy().astype(np.int64).view(np.uint64)
        ok = np.ones(len(batch), dtype=bool)
        for d, s in enumerate(salts):
            ok &= t[d, (mix64(ids ^ np.uint64(s)) % np.uint64(m_bits)).astype(np.int64)]
        return batch[ok]

    return probe.map_batches(keep, batch_format="pandas")


def group_mode(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Most frequent ``value`` per ``key`` (ties → lexicographically
    smallest value, so reruns and the SQL mirror agree): per-batch
    (key, value) count combiner → one (key, value) groupby sum → one
    key-partitioned argmax pass (vectorized first-row-per-key after a
    (key, −count, value) sort).  Two narrow shuffles, output key-scale."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby([key, value], sort=False, observed=True)
            .size()
            .reset_index(name="c")
        )

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key, value])
        .aggregate(Sum("c", alias_name="n_mode"))
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["__pk"] = _pk_any(b[key], num_partitions)
        return out

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(
            [key, "n_mode", value], ascending=[True, False, True], kind="mergesort"
        )
        first = s.groupby(key, sort=False).head(1).drop(columns="__pk")
        return first.rename(columns={value: "mode_value"})

    return (
        counts.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(argmax, batch_format="pandas")
    )


def group_mad(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    num_partitions: int = NUM_PARTITIONS,
) -> pd.DataFrame:
    """Median absolute deviation per group — the robust-scale statistic —
    as two discrete-quantile passes (``quantile_disc`` semantics:
    sorted[ceil(0.5·n)−1], an ACTUAL element, so no interpolation float
    enters the compare):

    pass 1: per-group disc median (one hash shuffle, dimension-scale out);
    pass 2: broadcast the medians, disc median of |value − median| (one
    more shuffle of the same shape).

    Partitioning contract: one group fits one partition (the
    group_quantiles contract); group count is dimension-scale, so the
    broadcast dict is a bounded contract."""
    import ray as _ray

    def _disc_median(s: np.ndarray) -> float:
        arr = np.sort(s)
        return float(arr[max(int(np.ceil(0.5 * len(arr))) - 1, 0)])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[group, value]].copy()
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    def medians(g: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (key, _disc_median(vals.to_numpy(np.float64)))
            for key, vals in g.groupby(group, sort=False)[value]
        ]
        return pd.DataFrame(rows, columns=[group, "median"])

    tagged = ds.map_batches(tag, batch_format="pandas")
    med = (
        tagged.groupby("__pk").map_groups(medians, batch_format="pandas").to_pandas()
    )  # dimension-scale
    med_ref = _ray.put(dict(zip(med[group], med["median"])))
    _cache: dict = {}

    def dev_tag(batch: pd.DataFrame) -> pd.DataFrame:
        if "m" not in _cache:
            _cache["m"] = _ray.get(med_ref)
        out = batch[[group]].copy()
        m = batch[group].map(_cache["m"]).to_numpy(np.float64)
        out["__dev"] = np.abs(batch[value].to_numpy(np.float64) - m)
        out["__pk"] = _pk_any(out[group], num_partitions)
        return out

    def mads(g: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (key, _disc_median(vals.to_numpy(np.float64)))
            for key, vals in g.groupby(group, sort=False)["__dev"]
        ]
        return pd.DataFrame(rows, columns=[group, "mad"])

    mad = (
        ds.map_batches(dev_tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(mads, batch_format="pandas")
        .to_pandas()
    )
    out = med.merge(mad, on=group)
    out["median"] = out["median"].round(6)
    out["mad"] = out["mad"].round(6)
    return out.sort_values(group).reset_index(drop=True)


def int_quantile_disc(
    ds: ray.data.Dataset, col: str, ps: tuple[float, ...]
) -> list[int]:
    """EXACT global discrete quantiles (``quantile_disc`` semantics:
    sorted[ceil(p·n)−1]) of an INTEGER column without a global sort: a
    per-batch value-count combiner → one (value → count) groupby → the
    distinct-value-scale histogram reaches the driver (the vocab_zipf
    bounded contract — integer metric domains are orders of magnitude
    below row counts), where a cumulative count finds each order
    statistic."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vu, vc = np.unique(b[col].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"v": vu, "m": vc.astype(np.int64)})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("v")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()
        .sort_values("v")
    )
    vs = hist["v"].to_numpy(np.int64)
    cum = np.cumsum(hist["m"].to_numpy(np.int64))
    n = int(cum[-1])
    out = []
    for p in ps:
        k = max(int(np.ceil(p * n)), 1)  # 1-based position
        out.append(int(vs[np.searchsorted(cum, k)]))
    return out
