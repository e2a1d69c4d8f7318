"""Relational join suite for the engine's table side.

Three join shapes, picked by the data, not the API:

* :func:`broadcast_join` — dimension-scale right side.  The right table is
  put in the object store ONCE (``ray.put``); every actor materializes it
  once in ``__init__`` and each batch is a vectorized local pandas merge.
  ZERO shuffle — the 100-TB pattern for fact × dimension (customer,
  nation, vocab, centroids…).  Right side must fit a worker heap.
* :func:`hash_join` — large × large.  Thin policy wrapper over Ray Data's
  native ``Dataset.join`` (hash-partitioned shuffle join): both sides
  exchange once on the key; ``num_partitions`` sizes the exchange.
* :func:`range_join` — rows × intervals (event in [start, end) for the
  same key), which no equi-join expresses.  Implemented by coarse
  time-bucket co-partitioning: each interval is replicated to every
  bucket it overlaps (vectorized ``np.repeat``), each left row lands in
  exactly ONE bucket, so a matched pair materializes exactly once — no
  post-dedup pass.  ONE hash shuffle on (key, bucket).

As-of join — a custom temporal operator Ray Data lacks (driver
instructions: "when the reference has an operator Ray Data lacks (as-of
join, range join, …) implement it as a composition … and document the
partitioning assumption it relies on").

``asof_join(left, right, …)`` attaches to every left row the most recent
right row with ``right.ts <= left.ts`` for the same ``by`` key
(backward inclusive — DuckDB ``ASOF LEFT JOIN … ON l.by = r.by AND
l.ts >= r.ts`` semantics, which is also ``pd.merge_asof``'s default).

Shape: ONE hash shuffle.  Both sides are tagged with
``pk = hash(by) % num_partitions`` in a vectorized ``map_batches``,
union'd, and a single ``groupby(pk).map_groups`` runs a sorted
``pd.merge_asof`` per partition — per NOTES.md the per-group overhead
(~0.7 ms) is paid per coarse partition, not per key.

PARTITIONING ASSUMPTION: all rows of one ``by`` key land in one group
(hash co-location) — required for correctness, and it bounds skew at one
key's rows per group ONLY through the coarse partition: a pathological
single key concentrates in one partition.  Unlike sessionize, an as-of
probe cannot be time-salted without a cross-salt boundary pass shipping
each salt's last right-row forward; at this operator's contract (right
side = dimension-scale state, e.g. signups) the skew bound is the right
side's per-key cardinality, which is small by construction.  If both
sides are event-scale AND one key dominates, range-partition by (key,
time) with a boundary broadcast — documented here as the scale path.

Ties: several right rows sharing (by, ts) would make "the most recent"
ambiguous (engine- and SQL-nondeterministic), so the right side is
first deduped to the row with the smallest ``dedup_id`` per (by, ts) —
deterministic on both sides of the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

NUM_PARTITIONS = 64

# Fibonacci multiplier (public-domain splitmix/Knuth constant) — cheap
# vectorized int64-key scatter; same family the id-hash kernels use.
_MIX = np.uint64(0x9E3779B97F4A7C15)


def adaptive_join_partitions(
    n_small_side: int,
    n_large_side: int | None = None,
    rows_per_partition: int = 200_000,
) -> int:
    """Size a native-join aggregator pool to the DATA, not a constant.

    Each hash-join partition is one aggregator ACTOR reserved up front, so
    the pool is a fixed cost the join pays regardless of row count —
    measured at bench scale (5k docs, 512 candidate rows, 32 cpus): the
    same minhash verify join runs 4.0 s with 4 aggregators and 9.5 s with
    32.  Policy: one partition per 4096 small-side rows (floor 2 — a
    1-partition join serializes the build), plus enough partitions that no
    aggregator holds more than ``rows_per_partition`` large-side rows
    (the memory bound that matters at 100 TB), capped at the cluster's CPU
    count (an aggregator pool larger than the session's CPUs livelocks —
    NOTES item 6, measured at 4 cpus)."""
    jp = max(2, -(-n_small_side // 4096))
    if n_large_side:
        jp = max(jp, -(-n_large_side // rows_per_partition))
    try:
        cap = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cap = 8
    return max(2, min(jp, cap))


def _pk(keys: pd.Series, num_partitions: int) -> np.ndarray:
    k = keys.to_numpy().astype(np.uint64)
    return ((k * _MIX) >> np.uint64(40)).astype(np.int64) % num_partitions


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str = "ts_us",
    by: str = "user_id",
    right_value_cols: tuple[str, ...] = ("value",),
    right_prefix: str = "r_",
    dedup_id: str | None = "event_id",
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Backward-inclusive as-of join; right columns arrive prefixed
    (``r_ts_us``, ``r_value``, …), null where no right row precedes."""

    left_cols = list(left.schema().names)
    if list(right.schema().names) != left_cols:
        # union'd blocks must agree column-for-column; project beforehand
        raise ValueError("asof_join: left and right must share a schema")

    def tag(side: int):
        def _tag(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            out["__pk"] = _pk(batch[by], num_partitions)
            out["__side"] = np.int8(side)
            return out

        return _tag

    tagged = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][left_cols]
        rt = g[g["__side"] == 1]
        if dedup_id:
            # deterministic tie-break: smallest dedup_id per (by, on)
            rt = rt.sort_values([by, on, dedup_id], kind="mergesort")
            rt = rt.drop_duplicates([by, on], keep="first")
        rt = rt[list(dict.fromkeys([by, on, *right_value_cols]))]
        int_like = {c: pd.api.types.is_integer_dtype(rt[c]) for c in (on, *right_value_cols)}
        rt = rt.rename(columns={c: right_prefix + c for c in (on, *right_value_cols)})
        rt[on] = rt[right_prefix + on]  # merge_asof consumes `on`; keep a copy
        out = pd.merge_asof(
            lf.sort_values(on, kind="mergesort"),
            rt.sort_values(on, kind="mergesort"),
            on=on,
            by=by,
            direction="backward",
            allow_exact_matches=True,
        )
        # unmatched rows put NaN into the right columns, silently floating
        # int64 columns (and only in groups with a miss — inconsistent block
        # dtypes): pin every right column to its nullable dtype
        for c, is_int in int_like.items():
            out[right_prefix + c] = out[right_prefix + c].astype(
                "Int64" if is_int else "Float64"
            )
        return out

    return tagged.groupby("__pk").map_groups(merge_group, batch_format="pandas")


class _BroadcastJoin:
    """Actor-pool stage: fetch + index the broadcast side once per ACTOR
    (``__init__``), merge per batch (``__call__``) — the prescribed
    stateful-stage shape.  The ObjectRef travels in constructor kwargs, so
    the table itself ships through the object store once per node, never
    per batch."""

    def __init__(self, right_ref, on: str, right_on: str, how: str, right_prefix: str):
        right: pa.Table = ray.get(right_ref)
        rdf = right.to_pandas()
        self.right_on = right_prefix + right_on if right_prefix else right_on
        self.right = rdf.rename(
            columns={c: right_prefix + c for c in rdf.columns if right_prefix}
        )
        self.on, self.how = on, how
        # left joins put NaN in right columns of miss rows; pin nullable
        # dtypes so block schemas stay consistent across hit/miss batches
        self.pin = {
            c: ("Int64" if pd.api.types.is_integer_dtype(t) else "Float64")
            for c, t in self.right.dtypes.items()
            if pd.api.types.is_integer_dtype(t) or pd.api.types.is_float_dtype(t)
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(
            self.right, left_on=self.on, right_on=self.right_on, how=self.how
        )
        if self.how == "left":
            for c, dt in self.pin.items():
                out[c] = out[c].astype(dt)
        return out


def broadcast_join(
    left: ray.data.Dataset,
    right: pa.Table,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    right_prefix: str = "",
    concurrency: tuple[int, int] | int | None = None,
) -> ray.data.Dataset:
    """Zero-shuffle fact × dimension join: the small right table is
    broadcast via ``ray.put`` and each batch merges locally.

    SCALE CONTRACT: ``right`` must fit in a worker heap (dimension scale —
    MBs to low GBs).  For large × large use :func:`hash_join`.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: how={how!r} (inner/left only)")
    right_on = right_on if right_on is not None else on
    if concurrency is None:
        from ..functions.resources import actor_pool

        concurrency = actor_pool()
    return left.map_batches(
        _BroadcastJoin,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_kwargs={
            "right_ref": ray.put(right),
            "on": on,
            "right_on": right_on,
            "how": how,
            "right_prefix": right_prefix,
        },
    )


def nonempty_arrow_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Rebuild a MATERIALIZED dataset from its non-empty arrow block refs
    (zero-copy — the object refs are reused, no data moves or converts).

    Works around a Ray Data (2.49) trap: ``groupby().map_groups()`` emits
    ZERO-COLUMN empty PANDAS blocks for empty hash partitions regardless of
    the UDF's declared/returned format, and such schema-less blocks bypass
    later map UDFs.  When one becomes a native-join side's schema source,
    the per-partition Acero join fails with "No match for key field …" —
    which only reproduces on SPARSE inputs (dense inputs populate every
    partition), so call this on any join build side produced by map_groups.
    Only valid when every non-empty block is arrow (all-arrow discipline)."""
    import ray as _ray

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    return _ray.data.from_arrow_refs(refs)


@ray.remote(num_cpus=0)
def _block_format(block) -> str:
    """Classify a block's physical format without shipping its data back
    (the task runs node-local to the block; only a short string returns)."""
    return "arrow" if isinstance(block, pa.Table) else "pandas"


def clean_join_side(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Policy guard applied to EVERY native-join side (r4 verdict item 1:
    ``tfidf_topk``'s idf Dataset reached Acero with a schema-less empty
    pandas block and failed layout-dependently; the ad-hoc per-call-site
    ``nonempty_arrow_blocks`` pattern let that one site slip through, so
    the guard now lives inside :func:`hash_join` / :func:`semi_join`).

    Materializes the side (already required policy: two native-join
    aggregator pools alive in one execution deadlock small sessions —
    NOTES.md item 6 — so sides must be pipeline barriers anyway), then,
    ONLY if a zero-row block exists, rebuilds the dataset from the
    non-empty block refs — zero-copy, the refs are reused.  Blocks may be
    arrow or pandas (aggregate/map_groups outputs are pandas); a
    ``num_cpus=0`` probe task per kept block classifies the format
    node-locally so the rebuild uses ``from_arrow_refs`` /
    ``from_pandas_refs`` without moving data.  A fully-empty side is
    returned as-is (there is no schema to rescue; inner/semi joins of an
    empty side produce empty output before Acero sees a partition)."""
    import ray as _ray

    mat = ds.materialize()
    refs: list = []
    has_empty = False
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
            else:
                has_empty = True
    if not has_empty or not refs:
        return mat
    fmts = _ray.get([_block_format.remote(r) for r in refs])
    arrow_refs = [r for r, f in zip(refs, fmts) if f == "arrow"]
    pandas_refs = [r for r, f in zip(refs, fmts) if f == "pandas"]
    parts = []
    if arrow_refs:
        parts.append(_ray.data.from_arrow_refs(arrow_refs))
    if pandas_refs:
        parts.append(_ray.data.from_pandas_refs(pandas_refs))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def strip_schema_metadata(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop arrow schema-level metadata (the pandas blob parquet readers
    attach) before a native join: the join aggregators hash schemas for
    deduplication, and metadata-carrying schemas fail that hash — one
    warning line per aggregator per block ("Failed to hash the schemas")
    and no schema dedup.  No-op unless the dataset's schema actually
    carries metadata (the check is driver-side and free); the strip itself
    is a zero-copy per-batch metadata replace."""
    try:
        meta = getattr(ds.schema().base_schema, "metadata", None)
    except Exception:
        meta = None
    if not meta:
        return ds

    import pyarrow as pa

    def _strip(t: "pa.Table") -> "pa.Table":
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(_strip, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = NUM_PARTITIONS,
    guard: bool = True,
) -> ray.data.Dataset:
    """Large × large equi-join: Ray Data's native hash-partitioned shuffle
    join (``Dataset.join``) — both sides exchange ONCE on the key.  This
    wrapper exists so pipelines pick a join by data shape (broadcast vs
    shuffle), with one policy point for ``num_partitions`` (which bounds
    per-aggregator memory: size it so one partition of the larger side
    fits a worker heap).

    ``guard`` (default on) routes both sides through
    :func:`clean_join_side` — the empty-pandas-block poison is dropped at
    the policy level so no call site can reintroduce CORRECTNESS_r04's
    ``tfidf_topk`` failure.  The materialize it implies is ALREADY the
    house rule for native joins (aggregator-pool deadlock, NOTES item 6);
    pass ``guard=False`` only for a side that must stream AND provably
    carries no map_groups/aggregate ancestry."""
    if guard:
        left = clean_join_side(left)
        right = clean_join_side(right)
    return strip_schema_metadata(left).join(
        strip_schema_metadata(right),
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on if right_on is not None else on,),
    )


def semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_partitions: int = NUM_PARTITIONS,
    guard: bool = True,
) -> ray.data.Dataset:
    """EXISTS / NOT EXISTS filter of ``left`` against ``right``'s key set
    (the blocklist-filter shape of a training-data pipeline).  The right
    side reduces to its DISTINCT keys per batch BEFORE the shuffle — a
    combiner, so only distinct keys ever move, never right payload rows —
    then Ray Data's native hash-partitioned left_semi / left_anti join
    emits left rows unchanged (no right columns to pad or drop).

    ``guard`` as in :func:`hash_join` — applied AFTER the keys combiner
    (empty upstream blocks bypass the pandas UDF and would survive it)."""
    right_on = right_on if right_on is not None else on

    def keys_only(b: pd.DataFrame) -> pd.DataFrame:
        return b[[right_on]].drop_duplicates()

    keys = right.map_batches(keys_only, batch_format="pandas")
    if guard:
        left = clean_join_side(left)
        keys = clean_join_side(keys)
    return strip_schema_metadata(left).join(
        strip_schema_metadata(keys),
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )


def anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """left rows with NO key match in right — see :func:`semi_join`."""
    return semi_join(left, right, on, right_on, anti=True, num_partitions=num_partitions)


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str = "ts_us",
    by: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
    right_prefix: str = "r_",
    bucket_us: int = 3_600_000_000,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Interval join: every (left row, right interval) pair with
    ``left.by == right.by`` and ``start <= left.on < end`` (inner).

    Shape: intervals are replicated to each coarse time bucket they
    overlap (vectorized ``np.repeat``); left rows map to exactly one
    bucket, so each qualifying pair is produced exactly once.  ONE hash
    shuffle on (by, bucket), then a per-partition vectorized pandas merge
    + range filter.

    PARTITIONING ASSUMPTION: all rows of one (by, bucket) cell co-locate.
    Skew is bounded by one key's rows per bucket; ``bucket_us`` is the
    knob — it should be ≈ the typical interval length (shorter buckets
    cut the equi-merge fan-out, longer buckets cut interval replication;
    an interval spanning B buckets costs B copies of one row).
    """
    bw = np.int64(bucket_us)

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        bucket = np.floor_divide(batch[on].to_numpy().astype(np.int64), bw)
        out["__bucket"] = bucket
        out["__pk"] = _pk2(batch[by].to_numpy(), bucket, num_partitions)
        out["__side"] = np.int8(0)
        return out

    def explode_right(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[start].to_numpy().astype(np.int64)
        e = batch[end].to_numpy().astype(np.int64)
        b0 = np.floor_divide(s, bw)
        # end is exclusive: an interval ending exactly on a bucket edge
        # does not reach into the next bucket
        b1 = np.floor_divide(np.maximum(e - 1, s), bw)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        out = batch.iloc[idx].reset_index(drop=True)
        # bucket sequence: b0[i] + (position within each row's run)
        offsets = np.concatenate(([0], np.cumsum(reps)[:-1]))
        pos = np.arange(reps.sum(), dtype=np.int64) - np.repeat(offsets, reps)
        bucket = np.repeat(b0, reps) + pos
        out["__bucket"] = bucket
        out["__pk"] = _pk2(out[by].to_numpy(), bucket, num_partitions)
        out["__side"] = np.int8(1)
        return out

    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    overlap = set(left_cols) & set(right_cols) - {by}
    if overlap and not right_prefix:
        raise ValueError(f"range_join: overlapping columns {sorted(overlap)} need right_prefix")

    lt = left.map_batches(_pad_cols(tag_left, right_cols, left_cols), batch_format="pandas")
    rt = right.map_batches(
        _pad_cols(explode_right, left_cols, right_cols), batch_format="pandas"
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        # the union pads each side with the other's columns as NA (object
        # dtype), and block concat degrades the real columns to object too;
        # restore native dtypes before the merge so output blocks are typed
        lf = g[g["__side"] == 0][[*left_cols, "__bucket"]].infer_objects()
        rr = g[g["__side"] == 1][[*right_cols, "__bucket"]].infer_objects()
        rr = rr.rename(
            columns={c: right_prefix + c for c in right_cols if c != by}
        )
        out = lf.merge(rr, on=[by, "__bucket"], how="inner")
        ts = out[on].to_numpy()
        keep = (out[right_prefix + start].to_numpy() <= ts) & (
            ts < out[right_prefix + end].to_numpy()
        )
        return out[keep].drop(columns="__bucket")

    return lt.union(rt).groupby("__pk").map_groups(merge_group, batch_format="pandas")


_MIX2 = np.uint64(0xBF58476D1CE4E5B9)  # second splitmix64 round constant


def _pk2(keys: np.ndarray, buckets: np.ndarray, num_partitions: int) -> np.ndarray:
    k = keys.astype(np.int64).view(np.uint64) * _MIX
    b = buckets.astype(np.int64).view(np.uint64) * _MIX2
    return (((k ^ b) * _MIX) >> np.uint64(40)).astype(np.int64) % num_partitions


def _pad_cols(fn, other_cols: list[str], own_cols: list[str]):
    """Union'd blocks must share a schema: add the other side's columns as
    nulls (cheap — one NA column assignment per batch, dropped post-merge)."""
    add = [c for c in other_cols if c not in own_cols]

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        out = fn(batch)
        for c in add:
            out[c] = pd.NA
        return out

    return _f


def asof_join_ranged(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str = "ts_us",
    by: str = "user_id",
    right_value_cols: tuple[str, ...] = ("value",),
    right_prefix: str = "r_",
    dedup_id: str | None = "event_id",
    range_span_us: int = 86_400_000_000,
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """The BOTH-sides-event-scale as-of path: same output contract as
    :func:`asof_join`, but partitioned by (key, time-range) so no group
    ever holds more than one key's one range — a pathological key cannot
    create an unbounded group (the one skew exposure :func:`asof_join`
    documents).

    As-of boundary state is minimal: a range's probe only needs the
    LATEST right row from all earlier ranges of its key — ONE row per
    (key, range).  Phase 1 collects each (key, range)'s last right row
    (deduped per (by, on) by smallest ``dedup_id``, like the one-shot
    path); a small prefix scan turns those into per-(key, range) seeds,
    broadcast once via ``ray.put``.  Phase 2 shuffles both sides on
    (key, range) and runs the per-group sorted ``merge_asof`` with the
    seed prepended.  Pinned equal to :func:`asof_join` by pytest
    (skewed key spanning many ranges, empty ranges, ties).
    """
    import ray as _ray

    left_cols = list(left.schema().names)
    if list(right.schema().names) != left_cols:
        raise ValueError("asof_join_ranged: left and right must share a schema")

    bw = np.int64(range_span_us)

    def tag(side: int):
        def _tag(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            rng = batch[on].to_numpy().astype(np.int64) // bw
            out["__rng"] = rng
            out["__pk"] = _pk2(batch[by].to_numpy(), rng, num_partitions)
            out["__side"] = np.int8(side)
            return out

        return _tag

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(tag(1), batch_format="pandas")

    # ---- phase 1: per-(key, range) latest right row → prefix seeds ----
    def last_right(g: pd.DataFrame) -> pd.DataFrame:
        r = g
        if dedup_id:
            r = r.sort_values([by, on, dedup_id], kind="mergesort")
            r = r.drop_duplicates([by, on], keep="first")
        r = r.sort_values([by, "__rng", on], kind="mergesort")
        return r.groupby([by, "__rng"], sort=False, observed=True).tail(1)

    cand = rt.groupby("__pk").map_groups(last_right, batch_format="pandas").to_pandas()
    cand = cand.sort_values([by, on], kind="mergesort")
    seeds: dict[tuple, pd.DataFrame] = {}
    for key, sub in cand.groupby(by, sort=False):
        rngs = np.sort(sub["__rng"].unique())
        for r_ in rngs[1:] if len(rngs) else []:
            prev = sub[sub["__rng"] < r_].tail(1)
            if len(prev):
                seeds[(key, int(r_))] = prev
        # ranges that have LEFT rows but no right rows also need seeds;
        # emit a seed for every range after each candidate range up to the
        # next one — resolved lazily in phase 2 via searchsorted instead
    # store per-key sorted candidate arrays for lazy seed resolution (a
    # left-only range has no (key, range) entry to look up)
    by_key = {
        key: sub.reset_index(drop=True) for key, sub in cand.groupby(by, sort=False)
    }
    seeds_ref = _ray.put(by_key)

    # ---- phase 2: per-(key, range) merge_asof with seed prepended ----
    _cache: dict = {}

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        if "s" not in _cache:
            _cache["s"] = _ray.get(seeds_ref)
        by_key_local = _cache["s"]
        out_frames = []
        gs = g.sort_values([by, "__rng"], kind="mergesort")
        for (key, rng_), cell in gs.groupby([by, "__rng"], sort=False, observed=True):
            lf = cell[cell["__side"] == 0][left_cols]
            if not len(lf):
                continue
            rr = cell[cell["__side"] == 1]
            # seed: the key's latest right row from any EARLIER range
            seed = None
            kc = by_key_local.get(key)
            if kc is not None:
                earlier = kc[kc["__rng"] < rng_]
                if len(earlier):
                    seed = earlier.tail(1)
            if seed is not None:
                rr = pd.concat([seed, rr], ignore_index=True)
            if dedup_id:
                rr = rr.sort_values([by, on, dedup_id], kind="mergesort")
                rr = rr.drop_duplicates([by, on], keep="first")
            rr = rr[list(dict.fromkeys([by, on, *right_value_cols]))]
            int_like = {
                c: pd.api.types.is_integer_dtype(rr[c]) for c in (on, *right_value_cols)
            }
            rr = rr.rename(columns={c: right_prefix + c for c in (on, *right_value_cols)})
            rr[on] = rr[right_prefix + on]
            outc = pd.merge_asof(
                lf.sort_values(on, kind="mergesort"),
                rr.sort_values(on, kind="mergesort"),
                on=on,
                by=by,
                direction="backward",
                allow_exact_matches=True,
            )
            for c, is_int in int_like.items():
                outc[right_prefix + c] = outc[right_prefix + c].astype(
                    "Int64" if is_int else "Float64"
                )
            out_frames.append(outc)
        if not out_frames:
            empty = g[g["__side"] == 0][left_cols].head(0)
            for c in (on, *right_value_cols):
                empty[right_prefix + c] = pd.Series(dtype="Float64")
            return empty
        return pd.concat(out_frames, ignore_index=True)

    return lt.union(rt).groupby("__pk").map_groups(merge_group, batch_format="pandas")
