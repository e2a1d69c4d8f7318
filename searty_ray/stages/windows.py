"""Windowed aggregates over a stream-shaped table (driver instructions:
"windowed aggregate / streaming window" custom operators).

Ray Data is a batch engine (the reference has no streaming either,
SURVEY.md §2.9), so windows are expressed batch-style over the ordered
``events`` log:

* tumbling — window key computed per row in ``map_batches`` (vectorized),
  partial per-batch aggregation, then one small ``groupby`` over partials:
  the pre-aggregate pattern, so the shuffle moves one row per
  (key, window, batch) instead of per event.
* session — two-phase TIME-SALTED sessionization: (user, time-range salt)
  fragments first, then an O(sessions) per-user fragment merge — no group
  ever holds more than one user's one time range of events, so a skewed
  user cannot create an unbounded group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum
import pyarrow as pa


def tumbling_aggregate(
    events: ray.data.Dataset, key: str, window_s: int
) -> ray.data.Dataset:
    """→ (key, window_start:int64 epoch-seconds, n_events, sum_value)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # normalize to µs explicitly: a ns-unit source (the pandas default in
        # many writers) would otherwise make every window 1000× off
        epoch_us = batch["ts"].astype("datetime64[us]").astype("int64")
        win = (epoch_us // (window_s * 1_000_000)) * window_s
        g = (
            pd.DataFrame({key: batch[key], "window_start": win, "value": batch["value"]})
            .groupby([key, "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas")
    return (
        partials.groupby([key, "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
    )


def hopping_aggregate(
    events: ray.data.Dataset, key: str, window_s: int, hop_s: int
) -> ray.data.Dataset:
    """Hopping (sliding) windows: each event lands in every window of length
    ``window_s`` that starts at a multiple of ``hop_s`` and covers it —
    ``window_s // hop_s`` windows per event.

    Same pre-aggregate shape as tumbling: the per-batch kernel REPLICATES
    each row into its covering windows (vectorized repeat), partially
    aggregates per (key, window, batch), and one small groupby merges the
    partials — the shuffle moves per-window partials, not per-event rows."""
    k = window_s // hop_s
    assert window_s % hop_s == 0, "window_s must be a multiple of hop_s"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch_us = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        last_start = (epoch_us // (hop_s * 1_000_000)) * hop_s  # latest covering window
        n = len(batch)
        # window starts: last_start - j*hop for j in 0..k-1, clipped at ≥ first window
        starts = np.repeat(last_start, k) - np.tile(np.arange(k, dtype=np.int64) * hop_s, n)
        keys = np.repeat(batch[key].to_numpy(), k)
        vals = np.repeat(batch["value"].to_numpy(), k)
        keep = starts >= 0
        g = (
            pd.DataFrame({key: keys[keep], "window_start": starts[keep], "value": vals[keep]})
            .groupby([key, "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas")
    return partials.groupby([key, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )


SESSION_PARTS = 64  # coarse hash partitions (see NOTES: never group by a
# fine key — per-group UDF overhead; per-key work is C-level pandas inside)


def sessionize(
    events: ray.data.Dataset, gap_s: int = 1800, salt_span_s: int | None = None
) -> ray.data.Dataset:
    """→ (user_id, session_start_us, n_events, duration_us): gap-based
    sessions per user (new session when ts - prev_ts > gap).

    Two-phase TIME-SALTED so one pathological user is never one unbounded
    group: phase 1 partitions by hash(user, salt) where salt = a coarse
    time range (default 256 gaps wide), sessionizing each (user, salt)
    range independently into session FRAGMENTS; phase 2 partitions by
    hash(user) over the fragments (O(sessions), not O(events)) and merges
    fragments whose boundary gap ≤ gap — salt ranges partition time, so
    ``start_next - end_prev`` IS the true inter-event gap at the seam and
    the merged output is exactly the unsalted sessionization.  Both phases
    group by SESSION_PARTS coarse hash partitions with vectorized multi-key
    kernels inside.
    """
    gap_us = gap_s * 1_000_000
    span_us = (salt_span_s if salt_span_s is not None else gap_s * 256) * 1_000_000

    from ..functions.hashing import mix64

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        epoch_us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        salt = epoch_us // span_us
        uid = b["user_id"].to_numpy()
        h = mix64(uid.astype(np.uint64) ^ mix64(salt.astype(np.uint64)))
        return pd.DataFrame(
            {
                "user_id": uid,
                "salt": salt,
                "epoch_us": epoch_us,
                "bpart": (h % np.uint64(SESSION_PARTS)).astype(np.int32),
            }
        )

    def fragments(part: pd.DataFrame) -> pd.DataFrame:
        """All (user, salt) ranges of one partition → session fragments,
        one vectorized pass (no per-user Python)."""
        p = part.sort_values(["user_id", "salt", "epoch_us"], kind="stable")
        ts = p["epoch_us"].to_numpy()
        uid = p["user_id"].to_numpy()
        salt = p["salt"].to_numpy()
        new = np.ones(len(p), dtype=bool)
        new[1:] = (
            (uid[1:] != uid[:-1])
            | (salt[1:] != salt[:-1])  # never merge across salts here: the
            # in-between range may live in another partition (phase 2 merges)
            | (ts[1:] - ts[:-1] > gap_us)
        )
        sid = np.cumsum(new) - 1
        out = pd.DataFrame({"sid": sid, "ts": ts}).groupby("sid").agg(
            s=("ts", "min"), e=("ts", "max"), n=("ts", "size")
        )
        out["user_id"] = uid[new]
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "s": out["s"].to_numpy(),
                "e": out["e"].to_numpy(),
                "n": out["n"].to_numpy(dtype=np.int64),
                "bpart2": (
                    mix64(out["user_id"].to_numpy().astype(np.uint64))
                    % np.uint64(SESSION_PARTS)
                ).astype(np.int32),
            }
        )

    def merge_fragments(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "s"], kind="stable")
        uid = p["user_id"].to_numpy()
        s, e, n = p["s"].to_numpy(), p["e"].to_numpy(), p["n"].to_numpy()
        new = np.ones(len(p), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (s[1:] - e[:-1] > gap_us)
        sid = np.cumsum(new) - 1
        out = pd.DataFrame({"sid": sid, "s": s, "e": e, "n": n}).groupby("sid").agg(
            session_start_us=("s", "min"), session_end_us=("e", "max"), n_events=("n", "sum")
        )
        return pd.DataFrame(
            {
                "user_id": uid[new],
                "session_start_us": out["session_start_us"].to_numpy(),
                "n_events": out["n_events"].to_numpy(dtype=np.int64),
                "duration_us": (out["session_end_us"] - out["session_start_us"]).to_numpy(),
            }
        )

    return (
        events.map_batches(add_part, batch_format="pandas")
        .groupby("bpart")
        .map_groups(fragments, batch_format="pandas")
        .groupby("bpart2")
        .map_groups(merge_fragments, batch_format="pandas")
    )


def rolling_aggregate(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    value: str = "value",
    window_rows: int = 5,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key ORDERED rolling aggregates over the last ``window_rows``
    rows — SQL ``ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW``
    semantics, with ``order`` as the deterministic within-key ordering
    (include a unique id column to break timestamp ties).

    Adds ``roll_sum`` / ``roll_mean`` columns.  Shape: ONE hash shuffle of
    the key over coarse partitions, then a per-partition vectorized sort +
    C-level ``groupby(...).rolling(...)``.

    PARTITIONING ASSUMPTION (default path): one key's rows fit one
    partition (same contract as group_quantiles — rolling state is
    inherently sequential per key).  For EVENT-SCALE keys pass
    ``range_span_us``: rows are then partitioned by (key, time-range) —
    no group ever holds more than one key's one time range — and each
    range is seeded with the previous ranges' last ``window_rows-1`` rows
    as broadcast boundary state (two phases, exact; pinned equal to the
    one-shot path by pytest).
    """
    from .analytics import _pk_any

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, *order], kind="mergesort")
        r = s.groupby(by, sort=False)[value].rolling(window_rows, min_periods=1)
        # groupby(sort=False) preserves the sorted frame's group order, so
        # the concatenated rolling values align positionally with s
        s = s.drop(columns="__pk")
        s["roll_sum"] = r.sum().to_numpy()
        s["roll_mean"] = r.mean().to_numpy()
        return s

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def rolling_aggregate_ranged(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    value: str = "value",
    window_rows: int = 5,
    range_span_us: int = 86_400_000_000,
    num_partitions: int = 64,
    seed_mode: str = "broadcast",
) -> ray.data.Dataset:
    """The event-scale-key rolling path: same output contract as
    :func:`rolling_aggregate`, but no single partition ever holds more
    than ONE key's ONE time range, so a pathological key cannot create an
    unbounded group.

    Two exact phases:

    1. shuffle on (key, range = ts // range_span_us); each partition emits
       its rows' rolling values computed WITH boundary seed rows, plus —
       in a first pass — each (key, range)'s last ``window_rows-1`` rows
       as boundary candidates.  Candidates total ≤ (w-1)·#(key, range)
       rows — dimension-scale, independent of events per range.
    2. the candidate table is reduced to per-(key, range) PREFIX
       boundaries (last w-1 rows over all earlier ranges — an O(w)
       per-range scan over the small sorted candidate table) and
       broadcast via ``ray.put``; the main shuffle prepends each
       partition's seed rows, rolls, and drops the seeds from the output.

    Exactness: rolling over rows ``r`` of one (key, range) needs only the
    w-1 rows immediately preceding the range in the key's global order —
    precisely what the prefix boundary holds.  Pinned equal to the
    one-shot path by pytest (skewed key spanning many ranges).

    ``seed_mode="shuffle"`` computes the SAME seeds fully distributed
    (no driver reduce, no broadcast — flagged seed rows ride the main
    exchange); output pinned identical to broadcast mode by pytest.
    """
    import ray as _ray

    from .analytics import _pk_any
    from .joins import _pk2

    if seed_mode == "shuffle":
        return _rolling_ranged_shuffle(
            events, by, order, value, window_rows, range_span_us, num_partitions
        )

    ts_col = order[0]

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        rng = batch[ts_col].to_numpy().astype(np.int64) // np.int64(range_span_us)
        out["__rng"] = rng
        out["__pk"] = _pk2(batch[by].to_numpy(), rng, num_partitions)
        return out

    tagged = events.map_batches(tag, batch_format="pandas")

    # ---- phase 1: per-(key, range) boundary candidates (last w-1 rows) ----
    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        return s.groupby([by, "__rng"], sort=False, observed=True).tail(window_rows - 1)

    seeds: dict[tuple, pd.DataFrame] = {}
    if window_rows > 1:  # a 1-row window never crosses a range boundary
        cand = (
            tagged.groupby("__pk")
            .map_groups(candidates, batch_format="pandas")
            .to_pandas()
        )
        # prefix boundaries on the SMALL candidate table: for each (key,
        # range), the last w-1 candidate rows of all EARLIER ranges of the key
        cand = cand.sort_values([by, *order], kind="mergesort")
        for key, sub in cand.groupby(by, sort=False):
            rngs = np.sort(sub["__rng"].unique())
            for r in rngs:
                prev = sub[sub["__rng"] < r].tail(window_rows - 1)
                if len(prev):
                    seeds[(key, int(r))] = prev.drop(columns=["__pk"])
    seeds_ref = _ray.put(seeds)

    # ---- phase 2: roll each (key, range) with its seed prefix ----
    # the closure carries only the ObjectRef; each task resolves it from
    # the worker-local object store (zero-copy-shared per node), cached in
    # a mutable cell for the task's lifetime
    _cache: dict = {}

    def roll_range(g: pd.DataFrame) -> pd.DataFrame:
        if "seeds" not in _cache:
            _cache["seeds"] = _ray.get(seeds_ref)
        all_seeds = _cache["seeds"]
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        outs = []
        for (key, rng_), sub in s.groupby([by, "__rng"], sort=False, observed=True):
            seed = all_seeds.get((key, int(rng_)))
            n_seed = 0
            if seed is not None:
                n_seed = len(seed)
                sub = pd.concat([seed.assign(__rng=rng_), sub], ignore_index=True)
            r = sub[value].rolling(window_rows, min_periods=1)
            sub = sub.copy()
            sub["roll_sum"] = r.sum().to_numpy()
            sub["roll_mean"] = r.mean().to_numpy()
            outs.append(sub.iloc[n_seed:])
        if not outs:
            return g.head(0).assign(roll_sum=0.0, roll_mean=0.0).drop(
                columns=["__pk", "__rng"]
            )
        return pd.concat(outs, ignore_index=True).drop(columns=["__pk", "__rng"])

    return tagged.groupby("__pk").map_groups(roll_range, batch_format="pandas")


# ---------------------------------------------------------------------------
# seed_mode="shuffle": fully distributed boundary seeds (SCALE.md known-limit
# 5 closed).  The broadcast variants reduce per-(key, range) seeds on the
# DRIVER and ship them via ray.put — O(#(key, range)) driver rows, fine at
# dimension×time scale.  Shuffle mode removes the driver from the path
# entirely: the candidate table is hash-partitioned BY KEY, each key's prefix
# seeds are computed in a map_groups and emitted as flagged SEED ROWS
# (__seed=1) addressed to the (key, range) partition that consumes them
# (joins.py's __side union idiom), then ONE union feeds the same final
# exchange.  No driver state at any (key, range) cardinality.
#
# Partitioning assumption (documented contract): one KEY's candidate rows —
# ≤ (w−1) per range it touches — fit one group.  That is #ranges(key) × w
# narrow rows, far below the key's event count (the thing being escaped).
# ---------------------------------------------------------------------------


def _tag_flagged(events, by, ts_col, range_span_us, num_partitions):
    from .joins import _pk2

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        rng = batch[ts_col].to_numpy().astype(np.int64) // np.int64(range_span_us)
        out["__rng"] = rng
        out["__pk"] = _pk2(batch[by].to_numpy(), rng, num_partitions)
        out["__seed"] = np.int8(0)
        return out

    return events.map_batches(tag, batch_format="pandas")


def _row_seed_dataset(tagged, by, order, tail_rows, num_partitions):
    """Distributed per-key prefix tails → a Dataset of seed ROWS (__seed=1,
    real event rows duplicated to the NEXT range's partition).  Exactness:
    each range keeps at most ``tail_rows`` candidate rows (its own ordered
    tail), so the ``tail_rows`` candidate rows immediately before a range
    start are exactly the key's last ``tail_rows`` event rows from earlier
    ranges — one O(#ranges × tail_rows) slice pass per key, no quadratic
    rescan."""
    from .analytics import _pk_any
    from .joins import _pk2

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        return s.groupby([by, "__rng"], sort=False, observed=True).tail(tail_rows)

    cand = tagged.groupby("__pk").map_groups(candidates, batch_format="pandas")

    def kpk(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__kpk"] = _pk_any(batch[by], num_partitions)
        return out

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, *order], kind="mergesort")
        outs = []
        for _key, sub in s.groupby(by, sort=False):
            sub = sub.reset_index(drop=True)
            rngs = sub["__rng"].to_numpy()
            starts = np.flatnonzero(np.concatenate(([True], rngs[1:] != rngs[:-1])))
            for p in starts[1:]:  # a key's first range has no prefix
                e = sub.iloc[max(0, p - tail_rows) : p].copy()
                r = rngs[p]
                e["__rng"] = r
                e["__pk"] = _pk2(
                    e[by].to_numpy(), np.full(len(e), r, dtype=np.int64), num_partitions
                )
                e["__seed"] = np.int8(1)
                outs.append(e)
        if not outs:
            return s.head(0).drop(columns="__kpk")
        return pd.concat(outs, ignore_index=True).drop(columns="__kpk")

    return (
        cand.map_batches(kpk, batch_format="pandas")
        .groupby("__kpk")
        .map_groups(per_key, batch_format="pandas")
    )


def _rolling_ranged_shuffle(
    events, by, order, value, window_rows, range_span_us, num_partitions
):
    ts_col = order[0]
    tagged = _tag_flagged(events, by, ts_col, range_span_us, num_partitions)
    if window_rows <= 1:
        seeds = None  # a 1-row window never crosses a range boundary
    else:
        seeds = _row_seed_dataset(tagged, by, order, window_rows - 1, num_partitions)
    drop = ["__pk", "__rng", "__seed"]

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        # seed rows carry strictly earlier timestamps than any data row of
        # their target range (rng = ts // span), so the ordered sort puts
        # them first within each (key, range) — roll, then slice them off
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        outs = []
        for (_key, _rng), sub in s.groupby([by, "__rng"], sort=False, observed=True):
            n_seed = int((sub["__seed"].to_numpy() == 1).sum())
            r = sub[value].rolling(window_rows, min_periods=1)
            sub = sub.copy()
            sub["roll_sum"] = r.sum().to_numpy()
            sub["roll_mean"] = r.mean().to_numpy()
            outs.append(sub.iloc[n_seed:])
        if not outs:
            return g.head(0).assign(roll_sum=0.0, roll_mean=0.0).drop(columns=drop)
        return pd.concat(outs, ignore_index=True).drop(columns=drop)

    src = tagged if seeds is None else tagged.union(seeds)
    return src.groupby("__pk").map_groups(roll, batch_format="pandas")


def _lag_ranged_shuffle(events, by, order, value, range_span_us, num_partitions):
    ts_col = order[0]
    tagged = _tag_flagged(events, by, ts_col, range_span_us, num_partitions)
    seeds = _row_seed_dataset(tagged, by, order, 1, num_partitions)
    drop = ["__pk", "__rng", "__seed"]

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        grp = s.groupby([by, "__rng"], sort=False, observed=True)
        prev_ts = grp[ts_col].shift(1).to_numpy(dtype=np.float64)
        prev_val = grp[value].shift(1).to_numpy(dtype=np.float64)
        keep = s["__seed"].to_numpy() == 0
        out = s[keep].drop(columns=drop).copy()
        out["prev_ts"] = prev_ts[keep]
        out["prev_value"] = prev_val[keep]
        out["gap_us"] = out[ts_col].to_numpy(dtype=np.float64) - prev_ts[keep]
        return out

    return tagged.union(seeds).groupby("__pk").map_groups(lag, batch_format="pandas")


def _cumsum_ranged_shuffle(events, by, order, value, range_span_us, num_partitions):
    import pyarrow as pa

    from .analytics import _pk_any
    from .joins import _pk2

    ts_col = order[0]
    # every stage on this path emits ARROW blocks: a sort boundary that lands
    # empty emits a zero-column empty block in the UPSTREAM format, and a
    # schema-less empty PANDAS block anywhere in the exchange demotes the
    # whole shuffle to pandas (nulling the sentinel rows' int columns to
    # float64); zero-column ARROW empties concat away cleanly
    tagged = _tag_flagged(events, by, ts_col, range_span_us, num_partitions).map_batches(
        lambda b: b, batch_format="pyarrow"
    )

    def range_sums(g: pd.DataFrame) -> pa.Table:
        out = (
            g.groupby([by, "__rng"], sort=False, as_index=False)[value]
            .sum()
            .rename(columns={value: "s"})
        )
        out["__kpk"] = _pk_any(out[by], num_partitions)
        return pa.Table.from_pandas(out, preserve_index=False)

    sums = tagged.groupby("__pk").map_groups(range_sums, batch_format="pandas")

    # seed rows are SYNTHETIC (a prefix total, not a real event) — build them
    # as typed-null arrow tables matching the tagged schema exactly, so the
    # union stays schema-clean and data-row dtypes survive untouched
    def _pa_type(t):
        # pandas-block datasets report numpy/python dtypes, not pa.DataType
        if isinstance(t, pa.DataType):
            return t
        if t is object or t == np.object_:
            return pa.string()  # object passthrough cols must be strings
        return pa.from_numpy_dtype(np.dtype(t))

    base = events.schema()
    names = list(base.names) + ["__rng", "__pk", "__seed"]
    types = [_pa_type(t) for t in base.types] + [pa.int64(), pa.int64(), pa.int8()]

    def per_key_seeds(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values([by, "__rng"], kind="mergesort")
        grp = s.groupby(by, sort=False)["s"]
        seedv = (grp.cumsum() - s["s"]).to_numpy()
        nz = seedv != 0.0
        sub, seedv = s[nz], seedv[nz]
        n = len(sub)
        arrays = []
        for nm, tp in zip(names, types):
            if nm == by:
                arrays.append(pa.array(sub[by].to_numpy(), type=tp))
            elif nm == value:
                arrays.append(pa.array(seedv, type=tp))
            elif nm == "__rng":
                arrays.append(pa.array(sub["__rng"].to_numpy(), type=tp))
            elif nm == "__pk":
                arrays.append(
                    pa.array(
                        _pk2(
                            sub[by].to_numpy(),
                            sub["__rng"].to_numpy(),
                            num_partitions,
                        ),
                        type=tp,
                    )
                )
            elif nm == "__seed":
                arrays.append(pa.array(np.ones(n, dtype=np.int8), type=tp))
            else:
                arrays.append(pa.nulls(n, tp))
        return pa.Table.from_arrays(arrays, names=names)

    seeds = sums.groupby("__kpk").map_groups(per_key_seeds, batch_format="pandas")
    drop = ["__pk", "__rng", "__seed"]

    def roll(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        flag = pc.equal(g.column("__seed"), 1)
        seed_t = g.filter(flag)
        data = g.filter(pc.invert(flag)).to_pandas()  # no nulls → exact dtypes
        if not len(data):
            return data.assign(running_sum=np.empty(0)).drop(columns=drop)
        local = {
            (k, int(r)): float(v)
            for k, r, v in zip(
                seed_t.column(by).to_pylist(),
                seed_t.column("__rng").to_pylist(),
                seed_t.column(value).to_pylist(),
            )
        }
        s = data.sort_values([by, "__rng", *order], kind="mergesort")
        gb = s.groupby([by, "__rng"], sort=False)
        run = gb[value].cumsum().to_numpy()
        sizes = gb.size().to_numpy()
        seed_per_group = np.array(
            [local.get((k, int(r)), 0.0) for k, r in gb.groups.keys()]
        )
        s = s.drop(columns=drop)
        s["running_sum"] = run + np.repeat(seed_per_group, sizes)
        return s

    return (
        tagged.union(seeds).groupby("__pk").map_groups(roll, batch_format="pyarrow")
    )


def lag_delta(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    value: str = "value",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key LAG: previous row's timestamp/value plus the gap to it —
    ``LAG(x) OVER (PARTITION BY key ORDER BY order)`` semantics.  Adds
    ``prev_ts`` / ``prev_value`` / ``gap_us`` (NaN ≡ SQL NULL on each
    key's first row).

    Shape: ONE hash shuffle of the key over coarse partitions, then a
    per-partition vectorized sort + C-level groupby shift.  Same
    partitioning contract as :func:`rolling_aggregate` (one key fits one
    partition); :func:`lag_delta_ranged` is the event-scale-key escape.
    """
    from .analytics import _pk_any

    ts_col = order[0]

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, *order], kind="mergesort").drop(columns="__pk")
        grp = s.groupby(by, sort=False)
        s["prev_ts"] = grp[ts_col].shift(1)
        s["prev_value"] = grp[value].shift(1)
        s["gap_us"] = s[ts_col].to_numpy(dtype=np.float64) - s["prev_ts"].to_numpy()
        return s

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def lag_delta_ranged(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    value: str = "value",
    range_span_us: int = 86_400_000_000,
    num_partitions: int = 64,
    seed_mode: str = "broadcast",
) -> ray.data.Dataset:
    """The event-scale-key LAG path: identical output contract to
    :func:`lag_delta`, partitioned by (key, time-range) so no partition
    ever holds more than one key's one time range.  Boundary state is each
    (key, range)'s LAST row, reduced to a per-(key, range) predecessor row
    on the small candidate table and broadcast (the rolling_aggregate_ranged
    two-phase pattern with w = 2); ``seed_mode="shuffle"`` delivers the same
    predecessor rows through the exchange instead (zero driver state)."""
    import ray as _ray

    from .joins import _pk2

    if seed_mode == "shuffle":
        return _lag_ranged_shuffle(
            events, by, order, value, range_span_us, num_partitions
        )

    ts_col = order[0]

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        rng = batch[ts_col].to_numpy().astype(np.int64) // np.int64(range_span_us)
        out["__rng"] = rng
        out["__pk"] = _pk2(batch[by].to_numpy(), rng, num_partitions)
        return out

    tagged = events.map_batches(tag, batch_format="pandas")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        return s.groupby([by, "__rng"], sort=False, observed=True).tail(1)

    cand = tagged.groupby("__pk").map_groups(candidates, batch_format="pandas").to_pandas()
    # one row per (key, range) (candidates emits tail(1)) → the predecessor
    # of range r is simply the previous row of the key: one sorted shift,
    # O(#(key, range)) total, not O(ranges²) per key
    cand = cand.sort_values([by, "__rng", *order], kind="mergesort")
    grp = cand.groupby(by, sort=False)
    prev_ts_col = grp[ts_col].shift(1)
    prev_val_col = grp[value].shift(1)
    seeds: dict[tuple, tuple] = {
        (k, int(r)): (float(t), float(v))
        for k, r, t, v in zip(cand[by], cand["__rng"], prev_ts_col, prev_val_col)
        if not np.isnan(t)
    }
    seeds_ref = _ray.put(seeds)
    _cache: dict = {}

    def lag_range(g: pd.DataFrame) -> pd.DataFrame:
        if "seeds" not in _cache:
            _cache["seeds"] = _ray.get(seeds_ref)
        all_seeds = _cache["seeds"]
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        grp = s.groupby([by, "__rng"], sort=False, observed=True)
        prev_ts = grp[ts_col].shift(1).to_numpy(dtype=np.float64)
        prev_val = grp[value].shift(1).to_numpy(dtype=np.float64)
        # splice the broadcast predecessor into each (key, range)'s first row
        firsts = np.flatnonzero(grp.cumcount().to_numpy() == 0)
        for i in firsts:  # O(#(key, range) per partition) — dimension-scale
            seed = all_seeds.get((s[by].iloc[i], int(s["__rng"].iloc[i])))
            if seed is not None:
                prev_ts[i], prev_val[i] = seed
        s = s.drop(columns=["__pk", "__rng"])
        s["prev_ts"] = prev_ts
        s["prev_value"] = prev_val
        s["gap_us"] = s[ts_col].to_numpy(dtype=np.float64) - prev_ts
        return s

    return tagged.groupby("__pk").map_groups(lag_range, batch_format="pandas")


def cumulative_sum(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    value: str = "value",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key running total — ``SUM(value) OVER (PARTITION BY key ORDER BY
    order ROWS UNBOUNDED PRECEDING)``.  Adds ``running_sum``.  One hash
    shuffle + per-partition vectorized groupby cumsum; accumulation order
    is the key's global order on both engine and SQL sides, so the float
    sums agree term-for-term.  Same one-key-one-partition contract as
    rolling_aggregate (cumulative state is inherently sequential; a ranged
    escape would carry per-range prefix sums — the rolling_aggregate_ranged
    boundary pattern with a single scalar seed)."""
    from .analytics import _pk_any

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, *order], kind="mergesort").drop(columns="__pk")
        s["running_sum"] = s.groupby(by, sort=False)[value].cumsum()
        return s

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(final, batch_format="pandas")
    )


def cumulative_sum_ranged(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    value: str = "value",
    range_span_us: int = 86_400_000_000,
    num_partitions: int = 64,
    seed_mode: str = "broadcast",
) -> ray.data.Dataset:
    """The event-scale-key running-total path: identical output contract to
    :func:`cumulative_sum`, partitioned by (key, time-range).  Boundary
    state is ONE scalar per (key, range): the sum of all earlier ranges —
    per-(key, range) sums are candidate-scale, prefix-summed on the small
    candidate table and broadcast.  ``seed_mode="shuffle"`` computes the
    per-key prefix distributed and ships the scalars as typed-null sentinel
    rows through the exchange — zero driver state at any cardinality.

    Float caveat (documented, pinned by pytest): the seed folds an entire
    prefix into one scalar, so results equal the one-shot path up to float
    summation regrouping — exact for the pytest's round(4) values, and the
    correct trade at scale (the alternative ships every prior row).
    """
    import ray as _ray

    from .joins import _pk2

    if seed_mode == "shuffle":
        return _cumsum_ranged_shuffle(
            events, by, order, value, range_span_us, num_partitions
        )

    ts_col = order[0]

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        rng = batch[ts_col].to_numpy().astype(np.int64) // np.int64(range_span_us)
        out["__rng"] = rng
        out["__pk"] = _pk2(batch[by].to_numpy(), rng, num_partitions)
        return out

    tagged = events.map_batches(tag, batch_format="pandas")

    def range_sums(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby([by, "__rng"], sort=False, as_index=False)[value]
            .sum()
            .rename(columns={value: "s"})
        )

    sums = tagged.groupby("__pk").map_groups(range_sums, batch_format="pandas").to_pandas()
    sums = sums.sort_values([by, "__rng"], kind="mergesort")
    grp = sums.groupby(by, sort=False)["s"]
    seeds_df = sums.assign(seed=grp.cumsum() - sums["s"])
    seeds = {
        (k, int(r)): float(sd)
        for k, r, sd in zip(seeds_df[by], seeds_df["__rng"], seeds_df["seed"])
        if sd != 0.0
    }
    seeds_ref = _ray.put(seeds)
    _cache: dict = {}

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        if "seeds" not in _cache:
            _cache["seeds"] = _ray.get(seeds_ref)
        all_seeds = _cache["seeds"]
        s = g.sort_values([by, "__rng", *order], kind="mergesort")
        gb = s.groupby([by, "__rng"], sort=False)
        run = gb[value].cumsum().to_numpy()
        sizes = gb.size().to_numpy()
        # per-GROUP seed lookup (dimension-scale), repeated out to rows
        seed_per_group = np.array(
            [all_seeds.get((k, int(r)), 0.0) for k, r in gb.groups.keys()]
        )
        s = s.drop(columns=["__pk", "__rng"])
        s["running_sum"] = run + np.repeat(seed_per_group, sizes)
        return s

    return tagged.groupby("__pk").map_groups(roll, batch_format="pandas")


def transition_counts(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    state: str = "event_type",
    num_partitions: int = 64,
    prob_unit: int = 1_000_000,
) -> pd.DataFrame:
    """Markov transition matrix over per-key event sequences:
    ``(state, next-state)`` successor pairs under ``LEAD(state) OVER
    (PARTITION BY key ORDER BY order)``, globally counted, with the
    row-conditional probability in exact integer micro units
    (``n_trans · 1e6 // total_from_src`` — integer division, so the SQL
    mirror pins every value).

    Shape: ONE hash shuffle of the key over coarse partitions; inside each
    partition a vectorized sort + C-level groupby shift produces pairs and
    immediately reduces them to per-partition (src, dst) partial counts —
    ≤ |states|² rows per partition leave the stage, so the global groupby
    and the final probability pass run at transition-matrix scale.

    Partitioning contract: one key's rows fit one partition (the
    :func:`lag_delta` contract); the OUTPUT is |states|²-bounded, which is
    the documented driver-side contract (state alphabets are
    dimension-scale — event kinds, languages, shard labels)."""
    from ray.data.aggregate import Sum

    from .analytics import _pk_any

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def pairs_partial(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values([by, *order], kind="mergesort")
        nxt = s.groupby(by, sort=False)[state].shift(-1)
        keep = nxt.notna().to_numpy()
        part = (
            pd.DataFrame({"src": s[state].to_numpy()[keep], "dst": nxt.to_numpy()[keep]})
            .groupby(["src", "dst"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "src": pa.array(part["src"], type=pa.large_string()),
                "dst": pa.array(part["dst"], type=pa.large_string()),
                "n": pa.array(part["n"].to_numpy(np.int64), type=pa.int64()),
            }
        )

    counts = (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(pairs_partial, batch_format="pandas")
        .groupby(["src", "dst"])
        .aggregate(Sum("n", alias_name="n_trans"))
        .to_pandas()  # |states|² rows by construction — bounded contract
    )
    counts = counts.sort_values(["src", "dst"], kind="mergesort").reset_index(drop=True)
    tot = counts.groupby("src", sort=False)["n_trans"].transform("sum").to_numpy(np.int64)
    n = counts["n_trans"].to_numpy(np.int64)
    counts["p_micro"] = n * np.int64(prob_unit) // tot
    counts["n_trans"] = n
    return counts


def group_ntile(
    events: ray.data.Dataset,
    by: str = "event_type",
    order: tuple[str, ...] = ("value", "event_id"),
    n_tiles: int = 4,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``NTILE(n) OVER (PARTITION BY key ORDER BY order)``: per-key rank →
    tile id via the exact SQL sizing rule (the first ``cnt % n`` tiles get
    ``cnt // n + 1`` rows) — pure integer arithmetic, so the mirror pins
    every value.

    Shape: ONE hash shuffle of the key over coarse partitions; rank AND
    per-key count both come from the partition-local sort (one key lives
    in one partition — the :func:`lag_delta` contract), so no second pass
    or broadcast is needed."""
    from .analytics import _pk_any

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, *order], kind="mergesort").drop(columns="__pk")
        grp = s.groupby(by, sort=False)
        r = grp.cumcount().to_numpy(np.int64)  # 0-based rank
        cnt = grp[order[0]].transform("size").to_numpy(np.int64)
        q, rem = cnt // n_tiles, cnt % n_tiles
        big = rem * (q + 1)  # rows covered by the (q+1)-sized leading tiles
        in_big = r < big
        safe_q = np.maximum(q, 1)  # q==0 only when every row is in a big tile
        s["tile"] = np.where(in_big, r // (q + 1), rem + (r - big) // safe_q) + 1
        return s

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(tile, batch_format="pandas")
    )


def group_percent_rank(
    events: ray.data.Dataset,
    by: str = "event_type",
    order: tuple[str, ...] = ("value", "event_id"),
    num_partitions: int = 64,
    unit: int = 1_000_000,
) -> ray.data.Dataset:
    """``PERCENT_RANK() OVER (PARTITION BY key ORDER BY order)`` in exact
    integer micro units: ``(rank − 1) · 1e6 // (cnt − 1)`` (singleton keys
    → 0, the SQL convention).  Same one-shuffle partition-local shape as
    :func:`group_ntile`; note SQL ``rank()`` gives TIES the same rank —
    the ``order`` columns here include a unique tiebreaker by contract, so
    row_number == rank (assert-free: document at the call site)."""
    from .analytics import _pk_any

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([by, *order], kind="mergesort").drop(columns="__pk")
        grp = s.groupby(by, sort=False)
        r = grp.cumcount().to_numpy(np.int64)  # rank − 1
        cnt = grp[order[0]].transform("size").to_numpy(np.int64)
        s["pct_rank_micro"] = np.where(cnt > 1, r * np.int64(unit) // np.maximum(cnt - 1, 1), 0)
        return s

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(pr, batch_format="pandas")
    )


def path_counts(
    events: ray.data.Dataset,
    by: str = "user_id",
    order: tuple[str, ...] = ("ts_us", "event_id"),
    state: str = "event_type",
    length: int = 3,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Common event PATHS: every length-``length`` window of consecutive
    states per key (LEAD chains), globally counted — the k-gram
    generalization of :func:`transition_counts`, same combiner contract
    (≤ |states|^length partial rows leave each partition; state alphabets
    are dimension-scale)."""
    from ray.data.aggregate import Sum

    from .analytics import _pk_any

    cols = [f"e{i + 1}" for i in range(length)]

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def partial(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values([by, *order], kind="mergesort")
        grp = s.groupby(by, sort=False)[state]
        frame = {cols[0]: s[state]}
        keep = np.ones(len(s), dtype=bool)
        for i in range(1, length):
            nxt = grp.shift(-i)
            frame[cols[i]] = nxt
            keep &= nxt.notna().to_numpy()
        df = pd.DataFrame(frame)[keep]
        part = df.groupby(cols, sort=False).size().reset_index(name="n")
        return pa.table(
            {
                **{c: pa.array(part[c], type=pa.large_string()) for c in cols},
                "n": pa.array(part["n"].to_numpy(np.int64), type=pa.int64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(partial, batch_format="pandas")
        .groupby(cols)
        .aggregate(Sum("n", alias_name="n_paths"))
        .to_pandas()  # ≤ |states|^length rows — bounded contract
        .sort_values(cols)
        .reset_index(drop=True)
        .astype({"n_paths": "int64"})
    )


def session_copairs(
    events: ray.data.Dataset,
    gap_s: int = 1800,
    by: str = "user_id",
    ts: str = "ts_us",
    state: str = "event_type",
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Market-basket pairs over gap sessions: for every unordered pair of
    distinct states, the number of SESSIONS containing both — the pairwise
    frequent-itemset primitive.

    Session identity depends only on per-key sorted timestamp gaps (ties
    cannot create or destroy a gap), so the engine's partition-local sid
    matches any ordering the SQL mirror picks.  Per partition: one sort,
    vectorized gap/sid derivation, distinct (key, sid, state), then a
    within-partition self-merge on the session id emits ≤ |states|²
    partial pair counts (the transition_counts combiner contract — all of
    one key's rows co-locate, so sessions never straddle partitions)."""
    from ray.data.aggregate import Sum

    from .analytics import _pk_any

    gap_us = np.int64(gap_s) * np.int64(1_000_000)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["__pk"] = _pk_any(batch[by], num_partitions)
        return out

    def pairs_partial(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values([by, ts], kind="mergesort")
        t = s[ts].to_numpy(np.int64)
        u = s[by].to_numpy(np.int64)
        new_user = np.empty(len(s), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        brk = new_user.copy()
        if len(s) > 1:
            brk[1:] |= (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(brk)  # globally unique within the partition
        st = pd.DataFrame({"sid": sid, "st": s[state].to_numpy()}).drop_duplicates()
        m = st.merge(st, on="sid")
        m = m[m["st_x"] < m["st_y"]]
        part = m.groupby(["st_x", "st_y"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "type_a": pa.array(part["st_x"], type=pa.large_string()),
                "type_b": pa.array(part["st_y"], type=pa.large_string()),
                "n": pa.array(part["n"].to_numpy(np.int64), type=pa.int64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(pairs_partial, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_sessions"))
        .to_pandas()  # ≤ |states|² rows — bounded contract
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
        .astype({"n_sessions": "int64"})
    )
