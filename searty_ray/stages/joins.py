"""As-of join — a custom temporal operator Ray Data lacks (driver
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
import ray.data

NUM_PARTITIONS = 64

# Fibonacci multiplier (public-domain splitmix/Knuth constant) — cheap
# vectorized int64-key scatter; same family the id-hash kernels use.
_MIX = np.uint64(0x9E3779B97F4A7C15)


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
