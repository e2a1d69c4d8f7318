"""Windowed aggregates over a stream-shaped table (driver instructions:
"windowed aggregate / streaming window" custom operators).

Ray Data is a batch engine (the reference has no streaming either,
SURVEY.md §2.9), so windows are expressed batch-style over the ordered
``events`` log:

* tumbling — window key computed per row in ``map_batches`` (vectorized),
  partial per-batch aggregation, then one small ``groupby`` over partials:
  the pre-aggregate pattern, so the shuffle moves one row per
  (key, window, batch) instead of per event.
* session — ``groupby(user).map_groups``: gap-based sessionization inside
  each sorted group (the partitioning assumption: one user's events fit one
  group; salt by time-range per user if a user exceeds that at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Sum


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


def sessionize(
    events: ray.data.Dataset, gap_s: int = 1800
) -> ray.data.Dataset:
    """→ (user_id, session_start_us, n_events, duration_us): gap-based
    sessions per user (new session when ts - prev_ts > gap)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("datetime64[us]").astype("int64").sort_values().to_numpy()
        gaps = np.diff(ts, prepend=ts[0])
        new = gaps > gap_s * 1_000_000
        new[0] = True
        sid = np.cumsum(new) - 1
        out = pd.DataFrame({"sid": sid, "ts": ts}).groupby("sid").agg(
            session_start_us=("ts", "min"), session_end_us=("ts", "max"), n_events=("ts", "size")
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].iloc[0],
                "session_start_us": out["session_start_us"],
                "n_events": out["n_events"],
                "duration_us": out["session_end_us"] - out["session_start_us"],
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
