"""seed_mode="shuffle" (fully distributed ranged-window boundary seeds —
SCALE.md known-limit 5) pinned equal to the broadcast path and the one-shot
path on a skewed corpus, dtypes included."""

import numpy as np
import pandas as pd
import ray.data

from searty_ray.stages.windows import (
    cumulative_sum_ranged,
    lag_delta_ranged,
    rolling_aggregate_ranged,
)

SPAN = 500  # ~20 ranges over the ts domain below


def _events(n=900, seed=21) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "ts_us": rng.integers(0, 10_000, n).astype(np.int64),
            "value": np.round(rng.random(n) * 10, 3),
            "label": rng.choice(["a", "b", "c"], n),  # passthrough col
        }
    )
    df.loc[: n // 2, "user_id"] = 1  # skewed key spanning many ranges
    assert df.loc[df["user_id"] == 1, "ts_us"].floordiv(SPAN).nunique() > 10
    return df


def _run(fn, ds, **kw) -> pd.DataFrame:
    return fn(ds, order=("ts_us", "event_id"), **kw).to_pandas().sort_values(
        "event_id"
    ).reset_index(drop=True)


def test_rolling_shuffle_seeds_equal_broadcast(ray_session):
    ds = ray.data.from_pandas(_events()).repartition(7)
    a = _run(rolling_aggregate_ranged, ds, window_rows=5, range_span_us=SPAN)
    b = _run(
        rolling_aggregate_ranged, ds, window_rows=5, range_span_us=SPAN,
        seed_mode="shuffle",
    )
    pd.testing.assert_frame_equal(b[list(a.columns)], a)


def test_lag_shuffle_seeds_equal_broadcast(ray_session):
    ds = ray.data.from_pandas(_events(seed=5)).repartition(7)
    a = _run(lag_delta_ranged, ds, range_span_us=SPAN)
    b = _run(lag_delta_ranged, ds, range_span_us=SPAN, seed_mode="shuffle")
    pd.testing.assert_frame_equal(b[list(a.columns)], a)


def test_cumsum_shuffle_seeds_equal_broadcast(ray_session):
    ds = ray.data.from_pandas(_events(seed=9)).repartition(7)
    a = _run(cumulative_sum_ranged, ds, range_span_us=SPAN)
    b = _run(cumulative_sum_ranged, ds, range_span_us=SPAN, seed_mode="shuffle")
    # identical partition structure on both paths → identical float grouping
    pd.testing.assert_frame_equal(
        b[list(a.columns)].drop(columns="running_sum"), a.drop(columns="running_sum")
    )
    np.testing.assert_allclose(
        b["running_sum"].to_numpy(), a["running_sum"].to_numpy(), rtol=1e-9
    )
    # dtype survival through the typed-null sentinel union
    assert b["event_id"].dtype == np.int64 and b["ts_us"].dtype == np.int64
    assert b["label"].dtype == object


def test_rolling_shuffle_single_range_and_empty_seeds(ray_session):
    """window_rows=1 (no seeds at all) and one-range data (no prefixes)."""
    df = _events(n=120, seed=3)
    df["ts_us"] = df["ts_us"] % SPAN  # everything in range 0
    ds = ray.data.from_pandas(df).repartition(4)
    a = _run(rolling_aggregate_ranged, ds, window_rows=1, range_span_us=SPAN)
    b = _run(
        rolling_aggregate_ranged, ds, window_rows=1, range_span_us=SPAN,
        seed_mode="shuffle",
    )
    pd.testing.assert_frame_equal(b[list(a.columns)], a)
