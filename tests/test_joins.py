"""asof_join vs a single global pandas merge_asof oracle — including a
skewed key, (by, ts) ties on the right, equal-timestamp matches, and
left rows with no preceding right row (null outputs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.stages.joins import asof_join


def _mk_events(seed: int = 7, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # skew: user 3 owns half of all rows; ties: ts drawn from a SMALL range
    users = np.where(rng.random(n) < 0.5, 3, rng.integers(0, 12, n))
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts_us": rng.integers(0, 50, n).astype(np.int64),
            "user_id": users.astype(np.int64),
            "value": np.round(rng.random(n) * 100, 2),
        }
    )
    return df


def _oracle(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    r = right.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    r = r.drop_duplicates(["user_id", "ts_us"], keep="first")
    r = r[["user_id", "ts_us", "value"]].rename(columns={"ts_us": "r_ts_us", "value": "r_value"})
    r["ts_us"] = r["r_ts_us"]
    out = pd.merge_asof(
        left.sort_values("ts_us", kind="mergesort"),
        r.sort_values("ts_us", kind="mergesort"),
        on="ts_us",
        by="user_id",
        direction="backward",
    )
    return out.sort_values("event_id").reset_index(drop=True)


@pytest.mark.parametrize("num_partitions", [1, 8, 64])
def test_asof_join_matches_global_merge_asof(ray_session, num_partitions):
    df = _mk_events()
    left = df[df["event_id"] % 3 != 0].reset_index(drop=True)
    right = df[df["event_id"] % 3 == 0].reset_index(drop=True)
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="ts_us",
            by="user_id",
            right_prefix="r_",
            dedup_id="event_id",
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _oracle(left, right)
    assert int(got["r_ts_us"].isna().sum()) > 0, "fixture must exercise unmatched rows"
    pd.testing.assert_frame_equal(
        got.astype({"r_ts_us": "Float64", "r_value": "Float64"}),
        want.astype({"r_ts_us": "Float64", "r_value": "Float64"}),
        check_dtype=False,
    )


def test_asof_join_schema_mismatch_raises(ray_session):
    df = _mk_events(n=10)
    with pytest.raises(ValueError):
        asof_join(
            ray.data.from_pandas(df),
            ray.data.from_pandas(df.drop(columns=["value"])),
        )
