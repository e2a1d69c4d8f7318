"""Join-suite tests against brute-force pandas oracles: asof_join vs a
single global merge_asof (skewed key, right-side ties, equal-timestamp
matches, unmatched-left nulls); broadcast/hash equi-joins vs pd.merge;
range_join vs a cross-join filter, including intervals spanning many
buckets and partition/bucket-width invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.stages.joins import asof_join, broadcast_join, hash_join, range_join


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


# ---------------------------------------------------------------------------
# equi-joins
# ---------------------------------------------------------------------------


def _facts_dims(seed: int = 11, n: int = 300):
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    facts = pd.DataFrame(
        {
            "fid": np.arange(n, dtype=np.int64),
            # key 99 never exists in the dimension → exercises misses
            "key": np.where(rng.random(n) < 0.1, 99, rng.integers(0, 20, n)).astype(np.int64),
            "x": np.round(rng.random(n), 3),
        }
    )
    dims = pd.DataFrame(
        {
            "dkey": np.arange(20, dtype=np.int64),
            "name": [f"d{i}" for i in range(20)],
            "weight": np.arange(20, dtype=np.int64) * 10,
        }
    )
    return facts, pa.Table.from_pandas(dims, preserve_index=False), dims


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_pandas(ray_session, how):
    facts, dims_t, dims = _facts_dims()
    got = (
        broadcast_join(
            ray.data.from_pandas(facts).repartition(7),
            dims_t,
            on="key",
            right_on="dkey",
            how=how,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("fid")
        .reset_index(drop=True)
    )
    want = facts.merge(dims, left_on="key", right_on="dkey", how=how)
    want = want.sort_values("fid").reset_index(drop=True)
    if how == "left":
        assert got["dkey"].isna().sum() > 0, "fixture must exercise misses"
        want = want.astype({"dkey": "Int64", "weight": "Int64"})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_semi_and_anti_join_match_pandas(ray_session):
    """semi/anti join vs pandas isin ground truth: left rows pass through
    unchanged (no right columns), duplicates on the right don't multiply
    left rows, and semi + anti partition the left exactly."""
    from searty_ray.stages.joins import anti_join, semi_join

    rng = np.random.default_rng(31)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 400).astype(np.int64),
            "payload": rng.random(400),
        }
    )
    # right has duplicate keys and keys absent from left
    right = pd.DataFrame({"rk": rng.integers(25, 80, 300).astype(np.int64), "junk": 1})
    lds = ray.data.from_pandas(left).repartition(7)
    rds = ray.data.from_pandas(right).repartition(5)

    semi = semi_join(lds, rds, on="k", right_on="rk", num_partitions=4).to_pandas()
    anti = anti_join(lds, rds, on="k", right_on="rk", num_partitions=4).to_pandas()

    keys = set(right["rk"])
    want_semi = left[left["k"].isin(keys)]
    want_anti = left[~left["k"].isin(keys)]
    srt = lambda d: d.sort_values(["k", "payload"]).reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(srt(semi)[["k", "payload"]], srt(want_semi))
    pd.testing.assert_frame_equal(srt(anti)[["k", "payload"]], srt(want_anti))
    assert len(semi) + len(anti) == len(left)
    assert list(semi.columns) == ["k", "payload"]  # no right columns leak


def test_hash_join_matches_pandas(ray_session):
    facts, _, dims = _facts_dims()
    got = (
        hash_join(
            ray.data.from_pandas(facts).repartition(5),
            ray.data.from_pandas(dims),
            on="key",
            right_on="dkey",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["fid"])
        .reset_index(drop=True)
    )
    want = (
        facts.merge(dims, left_on="key", right_on="dkey", how="inner")
        .drop(columns="dkey")  # Ray's native join keeps only the left key
        .sort_values("fid")
        .reset_index(drop=True)
    )
    got = got[list(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def _range_fixture(seed: int = 13, n_left: int = 500, n_right: int = 120):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "eid": np.arange(n_left, dtype=np.int64),
            "ts_us": rng.integers(0, 10_000, n_left).astype(np.int64),
            "user_id": rng.integers(0, 15, n_left).astype(np.int64),
            "value": np.round(rng.random(n_left), 3),
        }
    )
    start = rng.integers(0, 9_000, n_right).astype(np.int64)
    # interval lengths from 1 µs up to many times the bucket width
    length = rng.integers(1, 5_000, n_right).astype(np.int64)
    right = pd.DataFrame(
        {
            "iid": np.arange(n_right, dtype=np.int64),
            "user_id": rng.integers(0, 15, n_right).astype(np.int64),
            "start_us": start,
            "end_us": start + length,
        }
    )
    return left, right


def _range_oracle(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    r = right.rename(columns={"iid": "r_iid", "start_us": "r_start_us", "end_us": "r_end_us"})
    out = left.merge(r, on="user_id", how="inner")
    out = out[(out["r_start_us"] <= out["ts_us"]) & (out["ts_us"] < out["r_end_us"])]
    return out.sort_values(["eid", "r_iid"]).reset_index(drop=True)


@pytest.mark.parametrize("num_partitions,bucket_us", [(1, 500), (8, 1000), (64, 100)])
def test_range_join_matches_bruteforce(ray_session, num_partitions, bucket_us):
    left, right = _range_fixture()
    got = (
        range_join(
            ray.data.from_pandas(left).repartition(6),
            ray.data.from_pandas(right).repartition(3),
            on="ts_us",
            by="user_id",
            start="start_us",
            end="end_us",
            right_prefix="r_",
            bucket_us=bucket_us,
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values(["eid", "r_iid"])
        .reset_index(drop=True)
    )
    want = _range_oracle(left, right)
    assert len(want) > 100, "fixture must produce a real match set"
    got = got[list(want.columns)].astype(want.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_end_exclusive_and_no_dup_pairs(ray_session):
    # one interval exactly on a bucket edge; one long interval spanning 5
    # buckets; matched pairs must be unique and end-exclusive
    left = pd.DataFrame(
        {
            "eid": np.arange(6, dtype=np.int64),
            "ts_us": np.array([99, 100, 250, 499, 500, 750], dtype=np.int64),
            "user_id": np.zeros(6, dtype=np.int64),
            "value": np.ones(6),
        }
    )
    right = pd.DataFrame(
        {
            "iid": np.array([0, 1], dtype=np.int64),
            "user_id": np.zeros(2, dtype=np.int64),
            "start_us": np.array([0, 100], dtype=np.int64),
            "end_us": np.array([100, 600], dtype=np.int64),  # iid=1 spans 5 buckets
        }
    )
    got = (
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="ts_us",
            by="user_id",
            start="start_us",
            end="end_us",
            right_prefix="r_",
            bucket_us=100,
        )
        .to_pandas()
        .sort_values(["eid", "r_iid"])
        .reset_index(drop=True)
    )
    want = _range_oracle(left, right)
    assert not got.duplicated(["eid", "r_iid"]).any()
    # ts=99 → iid 0 only; ts=100 → iid 1 (end-exclusive on iid 0); ts=500 in
    assert list(zip(want["eid"], want["r_iid"])) == [(0, 0), (1, 1), (2, 1), (3, 1), (4, 1)]
    got = got[list(want.columns)].astype(want.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_ranged_equals_oneshot(ray_session):
    """The both-sides-event-scale path (range partition + latest-right
    boundary seed) equals the one-shot asof_join exactly — skewed key,
    ties, left rows in ranges with no right rows (seed from earlier
    ranges), and unmatched-left nulls."""
    from searty_ray.stages.joins import asof_join_ranged

    df = _mk_events(seed=9, n=600)
    left = df[df["event_id"] % 3 != 0].reset_index(drop=True)
    right = df[df["event_id"] % 3 == 0].reset_index(drop=True)
    kw = dict(on="ts_us", by="user_id", right_prefix="r_", dedup_id="event_id")
    want = (
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right), **kw)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    got = (
        asof_join_ranged(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            range_span_us=7,  # ts in [0, 50) → ~7 ranges, many left-only cells
            **kw,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert int(want["r_ts_us"].isna().sum()) > 0, "fixture must exercise unmatched rows"
    got = got[list(want.columns)]
    pd.testing.assert_frame_equal(
        got.astype({"r_ts_us": "Float64", "r_value": "Float64"}),
        want.astype({"r_ts_us": "Float64", "r_value": "Float64"}),
        check_dtype=False,
    )
