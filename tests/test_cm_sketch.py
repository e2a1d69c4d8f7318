"""Count-min sketch: pinned against a scalar dict reference + the classic
overestimate guarantee."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.functions.hashing import mix64
from searty_ray.stages import analytics


@pytest.fixture(scope="module")
def keyed_rows(ray_session):
    # zipf-ish: key k appears ~ 200 // (k+1) times
    rows = []
    for k in range(40):
        rows.extend({"user_id": k} for _ in range(200 // (k + 1)))
    return rows


def test_cm_sketch_matches_scalar_reference(keyed_rows, ray_session):
    W, D = 64, 3
    ds = ray.data.from_items(keyed_rows).repartition(6)
    got = (
        analytics.cm_sketch(ds, "user_id", width=W, depth=D)
        .to_pandas()
        .sort_values(["d", "bucket"])
        .reset_index(drop=True)
    )
    # scalar reference: one increment per row per depth
    cells = np.zeros((D, W), dtype=np.int64)
    for r in keyed_rows:
        for d, s in enumerate(analytics._cm_salts(D, analytics.CM_SALT)):
            h = int(mix64(np.array([r["user_id"]], dtype=np.int64).view(np.uint64) ^ np.uint64(s))[0])
            cells[d][h % W] += 1
    want = [
        {"d": d, "bucket": w, "cnt": int(cells[d, w])}
        for d in range(D)
        for w in range(W)
        if cells[d, w]
    ]
    pd.testing.assert_frame_equal(got, pd.DataFrame(want).astype("int64"))


def test_cm_estimates_overcount_only(keyed_rows, ray_session):
    W, D = 64, 3
    ds = ray.data.from_items(keyed_rows).repartition(4)
    sk = analytics.cm_sketch(ds, "user_id", width=W, depth=D).to_pandas()
    keys = np.arange(40, dtype=np.int64)
    est = analytics.cm_estimate(sk, keys, width=W, depth=D)
    true = np.array([200 // (k + 1) for k in range(40)], dtype=np.int64)
    assert (est >= true).all()  # CM never undercounts
    n = true.sum()
    assert (est - true).max() <= n  # sanity bound
    # layout stability: same sketch at a different block layout
    sk2 = analytics.cm_sketch(
        ray.data.from_items(keyed_rows).repartition(11), "user_id", width=W, depth=D
    ).to_pandas()
    pd.testing.assert_frame_equal(
        sk.sort_values(["d", "bucket"]).reset_index(drop=True),
        sk2.sort_values(["d", "bucket"]).reset_index(drop=True),
    )
    # mergeability: sketch(A ∪ B) == sketch(A) + sketch(B) elementwise
    half = len(keyed_rows) // 2
    a = analytics.cm_sketch(ray.data.from_items(keyed_rows[:half]), "user_id", width=W, depth=D).to_pandas()
    b = analytics.cm_sketch(ray.data.from_items(keyed_rows[half:]), "user_id", width=W, depth=D).to_pandas()
    merged = (
        pd.concat([a, b]).groupby(["d", "bucket"], as_index=False)["cnt"].sum()
        .sort_values(["d", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged, sk.sort_values(["d", "bucket"]).reset_index(drop=True)
    )


def test_retention_cohorts_matches_pandas(ray_session):
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    # user u first appears on day u % 5, then is active every u%3+1 days
    for u in range(30):
        for k in range(6):
            day = (u % 5) + k * (u % 3 + 1)
            rows.append({"user_id": u, "ts": base + datetime.timedelta(days=day, seconds=u)})
    ds = ray.data.from_items(rows).repartition(5)
    got = (
        analytics.retention_cohorts(ds)
        .to_pandas()
        .sort_values(["cohort", "bucket"])
        .reset_index(drop=True)
        .astype("int64")
    )
    df = pd.DataFrame(rows)
    df["bucket"] = (df["ts"].astype("datetime64[us]").astype(np.int64) // analytics.RETENTION_SPAN_US)
    pairs = df[["user_id", "bucket"]].drop_duplicates()
    first = pairs.groupby("user_id")["bucket"].min().rename("cohort")
    want = (
        pairs.join(first, on="user_id")
        .groupby(["cohort", "bucket"], as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
        .sort_values(["cohort", "bucket"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
    # diagonal completeness: every cohort counts itself at bucket == cohort
    diag = got[got["cohort"] == got["bucket"]]
    assert set(diag["cohort"]) == set(first.unique())
