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


def test_bloom_no_false_negatives_and_layout_stable(ray_session):
    from searty_ray.stages.analytics import bloom_bits, bloom_prefilter

    rng = np.random.default_rng(21)
    build_keys = np.unique(rng.integers(0, 10_000, 800).astype(np.int64))
    probe_keys = np.arange(0, 12_000, dtype=np.int64)
    build_df = pd.DataFrame({"k": build_keys})
    probe_df = pd.DataFrame({"k": probe_keys})

    bits = (
        bloom_bits(ray.data.from_pandas(build_df, override_num_blocks=4), "k", m_bits=512, k=3)
        .to_pandas()
        .sort_values(["d", "bit"])
        .reset_index(drop=True)
    )
    bits2 = (
        bloom_bits(ray.data.from_pandas(build_df, override_num_blocks=1), "k", m_bits=512, k=3)
        .to_pandas()
        .sort_values(["d", "bit"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bits, bits2)  # layout-invariant bit set

    hits = set(
        bloom_prefilter(
            ray.data.from_pandas(probe_df, override_num_blocks=3), bits, "k", m_bits=512, k=3
        )
        .to_pandas()["k"]
        .tolist()
    )
    members = set(build_keys.tolist())
    assert members <= hits  # NO false negatives, ever
    # 512 bits / ~760 keys is saturated enough to see false positives but
    # still reject a meaningful share of non-members
    non_members = set(probe_keys.tolist()) - members
    fp = len(hits - members) / len(non_members)
    assert fp < 1.0 and len(hits - members) > 0


def test_group_mode_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.analytics import group_mode

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, 900).astype(np.int64),
            "event_type": rng.choice(["view", "click", "buy"], 900),
        }
    )
    got = (
        group_mode(ray.data.from_pandas(df, override_num_blocks=4), "user_id", "event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)[["user_id", "mode_value", "n_mode"]]
        .astype({"user_id": "int64", "n_mode": "int64"})
    )
    ref = duckdb.sql(
        """
        WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
                   FROM df GROUP BY user_id, event_type),
        r AS (SELECT user_id, event_type AS mode_value, n AS n_mode,
                     row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
              FROM c)
        SELECT user_id, mode_value, n_mode FROM r WHERE rk = 1 ORDER BY user_id
        """
    ).df().astype({"user_id": "int64", "n_mode": "int64"})
    pd.testing.assert_frame_equal(got, ref)
