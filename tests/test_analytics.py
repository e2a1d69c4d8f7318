"""Grouped-analytics operators vs brute-force pandas/numpy oracles, plus
the composed corpus_prep pipeline's structural contracts (the value-level
check is the gate's full SQL mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.stages.analytics import (
    approx_distinct_per_group,
    distinct_per_group,
    group_quantiles,
    pivot_counts,
    sum_topk,
    topk_per_group,
)


def _orders(seed: int = 5, n: int = 700) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "oid": np.arange(n, dtype=np.int64),
            # few-order keys exist (k > group size) and one hot key
            "cust": np.where(rng.random(n) < 0.3, 1, rng.integers(0, 80, n)).astype(np.int64),
            # duplicate prices force tie-breaks
            "price": rng.integers(0, 50, n).astype(np.float64),
        }
    )


def _topk_oracle(df: pd.DataFrame, k: int) -> pd.DataFrame:
    s = df.sort_values(["cust", "price", "oid"], ascending=[True, False, True], kind="mergesort")
    out = s.groupby("cust", sort=False).head(k).copy()
    out["rank"] = out.groupby("cust", sort=False).cumcount() + 1
    return out.sort_values(["cust", "rank"]).reset_index(drop=True)


@pytest.mark.parametrize("num_partitions", [1, 8, 64])
def test_topk_per_group_matches_oracle(ray_session, num_partitions):
    df = _orders()
    got = (
        topk_per_group(
            ray.data.from_pandas(df).repartition(9),
            group="cust",
            order="price",
            k=3,
            tie_col="oid",
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values(["cust", "rank"])
        .reset_index(drop=True)
    )
    want = _topk_oracle(df, 3)
    assert (want.groupby("cust").size() < 3).any(), "fixture must have groups smaller than k"
    got = got[list(want.columns)].astype(want.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("num_partitions", [1, 8, 64])
def test_sum_topk_matches_pandas(ray_session, num_partitions):
    """Global top-k groups by sum(value), with a ride-along composite key
    column (functional dependent of the primary key) and float-sum ties
    broken on tie_col — exact vs a single-machine pandas reduction."""
    rng = np.random.default_rng(23)
    n = 2500
    key = rng.integers(0, 120, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": key,
            "dim": key % 7,  # functionally dependent ride-along
            # integer values so sums are order-independent exact (ties occur)
            "v": rng.integers(0, 40, n).astype(np.float64),
        }
    )
    got = sum_topk(
        ray.data.from_pandas(df).repartition(9),
        group=["k", "dim"],
        value="v",
        k=10,
        tie_col="k",
        num_partitions=num_partitions,
    )
    want = (
        df.groupby(["k", "dim"], as_index=False)["v"].sum()
        .sort_values(["v", "k"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "dim", "v"]].astype(want.dtypes.to_dict()), want, check_dtype=False
    )


def test_distinct_per_group_matches_nunique(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 25, 2000).astype(np.int64),
            "kind": rng.choice(list("abcdefg"), 2000),
        }
    )
    got = (
        distinct_per_group(ray.data.from_pandas(df).repartition(8), "user", "kind")
        .to_pandas()
        .sort_values("user")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("user")["kind"].nunique().rename("n_distinct").reset_index()
        .astype({"n_distinct": "int64"})
    )
    pd.testing.assert_frame_equal(
        got.astype({"user": "int64"}), want.rename(columns={"user": "user"}), check_dtype=False
    )


def test_pivot_counts_matches_crosstab(ray_session):
    """pivot_counts == pandas crosstab restricted to the declared
    categories; undeclared categories count toward no column; groups whose
    rows are all-undeclared still appear with zero rows."""
    rng = np.random.default_rng(41)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 30, 1200).astype(np.int64),
            "t": rng.choice(["a", "b", "c", "zz"], 1200, p=[0.4, 0.3, 0.2, 0.1]),
        }
    )
    got = (
        pivot_counts(ray.data.from_pandas(df).repartition(8), "u", "t", ["a", "b", "c"])
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    ct = pd.crosstab(df["u"], df["t"]).reindex(columns=["a", "b", "c"], fill_value=0)
    want = ct.rename(columns={c: f"n_{c}" for c in ct.columns}).reset_index().rename(
        columns={"u": "u"}
    )
    want.columns.name = None
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want, check_dtype=False)


def test_approx_distinct_kmv(ray_session):
    """KMV sketch contracts: (1) groups with < k distinct values are EXACT,
    (2) high-cardinality groups estimate within the sketch's error bound,
    (3) the result is bit-identical across input partitionings (mergeable
    sketch — union + re-truncate commutes with how batches split)."""
    rng = np.random.default_rng(7)
    k = 64
    # group 'small': 20 distinct values; group 'big': 5000 distinct values
    small = pd.DataFrame({"g": "small", "v": rng.integers(0, 20, 400).astype(np.int64)})
    big = pd.DataFrame({"g": "big", "v": rng.permutation(5000).astype(np.int64) + 1000})
    df = pd.concat([small, big], ignore_index=True).sample(frac=1, random_state=3)

    outs = []
    for parts in (2, 13):
        out = (
            approx_distinct_per_group(
                ray.data.from_pandas(df).repartition(parts), "g", "v", k=k
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partitioning-invariant

    got = dict(zip(outs[0]["g"], outs[0]["approx_distinct"]))
    assert got["small"] == small["v"].nunique()  # exact below k
    n_big = big["v"].nunique()
    rel = 3.0 / np.sqrt(k - 2)  # ~3σ KMV bound
    assert abs(got["big"] - n_big) <= rel * n_big


def test_group_quantiles_matches_numpy(ray_session):
    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 1500),
            "v": rng.random(1500) * 100,
        }
    )
    got = (
        group_quantiles(ray.data.from_pandas(df).repartition(7), "g", "v", (0.5, 0.9))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    rows = [
        (g, *np.quantile(np.sort(sub["v"].to_numpy()), (0.5, 0.9), method="linear"))
        for g, sub in df.groupby("g")
    ]
    want = pd.DataFrame(rows, columns=["g", "q50", "q90"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_string_group_keys_colocate(ray_session):
    # string keys go through pd.util.hash_array — same key must always land
    # in the same partition or counts fragment; a fragmented key would show
    # up as duplicate group rows
    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {"g": rng.choice([f"key{i}" for i in range(40)], 3000), "v": rng.random(3000)}
    )
    got = distinct_per_group(
        ray.data.from_pandas(df).repartition(16), "g", "v", num_partitions=64
    ).to_pandas()
    assert not got["g"].duplicated().any()


# ---------------------------------------------------------------------------
# corpus_prep composition contracts
# ---------------------------------------------------------------------------


def _prep_docs() -> pd.DataFrame:
    en = "the and for with this that from have will what when where which "
    rows = []
    for i in range(40):
        rows.append((i, en * 8 + f"unique tail {i}"))
    # exact duplicates of doc 3's text under higher ids → must collapse to 3
    rows.append((100, en * 8 + "unique tail 3"))
    rows.append((101, en * 8 + "unique tail 3"))
    # non-English → filtered out
    rows.append((200, "der und das mit ist nicht von auf ein eine " * 10))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.mark.parametrize("blocks", [1, 6])
def test_prep_corpus_dedup_filter_split(ray_session, blocks):
    from searty_ray.pipelines.prep import prep_corpus

    df = _prep_docs()
    out = (
        prep_corpus(
            ray.data.from_pandas(df).repartition(blocks),
            lang="en",
            min_score=0.0,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = set(out["doc_id"])
    assert 3 in ids and 100 not in ids and 101 not in ids, "dup must collapse to min id"
    assert 200 not in ids, "non-target language must be filtered"
    assert (out["pred_lang"] == "en").all()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert not out["doc_id"].duplicated().any()


def test_prep_corpus_parallelism_invariant(ray_session):
    from searty_ray.pipelines.prep import prep_corpus

    df = _prep_docs()
    outs = [
        prep_corpus(ray.data.from_pandas(df).repartition(b), lang="en", min_score=0.0,
                    concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for b in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# rolling window
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_partitions", [1, 8, 64])
def test_rolling_aggregate_matches_pandas(ray_session, num_partitions):
    from searty_ray.stages.windows import rolling_aggregate

    rng = np.random.default_rng(41)
    n = 800
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # skewed key + duplicate timestamps (tie-break on event_id)
            "user_id": np.where(rng.random(n) < 0.4, 2, rng.integers(0, 10, n)).astype(np.int64),
            "ts_us": rng.integers(0, 60, n).astype(np.int64),
            "value": np.round(rng.random(n) * 10, 3),
        }
    )
    got = (
        rolling_aggregate(
            ray.data.from_pandas(df).repartition(7),
            by="user_id",
            order=("ts_us", "event_id"),
            value="value",
            window_rows=5,
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    r = s.groupby("user_id", sort=False)["value"].rolling(5, min_periods=1)
    s = s.copy()
    s["roll_sum"] = r.sum().to_numpy()
    s["roll_mean"] = r.mean().to_numpy()
    want = s.sort_values("event_id").reset_index(drop=True)
    got = got[list(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_ranged_equals_oneshot(ray_session):
    """The event-scale-key path (range partition + boundary seed handoff)
    must equal the one-shot path exactly — including a skewed key whose
    rows span many ranges and ranges with fewer than window_rows rows."""
    from searty_ray.stages.windows import rolling_aggregate, rolling_aggregate_ranged

    rng = np.random.default_rng(47)
    n = 1200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # user 1 owns 60% of rows and spans the whole time axis
            "user_id": np.where(rng.random(n) < 0.6, 1, rng.integers(0, 8, n)).astype(np.int64),
            "ts_us": rng.integers(0, 10_000, n).astype(np.int64),
            "value": np.round(rng.random(n) * 10, 3),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    want = (
        rolling_aggregate(ds, by="user_id", order=("ts_us", "event_id"),
                          value="value", window_rows=5)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    got = (
        rolling_aggregate_ranged(ds, by="user_id", order=("ts_us", "event_id"),
                                 value="value", window_rows=5,
                                 range_span_us=500)  # ~20 ranges, sparse tails
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    got = got[list(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the skew guarantee: no (key, range) cell exceeds its own rows — check
    # the partition tag function splits user 1 across many cells
    assert df[df["user_id"] == 1]["ts_us"].floordiv(500).nunique() > 10


def test_tfidf_topk_matches_bruteforce(ray_session):
    """TF-IDF vs a direct numpy/pandas computation — duplicate words, a
    corpus-universal word (idf 0), and ties broken by word order."""
    import math

    from searty_ray.stages.textstats import tfidf_topk

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "common alpha alpha beta",
                "common beta gamma",
                "common gamma gamma gamma delta",
                "common delta epsilon",
                "common epsilon zeta zeta",
                "common zeta alpha",
            ],
        }
    )
    got = (
        tfidf_topk(ray.data.from_pandas(docs).repartition(3), k=2, concurrency=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # brute force
    n = len(docs)
    words = docs.assign(w=docs["text"].str.split()).explode("w")
    df = words.drop_duplicates(["doc_id", "w"]).groupby("w").size()
    rows = []
    for doc_id, sub in words.groupby("doc_id"):
        tf = sub.groupby("w").size()
        scored = []
        for w, t in tf.items():
            idf_m = math.floor(math.log((n + 1) / (df[w] + 1)) * 1e6 + 0.5)
            scored.append((w, int(t), int(t) * idf_m))
        scored.sort(key=lambda x: (-x[2], x[0]))
        for r, (w, t, sm) in enumerate(scored[:2], 1):
            rows.append((doc_id, w, t, sm / 1e6, r))
    want = pd.DataFrame(rows, columns=["doc_id", "word", "tf", "tfidf", "rank"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # 'common' is in every doc → idf 0 → never beats any distinctive word
    assert "common" not in set(got[got["rank"] == 1]["word"])


def test_tfidf_join_mode_matches_broadcast_and_keeps_vocab_off_driver(
    ray_session, monkeypatch
):
    """The join path (default) must equal the broadcast path on a corpus
    whose vocabulary is much wider than any one document, and must never
    pull the vocabulary df table onto the driver (the broadcast path's
    one to_pandas is exactly what the join path exists to remove)."""
    from searty_ray.stages.textstats import tfidf_topk

    rng = np.random.default_rng(7)
    # 300 docs × 30 words drawn from a 5000-word open vocabulary: the df
    # table (≈4.3k distinct words) is larger than any doc or batch
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, size=30)) for _ in range(300)],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    want = (
        tfidf_topk(ds, k=3, mode="broadcast", concurrency=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )

    # join mode: no Dataset.to_pandas may fire anywhere inside the operator
    # (consumption happens lazily here via iter_batches, not to_pandas)
    orig = ray.data.Dataset.to_pandas

    def no_driver_pandas(self, *a, **k):
        raise AssertionError("tfidf join mode materialized a Dataset on the driver")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", no_driver_pandas)
    out = tfidf_topk(ds, k=3, mode="join")
    got_batches = list(out.iter_batches(batch_format="pandas"))
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", orig)
    got = (
        pd.concat(got_batches, ignore_index=True)
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_prep_corpus_to_parquet_split_layout(ray_session, tmp_path):
    """Split-partitioned output: hive dirs per split, rows round-trip, and
    a completed run short-circuits on resume."""
    import os

    import pyarrow.parquet as pq

    from searty_ray.pipelines.prep import prep_corpus, prep_corpus_to_parquet

    df = _prep_docs()
    out = str(tmp_path / "prepped")
    prep_corpus_to_parquet(ray.data.from_pandas(df).repartition(4), out,
                           lang="en", min_score=0.0)
    splits = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert splits and splits <= {"train", "val", "test"}
    got = pq.read_table(out).to_pandas()
    want = (
        prep_corpus(ray.data.from_pandas(df), lang="en", min_score=0.0, concurrency=2)
        .to_pandas()
    )
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # resume short-circuit: marker present → same dir returned, no rewrite
    mtime = os.path.getmtime(out + "/.done")
    assert prep_corpus_to_parquet(ray.data.from_pandas(df), out, resume=True) == out
    assert os.path.getmtime(out + "/.done") == mtime


def test_zscore_normalize_matches_pandas(ray_session):
    import ray.data

    from searty_ray.stages.analytics import zscore_normalize

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "event_id": np.arange(300, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c", "only_once"], 300,
                                     p=[0.5, 0.3, 0.197, 0.003]),
            "value": rng.random(300) * 100,
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        zscore_normalize(ds, group="event_type", value="value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    g = df.groupby("event_type")["value"]
    exp_z = (df["value"] - df["event_type"].map(g.mean())) / df["event_type"].map(g.std(ddof=1))
    np.testing.assert_allclose(got["z"].to_numpy(), exp_z.to_numpy(), rtol=1e-9, equal_nan=True)
    # singleton groups yield NaN (SQL NULL), never a crash or inf
    singles = df["event_type"].value_counts()
    if (singles == 1).any():
        lone = singles[singles == 1].index[0]
        assert got.loc[got["event_type"] == lone, "z"].isna().all()


def test_histogram_matches_numpy(ray_session):
    import ray.data

    from searty_ray.stages.analytics import histogram

    rng = np.random.default_rng(9)
    v = np.concatenate([rng.random(500) * 10, [-5.0, 15.0, 9.999, 0.0]])  # under/overflow
    df = pd.DataFrame({"value": v})
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        histogram(ds, "value", lo=0.0, hi=10.0, bins=5)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    ids = np.clip(np.floor(v / 2.0).astype(np.int64), 0, 4)
    exp = np.bincount(ids, minlength=5)
    assert dict(zip(got["bin"], got["n"])) == {i: int(c) for i, c in enumerate(exp) if c}


def test_cumulative_sum_matches_pandas(ray_session):
    import ray.data

    from searty_ray.stages.windows import cumulative_sum

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(250, dtype=np.int64),
            "ts_us": rng.integers(0, 10**9, 250),
            "user_id": rng.integers(0, 6, 250).astype(np.int64),
            "value": rng.random(250).round(4),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        cumulative_sum(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    exp = s.assign(running_sum=s.groupby("user_id")["value"].cumsum()).sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_vector_centroids_matches_numpy(ray_session):
    import ray.data

    from searty_ray.stages.analytics import vector_centroids

    rng = np.random.default_rng(6)
    n, dim = 200, 8
    df = pd.DataFrame(
        {
            "label": rng.integers(0, 5, n).astype(np.int64),
            "embedding": list(rng.standard_normal((n, dim)).astype(np.float32)),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        vector_centroids(ds, group="label")
        .to_pandas()
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )
    for lbl in sorted(df["label"].unique()):
        exp = np.stack(df.loc[df["label"] == lbl, "embedding"].to_numpy()).astype(np.float64).mean(axis=0)
        sub = got[got["label"] == lbl].sort_values("pos")["centroid"].to_numpy()
        np.testing.assert_allclose(sub, exp, rtol=1e-12)


def test_funnel_counts_matches_brute_force(ray_session):
    import ray.data

    from searty_ray.stages.analytics import funnel_counts

    rng = np.random.default_rng(15)
    n = 800
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase", "noise"], n),
            "ts_us": rng.integers(0, 10**7, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = funnel_counts(ds, ("view", "click", "purchase"))
    # brute force
    firsts = df.pivot_table(index="user_id", columns="event_type", values="ts_us", aggfunc="min")
    def t(col):
        return firsts[col] if col in firsts else pd.Series(np.nan, index=firsts.index)
    s1 = t("view").notna()
    s2 = s1 & (t("click") > t("view"))
    s3 = s2 & (t("purchase") > t("click"))
    exp = [int(s1.sum()), int(s2.sum()), int(s3.sum())]
    assert got["users"].tolist() == exp
    assert got["stage"].tolist() == ["view", "click", "purchase"]
    assert exp[0] >= exp[1] >= exp[2] and exp[1] > 0


def test_approx_quantiles_deterministic_and_bounded_error(ray_session):
    import ray.data

    from searty_ray.stages.analytics import approx_group_quantiles

    rng = np.random.default_rng(21)
    n = 5000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "value": rng.random(n) * 100,
        }
    )

    def run(parts):
        return (
            approx_group_quantiles(
                ray.data.from_pandas(df).repartition(parts),
                group="event_type", value="value", id_col="event_id",
                qs=(0.5, 0.9), k=128,
            )
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )

    a, b = run(3), run(11)
    pd.testing.assert_frame_equal(a, b)  # layout-independent: same sample
    exact = df.groupby("event_type")["value"].quantile([0.5, 0.9]).unstack()
    for et in ("a", "b"):
        row = a[a["event_type"] == et].iloc[0]
        # rank error ~O(1/sqrt(k)); values uniform on [0,100] so value
        # error tracks rank error — generous 3-sigma-ish bound
        assert abs(row["q50"] - exact.loc[et, 0.5]) < 15.0
        assert abs(row["q90"] - exact.loc[et, 0.9]) < 15.0


def test_histogram_excludes_nulls(ray_session):
    import ray.data

    from searty_ray.stages.analytics import histogram

    df = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b", "b"],
            "value": [1.0, np.nan, 3.0, np.nan, 9.0],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    got = (
        histogram(ds, "value", lo=0.0, hi=10.0, bins=5, group="g")
        .to_pandas()
        .sort_values(["g", "bin"])
        .reset_index(drop=True)
    )
    # NaNs are excluded — never silently counted into bin 0
    assert got.values.tolist() == [["a", 0, 1], ["b", 1, 1], ["b", 4, 1]]


def test_approx_quantiles_skips_nulls_like_sql(ray_session):
    import ray.data

    from searty_ray.stages.analytics import approx_group_quantiles

    rng = np.random.default_rng(33)
    n = 400
    v = rng.random(n) * 10
    v[rng.random(n) < 0.2] = np.nan  # null-bearing column
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "g": rng.choice(["a", "b"], n),
            "v": v,
        }
    )
    out = (
        approx_group_quantiles(
            ray.data.from_pandas(df).repartition(4),
            group="g", value="v", id_col="event_id", qs=(0.5,), k=50,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # finite results despite NaNs in the sample (quantile_cont-skip parity)
    assert np.isfinite(out["q50"]).all()
    # reference: identical bottom-k hash sample, NaNs dropped at the quantile
    from searty_ray.functions.hashing import mix64

    h = mix64(df["event_id"].to_numpy().view(np.uint64))
    for grp in ("a", "b"):
        sub = df[df["g"] == grp].assign(h=h[df["g"] == grp]).sort_values("h").head(50)
        arr = np.sort(sub["v"].dropna().to_numpy())
        exp = np.quantile(arr, 0.5, method="linear")
        got = out.loc[out["g"] == grp, "q50"].iloc[0]
        assert got == exp


def test_rollup_sums_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.analytics import rollup_sums

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "f": rng.choice(["A", "N", "R"], 300),
            "s": rng.choice(["O", "F"], 300),
            "m1": rng.integers(0, 1000, 300).astype(np.int64),
            "m2": rng.integers(-50, 50, 300).astype(np.int64),
        }
    )
    got = rollup_sums(
        ray.data.from_pandas(df, override_num_blocks=4), keys=["f", "s"], measures=["m1", "m2"]
    )
    ref = duckdb.sql(
        """
        SELECT f, s, sum(m1)::BIGINT AS m1, sum(m2)::BIGINT AS m2,
               count(*)::BIGINT AS n_rows, grouping(f, s)::BIGINT AS lvl
        FROM df GROUP BY ROLLUP (f, s)
        ORDER BY lvl, f NULLS LAST, s NULLS LAST
        """
    ).df()
    for c in ("m1", "m2", "n_rows", "lvl"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref.reset_index(drop=True))


def test_group_ntile_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.windows import group_ntile

    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            # n=3 keys with ~166 rows each: exercises both tile sizes; also
            # plant a tiny key (fewer rows than tiles)
            "value": rng.random(n).round(4),
        }
    )
    df.loc[: n - 4, "event_type"] = rng.choice(["a", "b"], n - 3)
    for tiles in (4, 7):
        got = (
            group_ntile(ray.data.from_pandas(df, override_num_blocks=5), n_tiles=tiles)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "event_type", "value", "tile"]]
        )
        got["tile"] = got["tile"].astype("int64")
        ref = duckdb.sql(
            f"""
            SELECT event_id, event_type, value,
                   ntile({tiles}) OVER (PARTITION BY event_type ORDER BY value, event_id)::BIGINT AS tile
            FROM df ORDER BY event_id
            """
        ).df().astype({"event_id": "int64", "tile": "int64"})
        pd.testing.assert_frame_equal(got, ref)


def test_group_percent_rank_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.windows import group_percent_rank

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "lonely"], n, p=[0.5, 0.497, 0.003]),
            "value": rng.integers(0, 20, n).astype("float64"),  # heavy ties
        }
    )
    got = (
        group_percent_rank(ray.data.from_pandas(df, override_num_blocks=4))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "event_type", "value", "pct_rank_micro"]]
        .astype({"pct_rank_micro": "int64"})
    )
    ref = duckdb.sql(
        """
        SELECT event_id, event_type, value,
               ((row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)) - 1)
                 * 1000000
                 // greatest(count(*) OVER (PARTITION BY event_type) - 1, 1) AS pct_rank_micro
        FROM df ORDER BY event_id
        """
    ).df().astype({"event_id": "int64", "pct_rank_micro": "int64"})
    pd.testing.assert_frame_equal(got, ref)


def test_group_mad_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.analytics import group_mad

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 500),
            "v": np.round(rng.normal(10, 3, 500), 3),
        }
    )
    got = group_mad(ray.data.from_pandas(df, override_num_blocks=4), "g", "v")
    ref = duckdb.sql(
        """
        WITH m AS (SELECT g, quantile_disc(v, 0.5) AS median FROM df GROUP BY g),
        d AS (SELECT e.g, quantile_disc(abs(e.v - m.median), 0.5) AS mad
              FROM df e JOIN m USING (g) GROUP BY e.g)
        SELECT m.g, round(m.median, 6) AS median, round(d.mad, 6) AS mad
        FROM m JOIN d USING (g) ORDER BY g
        """
    ).df()
    pd.testing.assert_frame_equal(got, ref)


def test_path_counts_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.windows import path_counts

    rng = np.random.default_rng(23)
    n = 700
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts_us": rng.integers(0, 10_000_000, n),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    got = path_counts(ray.data.from_pandas(df, override_num_blocks=5), length=3)
    ref = duckdb.sql(
        """
        WITH e AS (
          SELECT event_type AS e1,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM df WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        )
        SELECT e1, e2, e3, count(*)::BIGINT AS n_paths
        FROM e WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY e1, e2, e3 ORDER BY e1, e2, e3
        """
    ).df().astype({"n_paths": "int64"})
    pd.testing.assert_frame_equal(got, ref)


def test_session_copairs_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.windows import session_copairs

    rng = np.random.default_rng(29)
    n = 600
    df = pd.DataFrame(
        {
            "ts_us": rng.integers(0, 5 * 86_400_000_000, n).astype(np.int64),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    got = session_copairs(ray.data.from_pandas(df, override_num_blocks=4), gap_s=1800)
    ref = duckdb.sql(
        """
        WITH ordered AS (
          SELECT user_id, event_type, ts_us,
                 CASE WHEN ts_us - lag(ts_us) OVER w > 1800 * 1000000
                      OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
          FROM df WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        ),
        grouped AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM ordered
        ),
        st AS (SELECT DISTINCT user_id, sid, event_type FROM grouped)
        SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_sessions
        FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
                            AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df().astype({"n_sessions": "int64"})
    pd.testing.assert_frame_equal(got, ref)


def test_int_quantile_disc_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.analytics import int_quantile_disc

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"v": rng.integers(-50, 500, 777).astype(np.int64)})
    got = int_quantile_disc(
        ray.data.from_pandas(df, override_num_blocks=5), "v", (0.25, 0.5, 0.75, 0.9)
    )
    ref = duckdb.sql(
        "SELECT quantile_disc(v, 0.25), quantile_disc(v, 0.5), "
        "quantile_disc(v, 0.75), quantile_disc(v, 0.9) FROM df"
    ).fetchone()
    assert got == [int(x) for x in ref]


def test_cube_sums_matches_duckdb(ray_session):
    import duckdb

    from searty_ray.stages.analytics import cube_sums

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "f": rng.choice(["A", "N", "R"], 300),
            "s": rng.choice(["O", "F"], 300),
            "m1": rng.integers(0, 1000, 300).astype(np.int64),
            "m2": rng.integers(-50, 50, 300).astype(np.int64),
        }
    )
    got = cube_sums(
        ray.data.from_pandas(df, override_num_blocks=4),
        keys=["f", "s"],
        measures=["m1", "m2"],
    )
    ref = duckdb.sql(
        """
        SELECT f, s, sum(m1)::BIGINT AS m1, sum(m2)::BIGINT AS m2,
               count(*)::BIGINT AS n_rows, grouping(f, s)::BIGINT AS lvl
        FROM df GROUP BY CUBE (f, s)
        ORDER BY lvl, f NULLS LAST, s NULLS LAST
        """
    ).df()
    for c in ("m1", "m2", "n_rows", "lvl"):
        ref[c] = ref[c].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref.reset_index(drop=True))


def test_weighted_quantiles_matches_expansion(ray_session):
    # independent reference: materialize each value `weight` times and take
    # the ceil(p*W/100)-th smallest — the textbook lower weighted quantile
    from searty_ray.stages.analytics import weighted_quantiles

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 400),
            "v": rng.integers(0, 60, 400).astype(np.int64),
            "w": rng.integers(1, 9, 400).astype(np.int64),
        }
    )
    got = weighted_quantiles(
        ray.data.from_pandas(df, override_num_blocks=5),
        group="g",
        value="v",
        weight="w",
        pcts=(25, 50, 75, 100),
    )
    rows = []
    for g, sub in df.groupby("g"):
        expanded = np.sort(np.repeat(sub["v"].to_numpy(), sub["w"].to_numpy()))
        W = len(expanded)
        for p in (25, 50, 75, 100):
            k = -(-p * W // 100)  # ceil
            rows.append({"g": g, "p": p, "wq": int(expanded[k - 1])})
    ref = pd.DataFrame(rows).astype({"p": "int64", "wq": "int64"})
    ref = ref.sort_values(["g", "p"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_readability_batch_matches_scalar():
    import re as _re

    from searty_ray.stages.textstats import readability_batch

    texts = [
        "The quick brown fox. It jumps! Over?",
        "no terminal punctuation here",
        "",
        "aeiouy",  # one vowel run, no sentence, one word
        "Ellipsis... counts as one sentence boundary run!!",
        "Tabs\tand\nnewlines separate\twords",
    ]
    out = readability_batch(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    for i, t in enumerate(texts):
        words = len(_re.findall(r"[^\t\n\f\r ]+", t))
        sents = len(_re.findall(r"[.!?]+", t))
        syll = len(_re.findall(r"[aeiouy]+", t.lower()))
        w, s, y = max(words, 1), max(sents, 1), max(syll, 1)
        flesch = 206835 - (1015 * w) // s - (84600 * y) // w
        row = out.iloc[i]
        assert row["n_words"] == words and row["n_sentences"] == sents
        assert row["n_syllables"] == syll and row["flesch_milli"] == flesch


def test_latest_by_key_matches_pandas(ray_session):
    from searty_ray.stages.analytics import latest_by_key

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 20, n).astype(np.int64),
            "k2": rng.choice(["a", "b", "c"], n),
            "ts": rng.integers(0, 50, n).astype(np.int64),  # many ties
            "id": np.arange(n, dtype=np.int64),
            "val": rng.normal(size=n),
        }
    )
    got = (
        latest_by_key(
            ray.data.from_pandas(df, override_num_blocks=5),
            keys=["k1", "k2"],
            order=["ts", "id"],
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["k1", "k2", "ts", "id"])
        .drop_duplicates(subset=["k1", "k2"], keep="last")
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref)


def test_latest_by_key_layout_stable(ray_session):
    from searty_ray.stages.analytics import latest_by_key

    rng = np.random.default_rng(19)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 200).astype(np.int64),
            "ts": rng.integers(0, 10, 200).astype(np.int64),
            "id": np.arange(200, dtype=np.int64),
        }
    )
    outs = []
    for blocks in (1, 8):
        outs.append(
            latest_by_key(
                ray.data.from_pandas(df, override_num_blocks=blocks),
                keys=["k"],
                order=["ts", "id"],
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_moment_sums_match_numpy(ray_session):
    from searty_ray.stages.analytics import grouped_moment_sums

    rng = np.random.default_rng(61)
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q", "r"], 400),
            "x": rng.integers(-50, 500, 400).astype(np.int64),
            "y": rng.integers(0, 24, 400).astype(np.int64),
        }
    )
    got = grouped_moment_sums(
        ray.data.from_pandas(df, override_num_blocks=5), group="g", x="x", y="y"
    )
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]
        x, y = sub["x"].to_numpy(np.int64), sub["y"].to_numpy(np.int64)
        assert row["n"] == len(sub)
        assert row["sx"] == x.sum() and row["sy"] == y.sum()
        assert row["sxy"] == (x * y).sum()
        assert row["sxx"] == (x * x).sum() and row["syy"] == (y * y).sum()
    assert set(got["g"]) == set(df["g"].unique())


def test_chi2_drift_matches_scalar():
    from searty_ray.stages.analytics import chi2_drift

    rng = np.random.default_rng(67)
    counts = (
        pd.DataFrame(
            {
                "source": rng.choice(["a", "b"], 300),
                "bucket": rng.integers(0, 6, 300),
            }
        )
        .groupby(["source", "bucket"])
        .size()
        .reset_index(name="c")
    )
    got = chi2_drift(counts, "source")
    M = int(counts["c"].sum())
    d = counts.groupby("bucket")["c"].sum()
    for _, row in got.iterrows():
        sub = counts[counts["source"] == row["source"]]
        N = int(sub["c"].sum())
        byb = dict(zip(sub["bucket"], sub["c"]))
        exp = sum(
            (10**6 * (int(byb.get(bk, 0)) * M - int(di) * N) ** 2)
            // (M * int(di) * N)
            for bk, di in d.items()
        )
        assert row["chi2_micro"] == exp and row["n_docs"] == N
    # a zero-observed bucket must still contribute (expected>0, observed 0)
    counts2 = pd.DataFrame(
        {"source": ["a", "a", "b"], "bucket": [0, 1, 0], "c": [5, 5, 10]}
    )
    out = chi2_drift(counts2, "source")
    b_row = out[out["source"] == "b"].iloc[0]
    assert b_row["chi2_micro"] > 0  # b misses bucket 1 entirely
