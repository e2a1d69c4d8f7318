"""lag_delta (+ ranged variant), quality_quantile_filter, scrub_pii_batch —
each against an independent one-process reference (pandas window ops /
DuckDB quantile_disc + regexp_replace)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from searty_ray.stages import textstats
from searty_ray.stages.windows import lag_delta, lag_delta_ranged


def _events(n=400, users=7, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts_us": rng.integers(0, 5 * 86_400_000_000, n),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "value": rng.random(n).round(3),
        }
    )


def _lag_ref(df: pd.DataFrame) -> pd.DataFrame:
    s = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort").copy()
    g = s.groupby("user_id", sort=False)
    s["prev_ts"] = g["ts_us"].shift(1)
    s["prev_value"] = g["value"].shift(1)
    s["gap_us"] = s["ts_us"] - s["prev_ts"]
    return s.sort_values("event_id").reset_index(drop=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values("event_id")
        .reset_index(drop=True)[
            ["event_id", "ts_us", "user_id", "value", "prev_ts", "prev_value", "gap_us"]
        ]
        .astype({"gap_us": "float64", "prev_ts": "float64"})
    )


def test_lag_delta_matches_pandas():
    df = _events()
    ds = ray.data.from_pandas(df).repartition(5)
    got = _canon(lag_delta(ds).to_pandas())
    pd.testing.assert_frame_equal(got, _canon(_lag_ref(df)))


def test_lag_delta_ranged_equals_one_shot_with_skewed_key():
    df = _events(600, users=5)
    df.loc[: len(df) // 2, "user_id"] = 0  # one user owns half the events
    ds = ray.data.from_pandas(df).repartition(6)
    one = _canon(lag_delta(ds).to_pandas())
    ranged = _canon(lag_delta_ranged(ds, range_span_us=86_400_000_000).to_pandas())
    pd.testing.assert_frame_equal(ranged, one)
    # the ranged path actually split the skewed user across ranges
    assert df.loc[df["user_id"] == 0, "ts_us"].floordiv(86_400_000_000).nunique() > 1


def test_quantile_threshold_matches_duckdb_quantile_disc():
    rng = np.random.default_rng(11)
    for n in (1, 2, 3, 5, 8, 13, 100, 101):
        vals = rng.random(n).round(6)
        got = textstats.quantile_threshold(vals, 0.75)
        exp = duckdb.sql(
            f"SELECT quantile_disc(x, 0.75) FROM (SELECT unnest({[float(v) for v in vals]}) AS x)"
        ).fetchone()[0]
        assert got == float(exp), (n, got, exp)


def test_quality_quantile_filter_matches_reference():
    rng = np.random.default_rng(5)
    vocab = ["the", "merge", "scan", "of", "zz", "window", "a", "queue"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(1, 40))) for _ in range(120)
            ],
            "lang": rng.choice(["en", "de", "fr"], 120),
        }
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    got = (
        textstats.quality_quantile_filter(ds, p=0.75, by="lang")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference: score every doc, per-lang discrete quantile, filter
    q = textstats.quality_batch(docs)
    w = np.array(textstats.QUALITY_MODEL_W)
    scored = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "lang": docs["lang"],
            "quality_score": textstats.score_quality(q, w),
        }
    )
    thr = scored.groupby("lang")["quality_score"].apply(
        lambda v: textstats.quantile_threshold(v.to_numpy(), 0.75)
    )
    exp = (
        scored[scored["quality_score"] >= scored["lang"].map(thr)]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert 0 < len(got) < len(docs)


def test_scrub_pii_matches_duckdb():
    texts = [
        "contact bob.smith+x@ex-ample.org or 1234567 now",
        "doc-42 has 99 problems and no email",
        "two mails: a@b.co c.d@e.f.gg, num 007",
        "nothing here",
        "",
    ]
    b = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = textstats.scrub_pii_batch(b)
    con = duckdb.connect()
    con.register("t", b)
    exp = con.execute(f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text, '{textstats.PII_EMAIL_PAT}', '{textstats.PII_EMAIL_TOKEN}', 'g'),
                              '{textstats.PII_NUM_PAT}', '{textstats.PII_NUM_TOKEN}', 'g') AS clean,
               len(regexp_extract_all(text, '{textstats.PII_EMAIL_PAT}'))::BIGINT AS n_email,
               len(regexp_extract_all(regexp_replace(text, '{textstats.PII_EMAIL_PAT}', '{textstats.PII_EMAIL_TOKEN}', 'g'),
                                      '{textstats.PII_NUM_PAT}'))::BIGINT AS n_num
        FROM t ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )
    assert got["n_email"].sum() == 3 and got["n_num"].sum() >= 3


def test_cumulative_sum_ranged_equals_one_shot():
    from searty_ray.stages.windows import cumulative_sum, cumulative_sum_ranged

    df = _events(500, users=4, seed=8)
    df.loc[: len(df) // 2, "user_id"] = 0  # skewed key spans many ranges
    ds = ray.data.from_pandas(df).repartition(6)
    one = cumulative_sum(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    ranged = (
        cumulative_sum_ranged(ds, range_span_us=86_400_000_000)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ranged.drop(columns="running_sum"), one.drop(columns="running_sum")
    )
    np.testing.assert_allclose(
        ranged["running_sum"].to_numpy(), one["running_sum"].to_numpy(), rtol=1e-9
    )
    assert df.loc[df["user_id"] == 0, "ts_us"].floordiv(86_400_000_000).nunique() > 1


def test_blocklist_filter_matches_duckdb(ray_session):
    """Crafted cases: overlapping repeats, case folding, multi-phrase docs,
    phrase-absent docs — non-overlapping counts == the SQL replace
    arithmetic."""
    import duckdb
    import pandas as pd
    import ray.data

    from searty_ray.pipelines.gate import BLOCKLIST, SQL_BLOCKLIST
    from searty_ray.stages.textstats import blocklist_filter

    docs = [
        "clean document with nothing banned",
        "MERGE PART and merge part twice",
        "slow join here and Lorem Ipsum there",
        "merge partmerge part back to back",  # adjacent occurrences
        "",
        "merge par",  # near miss
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    got = (
        blocklist_filter(ray.data.from_pandas(df), BLOCKLIST)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(SQL_BLOCKLIST).df()
    con.close()
    got["blocked"] = got["blocked"].astype(bool)
    want["blocked"] = want["blocked"].astype(bool)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert got.loc[1, "n_hits"] == 2 and got.loc[1, "n_phrases"] == 1
    assert got.loc[2, "n_phrases"] == 2
    assert got.loc[3, "n_hits"] == 2
    assert not got.loc[0, "blocked"] and not got.loc[5, "blocked"]


def test_multipattern_blocklist_matches_scalar_path(ray_session):
    """The banked Rabin-Karp multi-pattern engine == the per-phrase
    str.count engine, on (a) the gate's crafted cases and (b) a 10⁴-pattern
    blocklist over synthetic docs — the large-blocklist evidence (r5)."""
    import pandas as pd
    import ray.data

    from searty_ray.pipelines.gate import BLOCKLIST
    from searty_ray.stages.textstats import (
        blocklist_filter,
        blocklist_filter_multipattern,
    )

    def run(df, phrases):
        a = (
            blocklist_filter(ray.data.from_pandas(df), phrases)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            blocklist_filter_multipattern(
                ray.data.from_pandas(df), phrases, concurrency=2
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(b[a.columns].astype(a.dtypes), a)
        return a

    docs = [
        "clean document with nothing banned",
        "MERGE PART and merge part twice",
        "slow join here and Lorem Ipsum there",
        "merge partmerge part back to back",
        "",
        "merge par",
        "aaaaaa",  # overlap torture for non-overlapping counts
        "ababababab",
        "unicode é ü — merge part",
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    run(df, BLOCKLIST + ("aa", "abab", "é ü"))

    # 10⁴ patterns: deterministic synthetic phrases over a tiny alphabet so
    # a realistic fraction actually hits; several share lengths (banked)
    rng = np.random.default_rng(11)
    alpha = list("abcdef ")
    pats = tuple(
        "".join(rng.choice(alpha, size=int(rng.integers(3, 9))))
        for _ in range(10_000)
    )
    texts = [
        "".join(rng.choice(alpha, size=400)) for _ in range(60)
    ] + ["abc def " * 30, ""]
    big = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = run(big, pats)
    assert got["n_hits"].sum() > 0  # the comparison exercised real matches


def test_transition_counts_matches_duckdb(ray_session):
    from searty_ray.stages.windows import transition_counts

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts_us": rng.integers(0, 86_400_000_000, n),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase", "signup"], n),
        }
    )
    got = transition_counts(ray.data.from_pandas(df, override_num_blocks=5))
    ref = duckdb.sql(
        """
        WITH e AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
          FROM df
        ),
        c AS (SELECT event_type AS src, nxt AS dst, count(*)::BIGINT AS n_trans
              FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT src, sum(n_trans) AS tot FROM c GROUP BY src)
        SELECT c.src, c.dst, c.n_trans, (c.n_trans * 1000000 // t.tot)::BIGINT AS p_micro
        FROM c JOIN t USING (src) ORDER BY src, dst
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref.astype({"n_trans": "int64", "p_micro": "int64"}).reset_index(drop=True),
    )
