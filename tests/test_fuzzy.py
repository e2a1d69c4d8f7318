"""Fuzzy word matching (stages/fuzzy.py): the vectorized lcp+lcs ed≤1
kernel vs a brute-force Levenshtein DP, word extraction vs the regex
oracle, and the distributed pipeline vs a pandas one-process reference."""

import random
import re

import numpy as np
import pandas as pd
import ray.data

from searty_ray.stages import fuzzy


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _pack(words: list[str]):
    cps = np.frombuffer("\x00".join(words).encode("utf-32-le"), dtype=np.uint32)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    starts = np.cumsum(lens + 1) - (lens + 1)
    return cps, starts, lens


def test_ed1_mask_matches_brute_force():
    rng = random.Random(42)
    alpha = "AB1-"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 6))) for _ in range(2000)]
    words += ["DOC-7", "DOC-1", "DOC-77", "DOC7", "OC-7", "DOC-", "XDOC-7",
              "DOC-7X", "D0C-7", "DDOC-77", "ABA", "AAB"]
    for q in ["DOC-7", "AB", "A", "B1-A", "ABA"]:
        cps, starts, lens = _pack(words)
        got = fuzzy.ed1_mask(cps, starts, lens, q)
        exp = np.array([_lev(w, q) <= 1 for w in words])
        bad = [w for w, g, e in zip(words, got, exp) if g != e]
        assert not bad, (q, bad[:10])


def test_word_extraction_matches_regex():
    texts = ["(defpackage :src0)\n(defun doc-7 (x) nil)\nthe fast merge",
             "", "a.b-c! ??x", "ABC", "tab\tand  spaces"]
    cps, starts, lens, docrep = fuzzy._batch_symbol_words(texts)
    got = [fuzzy._cps_to_str(cps[s:s + l]) for s, l in zip(starts, lens)]
    pat = re.compile(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+")
    exp = [w.upper() for t in texts for w in pat.findall(t)]
    assert got == exp
    exp_doc = [i for i, t in enumerate(texts) for _ in pat.findall(t)]
    assert list(docrep) == exp_doc


def test_pipeline_matches_pandas_reference():
    rng = random.Random(7)
    rows = []
    for i in range(80):
        words = [f"doc-{rng.randint(0, 12)}" for _ in range(rng.randint(0, 8))]
        rows.append({"doc_id": i, "content": " ".join(words)})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(6)
    got = (
        fuzzy.fuzzy_word_stats(ds, "DOC-7")
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    # one-process reference
    recs = []
    for r in rows:
        for w in re.findall(r"[A-Za-z0-9\-\*\+/<>=!?_&%$.]+", r["content"]):
            w = w.upper()
            if _lev(w, "DOC-7") <= 1:
                recs.append((w, r["doc_id"]))
    ref = pd.DataFrame(recs, columns=["word", "doc_id"])
    exp = (
        ref.groupby("word")
        .agg(df=("doc_id", "nunique"), cf=("doc_id", "size"))
        .reset_index()
        .sort_values("word")
        .reset_index(drop=True)
        .astype({"df": "int64", "cf": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp)


def test_ed1_mask_hypothesis_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alpha = st.text(alphabet="AB1-xyØ", min_size=0, max_size=7)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alpha.filter(bool), min_size=1, max_size=30), alpha.filter(bool))
    def check(words, q):
        cps, starts, lens = _pack(words)
        got = fuzzy.ed1_mask(cps, starts, lens, q)
        exp = np.array([_lev(w, q) <= 1 for w in words])
        assert (got == exp).all(), [w for w, g, e in zip(words, got, exp) if g != e]

    check()
