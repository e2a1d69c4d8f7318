"""Windowed co-occurrence + PMI (textstats.word_cooccurrence) vs a
brute-force reference: window boundary, unordered canonicalization,
same-word pairs, cross-doc isolation, count ties broken by pair name."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.stages import textstats

DOCS = [
    "a b c a b",  # repeats: (a,b) at d=1 twice + (a,b) at d=2 once
    "x y",  # isolated doc: no cross-doc (b,x) pair may appear
    "z z z",  # same-word pairs
    "a",  # single word: no pairs
    "",  # empty
    "b a",  # unordered: counts into (a,b)
]


def _reference(docs, window):
    pair_cnt, uni_cnt = Counter(), Counter()
    n_pairs = 0
    for t in docs:
        w = t.split()
        uni_cnt.update(w)
        for i in range(len(w)):
            for d in range(1, window + 1):
                if i + d < len(w):
                    pair_cnt[tuple(sorted((w[i], w[i + d])))] += 1
                    n_pairs += 1
    return pair_cnt, uni_cnt, n_pairs


@pytest.mark.parametrize("window", [1, 2, 3])
def test_word_cooccurrence_matches_bruteforce(ray_session, window):
    ds = ray.data.from_pandas(pd.DataFrame({"text": DOCS}))
    got = textstats.word_cooccurrence(ds, window=window, top_k=100)
    pair_cnt, uni_cnt, n_pairs = _reference(DOCS, window)
    n_words = sum(uni_cnt.values())

    want = sorted(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(got["word_a"], got["word_b"], got["n"])) == [
        (a, b, c) for (a, b), c in want
    ]
    for row in got.itertuples(index=False):
        exp = math.log2(
            (row.n * float(n_words) * n_words)
            / (n_pairs * float(uni_cnt[row.word_a]) * uni_cnt[row.word_b])
        )
        assert row.pmi == pytest.approx(exp, abs=1e-6)
    # cross-doc isolation: no pair can mix the isolated doc's words
    pairs = set(zip(got["word_a"], got["word_b"]))
    assert not any({"x", "y"} & {a, b} and {a, b} - {"x", "y"} for a, b in pairs)


def test_word_cooccurrence_topk_truncates(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": DOCS}))
    got = textstats.word_cooccurrence(ds, window=2, top_k=2)
    assert len(got) == 2
    assert got["n"].is_monotonic_decreasing or got["n"].nunique() == 1

def _reference_capped(docs, window, min_count):
    """Brute force with the capped-vocab semantics: vocab = words with
    total count >= min_count; pairs over ORIGINAL positions (a dropped
    rare word leaves a gap, it does not pull neighbours together)."""
    all_cnt = Counter()
    for t in docs:
        all_cnt.update(t.split())
    keep = {w for w, c in all_cnt.items() if c >= min_count}
    pair_cnt, uni_cnt = Counter(), Counter()
    n_pairs = 0
    for t in docs:
        w = t.split()
        for i in range(len(w)):
            if w[i] not in keep:
                continue
            uni_cnt[w[i]] += 1
            for d in range(1, window + 1):
                if i + d < len(w) and w[i + d] in keep:
                    pair_cnt[tuple(sorted((w[i], w[i + d])))] += 1
                    n_pairs += 1
    return pair_cnt, uni_cnt, n_pairs


CAPPED_DOCS = [
    "a b rare1 c a b",     # rare1 occupies a position: (b, c) at d=2 only
    "c rare2 a",           # (c, a) at d=2 through the gap
    "a b c a b c a",
    "rare1 rare3",         # fully-rare doc contributes nothing
    "b c b",
    "",
]


@pytest.mark.parametrize("window,min_count", [(1, 3), (2, 3), (3, 4)])
def test_word_cooccurrence_capped_matches_bruteforce(ray_session, window, min_count):
    ds = ray.data.from_pandas(pd.DataFrame({"text": CAPPED_DOCS}))
    got = textstats.word_cooccurrence(
        ds, window=window, top_k=100, min_count=min_count
    )
    pair_cnt, uni_cnt, n_pairs = _reference_capped(CAPPED_DOCS, window, min_count)
    n_words = sum(uni_cnt.values())

    want = sorted(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(got["word_a"], got["word_b"], got["n"])) == [
        (a, b, c) for (a, b), c in want
    ]
    for row in got.itertuples(index=False):
        exp = math.log2(
            (row.n * float(n_words) * n_words)
            / (n_pairs * float(uni_cnt[row.word_a]) * uni_cnt[row.word_b])
        )
        assert row.pmi == pytest.approx(exp, abs=1e-6)
    # rare words can never appear in the output
    assert not (
        {"rare1", "rare2", "rare3"} & (set(got["word_a"]) | set(got["word_b"]))
    )


def test_word_cooccurrence_capped_empty_vocab(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": CAPPED_DOCS}))
    got = textstats.word_cooccurrence(ds, min_count=10**9)
    assert list(got.columns) == ["word_a", "word_b", "n", "pmi"]
    assert len(got) == 0


def test_word_cooccurrence_capped_keeps_original_distances(ray_session):
    # 'x gap y' with window=1: x-y are 2 apart in the ORIGINAL stream, so
    # dropping 'gap' must NOT create an (x, y) pair
    docs = ["x gap y", "x y", "x y", "x y"]  # x,y count 4; gap count 1
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs}))
    got = textstats.word_cooccurrence(ds, window=1, top_k=10, min_count=2)
    assert got.loc[(got.word_a == "x") & (got.word_b == "y"), "n"].tolist() == [3]
