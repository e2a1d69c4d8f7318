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
