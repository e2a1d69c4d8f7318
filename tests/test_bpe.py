"""BPE training + apply, pinned against a naive recount-per-round reference
written from the paper's spec (no incremental index, no heap, no engine
helpers)."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.functions.words import ascii_words
from searty_ray.stages import bpe


def _naive_merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _naive_train(texts, num_merges, min_count=1):
    wc = collections.Counter(w for t in texts for w in ascii_words(t))
    words = {w: list(w) for w, c in wc.items() if c >= min_count}
    counts = {w: c for w, c in wc.items() if c >= min_count}
    merges = []
    for _ in range(num_merges):
        pc = collections.Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += counts[w]
        if not pc:
            break
        best_c = max(pc.values())
        if best_c <= 0:
            break
        best = min(p for p, c in pc.items() if c == best_c)
        merges.append(best)
        for w in words:
            words[w] = _naive_merge_word(words[w], best[0], best[1])
    return merges


def _naive_encode(word, merges):
    syms = list(word)
    ranks = {p: i for i, p in enumerate(merges)}
    while len(syms) > 1:
        cand = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
        if not cand:
            break
        _, best = min(cand)
        syms = _naive_merge_word(syms, best[0], best[1])
    return syms


@pytest.fixture(scope="module")
def corpus(ray_session):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide lowest",
        "the the the lower newest",
    ] * 3
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    return texts, rows


def test_bpe_train_matches_naive(corpus, ray_session):
    texts, rows = corpus
    ds = ray.data.from_items(rows).repartition(4)
    got = bpe.bpe_train(ds, 15)
    ref = _naive_train(texts, 15)
    assert list(zip(got["left"], got["right"])) == ref
    # layout-stable: different block structure, identical merges
    got2 = bpe.bpe_train(ray.data.from_items(rows).repartition(9), 15)
    pd.testing.assert_frame_equal(got, got2)


def test_bpe_apply_matches_naive(corpus, ray_session):
    texts, rows = corpus
    ds = ray.data.from_items(rows).repartition(3)
    merges = bpe.bpe_train(ds, 12)
    out = (
        bpe.bpe_apply(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref_merges = _naive_train(texts, 12)
    for i, t in enumerate(texts):
        want = sum(len(_naive_encode(w, ref_merges)) for w in ascii_words(t))
        assert int(out.loc[i, "n_bpe_tokens"]) == want
        assert int(out.loc[i, "n_words"]) == len(ascii_words(t))
    # merging can only shrink or keep the symbol count, never grow it
    n_chars = np.array([sum(len(w) for w in ascii_words(t)) for t in texts])
    assert (out["n_bpe_tokens"].to_numpy() <= n_chars).all()
    assert (out["n_bpe_tokens"].to_numpy() >= out["n_words"].to_numpy()).all()


def test_bpe_min_count_caps_vocab(corpus, ray_session):
    _, rows = corpus
    ds = ray.data.from_items(rows)
    wc = bpe.bpe_word_counts(ds, min_count=6).to_pandas()
    assert (wc["cnt"] >= 6).all()
    # "the" appears 9 times (3 × 3 repeats), must survive the cap
    assert "the" in set(wc["word"])
