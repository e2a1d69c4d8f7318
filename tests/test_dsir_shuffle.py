"""DSIR importance weights + deterministic shuffle-export: pinned against
brute-force pure-Python references (independent of both the engine kernels
and the SQL oracles)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from searty_ray.functions.hashing import hash_str_u64, mix64
from searty_ray.functions.words import ascii_words
from searty_ray.stages import sample, textstats


@pytest.fixture(scope="module")
def dsir_docs(ray_session):
    rows = []
    en_words = ["the", "model", "learns", "from", "clean", "text", "data"]
    other = ["zzq", "qqz", "xxj", "jxx", "wvw"]
    for i in range(60):
        if i % 3 == 0:
            words = [en_words[(i + j) % len(en_words)] for j in range(8)]
            lang = "en"
        else:
            words = [other[(i + j) % len(other)] for j in range(6)] + ["the"]
            lang = "xx"
        rows.append({"doc_id": i, "lang": lang, "text": " ".join(words)})
    rows.append({"doc_id": 60, "lang": "en", "text": ""})  # zero-token doc
    return rows


def _brute_dsir(rows, buckets, salt):
    """Direct per-token reference: no combiner, no broadcast, no numpy."""

    def bucket(word: str) -> int:
        return int(hash_str_u64(word, salt=salt) % buckets)

    def ln_micro(x: int) -> int:
        return math.floor(math.log(x) * 1e6 + 0.5)

    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for r in rows:
        for w in ascii_words(r["text"]):
            b = bucket(w)
            cr[b] = cr.get(b, 0) + 1
            if r["lang"] == "en":
                ct[b] = ct.get(b, 0) + 1
    k = ln_micro(sum(cr.values()) + buckets) - ln_micro(sum(ct.values()) + buckets)
    out = {}
    for r in rows:
        toks = ascii_words(r["text"])
        s = sum(
            ln_micro(ct.get(bucket(w), 0) + 1) - ln_micro(cr.get(bucket(w), 0) + 1)
            for w in toks
        )
        out[r["doc_id"]] = (len(toks), s + len(toks) * k)
    return out


def test_dsir_weights_match_bruteforce(dsir_docs, ray_session):
    ds = ray.data.from_items(dsir_docs).repartition(7)  # odd layout on purpose
    got = (
        textstats.dsir_weights(ds, buckets=64)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    ref = _brute_dsir(dsir_docs, buckets=64, salt=textstats.DSIR_SALT)
    assert len(got) == len(ref)
    for doc_id, (n, w) in ref.items():
        assert int(got.loc[doc_id, "n_tokens"]) == n
        assert int(got.loc[doc_id, "dsir_weight_micro"]) == w
    # target-language docs must score higher than the off-target block
    en = got[got.index % 3 == 0].iloc[:-1]["dsir_weight_micro"]
    xx = got[got.index % 3 != 0]["dsir_weight_micro"]
    assert en.min() > xx.max()


def test_dsir_select_is_global_topn(dsir_docs, ray_session):
    ds = ray.data.from_items(dsir_docs).repartition(5)
    all_w = textstats.dsir_weights(ds, buckets=64).to_pandas()
    top = textstats.dsir_select(ds, 10, buckets=64)
    want = (
        all_w.sort_values(["dsir_weight_micro", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(top[want.columns], want)


def test_shuffle_export_permutation_and_layout_stability(ray_session):
    rows = [{"doc_id": i} for i in range(257)]
    outs = []
    for parts in (1, 3, 11):
        ds = ray.data.from_items(rows).repartition(parts)
        out = (
            sample.shuffle_export(ds, shards=8)
            .to_pandas()
            .sort_values(["shard", "pos"])
            .reset_index(drop=True)
        )
        outs.append(out)
    # identical assignment at every layout
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    out = outs[0]
    # a true permutation: every doc exactly once, positions dense per shard
    assert sorted(out["doc_id"]) == list(range(257))
    for _, g in out.groupby("shard"):
        assert list(g["pos"]) == list(range(len(g)))
    # shard/pos reproduce the mix64 rank order (independent recomputation)
    h = mix64(np.arange(257, dtype=np.int64).view(np.uint64) ^ np.uint64(sample.DEFAULT_SALT))
    ref = pd.DataFrame({"doc_id": np.arange(257), "h": h})
    ref["shard"] = (ref["h"] % 8).astype(np.int64)
    ref = ref.sort_values(["shard", "h", "doc_id"]).reset_index(drop=True)
    ref["pos"] = ref.groupby("shard").cumcount()
    merged = out.merge(ref[["doc_id", "shard", "pos"]], on="doc_id", suffixes=("", "_ref"))
    assert (merged["shard"] == merged["shard_ref"]).all()
    assert (merged["pos"] == merged["pos_ref"]).all()


def test_exact_n_sample_deterministic(ray_session):
    rows = [{"doc_id": i} for i in range(500)]
    outs = []
    for parts in (2, 9):
        ds = ray.data.from_items(rows).repartition(parts)
        outs.append(sample.exact_n_sample(ds, 50))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 50 and outs[0]["doc_id"].is_unique
    # exactly the 50 smallest mix64 ranks (independent recomputation)
    h = mix64(np.arange(500, dtype=np.int64).view(np.uint64) ^ np.uint64(sample.DEFAULT_SALT))
    want = set(np.argsort(h, kind="stable")[:50].tolist())
    assert set(outs[0]["doc_id"]) == want


def test_chunk_offsets_cover_and_overlap(ray_session):
    from searty_ray.stages import packing

    rows = [
        {"doc_id": 0, "text": "a" * 250},
        {"doc_id": 1, "text": ""},          # zero chunks
        {"doc_id": 2, "text": "b" * 90},    # exactly one stride
        {"doc_id": 3, "text": "c" * 91},    # spills into a second chunk
        {"doc_id": 4, "text": "é" * 130},   # multibyte: offsets are codepoints
    ]
    out = (
        packing.chunk_offsets(ray.data.from_items(rows), window=120, stride=90)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    lens = {r["doc_id"]: len(r["text"]) for r in rows}
    for doc_id, g in out.groupby("doc_id"):
        n = lens[doc_id]
        assert list(g["chunk_id"]) == list(range(-(-n // 90)))
        assert (g["start"] == g["chunk_id"] * 90).all()
        assert (g["length"] == np.minimum(120, n - g["start"])).all()
        # full coverage: union of [start, start+length) is [0, n)
        assert int((g["start"] + g["length"]).max()) == n
    assert 1 not in set(out["doc_id"])  # empty doc yields no chunks
    assert list(out[out["doc_id"] == 4]["length"]) == [120, 40]


def test_training_export_composition(dsir_docs, ray_session):
    from searty_ray.pipelines import prep

    # plant exact duplicates: higher ids re-using doc 0 and 3's text
    rows = list(dsir_docs)
    rows.append({"doc_id": 100, "lang": "en", "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "lang": "xx", "text": rows[3]["text"]})
    ds = ray.data.from_items(rows).repartition(6)
    out = prep.training_export(ds, 12, 4)
    # output is a permutation of 12 selected ids over 4 shards
    assert len(out) == 12 and out["doc_id"].is_unique
    for _, g in out.groupby("shard"):
        assert list(g["pos"]) == list(range(len(g)))
    # duplicates lose to their min-id winner: the planted copies never export
    assert not {100, 101} & set(out["doc_id"])
    # the selected set is exactly the DSIR top-12 over the deduped corpus
    # (the fixture itself contains repeated texts — dedup by min id first,
    # exactly what exact_dedup elects)
    seen: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        seen.setdefault(r["text"], r["doc_id"])
    dd = [r for r in rows if seen[r["text"]] == r["doc_id"]]
    w = (
        textstats.dsir_weights(ray.data.from_items(dd))
        .to_pandas()
        .sort_values(["dsir_weight_micro", "doc_id"], ascending=[False, True])
    )
    assert set(out["doc_id"]) == set(w.head(12)["doc_id"])
