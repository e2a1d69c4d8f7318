"""Training-data operator tests: dedup suite (planted dups), KNN/ANN,
text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from searty_ray.stages import dedup, knn, multimodal, textstats


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the trip",
        "sphinx of black quartz judge my vow said the wizard",
        "how vexingly quick daft zebras jump over fences",
    ]
    rows = []
    for i in range(40):
        text = base[i % 4] + f" filler{i // 4}"
        rows.append({"doc_id": i, "text": text, "source": f"s{i % 2}", "lang": "en"})
    # exact duplicates
    rows.append({"doc_id": 100, "text": base[0], "source": "s0", "lang": "en"})
    rows.append({"doc_id": 101, "text": base[0], "source": "s1", "lang": "en"})
    # near-duplicate: one word changed
    rows.append({"doc_id": 102, "text": base[0].replace("lazy", "sleepy"), "source": "s0", "lang": "en"})
    return ray.data.from_items(rows), rows


def test_exact_dedup(docs_with_dups):
    ds, rows = docs_with_dups
    out = dedup.exact_dedup(ds).to_pandas()
    dups = out[out["n_dups"] > 1]
    assert len(dups) == 1 and int(dups.iloc[0]["doc_id"]) == 100  # min id kept
    assert int(dups.iloc[0]["n_dups"]) == 2  # docs 100 and 101 share text


def test_jaccard_blocked_pairs(docs_with_dups):
    ds, _ = docs_with_dups
    out = dedup.jaccard_dedup_pairs(ds, ["source", "lang"], threshold=0.7).to_pandas()
    pairs = {(a, b) for a, b in zip(out["doc_id_a"], out["doc_id_b"])}
    assert (0, 100) in pairs  # near dup (word-set ⊃), same block
    assert (0, 102) in pairs  # near dup (1 word changed)
    assert (100, 101) not in pairs  # exact dup but different blocks (s0/s1)


def test_minhash_lsh_finds_planted_dups(docs_with_dups):
    ds, _ = docs_with_dups
    out = dedup.minhash_lsh_pairs(ds.select_columns(["doc_id", "text"]), threshold=0.6)
    pairs = {(a, b) for a, b in zip(out["doc_id_a"], out["doc_id_b"])}
    assert (100, 101) in pairs  # exact dups always candidates
    assert (0, 100) in pairs  # near dup above threshold
    # verified jaccard of the exact dup is 1.0
    j = out[(out["doc_id_a"] == 100) & (out["doc_id_b"] == 101)]["jaccard"].iloc[0]
    assert j == 1.0


def test_simhash_near_dups(docs_with_dups):
    ds, _ = docs_with_dups
    out = dedup.simhash_near_dups(ds.select_columns(["doc_id", "text"]), max_hamming=6)
    pairs = {(a, b) for a, b in zip(out["doc_id_a"], out["doc_id_b"])}
    assert (100, 101) in pairs
    zero = out[(out["doc_id_a"] == 100) & (out["doc_id_b"] == 101)]["hamming"].iloc[0]
    assert zero == 0


def test_knn_brute_vs_numpy(ray_session):
    rng = np.random.default_rng(3)
    n, dim = 200, 16
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat], type=pa.list_(pa.float32())),
            }
        )
    )
    queries = {0: mat[0].astype(np.float64), 5: mat[5].astype(np.float64)}
    out = knn.knn_brute_cosine(emb, queries, k=5).to_pandas()
    # ground truth in pure numpy
    unit = mat.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    for qid in queries:
        sims = unit @ unit[qid]
        expect = np.lexsort((np.arange(n), -sims))[:5]
        got = out[out["query_id"] == qid]["vec_id"].to_numpy()
        assert list(got) == list(expect)
        assert got[0] == qid  # self is nearest


def test_ivf_recall(ray_session):
    rng = np.random.default_rng(4)
    n, dim = 500, 16
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat], type=pa.list_(pa.float32())),
            }
        )
    )
    index = knn.IVFIndex.build(emb, nlist=8)
    unit = mat.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    hits = total = 0
    for qid in range(10):
        ids, _ = index.search(mat[qid].astype(np.float64), k=10, nprobe=4)
        exact = set(np.lexsort((np.arange(n), -(unit @ unit[qid])))[:10].tolist())
        hits += len(exact & set(ids.tolist()))
        total += 10
    assert hits / total >= 0.7, f"IVF recall too low: {hits / total}"


def test_lang_id_deterministic(ray_session):
    b = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["the cat and the dog", "der hund ist gut und der", "xyzzy plugh"]})
    out = textstats.lang_id_batch(b)
    assert list(out["pred_lang"]) == ["en", "de", "und"]


def test_quality_and_counts(ray_session):
    b = pd.DataFrame({"doc_id": [0], "text": ["the the fox"]})
    q = textstats.quality_batch(b)
    assert q["n_words"].iloc[0] == 3
    assert q["stop_ratio"].iloc[0] == pytest.approx(2 / 3, abs=1e-6)
    assert q["distinct_ratio"].iloc[0] == pytest.approx(2 / 3, abs=1e-6)
    c = textstats.token_counts_batch(b)
    assert c["n_chars"].iloc[0] == 11 and c["n_trigrams"].iloc[0] == 9


def test_winnow_fingerprint_robust():
    a = textstats.winnow_fingerprint("the quick brown fox jumps over the lazy dog " * 4)
    b = textstats.winnow_fingerprint("the quick brown fox jumps over the lazy dog " * 4 + "tail")
    assert a and b
    overlap = len(set(a) & set(b)) / len(set(a))
    assert overlap > 0.7  # local change ⇒ most fingerprints survive
    assert textstats.winnow_fingerprint("ab") == []


def test_multimodal_stub(ray_session):
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()), "text": pa.array(["abc", "x" * 100])})
    payload = multimodal.attach_payload_batch(t)
    assert payload["payload"].type == pa.large_binary()
    meta = multimodal.ImageDecodeStage(fake=True)(payload)
    assert meta["n_bytes"].to_pylist() == [3, 100]
    with pytest.raises(NotImplementedError):
        multimodal.ImageDecodeStage(fake=False)(payload)
    frames = multimodal.FrameSampleStage(stride=10)(payload)
    # doc 1: 100 bytes -> 100%30+1=11 frames -> sampled at 0, 10
    assert frames.to_pydict()["frame_idx"] == [0, 0, 10]
