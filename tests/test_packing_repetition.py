"""pack_sequences, repetition_batch, contamination_check — each against an
independent one-process reference (pandas cumsum / brute-force Python sets)."""

import numpy as np
import pandas as pd
import ray.data

from searty_ray.functions.words import ascii_words
from searty_ray.stages import textstats
from searty_ray.stages.packing import pack_sequences


def _docs(n=97, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "omega"]
    texts = []
    for i in range(n):
        if i % 19 == 0:
            texts.append("")  # empty doc
        elif i % 13 == 0:
            texts.append("solo")  # 1 word (< shingle width)
        else:
            words = rng.choice(vocab, size=rng.integers(1, 40)).tolist()
            # repeated lines for the repetition metrics
            lines = [" ".join(words[: rng.integers(1, 6)]) for _ in range(rng.integers(1, 6))]
            if rng.random() < 0.5 and lines:
                lines.append(lines[0])
            texts.append("\n".join(lines))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def test_pack_sequences_matches_serial_cumsum(ray_session):
    df = _docs()
    ds = ray.data.from_pandas(df)
    out = (
        pack_sequences(ds, budget=17, bucket_span=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_tok = df["text"].map(lambda t: len(ascii_words(t))).to_numpy(dtype=np.int64)
    off = np.cumsum(n_tok) - n_tok
    assert (out["doc_id"].to_numpy() == df["doc_id"].to_numpy()).all()
    assert (out["n_tokens"].to_numpy() == n_tok).all()
    assert (out["tok_offset"].to_numpy() == off).all()
    assert (out["seq_first"].to_numpy() == off // 17).all()
    assert (out["seq_last"].to_numpy() == (off + np.maximum(n_tok, 1) - 1) // 17).all()
    assert (out["seq_pos"].to_numpy() == off % 17).all()
    # sequences must be gapless: every seq id in [0, last] is touched
    total = int(n_tok.sum())
    assert out["seq_last"].max() == (total - 1) // 17


def test_pack_sequences_parallelism_invariant(ray_session):
    df = _docs(n=60, seed=5)
    a = (
        pack_sequences(ray.data.from_pandas(df).repartition(1), budget=10, bucket_span=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_sequences(ray.data.from_pandas(df).repartition(13), budget=10, bucket_span=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_repetition_batch_brute_force():
    df = _docs(n=80, seed=7)
    out = textstats.repetition_batch(df).reset_index(drop=True)
    for i, t in enumerate(df["text"]):
        lines = t.split("\n")
        from collections import Counter

        lc = Counter(lines)
        n_lines = len(lines)
        dup_lines = sum(c for c in lc.values() if c > 1)
        line_chars = sum(len(l) * c for l, c in lc.items())
        dup_chars = sum(len(l) * c for l, c in lc.items() if c > 1)
        words = ascii_words(t)
        wc = Counter(words)
        top = max(wc.values()) if wc else 0
        row = out.iloc[i]
        assert row["n_lines"] == n_lines
        assert row["n_words"] == len(words)
        assert abs(row["dup_line_frac"] - dup_lines / max(n_lines, 1)) < 5e-7
        assert abs(row["dup_line_char_frac"] - dup_chars / max(line_chars, 1)) < 5e-7
        assert abs(row["top_word_frac"] - top / max(len(words), 1)) < 5e-7


def test_contamination_brute_force(ray_session):
    from searty_ray.functions.hashing import mix64
    from searty_ray.stages.sample import DEFAULT_SALT, _threshold

    df = _docs(n=90, seed=13)
    out = (
        textstats.contamination_check(
            ray.data.from_pandas(df), bench_rate=0.25, w=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def shingles(t: str) -> set:
        w = ascii_words(t)
        if len(w) >= 3:
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        return {" ".join(w)} if w else set()

    thresh = _threshold(0.25)
    ids = df["doc_id"].to_numpy().view(np.uint64)
    is_bench = mix64(ids ^ np.uint64(DEFAULT_SALT)) < np.uint64(thresh)
    assert 0 < is_bench.sum() < len(df)
    bench_set = set().union(*(shingles(t) for t in df["text"][is_bench])) if is_bench.any() else set()
    exp = []
    for d, t in zip(df["doc_id"][~is_bench], df["text"][~is_bench]):
        sh = shingles(t)
        hits = len(sh & bench_set)
        exp.append((d, len(sh), hits, hits / max(len(sh), 1)))
    ref = pd.DataFrame(exp, columns=["doc_id", "n_shingles", "n_hits", "contam_frac"])
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert (out["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
    assert (out["n_shingles"].to_numpy() == ref["n_shingles"].to_numpy()).all()
    assert (out["n_hits"].to_numpy() == ref["n_hits"].to_numpy()).all()
    assert np.allclose(out["contam_frac"], ref["contam_frac"], atol=1e-6)
    # at least one real hit so the test has teeth
    assert out["n_hits"].sum() > 0


def test_line_dedup_brute_force(ray_session):
    from searty_ray.stages.dedup import line_dedup

    rng = np.random.default_rng(17)
    lines_pool = [
        "the quick brown fox",
        "jumps over the lazy dog",
        "a b",  # below min_len — never deduped
        "shared boilerplate header line",
        "unique-%d tail",
    ]
    texts = []
    for i in range(60):
        n = rng.integers(1, 7)
        ls = []
        for _ in range(n):
            pick = rng.integers(0, len(lines_pool))
            l = lines_pool[pick]
            ls.append(l % i if "%d" in l else l)
        texts.append("\n".join(ls))
    texts[3] = ""  # empty doc
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})

    out = (
        line_dedup(ray.data.from_pandas(df).repartition(5), min_len=5,
                   num_partitions=8, join_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    # brute-force reference: global first-occurrence wins
    seen = set()
    exp_clean, exp_drop = [], []
    for _, row in df.iterrows():
        kept = []
        dropped = 0
        for line in row["text"].split("\n"):
            if len(line) < 5:
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
            else:
                dropped += 1
        exp_clean.append("\n".join(kept))
        exp_drop.append(dropped)
    assert out["clean"].tolist() == exp_clean
    assert out["n_dropped"].tolist() == exp_drop
    assert out["n_dropped"].sum() > 0  # the test corpus must exercise drops


def test_mix_sources_realizes_exact_proportions(ray_session):
    from searty_ray.stages.sample import mix_sources

    rng = np.random.default_rng(23)
    n = 800
    langs = rng.choice(["en", "fr", "de"], n, p=[0.7, 0.2, 0.1])
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "lang": langs,
                       "junk": rng.random(n)})
    w = {"en": 0.5, "fr": 0.25, "de": 0.25}
    out = (
        mix_sources(ray.data.from_pandas(df).repartition(6), w, group="lang")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import math
    counts = df["lang"].value_counts().to_dict()
    T = min(math.floor(counts[g] / w[g]) for g in w)
    kept = out["lang"].value_counts().to_dict()
    for g in w:
        assert kept.get(g, 0) == math.floor(T * w[g])
    # deterministic across parallelism
    out2 = (
        mix_sources(ray.data.from_pandas(df).repartition(1), w, group="lang")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    # unsatisfiable mix (declared group absent) -> empty
    out3 = mix_sources(
        ray.data.from_pandas(df), {"en": 0.5, "xx": 0.5}, group="lang"
    ).to_pandas()
    assert len(out3) == 0


def test_unigram_bits_per_word_brute_force(ray_session):
    from collections import Counter
    import math

    from searty_ray.stages.textstats import unigram_bits_per_word

    df = _docs(n=70, seed=29)
    K = 5  # small vocab → real OOV backoff
    out = (
        unigram_bits_per_word(ray.data.from_pandas(df).repartition(4), vocab_k=K)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    from searty_ray.functions.hashing import hash_str_u64

    allw = [w for t in df["text"] for w in ascii_words(t)]
    wc = Counter(allw)
    n = len(allw)
    # top-K by count desc, tie-break = word hash asc (the engine's rule)
    vocab = dict(
        sorted(wc.items(), key=lambda kv: (-kv[1], hash_str_u64(kv[0])))[:K]
    )
    for _, row in out.iterrows():
        words = ascii_words(df.loc[df["doc_id"] == row["doc_id"], "text"].iloc[0])
        assert row["n_words"] == len(words)
        if not words:
            assert row["bits_per_word"] == 0.0
            continue
        bits = [math.log2(n) - math.log2(vocab.get(w, 1)) for w in words]
        assert abs(row["bits_per_word"] - sum(bits) / len(bits)) < 1e-3


def test_bigram_bits_per_word_brute_force(ray_session):
    """Bigram LM with stupid backoff vs a pure-Python reference: same fit
    (top-K per gram order, count-desc/hash-asc ties) and the same three
    scoring paths (first word / bigram hit / backoff)."""
    import math
    from collections import Counter

    import numpy as np

    from searty_ray.functions.hashing import hash_str_u64, mix64
    from searty_ray.stages.textstats import BIGRAM_BACKOFF_BITS, bigram_bits_per_word

    df = _docs(n=70, seed=37)
    KU, KB = 5, 8  # small → all three scoring paths fire
    out = (
        bigram_bits_per_word(
            ray.data.from_pandas(df).repartition(4), vocab_k=KU, bigram_k=KB
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    def bihash(a: str, b: str) -> int:
        ha = np.array([hash_str_u64(a)], dtype=np.uint64)
        hb = np.array([hash_str_u64(b)], dtype=np.uint64)
        return int(mix64(ha ^ mix64(hb))[0])

    allw = [w for t in df["text"] for w in ascii_words(t)]
    wc = Counter(allw)
    n = len(allw)
    vocab = dict(sorted(wc.items(), key=lambda kv: (-kv[1], hash_str_u64(kv[0])))[:KU])
    bc = Counter()
    for t in df["text"]:
        ws = ascii_words(t)
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] += 1
    bvocab = dict(
        sorted(bc.items(), key=lambda kv: (-kv[1], bihash(*kv[0])))[:KB]
    )
    hit = backoff = 0
    for _, row in out.iterrows():
        ws = ascii_words(df.loc[df["doc_id"] == row["doc_id"], "text"].iloc[0])
        assert row["n_words"] == len(ws)
        if not ws:
            assert row["bits_per_word"] == 0.0
            continue
        bits = [math.log2(n) - math.log2(vocab.get(ws[0], 1))]
        for a, b in zip(ws, ws[1:]):
            if (a, b) in bvocab and a in vocab:
                bits.append(math.log2(vocab[a]) - math.log2(bvocab[(a, b)]))
                hit += 1
            else:
                bits.append(
                    BIGRAM_BACKOFF_BITS + math.log2(n) - math.log2(vocab.get(b, 1))
                )
                backoff += 1
        assert abs(row["bits_per_word"] - sum(bits) / len(bits)) < 1e-3
    assert hit > 0 and backoff > 0  # both non-first paths exercised


def test_assemble_sequences_round_trip(ray_session):
    from searty_ray.stages.packing import assemble_sequences

    df = _docs(n=85, seed=31)
    B = 13
    out = (
        assemble_sequences(ray.data.from_pandas(df).repartition(6), budget=B,
                           bucket_span=16)
        .to_pandas().sort_values("seq_id").reset_index(drop=True)
    )
    allw = [w for t in df["text"] for w in ascii_words(t)]
    exp_n = len(allw)
    # sequences are dense 0..S-1, budget-sized except the last
    S = (exp_n + B - 1) // B
    assert out["seq_id"].tolist() == list(range(S))
    assert out["n_tokens"].iloc[:-1].eq(B).all()
    assert out["n_tokens"].sum() == exp_n
    # the token stream round-trips exactly
    stream = " ".join(out["text"]).split(" ")
    assert stream == allw
    # parallelism invariance
    out2 = (
        assemble_sequences(ray.data.from_pandas(df).repartition(1), budget=B,
                           bucket_span=16)
        .to_pandas().sort_values("seq_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_empty_and_degenerate_inputs(ray_session):
    """Review-pass regressions: empty corpus, empty benchmark split, and a
    duplicate-free corpus must degrade gracefully (Ray drops the schema of
    fully-empty datasets — the documented gotcha)."""
    from searty_ray.stages.dedup import line_dedup
    from searty_ray.stages.packing import assemble_sequences

    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64), "text": np.empty(0, object)})
    ds_empty = ray.data.from_pandas(empty)
    assert len(pack_sequences(ds_empty, budget=8, bucket_span=4).to_pandas()) == 0
    assert len(assemble_sequences(ds_empty, budget=8, bucket_span=4).to_pandas()) == 0

    df = pd.DataFrame(
        {"doc_id": np.arange(6, dtype=np.int64),
         "text": [f"totally unique line number {i}" for i in range(6)]}
    )
    ds = ray.data.from_pandas(df).repartition(2)

    # no qualifying duplicates anywhere → every doc unchanged, n_dropped 0
    out = (
        line_dedup(ds, min_len=5, num_partitions=4, join_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["clean"].tolist() == df["text"].tolist()
    assert (out["n_dropped"] == 0).all()

    # benchmark split empty (rate ~ 0) → all docs are training docs, 0 hits
    out2 = (
        textstats.contamination_check(ds, bench_rate=1e-12, w=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(out2) == 6 and (out2["n_hits"] == 0).all()
