"""Text-analysis operators for training-data pipelines (driver instructions):
language-ID, quality scoring, token counting, document fingerprinting.

All are single-pass ``map_batches`` transforms over the ``documents`` table —
vectorized pandas/numpy string kernels, no shuffle.  Each has an exact DuckDB
mirror in the gate (pipelines/gate.py), so semantics are pinned:

* ``lang_id`` — marker-word voting with a fixed priority order (deterministic
  argmax; 'und' when no marker hits).
* ``quality`` — n_words, stopword ratio, distinct-word ratio, mean word length.
* ``token_counts`` — chars, whitespace words, trigram count (max(chars-2,0)).
* ``fingerprint`` — splitmix64 hash of whitespace-normalized lowercased text
  (exact-dup key; vectorized, SQL-mirrored bit-exactly), plus a winnowing
  rolling-hash fingerprint (pytest-only; not SQL).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import mix64
from ..functions.words import WORD_RE, WS_CLASS, WS_RE, round6

# fixed priority order breaks ties deterministically (first wins)
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "of", "and", "is")),
    ("de", ("der", "die", "und", "ist")),
    ("es", ("el", "los", "una", "es")),
    ("fr", ("le", "les", "une", "est")),
    ("zh", ("的", "是", "了")),
]

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in")

def _token_count_re(word: str) -> re.Pattern:
    """Counts ASCII-whitespace-delimited occurrences of ``word`` — exactly
    the SQL mirrors' word membership (functions/words.py: RE2 semantics),
    without materializing the split."""
    nonws = WS_CLASS.replace("[", "[^", 1)
    return re.compile(rf"(?<!{nonws}){re.escape(word)}(?!{nonws})")


_LANG_RES: list[tuple[str, list[re.Pattern]]] = [
    (lang, [_token_count_re(m) for m in markers]) for lang, markers in LANG_MARKERS
]
_STOP_RES: list[re.Pattern] = [_token_count_re(w) for w in STOPWORDS]


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Marker-word voting, vectorized: one ``str.count`` kernel per marker
    (C regex over the column) instead of a per-row Python membership loop."""
    text = batch["text"]
    pred = np.full(len(batch), "und", dtype=object)
    best = np.zeros(len(batch), dtype=np.int64)
    for lang, pats in _LANG_RES:  # priority order: strictly-greater wins
        c = np.zeros(len(batch), dtype=np.int64)
        for p in pats:
            c += text.str.count(p).to_numpy(dtype=np.int64)
        better = c > best
        pred[better] = lang
        best = np.maximum(best, c)
    return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pd.Series(pred, index=batch.index)})


def quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Quality ratios from vectorized string kernels:

    * n_words / distinct-word count — one explode + C-level groupby nunique;
    * stopword count — per-stopword ``str.count`` kernels;
    * mean word length — (chars − whitespace chars) / n_words, which equals
      the summed split-word lengths exactly.
    """
    text = batch["text"]
    words = text.str.findall(WORD_RE)  # ASCII-ws words == the SQL split
    n_words = words.str.len().fillna(0).astype("int64")
    denom = n_words.clip(lower=1)
    stop_count = np.zeros(len(batch), dtype=np.int64)
    for p in _STOP_RES:
        stop_count += text.str.count(p).to_numpy(dtype=np.int64)
    exploded = words.explode().dropna()
    nunique = exploded.groupby(level=0).nunique()
    distinct = pd.Series(0, index=batch.index, dtype="int64")
    distinct.loc[nunique.index] = nunique
    word_chars = text.str.len() - text.str.count(WS_CLASS)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "stop_ratio": round6(stop_count / denom),
            "distinct_ratio": round6(distinct / denom),
            "mean_word_len": round6(word_chars / denom),
        }
    )


#: BPE-ish pre-tokenization (driver instructions: "whitespace + a BPE-ish
#: regex"): letter runs, digit runs, punctuation runs — the granularity a
#: byte-pair tokenizer merges from.  Alternation-order-free, so Python re
#: and DuckDB RE2 count identically (SQL mirror in pipelines/gate.py).
BPE_RE = r"[A-Za-z]+|[0-9]+|[^\t\n\f\r A-Za-z0-9]+"  # \s spelled out = RE2's ASCII class


def token_counts_batch(batch: pd.DataFrame) -> pd.DataFrame:
    n_chars = batch["text"].str.len().astype("int64")
    n_words = batch["text"].str.count(WORD_RE).astype("int64")
    n_bpe = batch["text"].str.count(BPE_RE).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "n_trigrams": (n_chars - 2).clip(lower=0),
            "n_bpe_tokens": n_bpe,
        }
    )


#: vowel-RUN syllable heuristic: one syllable per maximal [aeiouy]+ run in
#: the lowercased text.  Runs never span whitespace (spaces are not
#: vowels), so the whole-doc count equals the per-word sum — one C-level
#: regex pass per doc, no word explode.
SYLLABLE_RE = re.compile(r"[aeiouy]+")
#: sentence boundaries: maximal terminal-punctuation runs ("..." = one)
SENTENCE_RE = re.compile(r"[.!?]+")


def readability_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc Flesch-reading-ease-shaped readability in EXACT milli-units
    (the idf_micro house pattern): every count is an int64 regex-run tally
    and the score is pure integer floor arithmetic, so the SQL mirror is
    bit-identical —

        flesch_milli = 206835 - (1015·words)//sentences - (84600·syll)//words

    with words/sentences/syllables clamped to ≥1 (empty-doc guard, mirrored
    by greatest(x, 1)).  The standard Flesch constants 206.835 / 1.015 /
    84.6 scaled ×1000; floor-div replaces the float ratios, which keeps the
    score an exact total order at the cost of ≤1 milli-unit quantization."""
    text = batch["text"]
    n_words = text.str.count(WORD_RE).astype("int64")
    n_sents = text.str.count(SENTENCE_RE).astype("int64")
    n_syll = text.str.lower().str.count(SYLLABLE_RE).astype("int64")
    w = n_words.clip(lower=1).to_numpy(np.int64)
    s = n_sents.clip(lower=1).to_numpy(np.int64)
    y = n_syll.clip(lower=1).to_numpy(np.int64)
    flesch_milli = (
        np.int64(206835) - (np.int64(1015) * w) // s - (np.int64(84600) * y) // w
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "n_sentences": n_sents,
            "n_syllables": n_syll,
            "flesch_milli": flesch_milli,
        }
    )


#: the Gopher rule-filter stopword list (Rae et al. 2021, table A1 — the
#: "contains ≥2 of" rule), distinct from the ratio STOPWORDS above
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STOP_RES: list[re.Pattern] = [_token_count_re(w) for w in GOPHER_STOPWORDS]


def gopher_rules_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 §A.1.1), integer-exact.

    Every threshold decision is an INTEGER cross-multiplication (house
    rule: no float compare where a decision depends on the value), so the
    SQL mirror can never diverge on rounding:

    * 50 ≤ n_words ≤ 100,000
    * mean word length in [3, 10]   ⇔  3·n_words ≤ word_chars ≤ 10·n_words
    * symbol-to-word ratio ≤ 0.1    ⇔  10·n_symbols ≤ n_words   (# and …)
    * bullet-line fraction ≤ 0.9    ⇔  10·n_bullet ≤ 9·n_lines
    * ellipsis-line fraction ≤ 0.3  ⇔  10·n_ellipsis ≤ 3·n_lines
    * alpha-word fraction ≥ 0.8     ⇔  5·n_alpha_words ≥ 4·n_words
    * ≥ 2 distinct Gopher stopwords present

    Zero shuffle: a stateless per-batch map over (doc_id, text); all
    kernels are C-level pandas/RE2-compatible regex counts.
    """
    text = batch["text"]
    n = len(batch)
    n_words = text.str.count(WORD_RE).astype("int64")
    word_chars = (text.str.len() - text.str.count(WS_CLASS)).astype("int64")
    # words containing at least one letter: explode + contains + segment sum
    words = text.str.findall(WORD_RE)
    exploded = words.explode().dropna()
    if len(exploded):
        alpha_hits = exploded.str.contains(r"[A-Za-z]", regex=True).groupby(level=0).sum()
    else:
        alpha_hits = pd.Series(dtype="int64")
    n_alpha = pd.Series(0, index=batch.index, dtype="int64")
    n_alpha.loc[alpha_hits.index] = alpha_hits.astype("int64")
    # distinct Gopher stopwords present (whole-word, case-SENSITIVE —
    # matches the SQL oracle's list_contains; lowercase stopwords only)
    n_stop = np.zeros(n, dtype=np.int64)
    for p in _GOPHER_STOP_RES:
        n_stop += (text.str.count(p).to_numpy(dtype=np.int64) > 0).astype(np.int64)
    n_lines = (text.str.count(r"\n") + 1).astype("int64")
    n_bullet = text.str.count(r"(?m)^[\t ]*[-*•]").astype("int64")
    n_ellipsis = text.str.count(r"(?m)(?:\.\.\.|…)$").astype("int64")
    n_symbols = (
        text.str.count(r"#") + text.str.count(r"\.\.\.") + text.str.count(r"…")
    ).astype("int64")
    ok = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (3 * n_words <= word_chars)
        & (word_chars <= 10 * n_words)
        & (10 * n_symbols <= n_words)
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ellipsis <= 3 * n_lines)
        & (5 * n_alpha >= 4 * n_words)
        & (n_stop >= 2)
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "word_chars": word_chars,
            "n_alpha_words": n_alpha,
            "n_stop_words": pd.Series(n_stop, index=batch.index),
            "n_lines": n_lines,
            "n_bullet_lines": n_bullet,
            "n_ellipsis_lines": n_ellipsis,
            "n_symbols": n_symbols,
            "gopher_pass": ok,
        }
    )


#: fixed quality-model coefficients (bias, n_words/100, stop_ratio,
#: distinct_ratio, mean_word_len/10) — embedded verbatim in the SQL mirror
QUALITY_MODEL_W = (-1.5, 0.8, 2.0, 1.2, 0.5)


class QualityModelStage:
    """Batched model inference (driver instructions: "batched model
    inference" as an actor-pool stage): the "model" — a logistic regression
    over the quality features — is materialized ONCE per actor in
    ``__init__`` (stand-in for a real model load), and ``__call__`` scores a
    whole batch with one matrix product + sigmoid.  Deterministic weights
    keep it SQL-mirrorable (gate ``quality_score``); swap the constructor
    body for a real checkpoint load in production."""

    def __init__(self):
        self.w = np.array(QUALITY_MODEL_W, dtype=np.float64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(batch)
        return pd.DataFrame(
            {"doc_id": q["doc_id"], "quality_score": score_quality(q, self.w)}
        )


def score_quality(q: pd.DataFrame, w: np.ndarray) -> np.ndarray:
    """Logistic score over a quality_batch frame — one matmul + sigmoid,
    shared by QualityModelStage and the composed prep pipeline."""
    X = np.column_stack(
        [
            np.ones(len(q)),
            q["n_words"].to_numpy(dtype=np.float64) / 100.0,
            q["stop_ratio"].to_numpy(dtype=np.float64),
            q["distinct_ratio"].to_numpy(dtype=np.float64),
            q["mean_word_len"].to_numpy(dtype=np.float64) / 10.0,
        ]
    )
    return round6(1.0 / (1.0 + np.exp(-(X @ w))))


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """16-hex-char fingerprint of whitespace-normalized lowercased text.

    The hash is the engine's own splitmix64 chunk-fold primitive
    (functions/hashing.hash_bytes_u64) computed zero-copy over the batch —
    no per-row hashlib loop — and its SQL mirror is bit-exact
    (gate SQL_FINGERPRINT), so the oracle checks the real kernel."""
    import pyarrow as pa

    from ..functions.hashing import hash_bytes_u64
    from ..stages.encode_stage import _binary_offsets, _binary_values

    norm = batch["text"].str.replace(WS_RE, " ", regex=True).str.lower()
    arr = pa.array(norm, type=pa.large_string())
    buf = np.frombuffer(_binary_values(arr), dtype=np.uint8)
    offs = _binary_offsets(arr)
    h = hash_bytes_u64(buf, offs[:-1], offs[1:] - offs[:-1])
    # one hexdump of the big-endian hash bytes, resliced 16 chars per row
    hx = h.astype(">u8").tobytes().hex()
    fp = np.frombuffer(hx.encode("ascii"), dtype="S16").astype("U16")
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fp})


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    k-gram rolling hashes, minimum per sliding window, deduplicated.
    Pytest-only (no SQL oracle); vectorized numpy."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if len(cps) < k:
        return []
    n = len(cps) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        h = mix64(h ^ (cps[i : i + n].astype(np.uint64) << np.uint64(i % 8)))
    if n <= window:
        return [int(h.min())]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return [int(x) for x in np.unique(sw.min(axis=1))]  # unique is sorted


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


def word_doc_freq(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """→ (word, df): per-word document frequency.  Combiner-first: each
    batch emits one row per distinct (word) it saw with its partial count
    — exact because one row IS one document, so per-batch (doc, word)
    dedup is global dedup.  The shuffle moves vocabulary-scale partials,
    never word instances."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.findall(WORD_RE).explode().dropna()
        doc_ids = b["doc_id"].reindex(words.index)
        pairs = pd.DataFrame(
            {"doc_id": doc_ids.to_numpy(), "word": words.to_numpy()}
        ).drop_duplicates()
        vc = pairs["word"].value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy(np.int64)})

    return docs.map_batches(partial, batch_format="pandas").groupby("word").aggregate(
        Sum("cnt", alias_name="df")
    )


def idf_micro(df: np.ndarray, n_docs: int) -> np.ndarray:
    """``round(ln((N+1)/(df+1)) · 1e6)`` as int64 — integer micro-units so
    TF·IDF ordering and values are EXACTLY reproducible in SQL (floats
    only appear at the final ÷1e6 display step, identical both sides)."""
    x = np.log((n_docs + 1.0) / (df.astype(np.float64) + 1.0)) * 1e6
    return np.floor(x + 0.5).astype(np.int64)  # half-away (values ≥ 0)


class TfIdfStage:
    """Per-doc top-k TF-IDF keywords: the vocabulary's idf table is
    broadcast ONCE (``ray.put``), fetched per actor in ``__init__``; each
    batch is a pure local pass (explode → tf → integer score → head-k) —
    ZERO shuffle on the doc side.

    SCALE CONTRACT: the idf table is vocabulary-scale (sublinear in the
    corpus) and must fit a worker heap; for an open web-scale vocabulary
    use ``tfidf_topk(mode="join")`` (the DEFAULT) — the df table stays a
    Dataset and joins (doc, word, tf) rows on the word key."""

    def __init__(self, idf_ref, k: int):
        import ray as _ray

        self.idf: pd.Series = _ray.get(idf_ref)
        self.k = k

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.findall(WORD_RE).explode().dropna()
        doc_ids = b["doc_id"].reindex(words.index)
        pairs = pd.DataFrame({"doc_id": doc_ids.to_numpy(), "word": words.to_numpy()})
        tf = pairs.groupby(["doc_id", "word"], sort=False).size().reset_index(name="tf")
        tf["score_micro"] = tf["tf"].to_numpy(np.int64) * self.idf.reindex(
            tf["word"]
        ).to_numpy(np.int64)
        s = tf.sort_values(
            ["doc_id", "score_micro", "word"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = s.groupby("doc_id", sort=False).head(self.k).copy()
        out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
        out["tfidf"] = out["score_micro"].to_numpy(np.int64) / 1e6
        return out[["doc_id", "word", "tf", "tfidf", "rank"]].astype(
            {"tf": "int64", "rank": "int64"}
        )


def _tf_pairs(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) batch → exact (doc_id, word, tf) rows.  Exact because
    one row IS one document, so a per-batch groupby is the global tf."""
    words = b["text"].str.findall(WORD_RE).explode().dropna()
    doc_ids = b["doc_id"].reindex(words.index)
    pairs = pd.DataFrame({"doc_id": doc_ids.to_numpy(), "word": words.to_numpy()})
    return pairs.groupby(["doc_id", "word"], sort=False).size().reset_index(name="tf")


def _topk_per_doc(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Vectorized per-doc head-k by (-score, word) over one doc partition."""
    s = g.sort_values(
        ["doc_id", "score_micro", "word"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    out = s.groupby("doc_id", sort=False).head(k).copy()
    out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
    out["tfidf"] = out["score_micro"].to_numpy(np.int64) / 1e6
    return out[["doc_id", "word", "tf", "tfidf", "rank"]].astype(
        {"tf": "int64", "rank": "int64"}
    )


def tfidf_topk(
    docs: "ray.data.Dataset",
    k: int = 5,
    concurrency=None,
    mode: str = "join",
    join_partitions: int = 16,
) -> "ray.data.Dataset":
    """→ (doc_id, word, tf, tfidf, rank): each document's top-``k``
    keywords by TF·IDF (ties broken ascending on word — unique output).

    ``mode="join"`` (default — the web-scale path): the vocabulary df table
    STAYS a Dataset.  (doc, word, tf) rows hash-join the (word, idf) table
    on word, then one coarse doc-hash shuffle ranks per-doc top-k.  The
    vocabulary never touches the driver and never broadcasts — at 10⁹+
    distinct terms both sides exchange on the word key (replaces the r3
    driver-``to_pandas`` + pandas-Series broadcast — VERDICT r3 item 2).

    ``mode="broadcast"``: two passes — vocabulary df (combiner groupby) →
    broadcast idf (one ``ray.put``, fetched per actor) → per-batch local
    scoring with zero doc-side shuffle.  Faster when the vocabulary fits a
    worker heap (closed corpora, dimension-scale vocab); the caller opts in.
    """
    import ray as _ray

    n_docs = docs.count()
    if mode == "broadcast":
        if concurrency is None:
            from ..functions.resources import actor_pool

            concurrency = actor_pool()
        df_tab = word_doc_freq(docs).to_pandas()  # vocabulary-scale (see TfIdfStage)
        idf = pd.Series(
            idf_micro(df_tab["df"].to_numpy(), n_docs), index=df_tab["word"].to_numpy()
        )
        return docs.map_batches(
            TfIdfStage,
            batch_format="pandas",
            concurrency=concurrency,
            fn_constructor_kwargs={"idf_ref": _ray.put(idf), "k": k},
        )
    if mode != "join":
        raise ValueError(f"tfidf_topk: mode={mode!r} (join/broadcast)")
    from .analytics import _pk_any
    from .joins import hash_join

    def to_idf(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"word": b["word"], "idf_micro": idf_micro(b["df"].to_numpy(np.int64), n_docs)}
        )

    idf_ds = word_doc_freq(docs).map_batches(to_idf, batch_format="pandas")
    pairs = docs.map_batches(_tf_pairs, batch_format="pandas")
    scored = hash_join(pairs, idf_ds, on="word", num_partitions=join_partitions)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id", "word", "tf"]].copy()
        out["score_micro"] = b["tf"].to_numpy(np.int64) * b["idf_micro"].to_numpy(np.int64)
        out["__pk"] = _pk_any(b["doc_id"], 64)
        return out

    return (
        scored.map_batches(score, batch_format="pandas")
        .groupby("__pk")
        .map_groups(lambda g: _topk_per_doc(g, k), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# percentile-threshold quality filtering (two-pass)
# ---------------------------------------------------------------------------


def quantile_threshold(values: np.ndarray, p: float) -> float:
    """Discrete p-quantile = sorted[ceil(p·n) − 1] — an order statistic
    (no interpolation), bit-identical to DuckDB ``quantile_disc``."""
    import math

    s = np.sort(np.asarray(values, dtype=np.float64))
    return float(s[min(max(math.ceil(p * len(s)) - 1, 0), len(s) - 1)])


def quality_quantile_filter(
    docs: "ray.data.Dataset", p: float = 0.75, by: str = "lang",
) -> "ray.data.Dataset":
    """Keep documents whose model quality score is ≥ the per-``by``-group
    discrete p-quantile.  The canonical "top-X% by quality" training-data
    filter, exact by construction:

    1. score pass — score every doc (one matmul per batch; the toy model's
       weights travel in the task closure — swap in the QualityModelStage
       actor pool for a real checkpoint); the narrow (doc_id, group, score)
       table is materialized (re-scoring the corpus for pass 2 would double
       the model compute; the scored table is ~24 B/doc —
       object-store-scale, never driver-scale).
    2. threshold pass — one hash shuffle of the narrow table per group,
       per-group order statistic (``quantile_disc`` semantics — bit-exact,
       no float interpolation ambiguity at the keep/drop boundary), tiny
       (group, threshold) table broadcast back into a vectorized filter.

    Scores are round6()ed BEFORE the quantile so engine and SQL compare
    identical float sets on both sides of the threshold.
    """
    import ray as _ray

    from .analytics import _pk_any

    w = np.array(QUALITY_MODEL_W, dtype=np.float64)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        q = quality_batch(b)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                by: b[by].to_numpy(),
                "quality_score": round6(score_quality(q, w)),
            }
        )

    scored = docs.map_batches(score, batch_format="pandas").materialize()

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__pk"] = _pk_any(b[by], 16)
        return b

    def thr(g: pd.DataFrame) -> pd.DataFrame:
        r = (
            g.groupby(by, sort=False)["quality_score"]
            .agg(lambda v: quantile_threshold(v.to_numpy(), p))
            .reset_index(name="thr")
        )
        return r

    thresholds = (
        scored.map_batches(tag, batch_format="pandas")
        .groupby("__pk")
        .map_groups(thr, batch_format="pandas")
        .to_pandas()  # one row per group — dimension-scale
    )
    thr_ref = _ray.put(dict(zip(thresholds[by], thresholds["thr"])))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(thr_ref)
        cut = b[by].map(t).to_numpy(dtype=np.float64)
        return b[b["quality_score"].to_numpy() >= cut]

    return scored.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# PII scrubbing (training-data normalization)
# ---------------------------------------------------------------------------

# both patterns are RE2-compatible (no backrefs / lookaround), so the Python
# kernel and the DuckDB oracle run the IDENTICAL expression
PII_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUM_PAT = r"[0-9]{2,}"
PII_EMAIL_TOKEN = "<EMAIL>"
PII_NUM_TOKEN = "<NUM>"


def scrub_pii_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Redact email addresses and multi-digit runs → (id cols, clean,
    n_email, n_num).  Single map_batches pass, C-regex pandas str kernels,
    no shuffle; emails first (they contain digits)."""
    s = batch[text_col].astype(str)
    n_email = s.str.count(PII_EMAIL_PAT).astype("int64")
    clean = s.str.replace(PII_EMAIL_PAT, PII_EMAIL_TOKEN, regex=True)
    n_num = clean.str.count(PII_NUM_PAT).astype("int64")
    clean = clean.str.replace(PII_NUM_PAT, PII_NUM_TOKEN, regex=True)
    out = batch.drop(columns=[text_col]).copy()
    out["clean"] = clean
    out["n_email"] = n_email
    out["n_num"] = n_num
    return out


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality rules) + benchmark contamination
# ---------------------------------------------------------------------------


def repetition_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1 —
    "repetitious documents" filters), fully vectorized: one line explode +
    one word explode, C-level groupby aggregations, zero per-row Python.

    * ``dup_line_frac``   — fraction of newline-split lines that belong to a
      line value occurring more than once in the doc;
    * ``dup_line_char_frac`` — fraction of line CHARS inside such lines;
    * ``top_word_frac``   — occurrences of the most frequent word / n_words.

    Line = ``split('\\n')`` segment (empty segments count, matching DuckDB
    ``string_split(text, chr(10))``); word = ASCII-whitespace word (the
    shared words.WORD_RE primitive).  Zero-line/zero-word denominators
    yield 0.0.  Single map_batches pass, no shuffle.
    """
    idx = np.arange(len(batch))
    out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()}, index=idx)
    text = batch["text"].reset_index(drop=True)

    lines = text.str.split("\n")
    ex = lines.explode()
    lc = (
        pd.DataFrame({"i": ex.index.to_numpy(), "line": ex.to_numpy()})
        .groupby(["i", "line"], sort=False)
        .size()
        .reset_index(name="c")
    )
    lc["chars"] = lc["line"].str.len().to_numpy(dtype=np.int64) * lc["c"]
    dup = lc["c"] > 1
    per = lc.groupby("i", sort=False).agg(
        n_lines=("c", "sum"), line_chars=("chars", "sum")
    )
    dupper = lc[dup].groupby("i", sort=False).agg(
        dup_lines=("c", "sum"), dup_chars=("chars", "sum")
    )
    n_lines = np.zeros(len(batch), dtype=np.int64)
    line_chars = np.zeros(len(batch), dtype=np.int64)
    n_lines[per.index] = per["n_lines"]
    line_chars[per.index] = per["line_chars"]
    dup_lines = np.zeros(len(batch), dtype=np.int64)
    dup_chars = np.zeros(len(batch), dtype=np.int64)
    dup_lines[dupper.index] = dupper["dup_lines"]
    dup_chars[dupper.index] = dupper["dup_chars"]

    words = text.str.findall(WORD_RE)
    n_words = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    wex = words.explode().dropna()
    wc = (
        pd.DataFrame({"i": wex.index.to_numpy(), "w": wex.to_numpy()})
        .groupby(["i", "w"], sort=False)
        .size()
        .groupby(level=0)
        .max()
    )
    top_word = np.zeros(len(batch), dtype=np.int64)
    top_word[wc.index] = wc

    out["n_lines"] = n_lines
    out["dup_line_frac"] = round6(dup_lines / np.maximum(n_lines, 1))
    out["dup_line_char_frac"] = round6(dup_chars / np.maximum(line_chars, 1))
    out["n_words"] = n_words
    out["top_word_frac"] = round6(top_word / np.maximum(n_words, 1))
    return out


def contamination_check(
    docs: "ray.data.Dataset",
    *,
    bench_rate: float = 0.05,
    w: int = 3,
    key: str = "doc_id",
    text: str = "text",
    salt: int | None = None,
) -> "ray.data.Dataset":
    """Benchmark-contamination scan: for every TRAINING doc, the fraction of
    its distinct word ``w``-shingles that also appear anywhere in the
    BENCHMARK split (the standard n-gram-overlap decontamination test a
    training pipeline runs against held-out eval sets).

    The benchmark split is the deterministic hash sample
    (stages/sample.bernoulli_sample semantics: ``mix64(doc_id ^ salt) <
    rate·2⁶⁴``) so the gate's DuckDB oracle reproduces the split bit-exactly;
    swap the predicate for a real benchmark table at production scale —
    the plumbing is identical.

    Scale shape: pass 1 streams ONLY the benchmark docs (filter pushed into
    the scan) and reduces their shingle hashes to per-batch DISTINCT arrays;
    the driver unions them once and broadcasts ONE sorted uint64 array via
    ``ray.put`` (contract: the benchmark gram set is small — benchmarks are
    measured in MBs, not TBs; it is read per actor, never reshipped per
    batch).  Pass 2 streams the training docs through a searchsorted
    membership + bincount — no shuffle anywhere, content never moves.

    → (doc_id, n_shingles, n_hits, contam_frac) for non-benchmark docs,
    ``contam_frac = n_hits / max(n_shingles, 1)`` rounded to 6.
    """
    import ray as _ray
    import ray.data  # noqa: F401

    from .dedup import _batch_shingle_hashes
    from .sample import DEFAULT_SALT, _threshold

    if salt is None:
        salt = DEFAULT_SALT
    thresh = np.uint64(_threshold(bench_rate))
    salt_u = np.uint64(salt)

    def _is_bench(batch: pd.DataFrame) -> np.ndarray:
        ids = batch[key].to_numpy().astype(np.int64).view(np.uint64)
        return mix64(ids ^ salt_u) < thresh

    def bench_grams(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text].to_numpy()[_is_bench(batch)].tolist()
        flat, _ = _batch_shingle_hashes(texts, w)
        return pd.DataFrame({"h": np.unique(flat).view(np.int64)})

    parts = docs.map_batches(bench_grams, batch_format="pandas").to_pandas()
    if "h" not in parts.columns:  # empty benchmark split → schema-less frame
        bench_set = np.empty(0, dtype=np.uint64)
    else:
        bench_set = np.unique(parts["h"].to_numpy().view(np.uint64))
    set_ref = _ray.put(bench_set)
    _cache: dict = {}

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        if "s" not in _cache:
            _cache["s"] = _ray.get(set_ref)
        bset = _cache["s"]
        sub = batch[~_is_bench(batch)]
        flat, counts = _batch_shingle_hashes(sub[text].tolist(), w)
        if len(bset) == 0:
            member = np.zeros(len(flat), dtype=bool)
        else:
            pos = np.searchsorted(bset, flat)
            member = (pos < len(bset)) & (bset[np.minimum(pos, len(bset) - 1)] == flat)
        docrep = np.repeat(np.arange(len(sub)), counts)
        hits = np.bincount(docrep[member], minlength=len(sub)).astype(np.int64)
        return pd.DataFrame(
            {
                key: sub[key].to_numpy(),
                "n_shingles": counts,
                "n_hits": hits,
                "contam_frac": round6(hits / np.maximum(counts, 1)),
            }
        )

    return docs.map_batches(scan, batch_format="pandas")


# ---------------------------------------------------------------------------
# Unigram-LM scoring (the CCNet perplexity-filter shape with a deterministic
# stand-in model): pass 1 fits the "model" — global top-K unigram counts —
# with combiner-first partial counts; pass 2 broadcasts it and scores every
# document as bits-per-word (−mean log2 P(word)), OOV backing off to count 1.
# Swap pass 1 for a real LM checkpoint load and pass 2's kernel for its
# scorer; the Ray plumbing (two-pass global stats → ray.put → streaming
# scoring map) is the production shape either way.
# ---------------------------------------------------------------------------


def unigram_bits_per_word(
    docs: "ray.data.Dataset",
    *,
    vocab_k: int = 4096,
    key: str = "doc_id",
    text: str = "text",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """→ (doc_id, n_words, bits_per_word): higher = less like the corpus
    (the perplexity-style quality signal).  Vocabulary = the global top-K
    words by count (ties → smaller hash), counted with one narrow shuffle of
    per-batch (hash, count) partials; the scoring pass streams with the
    vocab broadcast once via ``ray.put``.  Hash identity throughout — the
    DuckDB oracle mirrors the same splitmix64 primitive bit-exactly.

    Partitioning contract: one hash partition's distinct words fit a worker
    (vocabulary scale / num_partitions); the broadcast vocab is K rows.
    """
    import ray as _ray

    from .dedup import _batch_word_hashes

    P = np.uint64(num_partitions)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        flat, _nw = _batch_word_hashes(b[text].tolist())
        h, c = np.unique(flat, return_counts=True)
        return pd.DataFrame(
            {"h": h, "c": c.astype(np.int64), "__hp": (h % P).astype(np.int64)}
        )

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", sort=False, as_index=False)["c"].sum()
        total = int(s["c"].sum())  # partition total over ALL its words
        s = s.sort_values(["c", "h"], ascending=[False, True], kind="mergesort")
        top = s.head(vocab_k).copy()
        top["__total"] = np.int64(0)
        sent = pd.DataFrame(
            {"h": np.array([0], dtype=np.uint64), "c": np.array([0], dtype=np.int64),
             "__total": np.array([total], dtype=np.int64)}
        )
        return pd.concat([top, sent], ignore_index=True)

    cand = (
        docs.map_batches(partials, batch_format="pandas")
        .groupby("__hp")
        .map_groups(reduce_part, batch_format="pandas")
        .to_pandas()  # ≤ (K + 1) rows per partition — model-scale, not corpus
    )
    n_total = int(cand["__total"].sum())
    words = cand[cand["__total"] == 0]
    words = words.sort_values(["c", "h"], ascending=[False, True], kind="mergesort")
    vocab = words.head(vocab_k)
    order = np.argsort(vocab["h"].to_numpy().astype(np.uint64))
    vh = vocab["h"].to_numpy().astype(np.uint64)[order]
    vc = vocab["c"].to_numpy().astype(np.float64)[order]
    model_ref = _ray.put((vh, vc, float(n_total)))
    _cache: dict = {}

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if "m" not in _cache:
            _cache["m"] = _ray.get(model_ref)
        vh_l, vc_l, n_l = _cache["m"]
        flat, nw = _batch_word_hashes(b[text].tolist())
        if len(vh_l) and len(flat):
            pos = np.searchsorted(vh_l, flat)
            ok = (pos < len(vh_l)) & (vh_l[np.minimum(pos, len(vh_l) - 1)] == flat)
            c = np.where(ok, vc_l[np.minimum(pos, len(vh_l) - 1)], 1.0)
        else:
            c = np.ones(len(flat))
        bits = np.log2(n_l) - np.log2(c)  # −log2(c/N), all ≥ 0
        docrep = np.repeat(np.arange(len(b)), nw)
        sums = np.bincount(docrep, weights=bits, minlength=len(b))
        denom = np.maximum(nw, 1)
        return pd.DataFrame(
            {
                key: b[key].to_numpy(),
                "n_words": nw,
                "bits_per_word": np.floor(sums / denom * 1e4 + 0.5) / 1e4,
            }
        )

    return docs.map_batches(score, batch_format="pandas")


#: stupid-backoff penalty, in bits (−log2(0.25)) — fixed, mirrored in SQL
BIGRAM_BACKOFF_BITS = 2.0


def bigram_bits_per_word(
    docs: "ray.data.Dataset",
    *,
    vocab_k: int = 4096,
    bigram_k: int = 4096,
    key: str = "doc_id",
    text: str = "text",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """→ (doc_id, n_words, bits_per_word) under a BIGRAM LM with stupid
    backoff — the CCNet-style perplexity filter signal, one order up from
    :func:`unigram_bits_per_word`.

    Model = the global top-K unigrams AND top-K bigrams by count, fitted in
    ONE narrow shuffle (per-batch (hash, kind, count) partials; per-partition
    top-K per kind).  A word position scores

    * first word of a doc:  unigram bits = log2(N) − log2(c(w) or 1);
    * later, when the bigram AND its prefix unigram are both in-model:
      conditional bits = log2(c(prev)) − log2(c(bigram)) ≥ 0;
    * otherwise: BIGRAM_BACKOFF_BITS + unigram bits (stupid backoff).

    The bigram hash is a pure NUMERIC combine of the two word hashes —
    ``mix64(h_prev XOR mix64(h_cur))`` — so the DuckDB oracle mirrors it
    with the same splitmix64 expression; no string concatenation diverges.

    Partitioning contract (SCALE.md): one hash partition's distinct grams
    fit a worker; the broadcast model is 2K rows; scoring streams."""
    import ray as _ray

    from ..functions.hashing import mix64
    from .dedup import _batch_word_hashes

    P = np.uint64(num_partitions)

    def _doc_grams(texts: list[str]):
        """flat word hashes, per-doc counts, first-position mask, and the
        bigram hash per non-first position (doc-major)."""
        flat, nw = _batch_word_hashes(texts)
        starts = np.cumsum(nw) - nw
        first = np.zeros(len(flat), dtype=bool)
        first[starts[nw > 0]] = True
        cur = ~first
        hb = np.empty(0, dtype=np.uint64)
        if cur.any():
            idx = np.flatnonzero(cur)
            hb = mix64(flat[idx - 1] ^ mix64(flat[idx]))
        return flat, nw, first, hb

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        flat, _nw, _first, hb = _doc_grams(b[text].tolist())
        hu, cu = np.unique(flat, return_counts=True)
        hb_u, cb = np.unique(hb, return_counts=True)
        h = np.concatenate([hu, hb_u])
        kind = np.concatenate(
            [np.zeros(len(hu), dtype=np.int8), np.ones(len(hb_u), dtype=np.int8)]
        )
        c = np.concatenate([cu, cb]).astype(np.int64)
        return pd.DataFrame(
            {"h": h, "kind": kind, "c": c, "__hp": (h % P).astype(np.int64)}
        )

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for kind in (0, 1):
            s = g[g["kind"] == kind]
            if not len(s):
                continue
            s = s.groupby("h", sort=False, as_index=False)["c"].sum()
            total = int(s["c"].sum()) if kind == 0 else 0
            s = s.sort_values(["c", "h"], ascending=[False, True], kind="mergesort")
            top = s.head(vocab_k if kind == 0 else bigram_k).copy()
            top["kind"] = np.int8(kind)
            top["__total"] = np.int64(0)
            out.append(top)
            if kind == 0:
                out.append(
                    pd.DataFrame(
                        {"h": np.array([0], dtype=np.uint64), "c": np.array([0], dtype=np.int64),
                         "kind": np.array([0], dtype=np.int8),
                         "__total": np.array([total], dtype=np.int64)}
                    )
                )
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"h": pd.Series([], dtype="uint64"), "c": pd.Series([], dtype="int64"),
             "kind": pd.Series([], dtype="int8"), "__total": pd.Series([], dtype="int64")}
        )

    cand = (
        docs.map_batches(partials, batch_format="pandas")
        .groupby("__hp")
        .map_groups(reduce_part, batch_format="pandas")
        .to_pandas()  # ≤ (2K + 1) rows per partition — model-scale
    )
    n_total = int(cand["__total"].sum())

    def _top(kind: int, k: int):
        s = cand[(cand["__total"] == 0) & (cand["kind"] == kind)]
        s = s.sort_values(["c", "h"], ascending=[False, True], kind="mergesort").head(k)
        h = s["h"].to_numpy().astype(np.uint64)
        order = np.argsort(h)
        return h[order], s["c"].to_numpy().astype(np.float64)[order]

    vh, vc = _top(0, vocab_k)
    bh, bc = _top(1, bigram_k)
    model_ref = _ray.put((vh, vc, bh, bc, float(n_total)))
    _cache: dict = {}

    def _lookup(keys: np.ndarray, mh: np.ndarray, mc: np.ndarray):
        """→ (found mask, counts or 1.0)."""
        if len(mh) == 0 or len(keys) == 0:
            return np.zeros(len(keys), dtype=bool), np.ones(len(keys))
        pos = np.minimum(np.searchsorted(mh, keys), len(mh) - 1)
        ok = mh[pos] == keys
        return ok, np.where(ok, mc[pos], 1.0)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if "m" not in _cache:
            _cache["m"] = _ray.get(model_ref)
        vh_l, vc_l, bh_l, bc_l, n_l = _cache["m"]
        flat, nw, first, hb = _doc_grams(b[text].tolist())
        _, cu = _lookup(flat, vh_l, vc_l)
        uni_bits = np.log2(max(n_l, 1.0)) - np.log2(cu)
        bits = uni_bits.copy()
        idx = np.flatnonzero(~first)
        if len(idx):
            b_ok, cb = _lookup(hb, bh_l, bc_l)
            p_ok, cp = _lookup(flat[idx - 1], vh_l, vc_l)
            use_bi = b_ok & p_ok
            bits[idx] = np.where(
                use_bi,
                np.log2(cp) - np.log2(cb),
                BIGRAM_BACKOFF_BITS + uni_bits[idx],
            )
        docrep = np.repeat(np.arange(len(b)), nw)
        sums = np.bincount(docrep, weights=bits, minlength=len(b))
        denom = np.maximum(nw, 1)
        return pd.DataFrame(
            {
                key: b[key].to_numpy(),
                "n_words": nw,
                "bits_per_word": np.floor(sums / denom * 1e4 + 0.5) / 1e4,
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def c4_filters_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2), per batch:

    * a LINE is kept iff it ends in terminal punctuation (``.!?"``), has
      ≥ 5 whitespace words, and does not mention "javascript"
      (case-insensitive substring);
    * the PAGE is kept iff it contains no ``{``, no "lorem ipsum"
      (case-insensitive), and retains ≥ 3 lines after the line filter.

    → (doc_id, n_lines, n_kept_lines, clean_text, has_brace, has_lorem,
    c4_keep).  ``clean_text`` is the kept lines re-joined with newlines
    (the rewritten page).  Zero shuffle; explode + C-level string kernels
    (one regex/count pass over the exploded line column).
    """
    text = batch["text"]
    lines = text.str.split("\n")
    n_lines = lines.str.len().fillna(0).astype("int64")
    ex = lines.explode().dropna()
    if len(ex):
        keep = (
            ex.str.contains(r'[.!?"]$', regex=True)
            & (ex.str.count(WORD_RE) >= 5)
            & ~ex.str.lower().str.contains("javascript", regex=False)
        )
        kept = ex[keep]
        n_kept = kept.groupby(level=0).size()
        joined = kept.groupby(level=0).agg("\n".join)
    else:
        n_kept = pd.Series(dtype="int64")
        joined = pd.Series(dtype="object")
    n_kept_lines = pd.Series(0, index=batch.index, dtype="int64")
    n_kept_lines.loc[n_kept.index] = n_kept.astype("int64")
    clean = pd.Series("", index=batch.index, dtype="object")
    clean.loc[joined.index] = joined
    has_brace = text.str.contains("{", regex=False)
    has_lorem = text.str.lower().str.contains("lorem ipsum", regex=False)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_lines": n_lines,
            "n_kept_lines": n_kept_lines,
            "clean_text": clean,
            "has_brace": has_brace,
            "has_lorem": has_lorem,
            "c4_keep": ~has_brace & ~has_lorem & (n_kept_lines >= 3),
        }
    )


#: C0 controls except \t \n \f \r (those are whitespace, handled by WS_RE),
#: plus DEL — mirrored verbatim in the SQL oracle's regexp_replace.
_CONTROL_RE = re.compile(r"[\x00-\x08\x0B\x0E-\x1F\x7F]")


def normalize_text_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Unicode + whitespace normalization — the standard cleanup pass before
    dedup/tokenization: NFC composition (Python unicodedata == DuckDB's
    utf8proc ``nfc_normalize``; pyarrow's ``utf8_normalize`` kernel does NOT
    compose in this build, verified), C0/DEL control-char strip, whitespace
    runs collapsed to one space (the RE2 ``\\s`` class, words.WS_RE), edge
    spaces trimmed.  Zero shuffle, C-level pandas str kernels.

    → (doc_id, norm_text, changed, n_chars)
    """
    text = batch["text"]
    nfc = text.str.normalize("NFC")
    stripped = nfc.str.replace(_CONTROL_RE, "", regex=True)
    collapsed = stripped.str.replace(WS_RE, " ", regex=True)
    trimmed = collapsed.str.strip(" ")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "norm_text": trimmed,
            "changed": trimmed != text,
            "n_chars": trimmed.str.len().astype("int64"),
        }
    )


def word_cooccurrence(
    docs, *, window: int = 3, top_k: int = 20, min_count: int | None = None
) -> pd.DataFrame:
    """Top-k co-occurring unordered word pairs within ±``window`` words,
    with PMI — the classic corpus-analytics collocation signal.

    Combiner-first: each batch factorizes its words ONCE, remaps codes to
    lexicographic rank so the unordered (min,max) canonicalization matches
    SQL ``least/greatest`` on strings, counts integer pair codes with
    ``np.unique`` (C speed), and emits only (word_a, word_b, cnt) partial
    rows — unigram counts ride the same pass as ``word_b=''`` sentinel rows
    (words are never empty by construction).  One (word_a, word_b) groupby
    aggregates; totals and the top-k selection stay DISTRIBUTED (sort +
    limit), so the driver only ever holds top_k rows + 2 scalars + the
    ≤2·top_k unigram counts PMI needs.

    ``min_count`` — the COUNT-CAPPED VOCABULARY scale path (r5; was the
    documented swap point): a first distributed pass counts unigrams and
    keeps only words with total count ≥ ``min_count``; the keep set (the
    capped vocabulary — bounded by construction, the tfidf broadcast
    contract) ships once via ``ray.put`` and the pair pass filters each
    batch's occurrences against it BEFORE pair formation, so the pair
    table is bounded by capped-vocab², not active-vocab².  Window
    semantics stay ORIGINAL-token-stream distances (dropping a rare word
    does not pull its neighbours together): surviving occurrences keep
    their original per-doc positions and pairs match exact distance d via
    one ``searchsorted`` per d on a (doc << 32 | pos) key.  Totals and
    PMI are computed over the capped universe, mirrored in SQL by
    filtering the exploded word table against a HAVING-count vocab CTE.

    Scale contract: the aggregated pair table is bounded by active-vocab²
    (window-bounded, not corpus²); at web vocabulary pass ``min_count``
    (above).  PMI = log2(n·N_w² / (N_pairs·c_a·c_b)), mirrored
    term-for-term in the SQL oracle (same double expression order).
    """
    import pyarrow.compute as _pc
    import ray as _ray
    from ray.data.aggregate import Sum

    keep_ref = None
    if min_count is not None:

        def uni_partials(b: pd.DataFrame) -> pa.Table:
            ex = b["text"].str.findall(WORD_RE).explode().dropna()
            if not len(ex):
                return pa.table(
                    {
                        "word": pa.array([], type=pa.large_string()),
                        "cnt": pa.array([], type=pa.int64()),
                    }
                )
            codes, vocab = pd.factorize(ex.to_numpy(dtype=object))
            return pa.table(
                {
                    "word": pa.array(np.asarray(vocab, dtype=object), type=pa.large_string()),
                    "cnt": pa.array(np.bincount(codes).astype(np.int64)),
                }
            )

        kept = (
            docs.map_batches(uni_partials, batch_format="pandas")
            .groupby("word")
            .aggregate(Sum("cnt", alias_name="n"))
            .map_batches(
                lambda t: t.select(["word"]).filter(
                    _pc.greater_equal(t["n"], min_count)
                ),
                batch_format="pyarrow",
            )
            .to_pandas()  # bounded: the capped vocabulary IS the contract
            .reindex(columns=["word"])  # fully-empty datasets lose schema
        )
        keep_sorted = np.sort(kept["word"].to_numpy(dtype=object))
        if not len(keep_sorted):
            return pd.DataFrame(
                {
                    "word_a": pd.Series([], dtype=object),
                    "word_b": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                    "pmi": pd.Series([], dtype="float64"),
                }
            )
        keep_ref = _ray.put(keep_sorted)

    def _tbl(wa, wb, cnt) -> pa.Table:
        # arrow large_string partials, NOT pandas object dtype: object
        # columns defeat Ray's block-size estimator (r4 bench tail spammed
        # "cannot call 'vectorize' on size 0 inputs" and those shuffle
        # blocks carried no size estimate for memory-based scheduling)
        return pa.table(
            {
                "word_a": pa.array(wa, type=pa.large_string()),
                "word_b": pa.array(wb, type=pa.large_string()),
                "cnt": pa.array(np.asarray(cnt, dtype=np.int64), type=pa.int64()),
            }
        )

    def partials(b: pd.DataFrame) -> pa.Table:
        ex = b["text"].str.findall(WORD_RE).explode().dropna()
        if not len(ex):
            return _tbl([], [], [])
        words = ex.to_numpy(dtype=object)
        doc = ex.index.to_numpy()
        key = None
        if keep_ref is not None:
            # capped path: keep original per-doc positions so window
            # distances are ORIGINAL token-stream distances, then filter
            # occurrences against the broadcast keep set (sorted — one
            # searchsorted membership test, no Python sets)
            import ray as _r

            keep = _r.get(keep_ref)
            change = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
            reps = np.diff(np.r_[change, len(doc)])
            pos = np.arange(len(doc)) - np.repeat(change, reps)
            j = np.searchsorted(keep, words)
            j_c = np.minimum(j, len(keep) - 1)
            m = keep[j_c] == words
            if not m.any():
                return _tbl([], [], [])
            words, doc, pos = words[m], doc[m], pos[m]
            # strictly increasing (batch rows are scanned in order; pos <
            # 2^32 by the docs-fit-a-batch contract) — pairs at exact
            # distance d resolve with one searchsorted per d below
            key = doc.astype(np.int64) * np.int64(1 << 32) + pos.astype(np.int64)
        codes, vocab = pd.factorize(words)
        vocab = np.asarray(vocab, dtype=object)
        v = len(vocab)
        order = np.argsort(vocab)  # lexicographic rank remap
        rank = np.empty(v, dtype=np.int64)
        rank[order] = np.arange(v, dtype=np.int64)
        lex = rank[codes]
        vocab_sorted = vocab[order]
        wa = vocab_sorted
        wb = np.full(v, "", dtype=object)
        cnts = np.bincount(lex, minlength=v).astype(np.int64)
        pair_codes = []
        for d in range(1, window + 1):
            if len(lex) <= d:
                break
            if key is None:  # dense path: array shift == stream distance
                same = doc[d:] == doc[:-d]
                a, bb = lex[:-d][same], lex[d:][same]
            else:  # capped path: exact original distance d via searchsorted
                idx = np.minimum(np.searchsorted(key, key + d), len(key) - 1)
                hit = key[idx] == key + d
                a, bb = lex[hit], lex[idx[hit]]
            pair_codes.append(np.minimum(a, bb) * v + np.maximum(a, bb))
        if pair_codes:
            uniq, cnt = np.unique(np.concatenate(pair_codes), return_counts=True)
            wa = np.concatenate([wa, vocab_sorted[uniq // v]])
            wb = np.concatenate([wb, vocab_sorted[uniq % v]])
            cnts = np.concatenate([cnts, cnt.astype(np.int64)])
        return _tbl(wa, wb, cnts)

    counts = (
        docs.map_batches(partials, batch_format="pandas")
        .groupby(["word_a", "word_b"])
        .aggregate(Sum("cnt", alias_name="n"))
        .materialize()
    )

    def totals(b: pd.DataFrame) -> pd.DataFrame:
        is_pair = b["word_b"] != ""
        return pd.DataFrame(
            {
                "n_pairs": [int(b.loc[is_pair, "n"].sum())],
                "n_words": [int(b.loc[~is_pair, "n"].sum())],
            }
        )

    tot = counts.map_batches(totals, batch_format="pandas").to_pandas().sum()
    n_pairs, n_words = float(tot["n_pairs"]), float(tot["n_words"])

    import pyarrow.compute as pc

    # arrow filters (NOT pandas) for the same block-size-estimator reason
    # as the partials: object-dtype word columns carry no size estimate
    top = (
        counts.map_batches(
            lambda t: t.filter(pc.not_equal(t["word_b"], "")),
            batch_format="pyarrow",
        )
        .sort(["n", "word_a", "word_b"], descending=[True, False, False])
        .limit(top_k)
        .to_pandas()
        # fully-empty datasets lose their schema (NOTES) — reachable when a
        # high min_count leaves no co-occurring pair
        .reindex(columns=["word_a", "word_b", "n"])
    )
    need = sorted(set(top["word_a"]) | set(top["word_b"]))  # ≤ 2·top_k strings
    need_arr = pa.array(need, type=pa.large_string())  # explicit type (NOTES)
    uni = counts.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["word_b"], ""),
                pc.is_in(pc.cast(t["word_a"], pa.large_string()), value_set=need_arr),
            )
        ),
        batch_format="pyarrow",
    ).to_pandas().reindex(columns=["word_a", "word_b", "n"])
    c = dict(zip(uni["word_a"], uni["n"].astype(float)))
    ca = np.array([c[w] for w in top["word_a"]])
    cb = np.array([c[w] for w in top["word_b"]])
    n = top["n"].to_numpy(dtype=np.float64)
    pmi = np.log2((n * n_words * n_words) / (n_pairs * ca * cb))
    out = top.reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["pmi"] = round6(pmi)
    return out


def blocklist_filter(docs, phrases: tuple[str, ...], *, text_col: str = "text"):
    """→ (doc_id, n_hits, n_phrases, blocked): case-insensitive substring
    match against a broadcast blocklist — the standard banned-phrase /
    contamination-list filter.

    One C-level ``str.count`` kernel per phrase per batch (non-overlapping
    counts, == the SQL replace-arithmetic mirror); the phrase list is
    closure-shipped (KB-scale contract — at a 10⁶-pattern blocklist switch
    to one combined alternation regex or an Aho-Corasick actor pool, same
    output contract).  Zero shuffle.
    """
    pats = [re.compile(re.escape(p.lower())) for p in phrases]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].str.lower()
        n_hits = np.zeros(len(batch), dtype=np.int64)
        n_phr = np.zeros(len(batch), dtype=np.int64)
        for p in pats:
            c = low.str.count(p).to_numpy(dtype=np.int64)
            n_hits += c
            n_phr += (c > 0).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_hits": n_hits,
                "n_phrases": n_phr,
                "blocked": n_phr > 0,
            }
        )

    return docs.map_batches(f, batch_format="pandas")


# odd 64-bit multiplier (splitmix64 round constant — public domain) and its
# modular inverse mod 2^64; odd ⇒ invertible, so window hashes normalize by
# multiplying with ip^start instead of dividing
_RK_P = np.uint64(0x9E3779B97F4A7C15)
_RK_IP = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


class MultiPatternBlocklistStage:
    """Actor-pool banned-phrase scanner whose per-batch cost is (near)
    INDEPENDENT of the pattern count — the 10⁴–10⁶-pattern blocklist path
    (r4 verdict item 8; :func:`blocklist_filter`'s per-phrase ``str.count``
    is O(n_phrases · text) and the documented swap point).

    Same output contract as :func:`blocklist_filter` — (doc_id, n_hits,
    n_phrases, blocked) with per-phrase NON-overlapping leftmost-greedy
    counts — pinned equal by pytest at 10⁴ patterns.

    Design note: the classic structure here is Aho-Corasick, but a
    pure-Python automaton walk is a per-CHARACTER interpreter loop — the
    exact hot-path shape this repo bans (CLAUDE.md); with no C automaton
    lib in the container, the vectorized-exact equivalent is a banked
    Rabin-Karp multi-set: phrases bank by byte length, each batch computes
    ONE wrapping-uint64 rolling-hash prefix (two cumprods + a cumsum over
    the concatenated lowercased UTF-8 buffer), and each length bank is one
    vectorized window-hash subtract/multiply + ``np.isin`` against the
    bank's sorted hash set.  Candidates (match-scale, sparse by contract)
    are byte-verified exactly, so hash collisions cannot create false
    positives.  Cost: O(total_bytes · n_distinct_lengths + matches), vs
    O(total_bytes · n_phrases) for the scalar path.

    Phrase state ships via ``ray.put`` ONCE and each actor builds its
    banks in ``__init__``; batches only pay the scan.  Zero shuffle.
    """

    def __init__(self, phrases_ref, text_col: str = "text"):
        import ray as _ray

        phrases = (
            _ray.get(phrases_ref)
            if isinstance(phrases_ref, _ray.ObjectRef)
            else phrases_ref
        )
        self.text_col = text_col
        banks: dict[int, list[tuple[int, bytes]]] = {}
        self.pid_bytes: dict[int, bytes] = {}
        for pid, p in enumerate(phrases):
            b = p.lower().encode("utf-8")
            if b:
                banks.setdefault(len(b), []).append((pid, b))
                self.pid_bytes[pid] = b
        self.banks = {}
        max_l = max(banks, default=0)
        pw = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(max(max_l, 1), _RK_P, dtype=np.uint64)))
        )  # p^0..p^max_l
        for length, entries in banks.items():
            hashes = np.empty(len(entries), dtype=np.uint64)
            for i, (_pid, b) in enumerate(entries):
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                hashes[i] = (arr * pw[:length]).sum(dtype=np.uint64)
            order = np.argsort(hashes)
            self.banks[length] = (
                hashes[order],
                [entries[i] for i in order],  # (pid, bytes) aligned with hashes
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_docs = len(batch)
        n_hits = np.zeros(n_docs, dtype=np.int64)
        n_phr = np.zeros(n_docs, dtype=np.int64)
        if n_docs and self.banks:
            bs = [t.lower().encode("utf-8") for t in batch[self.text_col]]
            lens = np.array([len(b) for b in bs], dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)))
            buf = np.frombuffer(b"".join(bs), dtype=np.uint8)
            n = len(buf)
            if n:
                # rolling-hash prefixes over the whole batch buffer: three
                # C passes (2 cumprod + 1 cumsum), reused by every bank
                pw = np.concatenate(
                    (
                        [np.uint64(1)],
                        np.cumprod(np.full(n - 1, _RK_P, dtype=np.uint64)),
                    )
                )  # p^i at position i
                ipw = np.concatenate(
                    (
                        [np.uint64(1)],
                        np.cumprod(np.full(n - 1, _RK_IP, dtype=np.uint64)),
                    )
                )  # ip^i
                s0 = np.concatenate(
                    ([np.uint64(0)], np.cumsum(buf.astype(np.uint64) * pw))
                )
                per_doc_phrase: dict[tuple[int, int], list[int]] = {}
                for length, (hashes, entries) in self.banks.items():
                    if n < length:
                        continue
                    w = (s0[length:] - s0[:-length]) * ipw[: n - length + 1]
                    cand = np.flatnonzero(np.isin(w, hashes))
                    if not len(cand):
                        continue
                    # candidates are match-scale: verify bytes + doc bounds
                    docs_of = np.searchsorted(starts, cand, side="right") - 1
                    in_doc = cand + length <= starts[docs_of + 1]
                    for pos, di in zip(cand[in_doc], docs_of[in_doc]):
                        window = buf[pos : pos + length].tobytes()
                        j = int(np.searchsorted(hashes, w[pos]))
                        while j < len(hashes) and hashes[j] == w[pos]:
                            pid, pb = entries[j]
                            if pb == window:
                                per_doc_phrase.setdefault(
                                    (int(di), pid), []
                                ).append(int(pos))
                            j += 1
                for (di, pid), poss in per_doc_phrase.items():
                    length = len(self.pid_bytes[pid])
                    cnt, prev_end = 0, -1
                    for pos in poss:  # ascending (flatnonzero order per bank)
                        if pos >= prev_end:
                            cnt += 1
                            prev_end = pos + length
                    n_hits[di] += cnt
                    n_phr[di] += 1
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_hits": n_hits,
                "n_phrases": n_phr,
                "blocked": n_phr > 0,
            }
        )


def blocklist_filter_multipattern(
    docs, phrases: tuple[str, ...], *, text_col: str = "text", concurrency=None
):
    """:class:`MultiPatternBlocklistStage` over an actor pool — the
    large-blocklist engine with :func:`blocklist_filter`'s exact output
    contract (pinned by pytest at 10⁴ patterns).  The phrase list ships
    through the object store ONCE; each actor builds its hash banks in
    ``__init__``."""
    import ray as _ray

    from ..functions.resources import actor_pool

    ref = _ray.put(tuple(phrases))
    if concurrency is None:
        concurrency = actor_pool()
    return docs.map_batches(
        MultiPatternBlocklistStage,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_kwargs={"phrases_ref": ref, "text_col": text_col},
    )


# ===========================================================================
# DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169)
# ===========================================================================

DSIR_SALT = 0xD512_0A17
DSIR_BUCKETS = 4096


def _hash_word_array(words: np.ndarray, salt: int) -> np.ndarray:
    """uint64 chunk-fold splitmix64 of an object array of strings —
    zero-copy over the Arrow buffers (the ``sample._str_key_hash`` shape);
    SQL mirror: ``hashing.sql_hash_expr(word, salt)``."""
    from ..functions.hashing import hash_bytes_u64
    from .encode_stage import _binary_offsets, _binary_values

    col = pa.array(words, type=pa.large_string())
    buf = np.frombuffer(_binary_values(col), dtype=np.uint8)
    offs = _binary_offsets(col)
    return hash_bytes_u64(
        buf, offs[:-1].astype(np.int64), np.diff(offs).astype(np.int64), salt=salt
    )


def _ln_micro(x) -> np.ndarray:
    """``round(ln(x) · 1e6)`` half-away as int64 for x ≥ 1 — the
    ``idf_micro`` house pattern, mirrored in SQL as
    ``floor(ln(x)*1e6 + 0.5)::BIGINT``."""
    v = np.log(np.asarray(x, dtype=np.float64)) * 1e6
    return np.floor(v + 0.5).astype(np.int64)


def _dsir_tokens(b: pd.DataFrame, text_col: str, buckets: int, salt: int):
    """Per-batch (row-major) hashed-feature stream: returns (n_tokens per
    row, bucket id per token).  findall preserves document order, so the
    exploded token stream is row-major and per-doc reductions are exact
    int64 prefix-sum slices."""
    lists = b[text_col].str.findall(WORD_RE)
    n = lists.str.len().fillna(0).to_numpy(np.int64)
    toks = lists.explode().dropna()
    if len(toks):
        codes, uniq = pd.factorize(toks.to_numpy())  # C-level, hash each word once
        bucket = (_hash_word_array(uniq, salt) % np.uint64(buckets)).astype(np.int64)[codes]
    else:
        bucket = np.array([], dtype=np.int64)
    return n, bucket


def dsir_bucket_counts(
    docs,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    salt: int = DSIR_SALT,
):
    """ONE corpus scan emitting hashed-feature counts for BOTH the raw and
    the target (``target_col == target_value``) corpus: per-batch bincount
    partials (≤ ``buckets`` rows per batch — the combiner), one groupby
    over bucket ids.  The result is ≤ ``buckets`` rows — broadcastable by
    construction at any corpus size (that bound is the whole point of
    DSIR's hashed features)."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        n, bucket = _dsir_tokens(b, text_col, buckets, salt)
        is_tgt = np.repeat((b[target_col] == target_value).to_numpy(), n)
        cr = np.bincount(bucket, minlength=buckets)
        ct = np.bincount(bucket[is_tgt], minlength=buckets)
        nz = np.flatnonzero(cr)
        return pd.DataFrame(
            {"bucket": nz, "cr": cr[nz].astype(np.int64), "ct": ct[nz].astype(np.int64)}
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("cr", alias_name="cr"), Sum("ct", alias_name="ct"))
    )


def dsir_weights(
    docs,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    salt: int = DSIR_SALT,
):
    """DSIR importance weights (Xie et al. 2023): hashed-unigram bag-of-words
    LMs for the target and raw corpus; per-doc log importance weight

        w(doc) = Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)]

    with add-one smoothing, kept EXACT-INTEGER in micro-log units
    (``_ln_micro``) so the DuckDB oracle pins every value:

        lam[b]  = ln_micro(ct[b]+1) − ln_micro(cr[b]+1)
        k_micro = ln_micro(Cr+B)    − ln_micro(Ct+B)
        w_micro = Σ lam[bucket(tok)] + n_tokens · k_micro

    SCALE: pass 1 is :func:`dsir_bucket_counts` (combiner partials, one
    ``buckets``-row groupby); the ``lam`` table is B int64s broadcast ONCE
    via ``ray.put``; pass 2 streams — zero shuffle, nothing corpus-scale
    ever leaves the workers.  Returns (id, n_tokens, dsir_weight_micro)."""
    import ray as _ray

    counts = dsir_bucket_counts(
        docs,
        target_col=target_col,
        target_value=target_value,
        text_col=text_col,
        buckets=buckets,
        salt=salt,
    ).to_pandas()  # ≤ buckets rows — bounded by construction
    cr = np.zeros(buckets, dtype=np.int64)
    ct = np.zeros(buckets, dtype=np.int64)
    cr[counts["bucket"].to_numpy()] = counts["cr"].to_numpy(np.int64)
    ct[counts["bucket"].to_numpy()] = counts["ct"].to_numpy(np.int64)
    lam = _ln_micro(ct + 1) - _ln_micro(cr + 1)
    k_micro = int(_ln_micro(cr.sum() + buckets)[()] - _ln_micro(ct.sum() + buckets)[()])
    lam_ref = _ray.put(lam)

    class Score:
        def __init__(self):
            self.lam = _ray.get(lam_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            n, bucket = _dsir_tokens(b, text_col, buckets, salt)
            vals = self.lam[bucket]
            c = np.concatenate([[0], np.cumsum(vals)])
            ends = np.cumsum(n)
            starts = ends - n
            s = c[ends] - c[starts]  # exact int64 per-doc prefix-sum slice
            return pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "n_tokens": n,
                    "dsir_weight_micro": s + n * k_micro,
                }
            )

    from ..functions.resources import actor_pool

    return docs.map_batches(Score, batch_format="pandas", concurrency=actor_pool())


def dsir_select(
    docs,
    n: int,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    salt: int = DSIR_SALT,
) -> pd.DataFrame:
    """Temperature-0 DSIR selection: global top-``n`` docs by importance
    weight (ties break ascending on the id).  Per-batch head-``n`` partials
    bound the driver merge at n·blocks rows (the ``sum_topk`` contract).
    The paper's Gumbel-top-k resampling variant is the same kernel with
    mix64-derived noise added to ``dsir_weight_micro`` — a one-line swap
    kept out so the gate stays integer-exact."""
    w = dsir_weights(
        docs,
        target_col=target_col,
        target_value=target_value,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        salt=salt,
    )

    def head(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["dsir_weight_micro", id_col], ascending=[False, True]
        ).head(n)

    cand = w.map_batches(head, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["dsir_weight_micro", id_col], ascending=[False, True])
        .head(n)
        .reset_index(drop=True)
    )


def word_entropy(docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy of the word distribution in EXACT
    integer micro-nats — a repetition/quality signal (low entropy = boilerplate
    or degenerate repetition; complements ``doc_repetition``'s n-gram view):

        H_micro = (n · ln_micro(n) − Σ_w c_w · ln_micro(c_w)) // n

    (``ln_micro`` = the idf_micro house rounding, integer division — both
    sides compute identical int64s).  Zero-shuffle stateless batch map: the
    per-(row, word) counts factorize inside the batch; nothing leaves the
    stage but one row per document."""

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        lists = b[text_col].str.findall(WORD_RE)
        n = lists.str.len().fillna(0).to_numpy(np.int64)
        toks = lists.explode().dropna()
        sums = np.zeros(len(b), dtype=np.int64)
        if len(toks):
            rid = toks.index.to_numpy(np.int64)
            codes, uniq = pd.factorize(toks.to_numpy())
            comp = rid * np.int64(len(uniq)) + codes
            cu, cc = np.unique(comp, return_counts=True)
            contrib = cc.astype(np.int64) * _ln_micro(cc)
            # bincount's float64 accumulation is exact here: per-doc sums
            # are bounded by n_tokens · ln_micro(n_tokens) ≪ 2^53
            sums = np.bincount(
                (cu // np.int64(len(uniq))).astype(np.int64),
                weights=contrib.astype(np.float64),
                minlength=len(b),
            ).astype(np.int64)
        safe_n = np.maximum(n, 1)
        ent = np.where(n > 0, (n * _ln_micro(safe_n) - sums) // safe_n, 0)
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "n_words": n,
                "entropy_micro": ent.astype(np.int64),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def vocab_zipf(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    log_unit: int = 1000,
    run_chunk: int = 1 << 20,
) -> pd.DataFrame:
    """Zipf rank–frequency OLS fit over the corpus vocabulary in EXACT
    integer arithmetic: slope of y = ln(count) on x = ln(rank), both in
    milli-log units (``floor(ln·1e3 + 0.5)``), summed as int64 and divided
    ONCE with C-truncation semantics — bit-identical to the SQL mirror.

    The trick that keeps it distributed WITHOUT a global rank shuffle:
    ranks are only needed inside Σ-terms, and words tied on count occupy a
    CONTIGUOUS rank interval whose Σ ln(r) is order-independent.  So:

    1. word counts: one corpus scan with a per-batch factorize/bincount
       combiner → groupby(word) sum (the only vocabulary-scale shuffle);
    2. count histogram (count value → #words): vocabulary scan reduced to
       DISTINCT-COUNT scale (O(√total_tokens) rows by Zipf itself — the
       bounded driver contract);
    3. the driver prefix-sums the histogram into rank intervals, splits
       long intervals into ≤ ``run_chunk`` chunks, and ships the chunk
       table back as a Dataset;
    4. per-chunk Σ ln_milli(r), Σ ln_milli(r)² run vectorized and
       distributed (total work O(vocab), spread over tasks);
    5. five int64 aggregates reach the driver; the final slope is one
       arbitrary-precision integer division.

    int64 bound: Σx² ≤ vocab · ln_milli(vocab)² — safe to ~10^10 words.
    Returns a ONE-ROW DataFrame (n_vocab, sx, sy, sxx, sxy, slope_micro)."""
    import ray.data
    from ray.data.aggregate import Sum

    unit = float(log_unit)

    def _ln_u(x) -> np.ndarray:
        v = np.log(np.asarray(x, dtype=np.float64)) * unit
        return np.floor(v + 0.5).astype(np.int64)

    def wc_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.findall(WORD_RE).explode().dropna()
        if not len(toks):
            return pd.DataFrame(
                {"word": pd.Series(dtype="object"), "c": pd.Series(dtype="int64")}
            )
        codes, uniq = pd.factorize(toks.to_numpy())
        return pd.DataFrame(
            {"word": uniq, "c": np.bincount(codes).astype(np.int64)}
        )

    wc = (
        docs.map_batches(wc_partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
    )

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        cu, cm = np.unique(b["c"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"c": cu, "m": cm.astype(np.int64)})

    hist = (
        wc.map_batches(hist_partial, batch_format="pandas")
        .groupby("c")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()  # distinct-count scale — the bounded contract above
        .sort_values("c", ascending=False)
    )
    cs = hist["c"].to_numpy(np.int64)
    ms = hist["m"].to_numpy(np.int64)
    starts = np.cumsum(ms) - ms  # exclusive rank prefix per count value
    ys = _ln_u(cs)
    rows = []
    for s0, m0, y0 in zip(starts, ms, ys):
        s, left = int(s0), int(m0)
        while left > 0:
            take = min(left, run_chunk)
            rows.append((s, take, int(y0)))
            s += take
            left -= take
    runs = pd.DataFrame(rows, columns=["start", "cnt", "y"]).astype("int64")

    def run_sums(b: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros((len(b), 5), dtype=np.int64)  # n, sx, sy, sxx, sxy
        for i, (s, cnt, y) in enumerate(
            zip(b["start"].to_numpy(), b["cnt"].to_numpy(), b["y"].to_numpy())
        ):
            x = _ln_u(np.arange(s + 1, s + cnt + 1, dtype=np.int64))
            sx = int(x.sum())
            out[i] = (cnt, sx, y * cnt, int((x * x).sum()), y * sx)
        return pd.DataFrame(
            {"n": out[:, 0], "sx": out[:, 1], "sy": out[:, 2], "sxx": out[:, 3], "sxy": out[:, 4]}
        )

    parts = (
        ray.data.from_pandas(runs)
        .map_batches(run_sums, batch_format="pandas")
        .to_pandas()  # one row per chunk — run-table scale
    )
    n, sx, sy, sxx, sxy = (int(parts[k].sum()) for k in ("n", "sx", "sy", "sxx", "sxy"))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    # C-truncating division (DuckDB's `//` on negatives), exact Python ints
    slope_micro = 0 if den == 0 else (abs(num * 1_000_000) // den) * (1 if num >= 0 else -1)
    return pd.DataFrame(
        {
            "n_vocab": [n],
            "sx": [sx],
            "sy": [sy],
            "sxx": [sxx],
            "sxy": [sxy],
            "slope_micro": [slope_micro],
        }
    ).astype("int64")
