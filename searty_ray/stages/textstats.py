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
