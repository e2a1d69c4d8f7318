"""Trigram-accelerated regex search: planner soundness, indexed path vs a
pure-Python oracle, distributed-scan fallback, and cross-path agreement."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from searty_ray.functions.regexplan import group_neutral, literal_alternatives
from searty_ray.query import IndexReader, RegexSearcher
from searty_ray.stages.regexscan import regex_scan

PLANNER_CASES = [
    (r"merge (part|line) window", [["merge ", "part", " window"], ["merge ", "line", " window"]]),
    (r"doc-[0-9]+ \(x\)", [["doc-", " (x)"]]),
    (r"b[ai]g", None),  # runs "b"/"g" < 3 runes
    (r"(foo|barbaz)qux", [["foo", "qux"], ["barbaz", "qux"]]),
    (r"^hello world$", [["hello world"]]),
    (r"a{0,3}xyz", [["xyz"]]),
    (r"(?i)merge part", None),  # index is case-sensitive
    (r"(?:big|small) (?:batch)+", [["big", "batch"], ["small", "batch"]]),
    (r"x*", None),
    (r"defun|x", None),  # an alternative with no literal kills the plan
    (r"(defpackage)+", [["defpackage"]]),
    (r"\bloop\b", [["loop"]]),
]


@pytest.mark.parametrize("pattern,expected", PLANNER_CASES)
def test_planner_cases(pattern, expected):
    assert literal_alternatives(pattern) == expected


# every pattern used anywhere in this file — the soundness sweep below
# checks the planner's claim against the real regex engine on real bodies
SOUND_PATTERNS = [c[0] for c in PLANNER_CASES] + [
    r"sort [a-z]+ scan",
    r"(car|cdr) ?(car|cdr)",
    r"\(defun [a-z-]+",
    r"loop (for|while)",
    r"set[fq] ",
    r"co(n[sd]|nd)",
]


def test_planner_soundness_on_corpus(fixture_corpus):
    """If a body matches the pattern, it must contain ALL literals of at
    least one planner alternative — the invariant that makes trigram
    pruning lossless."""
    corpus_t, _ = fixture_corpus
    bodies = corpus_t["content"].to_pylist()
    checked = 0
    for pat in SOUND_PATTERNS:
        alts = literal_alternatives(pat)
        if alts is None:
            continue
        rx = re.compile(pat)
        for body in bodies:
            if rx.search(body):
                assert any(all(lit in body for lit in alt) for alt in alts), (pat, body[:80])
                checked += 1
    assert checked > 0, "sweep never exercised a matching body"


def test_group_neutral_preserves_matches():
    texts = ["merge part window", "ab [(] cd", r"x \( y", "foo(bar)baz"]
    pats = [r"merge (part|line)", r"\[\(\]", r"\\\(", r"(foo|qux)\(bar\)"]
    for p in pats:
        gn = group_neutral(p)
        for t in texts:
            assert bool(re.search(p, t)) == bool(re.search(gn, t)), (p, gn, t)


def _brute(bodies: dict[int, str], fnames: dict[int, str], pattern: str):
    rx = re.compile(pattern)
    rows = []
    for doc_id in sorted(bodies):
        ms = list(rx.finditer(bodies[doc_id]))
        if ms:
            rows.append(
                {
                    "doc_id": doc_id,
                    "filename": fnames[doc_id],
                    "n_matches": len(ms),
                    "first_match": ms[0].group(0),
                }
            )
    return rows


@pytest.fixture(scope="module")
def corpus_bodies(fixture_index):
    index_dir, _ = fixture_index
    t = pq.read_table(os.path.join(index_dir, "documents"), columns=["doc_id", "content", "filename"])
    ids = t["doc_id"].to_pylist()
    return dict(zip(ids, t["content"].to_pylist())), dict(zip(ids, t["filename"].to_pylist()))


INDEXED_PATTERNS = [
    r"\(defun doc-[0-9]+",
    r"(car|cdr) (loop|cons)",
    r"lambda \(",
    r"zzz-never-present-literal",
]


@pytest.mark.parametrize("pattern", INDEXED_PATTERNS)
def test_indexed_regex_matches_brute_force(fixture_index, corpus_bodies, pattern):
    index_dir, _ = fixture_index
    bodies, fnames = corpus_bodies
    assert literal_alternatives(pattern) is not None, "pattern must exercise the indexed path"
    got = RegexSearcher(IndexReader(index_dir)).search(pattern).to_pylist()
    assert got == _brute(bodies, fnames, pattern)


def test_unprunable_pattern_raises(fixture_index):
    index_dir, _ = fixture_index
    with pytest.raises(ValueError):
        RegexSearcher(IndexReader(index_dir)).search(r"b[ai]g")


def test_scan_fallback_matches_brute_force(fixture_index, corpus_bodies):
    index_dir, _ = fixture_index
    bodies, fnames = corpus_bodies
    pattern = r"c[ao][nr]s?"  # unprunable on purpose
    assert literal_alternatives(pattern) is None
    docs = ray.data.read_parquet(
        os.path.join(index_dir, "documents"), columns=["doc_id", "content", "filename"]
    )
    got = (
        regex_scan(docs, pattern, text_col="content", filename_col="filename")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .to_dict("records")
    )
    assert got == _brute(bodies, fnames, pattern)


def test_indexed_and_scan_paths_agree(fixture_index):
    """The two plans are implementations of ONE operator: same answer."""
    index_dir, _ = fixture_index
    pattern = r"loop (for|while|repeat)"
    idx = (
        RegexSearcher(IndexReader(index_dir))
        .search(pattern)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = ray.data.read_parquet(
        os.path.join(index_dir, "documents"), columns=["doc_id", "content", "filename"]
    )
    scan = (
        regex_scan(docs, pattern, text_col="content", filename_col="filename")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert idx.to_dict("records") == scan.to_dict("records")
