"""Trigram-index regex planning — required-literal analysis.

The classic use of a trigram index (the reference's index shape,
/root/reference/lib/tokenizer/tokenizer.go:9-33) is index-accelerated
regex search: analyze the pattern into literal substrings every match
MUST contain, AND their trigram posting lists to get a candidate doc
set, and run the real regex engine only over the candidates (Cox,
"Regular Expression Matching with a Trigram Index", 2012 — public,
swtch.com/~rsc/regexp/regexp4.html; same idea as PostgreSQL pg_trgm).

This is the simplified sound subset of the Cox analysis: we extract
an OR-of-ANDs of *required* literal runs —

    ``literal_alternatives(p) = [[lit, ...], ...]``

means "every string matching ``p`` contains ALL literals of at least
ONE inner list".  ``None`` means the pattern has an alternative with
no literal ≥ 3 runes, so the index cannot prune and the caller must
fall back to a full distributed scan.

Soundness invariant (property-tested in tests/test_regex.py): we only
ever *under*-claim.  Constructs we don't model (classes, repeats with
min 0, anchors, lookarounds, backrefs) flush the current literal run
and contribute nothing — that loses pruning power, never candidates.
Unlike full Cox we don't track prefix/suffix cross products, so
``abc+d`` yields runs {"abc"} (the ``c+``/``d`` adjacency is dropped),
and a nested group boundary splits runs.
"""

from __future__ import annotations

import re

try:  # Python 3.11+: the sre parser lives at re._parser
    from re import _parser as _sre
except ImportError:  # pragma: no cover - older layout
    import sre_parse as _sre  # type: ignore[no-redef]

# OR-of-AND size guard: a branch cross product larger than this stops
# pruning (falls back to scan) instead of exploding the plan
MAX_ALTERNATIVES = 16
MIN_LITERAL_RUNES = 3  # shorter runs carry no full trigram


def _cross(alts_a: list[list[str]], alts_b: list[list[str]]) -> list[list[str]] | None:
    out = []
    for a in alts_a:
        for b in alts_b:
            out.append(a + b)
            if len(out) > MAX_ALTERNATIVES:
                return None
    return out


class _NoPlan(Exception):
    """Raised when any alternative degenerates to 'no constraint'."""


def _walk(seq) -> list[list[str]]:
    """Required-literal alternatives of one parsed concatenation.

    Returns OR-of-AND literal lists (runs of ANY length; the ≥3 filter
    happens at the end so ``ab(c|d)`` doesn't spuriously pass).  Raises
    _NoPlan when a sub-branch explodes or a construct is unknown.
    """
    alts: list[list[str]] = [[]]
    run: list[str] = []

    def flush() -> None:
        nonlocal run
        if run:
            lit = "".join(run)
            for a in alts:
                a.append(lit)
            run = []

    def merge(sub_alts: list[list[str]]) -> None:
        nonlocal alts
        crossed = _cross(alts, sub_alts)
        if crossed is None:
            raise _NoPlan
        alts = crossed

    for op, av in seq:
        name = str(op)
        if name == "LITERAL":
            run.append(chr(av))
        elif name == "SUBPATTERN":
            # (group, add_flags, del_flags, subpattern)
            _g, add_flags, _d, sub = av
            flush()
            if add_flags & re.IGNORECASE:
                raise _NoPlan
            merge(_walk(list(sub)))
        elif name == "BRANCH":
            _unused, branches = av
            flush()
            branch_alts: list[list[str]] = []
            for b in branches:
                branch_alts.extend(_walk(list(b)))
                if len(branch_alts) > MAX_ALTERNATIVES:
                    raise _NoPlan
            merge(branch_alts)
        elif name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
            lo, _hi, sub = av
            flush()
            if lo >= 1:
                # the body matches at least once ⇒ its requirements hold
                merge(_walk(list(sub)))
            # lo == 0: optional — contributes nothing
        elif name in ("ANY", "IN", "NOT_LITERAL", "CATEGORY", "RANGE"):
            flush()
        elif name == "AT":
            flush()  # anchors consume nothing
        elif name in ("ASSERT", "ASSERT_NOT"):
            flush()  # lookarounds: skip (sound — adds no requirement)
        elif name in ("GROUPREF", "GROUPREF_EXISTS"):
            flush()  # backref content unknown
        elif name == "ATOMIC_GROUP":
            flush()
            merge(_walk(list(av)))
        else:
            raise _NoPlan  # unknown construct — refuse rather than misprune
    flush()
    return alts


def literal_alternatives(pattern: str, flags: int = 0) -> list[list[str]] | None:
    """OR-of-AND required literals of ``pattern``, or None if unprunable.

    Every returned literal has ≥ 3 runes (a full trigram); an alternative
    left with no such literal makes the whole plan None — the index holds
    no constraint that covers every match.
    """
    if flags & re.IGNORECASE:
        return None  # the index is case-sensitive (no normalization)
    try:
        parsed = _sre.parse(pattern, flags)
    except re.error:
        return None
    if parsed.state.flags & re.IGNORECASE:
        return None  # inline (?i) — same case-sensitivity bar as the flag
    try:
        alts = _walk(list(parsed))
    except (_NoPlan, RecursionError):
        return None
    pruned = [[lit for lit in a if len(lit) >= MIN_LITERAL_RUNES] for a in alts]
    if any(not a for a in pruned):
        return None
    return pruned


def group_neutral(pattern: str) -> str:
    """Rewrite capturing groups ``(...)`` to non-capturing ``(?:...)`` so the
    pattern can nest inside a single named group for
    ``pyarrow.compute.extract_regex`` (RE2 requires all groups named).
    Backreferences would be broken by the rewrite — but RE2 (the engine on
    both the engine side and the DuckDB oracle side) has none anyway."""
    out: list[str] = []
    i, in_class = 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
        elif ch == "[":
            in_class = True
            out.append(ch)
        elif ch == "(" and not pattern.startswith("(?", i):
            out.append("(?:")
        else:
            out.append(ch)
        i += 1
    return "".join(out)
