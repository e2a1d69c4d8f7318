"""ASCII-whitespace word segmentation + half-away rounding, shared by the
text ops so Python kernels and the DuckDB oracles agree bit-for-bit.

* RE2 (DuckDB's regex engine) defines ``\\s`` as exactly ``[\\t\\n\\f\\r ]``
  — no ``\\v``, no Unicode.  ``str.split()``'s Unicode whitespace silently
  diverges on NBSP / ideographic spaces, so every split/count kernel uses
  this class instead.
* DuckDB ``round(x, 6)`` rounds halves AWAY from zero; ``np.round`` rounds
  half-EVEN, so exact ties like 1/128 differ in the last digit.
  :func:`round6` matches SQL for the non-negative values these ops produce.
"""

from __future__ import annotations

import re

import numpy as np

WS_CLASS = r"[\t\n\f\r ]"
WS_RE = re.compile(WS_CLASS + "+")
WORD_RE = re.compile(r"[^\t\n\f\r ]+")


def ascii_words(t: str) -> list[str]:
    """The ``list_filter(string_split_regex(t, '\\s+'), x -> x <> '')`` words."""
    return WORD_RE.findall(t)


def round6(v) -> np.ndarray:
    """Half-away-from-zero rounding to 6 decimals for non-negative values
    (== DuckDB ``round(x, 6)``)."""
    return np.floor(np.asarray(v, dtype=np.float64) * 1e6 + 0.5) / 1e6
