"""Text normalization (textstats.normalize_text_batch) vs the DuckDB mirror
on crafted edge cases: NFC composition (decomposed é), control chars, every
RE2 whitespace-class member, edge trimming, and the unchanged fast path."""

import duckdb
import pandas as pd

from searty_ray.pipelines.gate import SQL_NORMALIZE_TEXT
from searty_ray.stages import textstats

DOCS = [
    "plain ascii text",  # unchanged
    "e\u0301clair",  # decomposed é → NFC composes (length shrinks)
    "a\x00b\x01c\x7fd",  # C0 + DEL controls stripped
    "a\tb\nc\fd\re",  # every WS-class member collapses to one space
    "  leading and trailing  ",  # trim
    "multi   space\t\truns",  # run collapse
    "",  # empty
    "\x0bvertical tab survives",  # \x0B is stripped as control, NOT ws
    "ends with control\x08",
    "\u00e9 already composed",  # NFC idempotent
]


def test_normalize_text_matches_duckdb():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    got = textstats.normalize_text_batch(df).reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(SQL_NORMALIZE_TEXT).df()
    con.close()

    got["changed"] = got["changed"].astype(bool)
    want["changed"] = want["changed"].astype(bool)
    pd.testing.assert_frame_equal(got[want.columns], want)

    assert not got.loc[0, "changed"]
    assert got.loc[1, "norm_text"] == "\u00e9clair" and got.loc[1, "n_chars"] == 6
    assert got.loc[2, "norm_text"] == "abcd"
    assert got.loc[3, "norm_text"] == "a b c d e"
    assert got.loc[4, "norm_text"] == "leading and trailing"
    assert got.loc[5, "norm_text"] == "multi space runs"
    assert got.loc[6, "norm_text"] == "" and not got.loc[6, "changed"]
    assert got.loc[7, "norm_text"] == "vertical tab survives"
    assert got.loc[8, "norm_text"] == "ends with control"
    assert not got.loc[9, "changed"]
