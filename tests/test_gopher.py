"""Gopher rule filter (textstats.gopher_rules_batch) vs the DuckDB mirror on
crafted edge cases the synthetic documents table never produces: bullet and
ellipsis lines, # / … symbols, stopword-rich prose, boundary word counts."""

import duckdb
import pandas as pd

from searty_ray.pipelines.gate import SQL_GOPHER_RULES
from searty_ray.stages import textstats

GOOD = (
    "the quick fox and the lazy dog be friends that have fun with words . "
    + "every day they run to the river of dreams and that is fine with all "
) * 3  # 50+ words, ≥2 stopwords, alpha-rich

DOCS = [
    GOOD,  # passes every rule
    "short text only",  # fails n_words >= 50
    "the of " + "1234 5678 " * 40,  # alpha fraction < 0.8
    GOOD + "\n- bullet one\n- bullet two\n- bullet three",  # bullets, still <= 0.9
    "- a\n- b\n- c\n* d\n• e",  # bullet fraction 1.0 > 0.9
    GOOD + "\ntrailing thought...\nand another…",  # ellipsis lines
    "wait...\nmore...\nyes...",  # ellipsis fraction 1.0 > 0.3
    GOOD + " ### ## # " * 10,  # symbol ratio > 0.1
    ("verylongwordthatkeepsgoingandgoing " * 60),  # mean word len > 10
    ("a b c d " * 20) + "the of",  # mean word len < 3
    "",  # empty doc: every count 0
    "the be to of and that have with " * 8,  # all 8 stopwords
    GOOD + "\n...\n…\nmid...dle not a line end",  # bare-ellipsis lines + mid-word dots
]


def test_gopher_rules_match_duckdb():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    got = textstats.gopher_rules_batch(df).reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(SQL_GOPHER_RULES).df()
    con.close()

    got = got.astype({"gopher_pass": bool})
    want = want.astype({"gopher_pass": bool})
    pd.testing.assert_frame_equal(got[want.columns], want)

    # the crafted cases actually exercise both outcomes of every rule
    assert bool(got.loc[0, "gopher_pass"]) is True
    assert not got.loc[1, "gopher_pass"]  # word count
    assert not got.loc[2, "gopher_pass"]  # alpha fraction
    assert bool(got.loc[3, "gopher_pass"]) is True  # bullets below threshold
    assert not got.loc[4, "gopher_pass"]  # bullet fraction
    assert not got.loc[6, "gopher_pass"]  # ellipsis fraction
    assert not got.loc[7, "gopher_pass"]  # symbol ratio
    assert not got.loc[8, "gopher_pass"]  # mean word length high
    assert not got.loc[9, "gopher_pass"]  # mean word length low
    assert not got.loc[10, "gopher_pass"]  # empty
    assert got.loc[11, "n_stop_words"] == 8
