"""C4 page cleaning (textstats.c4_filters_batch) vs the DuckDB mirror on
crafted edge cases: terminal-punctuation variants, the 5-word line boundary,
case-insensitive "javascript" / "lorem ipsum", braces, and the 3-kept-line
page threshold."""

import duckdb
import pandas as pd

from searty_ray.pipelines.gate import SQL_C4_FILTERS
from searty_ray.stages import textstats

L = "this line has five words."  # keeps: 5 words, terminal '.'

DOCS = [
    f"{L}\n{L}\n{L}",  # 3 kept lines → page kept
    f"{L}\n{L}",  # only 2 kept lines → dropped
    f"{L}\nfour words is short.\n{L}\n{L}",  # 4-word line dropped, page kept
    f"{L}\nno terminal punctuation here at all\n{L}\n{L}",  # punct rule
    f'{L}\nshe said "hello there my friend"\n{L}\n{L}',  # quote-ending keeps
    f"{L}\nenable JavaScript to view this page.\n{L}\n{L}",  # ci javascript
    f"{L}\n{L}\n{L}\nfunction f() {{ return 1; }}",  # brace → page dropped
    f"{L}\n{L}\n{L}\nLorem Ipsum dolor sit amet.",  # ci lorem ipsum
    f"{L}\nis this a question with six words?\n{L}\n{L}",  # '?' keeps
    f"{L}\nwow this line really excites me!\n{L}\n{L}",  # '!' keeps
    "",  # empty page: 1 line (the empty split part), 0 kept
    "one.\ntwo.\nthree.",  # terminal punct but <5 words each → 0 kept
]


def test_c4_filters_match_duckdb():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    got = textstats.c4_filters_batch(df).reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(SQL_C4_FILTERS).df()
    con.close()

    for c in ("has_brace", "has_lorem", "c4_keep"):
        got[c] = got[c].astype(bool)
        want[c] = want[c].astype(bool)
    pd.testing.assert_frame_equal(got[want.columns], want)

    # the crafted cases exercise both outcomes of every rule
    assert bool(got.loc[0, "c4_keep"]) is True
    assert not got.loc[1, "c4_keep"]  # <3 kept lines
    assert got.loc[2, "n_kept_lines"] == 3  # 4-word line filtered
    assert got.loc[3, "n_kept_lines"] == 3  # missing punctuation filtered
    assert got.loc[4, "n_kept_lines"] == 4  # quote counts as terminal
    assert got.loc[5, "n_kept_lines"] == 3  # javascript mention filtered
    assert not got.loc[6, "c4_keep"] and bool(got.loc[6, "has_brace"])
    assert not got.loc[7, "c4_keep"] and bool(got.loc[7, "has_lorem"])
    assert got.loc[8, "n_kept_lines"] == 4  # '?' terminal
    assert got.loc[9, "n_kept_lines"] == 4  # '!' terminal
    assert got.loc[10, "n_lines"] == 1 and got.loc[10, "n_kept_lines"] == 0
    assert got.loc[11, "n_kept_lines"] == 0  # word-count rule alone
    # rewritten page drops exactly the filtered line
    assert got.loc[2, "clean_text"] == f"{L}\n{L}\n{L}"
