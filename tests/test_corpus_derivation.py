"""The corpus derivation (sources/corpus.py) and its DuckDB CTE mirror are
the keystone of every gate oracle — pin them to each other exactly."""

import duckdb
import pandas as pd


def test_derivation_matches_cte(ray_session):
    from searty_ray.sources.corpus import CORPUS_CTE, corpus_from_documents

    sf = "/root/testdata/sf0.001"
    eng = corpus_from_documents(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    ora = con.execute(f"WITH {CORPUS_CTE} SELECT * FROM corpus ORDER BY doc_id").df()
    assert list(eng.columns) == ["doc_id", "repo", "path", "commit", "lang", "content"]
    for col in eng.columns:
        pd.testing.assert_series_equal(eng[col], ora[col], check_names=False)


def test_replication_distinct_ids(ray_session):
    from searty_ray.sources.corpus import corpus_from_documents

    ds = corpus_from_documents("/root/testdata/sf0.001", replicate=3)
    df = ds.to_pandas()
    assert len(df) == 1500
    assert df["doc_id"].nunique() == 1500
    # content repeats across copies; derived ids/paths differ
    assert df["path"].nunique() == 1500


def test_replication_tiles_dense_ids_any_layout(ray_session):
    """The block-tiled replicate id scheme (copy r of base ids [lo, hi]
    gets [lo·R + r·cnt, …)) must yield ids that are a permutation of
    [0, n·R) — dense and collision-free — at ANY block layout, including
    non-divisible repartitions, so the range-committed documents writer
    sees contiguous runs instead of R interleaved runs per block."""
    from searty_ray.sources.corpus import corpus_from_documents

    for blocks in (7, 64):
        ds = corpus_from_documents(
            "/root/testdata/sf0.001", replicate=4, override_num_blocks=blocks
        )
        ids = sorted(ds.select_columns(["doc_id"]).to_pandas()["doc_id"])
        assert ids == list(range(2000)), f"layout {blocks}: ids not a dense tiling"
