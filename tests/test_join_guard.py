"""Sparse (empty-hash-partition) join sides through every join wrapper.

CORRECTNESS_r04's one failure: tfidf_topk's vocabulary Dataset reached the
native Acero join carrying a ZERO-COLUMN empty pandas block (the Ray 2.49
aggregate/map_groups empty-hash-partition pathology — NOTES.md item 7) and
the join failed layout-dependently with "No match for key field".  The
guard now lives INSIDE hash_join / semi_join (joins.clean_join_side), so
no call site can miss it; these tests feed deterministically-poisoned and
genuinely-sparse sides through every wrapper.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from searty_ray.stages import joins


def _poisoned(df: pd.DataFrame) -> ray.data.Dataset:
    """A dataset whose block list contains a zero-column empty pandas
    block — the exact poison shape the aggregate/map_groups paths emit."""
    return ray.data.from_pandas([df, pd.DataFrame()])


def _sparse_groups(df: pd.DataFrame, key: str) -> ray.data.Dataset:
    """The authentic reproduction: a map_groups over very few distinct
    keys leaves most hash partitions empty → empty schema-less blocks."""
    return (
        ray.data.from_pandas(df)
        .groupby(key)
        .map_groups(lambda g: g, batch_format="pandas")
    )


RIGHT = pd.DataFrame({"word": ["a", "b", "c"], "idf": [3, 2, 1]})
LEFT = pd.DataFrame({"doc": [10, 11, 12, 13], "word": ["a", "a", "b", "z"]})


def _blocks(ds):
    out = []
    for bundle in ds.iter_internal_ref_bundles():
        out.extend(m.num_rows for m in bundle.metadata)
    return out


def test_clean_join_side_drops_poison(ray_session):
    clean = joins.clean_join_side(_poisoned(RIGHT))
    assert all(n > 0 for n in _blocks(clean.materialize()))
    got = clean.to_pandas().sort_values("word").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, RIGHT)


def test_clean_join_side_mixed_formats(ray_session):
    # arrow blocks + a pandas poison block: both survive, zero-copy refs
    ds = ray.data.from_arrow(pa.Table.from_pandas(RIGHT)).union(
        ray.data.from_pandas(pd.DataFrame())
    )
    clean = joins.clean_join_side(ds)
    assert clean.count() == len(RIGHT)
    assert all(n > 0 for n in _blocks(clean.materialize()))


def test_clean_join_side_noop_when_dense(ray_session):
    # no empty block → the input's materialized form comes back untouched
    mat = ray.data.from_pandas(RIGHT).materialize()
    assert joins.clean_join_side(mat).count() == 3


def test_hash_join_poisoned_right(ray_session):
    out = joins.hash_join(
        ray.data.from_pandas(LEFT), _poisoned(RIGHT), on="word", num_partitions=4
    ).to_pandas()
    ref = LEFT.merge(RIGHT, on="word")
    assert sorted(out["doc"]) == sorted(ref["doc"])
    assert out.set_index("doc")["idf"].to_dict() == ref.set_index("doc")["idf"].to_dict()


def test_hash_join_sparse_mapgroups_right(ray_session):
    # 2 distinct keys over the default hash partitions → empty partitions
    right = _sparse_groups(RIGHT.head(2), "word")
    out = joins.hash_join(
        ray.data.from_pandas(LEFT), right, on="word", num_partitions=4
    ).to_pandas()
    ref = LEFT.merge(RIGHT.head(2), on="word")
    assert sorted(out["doc"]) == sorted(ref["doc"])


def test_semi_and_anti_join_poisoned_right(ray_session):
    # num_partitions small: one aggregator ACTOR per partition — the
    # default 64 livelocks the 4-cpu test session (NOTES item 6)
    left = ray.data.from_pandas(LEFT)
    semi = joins.semi_join(
        left, _poisoned(RIGHT), on="word", num_partitions=4
    ).to_pandas()
    assert sorted(semi["doc"]) == [10, 11, 12]
    anti = joins.anti_join(
        left, _poisoned(RIGHT), on="word", num_partitions=4
    ).to_pandas()
    assert sorted(anti["doc"]) == [13]


def test_semi_join_poisoned_left(ray_session):
    semi = joins.semi_join(
        _poisoned(LEFT), ray.data.from_pandas(RIGHT), on="word", num_partitions=4
    ).to_pandas()
    assert sorted(semi["doc"]) == [10, 11, 12]


def test_tfidf_topk_sparse_layout(ray_session):
    """End-to-end: the failing driver query's shape — join-mode TF-IDF over
    a tiny corpus fragmented into many blocks (most vocab hash partitions
    empty).  Join mode must equal broadcast mode."""
    from searty_ray.stages import textstats

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "alpha beta beta",
                "alpha gamma",
                "beta beta beta delta",
                "gamma gamma alpha",
                "delta",
                "alpha beta gamma delta",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(5)
    j = (
        textstats.tfidf_topk(ds, k=2, mode="join", join_partitions=4)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        textstats.tfidf_topk(ds, k=2, mode="broadcast")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(j[b.columns], b)
