"""End-to-end training-data preparation — the composed flagship pipeline a
100-TB corpus actually runs: language filter → model quality filter →
exact dedup → train/val/test split, in ONE streaming pass plus ONE
narrow shuffle.

Shape (every piece is an existing, individually-gated operator):

1. ``PrepStage`` (actor pool) — per batch, entirely local: language-ID
   (textstats.lang_id_batch), quality scoring (the QualityModelStage
   model, loaded once per actor), 128-bit content hash
   (dedup.add_content_hash_batch).  Rows failing the lang/quality
   predicate are dropped HERE, before anything shuffles; the batch leaves
   as (doc_id, pred_lang, quality_score, h1, h2) — content never moves.
2. ONE hash shuffle over 64 coarse partitions of the content key; a
   vectorized per-partition sort + drop_duplicates keeps the smallest
   doc_id per distinct content (the same winner exact_dedup elects).
3. ``sample.hash_split`` labels survivors train/val/test — a stateless
   per-batch map, parallelism- and resume-stable.

The DuckDB gate mirror (pipelines/gate.py ``corpus_prep``) recomposes the
SAME primitives in SQL — marker-vote language, logistic score with
embedded weights, splitmix64 content key, min-doc-id winner, hash-split
thresholds — so a regression anywhere in the composition breaks the
value-hash match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages import textstats
from ..stages.dedup import add_content_hash_batch
from ..stages.joins import NUM_PARTITIONS, _MIX
from ..stages.sample import hash_split


class PrepStage:
    """Filter + annotate one batch locally (see module docstring)."""

    def __init__(self, lang: str, min_score: float):
        self.w = np.array(textstats.QUALITY_MODEL_W, dtype=np.float64)
        self.lang, self.min_score = lang, min_score

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pred = textstats.lang_id_batch(batch)["pred_lang"].to_numpy(dtype=object)
        score = textstats.score_quality(textstats.quality_batch(batch), self.w)
        keep = (pred == self.lang) & (score >= self.min_score)
        kept = batch[keep]
        h = add_content_hash_batch(
            pa.Table.from_pandas(kept[["doc_id", "text"]], preserve_index=False)
        )
        out = pd.DataFrame(
            {
                "doc_id": kept["doc_id"].to_numpy(),
                "pred_lang": pred[keep],
                "quality_score": score[keep],
                "h1": h["h1"].to_numpy(),
                "h2": h["h2"].to_numpy(),
            }
        )
        out["__pk"] = (
            (out["h1"].to_numpy().view(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % NUM_PARTITIONS
        return out


def _dedup_group(g: pd.DataFrame) -> pd.DataFrame:
    s = g.sort_values(["h1", "h2", "doc_id"], kind="mergesort")
    return s.drop_duplicates(["h1", "h2"], keep="first").drop(
        columns=["h1", "h2", "__pk"]
    )


def prep_corpus(
    docs: ray.data.Dataset,
    lang: str = "en",
    min_score: float = 0.5,
    fractions: dict[str, float] | None = None,
    concurrency=None,
) -> ray.data.Dataset:
    """→ (doc_id, pred_lang, quality_score, split) for the cleaned,
    deduplicated corpus.  ``docs`` needs (doc_id, text)."""
    if concurrency is None:
        from ..functions.resources import actor_pool

        concurrency = actor_pool()
    annotated = docs.map_batches(
        PrepStage,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_kwargs={"lang": lang, "min_score": min_score},
    )
    deduped = annotated.groupby("__pk").map_groups(_dedup_group, batch_format="pandas")
    return hash_split(deduped, fractions or {"train": 0.8, "val": 0.1, "test": 0.1})


def prep_corpus_to_parquet(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    lang: str = "en",
    min_score: float = 0.5,
    fractions: dict[str, float] | None = None,
    resume: bool = False,
) -> str:
    """Run :func:`prep_corpus` and write ``split=train/…`` hive-partitioned
    parquet — the training-consumable layout (each split is its own
    directory of part files; a loader reads ``out_dir/split=train``
    without touching val/test bytes).

    Resumable output per the 100-TB contract: the write is atomic at the
    directory level via a ``.done`` marker — a crashed run leaves no
    marker and ``resume=True`` redoes the write (the pipeline itself is
    deterministic, so a redo produces the same rows); a completed run
    short-circuits.  Finer-grained (per-shard) resume belongs to the
    upstream build, which already has it.
    """
    import os

    marker = os.path.join(out_dir, ".done")
    if resume and os.path.exists(marker):
        return out_dir
    ds = prep_corpus(docs, lang=lang, min_score=min_score, fractions=fractions)
    ds.write_parquet(out_dir, partition_cols=["split"])
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


def training_export(
    docs: ray.data.Dataset,
    top_n: int,
    shards: int,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """The composed DATA-SELECTION flagship: exact dedup → DSIR importance
    weights → top-``top_n`` selection → deterministic shard export.
    ``docs`` needs (doc_id, <target_col>, text).  → (doc_id, shard, pos).

    Every stage is an individually-gated operator, and the SELECTION stays
    DISTRIBUTED: the driver receives only the bounded head-merge used to
    find the top-n CUTOFF (two ints broadcast back), the kept set is a
    streaming filter over the weights dataset, and the export is
    shuffle_export's one hash exchange.  At a 10⁹-row selection budget
    nothing changes — the cutoff is still two ints.

    Boundary materializes around the semi join per the aggregator-pool
    rule (NOTES item 6); the join pool sizes adaptively."""
    from ..stages import sample, textstats
    from ..stages.dedup import exact_dedup
    from ..stages.joins import adaptive_join_partitions, semi_join

    winners = exact_dedup(docs).select_columns(["doc_id"]).materialize()
    jp = num_partitions or adaptive_join_partitions(winners.count())
    deduped = semi_join(docs, winners, on="doc_id", num_partitions=jp).materialize()

    w = textstats.dsir_weights(
        deduped, target_col=target_col, target_value=target_value
    ).materialize()

    def head(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["dsir_weight_micro", "doc_id"], ascending=[False, True]
        ).head(top_n)

    cand = (
        w.map_batches(head, batch_format="pandas")
        .to_pandas()  # ≤ top_n·blocks rows — the bounded cutoff merge
        .sort_values(["dsir_weight_micro", "doc_id"], ascending=[False, True])
        .head(top_n)
    )
    cut_w = int(cand["dsir_weight_micro"].iloc[-1])
    cut_id = int(cand["doc_id"].iloc[-1])

    def keep(b: pa.Table) -> pa.Table:
        ww = b["dsir_weight_micro"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((ww > cut_w) | ((ww == cut_w) & (ids <= cut_id))))

    selected = w.map_batches(keep, batch_format="pyarrow").select_columns(["doc_id"])
    return (
        sample.shuffle_export(selected, shards=shards)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
