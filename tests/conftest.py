import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus():
    from searty_ray.sources.corpus import generate_fixture_corpus

    return generate_fixture_corpus()


@pytest.fixture(scope="session")
def fixture_index(ray_session, fixture_corpus, tmp_path_factory):
    """Build the full index once per session over the fixture corpus."""
    from searty_ray.pipelines.build import build_index
    from searty_ray.pipelines.symbols import build_symbols_from_corpus

    corpus_t, _ = fixture_corpus
    index_dir = str(tmp_path_factory.mktemp("ix") / "fixture_index")
    manifest = build_index(
        ray.data.from_arrow(corpus_t), index_dir, num_parts=8, chunk_span=16,
        tokenizer="trigram+symbols",
    )
    return index_dir, manifest


@pytest.fixture(scope="session")
def fixture_oracle(fixture_index):
    """Oracle built from the engine's own documents/content output, so doc
    ids (sort-mode assignment) agree by construction."""
    from searty_ray.oracle.oracle import OracleIndex

    index_dir, _ = fixture_index
    docs = pq.read_table(os.path.join(index_dir, "documents")).to_pandas().sort_values("doc_id")
    content = (
        pq.read_table(os.path.join(index_dir, "documents"), columns=["doc_id", "content"]).to_pandas().set_index("doc_id")["content"]
    )
    rows = [(int(r.doc_id), r.filename, content[r.doc_id]) for r in docs.itertuples()]
    return OracleIndex.build(rows)
