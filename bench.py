"""Benchmark harness (driver contract).

Headline: full index build over the corpus derived from
``$GRAFT_SF_DIR/documents.parquet`` (amplified ``$BENCH_REPLICATE``× to a
compute-bound regime; same driver test data, distinct doc ids), then a
deterministic mixed query batch (ranked / phrase / symbol / file) through the
actor-pool query engine, plus the flagship training-data ops.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {<stage>: sec, ...}, "sf": ..., "num_cpus": N,
   "files_per_sec": ..., "mb_per_sec": ..., "query_p50_ms": ..., "query_p95_ms": ...}

``--scaling``: runs the same benchmark in FRESH processes at two
parallelism levels (default num_cpus=2 and 8 — N and 4N within this host's
~7.6 effective cores; best-of-$BENCH_SCALE_TRIALS per level) on identical
input and reports both throughputs plus scaling efficiency, raw and
normalized by measured cores consumed (cluster-size proxy per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "40"))
INDEX_DIR = os.environ.get("BENCH_INDEX_DIR", f"/tmp/searty_ray_bench/{os.path.basename(SF_DIR)}_r{REPLICATE}")


def build_query_set(vocab: list[str], n_ranked: int = 60, n_phrase: int = 40) -> list[dict]:
    import numpy as np

    rng = np.random.default_rng(1234)
    rows = []
    qid = 0
    for _ in range(n_ranked):
        words = rng.choice(vocab, size=int(rng.integers(2, 4)), replace=True)
        rows.append({"query_id": qid, "kind": "ranked", "query": " ".join(words), "k": 10})
        qid += 1
    for i in range(n_phrase):
        words = rng.choice(vocab, size=2, replace=True)
        q = " ".join(words) if i % 5 else "no-such-phrase-xyzzy"
        rows.append({"query_id": qid, "kind": "phrase", "query": q, "k": 10})
        qid += 1
    for i in range(10):
        rows.append({"query_id": qid, "kind": "symbol", "query": f"doc-{i * 7}", "k": 10})
        qid += 1
    for i in range(10):
        rows.append({"query_id": qid, "kind": "file", "query": f"doc_{i}", "k": 10})
        qid += 1
    return rows


def _session_tree_cpu_snapshot() -> dict[int, float]:
    """Per-PID CPU seconds (live utime+stime plus reaped cutime+cstime) for
    this process and every /proc descendant."""
    hz = os.sysconf("SC_CLK_TCK")
    stats: dict[int, tuple[int, float]] = {}  # pid -> (ppid, ticks)
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: fields resume after the last ')'
        rest = raw[raw.rfind(")") + 2 :].split()
        ppid = int(rest[1])
        ticks = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        stats[int(d)] = (ppid, ticks)
    me = os.getpid()
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    out: dict[int, float] = {}
    stack = [me]
    while stack:
        pid = stack.pop()
        if pid in stats:
            out[pid] = stats[pid][1] / hz
            stack.extend(children.get(pid, []))
    return out


def _cpu_delta(before: dict[int, float], after: dict[int, float]) -> float:
    """CPU seconds the session tree spent between two snapshots.

    The plain aggregate (Σafter − Σbefore) is exact while every exit is
    reaped INSIDE the tree (the child's lifetime lands in its parent's
    cutime), but goes NEGATIVE when a pid counted before vanishes and its
    reaping happens outside the measured tree (the r3 'cores_used null'
    artifact).  Identity: floor − aggregate = Σ before[vanished] ≥ 0, so the
    two can't be max()ed — the floor OVERCOUNTS by a reaped child's
    pre-snapshot lifetime whenever reaping stays in-tree (parent cutime
    jumps by the whole lifetime while the floor never subtracted the
    child's before-ticks).  Prefer the exact aggregate; fall back to the
    never-negative floor only when the aggregate exhibits the artifact."""
    aggregate = sum(after.values()) - sum(before.values())
    if aggregate > 0:
        return aggregate
    floor = sum(v - before.get(pid, 0.0) for pid, v in after.items() if pid in before)
    floor += sum(v for pid, v in after.items() if pid not in before)
    return max(floor, 0.0)




def _worker_setup():
    """worker_process_setup_hook: mute Ray Data's per-block "Failed to
    hash the schemas" warning in EVERY worker (pyarrow schemas carrying
    parquet pandas metadata are unhashable — harmless, unfixable at the
    source since the inputs are read-only; join/exchange inputs are also
    metadata-stripped via joins.strip_schema_metadata so schema dedup
    works where it matters).  Defined here (picklable by value from
    __main__) because shuffle aggregator actors never import searty_ray."""
    import logging

    class _F(logging.Filter):
        def filter(self, record):
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(_F())


def main() -> None:
    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={"worker_process_setup_hook": _worker_setup},
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from searty_ray.pipelines.build import build_index
    from searty_ray.query import QueryEngine
    from searty_ray.sources.corpus import corpus_from_documents
    from searty_ray.stages import dedup, knn

    timings: dict[str, float] = {}

    # Warm-ups so the timed section measures steady-state compute + shuffle:
    # (a) OS page cache for the input, (b) one worker process per CPU with the
    # package imported and an allocator pool touched (worker cold-start —
    # imports + first-touch page faults — is NOT throughput).
    corpus_from_documents(SF_DIR).count()

    def _warm(batch):
        import numpy as _np

        import searty_ray  # noqa: F401  (triggers allocator tuning + imports)

        # touch a pool ≥ an encode reducer's working set: with the raised
        # mmap threshold the freed block stays in the worker's heap and the
        # real stages start warm (first-touch faults are cold-start, not
        # throughput)
        _np.empty(160_000_000 // 8, dtype=_np.int64).fill(1)
        return batch

    ray.data.range(NUM_CPUS, override_num_blocks=NUM_CPUS).map_batches(
        _warm, batch_size=1
    ).count()

    # Calibrate EFFECTIVE cores: virtualized hosts advertise more CPUs than
    # they deliver (this class: 32 advertised, ~8 effective) and
    # oversubscribing Ray Data tasks across them thrashes page faults and
    # caches.  Run one fixed CPU-bound task alone vs NUM_CPUS in parallel and
    # cap Data execution at the measured parallel speedup ("size concurrency
    # to the node").  On an honest host the cap ≈ NUM_CPUS and is a no-op.
    # cheap probe: with the NUM_CPUS/2 floor the cap only varies inside
    # [NUM_CPUS/2, NUM_CPUS], so a coarse estimate suffices — and the probe
    # itself burns burst budget the headline build needs on this
    # throttling host (BASELINE.md), so keep it ~8× lighter than the r3
    # version (was 2M × 8 rounds)
    @ray.remote
    def _spin(_):
        a = np.arange(1_000_000, dtype=np.int64)
        for _ in range(2):
            a = np.sort(a ^ (a >> 1))
        return int(a[0])

    ray.get(_spin.remote(0))  # warm
    t0 = time.monotonic()
    ray.get(_spin.remote(1))
    t_one = time.monotonic() - t0
    t0 = time.monotonic()
    ray.get([_spin.remote(i) for i in range(NUM_CPUS)])
    t_par = time.monotonic() - t0
    # FLOOR the cap at NUM_CPUS/2: the probe runs ONCE, and on this host a
    # probe landing in a post-burn throttled window (burst budget depleted —
    # BASELINE.md) used to lock the WHOLE bench to the throttled window's
    # pessimism (the r3 artifact: a brief throttle became a whole-run
    # concurrency cap).  A floored cap still damps pathological
    # oversubscription on honest-but-small hosts while letting Ray Data's
    # backpressure reclaim cores when the host recovers mid-run.
    effective = max(2, NUM_CPUS // 2, min(NUM_CPUS, round(NUM_CPUS * t_one / t_par)))
    if effective < NUM_CPUS:
        from ray.data import ExecutionResources

        ctx.execution_options.resource_limits = ExecutionResources(cpu=effective)

    # ---- index build (headline) ----
    # Measure the cores THIS SESSION actually received: CPU seconds of the
    # whole process tree (driver → raylet → workers; cutime/cstime catches
    # reaped children) divided by wall.  Unlike machine-wide /proc/stat
    # sampling this is correct under sched-affinity isolation and ignores
    # co-tenant load.
    cpu_before = _session_tree_cpu_snapshot()
    t0 = time.monotonic()
    corpus = corpus_from_documents(SF_DIR, replicate=REPLICATE, override_num_blocks=NUM_CPUS * 2)
    manifest = build_index(corpus, INDEX_DIR)
    timings["index_build"] = time.monotonic() - t0
    # per-PID-floored delta (_cpu_delta): immune to the vanished-descendant
    # reparenting artifact that used to drive the aggregate negative
    cpu_delta = _cpu_delta(cpu_before, _session_tree_cpu_snapshot())
    cores_used = round(cpu_delta / timings["index_build"], 2) if cpu_delta > 0 else None
    n_files = manifest.n_docs
    n_bytes = manifest.total_tokens  # ≈ content bytes (ascii corpus)

    # ---- query batch through the actor pool ----
    vocab = sorted(
        set(
            w
            for t in __import__("pyarrow.parquet", fromlist=["read_table"])
            .read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
            .column("text")[:50]
            .to_pylist()
            for w in t.split()
        )
    )
    queries = build_query_set(vocab)
    # prefix of warm-up queries (excluded from latency stats): actor
    # construction, norms load, hot-term cache fill are cold-start, not p95.
    # Sampled across ALL query kinds so every per-kind first-touch path
    # (symbols table, content sidecar, …) is exercised on each actor.
    by_kind: dict[str, list[dict]] = {}
    for q in queries:
        by_kind.setdefault(q["kind"], []).append(q)
    warm_src = [q for kind in by_kind for q in by_kind[kind][:4]]
    warm = [dict(q, query_id=q["query_id"] + 100000) for q in warm_src]
    t0 = time.monotonic()
    res = ray.data.from_items(warm + queries).map_batches(
        QueryEngine,
        batch_format="pyarrow",
        batch_size=8,
        concurrency=4,
        fn_constructor_kwargs={"index_dir": INDEX_DIR},
    ).to_pandas()
    timings["query_batch"] = time.monotonic() - t0
    lat = np.sort(res[res["query_id"] < 100000]["wall_ms"].to_numpy())
    p50 = float(np.percentile(lat, 50))
    p95 = float(np.percentile(lat, 95))

    # ---- training-data ops (skipped in scaling mode: headline is the build) ----
    if os.environ.get("BENCH_SKIP_OPS"):
        _emit(timings, n_files, n_bytes, p50, p95, cores_used)
        ray.shutdown()
        return
    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )  # prune at the scan: the ops only touch (doc_id, text)
    t0 = time.monotonic()
    dedup.exact_dedup(docs).count()
    timings["dedup_exact"] = time.monotonic() - t0

    t0 = time.monotonic()
    pairs = dedup.minhash_lsh_pairs(
        docs.select_columns(["doc_id", "text"]),
        threshold=0.5,
        source_path=f"{SF_DIR}/documents.parquet",
    )
    timings["dedup_minhash"] = time.monotonic() - t0

    t0 = time.monotonic()
    dedup.simhash_near_dups(docs.select_columns(["doc_id", "text"]), max_hamming=3)
    timings["dedup_simhash"] = time.monotonic() - t0

    # pairs → connected components → canonical keep-list, over the pair set
    # the dedup_minhash stage just produced (pair generation is already
    # timed there; this stage times the CC rounds — edge-set-sized shuffles
    # — and the canonical filter)
    from searty_ray.stages import cluster as _cluster

    t0 = time.monotonic()
    clusters = _cluster.duplicate_clusters(pairs)
    _cluster.canonical_filter(docs.select_columns(["doc_id"]), clusters).count()
    timings["dedup_clusters"] = time.monotonic() - t0

    # fuzzy scan-pushdown over the derived corpus (ed<=1 kernel per batch)
    from searty_ray.sources.corpus import corpus_from_documents as _cfd
    from searty_ray.stages.fuzzy import fuzzy_word_stats as _fuzzy

    t0 = time.monotonic()
    _fuzzy(_cfd(SF_DIR), "DOC-7").count()
    timings["fuzzy_words"] = time.monotonic() - t0

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qt = __import__("pyarrow.parquet", fromlist=["read_table"]).read_table(
        f"{SF_DIR}/embeddings.parquet"
    )
    qvecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(qt["vec_id"][:16].to_pylist(), qt["embedding"][:16].to_pylist())
    }
    t0 = time.monotonic()
    knn.knn_brute_cosine(emb, qvecs, k=10)
    timings["knn_brute"] = time.monotonic() - t0

    # int8-quantized KNN (4× smaller vectors; integer scores) and PQ+ADC
    # (m-byte codes + per-query LUTs) — the compressed vector-search paths
    t0 = time.monotonic()
    knn.knn_quantized_cosine(emb, qvecs, k=10)
    timings["knn_quantized"] = time.monotonic() - t0
    # PQ: fit ONCE (the production fit-once-at-ingest shape — r4 verdict),
    # timed separately, then ADC search with the fitted codebooks
    t0 = time.monotonic()
    books = knn.pq_fit(emb)
    timings["pq_fit"] = time.monotonic() - t0
    t0 = time.monotonic()
    knn.knn_pq_adc(emb, qvecs, k=10, books=books)
    timings["ann_pq"] = time.monotonic() - t0

    # IVF: disk-backed build + distributed batch search (the ANN scale path)
    ivf_dir = "/tmp/searty_ray_bench_ivf"
    import shutil as _sh

    _sh.rmtree(ivf_dir, ignore_errors=True)
    # build-once / search-many split (the pq_fit / ann_pq shape, r4 verdict)
    t0 = time.monotonic()
    knn.IVFIndex.build(emb, ivf_dir, nlist=16)
    timings["ivf_build"] = time.monotonic() - t0
    t0 = time.monotonic()
    knn.knn_ivf_search_batch(ivf_dir, emb.limit(64), k=10, nprobe=4).count()
    timings["ann_ivf"] = time.monotonic() - t0

    # composed training-data cleaning (lang filter → quality model → exact
    # dedup → split): one streaming actor-pool pass + one narrow shuffle
    from searty_ray.pipelines.prep import prep_corpus

    t0 = time.monotonic()
    prep_corpus(docs).count()
    timings["corpus_prep"] = time.monotonic() - t0

    # join+analytics composition (TPC-H Q3 shape): broadcast semi-join →
    # hash shuffle join → combiner-first global sum-top-k
    from searty_ray.pipelines.gate import q_shipping_priority

    t0 = time.monotonic()
    q_shipping_priority(SF_DIR)
    timings["join_topk"] = time.monotonic() - t0

    # corpus-wide line dedup over the derived code corpus (narrow decision
    # shuffle + one reassembly hash join — content moves once)
    t0 = time.monotonic()
    dedup.line_dedup(
        _cfd(SF_DIR).select_columns(["doc_id", "content"]), text="content"
    ).count()
    timings["line_dedup"] = time.monotonic() - t0

    # corpus-wide duplicate-SPAN removal (exact-substring dedup, word grain):
    # same narrow decision shuffle + one reassembly join as line_dedup
    t0 = time.monotonic()
    dedup.span_dedup(docs).count()
    timings["span_dedup"] = time.monotonic() - t0

    # sequence packing end-to-end: two-level prefix scan + fragment exchange
    from searty_ray.stages.packing import assemble_sequences

    t0 = time.monotonic()
    assemble_sequences(docs, budget=2048).count()
    timings["pack_assemble"] = time.monotonic() - t0

    # windowed co-occurrence + PMI: combiner-first pair counting, one
    # (word_a, word_b) groupby, distributed totals + top-k
    from searty_ray.stages.textstats import word_cooccurrence

    t0 = time.monotonic()
    word_cooccurrence(docs, window=3, top_k=20)
    timings["word_cooc"] = time.monotonic() - t0

    # DSIR data selection: bucket-count scan + broadcast lam + streaming
    # score + top-N merge (two corpus passes, zero shuffle)
    from searty_ray.stages.textstats import dsir_select

    docs_lang = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    t0 = time.monotonic()
    dsir_select(docs_lang, 1000)
    timings["dsir_select"] = time.monotonic() - t0

    # deterministic training-shard permutation: one hash shuffle + ranks
    from searty_ray.stages.sample import shuffle_export

    t0 = time.monotonic()
    shuffle_export(
        ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"]),
        shards=64,
    ).count()
    timings["shuffle_export"] = time.monotonic() - t0

    # BPE tokenizer train (distributed word-count reduction + vocab-scale
    # driver merge loop) + apply (broadcast merges, per-actor word cache)
    from searty_ray.stages import bpe as _bpe

    t0 = time.monotonic()
    _bpe.bpe_apply(docs, _bpe.bpe_train(docs, 200)).count()
    timings["bpe_train_apply"] = time.monotonic() - t0

    # iterative graph workload: 5 Pregel iterations of integer PageRank
    # over the symmetrised customer-supplier trade graph (one order-key
    # hash join + per-iteration vertex join & contribution exchange)
    from searty_ray.pipelines.gate import q_graph_pagerank

    t0 = time.monotonic()
    q_graph_pagerank(SF_DIR)
    timings["graph_pagerank"] = time.monotonic() - t0

    # label-propagation components + triangle counting over the sparse
    # lineitem-derived graphs (the r5 fourth-continuation graph surface)
    from searty_ray.pipelines.gate import q_graph_components, q_graph_triangles

    t0 = time.monotonic()
    q_graph_components(SF_DIR)
    timings["graph_components"] = time.monotonic() - t0

    t0 = time.monotonic()
    q_graph_triangles(SF_DIR)
    timings["graph_triangles"] = time.monotonic() - t0

    # CDC latest-state compaction over the events stream (argmax combiner)
    from searty_ray.pipelines.gate import q_events_latest

    t0 = time.monotonic()
    q_events_latest(SF_DIR)
    timings["events_latest"] = time.monotonic() - t0

    _emit(timings, n_files, n_bytes, p50, p95, cores_used)
    ray.shutdown()


def _emit(timings: dict[str, float], n_files: int, n_bytes: int, p50: float, p95: float, cores_used=None) -> None:
    out = {
        "metric": "index_build_and_query",
        "value": round(timings["index_build"] + timings["query_batch"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicate": REPLICATE,
        "n_files": n_files,
        "files_per_sec": round(n_files / timings["index_build"], 1),
        "mb_per_sec": round(n_bytes / 1e6 / timings["index_build"], 2),
        "query_p50_ms": round(p50, 2),
        "query_p95_ms": round(p95, 2),
        "cores_used_build": cores_used,
        "total_sec": round(sum(timings.values()), 3),
    }
    print(json.dumps(out))


def scaling() -> None:
    # N vs 4N parallelism (cluster-size proxy per BASELINE.md).  This host
    # advertises 32 CPUs but delivers ~7.6 cores of aggregate compute (a pure
    # Ray-task benchmark runs 128 fixed tasks in the SAME wall time at
    # num_cpus=8 and 32), so 8→32 cannot show scaling on this machine; 2→8
    # stays within real capacity and measures the pipeline, not the cap.
    # Override with BENCH_SCALE_LO/HI on hosts with real core counts.
    lo_cpus = int(os.environ.get("BENCH_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("BENCH_SCALE_HI", "8"))
    trials = int(os.environ.get("BENCH_SCALE_TRIALS", "2"))
    # HARD cpu isolation via sched affinity: `taskset -c 0-(n-1)` binds the
    # whole process tree (driver, raylet, workers, object store) to exactly n
    # CPUs, so runtime threads can't leak past the logical slot count and
    # inflate the low-cpu baseline (the r1 confound: a "2-cpu" session
    # consumed 2.14 measured cores).  /sys/fs/cgroup here is a tmpfs mock
    # (no controllers), so cpu.max quotas are NOT available — affinity is
    # the strongest isolation this sandbox offers.
    import shutil as _shutil

    use_taskset = _shutil.which("taskset") is not None and os.environ.get(
        "BENCH_SCALE_NO_AFFINITY"
    ) is None
    # the host throttles SUSTAINED cpu after a ~15s burst budget (measured,
    # BASELINE.md): an optional idle gap between trials lets the budget
    # recover so each level starts from comparable credit, rather than the
    # last level inheriting a depleted budget from the runs before it
    gap = int(os.environ.get("BENCH_SCALE_GAP", "0"))
    results = {}
    # co-tenant noise swings host-delivered cores ±2x run to run; best-of-N
    # throughput per level is the standard de-noising for a shared host
    for i, ncpu in enumerate([c for c in (lo_cpus, hi_cpus) for _ in range(trials)]):
        if gap and i:
            time.sleep(gap)
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_INDEX_DIR=f"/tmp/searty_ray_scaling_{ncpu}",
            # scaling runs need a compute-bound job: amplify unless overridden
            BENCH_REPLICATE=os.environ.get("BENCH_REPLICATE", "120"),
            BENCH_SKIP_OPS="1",
        )
        argv = [sys.executable, os.path.abspath(__file__)]
        if use_taskset:
            argv = ["taskset", "-c", f"0-{ncpu - 1}", *argv]
        proc = subprocess.run(
            argv,
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            # best-of-N tolerates a lost trial (transient Ray/host failures);
            # surface the tail so the cause isn't swallowed
            tail = "\n".join(proc.stderr.strip().splitlines()[-6:])
            print(f"# trial {i} (cpus={ncpu}) failed rc={proc.returncode}:\n{tail}", file=sys.stderr)
            continue
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        if ncpu not in results or r["files_per_sec"] > results[ncpu]["files_per_sec"]:
            results[ncpu] = r
    if lo_cpus not in results or hi_cpus not in results:
        raise SystemExit("scaling: every trial of one level failed — see stderr above")
    thr_lo = results[lo_cpus]["files_per_sec"]
    thr_hi = results[hi_cpus]["files_per_sec"]
    eff = (thr_hi / thr_lo) / (hi_cpus / lo_cpus)
    # normalized by the cores each session actually consumed (runtime threads
    # leak past the logical slot count, inflating the low-cpu baseline)
    c_lo = results[lo_cpus].get("cores_used_build") or lo_cpus
    c_hi = results[hi_cpus].get("cores_used_build") or hi_cpus
    eff_norm = (thr_hi / thr_lo) / (c_hi / c_lo) if c_lo and c_hi else None
    print(
        json.dumps(
            {
                "cpus_lo": lo_cpus,
                "cpus_hi": hi_cpus,
                f"build_sec_{lo_cpus}": results[lo_cpus]["queries"]["index_build"],
                f"build_sec_{hi_cpus}": results[hi_cpus]["queries"]["index_build"],
                f"files_per_sec_{lo_cpus}": thr_lo,
                f"files_per_sec_{hi_cpus}": thr_hi,
                f"query_p95_ms_{lo_cpus}": results[lo_cpus]["query_p95_ms"],
                f"query_p95_ms_{hi_cpus}": results[hi_cpus]["query_p95_ms"],
                f"cores_used_{lo_cpus}": c_lo,
                f"cores_used_{hi_cpus}": c_hi,
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_capacity_normalized": round(eff_norm, 3) if eff_norm else None,
                "isolation": "sched_affinity" if use_taskset else "none",
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
