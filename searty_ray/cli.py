"""Command-line surface, mirroring the reference's three commands
(/root/reference/cmd/searty/searty.go:16-26, cmd/searty-index/index.go:12-28,
cmd/searty-merge/merge.go:12-27):

  python -m searty_ray index  -o INDEX_DIR CORPUS.parquet…   # build one index
  python -m searty_ray merge  -o INDEX_DIR CORPUS.parquet…   # union corpora → one index
  python -m searty_ray add    -d INDEX_DIR -o OUT_DIR CORPUS.parquet…  # incremental grow
  python -m searty_ray search -d INDEX_DIR [--symbol Q] [--file Q]
                              [--ranked Q] [--words Q] [PHRASE…]
  python -m searty_ray describe -d INDEX_DIR [--dump-terms]

``merge`` exists for parity: because the build shuffles by term, "merging
shards" is just building over the UNION of corpus tables — the reference's
six-phase id-reconciliation merge (merge.go:455-502) is structural here.

Search prints results in the reference's ``filename:start:end:line`` shape
(pretty_print.go:31-41), with symbol results first like cmd/searty (D5 union
of query kinds).  The CLI owns the Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import os
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR"
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _load_corpus(paths: list[str], from_documents: bool):
    import ray.data

    from .sources.corpus import corpus_from_documents

    if from_documents:
        assert len(paths) == 1, "--from-documents takes one sf_dir"
        return corpus_from_documents(paths[0])
    ds = ray.data.read_parquet(paths[0])
    for p in paths[1:]:
        ds = ds.union(ray.data.read_parquet(p))
    return ds


def cmd_index(args) -> int:
    _ray_session()
    from .pipelines.build import build_index

    corpus = _load_corpus(args.corpus, args.from_documents)
    manifest = build_index(
        corpus, args.output, tokenizer=args.tokenizer, resume=args.resume
    )
    print(
        f"indexed {manifest.n_docs} docs, {manifest.total_tokens} tokens, "
        f"{len(manifest.partitions)} partitions -> {args.output}"
    )
    return 0


def cmd_merge_index(args) -> int:
    _ray_session()
    from .pipelines.merge import merge_indexes

    manifest = merge_indexes(args.index, args.output, resume=args.resume,
                             preserve_ids=args.preserve_ids)
    print(
        f"merged {len(args.index)} indexes: {manifest.n_docs} docs, "
        f"{manifest.total_tokens} tokens -> {args.output}"
    )
    return 0


def cmd_add(args) -> int:
    _ray_session()
    from .pipelines.merge import add_documents

    corpus = _load_corpus(args.corpus, args.from_documents)
    manifest = add_documents(
        args.index, corpus, args.output,
        preserve_ids=args.preserve_ids, resume=args.resume,
    )
    print(
        f"grew {args.index}: now {manifest.n_docs} docs, "
        f"{manifest.total_tokens} tokens -> {args.output}"
    )
    return 0


def cmd_update(args) -> int:
    _ray_session()
    from .pipelines.merge import update_documents

    corpus = _load_corpus(args.corpus, args.from_documents)
    manifest = update_documents(args.index, corpus, args.output, resume=args.resume)
    print(
        f"updated {args.index}: now {manifest.n_docs} docs, "
        f"{manifest.total_tokens} tokens -> {args.output}"
    )
    return 0


def cmd_remove(args) -> int:
    _ray_session()
    from .pipelines.merge import remove_documents

    manifest = remove_documents(
        args.index, args.output,
        filenames=args.filenames,
        preserve_ids=args.preserve_ids, resume=args.resume,
    )
    print(
        f"shrunk {args.index}: now {manifest.n_docs} docs, "
        f"{manifest.total_tokens} tokens -> {args.output}"
    )
    return 0


def cmd_index_spec(args) -> int:
    _ray_session()
    from .sources.spec import index_spec

    manifest = index_spec(args.spec, args.output, tokenizer=args.tokenizer)
    print(
        f"indexed {len(args.spec)} system(s): {manifest.n_docs} docs, "
        f"{manifest.total_tokens} tokens -> {args.output}"
    )
    return 0


def cmd_verify(args) -> int:
    _ray_session()
    from .tools.verify_index import verify_index

    res = verify_index(args.database)
    print(
        f"{res['rows']} posting rows checked, {res['errors']} errors, "
        f"{res['dup_term_chunk']} duplicate (term, chunk) rows, "
        f"docmeta {'ok' if res['docmeta_ok'] else 'MISMATCH'}"
    )
    for e in res["first_errors"]:
        print(f"  error: {e}")
    return 0 if res["ok"] else 1


def cmd_search(args) -> int:
    # validate BEFORE any searcher runs — a mid-command error after other
    # query kinds printed would hand scripts partial output with rc != 0
    if args.must_not and not (args.must or args.should):
        print("error: --must-not needs at least one --must or --should phrase", file=sys.stderr)
        return 2
    _ray_session()
    from .query import (
        BM25Searcher,
        FileSearcher,
        IndexReader,
        PhraseSearcher,
        PrettyPrinter,
        SymbolSearcher,
        WordSearcher,
    )

    reader = IndexReader(args.database)
    printer = PrettyPrinter(reader)
    if args.symbol:
        for r in SymbolSearcher(reader).search(args.symbol).to_pylist():
            print(f"{r['filename']}:{r['position']}:{r['position']}:{r['specifier']} {r['symbol_name']}")
    if args.file:
        for r in FileSearcher(reader).search(args.file).to_pylist():
            print(r["filename"])
    if args.ranked:
        for r in BM25Searcher(reader).topk(args.ranked, args.k).to_pylist():
            print(f"{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}")
    if args.regex:
        from .functions.regexplan import literal_alternatives
        from .query import RegexSearcher

        if literal_alternatives(args.regex) is not None:
            res = RegexSearcher(reader).search(args.regex)
        else:
            # unprunable → explicit distributed scan over the index's own
            # content sidecar (never a hidden whole-corpus scan in-process)
            import ray.data

            from .stages.regexscan import regex_scan

            res = (
                regex_scan(
                    ray.data.read_parquet(
                        os.path.join(args.database, "documents"),
                        columns=["doc_id", "content", "filename"],
                    ),
                    args.regex,
                    text_col="content",
                    filename_col="filename",
                )
                .to_pandas()
                .sort_values("doc_id")
            )
            import pyarrow as _pa

            res = _pa.Table.from_pandas(res, preserve_index=False)
        for r in res.to_pylist():
            print(f"{r['filename']}:{r['n_matches']}:{r['first_match']}")
    if args.words:
        for r in WordSearcher(reader).topk(args.words, args.k).to_pylist():
            print(f"{r['rank']}\t{r['doc_id']}\t{r['score']:.6f}")
    if args.must or args.should:
        from .query import BoolSearcher

        res = BoolSearcher(reader).search(
            must=tuple(args.must), should=tuple(args.should), must_not=tuple(args.must_not)
        )
        for r in res.to_pylist():
            print(f"{r['filename']}\t{r['doc_id']}")
    if args.near:
        from .query import ProximitySearcher

        for r in ProximitySearcher(reader).near(
            args.near[0], args.near[1], args.near_window
        ).to_pylist():
            print(f"{r['filename']}\t{r['n_pairs']}\t{r['min_gap']}")
    if args.wildcard:
        from .query import PrefixSearcher

        for r in PrefixSearcher(reader).wildcard_docs(args.wildcard).to_pylist():
            print(f"{r['filename']}\t{r['n_terms']}\t{r['total_tf']}")
    if args.fuzzy:
        import ray.data

        from .stages.fuzzy import fuzzy_word_stats

        docs = ray.data.read_parquet(
            os.path.join(args.database, "documents"), columns=["doc_id", "content"]
        )
        out = (
            fuzzy_word_stats(docs, args.fuzzy)
            .to_pandas()
            # zero matches → Ray drops the empty dataset's schema
            .reindex(columns=["word", "df", "cf"])
            .sort_values(["df", "word"], ascending=[False, True])
        )
        for r in out.itertuples(index=False):
            print(f"{r.word}\t{r.df}\t{r.cf}")
    for phrase in args.phrase:
        hits = PhraseSearcher(reader).search(phrase, limit=args.limit)
        if args.snippet is not None:
            res = printer.snippets(hits, window=args.snippet)
            for r in res.to_pylist():
                print(f"{r['filename']}:{r['start']}:{r['end']}:{r['snippet']!r}")
        else:
            res = printer.render(hits)
            for r in res.to_pylist():
                print(f"{r['filename']}:{r['start']}:{r['end']}:{r['line']}")
    return 0


def cmd_describe(args) -> int:
    from .tools.describe import describe

    describe(args.database, dump_terms=args.dump_terms, out=sys.stdout)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searty_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("index", "merge"):
        pi = sub.add_parser(name)
        pi.add_argument("-o", "--output", required=True)
        pi.add_argument("corpus", nargs="+")
        pi.add_argument("--from-documents", action="store_true",
                        help="treat CORPUS as an sf_dir with documents.parquet")
        pi.add_argument("--tokenizer", default="trigram+symbols",
                        choices=["trigram", "trigram+symbols"])
        pi.add_argument("--resume", action="store_true")
        pi.set_defaults(fn=cmd_index)

    pm = sub.add_parser("merge-index", help="merge BUILT indexes (no re-tokenization)")
    pm.add_argument("-o", "--output", required=True)
    pm.add_argument("--resume", action="store_true")
    pm.add_argument("--preserve-ids", action="store_true",
                    help="keep caller-assigned global doc ids (hash mode); "
                         "rejects colliding per-shard ids")
    pm.add_argument("index", nargs="+")
    pm.set_defaults(fn=cmd_merge_index)

    pa_ = sub.add_parser(
        "add", help="incrementally index NEW documents into an existing index "
                    "(delta build + merge; no re-tokenization of existing docs)"
    )
    pa_.add_argument("-d", "--index", required=True, help="existing index dir")
    pa_.add_argument("-o", "--output", required=True, help="grown index dir")
    pa_.add_argument("corpus", nargs="+")
    pa_.add_argument("--from-documents", action="store_true")
    pa_.add_argument("--preserve-ids", action="store_true")
    pa_.add_argument("--resume", action="store_true")
    pa_.set_defaults(fn=cmd_add)

    pu = sub.add_parser(
        "update", help="replace matching-filename docs with new versions (remove+add)"
    )
    pu.add_argument("-d", "--index", required=True, help="existing index dir")
    pu.add_argument("-o", "--output", required=True, help="updated index dir")
    pu.add_argument("corpus", nargs="+")
    pu.add_argument("--from-documents", action="store_true")
    pu.add_argument("--resume", action="store_true")
    pu.set_defaults(fn=cmd_update)

    pr = sub.add_parser(
        "remove", help="drop documents from an existing index (no re-tokenization "
                       "of surviving docs; unknown filenames are a no-op)"
    )
    pr.add_argument("-d", "--index", required=True, help="existing index dir")
    pr.add_argument("-o", "--output", required=True, help="shrunk index dir")
    pr.add_argument("filenames", nargs="+", help="docmeta filenames to remove")
    pr.add_argument("--preserve-ids", action="store_true")
    pr.add_argument("--resume", action="store_true")
    pr.set_defaults(fn=cmd_remove)

    pspec = sub.add_parser("index-spec", help="index searty spec JSON(s) + file tree")
    pspec.add_argument("-o", "--output", required=True)
    pspec.add_argument("spec", nargs="+")
    pspec.add_argument("--tokenizer", default="trigram+symbols",
                       choices=["trigram", "trigram+symbols"])
    pspec.set_defaults(fn=cmd_index_spec)

    ps = sub.add_parser("search")
    ps.add_argument("-d", "--database", required=True)
    ps.add_argument("--symbol")
    ps.add_argument("--file")
    ps.add_argument("--ranked")
    ps.add_argument("--regex", help="RE2 regex; trigram-pruned when the pattern allows, "
                    "distributed scan otherwise")
    ps.add_argument("--words")
    ps.add_argument("--must", action="append", default=[],
                    help="bool query: phrase that MUST match (repeatable)")
    ps.add_argument("--should", action="append", default=[],
                    help="bool query: at least one --should phrase must match")
    ps.add_argument("--must-not", action="append", default=[],
                    help="bool query: phrase that must NOT match")
    ps.add_argument("--fuzzy", help="edit-distance-1 word match over the indexed corpus")
    ps.add_argument("--near", nargs=2, metavar=("WORD_A", "WORD_B"),
                    help="proximity: docs where the two words start within --near-window chars")
    ps.add_argument("--near-window", type=int, default=40,
                    help="NEAR window in characters (default 40)")
    ps.add_argument("--wildcard",
                    help="word pattern with one '*' (pre*, *suf, *mid*, pre*suf) over the term dictionary")
    ps.add_argument("-k", type=int, default=10)
    ps.add_argument("--limit", type=int, default=None,
                    help="cap phrase results (default: print all, reference parity)")
    ps.add_argument("--snippet", type=int, default=None, metavar="WINDOW",
                    help="KWIC rendering: ±WINDOW runes of context instead of the line")
    ps.add_argument("phrase", nargs="*")
    ps.set_defaults(fn=cmd_search)

    pd = sub.add_parser("describe")
    pd.add_argument("-d", "--database", required=True)
    pd.add_argument("--dump-terms", action="store_true")

    pv = sub.add_parser("verify", help="distributed index integrity check (CheckCorruption parity)")
    pv.add_argument("-d", "--database", required=True)
    pv.set_defaults(fn=cmd_verify)
    pd.set_defaults(fn=cmd_describe)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
