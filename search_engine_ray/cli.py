"""CLI — the rebuild of the reference's demo driver + query REPL
(demo.ts:102-190, S1/S9).

    python -m search_engine_ray build  --input pages.parquet --out ./idx \\
        [--limit N] [--stop-words demo] [--skip-filter] [--doc-id-mode rank]
    python -m search_engine_ray search --index ./idx ["query" ...]   # REPL if none
    python -m search_engine_ray bm25   --index ./idx --query "q" [--mode or|and] [-k 10]

Owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None) -> bool:
    """Init Ray if nobody else has; returns True iff WE initialized it (the
    caller then owns the matching shutdown — an embedding process's session,
    e.g. pytest's, must not be torn down by a CLI call)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = {}
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    ray.init(
        address="local",
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        **kwargs,
    )
    return True


def cmd_build(args: argparse.Namespace) -> int:
    import ray
    import ray.data as rd

    from search_engine_ray.config import (
        DEMO_SCORE_WEIGHTS,
        DEMO_STOP_WORDS,
        DEMO_TITLE_STRIP_PREFIX,
        EngineConfig,
    )
    from search_engine_ray.pipelines.build import build_index

    owns_ray = _init_ray(args.num_cpus)
    demo = args.stop_words == "demo"
    config = EngineConfig(
        stop_words=DEMO_STOP_WORDS if demo else frozenset(),
        score_weights=DEMO_SCORE_WEIGHTS if demo else None,
        # the demo preset also strips 'Wikipedia: ' from titles (demo.ts:140)
        title_strip_prefix=DEMO_TITLE_STRIP_PREFIX if demo else None,
        salt_shift=args.salt_shift,
    )
    fmt = args.format
    if fmt == "auto":
        if args.input.endswith(".xml"):
            fmt = "wiki-xml"
        elif args.input.endswith((".warc", ".wet", ".warc.gz", ".wet.gz")):
            fmt = "warc"
        elif args.input.endswith(
            (".jsonl", ".ndjson", ".jsonl.gz", ".ndjson.gz", ".json.gz")
        ):
            fmt = "jsonl"
        else:
            fmt = "parquet"
    if fmt == "wiki-xml":
        import glob

        from search_engine_ray.sources.wiki_xml import wiki_abstract_pages

        files = sorted(glob.glob(args.input)) or [args.input]
        pages = wiki_abstract_pages(files)
    elif fmt == "warc":
        import glob

        from search_engine_ray.sources.warc import warc_pages

        files = sorted(glob.glob(args.input)) or [args.input]
        pages = warc_pages(files)
    elif fmt == "jsonl":
        import glob

        from search_engine_ray.sources.jsonl import jsonl_pages

        files = sorted(glob.glob(args.input)) or [args.input]
        pages = jsonl_pages(files)
    else:
        pages = rd.read_parquet(args.input)
    if args.limit:
        pages = pages.limit(args.limit)  # K7 ingest cap (demo.ts:99)
    t0 = time.perf_counter()
    res = build_index(
        pages,
        args.out,
        config,
        doc_id_mode=args.doc_id_mode,
        skip_filter=args.skip_filter,
        fingerprint=args.input,
        resume=not args.no_resume,
    )
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_docs": res.n_docs,
                "avgdl": round(res.avgdl, 2),
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(res.n_docs / wall, 1) if wall else None,
                "timings": {k: round(v, 2) for k, v in res.timings.items()},
                "out": res.out_dir,
            }
        )
    )
    if owns_ray:
        ray.shutdown()
    return 0


def _print_results(results, show_score: bool = False) -> None:
    for i, r in enumerate(results):
        score = f"  [{r.score:.4f}]" if show_score else ""
        print(f"{i + 1}. {r.title or r.url}{score}")
        print(f"   {r.introduction}")
        print(f"   {r.url}")


def cmd_search(args: argparse.Namespace) -> int:
    from search_engine_ray.config import DEMO_SCORE_WEIGHTS, DEMO_STOP_WORDS, EngineConfig
    from search_engine_ray.pipelines.serving import SegmentSearcher

    config = EngineConfig(
        stop_words=DEMO_STOP_WORDS if args.stop_words == "demo" else frozenset(),
        score_weights=DEMO_SCORE_WEIGHTS if args.stop_words == "demo" else None,
    )
    s = SegmentSearcher(args.index, config)
    if args.queries:
        for q in args.queries:
            t0 = time.perf_counter()
            rs = s.search(q, max_count=args.max_count)
            el = (time.perf_counter() - t0) * 1000
            print(f"# {q!r}: {len(rs)} hits in {el:.1f} ms")
            _print_results(rs)
        return 0
    # REPL (demo.ts:159-190)
    print("query> ", end="", flush=True)
    for line in sys.stdin:
        q = line.strip()
        if q in ("\\q", "exit", "quit"):
            break
        if q:
            t0 = time.perf_counter()
            rs = s.search(q, max_count=args.max_count)
            el = (time.perf_counter() - t0) * 1000
            print(f"{len(rs)} hits in {el:.1f} ms")
            _print_results(rs)
        print("query> ", end="", flush=True)
    return 0


def cmd_add(args: argparse.Namespace) -> int:
    """Incremental add: new pages become a new generation."""
    import ray
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import add_generation

    owns_ray = _init_ray(args.num_cpus)
    pages = rd.read_parquet(args.input)
    if args.limit:
        pages = pages.limit(args.limit)
    t0 = time.perf_counter()
    res = add_generation(
        args.index,
        pages,
        EngineConfig(),
        on_duplicate=args.on_duplicate,
    )
    print(
        json.dumps(
            {
                "n_docs_added": res.n_docs,
                "wall_sec": round(time.perf_counter() - t0, 2),
                "out": res.out_dir,
            }
        )
    )
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_delete(args: argparse.Namespace) -> int:
    """Soft-delete pages by url (tombstones; compact applies them)."""
    import ray

    from search_engine_ray.pipelines.build import delete_urls

    owns_ray = _init_ray(args.num_cpus)
    urls = list(args.url or [])
    if args.urls_file:
        with open(args.urls_file) as fh:
            urls.extend(u.strip() for u in fh if u.strip())
    t0 = time.perf_counter()
    n = delete_urls(args.index, urls, strict=not args.skip_missing)
    print(
        json.dumps(
            {
                "n_deleted": n,
                "wall_sec": round(time.perf_counter() - t0, 2),
                "index": args.index,
            }
        )
    )
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Fold all generations into one (Lucene-style segment merge)."""
    import ray

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import compact, compact_tiered

    owns_ray = _init_ray(args.num_cpus)
    t0 = time.perf_counter()
    if getattr(args, "max_generations", None):
        res = compact_tiered(
            args.index, EngineConfig(), max_generations=args.max_generations
        )
    else:
        res = compact(args.index, EngineConfig())
    print(
        json.dumps(
            {
                "n_docs": res.n_docs,
                "n_segment_rows": res.n_postings_rows,
                "wall_sec": round(time.perf_counter() - t0, 2),
                "timings": {k: round(v, 2) for k, v in res.timings.items()},
            }
        )
    )
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    """Index-size report — the reference's `npm run index-size`
    (`du -sh .index/*`, package.json:9) analogue: per-directory byte sizes
    (docs / segments / term_dict, per generation) plus manifest headline
    stats. Pure metadata — no Ray session, works on any fsio backend."""
    from search_engine_ray.state import fsio
    from search_engine_ray.state.segments import (
        generation_dirs,
        read_tombstones,
        tombstones_dir,
    )

    def dir_bytes(d: str) -> int:
        if not fsio.isdir(d):
            return 0
        total = 0
        for name in fsio.listdir(d):
            p = fsio.join(d, name)
            total += dir_bytes(p) if fsio.isdir(p) else fsio.file_size(p)
        return total

    out: dict = {"index": args.index, "generations": []}
    for g in generation_dirs(args.index):
        m = {}
        mpath = fsio.join(g, "manifest.json")
        if fsio.exists(mpath):
            m = json.loads(fsio.read_bytes(mpath))
        out["generations"].append(
            {
                "dir": g,
                "n_docs": m.get("n_docs"),
                "avgdl": m.get("avgdl"),
                "bytes": {
                    sub: dir_bytes(fsio.join(g, sub))
                    for sub in ("docs", "segments", "term_dict")
                },
            }
        )
    out["total_bytes"] = sum(
        sum(g["bytes"].values()) for g in out["generations"]
    )
    # pending soft deletes (applied + cleared by `compact`)
    out["n_tombstones"] = int(read_tombstones(args.index).num_rows)
    out["tombstone_bytes"] = dir_bytes(tombstones_dir(args.index))
    print(json.dumps(out))
    return 0


def cmd_pipeline(args: argparse.Namespace) -> int:
    """Run any named pipeline from __ray_entry__.queries() over a table
    directory and write the result as partitioned Parquet — the resumable
    batch-output path (many part files, never one giant file). A finished
    output directory carries a _DONE marker (pipeline name + sf_dir +
    rows); re-running with the same identity skips the work — the
    per-shard skip a driver loop over inputs relies on. ``--force``
    recomputes."""
    import ray

    from search_engine_ray.state import fsio

    # resolve the preset substitution BEFORE the marker check: the marker
    # identity must be the pipeline that actually ran, or a --preset exact
    # run would wrongly skip on a crawl-preset marker (and vice versa)
    name = args.name
    if getattr(args, "preset", "crawl") == "crawl":
        from search_engine_ray.pipelines.crawl import CRAWL_QUERY_SUBSTITUTES

        sub = CRAWL_QUERY_SUBSTITUTES.get(name)
        if sub is not None:
            print(
                f"preset=crawl: running {sub!r} (scale-safe variant of "
                f"{name!r}); pass --preset exact to force the exact variant",
                file=sys.stderr,
            )
            name = sub

    marker = fsio.join(args.out, "_DONE.json")
    if not getattr(args, "force", False) and fsio.exists(marker):
        rec = json.loads(fsio.read_bytes(marker))
        if rec.get("pipeline") == name and rec.get("sf_dir") == args.sf_dir:
            rec["skipped"] = True
            print(json.dumps(rec))
            return 0

    owns_ray = _init_ray(args.num_cpus)
    import importlib

    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    if name not in qs:
        print(f"unknown pipeline {name!r}; available: {sorted(qs)}")
        return 2
    import pandas as pd
    import pyarrow as pa_
    import ray.data as rd

    t0 = time.perf_counter()
    res = qs[name](args.sf_dir)
    if isinstance(res, pd.DataFrame):
        res = rd.from_pandas(res)
    elif isinstance(res, pa_.Table):
        res = rd.from_arrow(res)
    if fsio.isdir(args.out):
        # recompute (stale/mismatched/forced): write_parquet appends part
        # files, so a dirty directory would double-count rows
        fsio.rmtree(args.out)
    res.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    rec = {
        "pipeline": name,
        "requested": args.name,
        "sf_dir": args.sf_dir,
        "rows": int(n),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "out": args.out,
    }
    # marker written LAST: a crashed run leaves no marker and re-runs
    fsio.write_bytes(marker, json.dumps(rec).encode())
    print(json.dumps(rec))
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_bm25(args: argparse.Namespace) -> int:
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.serving import SegmentSearcher

    s = SegmentSearcher(args.index, EngineConfig())
    t0 = time.perf_counter()
    rs = s.search_bm25(args.query, k=args.k, mode=args.mode)
    el = (time.perf_counter() - t0) * 1000
    print(f"# {args.query!r} ({args.mode}): {len(rs)} hits in {el:.1f} ms")
    _print_results(rs, show_score=True)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="search_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build index from pages parquet")
    b.add_argument("--input", required=True)
    b.add_argument(
        "--format",
        choices=["auto", "parquet", "wiki-xml", "warc", "jsonl"],
        default="auto",
        help="input format (wiki-xml = the reference demo's abstract dump; "
        "warc = WARC/WET crawl archives, .gz ok)",
    )
    b.add_argument("--out", required=True)
    b.add_argument("--limit", type=int, default=0)
    b.add_argument("--stop-words", choices=["none", "demo"], default="none")
    b.add_argument("--skip-filter", action="store_true")
    b.add_argument("--doc-id-mode", choices=["rank", "replay"], default="rank")
    b.add_argument("--salt-shift", type=int, default=0)
    b.add_argument("--num-cpus", type=int, default=0)
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("search", help="compat search (REPL without queries)")
    q.add_argument("--index", required=True)
    q.add_argument("--stop-words", choices=["none", "demo"], default="none")
    q.add_argument("--max-count", type=int, default=10)
    q.add_argument("queries", nargs="*")
    q.set_defaults(fn=cmd_search)

    a = sub.add_parser("add", help="add pages to an index as a new generation")
    a.add_argument("--index", required=True)
    a.add_argument("--input", required=True)
    a.add_argument("--limit", type=int, default=0)
    a.add_argument("--on-duplicate", choices=["error", "skip"], default="skip")
    a.add_argument("--num-cpus", type=int, default=0)
    a.set_defaults(fn=cmd_add)

    dl = sub.add_parser("delete", help="tombstone pages by url (soft delete)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--url", action="append", help="repeatable")
    dl.add_argument("--urls-file", help="newline-separated url list")
    dl.add_argument("--skip-missing", action="store_true")
    dl.add_argument("--num-cpus", type=int, default=0)
    dl.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact", help="merge all generations into one")
    c.add_argument("--index", required=True)
    c.add_argument(
        "--max-generations",
        type=int,
        default=0,
        help="size-tiered PARTIAL compaction: merge only the smallest "
        "gen-* generations until at most this many generations remain "
        "(0 = full compaction)",
    )
    c.add_argument("--num-cpus", type=int, default=0)
    c.set_defaults(fn=cmd_compact)

    r = sub.add_parser(
        "pipeline", help="run a named pipeline and write partitioned parquet"
    )
    r.add_argument("name")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--out", required=True)
    r.add_argument("--num-cpus", type=int, default=0)
    r.add_argument(
        "--preset",
        choices=("crawl", "exact"),
        default="crawl",
        help="crawl (default): substitute scale-safe variants for "
        "quadratic/broadcast-heavy exact operators; exact: run the "
        "requested operator verbatim (oracle parity, small corpora)",
    )
    r.add_argument(
        "--force",
        action="store_true",
        help="recompute even if the output carries a matching _DONE marker",
    )
    r.set_defaults(fn=cmd_pipeline)

    st = sub.add_parser("stats", help="index-size report (du -sh analogue)")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    w = sub.add_parser("bm25", help="BM25 top-k (WAND or conjunctive)")
    w.add_argument("--index", required=True)
    w.add_argument("--query", required=True)
    w.add_argument("--mode", choices=["or", "and"], default="or")
    w.add_argument("-k", type=int, default=10)
    w.set_defaults(fn=cmd_bm25)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
