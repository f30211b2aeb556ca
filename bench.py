"""Benchmark harness — prints ONE JSON line on stdout.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32) CPUs:
  - full index build over the documents table (pages-adapted)
  - full index build over the deterministic synth-zipf corpus
    ($GRAFT_BENCH_DOCS docs, default 100_000) -> docs/sec (headline)
  - query latencies (p50/p95) over the reference query set on Ray-built
    conformance indexes + BM25/WAND queries on the zipf index

--scaling: run the synth index build twice in FRESH processes at 8 and 32
CPUs on the same input and report both throughputs + scaling efficiency
E = (R32/R8)/4 (the sandbox substitute for N vs 4N nodes, BASELINE.md).

--build-only N: internal child mode for --scaling.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
# workers inherit env, not the driver's sys.path — set before ray.init
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "500000"))
# the scaling comparison needs a job large enough that per-session fixed
# costs (shuffle setup, write barriers) are amortized — at 100k docs the
# build is ~15s and fixed latency dominates both sides
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "2000000"))

# reference query set: every query in engine.test.ts + the two README
# benchmark queries (BASELINE.md)
REFERENCE_QUERIES = {
    "planets": [
        "brightest", "giant", "Solar", "ancient civilizations", "planet sixth",
        '"planet sixth"', '"after Jupiter"', '"from the Sun" Moon',
        'moon "from the Sun"', 'fifth "from the sun"', '"moon and venus"',
    ],
    "carl_friedrich": ['"carl friedrich"'],
    "haber": ["process", "haber", "haber process"],
    "star": ["star", "trek", "star trek"],
}
README_BENCH = ["philosophy psychology", '"carl friedrich" german']


def _host_markers() -> dict:
    """Cheap host-state probes recorded alongside every benchmark: this
    box's run-to-run drift is up to 15x (hypervisor steal + dirty-page
    writeback throttling, BASELINE.md), so each BENCH record carries the
    host condition it was measured under."""
    import numpy as np

    # memcpy bandwidth (~200 MB copy, best of 3)
    src = np.ones(25_000_000)  # 200 MB
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        dst = src.copy()
        best = min(best, time.perf_counter() - t0)
        del dst
    memcpy_mbps = 200.0 / best if best > 0 else 0.0

    def _stat():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return sum(vals), vals[7] if len(vals) > 7 else 0

    tot0, steal0 = _stat()
    time.sleep(0.5)
    tot1, steal1 = _stat()
    dt = tot1 - tot0
    steal_pct = 100.0 * (steal1 - steal0) / dt if dt else 0.0

    # buffered disk write probe (~64 MB): BASELINE.md documents writeback
    # throttling to 26 MB/s on bad days (557 MB/s direct-IO same moment) —
    # memcpy alone does not capture that mode
    buf = b"\0" * (64 << 20)
    path = "/tmp/.bench_write_probe"
    t0 = time.perf_counter()
    with open(path, "wb") as f:
        f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    write_mbps = 64.0 / max(time.perf_counter() - t0, 1e-9)
    try:
        os.remove(path)
    except OSError:
        pass
    return {
        "host_memcpy_mbps": round(memcpy_mbps, 1),
        "host_steal_pct": round(steal_pct, 2),
        "host_write_mbps": round(write_mbps, 1),
    }


def _init_ray(num_cpus: int):
    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _mem_warm_task(batch):
    """Touch ~400MB per worker with allocator retention on: this box
    serializes COLD page faults in the kernel (74% sys time under
    concurrent first-touch), so pre-faulting each worker arena once per
    session moves every stage to warm steady state (first-call emit/merge
    measured 7-16s cold vs 0.6-2s warm)."""
    import time as _t

    import numpy as np

    from search_engine_ray.util import limit_arrow_threads

    limit_arrow_threads()
    a = np.ones(50_000_000)
    a[::4096] += 1.0
    del a
    _t.sleep(1.0)  # hold the slot so each worker process gets warmed
    return batch


def _warm_workers(num_cpus: int) -> None:
    """Spawn and memory-warm the session's worker processes before timing:
    throughput measurements target steady state, not Ray's one-time
    per-worker cold start."""
    import ray.data as rd

    rd.range(num_cpus, override_num_blocks=num_cpus).map_batches(
        _mem_warm_task, batch_format="pyarrow", num_cpus=1
    ).materialize()


def _build_synth(num_cpus: int, n_docs: int, salt_shift: int = 16) -> dict:
    """Headline: index build over the deterministic zipf corpus."""
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.synth import synth_zipf_parquet

    _warm_workers(num_cpus)
    path = synth_zipf_parquet(n_docs)
    out = f"/tmp/se_ray_bench/synth_{n_docs}_{num_cpus}"
    shutil.rmtree(out, ignore_errors=True)
    config = EngineConfig(salt_shift=salt_shift)  # merge buckets auto-sized
    pages = rd.read_parquet(path)
    t0 = time.perf_counter()
    # fused single-pass build: the headline path (docs part files written
    # as a side output of the postings-emit stage; search-identical to the
    # two-stage resumable build, tested in test_build_ray.py)
    res = build_index(
        pages, out, config, doc_id_mode="rank", resume=False, fuse=True
    )
    wall = time.perf_counter() - t0
    return {
        "out": out,
        "config": config,
        "wall_sec": wall,
        "docs_per_sec": res.n_docs / wall,
        "n_docs": res.n_docs,
        "stage_timings": res.timings,
    }


def _query_latencies(synth: dict) -> dict:
    """p50/p95 over the reference query set (conformance indexes) and
    BM25/WAND over the zipf index."""
    import numpy as np

    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.fixtures import CORPORA, pages_table
    from search_engine_ray.sources.synth import HOT_TERM

    lat = []
    per_query = {}
    for corpus, qs in REFERENCE_QUERIES.items():
        docs, config = CORPORA[corpus]
        out = f"/tmp/se_ray_bench/{corpus}"
        build_index(
            rd.from_arrow(pages_table(docs)), out, config,
            doc_id_mode="replay", fingerprint=corpus, resume=True,
        )
        s = SegmentSearcher(out, config)
        for q in qs:
            s.search(q)  # warm (cache term + docs)
            times = []
            for _ in range(10):
                t0 = time.perf_counter()
                s.search(q)
                times.append(time.perf_counter() - t0)
            m = float(np.median(times))
            per_query[f"{corpus}:{q}"] = round(m, 6)
            lat.extend(times)
    # README bench queries on the carl_friedrich corpus (closest corpus that
    # contains the phrase) — latency-only
    docs, config = CORPORA["carl_friedrich"]
    s = SegmentSearcher("/tmp/se_ray_bench/carl_friedrich", config)
    for q in README_BENCH:
        s.search(q)
        t0 = time.perf_counter()
        s.search(q)
        el = time.perf_counter() - t0
        per_query[f"bench:{q}"] = round(el, 6)
        lat.append(el)

    # zipf BM25/WAND
    zs = SegmentSearcher(synth["out"], synth["config"])
    for q, mode in [
        (f"{HOT_TERM} w3 w17", "or"),
        ("w3 w17", "and"),
        ("w100 w500 w1500", "or"),
    ]:
        zs.search_bm25(q, k=10, mode=mode)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            zs.search_bm25(q, k=10, mode=mode)
            times.append(time.perf_counter() - t0)
        per_query[f"zipf_{mode}:{q}"] = round(float(np.median(times)), 6)
        lat.extend(times)

    lat = np.array(lat)
    return {
        "per_query": per_query,
        "p50_sec": round(float(np.percentile(lat, 50)), 6),
        "p95_sec": round(float(np.percentile(lat, 95)), 6),
    }


def _batch_serving_qps(synth: dict, n_queries: int = 2000) -> dict:
    """Batch-serving THROUGHPUT (queries/sec) through the Ray Data actor
    pool (pipelines/serving.batch_search_bm25_ds): the index opens once
    per actor, term/doc LRUs amortize across each actor's queries. The
    latency section above measures one warm searcher; this measures the
    parallel path a query frontend would drive."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.serving import batch_search_bm25_ds
    from search_engine_ray.sources.synth import HOT_TERM

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in rng.integers(0, 1500, size=(n_queries, 2)).flat]
    qs = [
        f"{vocab[2*i]} {vocab[2*i+1]}" if i % 5 else f"{HOT_TERM} {vocab[2*i]}"
        for i in range(n_queries)
    ]
    # from_arrow yields ONE block — split it or the actor pool serializes
    # every query through a single actor (measured: 1 task, 4 idle actors)
    ds = rd.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(n_queries), pa.int64()),
                "query": pa.array(qs, pa.string()),
            }
        )
    ).repartition(max(8, NUM_CPUS))
    t0 = time.perf_counter()
    n_rows = batch_search_bm25_ds(
        ds, synth["out"], synth["config"], k=10, mode="or",
        concurrency=8, batch_size=32,
    ).count()
    wall = time.perf_counter() - t0
    return {
        "batch_bm25_qps": round(n_queries / wall, 1),
        "batch_bm25_wall_sec": round(wall, 3),
        "batch_bm25_result_rows": int(n_rows),
    }


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _build_documents_sf(sf_dir: str) -> dict:
    """Index build over the driver's documents table (pages-adapted), plus
    the per-round index-size metric (r4 verdict item 8): on-disk bytes of
    the varint build vs an Elias-Fano build of the SAME corpus (the
    reference ships `du -sh .index/*`, package.json:9)."""
    import ray.data as rd

    import __ray_entry__ as e
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index

    sf = sf_dir.rstrip("/")
    t0 = time.perf_counter()
    # fresh build (ignore resume cache)
    idx = e._idx_dir(sf)
    shutil.rmtree(idx, ignore_errors=True)
    e._docs_searcher(sf_dir)
    wall = time.perf_counter() - t0

    ef_out = idx + "_ef_bench"
    shutil.rmtree(ef_out, ignore_errors=True)
    pages = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(e._docs_to_pages, batch_format="pyarrow")
    t0 = time.perf_counter()
    build_index(
        pages, ef_out, EngineConfig(postings_codec="ef"),
        doc_id_mode="rank", resume=False,
    )
    ef_wall = time.perf_counter() - t0
    return {
        "wall_sec": wall,
        "ef_wall_sec": ef_wall,
        "index_bytes_varint": _dir_bytes(idx),
        "index_bytes_ef": _dir_bytes(ef_out),
    }


def _build_warc_sf(sf_dir: str) -> dict:
    """WARC-source build throughput (r4 verdict item 9): the documents
    table serialized once (untimed prep) as 8 gzipped WARC shards — the
    real crawl entry path's file-parallel shape — then timed
    warc_pages -> build_index."""
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.warc import warc_pages, write_warc

    sf = sf_dir.rstrip("/")
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    n_docs = len(ids)
    shard_dir = "/tmp/se_ray_bench/warc_shards"
    shutil.rmtree(shard_dir, ignore_errors=True)
    os.makedirs(shard_dir, exist_ok=True)
    n_shards = 8
    paths = []
    for s in range(n_shards):
        recs = [
            {
                "type": "response",
                "url": f"doc://{i}",
                "date": "2024-01-01T00:00:00Z",
                "payload": (
                    f"<html><head><title></title></head><body>{t}</body></html>"
                ).encode(),
            }
            for i, t in zip(ids[s::n_shards], texts[s::n_shards])
        ]
        p = os.path.join(shard_dir, f"shard{s}.warc.gz")
        write_warc(p, recs, compress=True)
        paths.append(p)
    out = "/tmp/se_ray_bench/warc_idx"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(
        warc_pages(paths), out, EngineConfig(), doc_id_mode="rank", resume=False
    )
    wall = time.perf_counter() - t0
    return {
        "build_warc_sf_sec": round(wall, 3),
        "warc_docs_per_sec": round(n_docs / wall, 1),
    }


def _training_data_ops(sf_dir: str) -> dict:
    """Wall time of the headline training-data pipelines at the bench SF
    (exact dedup, MinHash+LSH near-dup with join verify, ANN top-k).

    Best-of-2 per op (r4 verdict item 3): this host's epoch drift swings
    single-shot walls 2-5x, so the r4 artifact recorded minhash at 9.7 s
    while the op actually runs 2-5 s. Each value is the sorted [best,
    other] pair — the spread IS the epoch-noise error bar."""
    import __ray_entry__ as e

    out = {}
    for key in (
        "exact_dedup",
        "minhash_pairs",
        "ann_cosine_topk",
        "tumbling_window",
        "sessionize",
        "clean_corpus",
        "dedup_spans",
        "dup_clusters",
        "cluster_best",
        "vocab_stats",
        "tfidf_topk",
        "hll_users",
        "shard_export",
        "logbin_quantiles",
        "text_normalize",
        "normalize_dedup",
        "clean_index_search",
        "chunk_docs",
        "sparse_knn",
    ):
        import ray.data as rd

        walls, n = [], 0
        for _rep in range(2):
            t0 = time.perf_counter()
            res = e.queries()[key](sf_dir)
            n = res.count() if isinstance(res, rd.Dataset) else len(res)
            walls.append(time.perf_counter() - t0)
        out[f"{key}_sf_sec"] = [round(w, 2) for w in sorted(walls)]
        out[f"{key}_sf_rows"] = int(n)
    return out


def _ref50k_queries() -> dict:
    """SAME-SCALE comparison vs the reference's two published numbers
    (README.md:122-174, 50k wikipedia abstracts on a 2018 MacBook Pro:
    'philosophy psychology' 3.850 ms, '\"carl friedrich\" german'
    6.177 ms). Real abstracts are unavailable offline, so the corpus is
    synthesized to the published workload's shape with the query terms
    planted at encyclopedic document frequencies (sources/synth.py).
    Queries run on the COMPAT path (snippets included — the reference's
    returned ingress strings are part of its measured work)."""
    import numpy as np
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.synth import synth_wiki_abstracts_parquet

    path = synth_wiki_abstracts_parquet(50_000)
    out = "/tmp/se_ray_bench/ref50k"
    build_index(
        rd.read_parquet(path), out, EngineConfig(),
        doc_id_mode="rank", fingerprint="ref50k_v2", resume=True, fuse=True,
    )
    s = SegmentSearcher(out, EngineConfig())
    res = {}
    for q, ref_ms in [
        ("philosophy psychology", 3.850),
        ('"carl friedrich" german', 6.177),
    ]:
        hits = s.search(q)  # warm caches; also sanity-check result shape
        assert hits, f"ref50k query returned no hits: {q}"
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            s.search(q)
            times.append(time.perf_counter() - t0)
        # milliseconds, so the value sits unit-consistent next to :ref_ms
        res[f"ref50k:{q}:ms"] = round(float(np.median(times)) * 1000.0, 3)
        res[f"ref50k:{q}:ref_ms"] = ref_ms
        res[f"ref50k:{q}:n_hits"] = len(hits)
    return res


def run_default() -> dict:
    markers = _host_markers()
    ray = _init_ray(NUM_CPUS)
    try:
        # best-of-2 (BASELINE.md protocol): the host's noisy-neighbor drift
        # is far larger than the engine's own run variance. If the two
        # walls disagree by >25% the epoch drifted MID-bench — take one
        # adaptive third rep so best-of gets a fair shot at a clean epoch.
        reps = [_build_synth(NUM_CPUS, BENCH_DOCS), _build_synth(NUM_CPUS, BENCH_DOCS)]
        walls = [r["wall_sec"] for r in reps]
        if max(walls) / min(walls) > 1.25:
            reps.append(_build_synth(NUM_CPUS, BENCH_DOCS))
        build_walls = sorted(r["wall_sec"] for r in reps)
        synth = min(reps, key=lambda r: r["wall_sec"])
        sf_build = _build_documents_sf(SF_DIR)
        warc_build = _build_warc_sf(SF_DIR)
        td_ops = _training_data_ops(SF_DIR)
        qlat = _query_latencies(synth)
        qps = _batch_serving_qps(synth)
        ref50k = _ref50k_queries()
    finally:
        ray.shutdown()
    queries = dict(qlat["per_query"])
    queries.update(td_ops)
    queries.update(qps)
    queries.update(ref50k)
    queries.update(markers)
    queries.update(warc_build)
    queries["build_synth_walls"] = [round(w, 3) for w in build_walls]
    queries["build_synth_sec"] = round(synth["wall_sec"], 3)
    queries["build_documents_sf_sec"] = round(sf_build["wall_sec"], 3)
    queries["build_documents_ef_sec"] = round(sf_build["ef_wall_sec"], 3)
    queries["index_bytes_varint"] = int(sf_build["index_bytes_varint"])
    queries["index_bytes_ef"] = int(sf_build["index_bytes_ef"])
    queries["query_p50_sec"] = qlat["p50_sec"]
    queries["query_p95_sec"] = qlat["p95_sec"]
    queries["index_docs_per_sec"] = round(synth["docs_per_sec"], 1)
    return {
        "metric": "index-build docs/sec (synth zipf) + query p95 over reference query set",
        "value": round(synth["wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": synth["n_docs"],
    }


def run_build_only(num_cpus: int) -> dict:
    markers = _host_markers()
    ray = _init_ray(num_cpus)
    try:
        synth = _build_synth(num_cpus, BENCH_DOCS)
    finally:
        ray.shutdown()
    return {
        "num_cpus": num_cpus,
        "n_docs": synth["n_docs"],
        "wall_sec": round(synth["wall_sec"], 3),
        "docs_per_sec": round(synth["docs_per_sec"], 1),
        "stage_timings": {k: round(v, 3) for k, v in synth["stage_timings"].items()},
        **markers,
    }


def _ceil_worker(kind: str, secs: float) -> float:
    """One ceiling-probe worker: returns work units done in ~secs.
    kind='cpu' -> integer numpy spin on a cache-resident array (no memory
    traffic); kind='mem' -> 100 MB numpy copies (pure bus bandwidth)."""
    import time as _t

    import numpy as np

    if kind == "cpu":
        a = np.arange(4096, dtype=np.int64)  # 32 KB: L1-resident
        n = 0
        end = _t.perf_counter() + secs
        while _t.perf_counter() < end:
            a = (a * 6364136223846793005 + 1442695040888963407) & 0x7FFFFFFF
            n += len(a)
        return float(n)
    src = np.ones(12_500_000)  # 100 MB
    dst = np.empty_like(src)
    np.copyto(dst, src)  # untimed: fault dst pages outside the window
    n = 0
    end = _t.perf_counter() + secs
    while _t.perf_counter() < end:
        np.copyto(dst, src)
        n += 1
    return float(n * src.nbytes)


def _host_ceilings(secs: float = 2.0) -> dict:
    """Measure the SAME-EPOCH scaling ceiling of trivially-parallel work on
    this host: run the cpu-spin and memcpy probes at 8 and 32 processes
    and report E = (rate32/rate8)/4 for each. A Ray pipeline mixing
    compute and memory traffic cannot scale above a blend of these two
    numbers on ONE box (BASELINE.md quantifies the mechanism; on a real
    4N-node cluster per-node bandwidth is constant and E_mem rises to
    ~E_cpu). Embedded here so every scaling record carries its own
    attainability bound."""
    from concurrent.futures import ProcessPoolExecutor

    def one(kind: str, procs: int) -> float:
        with ProcessPoolExecutor(max_workers=procs) as ex:
            vals = list(ex.map(_ceil_worker, [kind] * procs, [secs] * procs))
        return sum(vals) / secs

    # the host's epoch drift is bimodal at minute scale (BASELINE.md), so
    # mirror the main protocol: interleave (8, 32) pairs, report per-pair
    # E and the best pair — a cross-epoch pair shows up as an outlier E
    out = {}
    for kind in ("cpu", "mem"):
        pairs = []
        raw8, raw32 = [], []
        for _ in range(2):
            r8 = one(kind, 8)
            r32 = one(kind, 32)
            raw8.append(round(r8 / 1e9, 2))
            raw32.append(round(r32 / 1e9, 2))
            pairs.append(round((r32 / r8) / 4.0, 3))
        out[f"host_ceiling_{kind}_E_pairs"] = pairs
        out[f"host_ceiling_{kind}_rate8"] = raw8
        out[f"host_ceiling_{kind}_rate32"] = raw32
    return out


def run_scaling() -> dict:
    """Fresh process per parallelism level (the two-cluster-size evidence)."""
    # the host's run-to-run drift reaches 2x+ over minutes and hits the
    # 32-CPU side far harder than the 8-CPU side (measured: 8-CPU walls
    # stable +-1% while 32-CPU walls swing 2.7x within ONE interleaved
    # run; see BASELINE.md "Host-state markers") — INTERLEAVE the levels
    # (8,32,8,32,...) so a drift epoch hits both sides, report every
    # run, and take the best fresh process per level
    results = {}
    all_runs = {8: [], 32: []}
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    for _rep in range(reps):
        for cpus in (8, 32):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            env["GRAFT_BENCH_DOCS"] = str(SCALING_DOCS)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--build-only", str(cpus)],
                capture_output=True, text=True, env=env, cwd=REPO,
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if out.returncode != 0 or not lines:
                raise RuntimeError(
                    f"scaling child (cpus={cpus}) failed rc={out.returncode}; "
                    f"stdout tail={out.stdout[-500:]!r} stderr tail={out.stderr[-2000:]!r}"
                )
            r = json.loads(lines[-1])
            all_runs[cpus].append(r)
            best = results.get(cpus)
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                results[cpus] = r
    r8 = results[8]["docs_per_sec"]
    r32 = results[32]["docs_per_sec"]
    eff = (r32 / r8) / 4.0
    # per-rep SAME-EPOCH pairing: each rep runs 8 then 32 back-to-back, so
    # the pair shares one host-drift epoch. Best-of-per-level can pair a
    # lucky 8-CPU epoch against a different 32-CPU epoch and understate E
    # on this drifting host; the pairwise read-out is the epoch-controlled
    # estimator (both are reported, best-of stays the headline value for
    # continuity with earlier rounds).
    pair_eff = [
        round((b["docs_per_sec"] / a["docs_per_sec"]) / 4.0, 3)
        for a, b in zip(all_runs[8], all_runs[32])
    ]
    return {
        "metric": "index-build scaling efficiency, 8 -> 32 CPUs (N vs 4N substitute)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "pair_efficiencies": pair_eff,
            "best_pair_efficiency": max(pair_eff) if pair_eff else None,
            "docs_per_sec_8cpu": r8,
            "docs_per_sec_32cpu": r32,
            "wall_sec_8cpu": results[8]["wall_sec"],
            "wall_sec_32cpu": results[32]["wall_sec"],
            "all_docs_per_sec_8cpu": [r["docs_per_sec"] for r in all_runs[8]],
            "all_docs_per_sec_32cpu": [r["docs_per_sec"] for r in all_runs[32]],
            "host_memcpy_mbps_8cpu": results[8].get("host_memcpy_mbps"),
            "host_memcpy_mbps_32cpu": results[32].get("host_memcpy_mbps"),
            "host_steal_pct_8cpu": results[8].get("host_steal_pct"),
            "host_steal_pct_32cpu": results[32].get("host_steal_pct"),
            "host_write_mbps_8cpu": results[8].get("host_write_mbps"),
            "host_write_mbps_32cpu": results[32].get("host_write_mbps"),
            # measured in the same epoch as the LAST rep pair: the E this
            # host allows trivially-parallel work (see _host_ceilings)
            **_host_ceilings(),
        },
        "sf": SF_DIR,
        "num_cpus": 32,
        "bench_docs": results[32]["n_docs"],
    }


def _compact(res: dict) -> dict:
    """Shrink the stdout JSON line under the driver's 2000-char tail
    buffer (BENCH_r03 overflowed it and recorded parsed=null): drop the
    per-query reference micro-latencies (summarized by query_p50/p95),
    row-count echoes and hit counts. The FULL result goes to stderr."""
    q = res.get("queries", {})
    drop_prefixes = ("planets:", "carl_friedrich:", "haber:", "star:", "bench:")
    slim = {
        k: v
        for k, v in q.items()
        if not k.startswith(drop_prefixes)
        and not k.endswith(("_rows", ":n_hits"))
    }
    return {**res, "queries": slim}


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--build-only":
        print(json.dumps(run_build_only(int(sys.argv[2]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        full = run_default()
        print("BENCH_FULL " + json.dumps(full), file=sys.stderr)
        line = json.dumps(_compact(full))
        if len(line) > 1900:  # last-resort: detail already on stderr
            full["queries"] = {
                k: full["queries"][k]
                for k in (
                    "build_synth_sec",
                    "build_documents_sf_sec",
                    "query_p50_sec",
                    "query_p95_sec",
                    "index_docs_per_sec",
                )
                if k in full["queries"]
            }
            line = json.dumps(full)
        print(line)
