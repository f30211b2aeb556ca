"""The index-build pipeline — Ray-Data-first (SURVEY §3.4, §7).

    read_parquet(pages)                      # column-pruned at the read
      -> repartition(~2 blocks/CPU)          # task granularity == cluster
      -> map_batches(extract_batch)          # html -> title/text (RE2)
      -> [map_batches(skip_filter_batch)]    # reference S2 skip rules
      -> doc_id assignment                   # rank (scale) | replay (compat)
      -> map_batches(tokenize_docs_batch)    # stateless vectorized tasks
      -> sort(doc_id) -> write_parquet       # checkpoint #1: doc store,
                                             #   range-partitioned by doc_id
    [sample df pre-pass]                     # hot terms to salt (skew)
    read_parquet(out/docs, 3 cols)
      -> map_batches(emit_postings_batch)    # partial agg (combiner):
                                             #   (term,salt)-keyed sorted runs
      -> write_parquet(partition_cols=[bucket])   # DISK map-side shuffle
    per-bucket merge tasks                   # vectorized merge+delta-varint
      -> write_parquet(out/segments)         # checkpoint #2: the index
    term_dict.parquet + manifest.json        # lookup sidecar + lineage

Design notes for cluster scale:
- The only all-to-all exchange is the bucket-partitioned shuffle write;
  emit pre-aggregates per batch so hot terms ship one row per (batch,
  salt-bucket), and globally-hot terms (sampled df pre-pass) are salted by
  doc_id range into disjoint runs that readers concatenate — no second
  shuffle. Sort-based groupby and Ray 2.49 HASH_SHUFFLE were both measured
  and rejected for this stage (see git history).
- Both stage outputs are directories of part files with fingerprinted
  manifests; a re-run with the same fingerprint skips completed stages and
  the on-disk shuffle is itself restartable.
- doc_id assignment: at crawl scale ranks are unique by construction
  (doc_id = rank, a pure map); compat mode replays the reference's
  sequential getSeed over the (url, rank) pairs driver-side — O(corpus)
  but only used for conformance corpora (SURVEY §7.3.1).
- Memory behavior is load-bearing: stateless map tasks + allocator
  retention (util.limit_arrow_threads) + >1 CPU slots for memory-heavy
  tasks; this host serializes cold page faults in the kernel past ~8-16
  concurrent memory-streaming processes.
"""

from __future__ import annotations

import os
import posixpath
import shutil
import time
import dataclasses
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from search_engine_ray.config import EngineConfig
from search_engine_ray.stages.extract import extract_batch, skip_filter_batch
from search_engine_ray.stages.postings import (
    emit_postings_batch,
    partial_df_batch,
    tokenize_docs_batch,
)
from search_engine_ray.state import fsio
from search_engine_ray.state.index import replay_seed_assignment
from search_engine_ray.state.segments import (
    SEGMENT_SCHEMA,
    CorpusStats,
    make_bucket_merge_encode,
    manifest_valid,
    parquet_files,
    write_manifest,
)

DOCS_COLUMNS = ["doc_id", "url", "title", "tokens", "dl"]

#: Doc-store parquet row-group size. Docs are doc_id-sorted, so the row
#: group is the POINT-READ pruning unit: a top-k doc fetch with
#: filters=[("doc_id","in",ids)] decodes only the groups whose min/max
#: straddle a wanted id. One-group files (the pyarrow default for our
#: ~16k-row parts) made every fetch decode whole files incl. the tokens
#: column — measured 1.2 s per query at a 500k-doc store; 2048-row groups
#: cut the fetch to the ~k groups that actually match.
DOCS_ROW_GROUP_ROWS = 2048


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    avgdl: float
    n_postings_rows: int
    timings: dict[str, float]


def _default_concurrency() -> int:
    from search_engine_ray.util import default_pool_size

    return default_pool_size()


def _narrow_view(pages: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Column-pruned view of ``pages``: when the dataset is a PURE parquet
    read (no transforms — verified on the logical plan), re-read only
    ``cols`` straight from the source files; Ray does not push a
    select_columns projection into ReadParquet, so the generic path decodes
    every column (measured 6.1s vs 1.6s for the url column at 2M docs)."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read

        dag = pages._plan._logical_plan.dag
        if isinstance(dag, Read):
            files = pages.input_files()
            if files and all(".parquet" in f for f in files):
                schema_names = pq.read_schema(files[0]).names
                if all(c in schema_names for c in cols):
                    return rd.read_parquet(files, columns=cols)
    except Exception:
        pass
    return pages.select_columns(cols)


def _split_input(
    pages: rd.Dataset, n_blocks: int, est_rows: int | None
) -> rd.Dataset:
    """Right-size INPUT task granularity without a barrier.

    ``repartition(num_blocks)`` is an all-to-all: it materializes the whole
    html-laden input through the object store before the first extract task
    runs — fine at bench scale, a scale-killer on a 100 TB crawl. The
    streaming repartition (``target_num_rows_per_block``, planned as a Map
    operator) only SPLITS oversized blocks as they stream past, which is
    all the build needs: task parallelism ∝ blocks, no corpus rewrite.
    Inputs that arrive as many tiny blocks stay tiny (more, smaller tasks —
    harmless); exact coalescing is never needed here. Falls back to the
    barrier repartition when no row estimate is available."""
    if not est_rows:
        return pages.repartition(n_blocks)
    target = max(1, est_rows // n_blocks)
    try:
        return pages.repartition(target_num_rows_per_block=target)
    except TypeError:  # Ray without the streaming mode
        return pages.repartition(n_blocks)


# above this many (url_hash, count) rows the tree-reduce table no longer
# fits one task; the url dedup falls back to the disk bucket shuffle
# (module-level so tests can force the crawl-scale path on small data)
_URL_DEDUP_TREE_MAX_ROWS = 64_000_000


def _dedup_duplicate_urls(
    pages: rd.Dataset,
    scratch_base: str | None = None,
) -> tuple[rd.Dataset, int]:
    """Exact URL dedup in the batch build (SURVEY D2): keep ONE row per url,
    winner = lexicographic min over whichever of (warc_ts, add_order, rank)
    exist — the reference throws on a duplicate add (engine.ts:56-58) and
    its demo driver skips (demo.ts:129-131); batch-build semantics is the
    demo's skip with a deterministic winner.

    Cost model: the corpus-sized pass ships only per-batch (url_hash,
    count) partials (~16 bytes per distinct url per batch); candidate
    duplicate HASHES come out of a tree-reduce (or the disk bucket shuffle
    past 64M distinct urls). Winner resolution is FULLY DISTRIBUTED: a
    second narrow pass emits per-batch lexicographic-min (h1, h2, keys)
    partials for candidate rows only, tree-reduced to one winner row per
    duplicated url — no row data ever reaches the driver. Urls are keyed
    by the 128-bit (h1, h2) double hash (collision odds ~n²/2^129;
    single-hash false positives drop out because their (h1,h2) group count
    is 1). The winner table — a few aligned int64 numpy arrays, ~8(2+k)
    bytes per duplicated url — is broadcast (ray.put) to a vectorized
    searchsorted-compare filter. A corpus with no duplicate urls pays only
    the hash-count pass.

    Returns (filtered_pages, n_skipped_duplicate_rows)."""
    from search_engine_ray.stages.postings import (
        _hash_utf8_array,
        _hash_utf8_array_tab,
    )

    schema_names = pages.schema().names
    key_cols = [c for c in ("warc_ts", "add_order", "rank") if c in schema_names]
    n_buckets = 64

    def _url_hashes(batch: pa.Table) -> np.ndarray:
        arr = batch.column("url")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return _hash_utf8_array(arr)

    def partial_hash_counts(batch: pa.Table) -> pa.Table:
        h = _url_hashes(batch)
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "h": pa.array(uh, pa.uint64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def combine_partials(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        if not len(h):
            return batch
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(h)
        h, cnt = h[order], cnt[order]
        new = np.empty(len(h), dtype=bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        uh = h[starts]
        return pa.table(
            {
                "bucket": pa.array(
                    (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "h": pa.array(uh, pa.uint64()),
                "cnt": pa.array(np.add.reduceat(cnt, starts), pa.int64()),
            }
        )

    # per-batch (url_hash, count) partials, coalesced into a handful of
    # blocks and combined (a sort-based groupby for this count measured 44s
    # at 500k docs on this host; writing the raw partials straight to a
    # Hive-partitioned shuffle created input_blocks x n_buckets tiny files,
    # ~20s of file creation that got WORSE with more CPUs).
    combined = (
        _narrow_view(pages, ["url"])
        .map_batches(partial_hash_counts, batch_format="pyarrow")
        .repartition(8)
        .map_batches(combine_partials, batch_format="pyarrow")
    )
    # materialize ONCE: to_arrow_refs on a lazy dataset re-executes the
    # plan a second time for schema inference (measured: the whole count
    # pass ran twice, ~7s each at 2M docs)
    combined = combined.materialize()
    refs = combined.to_arrow_refs()
    sizes = ray.get([_block_rows_build.remote(r) for r in refs])
    total_rows = sum(sizes)

    if total_rows <= _URL_DEDUP_TREE_MAX_ROWS:
        # tree-reduce in the object store: pairwise sorted-merge of the
        # (h, cnt) tables (~16 bytes/distinct url — 64M rows ~ 1 GB), dup
        # hashes extracted in the final task. No files at all.
        live = [r for r, n in zip(refs, sizes) if n]
        while len(live) > 1:
            nxt = []
            for i in range(0, len(live) - 1, 2):
                nxt.append(_merge_hash_counts.remote(live[i], live[i + 1]))
            if len(live) % 2:
                nxt.append(live[-1])
            live = nxt
        cand = (
            ray.get(_dup_hashes_of.remote(live[0]))
            if live
            else np.zeros(0, np.uint64)
        )
    else:
        # crawl scale: the distinct-hash table no longer fits one task —
        # fall back to the disk bucket shuffle + per-bucket dup scan.
        # Scratch must be node-shared (emit tasks write bucket files and
        # the driver + scan tasks read them back from any node): prefer the
        # caller's shared storage (the build threads its out_dir through
        # scratch_base, mirroring _shuffle_dir_for); SE_RAY_SHUFFLE_BASE
        # overrides; /tmp only as the single-node last resort. All values
        # may be paths or pyarrow.fs URIs, routed through fsio.
        base = os.environ.get("SE_RAY_SHUFFLE_BASE") or scratch_base
        if base is None:
            # node-local /tmp silently LOSES duplicates on a multi-node
            # cluster (each node's scan sees only its own bucket files) —
            # fail loudly instead of deduping wrong.
            alive = [n for n in ray.nodes() if n.get("Alive")]
            if len(alive) > 1:
                raise RuntimeError(
                    "url dedup disk-shuffle fallback needs node-shared "
                    "scratch on a multi-node cluster: pass scratch_dir "
                    "(e.g. the index out_dir) or set SE_RAY_SHUFFLE_BASE"
                )
            base = "/tmp/se_ray_url_dedup"
        shuffle_dir = fsio.join(
            base,
            f"ud_{os.getpid()}_{int(time.time() * 1e6) & 0xFFFFFF}",
        )
        fsio.rmtree(shuffle_dir)
        rd.from_arrow_refs(refs).write_parquet(
            shuffle_dir, partition_cols=["bucket"]
        )
        bucket_dirs = sorted(
            fsio.join(shuffle_dir, d)
            for d in fsio.listdir(shuffle_dir)
            if d.startswith("bucket=")
        )

        def find_dup_hashes(batch: pa.Table) -> pa.Table:
            out = []
            for d in batch.column("dir").to_pylist():
                tbl = fsio.read_parquet_table(parquet_files(d), columns=["h", "cnt"])
                h = tbl.column("h").to_numpy(zero_copy_only=False)
                if not len(h):
                    continue
                cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)
                order = np.argsort(h)
                h, cnt = h[order], cnt[order]
                new = np.empty(len(h), dtype=bool)
                new[0] = True
                new[1:] = h[1:] != h[:-1]
                starts = np.flatnonzero(new)
                sums = np.add.reduceat(cnt, starts)
                dups = h[starts][sums > 1]
                if len(dups):
                    out.append(pa.table({"h": pa.array(dups, pa.uint64())}))
            if not out:
                return pa.table({"h": pa.array([], pa.uint64())})
            return pa.concat_tables(out)

        dup_hash_rows = (
            rd.from_items([{"dir": d} for d in bucket_dirs])
            .map_batches(find_dup_hashes, batch_format="pyarrow", batch_size=8)
            .take_all()
            if bucket_dirs
            else []
        )
        fsio.rmtree(shuffle_dir)
        cand = np.sort(
            np.array([r["h"] for r in dup_hash_rows], dtype=np.uint64)
        )
    if not len(cand):
        return pages, 0
    cand_ref = ray.put(cand)

    # --- distributed winner resolution: one more narrow pass over the
    # candidate rows only, emitting per-batch lexicographic-min partials
    # keyed by the 128-bit (h1, h2) url hash; tree-reduced in the object
    # store. No row data touches the driver.
    def _second_hashes(arr: pa.Array) -> np.ndarray:
        # tabulation-style hash: structurally independent of h1's
        # polynomial scheme (a joint adversarial collision would need to
        # solve two unrelated algebraic systems at once)
        return _hash_utf8_array_tab(arr)

    kn = [f"k{i}" for i in range(len(key_cols))]
    empty_winners = pa.table(
        {
            "h1": pa.array([], pa.uint64()),
            "h2": pa.array([], pa.uint64()),
            "cnt": pa.array([], pa.int64()),
            **{n: pa.array([], pa.int64()) for n in kn},
        }
    )

    def partial_winners(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        h = _url_hashes(batch)
        pos = np.minimum(np.searchsorted(c, h), len(c) - 1)
        m = c[pos] == h
        if not m.any():
            return empty_winners
        sub = batch.filter(pa.array(m))
        urls = sub.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        keys = [
            sub.column(kc).cast(pa.int64()).to_numpy(zero_copy_only=False)
            for kc in key_cols
        ]
        h1, h2, cnt, ks = _winner_reduce(
            h[m],
            _second_hashes(urls),
            np.ones(int(m.sum()), np.int64),
            keys,
        )
        return pa.table(
            {
                "h1": pa.array(h1, pa.uint64()),
                "h2": pa.array(h2, pa.uint64()),
                "cnt": pa.array(cnt, pa.int64()),
                **{n: pa.array(k, pa.int64()) for n, k in zip(kn, ks)},
            }
        )

    partials = (
        _narrow_view(pages, ["url", *key_cols])
        .map_batches(partial_winners, batch_format="pyarrow")
        .materialize()
    )
    wrefs = partials.to_arrow_refs()
    wsizes = ray.get([_block_rows_build.remote(r) for r in wrefs])
    live = [r for r, n in zip(wrefs, wsizes) if n]
    while len(live) > 1:
        nxt = []
        for i in range(0, len(live) - 1, 2):
            nxt.append(_merge_winner_tables.remote(live[i], live[i + 1]))
        if len(live) % 2:
            nxt.append(live[-1])
        live = nxt
    win = ray.get(live[0]) if live else empty_winners
    cnt = win.column("cnt").to_numpy(zero_copy_only=False)
    dup = cnt > 1  # (h1,h2) groups with one row were h1-only false positives
    if not dup.any():
        return pages, 0
    n_skipped = int((cnt[dup] - 1).sum())
    w_h1 = win.column("h1").to_numpy(zero_copy_only=False)[dup]
    w_h2 = win.column("h2").to_numpy(zero_copy_only=False)[dup]
    w_keys = [
        win.column(n).to_numpy(zero_copy_only=False)[dup] for n in kn
    ]
    winners_ref = ray.put((w_h1, w_h2, w_keys))

    def keep_winner(batch: pa.Table) -> pa.Table:
        W1, W2, WK = ray.get(winners_ref)
        h1 = _url_hashes(batch)
        left = np.searchsorted(W1, h1, side="left")
        right = np.searchsorted(W1, h1, side="right")
        found = right > left
        if not found.any():
            return batch
        idxf = np.flatnonzero(found)
        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        h2 = _second_hashes(urls.take(pa.array(idxf, pa.int64())))
        l, r = left[idxf], right[idxf]
        match = np.full(len(idxf), -1, np.int64)
        uniq = (r - l) == 1  # W1 is unique except under true h1 collisions
        ui = np.flatnonzero(uniq)
        ci = l[ui]
        ok = W2[ci] == h2[ui]
        match[ui[ok]] = ci[ok]
        for j in np.flatnonzero(~uniq):  # rare: h1 collision inside W
            span = np.flatnonzero(W2[l[j] : r[j]] == h2[j])
            if len(span):
                match[j] = l[j] + int(span[0])
        has = match >= 0
        if not has.any():
            return batch
        rows = idxf[has]
        wi = match[has]
        surv = np.ones(len(rows), dtype=bool)
        take = pa.array(rows, pa.int64())
        for kc, wk in zip(key_cols, WK):
            col = batch.column(kc)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.take(take).cast(pa.int64()).to_numpy(zero_copy_only=False)
            surv &= v == wk[wi]
        keep = np.ones(batch.num_rows, dtype=bool)
        keep[rows] = surv
        return batch.filter(pa.array(keep))

    return pages.map_batches(keep_winner, batch_format="pyarrow"), n_skipped


def skip_consecutive_dup_urls_ds(
    pages: rd.Dataset, key_col: str = "url", order_col: str = "add_order"
) -> rd.Dataset:
    """Streaming consecutive-duplicate skip — reference demo parity
    (demo.ts:129-131: while streaming adds, skip a page whose url equals
    the IMMEDIATELY PRECEDING add's url; non-adjacent duplicates pass,
    unlike the batch ``url_dedup_ds``).

    Contract: ``order_col`` is the dense add order (0..n-1) — each row's
    predecessor is order-1, so "previous add" is a SHIFT-JOIN: the narrow
    (order, key-hash) view joins its own (order+1)-shifted copy on order
    (two int64 columns through Ray's native hash join — keys only, never
    page payloads), equal 128-bit double hashes mark drops, and the drop
    set anti-joins back onto the full rows. No driver-side row data; both
    shuffles are int64-pair exchanges. SQL mirror: lag(key) OVER (ORDER BY
    order)."""
    from search_engine_ray.stages.postings import (
        _hash_utf8_array,
        _hash_utf8_array_tab,
    )

    def hashes(shift: int):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            h1 = _hash_utf8_array(keys)
            h2 = _hash_utf8_array_tab(keys)
            order = batch.column(order_col).cast(pa.int64())
            if shift:
                order = pc.add(order, shift)
            suffix = "p" if shift else ""
            return pa.table(
                {
                    order_col: order,
                    f"h1{suffix}": pa.array(h1, pa.uint64()),
                    f"h2{suffix}": pa.array(h2, pa.uint64()),
                }
            )

        return f

    narrow = pages.select_columns([key_col, order_col])
    cur = narrow.map_batches(hashes(0), batch_format="pyarrow")
    prev = narrow.map_batches(hashes(1), batch_format="pyarrow")
    drops = (
        cur.join(
            prev,
            join_type="inner",
            num_partitions=16,
            on=(order_col,),
        )
        .filter(expr="h1 == h1p and h2 == h2p")
        .select_columns([order_col])
    )
    # Ray 2.49's Acero join crashes on ANY empty input block and the dup
    # filter empties blocks wherever a partition had no adjacent dups —
    # pin blocks and add an order=-1 sentinel (matches no real row, so the
    # anti join silently ignores it).
    from search_engine_ray.pipelines.dedup import _pin_blocks

    drop_schema = pa.schema([(order_col, pa.int64())])
    drops, _ = _pin_blocks(
        drops.union(
            rd.from_arrow(pa.table({order_col: pa.array([-1], pa.int64())}))
        ),
        drop_schema,
    )
    # anti-join the full rows against the drop set via the native shuffle
    # join (the drop set is ~dup-rate x corpus — too big to broadcast)
    from search_engine_ray.pipelines.relational import shuffle_semi_anti_join

    return shuffle_semi_anti_join(pages, drops, on=order_col, anti=True)


def url_dedup_ds(
    pages: rd.Dataset, scratch_dir: str | None = None
) -> rd.Dataset:
    """Public D2 operator: one surviving row per url with a deterministic
    winner — min (warc_ts, add_order, rank) over whichever exist (the
    reference throws on duplicate adds, engine.ts:56-58; its demo driver
    skips, demo.ts:129-131). Same machinery the batch build runs when
    ``dedup_urls=True``. On a multi-node cluster pass ``scratch_dir``
    (shared path/URI) or set SE_RAY_SHUFFLE_BASE so the >64M-distinct-url
    disk-shuffle fallback lands on node-shared storage."""
    kept, _ = _dedup_duplicate_urls(pages, scratch_base=scratch_dir)
    return kept


def _assign_doc_ids_rank(batch: pa.Table) -> pa.Table:
    return batch.append_column("doc_id", pc.cast(batch.column("rank"), pa.int64()))


class _ReplayDocIds:
    """Compat doc_id mapper: broadcast url->doc_id dict (ray.put once)."""

    def __init__(self, mapping_ref) -> None:
        self.mapping = ray.get(mapping_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        ids = pa.array([self.mapping[u] for u in urls], pa.int64())
        return batch.append_column("doc_id", ids)


def _compat_replay_mapping(pages: rd.Dataset) -> dict[str, int]:
    """Driver-side getSeed replay over (url, rank) in add order.

    Deliberately materializes ONLY two narrow columns; used for conformance
    corpora (thousands of rows), never the scale path."""
    cols = pages.select_columns(["url", "rank", "add_order"]).take_all()
    cols.sort(key=lambda r: r["add_order"])
    ranks = [int(r["rank"]) for r in cols]
    ids = replay_seed_assignment(ranks)
    return {r["url"]: i for r, i in zip(cols, ids)}


@ray.remote
def _block_rows_build(t: pa.Table) -> int:
    return t.num_rows


# (the former second polynomial _URL_H2_POLY is gone: h2 now comes from
# _hash_utf8_array_tab, a tabulation-style hash structurally independent
# of h1's polynomial scheme)


def _winner_reduce(
    h1: np.ndarray, h2: np.ndarray, cnt: np.ndarray, keys: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray]]:
    """Group rows by (h1, h2); per group keep the LEXICOGRAPHIC-MIN key
    tuple and the summed count. Pure numpy (lexsort + reduceat) — the one
    combiner both the per-batch partials and the tree-reduce merge use, so
    associativity is by construction. Output sorted by (h1, h2)."""
    order = np.lexsort(tuple(reversed([h1, h2, *keys])))
    h1, h2, cnt = h1[order], h2[order], cnt[order]
    keys = [k[order] for k in keys]
    new = np.empty(len(h1), dtype=bool)
    new[0] = True
    new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    starts = np.flatnonzero(new)
    return (
        h1[starts],
        h2[starts],
        np.add.reduceat(cnt, starts),
        [k[starts] for k in keys],
    )


@ray.remote
def _merge_winner_tables(a: pa.Table, b: pa.Table) -> pa.Table:
    """Tree-reduce step for url-dedup winner partials."""
    t = pa.concat_tables([a, b])
    kn = [n for n in t.column_names if n.startswith("k")]
    h1, h2, cnt, ks = _winner_reduce(
        t.column("h1").to_numpy(zero_copy_only=False),
        t.column("h2").to_numpy(zero_copy_only=False),
        t.column("cnt").to_numpy(zero_copy_only=False),
        [t.column(n).to_numpy(zero_copy_only=False) for n in kn],
    )
    return pa.table(
        {
            "h1": pa.array(h1, pa.uint64()),
            "h2": pa.array(h2, pa.uint64()),
            "cnt": pa.array(cnt, pa.int64()),
            **{n: pa.array(k, pa.int64()) for n, k in zip(kn, ks)},
        }
    )


@ray.remote
def _merge_hash_counts(a: pa.Table, b: pa.Table) -> pa.Table:
    """Sum counts of two (h, cnt) tables (tree-reduce step)."""
    h = np.concatenate(
        [
            a.column("h").to_numpy(zero_copy_only=False),
            b.column("h").to_numpy(zero_copy_only=False),
        ]
    )
    cnt = np.concatenate(
        [
            a.column("cnt").to_numpy(zero_copy_only=False),
            b.column("cnt").to_numpy(zero_copy_only=False),
        ]
    )
    order = np.argsort(h)
    h, cnt = h[order], cnt[order]
    new = np.empty(len(h), dtype=bool)
    new[0] = True
    new[1:] = h[1:] != h[:-1]
    starts = np.flatnonzero(new)
    return pa.table(
        {
            "h": pa.array(h[starts], pa.uint64()),
            "cnt": pa.array(np.add.reduceat(cnt, starts), pa.int64()),
        }
    )


@ray.remote
def _dup_hashes_of(t: pa.Table) -> np.ndarray:
    h = t.column("h").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    return np.sort(h[cnt > 1]).astype(np.uint64)


@ray.remote
def _sample_pdf_task(path: str, n_rows: int, config: EngineConfig):
    """(rows_sampled, partial-df table) over the first n_rows of one docs
    part file — the hot-term sample pre-pass, off the driver."""
    from search_engine_ray.state import fsio
    from search_engine_ray.util import limit_arrow_threads

    limit_arrow_threads()
    tbl = fsio.read_parquet_table(path, columns=["tokens"])
    n = min(n_rows, tbl.num_rows)
    return n, partial_df_batch(tbl.slice(0, n), config)


@ray.remote(num_cpus=0)
class _DocStatsAcc:
    """Exact (n_docs, sum_dl) accumulated by the fused build's map tasks —
    corpus stats land as a side effect of the single pass, no footer scan
    or dl-column re-read."""

    def __init__(self) -> None:
        self.n = 0
        self.sum_dl = 0

    def add(self, n: int, sum_dl: int) -> None:
        self.n += int(n)
        self.sum_dl += int(sum_dl)

    def get(self) -> tuple[int, int]:
        return self.n, self.sum_dl


@ray.remote(num_cpus=0)
class StageCounters:
    """Per-stage skipped/error row counters (the reference's skip counters,
    demo.ts:100,124). Filter stages fire-and-forget increments; the driver
    reads the totals after the stage's write barrier and records them in the
    manifest — no extra pass over the data."""

    def __init__(self) -> None:
        self._c: dict[str, int] = {}

    def add(self, key: str, n: int) -> None:
        self._c[key] = self._c.get(key, 0) + int(n)

    def get(self) -> dict[str, int]:
        return dict(self._c)


def _counting(stage_fn, counters, key: str):
    """Wrap a filtering batch fn so dropped-row counts reach ``counters``."""

    def wrapped(batch: pa.Table) -> pa.Table:
        out = stage_fn(batch)
        dropped = batch.num_rows - out.num_rows
        if dropped:
            # synchronous: a fire-and-forget add could land AFTER the
            # driver reads totals at the write barrier. Only batches that
            # actually drop rows pay the round-trip.
            ray.get(counters.add.remote(key, dropped))
        return out

    return wrapped


def _resolve_heavy_cpus() -> float:
    """CPU slots for memory-streaming tasks: this host's kernel serializes
    cold page faults past ~16 concurrent memory-heavy processes."""
    env_heavy = os.environ.get("SE_RAY_HEAVY_TASK_CPUS")
    if env_heavy is not None:
        return float(env_heavy)
    try:
        _cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        _cpus = 4
    return max(1.0, round(_cpus / 16))


def _shuffle_dir_for(out_dir: str) -> str:
    """Scratch directory for the disk map-side shuffle.

    MUST be visible to every node: emit tasks write bucket files and merge
    tasks (scheduled anywhere) read them back. Default is ``out_dir/shuffle``
    — the same (shared) storage the durable index lands on, local path or
    pyarrow.fs URI alike. ``SE_RAY_SHUFFLE_BASE`` overrides it (e.g. a
    faster shared scratch tier, or plain /tmp when the whole job is one
    node); it may itself be a URI. All access below goes through
    ``state.fsio``, never node-local ``os`` calls."""
    base = os.environ.get("SE_RAY_SHUFFLE_BASE")
    if base is None:
        return fsio.join(out_dir, "shuffle")
    return fsio.join(
        base, posixpath.basename(out_dir.rstrip("/")) + "_shuffle"
    )


def _shuffle_write(
    postings: rd.Dataset, out_dir: str, timings: dict[str, float]
) -> tuple[str, list[str]]:
    """Execute the disk map-side shuffle; returns (shuffle_dir, bucket dirs).
    This is the stage barrier — side-effect accumulators (doc stats, skip
    counters) are final once it returns."""
    shuffle_dir = _shuffle_dir_for(out_dir)
    fsio.rmtree(shuffle_dir)
    t_pipe = time.perf_counter()
    postings.write_parquet(shuffle_dir, partition_cols=["bucket"])
    timings["shuffle_write"] = time.perf_counter() - t_pipe
    # an all-empty postings stream writes nothing at all
    if not fsio.isdir(shuffle_dir):
        return shuffle_dir, []
    bucket_dirs = sorted(
        fsio.join(shuffle_dir, d)
        for d in fsio.listdir(shuffle_dir)
        if d.startswith("bucket=")
    )
    return shuffle_dir, bucket_dirs


def _merge_postings_to_segments(
    postings: rd.Dataset,
    stats: CorpusStats,
    config: EngineConfig,
    out_dir: str,
    heavy_cpus: float,
    timings: dict[str, float],
) -> None:
    """Disk map-side shuffle of emit-schema postings rows -> per-bucket
    merge+encode tasks writing ``out_dir/segments`` with the term dict as a
    merge-task side output under ``out_dir/term_dict``. Shared by the batch
    build and generation compaction."""
    shuffle_dir, bucket_dirs = _shuffle_write(postings, out_dir, timings)
    _merge_buckets(shuffle_dir, bucket_dirs, stats, config, out_dir, heavy_cpus, timings)


def _merge_buckets(
    shuffle_dir: str,
    bucket_dirs: list[str],
    stats: CorpusStats,
    config: EngineConfig,
    out_dir: str,
    heavy_cpus: float,
    timings: dict[str, float],
) -> None:
    seg_dir = fsio.join(out_dir, "segments")
    t_pipe = time.perf_counter()
    term_dict_dir = fsio.join(out_dir, "term_dict")
    fsio.rmtree(term_dict_dir)
    if bucket_dirs:
        merge_fn = make_bucket_merge_encode(stats, config)
        fsio.makedirs(seg_dir)

        def merge_bucket_dir(batch: pa.Table) -> pa.Table:
            """Merge one bucket directory, write its segment file, and
            emit the (term, file) sidecar rows — the term dictionary is
            a SIDE OUTPUT of the merge tasks (sharded via the normal
            write_parquet that follows), never a driver-side scan of
            the finished segments."""
            from search_engine_ray.state import fsio as _fsio
            from search_engine_ray.util import limit_arrow_threads

            limit_arrow_threads()
            out_tables = []
            for d in batch.column("dir").to_pylist():
                # bucket dirs may live on shared storage (URI) — the merge
                # task can run on ANY node, so reads route through fsio
                tbl = _fsio.read_parquet_table(parquet_files(d))
                if not tbl.num_rows:
                    continue
                merged = merge_fn(tbl)
                bucket_name = posixpath.basename(d.rstrip("/"))  # bucket=N
                fname = f"segment-{bucket_name.split('=')[1].zfill(6)}.parquet"
                _fsio.write_parquet_table(merged, _fsio.join(seg_dir, fname))
                out_tables.append(
                    pa.table(
                        {
                            "term": merged.column("term"),
                            "file": pa.array([fname] * len(merged), pa.string()),
                        }
                    )
                )
            if not out_tables:
                return pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "file": pa.array([], pa.string()),
                    }
                )
            return pa.concat_tables(out_tables)

        rd.from_items([{"dir": d} for d in bucket_dirs]).map_batches(
            merge_bucket_dir,
            batch_format="pyarrow",
            batch_size=1,
            num_cpus=heavy_cpus,
        ).write_parquet(term_dict_dir)
    else:
        fsio.makedirs(seg_dir)
        fsio.write_parquet_table(
            pa.Table.from_batches([], schema=SEGMENT_SCHEMA),
            fsio.join(seg_dir, "empty.parquet"),
        )
    fsio.rmtree(shuffle_dir)
    timings["merge_encode"] = time.perf_counter() - t_pipe


def _build_index_fused(
    pages: rd.Dataset,
    out_dir: str,
    config: EngineConfig,
    *,
    skip_filter: bool,
    dedup_urls: bool,
    fingerprint: str | None,
    resume: bool,
    postings_batch_size: int,
    target_blocks: int | None,
) -> BuildResult:
    """Single-pass build: read -> extract -> tokenize -> [write docs part
    file + emit postings] -> disk shuffle -> merge. One streamed pass over
    the corpus; corpus stats accumulate in a side actor and are final at
    the shuffle-write barrier (exactly when the merge needs them)."""

    from search_engine_ray.state import fsio

    timings: dict[str, float] = {}
    docs_dir = os.path.join(out_dir, "docs")
    seg_dir = os.path.join(out_dir, "segments")
    docs_manifest = os.path.join(out_dir, "docs_manifest.json")
    manifest = os.path.join(out_dir, "manifest.json")
    if resume and manifest_valid(manifest, fingerprint) and manifest_valid(
        docs_manifest, fingerprint
    ):
        from search_engine_ray.state.segments import read_manifest

        m = read_manifest(manifest) or {}
        return BuildResult(
            out_dir=out_dir,
            n_docs=int(m.get("n_docs", 0)),
            avgdl=float(m.get("avgdl", 0.0)),
            n_postings_rows=int(m.get("n_segment_rows", -1)),
            timings={"fused": 0.0},
        )
    t_all = time.perf_counter()
    if target_blocks is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        target_blocks = max(8, cpus * 2)
    heavy_cpus = _resolve_heavy_cpus()
    try:
        _cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        _cpus = 4
    # Fused emit tasks interleave tokenize/emit compute with their own
    # docs + shuffle writes (see fused_tail), so they run at num_cpus=1 —
    # the I/O phases relieve the memory pressure that forces pure-compute
    # merge tasks to heavy_cpus slots. ~3 blocks per CPU packs the tail
    # waves (2M docs @ 32 CPUs: 24 blocks/heavy=2/Write-op = 20.7s stream,
    # 96 blocks/1 cpu/inline write = 6.8s; @ 8 CPUs 22.5s -> 18.8s).
    emit_blocks = max(8, _cpus * 3)

    n_dup_urls_skipped = 0
    t0 = time.perf_counter()
    if dedup_urls:
        pages, n_dup_urls_skipped = _dedup_duplicate_urls(
            pages, scratch_base=fsio.join(out_dir, "url_dedup_shuffle")
        )
        timings["url_dedup"] = time.perf_counter() - t0

    # hot-term sample + corpus-size estimate from the INPUT (no docs table
    # exists yet). count() is metadata-cheap on parquet-backed inputs —
    # fused mode is the raw-crawl fast path; heavily transformed inputs
    # should use the two-stage build.
    t_df = time.perf_counter()
    est_docs = pages.count() or 0
    hot_terms: frozenset[str] = frozenset()
    avgdl_est = 100.0
    if config.salt_shift > 0 and est_docs:
        sample = (
            pages.limit(min(est_docs, 50_000))
            .map_batches(
                lambda b: extract_batch(
                    b, title_strip_prefix=config.title_strip_prefix
                ),
                batch_format="pyarrow",
            )
            .map_batches(tokenize_docs_batch, batch_format="pyarrow")
            .select_columns(["tokens", "dl"])
        )
        parts = [
            (t.num_rows, partial_df_batch(t, config), t.column("dl"))
            for t in sample.iter_batches(
                batch_size=16384, batch_format="pyarrow"
            )
            if t.num_rows
        ]
        n_sampled = sum(n for n, _, _ in parts) or 1
        if parts:
            avgdl_est = float(
                sum(pc.sum(dl).as_py() or 0 for _, _, dl in parts) / n_sampled
            )
            pdf = (
                pa.concat_tables([p for _, p, _ in parts])
                .group_by("term")
                .aggregate([("pdf", "sum")])
            )
            frac_thr = 0.5 * config.salt_df_threshold / est_docs
            counts = pdf.column("pdf_sum").to_numpy(zero_copy_only=False)
            keep = counts / n_sampled >= frac_thr
            hot_terms = frozenset(
                t for t, k in zip(pdf.column("term").to_pylist(), keep) if k
            )
    timings["df_pass"] = time.perf_counter() - t_df

    if config.merge_buckets:
        n_buckets = config.merge_buckets
    else:
        est_bytes = int(est_docs * avgdl_est * 6)
        n_buckets = int(
            min(
                1 << 20,
                max(
                    target_blocks,
                    est_bytes // config.merge_bucket_target_bytes + 1,
                ),
            )
        )
    from dataclasses import replace as _replace

    emit_config = _replace(config, merge_buckets=n_buckets)

    fsio.rmtree(docs_dir)
    fsio.makedirs(docs_dir)
    fsio.rmtree(seg_dir)
    counters = StageCounters.remote()
    stats_acc = _DocStatsAcc.remote()

    ds = _split_input(pages, emit_blocks, est_docs)
    ds = ds.map_batches(
        _counting(
            lambda b: extract_batch(b, title_strip_prefix=config.title_strip_prefix),
            counters,
            "extract_unparseable",
        ),
        batch_format="pyarrow",
    )
    if skip_filter:
        ds = ds.map_batches(
            _counting(skip_filter_batch, counters, "skip_filter"),
            batch_format="pyarrow",
        )
    ds = ds.map_batches(_assign_doc_ids_rank, batch_format="pyarrow")

    shuffle_dir = _shuffle_dir_for(out_dir)
    fsio.rmtree(shuffle_dir)

    def fused_tail(batch: pa.Table) -> pa.Table:
        from search_engine_ray.state import fsio as _fsio
        from search_engine_ray.util import limit_arrow_threads

        limit_arrow_threads()
        batch = tokenize_docs_batch(batch)
        if not batch.num_rows:
            return pa.table({"n": pa.array([0], pa.int64())})
        doc_tbl = batch.select(DOCS_COLUMNS)
        # deterministic file names (min doc_id is unique per batch and
        # stable across task retries): a retried task OVERWRITES its own
        # partial output instead of duplicating postings under a fresh
        # uuid — the map-side shuffle write is idempotent.
        stem = f"b{pc.min(doc_tbl.column('doc_id')).as_py():014d}"
        _fsio.write_parquet_table(
            doc_tbl,
            _fsio.join(docs_dir, f"part-{stem}.parquet"),
            row_group_size=DOCS_ROW_GROUP_ROWS,
        )
        dl_sum = pc.sum(doc_tbl.column("dl")).as_py() or 0
        ray.get(stats_acc.add.remote(doc_tbl.num_rows, int(dl_sum)))
        # map-side bucket-partitioned shuffle write INSIDE the emit task:
        # postings never enter the object store and Ray's separate Write
        # operator (a second scheduling wave over every block) disappears
        # (2M docs @ 32 CPUs: 21.3s -> 6.8s stream wall). Writes route
        # through fsio — the shuffle dir is node-shared storage so merge
        # tasks on OTHER nodes can read these bucket files.
        out = emit_postings_batch(batch, emit_config, hot_terms)
        bk = out.column("bucket").to_numpy(zero_copy_only=False)
        order = np.argsort(bk, kind="stable")
        srt = out.take(pa.array(order))
        bks = bk[order]
        starts = np.flatnonzero(np.concatenate(([True], bks[1:] != bks[:-1])))
        ends = np.append(starts[1:], len(bks))
        for st, en in zip(starts, ends):
            bdir = _fsio.join(shuffle_dir, f"bucket={bks[st]}")
            _fsio.makedirs(bdir)
            _fsio.write_parquet_table(
                srt.slice(st, en - st).drop_columns(["bucket"]),
                _fsio.join(bdir, f"{stem}.parquet"),
            )
        return pa.table({"n": pa.array([out.num_rows], pa.int64())})

    stats_rows = ds.map_batches(
        fused_tail,
        batch_format="pyarrow",
        batch_size=postings_batch_size,
        num_cpus=1,
    )
    t_pipe = time.perf_counter()
    stats_rows.sum("n")  # the stage barrier: all emit/write tasks have run
    timings["shuffle_write"] = time.perf_counter() - t_pipe
    bucket_dirs = (
        sorted(
            fsio.join(shuffle_dir, d)
            for d in fsio.listdir(shuffle_dir)
            if d.startswith("bucket=")
        )
        if fsio.isdir(shuffle_dir)
        else []
    )
    n_docs, sum_dl = ray.get(stats_acc.get.remote())
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    stats = CorpusStats(n_docs=n_docs, avgdl=avgdl)
    _merge_buckets(
        shuffle_dir, bucket_dirs, stats, config, out_dir, heavy_cpus, timings
    )

    skip_counts = ray.get(counters.get.remote())
    skip_counts["duplicate_urls"] = n_dup_urls_skipped
    n_rows = sum(fsio.parquet_metadata(f).num_rows for f in parquet_files(seg_dir))
    write_manifest(
        docs_manifest,
        {
            "fingerprint": fingerprint,
            "complete": True,
            "stage": "docs",
            "fused": True,
            "skipped": skip_counts,
            "skipped_duplicate_urls": n_dup_urls_skipped,
        },
    )
    timings["fused_total"] = time.perf_counter() - t_all
    write_manifest(
        manifest,
        {
            "fingerprint": fingerprint,
            "complete": True,
            "fused": True,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_segment_rows": n_rows,
            "skipped": skip_counts,
            "skipped_duplicate_urls": n_dup_urls_skipped,
            "config": {
                "stop_words": sorted(config.stop_words),
                "bm25_k1": config.bm25_k1,
                "bm25_b": config.bm25_b,
                "block_size": config.block_size,
                "postings_codec": config.postings_codec,
                "salt_shift": config.salt_shift,
                "merge_buckets": n_buckets,
            },
            "timings_sec": timings,
        },
    )
    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_postings_rows=n_rows,
        timings=timings,
    )


def build_index(
    pages: rd.Dataset,
    out_dir: str,
    config: EngineConfig | None = None,
    *,
    doc_id_mode: str = "rank",  # "rank" | "replay"
    skip_filter: bool = False,
    dedup_urls: bool = True,
    fingerprint: str | None = None,
    resume: bool = True,
    postings_batch_size: int = 16384,
    target_blocks: int | None = None,
    fuse: bool = False,
) -> BuildResult:
    """Build doc store + index segments from an input_hint-shaped Dataset.

    ``target_blocks`` controls task granularity end-to-end (default ~2 blocks
    per CPU). Profiling showed the default parquet split (hundreds of ~1 MiB
    blocks for a 226 MiB corpus) makes per-task scheduling overhead dominate
    and the build stops scaling past 8 CPUs; right-sizing blocks to the
    cluster restored near-linear map-stage scaling.

    ``fuse=True``: single-pass build — doc-store part files are written as
    a SIDE OUTPUT of the same streamed stage that emits postings, so the
    docs checkpoint barrier, its parquet write+re-read, and the separate
    stats pass all disappear (rank mode only). Resume granularity becomes
    the whole build; for shard-level resumability at crawl scale, run one
    fused build per input shard as a generation and ``compact``."""
    config = config or EngineConfig()
    if fuse:
        if doc_id_mode != "rank":
            raise ValueError("fuse=True requires doc_id_mode='rank'")
        return _build_index_fused(
            pages,
            out_dir,
            config,
            skip_filter=skip_filter,
            dedup_urls=dedup_urls,
            fingerprint=fingerprint,
            resume=resume,
            postings_batch_size=postings_batch_size,
            target_blocks=target_blocks,
        )
    if target_blocks is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        target_blocks = max(8, cpus * 2)
    timings: dict[str, float] = {}
    docs_dir = os.path.join(out_dir, "docs")
    seg_dir = os.path.join(out_dir, "segments")
    docs_manifest = os.path.join(out_dir, "docs_manifest.json")
    manifest = os.path.join(out_dir, "manifest.json")

    # ---- stage 1: docs table ------------------------------------------------
    t0 = time.perf_counter()
    n_dup_urls_skipped = 0
    from search_engine_ray.state import fsio

    if not (resume and manifest_valid(docs_manifest, fingerprint)):
        fsio.rmtree(docs_dir)
        try:
            # pre-dedup count: cheap for parquet-backed or materialized
            # inputs (the normal cases), and an over-estimate after url
            # dedup only pads block granularity
            est_rows = pages.count() or 0
        except Exception:
            est_rows = 0
        if dedup_urls:
            pages, n_dup_urls_skipped = _dedup_duplicate_urls(
                pages, scratch_base=fsio.join(out_dir, "url_dedup_shuffle")
            )
            timings["url_dedup"] = time.perf_counter() - t0
        counters = StageCounters.remote()
        ds = _split_input(pages, target_blocks, est_rows)
        ds = ds.map_batches(
            _counting(
                lambda b: extract_batch(
                    b, title_strip_prefix=config.title_strip_prefix
                ),
                counters,
                "extract_unparseable",
            ),
            batch_format="pyarrow",
        )
        if skip_filter:
            ds = ds.map_batches(
                _counting(skip_filter_batch, counters, "skip_filter"),
                batch_format="pyarrow",
            )

        if doc_id_mode == "replay":
            mapping_ref = ray.put(_compat_replay_mapping(pages))
            ds = ds.map_batches(
                _ReplayDocIds,
                fn_constructor_args=(mapping_ref,),
                batch_format="pyarrow",
                concurrency=1,
            )
        elif doc_id_mode == "rank":
            ds = ds.map_batches(_assign_doc_ids_rank, batch_format="pyarrow")
        else:
            raise ValueError(f"unknown doc_id_mode: {doc_id_mode}")

        ds = ds.map_batches(tokenize_docs_batch, batch_format="pyarrow")
        ds = ds.select_columns(DOCS_COLUMNS)
        # doc_id-sorted layout = range-partitioned part files -> point reads
        # prune by file/row-group min-max stats (the digit-trie equivalent,
        # binary-file-storage.ts:132-165). Input is already coalesced to
        # target_blocks, which also sets the sort partition count.
        ds = ds.sort("doc_id")
        ds.write_parquet(docs_dir, row_group_size=DOCS_ROW_GROUP_ROWS)
        # write_parquet is the stage barrier: all filter tasks have run, so
        # the counter totals are final.
        skip_counts = ray.get(counters.get.remote())
        skip_counts["duplicate_urls"] = n_dup_urls_skipped
        write_manifest(
            docs_manifest,
            {
                "fingerprint": fingerprint,
                "complete": True,
                "stage": "docs",
                "skipped": skip_counts,
                "skipped_duplicate_urls": n_dup_urls_skipped,
            },
        )
    timings["docs"] = time.perf_counter() - t0

    # ---- corpus stats: footer metadata + distributed dl sum ----------------
    # n_docs comes from parquet footers only (O(files), no data read);
    # sum_dl is a streaming Dataset aggregate over the single dl column —
    # never a driver-side read of a full-table column (at crawl scale that
    # column alone is terabytes through one process).
    t0 = time.perf_counter()
    from search_engine_ray.state.segments import parquet_files

    docs_files = parquet_files(docs_dir)
    n_docs = sum(fsio.parquet_metadata(f).num_rows for f in docs_files)
    if n_docs:
        _dp, _dfs = fsio.resolve_data_paths(docs_files)
        sum_dl = (
            rd.read_parquet(_dp, filesystem=_dfs, columns=["dl"]).sum("dl") or 0
        )
    else:
        sum_dl = 0
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    stats = CorpusStats(n_docs=n_docs, avgdl=avgdl)
    timings["stats"] = time.perf_counter() - t0

    # ---- resolve merge-shuffle bucket count (data-proportional) ------------
    if config.merge_buckets:
        n_buckets = config.merge_buckets
    else:
        # ~6 bytes per encoded posting (delta-varint doc_id + tf + dl)
        est_bytes = int(n_docs * avgdl * 6)
        n_buckets = int(
            min(
                1 << 20,
                max(
                    target_blocks,
                    est_bytes // config.merge_bucket_target_bytes + 1,
                ),
            )
        )
    from dataclasses import replace as _replace

    emit_config = _replace(config, merge_buckets=n_buckets)

    # ---- stage 2: postings shuffle + segments ------------------------------
    t0 = time.perf_counter()
    n_rows = -1
    if not (resume and manifest_valid(manifest, fingerprint)):
        fsio.rmtree(seg_dir)
        # emit-block sizing balances two measured costs: the Hive-
        # partitioned shuffle write creates (emit blocks x merge buckets)
        # files (~5ms each), while too-FEW blocks leave tail waves
        # underpacked and stall the pipeline (24 vs 48 blocks at 32 CPUs:
        # 20.7s vs 13.4s stream wall). ~3 tasks per heavy slot is the
        # sweet spot.
        heavy_cpus = _resolve_heavy_cpus()
        try:
            _cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            _cpus = 4
        emit_blocks = max(8, round(_cpus / heavy_cpus * 3))
        docs_ds = rd.read_parquet(
            docs_dir,
            columns=["doc_id", "tokens", "dl"],
            override_num_blocks=emit_blocks,
        )
        # hot-term detection for salting (head-term skew, SURVEY §4.3.1):
        # terms frequent enough to salt (df fraction >= threshold/n_docs)
        # are reliably visible in a deterministic prefix sample — a full
        # df groupby cost more than the salting saved (measured 76-119s at
        # 2M docs vs ~2s for the sample). Conservative 0.5x margin
        # over-salts slightly, which is harmless (ranges stay disjoint).
        hot_terms: frozenset[str] = frozenset()
        if config.salt_shift > 0 and n_docs > 0:
            # one remote task per sample file (a driver-side read of the
            # token sample was 3-14s of serial critical path)
            t_df = time.perf_counter()
            sample_n = min(n_docs, 50_000)
            sample_files = parquet_files(docs_dir)[:4]
            per_file = -(-sample_n // len(sample_files))
            parts = ray.get(
                [
                    _sample_pdf_task.remote(f, per_file, config)
                    for f in sample_files
                ]
            )
            n_sampled = sum(n for n, _ in parts)
            pdf = (
                pa.concat_tables([t for _, t in parts])
                .group_by("term")
                .aggregate([("pdf", "sum")])
            )
            frac_thr = 0.5 * config.salt_df_threshold / n_docs
            counts = pdf.column("pdf_sum").to_numpy(zero_copy_only=False)
            keep = counts / max(n_sampled, 1) >= frac_thr
            hot_terms = frozenset(
                t
                for t, k in zip(pdf.column("term").to_pylist(), keep)
                if k
            )
            timings["df_pass"] = time.perf_counter() - t_df

        # memory-heavy tasks get >1 CPU slots above 16 CPUs: the host
        # kernel serializes cold page faults past ~16 concurrent
        # memory-streaming processes (74% sys time measured; reproduced
        # outside Ray), so cap heavy-task concurrency at ~16 per node.
        postings = docs_ds.map_batches(
            emit_postings_batch,
            fn_kwargs={"config": emit_config, "hot_terms": hot_terms},
            batch_format="pyarrow",
            batch_size=postings_batch_size,
            num_cpus=heavy_cpus,
        )
        # Disk-based map-side shuffle: each emit task splits its output by
        # bucket into a Hive-partitioned directory; the merge then handles
        # one bucket directory per task. This replaces the object-store
        # sort shuffle whose barrier kept the postings stage wall-flat from
        # 8 to 32 CPUs (sort compute was ~14s but wall was 41-86s). Both
        # phases stream, nothing sorts, and the shuffle itself is a
        # resumable on-disk artifact. (groupby-sort and Ray 2.49
        # HASH_SHUFFLE were both measured and rejected — see git history.)
        _merge_postings_to_segments(
            postings, stats, config, out_dir, heavy_cpus, timings
        )
        timings["postings"] = time.perf_counter() - t0
        t_mf = time.perf_counter()
        n_rows = sum(
            fsio.parquet_metadata(f).num_rows for f in parquet_files(seg_dir)
        )
        timings["manifest_scan"] = time.perf_counter() - t_mf
        from search_engine_ray.state.segments import read_manifest

        docs_mf = read_manifest(docs_manifest) or {}
        write_manifest(
            manifest,
            {
                "fingerprint": fingerprint,
                "complete": True,
                "n_docs": n_docs,
                "avgdl": avgdl,
                "n_segment_rows": n_rows,
                "skipped": docs_mf.get("skipped", {}),
                "skipped_duplicate_urls": n_dup_urls_skipped,
                "config": {
                    "stop_words": sorted(config.stop_words),
                    "bm25_k1": config.bm25_k1,
                    "bm25_b": config.bm25_b,
                    "block_size": config.block_size,
                    "postings_codec": config.postings_codec,
                    "salt_shift": config.salt_shift,
                    "merge_buckets": n_buckets,
                },
                "timings_sec": timings,
            },
        )
    else:
        timings["postings"] = 0.0

    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_postings_rows=n_rows,
        timings=timings,
    )


def add_generation(
    out_dir: str,
    pages: rd.Dataset,
    config: EngineConfig | None = None,
    *,
    doc_id_mode: str = "rank",
    on_duplicate: str = "error",  # "error" | "skip"
    on_id_collision: str = "rebase",  # "rebase" | "error"
    fingerprint: str | None = None,
    fuse: bool = False,
) -> BuildResult:
    """Incrementally add documents to an existing index as a new GENERATION
    (Lucene-style segment generations) — the batch rebuild of the
    reference's incremental ``Engine.add`` (engine.ts:43-99).

    - duplicate urls against ALL existing generations: ``error`` mirrors the
      reference throw (engine.ts:56-58), ``skip`` mirrors the demo driver's
      drop-and-continue (demo.ts:145-147). The existing url set is a narrow
      column scan broadcast to the filter stage (at crawl scale: a Bloom
      filter or sorted-merge anti-join).
    - ``replay`` doc_id mode seeds the downward-probe replay with every
      doc_id already taken by earlier generations.
    - Readers (SegmentReader / loaders) merge generations on read with
      global corpus statistics.
    """
    from search_engine_ray.state.segments import (
        SegmentReader,
        generation_dirs,
        read_manifest,
    )

    cfg_given = config is not None
    config = config or EngineConfig()
    existing = generation_dirs(out_dir)
    if not existing:
        raise ValueError(f"no existing index at {out_dir}; use build_index first")
    # postings codec must stay uniform across generations (readers and
    # compact dispatch per generation manifest; the API keeps them equal)
    base_mf = read_manifest(os.path.join(existing[0], "manifest.json")) or {}
    base_codec = (base_mf.get("config") or {}).get("postings_codec", "varint")
    if not cfg_given:
        config = dataclasses.replace(config, postings_codec=base_codec)
    elif config.postings_codec != base_codec:
        raise ValueError(
            f"postings_codec {config.postings_codec!r} differs from the "
            f"existing index's {base_codec!r}; compact with the new codec "
            "to transcode instead"
        )
    reader = SegmentReader(out_dir)
    existing_urls = reader.all_urls()

    gen_ids = [
        int(os.path.basename(g).split("-")[1])
        for g in existing
        if os.path.basename(g).startswith("gen-")
    ]
    gen_dir = os.path.join(out_dir, f"gen-{(max(gen_ids) + 1) if gen_ids else 1:04d}")

    urls_ref = ray.put(existing_urls)

    def dedup_filter(batch: pa.Table) -> pa.Table:
        known = ray.get(urls_ref)
        urls = batch.column("url").to_pylist()
        dup = [u in known for u in urls]
        if any(dup) and on_duplicate == "error":
            first = urls[dup.index(True)]
            raise ValueError(f"page already in index: {first}")
        keep = pa.array([not d for d in dup], pa.bool_())
        return batch.filter(keep)

    new_pages = pages.map_batches(dedup_filter, batch_format="pyarrow")

    if doc_id_mode == "rank":
        # SegmentReader assumes doc_ids are globally unique across
        # generations: a colliding rank silently corrupts merged per-term
        # runs (strict-ascending invariant) and doc fetch. Guard with
        # per-generation parquet min/max stats (O(1) metadata, no scan);
        # on overlap either rebase the whole new generation above the
        # existing max (uniform shift preserves the new docs' relative
        # order; BM25 ranking is unaffected — doc_id is only the tiebreak)
        # or raise. The bounds check is conservative: disjoint-but-
        # interleaved ranks also rebase, which is deterministic and safe.
        bounds = [b for b in (s.doc_id_bounds() for s in reader._subs) if b]
        if bounds:
            ex_hi = max(hi for _, hi in bounds)
            ex_lo = min(lo for lo, _ in bounds)
            from ray.data.aggregate import Max, Min

            agg = new_pages.select_columns(["rank"]).aggregate(
                Min("rank"), Max("rank")
            )
            new_lo, new_hi = agg.get("min(rank)"), agg.get("max(rank)")
            n_coll = 0
            if (
                new_lo is not None
                and int(new_lo) <= ex_hi
                and int(new_hi) >= ex_lo
            ):
                # ranges overlap — exact membership test: existing doc_ids
                # restricted to the overlap window (predicate-pushdown
                # column read, size ∝ window, not index), broadcast sorted,
                # then a distributed searchsorted count over the new ranks.
                # Interleaved-but-disjoint rank sets (e.g. one permutation
                # split across generations) pass untouched.
                window_parts = [
                    fsio.read_parquet_table(
                        s._docs_files,
                        columns=["doc_id"],
                        filters=[
                            ("doc_id", ">=", int(new_lo)),
                            ("doc_id", "<=", int(new_hi)),
                        ],
                    ).column("doc_id").to_numpy(zero_copy_only=False)
                    for s in reader._subs
                    if s._docs_files
                ]
                window = np.sort(np.concatenate(window_parts)) if window_parts else np.zeros(0, np.int64)
                if len(window):
                    win_ref = ray.put(window)

                    def count_collisions(batch: pa.Table) -> pa.Table:
                        w = ray.get(win_ref)
                        r = batch.column("rank").to_numpy(zero_copy_only=False)
                        pos = np.searchsorted(w, r)
                        pos = np.minimum(pos, len(w) - 1)
                        n = int((w[pos] == r).sum())
                        return pa.table({"n": pa.array([n], pa.int64())})

                    from ray.data.aggregate import Sum

                    n_coll = int(
                        new_pages.select_columns(["rank"])
                        .map_batches(count_collisions, batch_format="pyarrow")
                        .sum("n")
                        or 0
                    )
            if n_coll:
                if on_id_collision == "error":
                    raise ValueError(
                        f"{n_coll} new-generation rank(s) in [{new_lo}, "
                        f"{new_hi}] collide with existing doc_ids "
                        f"[{ex_lo}, {ex_hi}]; overlaps existing doc_ids. "
                        "Pass on_id_collision='rebase' or use "
                        "doc_id_mode='replay'"
                    )
                # uniform shift above the existing max: preserves the new
                # docs' relative order; BM25 ranking is unaffected (doc_id
                # is only the tiebreak).
                shift = ex_hi + 1 - int(new_lo)

                def rebase_rank(batch: pa.Table) -> pa.Table:
                    shifted = pc.add(
                        pc.cast(batch.column("rank"), pa.int64()), shift
                    )
                    return batch.set_column(
                        batch.schema.get_field_index("rank"), "rank", shifted
                    )

                new_pages = new_pages.map_batches(
                    rebase_rank, batch_format="pyarrow"
                )

    if doc_id_mode == "replay":
        taken = reader.all_doc_ids()
        cols = new_pages.select_columns(["url", "rank", "add_order"]).take_all()
        cols.sort(key=lambda r: r["add_order"])
        mapping: dict[str, int] = {}
        for r in cols:
            pid = int(r["rank"])
            while pid in taken:
                pid -= 1
            if pid < 0:
                raise ValueError("Rank <= 0")
            taken.add(pid)
            mapping[r["url"]] = pid
        mapping_ref = ray.put(mapping)
        new_pages = new_pages.map_batches(
            _ReplayDocIds,
            fn_constructor_args=(mapping_ref,),
            batch_format="pyarrow",
            concurrency=1,
        )
        # build_index re-assigns in replay mode; here ids are final already,
        # so run the generation build in rank mode over the mapped ids
        new_pages = new_pages.map_batches(
            lambda b: b.drop_columns(["rank"]).append_column(
                "rank", b.column("doc_id")
            ).drop_columns(["doc_id"]),
            batch_format="pyarrow",
        )

    return build_index(
        new_pages,
        gen_dir,
        config,
        doc_id_mode="rank",
        fingerprint=fingerprint,
        resume=fingerprint is not None,
        fuse=fuse,
    )


def delete_urls(
    out_dir: str,
    urls,
    *,
    strict: bool = True,
) -> int:
    """Soft-delete pages by url: append a TOMBSTONE file (doc_id, url)
    under ``<out_dir>/tombstones/`` — the Lucene liveDocs analogue the
    reference lacks (its single mutable index can only grow,
    engine.ts:43-99). Readers (``SegmentReader``) filter tombstoned docs
    out of postings and doc fetches immediately; ``compact`` applies the
    tombstones physically and clears them.

    ``urls`` is an iterable of url strings or a Ray Dataset with a ``url``
    column. The delete set is assumed to fit in driver memory (deletes are
    a trickle next to the corpus); a crawl-scale bulk delete would route
    through the same disk-bucket shuffle as url dedup. Resolution is a
    narrow distributed (doc_id, url) column scan with the delete set
    broadcast once via ``ray.put``.

    ``strict=True`` raises if any url was never indexed; re-deleting an
    already-tombstoned url is idempotent either way. Returns the number of
    NEWLY tombstoned docs."""
    from search_engine_ray.state.segments import (
        generation_dirs,
        read_tombstones,
        tombstones_dir,
    )

    gens = generation_dirs(out_dir)
    if not gens:
        raise ValueError(f"no index at {out_dir}")
    if isinstance(urls, rd.Dataset):
        want = set(urls.unique("url"))
    else:
        want = set(urls)
    if not want:
        return 0

    prior = read_tombstones(out_dir)
    prior_urls = set(prior.column("url").to_pylist())
    live_want = want - prior_urls

    found_ids: np.ndarray
    found_urls: list[str]
    if live_want:
        docs_files = [f for g in gens for f in parquet_files(fsio.join(g, "docs"))]
        want_ref = ray.put(pa.array(sorted(live_want), pa.string()))

        def pick(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column("url"), value_set=ray.get(want_ref))
            return batch.filter(mask)

        _p, _fs = fsio.resolve_data_paths(docs_files)
        hits = (
            rd.read_parquet(_p, filesystem=_fs, columns=["doc_id", "url"])
            .map_batches(pick, batch_format="pyarrow")
            .take_all()  # bounded by the delete-set size
        )
        found_ids = np.array([r["doc_id"] for r in hits], dtype=np.int64)
        found_urls = [r["url"] for r in hits]
    else:
        found_ids = np.zeros(0, np.int64)
        found_urls = []

    if strict:
        missing = live_want - set(found_urls)
        # urls already tombstoned count as found (idempotent re-delete)
        if missing:
            raise ValueError(
                f"{len(missing)} url(s) not in index, e.g. {sorted(missing)[:3]}"
            )
    if not found_ids.size:
        return 0

    td = tombstones_dir(out_dir)
    fsio.makedirs(td)
    existing = [f for f in fsio.listdir(td) if f.startswith("del-")]
    next_id = (
        max((int(f.split("-")[1].split(".")[0]) for f in existing), default=0) + 1
    )
    order = np.argsort(found_ids, kind="stable")
    fsio.write_parquet_table(
        pa.table(
            {
                "doc_id": pa.array(found_ids[order], pa.int64()),
                "url": pa.array([found_urls[i] for i in order], pa.string()),
            }
        ),
        fsio.join(td, f"del-{next_id:04d}.parquet"),
    )
    return int(found_ids.size)


@ray.remote
def _docs_file_apply_tombstones(
    src: str, dst: str, deleted: np.ndarray | None
) -> tuple[int, int]:
    """Compaction docs stage with tombstones: hard-link the part file when
    it holds no deleted docs, else rewrite it filtered (doc_id sort order
    is preserved — filtering is order-stable). Returns the file's
    post-filter (n_docs, sum_dl) so compact can rebuild EXACT corpus
    stats. Callers pass the tombstone array as an ObjectRef (put once,
    auto-dereferenced per task)."""
    ids_dl = fsio.read_parquet_table([src], columns=["doc_id", "dl"])
    ids = ids_dl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    dls = ids_dl.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
    if deleted is not None and deleted.size and ids.size:
        pos = np.searchsorted(deleted, ids)
        pos[pos == len(deleted)] = 0
        hit = deleted[pos] == ids
    else:
        hit = np.zeros(len(ids), dtype=bool)
    if not hit.any():
        if "://" in src or "://" in dst:
            fsio.copy_file(src, dst)
        else:
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
        return int(ids.size), int(dls.sum())
    keep = ~hit
    if keep.any():
        t = fsio.read_parquet_table([src])
        fsio.write_parquet_table(
            t.filter(pa.array(keep)), dst, row_group_size=DOCS_ROW_GROUP_ROWS
        )
    return int(keep.sum()), int(dls[keep].sum())


def _make_decode_reemit(
    config: EngineConfig, hot_ref, deleted_ref=None, src_codec: str = "varint"
):
    """Segment rows -> emit-schema postings rows (compaction's map stage).

    Decodes each stored (term, salt) run and RE-SALTS uniformly from the
    current config: salt = doc_id >> salt_shift for globally-hot terms, 0
    otherwise. Uniform re-salting is load-bearing — generations may disagree
    about a term's hotness, and mixing a salt-0 run (all doc_ids) with
    salted runs would break the reader's runs-concatenate-in-salt-order
    ascending invariant. salt is monotone in doc_id, so recomputed runs are
    disjoint and ordered regardless of which generation they came from."""
    from search_engine_ray.stages.postings import _hash_utf8_array
    from search_engine_ray.state.codec import decode_doc_ids_any, decode_tfs

    nb = config.merge_buckets
    shift = config.salt_shift

    def f(batch: pa.Table) -> pa.Table:
        from search_engine_ray.util import limit_arrow_threads

        limit_arrow_threads()
        hot = ray.get(hot_ref) if hot_ref is not None else frozenset()
        deleted = ray.get(deleted_ref) if deleted_ref is not None else None
        terms = batch.column("term").to_pylist()
        des = batch.column("doc_ids_enc").to_pylist()
        tes = batch.column("tfs_enc").to_pylist()
        les = batch.column("dls_enc").to_pylist()
        out_terms: list[str] = []
        out_salts: list[int] = []
        id_parts: list[np.ndarray] = []
        tf_parts: list[np.ndarray] = []
        dl_parts: list[np.ndarray] = []
        for term, de, te, le in zip(terms, des, tes, les):
            ids = decode_doc_ids_any(de, src_codec).astype(np.int64)
            tfs = decode_tfs(te).astype(np.int32)
            dls = decode_tfs(le).astype(np.int32)
            if deleted is not None and deleted.size and ids.size:
                # apply tombstones before re-salting (sorted-run order is
                # preserved; a fully-deleted run simply vanishes)
                pos = np.searchsorted(deleted, ids)
                pos[pos == len(deleted)] = 0
                keep = deleted[pos] != ids
                if not keep.all():
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    if not ids.size:
                        continue
            if shift > 0 and term in hot:
                salts = ids >> shift
                cuts = np.flatnonzero(np.diff(salts)) + 1
                bounds = np.concatenate(([0], cuts, [len(ids)]))
                for i in range(len(bounds) - 1):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    out_terms.append(term)
                    out_salts.append(int(salts[lo]))
                    id_parts.append(ids[lo:hi])
                    tf_parts.append(tfs[lo:hi])
                    dl_parts.append(dls[lo:hi])
            else:
                out_terms.append(term)
                out_salts.append(0)
                id_parts.append(ids)
                tf_parts.append(tfs)
                dl_parts.append(dls)
        if not out_terms:
            from search_engine_ray.stages.postings import _empty_postings_table

            return _empty_postings_table()
        lens = np.array([len(p) for p in id_parts], dtype=np.int64)
        off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        off_arr = pa.array(off, pa.int64())
        term_arr = pa.array(out_terms, pa.string())
        salt_np = np.array(out_salts, dtype=np.int64)
        mixed = _hash_utf8_array(term_arr) ^ (
            salt_np.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        )
        bucket = (mixed % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "term": term_arr,
                "salt": pa.array(salt_np, pa.int64()),
                "doc_ids": pa.ListArray.from_arrays(
                    off_arr, pa.array(np.concatenate(id_parts), pa.int64())
                ),
                "tfs": pa.ListArray.from_arrays(
                    off_arr, pa.array(np.concatenate(tf_parts), pa.int32())
                ),
                "dls": pa.ListArray.from_arrays(
                    off_arr, pa.array(np.concatenate(dl_parts), pa.int32())
                ),
            }
        )

    return f


def compact(
    out_dir: str,
    config: EngineConfig | None = None,
    *,
    fingerprint: str | None = None,
    target_blocks: int | None = None,
) -> BuildResult:
    """Merge all index GENERATIONS into a single one, in place (Lucene-style
    segment merge; the reference's single mutable index is the degenerate
    case). After compaction ``SegmentReader`` reads ONE sub-index: per-query
    cross-generation concat+argsort and block-metadata rebuild
    (state/segments.py SegmentReader.lookup) no longer trigger.

    Shape: doc part files are hard-linked into the new generation (no data
    movement); segment rows are decoded and re-emitted as postings runs
    (distributed map over segment files), re-salted uniformly, then pushed
    through the SAME disk-shuffle + bucket-merge stage as the batch build,
    with block-max metadata rebuilt from GLOBAL corpus stats.

    Tombstones (``delete_urls``) are applied physically here: deleted docs
    are dropped from both the doc store and every postings run, corpus
    stats are rebuilt EXACTLY over the survivors (the result is
    bit-identical to a fresh build without the deleted pages), and the
    tombstone files are cleared."""
    from search_engine_ray.state.segments import (
        generation_dirs,
        read_manifest,
        tombstone_ids,
        tombstones_dir,
    )

    cfg_given = config is not None
    config = config or EngineConfig()
    gens = generation_dirs(out_dir)
    deleted = tombstone_ids(out_dir)
    if len(gens) <= 1 and not deleted.size:
        m = read_manifest(os.path.join(out_dir, "manifest.json")) or {}
        return BuildResult(
            out_dir=out_dir,
            n_docs=int(m.get("n_docs", 0)),
            avgdl=float(m.get("avgdl", 0.0)),
            n_postings_rows=int(m.get("n_segment_rows", -1)),
            timings={"compact": 0.0},
        )
    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    if target_blocks is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        target_blocks = max(8, cpus * 2)

    from search_engine_ray.state import fsio

    tmp = os.path.join(out_dir, ".compact-tmp")
    fsio.rmtree(tmp)
    fsio.makedirs(os.path.join(tmp, "docs"))

    manifests = [read_manifest(os.path.join(g, "manifest.json")) or {} for g in gens]
    src_codecs = {
        (m.get("config") or {}).get("postings_codec", "varint") for m in manifests
    }
    if len(src_codecs) > 1:
        raise ValueError(
            f"generations use mixed postings codecs {sorted(src_codecs)}; "
            "this cannot happen through the add_generation API"
        )
    src_codec = next(iter(src_codecs), "varint")
    if not cfg_given:
        # preserve the index's codec; an explicit config may transcode
        config = dataclasses.replace(config, postings_codec=src_codec)
    deleted_ref = ray.put(deleted) if deleted.size else None

    if deleted_ref is None:
        # docs: hard-link every generation's part files (fall back to an fs
        # copy on URI backends / across filesystems). doc_ids are globally
        # unique and per-file min/max pruning doesn't need global sort order.
        for gi, g in enumerate(gens):
            for f in parquet_files(os.path.join(g, "docs")):
                dst = os.path.join(tmp, "docs", f"g{gi:04d}-{os.path.basename(f)}")
                if "://" in f:
                    fsio.copy_file(f, dst)
                else:
                    try:
                        os.link(f, dst)
                    except OSError:
                        shutil.copy2(f, dst)
        # global stats across generations (weighted by n_docs)
        n_docs = sum(int(m.get("n_docs", 0)) for m in manifests)
        sum_dl = sum(
            int(m.get("n_docs", 0)) * float(m.get("avgdl", 0.0)) for m in manifests
        )
        avgdl = (sum_dl / n_docs) if n_docs else 0.0
    else:
        # tombstones present: one task per part file links clean files and
        # rewrites dirty ones filtered; each returns post-filter
        # (n_docs, sum_dl) so stats are rebuilt EXACTLY over survivors
        futs = []
        for gi, g in enumerate(gens):
            for f in parquet_files(os.path.join(g, "docs")):
                dst = os.path.join(tmp, "docs", f"g{gi:04d}-{os.path.basename(f)}")
                futs.append(
                    _docs_file_apply_tombstones.remote(f, dst, deleted_ref)
                )
        parts = ray.get(futs)
        n_docs = int(sum(n for n, _ in parts))
        sum_dl = int(sum(s for _, s in parts))
        avgdl = (sum_dl / n_docs) if n_docs else 0.0
    stats = CorpusStats(n_docs=n_docs, avgdl=avgdl)
    timings["link_docs"] = time.perf_counter() - t0

    seg_files = [
        f for g in gens for f in parquet_files(os.path.join(g, "segments"))
    ]
    _sp, _sfs = fsio.resolve_data_paths(seg_files)
    if config.merge_buckets:
        n_buckets = config.merge_buckets
    else:
        total_bytes = sum(fsio.file_size(f) for f in seg_files)
        n_buckets = int(
            min(
                1 << 20,
                max(target_blocks, total_bytes // config.merge_bucket_target_bytes + 1),
            )
        )
    from dataclasses import replace as _replace

    emit_config = _replace(config, merge_buckets=n_buckets)

    # hot terms = salted in ANY generation (narrow distributed scan; the
    # result is the head of the Zipf curve — small side, broadcast once)
    t_hot = time.perf_counter()
    hot_ref = None
    if config.salt_shift > 0:
        def salted_terms(b: pa.Table) -> pa.Table:
            mask = pc.greater(b.column("salt"), 0)
            return pa.table({"term": pc.unique(b.column("term").filter(mask))})

        hot = frozenset(
            rd.read_parquet(_sp, filesystem=_sfs, columns=["term", "salt"])
            .map_batches(salted_terms, batch_format="pyarrow")
            .unique("term")
            # unique() yields None when no generation salted anything
            # (tiny corpora, or everything tombstoned)
            or []
        )
        hot_ref = ray.put(hot)
    timings["hot_terms"] = time.perf_counter() - t_hot

    heavy_cpus = _resolve_heavy_cpus()
    postings = rd.read_parquet(
        _sp,
        filesystem=_sfs,
        columns=["term", "doc_ids_enc", "tfs_enc", "dls_enc"],
        override_num_blocks=target_blocks,
    ).map_batches(
        _make_decode_reemit(emit_config, hot_ref, deleted_ref, src_codec),
        batch_format="pyarrow",
        num_cpus=heavy_cpus,
    )
    _merge_postings_to_segments(postings, stats, emit_config, tmp, heavy_cpus, timings)

    n_rows = sum(
        fsio.parquet_metadata(f).num_rows
        for f in parquet_files(os.path.join(tmp, "segments"))
    )
    base_cfg = (manifests[0].get("config") or {}) if manifests else {}
    skipped: dict[str, int] = {}
    for m in manifests:
        for k, v in (m.get("skipped") or {}).items():
            skipped[k] = skipped.get(k, 0) + int(v)
    payload = {
        "fingerprint": fingerprint,
        "complete": True,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_segment_rows": n_rows,
        "skipped": skipped,
        "applied_tombstones": int(deleted.size),
        "compacted_from": [os.path.basename(g.rstrip("/")) or "root" for g in gens],
        "config": {
            **base_cfg,
            "stop_words": sorted(config.stop_words),
            "bm25_k1": config.bm25_k1,
            "bm25_b": config.bm25_b,
            "block_size": config.block_size,
            "postings_codec": config.postings_codec,
            "salt_shift": config.salt_shift,
            "merge_buckets": n_buckets,
        },
        "timings_sec": timings,
    }
    write_manifest(os.path.join(tmp, "manifest.json"), payload)
    write_manifest(
        os.path.join(tmp, "docs_manifest.json"),
        {"fingerprint": fingerprint, "complete": True, "stage": "docs"},
    )

    # swap: tear down every old generation (and the now-applied
    # tombstones), then promote the new one.
    fsio.rmtree(tombstones_dir(out_dir))
    for g in gens:
        if g.rstrip("/") == out_dir.rstrip("/"):
            for name in ("docs", "segments", "term_dict"):
                fsio.rmtree(os.path.join(out_dir, name))
            for name in ("manifest.json", "docs_manifest.json"):
                fsio.remove(os.path.join(out_dir, name))
        else:
            fsio.rmtree(g)
    for name in fsio.listdir(tmp):
        fsio.move(os.path.join(tmp, name), os.path.join(out_dir, name))
    fsio.rmtree(tmp)
    timings["compact"] = time.perf_counter() - t0
    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_postings_rows=n_rows,
        timings=timings,
    )


def compact_tiered(
    out_dir: str,
    config: EngineConfig | None = None,
    *,
    max_generations: int = 4,
    fingerprint: str | None = None,
    target_blocks: int | None = None,
) -> BuildResult:
    """Size-tiered PARTIAL compaction (the Lucene/LSM merge-policy
    amortization ``compact`` lacks): when the index holds more than
    ``max_generations`` generations, merge only enough of the SMALLEST
    ``gen-*`` sub-generations into one new generation to get back under
    the cap, leaving the large base untouched. A steady trickle of
    ``add_generation`` calls therefore pays merge cost proportional to
    the small segments' size, not a full-index rewrite per maintenance
    pass — at crawl scale the base generation is ~the corpus and
    rewriting it per add cycle is the difference between O(adds) and
    O(corpus x adds) total merge I/O.

    Semantics: the root generation is never selected (it is the fallback
    base; merging it is ``compact``'s job). Tombstones are NOT applied
    and NOT cleared — read-time filtering continues to hide deleted docs
    exactly as before (only the full ``compact`` applies them physically,
    since tombstones may span generations outside the merge set). The
    merged generation carries its own local corpus stats in its manifest,
    the same contract ``add_generation`` generations already have;
    readers merge stats globally at load.

    No-op (returns current totals) when the index is already at or under
    ``max_generations`` generations or fewer than two ``gen-*``
    generations exist."""
    from search_engine_ray.state.segments import (
        generation_dirs,
        read_manifest,
    )

    if max_generations < 1:
        raise ValueError("max_generations must be >= 1")
    cfg_given = config is not None
    config = config or EngineConfig()
    gens = generation_dirs(out_dir)
    subs = [
        g
        for g in gens
        if os.path.basename(g.rstrip("/")).startswith("gen-")
    ]

    def _totals() -> BuildResult:
        ms = [read_manifest(os.path.join(g, "manifest.json")) or {} for g in gens]
        nd = sum(int(m.get("n_docs", 0)) for m in ms)
        sdl = sum(int(m.get("n_docs", 0)) * float(m.get("avgdl", 0.0)) for m in ms)
        return BuildResult(
            out_dir=out_dir,
            n_docs=nd,
            avgdl=(sdl / nd) if nd else 0.0,
            n_postings_rows=-1,
            timings={"compact_tiered": 0.0},
        )

    if len(gens) <= max_generations or len(subs) < 2:
        return _totals()
    # merge the smallest m sub-generations so the index lands at
    # max_generations (or as close as the root-stays rule allows)
    m_count = min(len(subs), len(gens) - max_generations + 1)
    if m_count < 2:
        return _totals()

    def _gen_bytes(g: str) -> int:
        return sum(
            fsio.file_size(f)
            for sub in ("segments", "docs")
            for f in parquet_files(fsio.join(g, sub))
        )

    ranked = sorted(subs, key=lambda g: (_gen_bytes(g), g))
    merge_gens = sorted(ranked[:m_count])

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    if target_blocks is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        target_blocks = max(8, cpus * 2)

    manifests = [
        read_manifest(os.path.join(g, "manifest.json")) or {} for g in merge_gens
    ]
    src_codecs = {
        (m.get("config") or {}).get("postings_codec", "varint") for m in manifests
    }
    if len(src_codecs) > 1:
        raise ValueError(
            f"generations use mixed postings codecs {sorted(src_codecs)}"
        )
    src_codec = next(iter(src_codecs), "varint")
    if not cfg_given:
        config = dataclasses.replace(config, postings_codec=src_codec)
    elif config.postings_codec != src_codec:
        raise ValueError(
            f"postings_codec {config.postings_codec!r} differs from the "
            f"index's {src_codec!r}; tiered compaction never transcodes "
            "(a partial transcode would mix codecs across generations)"
        )

    tmp = os.path.join(out_dir, ".compact-tiered-tmp")
    fsio.rmtree(tmp)
    fsio.makedirs(os.path.join(tmp, "docs"))

    # docs: hard-link (fs copy on URI backends) — no data movement
    for gi, g in enumerate(merge_gens):
        for f in parquet_files(os.path.join(g, "docs")):
            dst = os.path.join(tmp, "docs", f"g{gi:04d}-{os.path.basename(f)}")
            if "://" in f:
                fsio.copy_file(f, dst)
            else:
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
    n_docs = sum(int(m.get("n_docs", 0)) for m in manifests)
    sum_dl = sum(
        int(m.get("n_docs", 0)) * float(m.get("avgdl", 0.0)) for m in manifests
    )
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    stats = CorpusStats(n_docs=n_docs, avgdl=avgdl)
    timings["link_docs"] = time.perf_counter() - t0

    seg_files = [
        f for g in merge_gens for f in parquet_files(os.path.join(g, "segments"))
    ]
    _sp, _sfs = fsio.resolve_data_paths(seg_files)
    if config.merge_buckets:
        n_buckets = config.merge_buckets
    else:
        total_bytes = sum(fsio.file_size(f) for f in seg_files)
        n_buckets = int(
            min(
                1 << 20,
                max(target_blocks, total_bytes // config.merge_bucket_target_bytes + 1),
            )
        )
    emit_config = dataclasses.replace(config, merge_buckets=n_buckets)

    t_hot = time.perf_counter()
    hot_ref = None
    if config.salt_shift > 0:

        def salted_terms(b: pa.Table) -> pa.Table:
            mask = pc.greater(b.column("salt"), 0)
            return pa.table({"term": pc.unique(b.column("term").filter(mask))})

        hot = frozenset(
            rd.read_parquet(_sp, filesystem=_sfs, columns=["term", "salt"])
            .map_batches(salted_terms, batch_format="pyarrow")
            .unique("term")
            or []
        )
        hot_ref = ray.put(hot)
    timings["hot_terms"] = time.perf_counter() - t_hot

    heavy_cpus = _resolve_heavy_cpus()
    postings = rd.read_parquet(
        _sp,
        filesystem=_sfs,
        columns=["term", "doc_ids_enc", "tfs_enc", "dls_enc"],
        override_num_blocks=target_blocks,
    ).map_batches(
        _make_decode_reemit(emit_config, hot_ref, None, src_codec),
        batch_format="pyarrow",
        num_cpus=heavy_cpus,
    )
    _merge_postings_to_segments(postings, stats, emit_config, tmp, heavy_cpus, timings)

    n_rows = sum(
        fsio.parquet_metadata(f).num_rows
        for f in parquet_files(os.path.join(tmp, "segments"))
    )
    base_cfg = (manifests[0].get("config") or {}) if manifests else {}
    skipped: dict[str, int] = {}
    for m in manifests:
        for k, v in (m.get("skipped") or {}).items():
            skipped[k] = skipped.get(k, 0) + int(v)
    write_manifest(
        os.path.join(tmp, "manifest.json"),
        {
            "fingerprint": fingerprint,
            "complete": True,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_segment_rows": n_rows,
            "skipped": skipped,
            "compacted_from": [
                os.path.basename(g.rstrip("/")) for g in merge_gens
            ],
            "config": {
                **base_cfg,
                "stop_words": sorted(config.stop_words),
                "bm25_k1": config.bm25_k1,
                "bm25_b": config.bm25_b,
                "block_size": config.block_size,
                "postings_codec": config.postings_codec,
                "salt_shift": config.salt_shift,
                "merge_buckets": n_buckets,
            },
            "timings_sec": timings,
        },
    )
    write_manifest(
        os.path.join(tmp, "docs_manifest.json"),
        {"fingerprint": fingerprint, "complete": True, "stage": "docs"},
    )

    # swap: tear down the merged sources FIRST, then promote the merged
    # generation under a FRESH gen id (same order as ``compact``) — no
    # window where a reader can see a doc twice. A crash between the two
    # steps leaves the merged docs only in the completed ``tmp`` dir
    # (its manifest says complete + compacted_from), recoverable by
    # re-issuing the move.
    gen_ids = [
        int(os.path.basename(g.rstrip("/")).split("-")[1])
        for g in gens
        if os.path.basename(g.rstrip("/")).startswith("gen-")
    ]
    new_gen = os.path.join(out_dir, f"gen-{max(gen_ids) + 1:04d}")
    for g in merge_gens:
        fsio.rmtree(g)
    fsio.move(tmp, new_gen)
    timings["compact_tiered"] = time.perf_counter() - t0
    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_postings_rows=n_rows,
        timings=timings,
    )


def build_sharded(
    shards: list[tuple[str, rd.Dataset]],
    out_dir: str,
    config: EngineConfig | None = None,
    *,
    skip_filter: bool = False,
    compact_after: bool = True,
) -> BuildResult:
    """Shard-resumable crawl-scale build: one FUSED single-pass build per
    input shard as an index generation, then one compaction.

    Each shard is fingerprinted by its name, so a re-run after a failure
    SKIPS every completed shard (its generation manifest validates) and
    rebuilds only the ones that died — the 'failed run skips finished
    partitions' recipe, with the fused build's speed inside each shard.
    ``shards`` is [(shard_name, pages_dataset)]; shard doc_ids must be
    disjoint (rank mode), e.g. pre-striped ranks per shard."""
    from search_engine_ray.state.segments import generation_dirs, read_manifest

    config = config or EngineConfig()
    if not shards:
        raise ValueError("no shards")
    shard_names = [n for n, _ in shards]
    root_m = read_manifest(os.path.join(out_dir, "manifest.json")) or {}
    if root_m.get("shards") == shard_names and root_m.get("complete"):
        # full re-run after success: everything is already in
        return BuildResult(
            out_dir=out_dir,
            n_docs=int(root_m.get("n_docs", 0)),
            avgdl=float(root_m.get("avgdl", 0.0)),
            n_postings_rows=int(root_m.get("n_segment_rows", -1)),
            timings={"sharded": 0.0},
        )
    first_name, first_ds = shards[0]
    root_done = manifest_valid(
        os.path.join(out_dir, "manifest.json"), f"shard:{first_name}"
    ) or root_m.get("compacted_from")
    if not root_done:
        build_index(
            first_ds,
            out_dir,
            config,
            doc_id_mode="rank",
            skip_filter=skip_filter,
            fingerprint=f"shard:{first_name}",
            resume=True,
            fuse=True,
        )
    for name, ds in shards[1:]:
        gen_fp = f"shard:{name}"
        done = any(
            (read_manifest(os.path.join(g, "manifest.json")) or {}).get(
                "fingerprint"
            )
            == gen_fp
            for g in generation_dirs(out_dir)
        )
        if done:
            continue
        add_generation(
            out_dir, ds, config, on_duplicate="skip", fingerprint=gen_fp, fuse=True
        )
    if compact_after:
        res = compact(out_dir, config)
        # record the shard list so a full re-run is a no-op
        m = read_manifest(os.path.join(out_dir, "manifest.json")) or {}
        m["shards"] = shard_names
        write_manifest(os.path.join(out_dir, "manifest.json"), m)
        return res
    m = read_manifest(os.path.join(out_dir, "manifest.json")) or {}
    reader_n = sum(
        int((read_manifest(os.path.join(g, "manifest.json")) or {}).get("n_docs", 0))
        for g in generation_dirs(out_dir)
    )
    return BuildResult(
        out_dir=out_dir,
        n_docs=reader_n,
        avgdl=float(m.get("avgdl", 0.0)),
        n_postings_rows=-1,
        timings={},
    )


def make_searcher(out_dir: str, config: EngineConfig | None = None):
    """Eager-loading Searcher over a built index (small/medium corpora)."""
    from search_engine_ray.pipelines.query import Searcher
    from search_engine_ray.state.segments import load_doc_store, load_inverted_index

    return Searcher(
        config or EngineConfig(), load_inverted_index(out_dir), load_doc_store(out_dir)
    )
