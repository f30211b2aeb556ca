"""Iterative graph analytics over edge tables.

PageRank is the canonical "iterate until fixed point" shape a training-data
engine needs beyond one-shot aggregation: quality propagation over a link /
kNN graph (harmonic-centrality-style corpus weighting, cf. the Common Crawl
host-level ranking used to prioritize fetches). Connected components (the
other iterative graph primitive) lives in ``pipelines/dedup.py``.

Scale notes: each power iteration is inherently one edge-table pass — rank
mass flows src -> dst and is re-summed per destination. Rather than two
hash-shuffle JOINs + a groupby per iteration (Ray Data's join spins up
aggregator actor pools per call — measured far slower than a sort groupby
at this shape), each half-step is ONE union + groupby over a shared
node-hash bucket key: the rank rows and the edge rows land in the same
bucket group, where a vectorized searchsorted lookup replaces the join
probe. Two all-to-alls per iteration over (int64, float64) rows — the
documents payload never enters the graph. The bucket key doubles as the
co-partitioning key a real cluster would pre-bucket edges by.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

_SPLITMIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic node->bucket hash (splitmix-style mix of the id)."""
    x = keys.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x = x * _SPLITMIX
        x ^= x >> np.uint64(31)
    return (x % np.uint64(n_buckets)).astype(np.int64)


def pagerank_ds(
    edges: rd.Dataset,
    damping: float = 0.85,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 32,
) -> rd.Dataset:
    """PageRank over a directed edge table, ``n_iter`` power iterations.

    r_{t+1}(v) = (1-d)/n + d * (sum_{u->v} r_t(u)/deg(u) + dangling_t/n)

    where ``dangling_t`` is the rank mass on nodes without out-edges
    (redistributed uniformly, the standard correction). Nodes are the
    union of sources and destinations; initial rank is 1/n.

    Each iteration runs two union+groupby rounds keyed by node-hash
    bucket: (1) rank rows meet edge rows bucketed by SOURCE — a sorted
    searchsorted lookup emits per-edge contributions r/deg, pre-summed
    per (bucket-local) destination before leaving the group; (2)
    contribution rows meet the static node table bucketed by NODE — the
    new rank vector comes out whole. The rank table materializes each
    round (inherent to fixed-point iteration, same as connected
    components). Float sums are parallel-order dependent in the last
    bits, so semantics are pinned against the sequential numpy reference
    in tests (atol), not a value-hash SQL oracle."""
    e = edges.select_columns([src_col, dst_col])

    def _ends(batch: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [
                batch.column(src_col).combine_chunks().cast(pa.int64()),
                batch.column(dst_col).combine_chunks().cast(pa.int64()),
            ]
        )
        u = pc.unique(arr)
        return pa.table({"node": u, "pdeg": pa.nulls(len(u), pa.int64())})

    def _srcs(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        enc = s.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": enc.dictionary.cast(pa.int64()),
                "pdeg": pa.array(
                    np.bincount(codes, minlength=len(enc.dictionary)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    if e.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            )
        )

    # node table with out-degree (null-sum -> 0 for dangling); node-scale
    base = (
        e.map_batches(_ends, batch_format="pyarrow")
        .union(e.map_batches(_srcs, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Sum("pdeg", alias_name="deg", ignore_nulls=True))
        # Ray's sort-aggregate emits hundreds of tiny blocks; every later
        # union+groupby pays per-block task overhead, so squash once here
        # (everything downstream inherits the sane block count)
        .repartition(n_buckets)
    )

    def _init(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").cast(pa.int64())
        deg = pc.coalesce(
            batch.column("deg").cast(pa.int64()), pa.scalar(0, pa.int64())
        )
        b = _bucket_of(nodes.to_numpy(zero_copy_only=False), n_buckets)
        return pa.table(
            {
                "b": pa.array(b, pa.int64()),
                "node": nodes,
                "deg": deg,
            }
        )

    base = base.map_batches(_init, batch_format="pyarrow").materialize()
    n = base.count()
    r0 = 1.0 / n

    def _seed(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "r", pa.array(np.full(batch.num_rows, r0), pa.float64())
        )

    ranks = base.map_batches(_seed, batch_format="pyarrow").materialize()

    # edge rows pre-bucketed by SOURCE once (static across iterations);
    # schema matches the rank rows' so the union is zero-copy: kind 0 =
    # edge (k1=src, k2=dst), kind 1 = rank (k1=node, w=r/deg)
    def _edge_rows(batch: pa.Table) -> pa.Table:
        src = batch.column(src_col).cast(pa.int64())
        dst = batch.column(dst_col).cast(pa.int64())
        b = _bucket_of(src.to_numpy(zero_copy_only=False), n_buckets)
        nr = batch.num_rows
        return pa.table(
            {
                "b": pa.array(b, pa.int64()),
                "kind": pa.array(np.zeros(nr, np.int8), pa.int8()),
                "k1": src,
                "k2": dst,
                "w": pa.array(np.zeros(nr), pa.float64()),
            }
        )

    edge_rows = e.map_batches(_edge_rows, batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        def _dang(batch: pa.Table) -> pa.Table:
            deg_a = batch.column("deg").to_numpy(zero_copy_only=False)
            r_a = batch.column("r").to_numpy(zero_copy_only=False)
            return pa.table(
                {"m": pa.array([float(r_a[deg_a == 0].sum())], pa.float64())}
            )

        dangling = ranks.map_batches(_dang, batch_format="pyarrow").sum("m") or 0.0

        def _w_rows(batch: pa.Table) -> pa.Table:
            deg_a = batch.column("deg").to_numpy(zero_copy_only=False)
            r_a = batch.column("r").to_numpy(zero_copy_only=False)
            nodes = batch.column("node").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            keep = deg_a > 0
            nk = int(keep.sum())
            return pa.table(
                {
                    "b": pa.array(b[keep], pa.int64()),
                    "kind": pa.array(np.ones(nk, np.int8), pa.int8()),
                    "k1": pa.array(nodes[keep], pa.int64()),
                    "k2": pa.array(np.zeros(nk, np.int64), pa.int64()),
                    "w": pa.array(r_a[keep] / deg_a[keep], pa.float64()),
                }
            )

        w_rows = ranks.map_batches(_w_rows, batch_format="pyarrow")

        def _contrib(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            k1 = group.column("k1").to_numpy(zero_copy_only=False)
            is_rank = kind == 1
            rn = k1[is_rank]
            rw = group.column("w").to_numpy(zero_copy_only=False)[is_rank]
            order = np.argsort(rn)
            rn, rw = rn[order], rw[order]
            esrc = k1[~is_rank]
            edst = group.column("k2").to_numpy(zero_copy_only=False)[~is_rank]
            if len(esrc) == 0 or len(rn) == 0:
                return pa.table(
                    {
                        "dst": pa.array([], pa.int64()),
                        "c": pa.array([], pa.float64()),
                    }
                )
            pos = np.searchsorted(rn, esrc)
            pos = np.clip(pos, 0, len(rn) - 1)
            hit = rn[pos] == esrc
            cw = np.where(hit, rw[pos], 0.0)
            # pre-sum per destination before leaving the group (combiner)
            ud, inv = np.unique(edst, return_inverse=True)
            cs = np.zeros(len(ud))
            np.add.at(cs, inv, cw)
            return pa.table(
                {"dst": pa.array(ud, pa.int64()), "c": pa.array(cs, pa.float64())}
            )

        contrib = (
            edge_rows.union(w_rows)
            .groupby("b")
            .map_groups(_contrib, batch_format="pyarrow")
        )

        # half-step 2: contributions meet the static node table, bucketed
        # by NODE; same union-tag trick (kind 0 = contrib, kind 1 = node)
        def _c_rows(batch: pa.Table) -> pa.Table:
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            b = _bucket_of(dst, n_buckets)
            nr = len(dst)
            return pa.table(
                {
                    "b": pa.array(b, pa.int64()),
                    "kind": pa.array(np.zeros(nr, np.int8), pa.int8()),
                    "k1": batch.column("dst"),
                    "k2": pa.array(np.zeros(nr, np.int64), pa.int64()),
                    "w": batch.column("c"),
                }
            )

        def _n_rows(batch: pa.Table) -> pa.Table:
            nr = batch.num_rows
            return pa.table(
                {
                    "b": batch.column("b"),
                    "kind": pa.array(np.ones(nr, np.int8), pa.int8()),
                    "k1": batch.column("node"),
                    "k2": batch.column("deg"),
                    "w": pa.array(np.zeros(nr), pa.float64()),
                }
            )

        teleport = (1.0 - damping) / n + damping * dangling / n
        damp = damping

        def _update(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            k1 = group.column("k1").to_numpy(zero_copy_only=False)
            is_node = kind == 1
            nodes = k1[is_node]
            deg = group.column("k2").to_numpy(zero_copy_only=False)[is_node]
            order = np.argsort(nodes)
            nodes, deg = nodes[order], deg[order]
            r = np.full(len(nodes), teleport)
            cd = k1[~is_node]
            cw = group.column("w").to_numpy(zero_copy_only=False)[~is_node]
            if len(cd):
                pos = np.searchsorted(nodes, cd)
                np.add.at(r, pos, damp * cw)
            bsel = group.column("b").to_numpy(zero_copy_only=False)[is_node][order]
            return pa.table(
                {
                    "b": pa.array(bsel, pa.int64()),
                    "node": pa.array(nodes, pa.int64()),
                    "deg": pa.array(deg, pa.int64()),
                    "r": pa.array(r, pa.float64()),
                }
            )

        ranks = (
            contrib.map_batches(_c_rows, batch_format="pyarrow")
            .union(base.map_batches(_n_rows, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(_update, batch_format="pyarrow")
            .repartition(n_buckets)
            .materialize()
        )

    def _out(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"), "rank": batch.column("r")})

    return ranks.map_batches(_out, batch_format="pyarrow").sort("node")


def pagerank_reference(
    edges: list[tuple[int, int]], damping: float = 0.85, n_iter: int = 10
) -> dict[int, float]:
    """Sequential numpy reference (tests + documentation of semantics)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    deg = np.zeros(n, np.int64)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        nr = np.full(n, (1.0 - damping) / n + damping * dangling / n)
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / deg[idx[u]]
        nr += damping * contrib
        r = nr
    return {v: float(r[idx[v]]) for v in nodes}


def label_propagation_ds(
    edges: rd.Dataset,
    seeds: rd.Dataset,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    n_buckets: int = 32,
) -> rd.Dataset:
    """Semi-supervised label propagation over a directed edge table:
    spread a small seed set's labels (quality tiers, topics, spam flags)
    to every reachable node — the cheap way to label a web-scale corpus
    from a human-labeled sliver.

    Semantics (deterministic, integer-vote LPA): seed nodes are CLAMPED
    to their seed label forever. Each iteration, every unlabeled node
    takes the most-voted label among its in-neighbors' current labels
    (ties -> smallest label id); nodes whose in-neighbors are all
    unlabeled stay unlabeled (-1). Votes are integer counts, so unlike
    float PageRank the result is bit-deterministic on any cluster shape.

    Same two-shuffle bucket plan as :func:`pagerank_ds` (union + groupby
    on a shared node-hash key, searchsorted instead of a join probe);
    per-group vote counting is one lexsort + reduceat, no Python loops.

    Output: (node, label) for every node in the edge set; -1 = never
    reached."""
    e = edges.select_columns([src_col, dst_col])
    if e.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        )

    def _ends(batch: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [
                batch.column(src_col).combine_chunks().cast(pa.int64()),
                batch.column(dst_col).combine_chunks().cast(pa.int64()),
            ]
        )
        u = pc.unique(arr)
        return pa.table(
            {
                "node": u,
                "seed": pa.array(np.full(len(u), -1, np.int64), pa.int64()),
            }
        )

    def _seed_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column(node_col).cast(pa.int64()),
                "seed": batch.column(label_col).cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    base = (
        e.map_batches(_ends, batch_format="pyarrow")
        .union(seeds.map_batches(_seed_rows, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Max("seed", alias_name="seed"))
        .repartition(n_buckets)
    )

    def _init(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").cast(pa.int64())
        seed = batch.column("seed").cast(pa.int64())
        b = _bucket_of(nodes.to_numpy(zero_copy_only=False), n_buckets)
        return pa.table(
            {
                "b": pa.array(b, pa.int64()),
                "node": nodes,
                "seed": seed,
                "lab": seed,
            }
        )

    state = base.map_batches(_init, batch_format="pyarrow").materialize()

    def _edge_rows(batch: pa.Table) -> pa.Table:
        src = batch.column(src_col).cast(pa.int64())
        dst = batch.column(dst_col).cast(pa.int64())
        b = _bucket_of(src.to_numpy(zero_copy_only=False), n_buckets)
        nr = batch.num_rows
        return pa.table(
            {
                "b": pa.array(b, pa.int64()),
                "kind": pa.array(np.zeros(nr, np.int8), pa.int8()),
                "k1": src,
                "k2": dst,
                "v": pa.array(np.zeros(nr, np.int64), pa.int64()),
            }
        )

    edge_rows = e.map_batches(_edge_rows, batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        def _lab_rows(batch: pa.Table) -> pa.Table:
            lab = batch.column("lab").to_numpy(zero_copy_only=False)
            nodes = batch.column("node").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            keep = lab >= 0  # only labeled nodes vote
            nk = int(keep.sum())
            return pa.table(
                {
                    "b": pa.array(b[keep], pa.int64()),
                    "kind": pa.array(np.ones(nk, np.int8), pa.int8()),
                    "k1": pa.array(nodes[keep], pa.int64()),
                    "k2": pa.array(np.zeros(nk, np.int64), pa.int64()),
                    "v": pa.array(lab[keep], pa.int64()),
                }
            )

        lab_rows = state.map_batches(_lab_rows, batch_format="pyarrow")

        def _votes(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            k1 = group.column("k1").to_numpy(zero_copy_only=False)
            is_lab = kind == 1
            ln = k1[is_lab]
            lv = group.column("v").to_numpy(zero_copy_only=False)[is_lab]
            order = np.argsort(ln)
            ln, lv = ln[order], lv[order]
            esrc = k1[~is_lab]
            edst = group.column("k2").to_numpy(zero_copy_only=False)[~is_lab]
            if len(esrc) == 0 or len(ln) == 0:
                return pa.table(
                    {
                        "dst": pa.array([], pa.int64()),
                        "vl": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            pos = np.clip(np.searchsorted(ln, esrc), 0, len(ln) - 1)
            hit = ln[pos] == esrc
            vd, vl = edst[hit], lv[pos][hit]
            # combiner: count votes per (dst, label) before leaving the group
            o = np.lexsort((vl, vd))
            vd, vl = vd[o], vl[o]
            new = np.ones(len(vd), bool)
            new[1:] = (vd[1:] != vd[:-1]) | (vl[1:] != vl[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(vd)))
            return pa.table(
                {
                    "dst": pa.array(vd[starts], pa.int64()),
                    "vl": pa.array(vl[starts], pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        votes = (
            edge_rows.union(lab_rows)
            .groupby("b")
            .map_groups(_votes, batch_format="pyarrow")
        )

        def _v_rows(batch: pa.Table) -> pa.Table:
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            b = _bucket_of(dst, n_buckets)
            nr = len(dst)
            return pa.table(
                {
                    "b": pa.array(b, pa.int64()),
                    "kind": pa.array(np.zeros(nr, np.int8), pa.int8()),
                    "k1": batch.column("dst"),
                    "k2": batch.column("vl"),
                    "v": batch.column("cnt"),
                }
            )

        def _s_rows(batch: pa.Table) -> pa.Table:
            nr = batch.num_rows
            return pa.table(
                {
                    "b": batch.column("b"),
                    "kind": pa.array(np.ones(nr, np.int8), pa.int8()),
                    "k1": batch.column("node"),
                    "k2": batch.column("seed"),
                    "v": batch.column("lab"),
                }
            )

        def _update(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            k1 = group.column("k1").to_numpy(zero_copy_only=False)
            k2 = group.column("k2").to_numpy(zero_copy_only=False)
            v = group.column("v").to_numpy(zero_copy_only=False)
            is_node = kind == 1
            nodes, seed, lab = k1[is_node], k2[is_node], v[is_node]
            order = np.argsort(nodes)
            nodes, seed, lab = nodes[order], seed[order], lab[order]
            vd, vl, cnt = k1[~is_node], k2[~is_node], v[~is_node]
            new_lab = lab.copy()
            if len(vd):
                # vote rows are PARTIAL counts (one per source bucket the
                # voters lived in) — sum them per (dst, label) BEFORE the
                # argmax: winner-of-partials is not winner-of-totals (a
                # label split 2+1 across two source buckets must beat a
                # label with a single partial of 2). Caught by the
                # label_propagation SQL oracle at sf0.01.
                o = np.lexsort((vl, vd))
                vd, vl, cnt = vd[o], vl[o], cnt[o]
                newp = np.ones(len(vd), bool)
                newp[1:] = (vd[1:] != vd[:-1]) | (vl[1:] != vl[:-1])
                starts = np.flatnonzero(newp)
                tot = np.add.reduceat(cnt, starts)
                gvd, gvl = vd[starts], vl[starts]
                # winner per dst: max total count, tie -> min label
                o2 = np.lexsort((gvl, -tot, gvd))
                gvd, gvl = gvd[o2], gvl[o2]
                first = np.ones(len(gvd), bool)
                first[1:] = gvd[1:] != gvd[:-1]
                wd, wl = gvd[first], gvl[first]
                pos = np.searchsorted(nodes, wd)
                upd = np.zeros(len(nodes), bool)
                upd[pos] = True
                win = np.full(len(nodes), -1, np.int64)
                win[pos] = wl
                # clamp seeds; unlabeled nodes with no votes keep -1
                take = upd & (seed < 0)
                new_lab[take] = win[take]
            b_sel = group.column("b").to_numpy(zero_copy_only=False)[is_node][order]
            return pa.table(
                {
                    "b": pa.array(b_sel, pa.int64()),
                    "node": pa.array(nodes, pa.int64()),
                    "seed": pa.array(seed, pa.int64()),
                    "lab": pa.array(new_lab, pa.int64()),
                }
            )

        state = (
            votes.map_batches(_v_rows, batch_format="pyarrow")
            .union(state.map_batches(_s_rows, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(_update, batch_format="pyarrow")
            .repartition(n_buckets)
            .materialize()
        )

    def _out(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"), "label": batch.column("lab")})

    return state.map_batches(_out, batch_format="pyarrow").sort("node")


def label_propagation_reference(
    edges: list[tuple[int, int]], seeds: dict[int, int], n_iter: int = 5
) -> dict[int, int]:
    """Sequential reference for the clamped integer-vote LPA above."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    lab = {v: seeds.get(v, -1) for v in nodes}
    for _ in range(n_iter):
        votes: dict[int, dict[int, int]] = {}
        for u, v in edges:
            lu = lab[u]
            if lu >= 0:
                votes.setdefault(v, {}).setdefault(lu, 0)
                votes[v][lu] += 1
        nxt = dict(lab)
        for v, c in votes.items():
            if seeds.get(v, -1) >= 0:
                continue
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        lab = nxt
    return lab
