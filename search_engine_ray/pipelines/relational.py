"""Relational equi-join operators over the TPC-H-ish side tables.

The reference's only joins are point lookups against its KV tables
(SURVEY §2.4: url→pageId, word→postings, pageId→Page); a data-processing
engine that feeds training pipelines also needs real equi-joins (dimension
enrichment, fact⋈dim rollups). Two physical strategies, same semantics:

- ``broadcast_hash_join``: the build (small) side is collected once into
  the object store (``ray.put`` once, NOT re-shipped per batch) and every
  probe batch resolves matches with one vectorized ``pc.index_in`` — zero
  shuffle of the probe side. Right when the build side fits in a worker
  heap (dimension tables: region/nation/customer-class lookups).
- ``shuffle_hash_join``: Ray Data's native hash-shuffle join
  (``Dataset.join``) — both sides hash-partitioned on the key; the honest
  path when both sides are large. Tested equivalent to the broadcast path.

``segment_revenue_ds`` composes join → per-batch partial aggregation
(combiner) → final small groupby, the canonical fact⋈dim rollup shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _collect_arrow(ds: rd.Dataset) -> pa.Table:
    """Materialize a SMALL dataset into one Arrow table (build sides only).

    materialize() first — to_arrow_refs on a lazy dataset re-executes the
    plan a second time for its limit(1) schema probe (ray 2.49)."""
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    if not tables:
        raise ValueError("broadcast build side is empty")
    return pa.concat_tables(tables).combine_chunks()


def broadcast_hash_join(
    probe: rd.Dataset,
    build: rd.Dataset | pa.Table,
    on: str,
    build_on: str | None = None,
    build_cols: list[str] | None = None,
    how: str = "inner",
) -> rd.Dataset:
    """Equi-join ``probe ⋈ build`` with the build side broadcast.

    The build side must be small enough for a worker heap (documented
    partitioning assumption; use ``shuffle_hash_join`` otherwise). Build
    keys must be unique — duplicate build keys raise, because pc.index_in
    returns only the first match and would silently drop rows of a
    many-to-many join.

    ``how``: "inner" drops unmatched probe rows; "left" keeps them with
    null payload columns.
    """
    build_on = build_on or on
    tbl = build if isinstance(build, pa.Table) else _collect_arrow(build)
    if build_cols is not None:
        tbl = tbl.select([build_on, *build_cols])
    keys = tbl.column(build_on)
    if pc.count_distinct(keys).as_py() != len(tbl):
        raise ValueError(f"duplicate keys in broadcast build side on {build_on!r}")
    payload_names = [n for n in tbl.column_names if n != build_on]
    build_ref = ray.put(tbl)

    def probe_batch(batch: pa.Table) -> pa.Table:
        b = ray.get(build_ref)
        idx = pc.index_in(batch.column(on), value_set=b.column(build_on))
        if how == "inner":
            keep = pc.is_valid(idx)
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        out = batch
        for name in payload_names:
            # take with null indices yields nulls — exactly left-join payload
            out = out.append_column(name, b.column(name).take(idx))
        return out

    return probe.map_batches(probe_batch, batch_format="pyarrow")


def shuffle_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Ray Data native hash-shuffle inner join (both sides partitioned)."""
    return left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on,),
        right_on=((right_on or on),),
    )


def segment_revenue_ds(
    sf_dir: str, strategy: str = "broadcast", num_partitions: int = 16
) -> rd.Dataset:
    """Revenue per market segment: orders ⋈ customer → groupby segment.

    Column-pruned reads (2 columns per side); after the join a per-batch
    partial sum by segment runs inside map_batches, so the final groupby
    shuffles ~n_batches × n_segments tiny rows, never the fact table.
    """
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    if strategy == "broadcast":
        joined = broadcast_hash_join(
            orders, customer, on="o_custkey", build_on="c_custkey"
        )
    elif strategy == "shuffle":
        joined = shuffle_hash_join(
            orders, customer, on="o_custkey", right_on="c_custkey",
            num_partitions=num_partitions,
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    def partial(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment")
        if isinstance(seg, pa.ChunkedArray):
            seg = seg.combine_chunks()
        enc = seg.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        # sum exact integer cents, not floats: float-sum associativity
        # differs between engines and can flip a 2-decimal rounding
        cents = np.round(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        )
        sums = np.bincount(codes, weights=cents, minlength=len(enc.dictionary))
        return pa.table(
            {
                "c_mktsegment": enc.dictionary,
                "pr": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("pr", alias_name="cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        cents = batch.column("cents").cast(pa.float64())
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "revenue": pc.round(pc.divide(cents, 100.0), 2),
            }
        )

    # ~5 rows: sort so output order is deterministic across runs
    return agg.map_batches(finish, batch_format="pyarrow").sort("c_mktsegment")


def pricing_summary_ds(
    sf_dir: str, cutoff: str = "2000-01-01"
) -> rd.Dataset:
    """TPC-H-Q1-shaped pricing summary over lineitem: filter on ship date,
    group by (returnflag, linestatus), sum quantity / base price /
    discounted price / charge + row count.

    The canonical columnar-aggregate shape: column-pruned read, predicate
    applied per batch, ALL metrics accumulated as exact integers (cents and
    basis-point products) inside one vectorized map_batches combiner — the
    groupby ships 6 tiny rows per batch and the result is independent of
    float summation order (hash-exact vs the SQL oracle). Per-row numerators
    are int64 from the start (np.add.at scatter-sum, NOT float-weighted
    bincount, whose float64 partials lose exactness past 2^53 ≈ 9e15 — only
    ~1e5 rows/batch at sum_charge's ~1e11 per-row magnitude). int64 partials
    stay exact to ~9e18 ≈ 9e7 rows per (group, batch); the groupby Sum on top
    is int64 end-to-end. Output rows are sorted by (l_returnflag,
    l_linestatus) so the 6-row result is deterministic.

    Representation (r4 hardening after two driver hash-reds on identical
    values): metrics are the exact integer sums divided once by the fixed
    scale (a single IEEE-754 double division, bit-identical in any engine)
    — no round() whose tie-break mode could differ between kernels; sum_qty
    is float64 (plain-SQL sum(DOUBLE) shape) and the group keys flow
    through a native two-column groupby, never a join/split round-trip."""
    cols = [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ]
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate")
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        ts = ship.cast(pa.int64()).to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ts <= cutoff_us))
        if not batch.num_rows:
            return pa.table(
                {
                    "k": pa.array([], pa.string()),
                    "pq": pa.array([], pa.int64()),
                    "pb": pa.array([], pa.int64()),
                    "pd": pa.array([], pa.int64()),
                    "pc_": pa.array([], pa.int64()),
                    "pn": pa.array([], pa.int64()),
                }
            )
        key = pc.binary_join_element_wise(
            batch.column("l_returnflag"), batch.column("l_linestatus"), "|"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = key.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        ng = len(enc.dictionary)
        gparts = pc.split_pattern(enc.dictionary, "|")
        qty = np.round(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cents = np.round(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d100 = np.round(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t100 = np.round(
            batch.column("l_tax").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_num = cents * (100 - d100)  # int64, ~1e11 per row
        charge_num = disc_num * (100 + t100)  # int64, ~1e13 per row

        def gsum(vals: np.ndarray) -> pa.Array:
            out = np.zeros(ng, np.int64)
            np.add.at(out, codes, vals)
            return pa.array(out, pa.int64())

        return pa.table(
            {
                "l_returnflag": pc.list_element(gparts, 0),
                "l_linestatus": pc.list_element(gparts, 1),
                "pq": gsum(qty),
                "pb": gsum(cents),
                "pd": gsum(disc_num),
                "pc_": gsum(charge_num),
                "pn": pa.array(np.bincount(codes, minlength=ng), pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("pq", alias_name="sum_qty"),
            Sum("pb", alias_name="b_cents"),
            Sum("pd", alias_name="d_num"),
            Sum("pc_", alias_name="c_num"),
            Sum("pn", alias_name="count_order"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                # one int64->float64 cast + one double division per metric:
                # exactly specified by IEEE 754, so any engine computing the
                # same integer sum lands on the SAME double, bit for bit —
                # no round() tie-break mode in play
                "sum_qty": batch.column("sum_qty").cast(pa.float64()),
                "sum_base_price": pc.divide(
                    batch.column("b_cents").cast(pa.float64()), 100.0
                ),
                # d_num = cents * (100 - d100) has scale 100 (price) * 100
                # (discount bp) = 1e4; c_num adds another *100 → 1e6
                "sum_disc_price": pc.divide(
                    batch.column("d_num").cast(pa.float64()), 10_000.0
                ),
                "sum_charge": pc.divide(
                    batch.column("c_num").cast(pa.float64()), 1_000_000.0
                ),
                "count_order": batch.column("count_order"),
            }
        )

    # 6-row result: sort so output order is deterministic (Ray's groupby
    # emits group rows in nondeterministic order across runs).
    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def broadcast_semi_anti_join(
    probe: rd.Dataset,
    build: rd.Dataset | pa.Table,
    on: str,
    build_on: str | None = None,
    anti: bool = False,
) -> rd.Dataset:
    """Semi/anti equi-join: keep probe rows whose key IS (semi) / IS NOT
    (anti) present in the build side. The build side ships ONLY its
    distinct key column (``ray.put`` once — the membership set is far
    smaller than the joined row payload a full join would move), and each
    probe batch resolves with one vectorized ``pc.is_in``. When the key
    set itself outgrows a worker heap, the honest fallback is Ray's
    native ``join(join_type='left_semi'/'left_anti')`` — same semantics,
    both sides shuffled; see ``shuffle_semi_anti_join``."""
    build_on = build_on or on
    tbl = build if isinstance(build, pa.Table) else _collect_arrow(build)
    keys = pc.unique(tbl.column(build_on).combine_chunks())
    keys_ref = ray.put(keys)

    def probe_batch(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        hit = pc.is_in(batch.column(on), value_set=ks)
        return batch.filter(pc.invert(hit) if anti else hit)

    return probe.map_batches(probe_batch, batch_format="pyarrow")


def shuffle_semi_anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Ray Data native hash-shuffle semi/anti join (both sides partitioned)
    — the both-sides-large path."""
    return left.join(
        right.select_columns([right_on or on]),
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(on,),
        right_on=((right_on or on),),
    )


def revenue_rollup_ds(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP (c_mktsegment, o_orderpriority) over orders⋈customer:
    revenue + order counts at (seg, prio), (seg, ALL) and (ALL, ALL).

    Scale shape: the fact table is touched ONCE — a broadcast dim join and
    a per-batch integer-cent combiner feed the base-level groupby; the two
    coarser rollup levels are derived from the BASE AGGREGATE (a
    segments x priorities handful of rows), never from a second fact
    pass. Cents stay integer until the final divide, so value hashes are
    summation-order independent."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = broadcast_hash_join(orders, cust, on="o_custkey", build_on="c_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment")
        if isinstance(seg, pa.ChunkedArray):
            seg = seg.combine_chunks()
        pri = batch.column("o_orderpriority")
        if isinstance(pri, pa.ChunkedArray):
            pri = pri.combine_chunks()
        cents = np.rint(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        se = seg.dictionary_encode()
        pe = pri.dictionary_encode()
        si = se.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pi = pe.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        np_ = max(len(pe.dictionary), 1)
        key = si * np_ + pi
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # int64 scatter-sum, not float-weighted bincount: float64 partials
        # lose exactness past 2^53 on large batches.
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, inv, cents)
        return pa.table(
            {
                "c_mktsegment": se.dictionary.take(pa.array(uniq // np_, pa.int64())),
                "o_orderpriority": pe.dictionary.take(pa.array(uniq % np_, pa.int64())),
                "pcents": pa.array(c, pa.int64()),
                "pn": pa.array(n, pa.int64()),
            }
        )

    base = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Sum("pcents", alias_name="cents"), Sum("pn", alias_name="n_orders"))
    )

    def all_prio(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "o_orderpriority": pa.array(["ALL"] * batch.num_rows, pa.string()),
                "pcents": batch.column("cents"),
                "pn": batch.column("n_orders"),
            }
        )

    def all_both(batch: pa.Table) -> pa.Table:
        t = all_prio(batch)
        return t.set_column(
            0, "c_mktsegment", pa.array(["ALL"] * t.num_rows, pa.string())
        )

    lvl1 = (
        base.map_batches(all_prio, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Sum("pcents", alias_name="cents"), Sum("pn", alias_name="n_orders"))
    )
    lvl0 = (
        base.map_batches(all_both, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Sum("pcents", alias_name="cents"), Sum("pn", alias_name="n_orders"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "o_orderpriority": batch.column("o_orderpriority"),
                "revenue": pc.round(
                    pc.divide(batch.column("cents").cast(pa.float64()), 100.0),
                    ndigits=2,
                ),
                "n_orders": batch.column("n_orders").cast(pa.int64()),
            }
        )

    return (
        base.map_batches(
            lambda b: pa.table(
                {
                    "c_mktsegment": b.column("c_mktsegment"),
                    "o_orderpriority": b.column("o_orderpriority"),
                    "cents": b.column("cents"),
                    "n_orders": b.column("n_orders"),
                }
            ),
            batch_format="pyarrow",
        )
        .union(lvl1.map_batches(lambda b: b.select(["c_mktsegment", "o_orderpriority", "cents", "n_orders"]), batch_format="pyarrow"))
        .union(lvl0.map_batches(lambda b: b.select(["c_mktsegment", "o_orderpriority", "cents", "n_orders"]), batch_format="pyarrow"))
        .map_batches(finish, batch_format="pyarrow")
        # handful of rollup rows: deterministic output order
        .sort(["c_mktsegment", "o_orderpriority"])
    )


def group_median_ds(
    events: rd.Dataset, key_col: str = "event_type", val_col: str = "value"
) -> rd.Dataset:
    """Exact per-group median (even-count groups average the two middle
    values — the SQL median). Hash-partition by key, one vectorized
    np.partition inside each group. Partitioning assumption: one group's
    values fit a task (true for enum-like keys); the giant-group fallback
    is the histogram-refinement used by quantile_bucket_ds."""

    def med(group: pa.Table) -> pa.Table:
        v = group.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "median_value": pa.array(
                    [round(float(np.median(v)), 6)], pa.float64()
                ),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    return (
        events.select_columns([key_col, val_col])
        .groupby(key_col)
        .map_groups(med, batch_format="pyarrow")
        .sort(key_col)  # one row per group: deterministic output order
    )


def group_row_number_ds(
    ds: rd.Dataset,
    part_col: str,
    order_col: str,
    tiebreak_col: str,
    descending: bool = True,
    out_col: str = "rn",
) -> rd.Dataset:
    """``row_number() OVER (PARTITION BY part ORDER BY order [DESC],
    tiebreak ASC)`` — the partitioned window-rank operator Ray Data lacks.

    One hash shuffle on ``part_col``; inside each group the rank is a
    single numpy lexsort + inverse permutation (no Python per row).
    Partitioning assumption (same as group_median_ds): one partition's
    rows fit a task — true for enum-like keys; for giant partitions
    pre-bucket by a secondary range and offset ranks by bucket sizes
    (the pack_sequences prefix-scan shape)."""

    def rank(group: pa.Table) -> pa.Table:
        v = group.column(order_col).to_numpy(zero_copy_only=False)
        t = group.column(tiebreak_col).to_numpy(zero_copy_only=False)
        key = -v if descending else v
        order = np.lexsort((t, key))
        rn = np.empty(len(order), np.int64)
        rn[order] = np.arange(1, len(order) + 1)
        return group.append_column(out_col, pa.array(rn, pa.int64()))

    return ds.groupby(part_col).map_groups(rank, batch_format="pyarrow")


def group_lag_ds(
    ds: rd.Dataset,
    part_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "lag_val",
) -> rd.Dataset:
    """``lag(val) OVER (PARTITION BY part ORDER BY order)`` — previous
    row's value within the partition (null for the first row). Same
    single-shuffle + per-group numpy shape as group_row_number_ds."""

    def lag(group: pa.Table) -> pa.Table:
        o = group.column(order_col).to_numpy(zero_copy_only=False)
        v = group.column(val_col)
        order = np.argsort(o, kind="stable")
        prev = np.full(len(o), -1, np.int64)
        prev[order[1:]] = order[:-1]
        has = prev >= 0
        idx = pa.array(
            np.where(has, prev, 0).astype(np.int64), pa.int64()
        )
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        shifted = v.take(idx)
        out = pc.if_else(pa.array(has), shifted, pa.scalar(None, v.type))
        return group.append_column(out_col, out)

    return ds.groupby(part_col).map_groups(lag, batch_format="pyarrow")


def group_cumsum_ds(
    ds: rd.Dataset,
    part_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "running_sum",
) -> rd.Dataset:
    """``sum(val) OVER (PARTITION BY part ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` — per-partition running total, int64-exact (the order
    column must be unique within a partition, as with ROWS framing)."""

    def csum(group: pa.Table) -> pa.Table:
        o = group.column(order_col).to_numpy(zero_copy_only=False)
        v = group.column(val_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(o, kind="stable")
        run = np.empty(len(o), np.int64)
        run[order] = np.cumsum(v[order])
        return group.append_column(out_col, pa.array(run, pa.int64()))

    return ds.groupby(part_col).map_groups(csum, batch_format="pyarrow")


def group_moving_sum_ds(
    ds: rd.Dataset,
    part_col: str,
    order_col: str,
    val_col: str,
    window: int = 3,
    out_col: str = "moving_sum",
) -> rd.Dataset:
    """``sum(val) OVER (PARTITION BY part ORDER BY order ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` plus the actual in-frame row
    count — the sliding-frame window aggregate, int64-exact (emit the sum
    + count rather than the float average so the result is hash-stable;
    the caller divides if it wants the mean). Same single-shuffle +
    per-group vectorized shape as group_lag_ds: one cumsum and one
    shifted subtraction per partition."""

    def msum(group: pa.Table) -> pa.Table:
        o = group.column(order_col).to_numpy(zero_copy_only=False)
        v = group.column(val_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(o, kind="stable")
        n = len(o)
        cs = np.cumsum(v[order])
        sums = cs.copy()
        sums[window:] = cs[window:] - cs[:-window]
        cnt = np.minimum(np.arange(1, n + 1), window)
        out_s = np.empty(n, np.int64)
        out_c = np.empty(n, np.int64)
        out_s[order] = sums
        out_c[order] = cnt
        return group.append_column(
            out_col, pa.array(out_s, pa.int64())
        ).append_column("n_frame", pa.array(out_c, pa.int64()))

    return ds.groupby(part_col).map_groups(msum, batch_format="pyarrow")


def skew_hash_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    on: str,
    build_on: str | None = None,
    payload_cols: list[str] | None = None,
    hot_threshold: int = 100_000,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Skew-aware inner equi-join — the hot-key hybrid every hash-shuffle
    join needs at crawl scale: a handful of head keys (the 'null-ish'
    defaults, the hot domains) otherwise land every one of their rows in
    ONE join partition and wall-clock becomes that straggler.

    Plan: (1) exact probe-key histogram via the combiner pattern (keys
    only — one small row per key per batch); keys with count >=
    ``hot_threshold`` form the hot set (driver holds just that key list,
    bounded by n_rows/threshold). (2) build rows of hot keys are collected
    once and broadcast (ray.put); hot probe rows join them LOCALLY inside
    map_batches (Arrow hash join per batch — no shuffle, so the hot key's
    rows never concentrate anywhere). (3) cold rows of both sides go
    through Ray's native hash-shuffle join. Output = probe columns +
    build payload columns; both paths emit the identical schema and the
    union is the exact inner join (tested against the plain shuffle join
    on zipf-skewed keys)."""
    build_on = build_on or on

    hist = (
        probe.map_batches(
            lambda b: _key_counts(b, on), batch_format="pyarrow"
        )
        .groupby(on)
        .aggregate(Sum("pn", alias_name="n"))
    )
    hot_tbl = hist.filter(expr=f"n >= {hot_threshold}").to_pandas()
    # empty Dataset.to_pandas() loses columns — treat as "no hot keys"
    hot_vals = hot_tbl[on].to_numpy() if on in hot_tbl.columns else []
    hot_keys = pa.array(hot_vals, pa.int64())

    build_cols = [build_on, *(payload_cols or [])]
    build = build.select_columns(build_cols)
    probe_names = [n for n in probe.schema().names]
    out_names = probe_names + [c for c in build_cols if c != build_on]

    if len(hot_keys) == 0:
        joined = probe.join(
            build,
            join_type="inner",
            num_partitions=num_partitions,
            on=(on,),
            right_on=(build_on,),
        )
        return joined.map_batches(
            lambda b: b.select(out_names), batch_format="pyarrow"
        )

    hot_ref = ray.put(hot_keys)
    hot_build = _collect_arrow(
        build.map_batches(
            lambda b: b.filter(pc.is_in(b.column(build_on), value_set=hot_keys)),
            batch_format="pyarrow",
        )
    )
    hot_build_ref = ray.put(hot_build)

    def hot_join(batch: pa.Table) -> pa.Table:
        ks = ray.get(hot_ref)
        sub = batch.filter(pc.is_in(batch.column(on), value_set=ks))
        return sub.join(
            ray.get(hot_build_ref),
            keys=[on],
            right_keys=[build_on],
            join_type="inner",
        ).select(out_names)

    def cold_filter(key_col):
        def f(batch: pa.Table) -> pa.Table:
            ks = ray.get(hot_ref)
            return batch.filter(
                pc.invert(pc.is_in(batch.column(key_col), value_set=ks))
            )

        return f

    hot_out = probe.map_batches(hot_join, batch_format="pyarrow")

    # Ray 2.49's Acero join crashes on ANY empty input block (see
    # dedup._pin_blocks); the cold filters can empty blocks, so pin both
    # sides and keep one self-joining sentinel row to guarantee non-empty
    # typed input, dropped from the output.
    from search_engine_ray.pipelines.dedup import _SENTINEL, _pin_blocks

    def sentinel_row(schema: pa.Schema, key_col: str) -> rd.Dataset:
        row = {name: None for name in schema.names}
        row[key_col] = _SENTINEL
        return rd.from_arrow(pa.Table.from_pylist([row], schema=schema))

    p_schema = pa.schema(
        [(n, probe.schema().base_schema.field(n).type) for n in probe_names]
    )
    b_schema = pa.schema(
        [(n, build.schema().base_schema.field(n).type) for n in build_cols]
    )
    cold_p, _ = _pin_blocks(
        probe.map_batches(cold_filter(on), batch_format="pyarrow").union(
            sentinel_row(p_schema, on)
        ),
        p_schema,
    )
    cold_b, _ = _pin_blocks(
        build.map_batches(cold_filter(build_on), batch_format="pyarrow").union(
            sentinel_row(b_schema, build_on)
        ),
        b_schema,
    )
    cold = (
        cold_p.join(
            cold_b,
            join_type="inner",
            num_partitions=num_partitions,
            on=(on,),
            right_on=(build_on,),
        )
        .filter(expr=f"{on} != {_SENTINEL}")
        .map_batches(lambda b: b.select(out_names), batch_format="pyarrow")
    )
    return hot_out.union(cold)


def _key_counts(batch: pa.Table, on: str) -> pa.Table:
    k = batch.column(on).to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(k, return_counts=True)
    return pa.table(
        {
            on: pa.array(uniq, pa.int64()),
            "pn": pa.array(counts, pa.int64()),
        }
    )
