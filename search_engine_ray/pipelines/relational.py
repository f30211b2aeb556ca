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
    """Materialize a SMALL dataset into one Arrow table (build sides only)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
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

    return agg.map_batches(finish, batch_format="pyarrow")
