"""Equi-join operators (pipelines/relational.py) vs DuckDB at sf0.001.

The reference has only point-lookup joins (SURVEY §2.4); these cover the
engine's general equi-join surface: broadcast hash join (small build side,
ray.put once) and Ray Data's native hash-shuffle join, tested equivalent.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _sql(q):
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(q).df()


def test_broadcast_join_inner(ray_session):
    from search_engine_ray.pipelines.relational import broadcast_hash_join

    orders = rd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    customer = rd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    got = (
        broadcast_hash_join(orders, customer, on="o_custkey", build_on="c_custkey")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = _sql(
        """
        SELECT o_orderkey, o_custkey, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
        """
    )
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["c_mktsegment"].tolist() == want["c_mktsegment"].tolist()


def test_broadcast_join_left_keeps_unmatched(ray_session):
    from search_engine_ray.pipelines.relational import broadcast_hash_join

    probe = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "x": pa.array(list("abc"))})
    )
    build = pa.table(
        {"k": pa.array([1, 3], pa.int64()), "v": pa.array(["p", "q"])}
    )
    got = (
        broadcast_hash_join(probe, build, on="k", how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["v"].tolist()[0] == "p"
    assert pd.isna(got["v"].tolist()[1])
    assert got["v"].tolist()[2] == "q"


def test_broadcast_join_rejects_duplicate_build_keys(ray_session):
    from search_engine_ray.pipelines.relational import broadcast_hash_join

    probe = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    build = pa.table({"k": pa.array([1, 1], pa.int64()), "v": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="duplicate keys"):
        broadcast_hash_join(probe, build, on="k")


def test_segment_revenue_strategies_agree_and_match_sql(ray_session):
    from search_engine_ray.pipelines.relational import segment_revenue_ds

    want = _sql(
        """
        SELECT c_mktsegment,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
                 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY c_mktsegment
        """
    )
    for strategy in ("broadcast", "shuffle"):
        got = (
            segment_revenue_ds(SF, strategy=strategy)
            .to_pandas()
            .sort_values("c_mktsegment")
            .reset_index(drop=True)
        )
        assert got["c_mktsegment"].tolist() == want["c_mktsegment"].tolist(), strategy
        assert got["revenue"].tolist() == want["revenue"].tolist(), strategy


def test_pricing_summary_matches_sql(ray_session):
    from search_engine_ray.pipelines.relational import pricing_summary_ds

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    want = con.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round(l_quantity) AS BIGINT))::DOUBLE AS sum_qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))::DOUBLE / 100.0
                 AS sum_base_price,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))::DOUBLE
                 / 10000.0 AS sum_disc_price,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   * (100 + CAST(round(l_tax * 100) AS BIGINT)))::DOUBLE
                 / 1000000.0 AS sum_charge,
               count(*)::BIGINT AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    got = (
        pricing_summary_ds(SF)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # sanity vs the PLAIN-float TPC-H Q1 formula (catches divisor-scale bugs
    # that a matching integer-cent mirror would hide)
    plain = con.sql(
        """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS d,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS c
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY 1
        """
    ).df()
    assert abs(sorted(got["sum_disc_price"])[0] - plain["d"].iloc[0]) < 1.0
    assert abs(sorted(got["sum_charge"])[0] - sorted(plain["c"])[0]) < 1.0


def test_semi_anti_join_strategies_agree(ray_session):
    """Broadcast pc.is_in path == Ray native left_semi/left_anti shuffle
    join, for both semi and anti, on the customer/orders keys."""
    import ray.data as rd

    from search_engine_ray.pipelines.relational import (
        broadcast_semi_anti_join,
        shuffle_semi_anti_join,
    )

    sf = "/root/testdata/sf0.001"
    cust = rd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    urgent = rd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).filter(expr="o_orderpriority == '1-URGENT'")
    for anti in (False, True):
        a = (
            broadcast_semi_anti_join(
                cust, urgent, on="c_custkey", build_on="o_custkey", anti=anti
            )
            .to_pandas()
            .sort_values("c_custkey")["c_custkey"]
            .tolist()
        )
        b = (
            shuffle_semi_anti_join(
                cust, urgent, on="c_custkey", right_on="o_custkey", anti=anti
            )
            .to_pandas()
            .sort_values("c_custkey")["c_custkey"]
            .tolist()
        )
        assert a == b, f"anti={anti}"
    # sanity: semi + anti partition the probe side
    n = cust.count()
    semi = broadcast_semi_anti_join(
        cust, urgent, on="c_custkey", build_on="o_custkey", anti=False
    ).count()
    anti_n = broadcast_semi_anti_join(
        cust, urgent, on="c_custkey", build_on="o_custkey", anti=True
    ).count()
    assert semi + anti_n == n


def test_revenue_rollup_levels_consistent(ray_session):
    """Each rollup level sums to the grand total; levels derive from the
    base aggregate so cents are exact."""
    from search_engine_ray.pipelines.relational import revenue_rollup_ds

    df = revenue_rollup_ds("/root/testdata/sf0.001").to_pandas()
    total = df[(df.c_mktsegment == "ALL") & (df.o_orderpriority == "ALL")]
    assert len(total) == 1
    base = df[(df.c_mktsegment != "ALL") & (df.o_orderpriority != "ALL")]
    lvl1 = df[(df.c_mktsegment != "ALL") & (df.o_orderpriority == "ALL")]
    assert base["n_orders"].sum() == total["n_orders"].iloc[0]
    assert lvl1["n_orders"].sum() == total["n_orders"].iloc[0]
    assert abs(base["revenue"].sum() - total["revenue"].iloc[0]) < 0.01 * len(base)


def test_group_median_matches_numpy(ray_session):
    import numpy as _np
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.relational import group_median_ds
    from search_engine_ray.pipelines.windows import read_events

    got = (
        group_median_ds(read_events("/root/testdata/sf0.001"))
        .to_pandas()
        .set_index("event_type")
    )
    t = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    for et, grp in t.groupby("event_type"):
        assert got.loc[et, "median_value"] == round(float(_np.median(grp["value"])), 6)
        assert got.loc[et, "n"] == len(grp)


def test_skew_join_matches_native_on_zipf_keys(ray_session):
    """Hybrid hot/cold split == plain shuffle join, on heavily skewed keys
    (hot path and cold path both exercised), and with no hot keys at all."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.relational import (
        shuffle_hash_join,
        skew_hash_join,
    )

    rng = np.random.default_rng(5)
    keys = np.minimum(rng.zipf(1.5, size=5000) - 1, 30).astype(np.int64)
    probe = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "pv": pa.array(np.arange(5000), pa.int64()),
            }
        )
    ).repartition(6)
    build = rd.from_arrow(
        pa.table(
            {
                "bk": pa.array(np.arange(31), pa.int64()),
                "label": pa.array([f"n{i}" for i in range(31)], pa.string()),
            }
        )
    )
    want = (
        shuffle_hash_join(probe, build, on="k", right_on="bk")
        .to_pandas()
        .sort_values(["k", "pv"])[["k", "pv", "label"]]
        .reset_index(drop=True)
    )
    for threshold in (200, 10**9):  # with hot keys, and all-cold
        got = (
            skew_hash_join(
                probe, build, on="k", build_on="bk",
                payload_cols=["label"], hot_threshold=threshold,
            )
            .to_pandas()
            .sort_values(["k", "pv"])[["k", "pv", "label"]]
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_skew_join_drops_unmatched_hot_keys(ray_session):
    """A HOT probe key absent from the build side must be dropped (inner-join
    semantics), not emitted with null payload — the hot path's pa.Table.join
    defaults to left-outer without an explicit join_type."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.relational import (
        shuffle_hash_join,
        skew_hash_join,
    )

    rng = np.random.default_rng(7)
    keys = np.minimum(rng.zipf(1.5, size=5000) - 1, 30).astype(np.int64)
    probe = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "pv": pa.array(np.arange(5000), pa.int64()),
            }
        )
    ).repartition(6)
    # key 0 is the hottest zipf key (count >> 200) and is MISSING here
    build = rd.from_arrow(
        pa.table(
            {
                "bk": pa.array(np.arange(1, 31), pa.int64()),
                "label": pa.array([f"n{i}" for i in range(1, 31)], pa.string()),
            }
        )
    )
    assert int((keys == 0).sum()) >= 200  # 0 really is hot
    got = (
        skew_hash_join(
            probe, build, on="k", build_on="bk",
            payload_cols=["label"], hot_threshold=200,
        )
        .to_pandas()
        .sort_values(["k", "pv"])[["k", "pv", "label"]]
        .reset_index(drop=True)
    )
    assert not (got["k"] == 0).any()
    assert got["label"].notna().all()
    want = (
        shuffle_hash_join(probe, build, on="k", right_on="bk")
        .to_pandas()
        .sort_values(["k", "pv"])[["k", "pv", "label"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_group_row_number_matches_pandas(ray_session):
    """row_number per partition (order desc, tiebreak asc) == pandas
    groupby rank reference, including duplicate order values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.relational import group_row_number_ds

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "grp": rng.choice(["a", "b", "c"], size=n),
            "val": rng.integers(0, 50, size=n).astype(np.int64),  # many ties
        }
    )
    got = (
        group_row_number_ds(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5),
            part_col="grp", order_col="val", tiebreak_col="id",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["grp", "val", "id"], ascending=[True, False, True])
    want["rn"] = want.groupby("grp").cumcount() + 1
    want = want.sort_values("id").reset_index(drop=True)
    assert got["rn"].tolist() == want["rn"].tolist()


def test_group_lag_and_cumsum_match_pandas(ray_session):
    """lag + running-sum window ops == pandas groupby shift/cumsum, with
    nulls for each partition's first row and exact int64 running totals."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.relational import group_cumsum_ds, group_lag_ds

    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame(
        {
            "part": rng.choice([10, 20, 30], size=n).astype(np.int64),
            "ord": np.arange(n, dtype=np.int64),
            "val": rng.integers(-100, 100, size=n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    lag = (
        group_lag_ds(ds, part_col="part", order_col="ord", val_col="val")
        .to_pandas().sort_values("ord").reset_index(drop=True)
    )
    want_lag = df.groupby("part")["val"].shift(1)
    assert lag["lag_val"].isna().equals(want_lag.isna())
    assert (lag["lag_val"].dropna() == want_lag.dropna()).all()

    cs = (
        group_cumsum_ds(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6),
            part_col="part", order_col="ord", val_col="val",
        )
        .to_pandas().sort_values("ord").reset_index(drop=True)
    )
    want_cs = df.groupby("part")["val"].cumsum()
    assert cs["running_sum"].tolist() == want_cs.tolist()


def test_group_moving_sum(ray_session):
    """3-row frame sums and in-frame counts, partition-isolated, order by
    the (unique) order column regardless of input row order."""
    import ray.data as rd

    from search_engine_ray.pipelines.relational import group_moving_sum_ds

    rows = [
        {"u": 1, "o": 3, "v": 30},
        {"u": 1, "o": 1, "v": 10},
        {"u": 1, "o": 2, "v": 20},
        {"u": 1, "o": 4, "v": 40},
        {"u": 2, "o": 1, "v": 5},
    ]
    out = (
        group_moving_sum_ds(
            rd.from_items(rows), part_col="u", order_col="o", val_col="v", window=3
        )
        .to_pandas()
        .sort_values(["u", "o"])
        .reset_index(drop=True)
    )
    assert out["moving_sum"].tolist() == [10, 30, 60, 90, 5]
    assert out["n_frame"].tolist() == [1, 2, 3, 3, 1]
