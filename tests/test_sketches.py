"""HyperLogLog distinct sketch: accuracy vs exact, batching-invariance."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _events_ds():
    return rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])


def test_hll_close_to_exact(ray_session):
    from search_engine_ray.pipelines.sketches import hll_distinct_ds

    got = (
        hll_distinct_ds(_events_ds(), "event_type", "user_id")
        .to_pandas()
        .set_index("event_type")["distinct_est"]
    )
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT event_type, count(DISTINCT user_id) AS n
            FROM '{SF}/events.parquet' GROUP BY event_type"""
    ).df().set_index("event_type")["n"]
    assert set(got.index) == set(want.index)
    for k in want.index:
        # m=4096 -> ~1.6% sigma; 5% is > 3 sigma
        assert abs(got[k] - want[k]) <= max(0.05 * want[k], 2), (k, got[k], want[k])


def test_hll_batching_invariant(ray_session):
    """Registers merge associatively: any block split yields the identical
    estimate (determinism under retries/repartitioning)."""
    from search_engine_ray.pipelines.sketches import hll_distinct_ds

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 5000, size=20_000, dtype=np.int64)
    keys = np.where(vals % 2 == 0, "a", "b")
    tbl = pa.table(
        {"k": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())}
    )
    results = []
    for blocks in (1, 7, 64):
        ds = rd.from_arrow(tbl).repartition(blocks)
        out = (
            hll_distinct_ds(ds, "k", "v")
            .to_pandas()
            .sort_values("k")["distinct_est"]
            .tolist()
        )
        results.append(out)
    assert results[0] == results[1] == results[2]


def test_hll_exact_small_range(ray_session):
    """Linear-counting regime: tiny cardinalities are near-exact."""
    from search_engine_ray.pipelines.sketches import hll_distinct_ds

    tbl = pa.table(
        {
            "k": pa.array(["x"] * 100, pa.string()),
            "v": pa.array(list(range(10)) * 10, pa.int64()),
        }
    )
    out = hll_distinct_ds(rd.from_arrow(tbl), "k", "v").to_pandas()
    assert out["distinct_est"].tolist() == [10]
