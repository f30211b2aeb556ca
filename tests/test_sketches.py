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


def test_count_min_properties(ray_session):
    """CM never underestimates any term; estimates are exact for terms
    with no collisions at this width; the merged sketch is invariant to
    batching/partitioning (associative partials)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.sketches import (
        cm_estimate,
        count_min_token_sketch,
    )

    rng = np.random.default_rng(4)
    vocab = [f"term{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(200)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    grid1, total1 = count_min_token_sketch(rd.from_arrow(t), width=1 << 12)
    grid2, total2 = count_min_token_sketch(
        rd.from_arrow(t).repartition(7), width=1 << 12
    )
    assert total1 == total2 == 200 * 30
    assert (grid1 == grid2).all()

    from collections import Counter

    true = Counter(w for s in texts for w in s.split())
    terms = pa.array(vocab, pa.string())
    est = cm_estimate(grid1, terms)
    tv = np.array([true[v] for v in vocab])
    assert (est >= tv).all()          # CM never underestimates
    assert (est - tv <= 4).all()      # 50 terms in 4096 buckets: ~no collisions


def test_logbin_binning_properties():
    """Binning is monotonic, exact at powers of two, and every value sits
    within 1/bpo relative width above its bin's lower edge — incl. the
    uint64 extremes the shift paths must handle."""
    from search_engine_ray.pipelines.sketches import _logbin_edge, _logbin_index

    v = np.unique(
        np.concatenate(
            [
                np.arange(0, 5000, dtype=np.int64),
                2 ** np.arange(1, 63, dtype=np.int64),
                2 ** np.arange(4, 63, dtype=np.int64) + 12345,
                np.array([2**63 - 1], np.int64),
            ]
        )
    )
    b = _logbin_index(v, 4)
    assert (np.diff(b) >= 0).all()
    e = _logbin_edge(b, 4)
    pos = v > 0
    assert (e[pos] <= v[pos]).all()
    assert (v[pos] < e[pos] * (1 + 1 / 16) + 1).all()
    assert b[v == 0][0] == 0 and e[v == 0][0] == 0.0


def test_logbin_quantile_sketch_matches_exact_bins(ray_session):
    """Sketch bin == bin of the exact k-th smallest, per key, on a skewed
    multi-block dataset; est is the bin lower edge (<= exact); result is
    batching-invariant."""
    from search_engine_ray.pipelines.sketches import (
        _logbin_edge,
        _logbin_index,
        logbin_quantile_sketch_ds,
    )

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            rng.zipf(1.6, 4000).astype(np.int64),  # heavy tail
            np.zeros(50, np.int64),  # zero bin
            np.full(100, 10**9, np.int64),  # far outliers
        ]
    )
    keys = np.where(np.arange(len(vals)) % 3 == 0, "a", "b")
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    qs = (0.1, 0.5, 0.9, 0.99)

    outs = []
    for n_blocks in (1, 17):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        df = (
            logbin_quantile_sketch_ds(ds, "k", "v", quantiles=qs)
            .to_pandas()
            .sort_values(["k", "q_pct"])
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])

    got = outs[0]
    for key in ("a", "b"):
        kv = np.sort(vals[keys == key])
        for q in qs:
            k_rank = max(int(np.ceil(q * len(kv))), 1)
            exact = kv[k_rank - 1]
            row = got[(got["k"] == key) & (got["q_pct"] == int(q * 100))]
            assert int(row["bin"].iloc[0]) == int(_logbin_index(np.array([exact]), 4)[0])
            assert float(row["est"].iloc[0]) <= exact
            if exact > 0:
                assert exact < float(row["est"].iloc[0]) * (1 + 1 / 16) + 1


def test_logbin_index_property():
    """Property: for random uint63 values, binning is order-preserving and
    the edge bound est <= v < est * (1 + 1/bpo) holds at every log2_bpo."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_ray.pipelines.sketches import _logbin_edge, _logbin_index

    # values capped at 2^53: above that the TEST's float comparison rounds
    # (int64 -> float64), not the binning itself — the uint64 extremes are
    # pinned exactly in test_logbin_binning_properties
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**53 - 1), min_size=1, max_size=50),
        st.integers(min_value=0, max_value=6),
    )
    def check(vals, log2_bpo):
        v = np.array(sorted(vals), np.int64)
        b = _logbin_index(v, log2_bpo)
        assert (np.diff(b) >= 0).all()
        e = _logbin_edge(b, log2_bpo)
        pos = v > 0
        assert (e[pos] <= v[pos]).all()
        # +1 absorbs float rounding of the edge at the uint64 extremes
        assert (v[pos] < e[pos] * (1 + 1 / (1 << log2_bpo)) + 1).all()
        assert (b[v == 0] == 0).all()

    check()


def test_logbin_quantile_sketch_null_rows_excluded(ray_session):
    """Null keys / null values are excluded (SQL aggregate convention),
    and an int64 key column works (typed empty fallback keeps key type)."""
    from search_engine_ray.pipelines.sketches import logbin_quantile_sketch_ds

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, None, 2, 2], pa.int64()),
            "v": pa.array([4, 8, None, 100, 16, 32], pa.int64()),
        }
    )
    got = (
        logbin_quantile_sketch_ds(
            rd.from_arrow(tbl).repartition(4), "k", "v", quantiles=(0.5, 1.0)
        )
        .to_pandas()
        .sort_values(["k", "q_pct"])
        .reset_index(drop=True)
    )
    # k=1 sees {4, 8} (null v dropped): median=4, max=8; k=2 sees {16, 32};
    # the null-key row (v=100) appears nowhere
    assert got["k"].tolist() == [1, 1, 2, 2]
    assert got["est"].tolist() == [4.0, 8.0, 16.0, 32.0]


def test_hll_window_within_bound_and_merge_invariance(ray_session):
    """Windowed HLL: every hourly window's estimate within 5% of the
    exact distinct count, invariant to input partitioning (register max
    is associative)."""
    from search_engine_ray.pipelines.sketches import hll_window_ds
    from search_engine_ray.pipelines.windows import read_events

    sf = "/root/testdata/sf0.001"
    ev = read_events(sf, columns=["ts", "user_id"])
    got = hll_window_ds(ev, width="hour").to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"""SELECT date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id)::BIGINT AS exact
            FROM '{sf}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    m = got.merge(exact, on="window_start")
    assert len(m) == len(got) == len(exact)
    err = (m["distinct_est"] - m["exact"]).abs()
    ok = (err <= 3) | (err / m["exact"] <= 0.05)
    assert ok.all(), (err.max(), (err / m["exact"]).max())
    # partitioning invariance
    got2 = hll_window_ds(ev.repartition(13), width="hour").to_pandas()
    assert got2["distinct_est"].tolist() == got["distinct_est"].tolist()


def test_mg_compress_properties():
    """Compress keeps <= k counters, subtracts the (k+1)-th largest, and
    never raises any counter."""
    from search_engine_ray.pipelines.sketches import _mg_compress

    terms = np.array([f"t{i}" for i in range(10)], dtype=object)
    counts = np.array([10, 9, 8, 7, 6, 5, 4, 3, 2, 1], dtype=np.int64)
    t, c = _mg_compress(terms, counts, k=3)
    # (k+1)-th largest = 7 -> survivors 10-7, 9-7, 8-7
    assert t.tolist() == ["t0", "t1", "t2"]
    assert c.tolist() == [3, 2, 1]
    # k >= len: identity
    t2, c2 = _mg_compress(terms, counts, k=20)
    assert len(t2) == 10


def test_misra_gries_deterministic_bounds(ray_session):
    """est <= true <= est + n//(k+1) for every counter, and every term with
    true count > n//(k+1) is present — checked against exact counts."""
    from search_engine_ray.pipelines.sketches import misra_gries_sketch

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    terms, est, n = misra_gries_sketch(docs, k=64)
    con = duckdb.connect()
    exact = con.execute(
        f"""
        SELECT term, count(*)::BIGINT AS c FROM (
          SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
          FROM '{SF}/documents.parquet')
        WHERE length(term) >= 2 GROUP BY term
        """
    ).fetchdf()
    true = dict(zip(exact["term"], exact["c"]))
    assert n == int(exact["c"].sum())
    bound = n // 65
    assert len(terms) <= 64
    for t, e in zip(terms, est):
        assert e <= true[t], (t, e, true[t])
        assert true[t] - e <= bound, (t, e, true[t], bound)
    lut = dict(zip(terms.tolist(), est.tolist()))
    for t, c in true.items():
        if c > bound:
            assert t in lut, (t, c, bound)


def test_misra_gries_batching_invariant(ray_session):
    """Guarantees hold regardless of block layout (merge associativity):
    a 1-row-per-block layout gives the same presence set for heavy terms."""
    from search_engine_ray.pipelines.sketches import misra_gries_sketch

    rows = (
        [{"text": "alpha beta"}] * 40
        + [{"text": "alpha gamma"}] * 30
        + [{"text": f"noise{i} filler{i}" } for i in range(50)]
    )
    ds_many = rd.from_items(rows).repartition(25)
    terms, est, n = misra_gries_sketch(ds_many, k=8)
    lut = dict(zip(terms.tolist(), est.tolist()))
    assert n == 240
    bound = n // 9
    assert "alpha" in lut and lut["alpha"] <= 70 and 70 - lut["alpha"] <= bound
    assert "beta" in lut and lut["beta"] <= 40 and 40 - lut["beta"] <= bound
