"""Windowed / event-time operators vs DuckDB at sf0.001 + edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from search_engine_ray.pipelines import windows as W

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return c


def _assert_frames_equal(r: pd.DataFrame, o: pd.DataFrame):
    cols = list(r.columns)
    assert set(cols) == set(o.columns)
    r = r.sort_values(cols).reset_index(drop=True)
    o = o[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(r, o)


def test_tumbling_window_matches_duckdb(ray_session, con):
    got = W.tumbling_window_ds(W.read_events(SF)).to_pandas()
    want = con.execute(
        """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*)::BIGINT AS n_events,
               sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
        FROM events GROUP BY 1,2
        """
    ).fetchdf()
    _assert_frames_equal(got, want)


def test_window_unique_users_matches_duckdb(ray_session, con):
    got = W.window_unique_users_ds(W.read_events(SF)).to_pandas()
    want = con.execute(
        """
        SELECT date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM events GROUP BY 1
        """
    ).fetchdf()
    _assert_frames_equal(got, want)


def test_session_windows_matches_duckdb(ray_session, con):
    got = W.session_windows_ds(W.read_events(SF)).to_pandas()
    want = con.execute(
        """
        WITH l AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        ), g AS (
          SELECT user_id, ts,
                 sum(CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts > INTERVAL '30 minutes'
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_no
          FROM l
        )
        SELECT user_id, session_no::BIGINT AS session_no,
               count(*)::BIGINT AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM g GROUP BY 1,2
        """
    ).fetchdf()
    _assert_frames_equal(got, want)


def test_asof_prev_event_matches_duckdb(ray_session, con):
    got = W.asof_prev_event_ds(W.read_events(SF)).to_pandas()
    want = con.execute(
        """
        SELECT e.event_id, s.event_id AS matched_event_id,
               CASE WHEN s.event_id IS NULL THEN NULL
                    ELSE epoch_us(e.ts) - epoch_us(s.ts) END AS us_since_match
        FROM events e ASOF LEFT JOIN (
          SELECT user_id, ts, max(event_id) AS event_id
          FROM events WHERE event_type='signup' GROUP BY 1,2
        ) s ON e.user_id = s.user_id AND e.ts >= s.ts
        """
    ).fetchdf()
    got["matched_event_id"] = got["matched_event_id"].astype("float64")
    want["matched_event_id"] = want["matched_event_id"].astype("float64")
    got["us_since_match"] = got["us_since_match"].astype("float64")
    want["us_since_match"] = want["us_since_match"].astype("float64")
    _assert_frames_equal(got, want)


def test_range_join_matches_duckdb(ray_session, con):
    got = W.incident_range_join_ds(W.read_events(SF)).to_pandas()
    want = con.execute(
        """
        WITH hot AS (
          SELECT date_trunc('hour', ts) AS h
          FROM events WHERE event_type = 'error'
          GROUP BY 1 HAVING count(*) >= 2
        ), iv AS (
          SELECT h - INTERVAL '30 minutes' AS s,
                 h + INTERVAL '90 minutes' AS e FROM hot
        )
        SELECT DISTINCT e.event_id
        FROM events e JOIN iv ON e.ts >= iv.s AND e.ts < iv.e
        """
    ).fetchdf()
    assert len(got) > 0  # the threshold must bite at this SF
    _assert_frames_equal(got, want)


def test_range_join_interval_merge_and_bounds(ray_session):
    # two hot hours 1h apart -> padded intervals overlap and merge; events
    # at the merged bounds: start inclusive, end exclusive
    H = 3600 * M
    rows = []
    eid = 0
    for h in (10, 11):  # hot hours at 10:00 and 11:00
        for k in range(2):
            rows.append((eid, h * H + k * M, 99, "error", 1.0))
            eid += 1
    rows += [
        (100, 10 * H - 30 * 60 * M, 1, "click", 1.0),  # merged start: in
        (101, 10 * H - 30 * 60 * M - 1, 1, "click", 1.0),  # just before: out
        (102, 12 * H + 30 * 60 * M - 1, 1, "click", 1.0),  # last us in
        (103, 12 * H + 30 * 60 * M, 1, "click", 1.0),  # merged end: out
        (104, 11 * H, 1, "click", 1.0),  # inside the gap-bridged middle
    ]
    out = W.incident_range_join_ds(_events_ds(rows)).to_pandas()
    ids = set(out["event_id"].tolist())
    assert {100, 102, 104, 0, 1, 2, 3} <= ids
    assert 101 not in ids and 103 not in ids


def _events_ds(rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    return rd.from_arrow(t)


M = 1_000_000  # 1 second in us


def test_session_gap_boundary_is_strict(ray_session):
    # gap == exactly 1800s keeps the session; 1800s + 1us splits it.
    rows = [
        (0, 0, 1, "click", 1.0),
        (1, 1800 * M, 1, "click", 1.0),  # exactly the gap -> same session
        (2, 1800 * M + 1800 * M + 1, 1, "click", 1.0),  # gap+1us -> new session
    ]
    out = (
        W.session_windows_ds(_events_ds(rows))
        .to_pandas()
        .sort_values("session_no")
        .reset_index(drop=True)
    )
    assert out["session_no"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [2, 1]


def test_session_multiple_users_one_group_chunk(ray_session):
    # two users landing in the same map_groups chunk stay separate
    rows = [(i, i * M, i % 2, "click", 1.0) for i in range(10)]
    out = W.session_windows_ds(_events_ds(rows)).to_pandas()
    assert sorted(out["user_id"].unique().tolist()) == [0, 1]
    assert (out.groupby("user_id")["n_events"].sum() == 5).all()


def test_asof_inclusive_and_tie_break(ray_session):
    # event at the exact signup ts matches it (inclusive); two signups at
    # the same ts resolve to max event_id; events before any signup -> null
    rows = [
        (0, 10 * M, 1, "click", 1.0),  # before any signup -> null
        (1, 20 * M, 1, "signup", 1.0),
        (2, 20 * M, 1, "signup", 1.0),  # same-ts dup, max event_id wins
        (3, 20 * M, 1, "click", 1.0),  # at signup ts -> inclusive match
        (4, 50 * M, 1, "click", 1.0),
    ]
    out = (
        W.asof_prev_event_ds(_events_ds(rows))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert pd.isna(out.loc[0, "matched_event_id"])
    assert out.loc[3, "matched_event_id"] == 2
    assert out.loc[4, "matched_event_id"] == 2
    assert out.loc[4, "us_since_match"] == 30 * M


def test_tumbling_sum_is_exact_cents(ray_session):
    rows = [(i, 0, 1, "click", 0.01) for i in range(3)]
    out = W.tumbling_window_ds(_events_ds(rows)).to_pandas()
    assert out["sum_value"].tolist() == [0.03]
    assert out["n_events"].tolist() == [3]


def test_json_field_stats_edge_cases(ray_session):
    """Missing field, negative values, extra fields, NULL aggregate
    semantics for types with no extractable value."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.windows import json_field_stats_ds

    events = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b", "b"], pa.string()),
                "props": pa.array(
                    [
                        '{"k": 5}',
                        '{"x": 1, "k": -3, "y": 2}',
                        '{"x": 9}',  # no k: counted, excluded from stats
                        '{"nope": 1}',
                        '{"also": 2}',
                    ],
                    pa.string(),
                ),
            }
        )
    )
    got = (
        json_field_stats_ds(events)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == [3, 2]
    assert got["sum_k"].tolist() == [2, 0]
    assert got["min_k"].tolist()[0] == -3 and got["max_k"].tolist()[0] == 5
    assert got["min_k"].isna().tolist() == [False, True]


def test_hopping_window_covers_tumbling(ray_session):
    """width == hop degenerates to the tumbling window; width = 4*hop gives
    each event exactly 4 windows (row replication checked via sums)."""
    from search_engine_ray.pipelines.windows import (
        hopping_window_ds,
        read_events,
        tumbling_window_ds,
    )

    ev = read_events(SF)
    hop_eq = (
        hopping_window_ds(ev, width_secs=3600, hop_secs=3600)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    tumb = (
        tumbling_window_ds(ev, width="hour")
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert hop_eq["n_events"].tolist() == tumb["n_events"].tolist()
    assert hop_eq["sum_value"].tolist() == tumb["sum_value"].tolist()

    hop4 = hopping_window_ds(ev, width_secs=3600, hop_secs=900).to_pandas()
    assert hop4["n_events"].sum() == 4 * tumb["n_events"].sum()


def test_hopping_window_rejects_ragged(ray_session):
    import pytest as _pytest

    from search_engine_ray.pipelines.windows import hopping_window_ds, read_events

    with _pytest.raises(ValueError):
        hopping_window_ds(read_events(SF), width_secs=3600, hop_secs=1000)


def test_funnel_stages_semantics(ray_session):
    """Strict ordering: same-timestamp steps don't progress; greedy
    earliest matching completes whenever any ordered subsequence exists."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.windows import funnel_stages_ds

    def ev(uid, us, et):
        return {"user_id": uid, "ts": us, "event_type": et}

    rows = [
        # u1 completes: view@1 click@2 purchase@3
        ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "purchase"),
        # u2 stalls at click (purchase BEFORE click)
        ev(2, 1, "view"), ev(2, 5, "click"), ev(2, 4, "purchase"),
        # u3: same-timestamp click does not count (strict >)
        ev(3, 7, "view"), ev(3, 7, "click"),
        # u4: only unrelated events -> stage 0
        ev(4, 1, "error"),
        # u5: completes via the LATER view (greedy earliest still finds it)
        ev(5, 10, "view"), ev(5, 11, "click"), ev(5, 12, "purchase"),
        ev(5, 1, "view"),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        }
    )
    got = (
        funnel_stages_ds(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("user_id")["funnel_stage"]
    )
    assert got.to_dict() == {1: 3, 2: 2, 3: 1, 4: 0, 5: 3}
