"""Windowed / streaming-style operators over the ``events`` table.

The reference engine has no event-time operators, but the brief's
large-scale training-data pipeline needs them (windowed aggregates,
sessionization, as-of joins). Each operator here is expressed
Ray-Data-first:

- tumbling aggregates use the combiner pattern: a per-batch partial
  groupby (numpy factorize + bincount) so the all-to-all shuffle carries
  one row per (window, key) per batch, not one per event;
- sessionization and the as-of join need *per-user event-time order*, so
  they hash-partition by ``user_id`` (``groupby(user_id).map_groups``)
  and sort only inside each group. Partitioning assumption: one user's
  events fit in one task's memory (true for web event logs, where even a
  pathological user is millions of rows, not billions). Hot users could
  be salted by day if that breaks.

Monetary sums are computed in integer cents (``round(value * 100)``)
and divided by 100.0 once at the end, so the result is independent of
summation order — float64 partial sums would make the driver's
value-hash comparison flaky.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def read_events(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns or ["event_id", "ts", "user_id", "event_type", "value"],
    )


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column -> int64 microseconds numpy array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window_ds(events: rd.Dataset, width: str = "hour") -> rd.Dataset:
    """Tumbling-window aggregate per (window_start, event_type):
    event count and exact value sum. Combiner inside map_batches, then a
    small groupby-sum over (n_windows x n_types) rows per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        # int64-us window key through the shuffle (Ray's aggregate sort
        # downcasts timestamp keys); cast back to timestamp[us] in finish.
        win = pc.floor_temporal(batch.column("ts"), unit=width)
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        wus = win.cast(pa.int64()).to_numpy(zero_copy_only=False)
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tcodes = etype.dictionary_encode()
        ti = tcodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(tcodes.dictionary)
        key = wus * nt + ti
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        csum = np.bincount(inv, weights=cents, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "window_us": pa.array(uniq // nt, pa.int64()),
                "event_type": tcodes.dictionary.take(pa.array(uniq % nt, pa.int64())),
                "pn": pa.array(n, pa.int64()),
                "pcents": pa.array(csum, pa.int64()),
            }
        )

    agg = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Sum("pn", alias_name="n_events"), Sum("pcents", alias_name="cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("window_us")
                .cast(pa.int64())
                .cast(pa.timestamp("us")),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "sum_value": pc.divide(
                    batch.column("cents").cast(pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def window_unique_users_ds(events: rd.Dataset, width: str = "hour") -> rd.Dataset:
    """Distinct users per tumbling window (hourly actives). Two shuffles,
    both shrunk by per-batch distinct: (window, user) pairs dedup to one
    row globally, then a count per window."""

    def pairs(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=width)
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        w = win.cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        key = np.stack([w, u], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {
                "window_us": pa.array(uniq[:, 0], pa.int64()),
                "user_id": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    distinct = (
        events.map_batches(pairs, batch_format="pyarrow")
        .groupby(["window_us", "user_id"])
        .aggregate(Count(alias_name="_c"))
    )

    def partial(batch: pa.Table) -> pa.Table:
        win = batch.column("window_us")
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        wus = win.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(wus, return_counts=True)
        return pa.table(
            {
                "window_us": pa.array(uniq, pa.int64()),
                "pu": pa.array(counts, pa.int64()),
            }
        )

    agg = (
        distinct.map_batches(partial, batch_format="pyarrow")
        .groupby("window_us")
        .aggregate(Sum("pu", alias_name="n_users"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("window_us")
                .cast(pa.int64())
                .cast(pa.timestamp("us")),
                "n_users": batch.column("n_users").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def session_windows_ds(events: rd.Dataset, gap_secs: int = 1800) -> rd.Dataset:
    """Gap-based sessionization per user: a new session starts when the
    time since the user's previous event exceeds ``gap_secs`` (strict).
    Hash-partitioned by user_id; per-group work is a vectorized sort +
    diff + cumsum. Returns one row per (user_id, session_no)."""
    gap_us = int(gap_secs) * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = _ts_us(group.column("ts"))
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        # map_groups may hand us a coalesced batch of several groups;
        # lexsort (user, ts, event_id) keeps each user contiguous.
        order = np.lexsort((eid, ts, uid))
        ts, eid, uid = ts[order], eid[order], uid[order]
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            same_user = uid[1:] == uid[:-1]
            new[1:] = ~same_user | (ts[1:] - ts[:-1] > gap_us)
        sid = np.cumsum(new)  # session counter over this whole chunk
        # 1-based per-user session_no = sid - sid_at_user_first_row + 1
        boundaries = np.r_[True, uid[1:] != uid[:-1]] if len(ts) else new[:0]
        first_sid_of_user = np.maximum.accumulate(np.where(boundaries, sid, 0))
        session_no = sid - first_sid_of_user + 1
        # aggregate per (uid, sid): count, min ts, max ts
        seg_start = np.flatnonzero(new)
        seg_end = np.r_[seg_start[1:], len(ts)]
        return pa.table(
            {
                "user_id": pa.array(uid[seg_start], pa.int64()),
                "session_no": pa.array(session_no[seg_start], pa.int64()),
                "n_events": pa.array(seg_end - seg_start, pa.int64()),
                "session_start": pa.array(ts[seg_start], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(ts[seg_end - 1], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def incident_range_join_ds(
    events: rd.Dataset, min_errors: int = 2, pad_mins: int = 30
) -> rd.Dataset:
    """Range join of events against derived incident intervals: hours with
    >= ``min_errors`` 'error' events, padded by ``pad_mins`` on each side,
    overlaps merged. Returns the event_ids falling inside any interval.

    This is the broadcast-range-join pattern: the interval side is SMALL
    by construction (one row per hot *hour* — bounded by calendar hours,
    not corpus size), so it is collected once, merged, ``ray.put`` once,
    and every probe batch resolves all its events with two searchsorted
    calls — no shuffle of the big side at all."""
    import ray

    def error_hours(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("event_type"), "error")
        ts = batch.column("ts").filter(mask)
        win = pc.floor_temporal(ts, unit="hour")
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        wus = win.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(wus, return_counts=True)
        return pa.table(
            {
                "window_us": pa.array(uniq, pa.int64()),
                "pn": pa.array(counts, pa.int64()),
            }
        )

    hot = (
        events.map_batches(error_hours, batch_format="pyarrow")
        .groupby("window_us")
        .aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    hot = hot[hot["n"] >= min_errors]
    pad = pad_mins * 60 * 1_000_000
    hour = 3_600 * 1_000_000
    starts = np.sort(hot["window_us"].to_numpy(np.int64)) - pad
    ends = starts + hour + 2 * pad
    # merge overlapping/adjacent intervals
    keep_s, keep_e = [], []
    for s, e in zip(starts, ends):
        if keep_e and s <= keep_e[-1]:
            keep_e[-1] = max(keep_e[-1], e)
        else:
            keep_s.append(s)
            keep_e.append(e)
    iv_ref = ray.put((np.asarray(keep_s, np.int64), np.asarray(keep_e, np.int64)))

    def probe(batch: pa.Table) -> pa.Table:
        s, e = ray.get(iv_ref)
        ts = _ts_us(batch.column("ts"))
        if len(s) == 0:
            hit = np.zeros(len(ts), dtype=bool)
        else:
            idx = np.searchsorted(s, ts, side="right") - 1
            hit = (idx >= 0) & (ts < e[np.clip(idx, 0, None)])
        return pa.table(
            {
                "event_id": batch.column("event_id").take(
                    pa.array(np.flatnonzero(hit), pa.int64())
                )
            }
        )

    return events.map_batches(probe, batch_format="pyarrow")


def asof_prev_event_ds(events: rd.Dataset, match_type: str = "signup") -> rd.Dataset:
    """As-of join of every event to the user's most recent ``match_type``
    event at-or-before it (DuckDB `ASOF LEFT JOIN` semantics). Both sides
    are the events table, hash-partitioned once by user_id; inside each
    group a single searchsorted resolves all probes. The match side is
    deduped to one row per (user, ts) — max event_id — so ties are
    deterministic on both engines."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = _ts_us(group.column("ts"))
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        etype = group.column("event_type").to_numpy(zero_copy_only=False)
        out_eid = []
        out_match = []
        out_us = []
        order = np.lexsort((eid, ts, uid))
        ts, eid, uid, etype = ts[order], eid[order], uid[order], etype[order]
        bounds = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1, len(uid)]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            t, e, k = ts[lo:hi], eid[lo:hi], etype[lo:hi]
            m = k == match_type
            mt, me = t[m], e[m]
            # dedup match side per ts keeping max event_id (rows are
            # ts-then-event_id sorted, so the last of a ts-run wins)
            if len(mt):
                last = np.r_[mt[1:] != mt[:-1], True]
                mt, me = mt[last], me[last]
            idx = np.searchsorted(mt, t, side="right") - 1
            hit = idx >= 0
            match_eid = np.where(hit, me[np.clip(idx, 0, None)], -1)
            delta = np.where(hit, t - mt[np.clip(idx, 0, None)], 0)
            out_eid.append(e)
            out_match.append(match_eid)
            out_us.append(delta)
        eids = np.concatenate(out_eid) if out_eid else np.array([], np.int64)
        matches = np.concatenate(out_match) if out_match else np.array([], np.int64)
        deltas = np.concatenate(out_us) if out_us else np.array([], np.int64)
        hit = matches >= 0
        return pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "matched_event_id": pa.array(
                    np.where(hit, matches, 0), pa.int64(), mask=~hit
                ),
                "us_since_match": pa.array(
                    np.where(hit, deltas, 0), pa.int64(), mask=~hit
                ),
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def json_field_stats_ds(events: rd.Dataset, field: str = "k") -> rd.Dataset:
    """Per-event_type rollup of an integer field extracted from the JSON
    ``props`` column: (event_type, n, sum_k, min_k, max_k).

    Extraction is one vectorized RE2 kernel per batch (pyarrow has no JSON
    parser; for the flat integer fields this corpus carries, the regex IS
    the parser) — the DuckDB oracle uses json_extract, a real JSON parser,
    so the correctness gate cross-checks the regex against it. Combiner
    pattern: each batch ships one row per event_type; rows lacking the
    field are counted but excluded from sum/min/max (matching SQL NULL
    aggregate semantics).

    CONTRACT: flat (non-nested) JSON only. The regex matches ``"field":<int>``
    anywhere in the string, so a key nested inside a sub-object or embedded
    in a string VALUE would also match, where json_extract('$.field') would
    not. For nested/adversarial inputs, swap the extractor for a real JSON
    parse in an actor-pool stage; this corpus's props are flat key:int
    objects, cross-checked against the DuckDB oracle."""
    import re as _re

    pat = rf'"{_re.escape(field)}"\s*:\s*(?P<v>-?\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        ng = len(enc.dictionary)
        ext = pc.extract_regex(batch.column("props"), pat)
        val_str = pc.struct_field(ext, "v")
        valid = pc.is_valid(val_str).to_numpy(zero_copy_only=False)
        vals = np.zeros(len(batch), dtype=np.int64)
        if valid.any():
            vals[valid] = np.array(
                pc.cast(val_str.drop_null(), pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                np.int64,
            )
        n = np.bincount(codes, minlength=ng).astype(np.int64)
        sums = np.zeros(ng, np.int64)  # int64 scatter-sum: exact past 2^53
        np.add.at(sums, codes[valid], vals[valid])
        mins = np.full(ng, np.iinfo(np.int64).max, dtype=np.int64)
        maxs = np.full(ng, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mins, codes[valid], vals[valid])
        np.maximum.at(maxs, codes[valid], vals[valid])
        return pa.table(
            {
                "event_type": enc.dictionary,
                "pn": pa.array(n, pa.int64()),
                "ps": pa.array(sums, pa.int64()),
                "pmin": pa.array(mins, pa.int64()),
                "pmax": pa.array(maxs, pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min

    agg = (
        events.select_columns(["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("ps", alias_name="sum_k"),
            Min("pmin", alias_name="min_k"),
            Max("pmax", alias_name="max_k"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        # groups with no extracted values keep sentinel min/max -> null
        empty = pc.equal(batch.column("min_k"), np.iinfo(np.int64).max)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": batch.column("n"),
                "sum_k": batch.column("sum_k"),
                "min_k": pc.if_else(empty, pa.scalar(None, pa.int64()), batch.column("min_k")),
                "max_k": pc.if_else(empty, pa.scalar(None, pa.int64()), batch.column("max_k")),
            }
        )

    # one row per event_type: deterministic output order
    return agg.map_batches(finish, batch_format="pyarrow").sort("event_type")


def hopping_window_ds(
    events: rd.Dataset, width_secs: int = 3600, hop_secs: int = 900
) -> rd.Dataset:
    """Hopping (overlapping) window aggregate per (window_start, event_type):
    every event belongs to width/hop consecutive windows. ``width_secs``
    must be a multiple of ``hop_secs`` (then every one of the n_rep = 
    width/hop replicas is valid — no per-replica filter needed).

    Combiner shape like tumbling_window_ds, with the replica fan-out done
    BEFORE the per-batch partial aggregation: the shuffle still carries one
    row per (window, type) per batch — the xN event replication collapses
    inside the batch and never crosses the wire."""
    if width_secs % hop_secs:
        raise ValueError("width_secs must be a multiple of hop_secs")
    width_us = width_secs * 1_000_000
    hop_us = hop_secs * 1_000_000
    n_rep = width_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch.column("ts"))
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tcodes = etype.dictionary_encode()
        ti = tcodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = max(len(tcodes.dictionary), 1)
        base = (t // hop_us) * hop_us
        # replicas: window = base - j*hop, j = 0..n_rep-1 (all valid since
        # width = n_rep*hop) — fan out THEN combine within the batch
        wins = (base[:, None] - np.arange(n_rep)[None, :] * hop_us).ravel()
        ti_r = np.repeat(ti, n_rep)
        cents_r = np.repeat(cents, n_rep)
        key = wins * nt + ti_r
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        csum = np.bincount(inv, weights=cents_r, minlength=len(uniq)).astype(
            np.int64
        )
        return pa.table(
            {
                "window_us": pa.array(uniq // nt, pa.int64()),
                "event_type": tcodes.dictionary.take(pa.array(uniq % nt, pa.int64())),
                "pn": pa.array(n, pa.int64()),
                "pcents": pa.array(csum, pa.int64()),
            }
        )

    agg = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Sum("pn", alias_name="n_events"), Sum("pcents", alias_name="cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("window_us")
                .cast(pa.int64())
                .cast(pa.timestamp("us")),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "sum_value": pc.divide(
                    batch.column("cents").cast(pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def funnel_stages_ds(
    events: rd.Dataset,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> rd.Dataset:
    """Funnel analysis: per user, how many of ``steps`` were completed in
    strict time order (stage k means steps[0..k-1] happened at strictly
    increasing timestamps). Output (user_id, funnel_stage) for EVERY user.

    Scale shape: one shuffle — users are hash-bucketed coarsely (not one
    group per user) and each bucket resolves ALL its users with vectorized
    per-step passes: rows of the step type sorted by (user, ts), the
    "first event after the user's previous-step time" found with one
    boolean mask + run-length first-occurrence, no per-user Python."""
    from search_engine_ray.pipelines.dedup import _bucketer, _n_pair_buckets

    n_buckets = _n_pair_buckets()
    step_list = list(steps)

    def project(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = np.full(batch.num_rows, -1, np.int64)
        etn = et.to_numpy(zero_copy_only=False)
        for i, s in enumerate(step_list):
            codes[etn == s] = i
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "tus": pa.array(_ts_us(batch.column("ts")), pa.int64()),
                "step": pa.array(codes, pa.int64()),
            }
        )

    def stages(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        t = group.column("tus").to_numpy(zero_copy_only=False)
        s = group.column("step").to_numpy(zero_copy_only=False)
        users = np.unique(u)
        prev_t = np.full(len(users), -1, np.int64)
        alive = np.ones(len(users), dtype=bool)
        stage = np.zeros(len(users), np.int64)
        for k in range(len(step_list)):
            m = s == k
            su, st = u[m], t[m]
            order = np.lexsort((st, su))
            su, st = su[order], st[order]
            ui = np.searchsorted(users, su)
            ok = alive[ui] & (st > prev_t[ui])
            su, st, ui = su[ok], st[ok], ui[ok]
            _, first = np.unique(su, return_index=True)  # sorted → first hit
            hit_ui, hit_t = ui[first], st[first]
            alive = np.zeros(len(users), dtype=bool)
            alive[hit_ui] = True
            prev_t[hit_ui] = hit_t
            stage[hit_ui] = k + 1
            if not alive.any():
                break
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "funnel_stage": pa.array(stage, pa.int64()),
            }
        )

    return (
        events.map_batches(project, batch_format="pyarrow")
        .map_batches(_bucketer("user_id", n_buckets), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(stages, batch_format="pyarrow")
    )
