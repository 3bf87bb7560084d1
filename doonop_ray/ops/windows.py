"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (ray_guide.md "Streaming-shaped
workloads"); windows are expressed as groupby over computed window keys
(tumbling) and per-key sorted Arrow/numpy logic through
``grouped_apply`` (one distributed sort, vectorized group-boundary
detection, plain-call per group — no per-group pandas round-trip) —
the partitioning assumption (all events of one user/key fit one group)
is stated per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import _ensure_cols, finish, r4, read


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type: count + rounded sum."""
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": hour,
                "value": t["value"],
            }
        )

    out = (
        read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out = _ensure_cols(out, {
        "event_type": "str", "hour": "datetime64[us]",
        "n": "int64", "sum_value": "float64"})
    out["sum_value"] = r4(out["sum_value"])
    return finish(out, ["event_type", "hour"])


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization: events of a user belong to one session while
    consecutive gaps are <= gap. Returns (user_id, n_sessions, n_events).

    Fully vectorized mergeable-partials plan (round-5, replacing a
    per-group apply whose sort machinery dominated at small group
    counts): one distributed sort by (user_id, ts), then a map_batches
    pass that computes per-user-per-block partials (first/last ts,
    session count, event count) with numpy segmented ops — no per-group
    Python calls — and a driver-side vectorized merge of the
    O(users + blocks) partial rows. Two partials of one user merge by
    subtracting 1 session when the block boundary falls inside a
    session (next.first_ts - prev.last_ts <= gap); sorted blocks are
    disjoint key ranges, so a user's partials arrive time-contiguous.
    Scales: the shuffle is the sort; the driver only ever sees
    result-sized data."""
    gap_us = gap_minutes * 60 * 1_000_000

    def partials(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            })
        uid = pc.cast(t["user_id"], pa.int64()).to_numpy(zero_copy_only=False)
        ts = (pc.cast(t["ts"], pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        sess_start = np.empty(n, dtype=bool)
        sess_start[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=sess_start[1:])
        sess_start |= new_user
        starts = np.flatnonzero(new_user)
        ends = np.append(starts[1:], n)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "first_ts": pa.array(ts[starts], pa.int64()),
            "last_ts": pa.array(ts[ends - 1], pa.int64()),
            "n_sessions": pa.array(
                np.add.reduceat(sess_start.astype(np.int64), starts)),
            "n_events": pa.array(ends - starts, pa.int64()),
        })

    empty = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "first_ts": pd.Series([], dtype="int64"),
        "last_ts": pd.Series([], dtype="int64"),
        "n_sessions": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
    })
    ds = read(sf_dir, "events", ["user_id", "ts"]).sort(["user_id", "ts"])
    parts = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=None).to_pandas()
    if not len(parts.columns):
        parts = empty
    parts = parts.sort_values(["user_id", "first_ts"],
                              kind="mergesort", ignore_index=True)
    uid = parts["user_id"].to_numpy()
    n = len(parts)
    if n == 0:
        return finish(pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_sessions": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64")}), ["user_id"])
    # a same-user adjacent partial pair whose boundary gap is <= gap
    # shares one session across the block split
    bridged = np.zeros(n, dtype=np.int64)
    bridged[1:] = (
        (uid[1:] == uid[:-1])
        & ((parts["first_ts"].to_numpy()[1:]
            - parts["last_ts"].to_numpy()[:-1]) <= gap_us)
    ).astype(np.int64)
    ustart = np.empty(n, dtype=bool)
    ustart[0] = True
    np.not_equal(uid[1:], uid[:-1], out=ustart[1:])
    us = np.flatnonzero(ustart)
    out = pd.DataFrame({
        "user_id": uid[us],
        "n_sessions": (
            np.add.reduceat(parts["n_sessions"].to_numpy(), us)
            - np.add.reduceat(bridged, us)),
        "n_events": np.add.reduceat(parts["n_events"].to_numpy(), us),
    })
    out = _ensure_cols(out, {"user_id": "int64", "n_sessions": "int64",
                             "n_events": "int64"})
    return finish(out, ["user_id"])


def user_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user aggregate: counts and exact ts bounds (no floats)."""
    from ray.data.aggregate import Count, Max, Min

    out = (
        read(sf_dir, "events", ["user_id", "ts"])
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Min("ts", alias_name="first_ts"),
            Max("ts", alias_name="last_ts"),
        )
        .to_pandas()
    )
    out = _ensure_cols(out, {"user_id": "int64", "n_events": "int64",
                             "first_ts": "datetime64[us]",
                             "last_ts": "datetime64[us]"})
    return finish(out, ["user_id"])


def events_sliding_counts(sf_dir: str, window_hours: int = 2,
                          slide_hours: int = 1) -> pd.DataFrame:
    """Sliding window (2h window, 1h slide) event counts per type: each
    event contributes to window_hours/slide_hours window starts."""
    from ray.data.aggregate import Count

    k = window_hours // slide_hours

    def explode(t: pa.Table) -> pa.Table:
        # vectorized k-way explode: tile the hour-floored timestamps and
        # subtract a per-copy hour offset (no per-row Python loop)
        base = pc.floor_temporal(t["ts"], unit="hour").combine_chunks()
        n = len(t)
        base_us = base.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        offs = (np.arange(k, dtype=np.int64) * 3_600_000_000)[None, :]
        ws = (base_us[:, None] - offs).reshape(-1)  # row-major: k per event
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        return pa.table(
            {
                "event_type": t["event_type"].combine_chunks().take(idx),
                "window_start": pa.array(ws).cast(pa.timestamp("us")),
            }
        )

    out = (
        read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"event_type": "str",
                             "window_start": "datetime64[us]",
                             "n": "int64"})
    return finish(out, ["event_type", "window_start"])


def events_last_order(sf_dir: str) -> pd.DataFrame:
    """As-of join (ray_guide "As-of / range join"): for every event, the
    most recent order of the same key at or before the event time —
    per-key sort + vectorized searchsorted as-of inside
    ``grouped_apply``. Key: user_id ==
    o_custkey % 150 (the synthetic tables share no FK; the modulus makes
    a deterministic one). Partitioning assumption: one key's rows fit a
    group."""

    from .common import grouped_apply

    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "o_orderkey": pa.array([], pa.int64())})

    def asof(g: pa.Table) -> pa.Table:
        e_mask = pc.equal(g["side"], "e")
        ev = g.filter(e_mask)
        if len(ev) == 0:
            return empty
        ev_id = pc.cast(ev["event_id"], pa.int64())
        od = g.filter(pc.invert(e_mask))
        if len(od) == 0:
            return pa.table({"event_id": ev_id,
                             "o_orderkey": pa.nulls(len(ev), pa.int64())})
        ev_ts = pc.cast(ev["ts"], pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        od_ts = pc.cast(od["ts"], pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        od_key = pc.cast(od["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # tie-break same-ts orders by orderkey ascending so the
        # backward-as-of last match is the oracle's MAX(o_orderkey)
        order = np.lexsort((od_key, od_ts))
        od_ts_s, od_key_s = od_ts[order], od_key[order]
        pos = np.searchsorted(od_ts_s, ev_ts, side="right") - 1
        hit = pos >= 0
        vals = od_key_s[np.maximum(pos, 0)]
        okey = pa.array(np.where(hit, vals, 0), pa.int64(), mask=~hit)
        return pa.table({"event_id": ev_id, "o_orderkey": okey})

    ev = read(sf_dir, "events", ["event_id", "ts", "user_id"]).map_batches(
        lambda t: pa.table(
            {
                "key": pc.cast(t["user_id"], pa.int64()),
                "ts": t["ts"],
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "o_orderkey": pa.nulls(len(t), pa.int64()),
                "side": pa.array(["e"] * len(t)),
            }
        ),
        batch_format="pyarrow",
    )
    od = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "key": pc.cast(pc.subtract(t["o_custkey"], pc.multiply(
                    pc.divide(t["o_custkey"], 150), 150)), pa.int64()),
                "ts": t["o_orderdate"],
                "event_id": pa.nulls(len(t), pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "side": pa.array(["o"] * len(t)),
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_apply(ev.union(od), "key", asof, empty).to_pandas()
    out = _ensure_cols(out, {"event_id": "int64", "o_orderkey": "Int64"})
    out["event_id"] = out["event_id"].astype("int64")
    out["o_orderkey"] = out["o_orderkey"].astype("Int64")
    return finish(out, ["event_id"])


def event_value_median(sf_dir: str) -> pd.DataFrame:
    """Per-type median (linear-interpolated) of value, rounded 4."""

    from .common import grouped_apply

    def med(g: pa.Table) -> pa.Table:
        v = g["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            "median_value": pa.array(
                [float(r4(np.percentile(v, 50)))], pa.float64()),
        })

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "median_value": pa.array([], pa.float64())})
    out = grouped_apply(
        read(sf_dir, "events", ["event_type", "value"]),
        "event_type", med, empty).to_pandas()
    out = _ensure_cols(out, {"event_type": "str", "median_value": "float64"})
    return finish(out, ["event_type"])


def events_rolling_avg(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Per-user rolling mean over the last ``window`` events (ordered by
    ts): the ROWS BETWEEN window-function shape via per-key sorted
    cumulative window sums inside ``grouped_apply``."""

    from .common import grouped_apply

    def roll(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("ts", "ascending"),
                                            ("event_id", "ascending")])
        g = g.take(idx)
        v = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        # window sum accumulated earliest-term-first (same order a
        # sequential engine adds the window), then / count. j is
        # clamped to n-1: for j >= n the target slice acc[j:] is empty,
        # and v[:n-j] would wrap to a NON-empty slice via negative
        # indexing — a broadcast ValueError for groups smaller than
        # window-1 (any window >= 4)
        acc = np.zeros(n, np.float64)
        cnt = np.zeros(n, np.float64)
        for j in range(min(window, n) - 1, -1, -1):
            acc[j:] += v[: n - j]
            cnt[j:] += 1.0
        return pa.table({
            "event_id": pc.cast(g["event_id"], pa.int64()),
            "user_id": pc.cast(g["user_id"], pa.int64()),
            "rolling_avg": pa.array(r4(acc / cnt), pa.float64()),
        })

    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "rolling_avg": pa.array([], pa.float64())})
    out = grouped_apply(
        read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        "user_id", roll, empty).to_pandas()
    out = _ensure_cols(out, {"event_id": "int64", "user_id": "int64",
                             "rolling_avg": "float64"})
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return finish(out, ["event_id"])


def events_top_users_per_type(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k with rank (ROW_NUMBER window shape): each event
    type's k highest-spending users. Pre-aggregates (type, user) sums
    distributed, then ranks inside the tiny per-type groups."""
    from ray.data.aggregate import Sum

    from .common import grouped_apply

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("sum_value", "descending"),
                                            ("user_id", "ascending")])
        g = g.take(idx.slice(0, k))
        return pa.table({
            "event_type": g["event_type"],
            "user_id": pc.cast(g["user_id"], pa.int64()),
            "sum_value": g["sum_value"],
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
        })

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "user_id": pa.array([], pa.int64()),
                      "sum_value": pa.array([], pa.float64()),
                      "rank": pa.array([], pa.int64())})
    sums = (
        read(sf_dir, "events", ["event_type", "user_id", "value"])
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("value", alias_name="sum_value"))
    )
    out = grouped_apply(sums, "event_type", topk, empty).to_pandas()
    out = _ensure_cols(out, {"event_type": "str", "user_id": "int64",
                             "sum_value": "float64", "rank": "int64"})
    out["sum_value"] = r4(out["sum_value"])
    return finish(out, ["event_type", "rank"])


def orders_events_range_join(sf_dir: str, days: int = 7) -> pd.DataFrame:
    """RANGE join: for every order, how many events its (derived) user
    fired within [o_orderdate, o_orderdate + days). Same union-cogroup
    shape as the as-of join (events_last_order): both sides shuffle once
    by the shared key, and the per-key group does a vectorized
    searchsorted interval count — no all-pairs comparison. Key:
    user_id == o_custkey % 150 (the deterministic FK the as-of join
    uses). Partitioning assumption: one key's rows fit a group."""

    from .common import grouped_apply

    horizon_us = days * 86_400 * 1_000_000
    empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64())})

    def count_in_range(g: pa.Table) -> pa.Table:
        o_mask = pc.equal(g["side"], "o")
        od = g.filter(o_mask)
        if len(od) == 0:
            return empty
        ev = g.filter(pc.invert(o_mask))
        ev_ts = np.sort(
            pc.cast(ev["ts"], pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False))
        starts = pc.cast(od["ts"], pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(ev_ts, starts, side="left")
        hi = np.searchsorted(ev_ts, starts + horizon_us, side="left")
        return pa.table({
            "o_orderkey": pc.cast(od["o_orderkey"], pa.int64()),
            "n_events": pa.array((hi - lo).astype(np.int64)),
        })

    ev = read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        lambda t: pa.table({
            "key": pc.cast(t["user_id"], pa.int64()),
            "ts": t["ts"],
            "o_orderkey": pa.nulls(len(t), pa.int64()),
            "side": pa.array(["e"] * len(t)),
        }),
        batch_format="pyarrow",
    )
    od = read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "key": pc.cast(pc.subtract(t["o_custkey"], pc.multiply(
                pc.divide(t["o_custkey"], 150), 150)), pa.int64()),
            "ts": t["o_orderdate"],
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "side": pa.array(["o"] * len(t)),
        }),
        batch_format="pyarrow",
    )
    out = grouped_apply(ev.union(od), "key", count_in_range, empty).to_pandas()
    out = _ensure_cols(out, {"o_orderkey": "int64", "n_events": "int64"})
    out = out.astype({"o_orderkey": "int64", "n_events": "int64"})
    return finish(out, ["o_orderkey"])


def events_windowed_p90(sf_dir: str) -> pd.DataFrame:
    """Windowed percentile over the event stream: exact discrete p90 of
    ``value`` per (event_type, 1-hour tumbling window). The window key's
    cardinality grows with stream time, so the per-window percentile runs
    through ``grouped_apply`` (sort-cogroup, vectorized boundary detect)
    rather than Ray's per-group machinery. PERCENTILE_DISC semantics
    (value at ceil(0.9*n) in sort order — no interpolation) so the float
    matches the DuckDB oracle bit-exactly."""
    import numpy as np

    from .common import grouped_apply, table_rows

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value": t["value"],
        })

    def p90(g: pa.Table) -> pa.Table:
        v = np.sort(g["value"].to_numpy(zero_copy_only=False))
        k = max(0, int(np.ceil(0.9 * len(v))) - 1)
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            "hour": g["hour"].slice(0, 1),
            "p90_value": pa.array([float(v[k])], pa.float64()),
        })

    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        "hour": pa.array([], pa.timestamp("us")),
        "p90_value": pa.array([], pa.float64()),
    })
    ds = read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        bucket, batch_format="pyarrow")
    out = grouped_apply(ds, ["event_type", "hour"], p90, empty,
                        size_hint=table_rows(sf_dir, "events")).to_pandas()
    return finish(out, ["event_type", "hour"])


def orders_cumulative_revenue(sf_dir: str) -> pd.DataFrame:
    """Running total per customer: cumulative o_totalprice over each
    customer's orders in (o_orderdate, o_orderkey) order — the classic
    SUM() OVER (PARTITION BY ... ORDER BY ...) window, via
    ``grouped_apply`` (customer cardinality grows with the corpus).
    Both engines accumulate in the same fixed order, so the floats are
    bit-identical — no rounding needed."""
    import numpy as np

    from .common import grouped_apply

    def cum(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("o_orderdate", "ascending"),
                                            ("o_orderkey", "ascending")])
        g = g.take(idx)
        run = np.cumsum(g["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table({
            "o_custkey": g["o_custkey"],
            "o_orderkey": g["o_orderkey"],
            "cum_revenue": pa.array(run, pa.float64()),
        })

    empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                      "o_orderkey": pa.array([], pa.int64()),
                      "cum_revenue": pa.array([], pa.float64())})
    ds = read(sf_dir, "orders",
              ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    out = grouped_apply(ds, "o_custkey", cum, empty).to_pandas()
    return finish(out, ["o_custkey", "o_orderkey"])


def events_ntile(sf_dir: str, tiles: int = 4) -> pd.DataFrame:
    """NTILE(tiles) per user over event value — the rank-to-bucket
    window shape (quartile assignment feeding stratified sampling or
    outlier trims). Exact SQL NTILE semantics: with n rows and k tiles,
    the first n % k tiles get one extra row; order is (value, event_id)
    for determinism.

    Scale shape: one ``grouped_apply`` sort keyed on user_id; the
    bucket arithmetic inside each group is closed-form over the sorted
    positions (no second pass). Assumes one user's events fit a group —
    the same stated assumption as every per-user window here."""
    from .common import grouped_apply

    def bucket(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("value", "ascending"),
                                            ("event_id", "ascending")])
        g = g.take(idx)
        n = len(g)
        q, r = divmod(n, tiles)
        pos = np.arange(n, dtype=np.int64)
        cut = r * (q + 1)
        tile = np.where(
            pos < cut,
            pos // max(q + 1, 1),
            r + (pos - cut) // max(q, 1),
        ) + 1
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "tile": pa.array(tile, pa.int64()),
        })

    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "tile": pa.array([], pa.int64())})
    ds = read(sf_dir, "events", ["event_id", "user_id", "value"])
    out = grouped_apply(ds, "user_id", bucket, empty).to_pandas()
    if out.empty:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "tile": pd.Series([], dtype="int64")})
    return finish(out.astype("int64"), ["event_id"])


def user_modal_event_type(sf_dir: str) -> pd.DataFrame:
    """MODE aggregate: each user's most frequent event_type (ties break
    on the lexicographically smallest type) with its count — the
    argmax-per-group shape.

    Scale shape: per-batch (user, type) C++ group_by partials →
    ``grouped_aggregate`` merge (the only exchange, keyed on the pair)
    → per-user argmax via ``grouped_apply`` over the tiny merged table
    (rows bounded by users × distinct types, not events)."""
    from .common import grouped_aggregate, grouped_apply

    def partial(t: pa.Table) -> pa.Table:
        cnt = pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"]
        }).group_by(["user_id", "event_type"], use_threads=False) \
            .aggregate([([], "count_all")])
        return cnt.rename_columns(["user_id", "event_type", "c"])

    merged = grouped_aggregate(
        read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], [("c", "sum")])

    def argmax(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("c_sum", "descending"),
                          ("event_type", "ascending")])
        top = g.take(idx.slice(0, 1))
        return pa.table({
            "user_id": top["user_id"],
            "event_type": top["event_type"],
            "cnt": pc.cast(top["c_sum"], pa.int64()),
        })

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "event_type": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    out = grouped_apply(merged, "user_id", argmax, empty).to_pandas()
    if out.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "event_type": pd.Series([], dtype="str"),
                             "cnt": pd.Series([], dtype="int64")})
    return finish(out, ["user_id"])


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT reshape: one row per user with a count column per event
    type (long→wide, the feature-matrix shape). The type set is the
    table's closed enum, so the pivot is a fixed projection, not a
    dynamic schema.

    Scale shape: each batch bincounts its (user, type) pairs into the
    five fixed columns (C++ dictionary encode + bincount, no Python per
    row), then ONE ``grouped_aggregate`` keyed on user sums the
    partials — a single narrow exchange of 6 ints per distinct
    (user, batch)."""
    from .common import _ensure_cols, grouped_aggregate

    cols = [f"n_{t}" for t in EVENT_TYPES]
    type_idx = {t: i for i, t in enumerate(EVENT_TYPES)}

    def partial(t: pa.Table) -> pa.Table:
        users = pc.cast(t["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        enc = t["event_type"].combine_chunks().dictionary_encode()
        tmap = np.array([type_idx.get(v, -1)
                         for v in enc.dictionary.to_pylist()], dtype=np.int64)
        ti = tmap[np.asarray(enc.indices)] if len(t) else \
            np.zeros(0, dtype=np.int64)
        uniq, uinv = np.unique(users, return_inverse=True)
        out = {"user_id": pa.array(uniq, pa.int64())}
        for i, c in enumerate(cols):
            out[c] = pa.array(
                np.bincount(uinv[ti == i], minlength=len(uniq)), pa.int64())
        return pa.table(out)

    merged = grouped_aggregate(
        read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow"),
        "user_id", [(c, "sum") for c in cols]).to_pandas()
    merged = _ensure_cols(
        merged, {"user_id": "int64", **{f"{c}_sum": "int64" for c in cols}})
    out = pd.DataFrame({"user_id": merged["user_id"].astype("int64"),
                        **{c: merged[f"{c}_sum"].astype("int64")
                           for c in cols}})
    return finish(out, ["user_id"])


def user_funnel(sf_dir: str) -> pd.DataFrame:
    """Strict sequential funnel view → click → purchase: a user reaches
    a stage only via its first view, then the first click strictly
    after it, then the first purchase strictly after that. Returns
    (stage, n_users) for the three stages — the conversion table.

    Scale shape: one ``grouped_apply`` sort keyed on user_id; each
    user's stage timestamps come from three vectorized min-reductions
    inside the group. Output is O(3)."""
    from .common import grouped_apply

    def stages(g: pa.Table) -> pa.Table:
        ts = pc.cast(g["ts"], pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        hit = np.zeros(3, dtype=np.int64)
        tv = ts[et == "view"]
        if len(tv):
            hit[0] = 1
            t1 = tv.min()
            tc = ts[(et == "click") & (ts > t1)]
            if len(tc):
                hit[1] = 1
                t2 = tc.min()
                tp = ts[(et == "purchase") & (ts > t2)]
                if len(tp):
                    hit[2] = 1
        return pa.table({
            "stage": pa.array(["view", "click", "purchase"], pa.string()),
            "n": pa.array(hit, pa.int64()),
        })

    empty = pa.table({"stage": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    parts = grouped_apply(
        read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "user_id", stages, empty).to_pandas()
    stages_order = {"view": 0, "click": 1, "purchase": 2}
    if parts.empty or not len(parts.columns):
        # SQL's ungrouped aggregates yield one zero-count row per stage
        # even over an empty table
        return pd.DataFrame({
            "stage": pd.Series(["view", "click", "purchase"], dtype="str"),
            "n_users": pd.Series([0, 0, 0], dtype="int64")})
    agg = parts.groupby("stage", as_index=False).agg(n_users=("n", "sum"))
    agg["ord"] = agg["stage"].map(stages_order)
    agg = agg.sort_values("ord").drop(columns="ord")
    return agg.astype({"n_users": "int64"}).reset_index(drop=True)


def retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: cohort = a user's first absolute epoch
    week (floor(epoch_us / 1 week)), offset = event week − cohort week;
    cell = distinct users from that cohort active at that offset — the
    standard growth-analytics rollup, on integer week arithmetic so
    both engines agree exactly (no week-start locale semantics).

    Scale shape: one ``grouped_apply`` sort keyed on user_id emits each
    user's distinct (cohort, offset) rows (vectorized np.unique inside
    the group), then a ``grouped_aggregate`` counts users per cell —
    two narrow exchanges, nothing corpus-sized on the driver."""
    from .common import grouped_aggregate, grouped_apply

    WEEK_US = 7 * 24 * 3600 * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        ts = pc.cast(g["ts"], pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        weeks = ts // WEEK_US
        cohort = int(weeks.min())
        offs = np.unique(weeks - cohort)
        return pa.table({
            "cohort_week": pa.array(np.full(len(offs), cohort, np.int64)),
            "week_offset": pa.array(offs, pa.int64()),
            "one": pa.array(np.ones(len(offs), np.int64)),
        })

    empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                      "week_offset": pa.array([], pa.int64()),
                      "one": pa.array([], pa.int64())})
    cells = grouped_apply(
        read(sf_dir, "events", ["user_id", "ts"]),
        "user_id", per_user, empty)
    out = grouped_aggregate(
        cells, ["cohort_week", "week_offset"], [("one", "sum")]).to_pandas()
    from .common import _ensure_cols

    out = _ensure_cols(out, {"cohort_week": "int64", "week_offset": "int64",
                             "one_sum": "int64"})
    out = pd.DataFrame({
        "cohort_week": out["cohort_week"].astype("int64"),
        "week_offset": out["week_offset"].astype("int64"),
        "n_users": out["one_sum"].astype("int64"),
    })
    return finish(out, ["cohort_week", "week_offset"])


def events_percent_rank(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK + CUME_DIST of event value within each user — the
    tie-aware rank-statistics window shapes (RANK() semantics: ties
    share the min rank; CUME_DIST counts value <= v).

    Scale shape: one ``grouped_apply`` sort keyed on user_id; inside a
    group both statistics are two vectorized searchsorted calls over
    the sorted values. Assumes one user's events fit a group (stated
    for every per-user window here)."""
    from .common import grouped_apply, r4

    def ranks(g: pa.Table) -> pa.Table:
        v = g["value"].to_numpy(zero_copy_only=False)
        ids = pc.cast(g["event_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(v)
        sv = np.sort(v)
        lo = np.searchsorted(sv, v, side="left")   # rank-1 (ties -> min)
        hi = np.searchsorted(sv, v, side="right")  # count(value <= v)
        pr = lo / (n - 1) if n > 1 else np.zeros(n)
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pc.cast(g["user_id"], pa.int64()),
            "pct_rank": pa.array(r4(pr), pa.float64()),
            "cume_dist": pa.array(r4(hi / n), pa.float64()),
        })

    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "pct_rank": pa.array([], pa.float64()),
                      "cume_dist": pa.array([], pa.float64())})
    out = grouped_apply(
        read(sf_dir, "events", ["event_id", "user_id", "value"]),
        "user_id", ranks, empty).to_pandas()
    if out.empty:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "pct_rank": pd.Series([], dtype="float64"),
                             "cume_dist": pd.Series([], dtype="float64")})
    return finish(out, ["event_id"])


def events_hourly_anomalies(sf_dir: str, z: float = 2.0) -> pd.DataFrame:
    """Traffic-anomaly detection: hours whose per-type event count
    deviates from that type's hourly mean by more than ``z`` sample
    standard deviations — the monitoring rollup every ingest pipeline
    runs. Returns (event_type, hour, n, zscore).

    Scale shape: per-batch (type, hour) count partials →
    ``grouped_aggregate`` (the only exchange); the per-type mean/stddev
    reduce over hours-per-type rows (bounded by the time range, not the
    corpus) on the driver."""
    from .common import _ensure_cols, grouped_aggregate, r4

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        cnt = pa.table({
            "event_type": t["event_type"], "hour": hour,
        }).group_by(["event_type", "hour"], use_threads=False) \
            .aggregate([([], "count_all")])
        return cnt.rename_columns(["event_type", "hour", "c"])

    counts = grouped_aggregate(
        read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"], [("c", "sum")]).to_pandas()
    counts = _ensure_cols(counts, {"event_type": "str",
                                   "hour": "datetime64[us]",
                                   "c_sum": "int64"})
    if counts.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype="str"),
                             "hour": pd.Series([], dtype="datetime64[us]"),
                             "n": pd.Series([], dtype="int64"),
                             "zscore": pd.Series([], dtype="float64")})
    out_rows = []
    for et, g in counts.groupby("event_type"):
        c = g["c_sum"].to_numpy(dtype=np.float64)
        if len(c) < 2:
            continue
        mu = c.mean()
        sd = c.std(ddof=1)
        if sd == 0:
            continue
        zs = (c - mu) / sd
        m = np.abs(zs) > z
        for h, n_, zv in zip(g["hour"].to_numpy()[m], c[m], zs[m]):
            out_rows.append((et, h, int(n_), float(r4(zv))))
    out = pd.DataFrame(out_rows,
                       columns=["event_type", "hour", "n", "zscore"])
    if out.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype="str"),
                             "hour": pd.Series([], dtype="datetime64[us]"),
                             "n": pd.Series([], dtype="int64"),
                             "zscore": pd.Series([], dtype="float64")})
    out["n"] = out["n"].astype("int64")
    return finish(out, ["event_type", "hour"])


def events_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Hourly resample with GAP FILL per event_type: every hour from a
    type's first event to its last gets a row, zero-count where no
    events landed — the calendar-dimension-generation shape (resample +
    LEFT JOIN against a generated series) feature pipelines need.

    Scale shape: per-(type, hour) counts are map-side partials (one C++
    group_by per batch) → ``grouped_aggregate`` ships one row per
    distinct (type, hour), not per event; the fill is a
    ``grouped_apply`` per type that generates the [min, max] hour range
    inside the worker — generated rows are TIME-SPAN-bounded (hours per
    type), never corpus-sized, and each type's fill is independent so
    the stage parallelizes across types."""
    from .common import grouped_aggregate, grouped_apply, table_rows

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "event_type": t["event_type"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
        })
        g = tt.group_by(["event_type", "hour"],
                        use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "hour", "n"])

    counts = grouped_aggregate(
        read(sf_dir, "events", ["ts", "event_type"]).map_batches(
            partial, batch_format="pyarrow"),
        ["event_type", "hour"], [("n", "sum")],
        size_hint=table_rows(sf_dir, "events"))

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "hour": pa.array([], pa.timestamp("us")),
                      "n": pa.array([], pa.int64())})
    one_h = np.timedelta64(1, "h")

    def fill(g: pa.Table) -> pa.Table:
        hrs = g["hour"].to_numpy(zero_copy_only=False)
        n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = hrs.min()
        full = np.arange(lo, hrs.max() + one_h, one_h)
        cnt = np.zeros(len(full), np.int64)
        cnt[((hrs - lo) / one_h).astype(np.int64)] = n
        return pa.table({
            "event_type": pa.array(
                [g["event_type"][0].as_py()] * len(full), pa.string()),
            "hour": pa.array(full.astype("datetime64[us]")),
            "n": pa.array(cnt, pa.int64()),
        })

    out = grouped_apply(counts, "event_type", fill, empty).to_pandas()
    out = _ensure_cols(out, {"event_type": "str",
                             "hour": "datetime64[us]", "n": "int64"})
    return finish(out, ["event_type", "hour"])


def events_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(event_type, hour-of-day): detail cells plus both
    one-dimension margins plus the grand total in one result — the
    multi-level-aggregation shape of OLAP dashboards (``revenue_rollup``
    is the hierarchy cousin; this is the full lattice).

    Scale shape: the distributed work is ONE pass of map-side partials
    into the BOUNDED (|types| × 24) finest-grain key space; count/sum
    are re-aggregable, so the three coarser cube levels derive from
    that bounded frame driver-side — post-aggregation of ≤ 120 rows,
    never of raw events."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # count_all == COUNT(*) (a NULL value still counts the row);
        # an all-NULL-value cell keeps a NULL sum, like SQL SUM
        g = pa.table({
            "event_type": t["event_type"],
            "hod": pc.cast(pc.hour(t["ts"]), pa.int64()),
            "value": t["value"],
        }).group_by(["event_type", "hod"], use_threads=False).aggregate(
            [([], "count_all"), ("value", "sum")])
        return pa.table({
            "event_type": g["event_type"], "hod": g["hod"],
            "cnt": pc.cast(g["count_all"], pa.int64()),
            "val": g["value_sum"]})

    fine = (read(sf_dir, "events", ["ts", "event_type", "value"])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["event_type", "hod"])
            .aggregate(Sum("cnt", alias_name="cnt"),
                       Sum("val", alias_name="val"))
            .to_pandas())
    fine = _ensure_cols(fine, {"event_type": "str", "hod": "int64",
                               "cnt": "int64", "val": "float64"})
    # min_count=1 keeps SQL NULL semantics: a margin whose every cell
    # sum is NULL stays NULL instead of pandas' default 0.0
    by_type = fine.groupby("event_type", as_index=False).agg(
        cnt=("cnt", "sum"),
        val=("val", lambda s: s.sum(min_count=1)))
    by_type["hod"] = np.nan
    by_hod = fine.groupby("hod", as_index=False).agg(
        cnt=("cnt", "sum"),
        val=("val", lambda s: s.sum(min_count=1)))
    by_hod["event_type"] = None
    tot = pd.DataFrame({
        "event_type": [None], "hod": [np.nan],
        "cnt": [fine["cnt"].sum()],
        # SUM over zero rows (or all-NULL values) is NULL in SQL
        "val": [fine["val"].sum(min_count=1)]})
    out = pd.concat([fine, by_type, by_hod, tot], ignore_index=True)
    out["hod"] = out["hod"].astype("float64")
    out["n"] = out["cnt"].astype("int64")
    out["sum_value"] = r4(out["val"])
    out = out[["event_type", "hod", "n", "sum_value"]]
    return out.sort_values(
        ["event_type", "hod"], na_position="first",
        kind="mergesort").reset_index(drop=True)


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """JSON-payload extraction + aggregate: pull the integer field
    ``k`` out of the ``props`` JSON column and reduce per event_type —
    the semi-structured-flattening staple. The extraction is one
    vectorized RE2 kernel over the JSON strings (fixed-schema payloads
    never pay a per-row json.loads), and the DuckDB oracle uses the
    SAME RE2 pattern via regexp_extract, so both sides agree on every
    payload by construction. Contract: payloads are FLAT fixed-schema
    objects with an unquoted integer ``k`` — nested or string-typed
    keys need a real JSON-parser stage, not this kernel. The reduce is
    map-side partials into the bounded type key space. NULL semantics
    mirror SQL: rows
    whose payload lacks ``k`` drop out of n/sum/avg."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ks = pc.struct_field(
            pc.extract_regex(t["props"], r'"k"\s*:\s*(?P<k>-?\d+)'), "k")
        ks = pc.cast(ks, pa.int64())
        g = pa.table({
            "event_type": t["event_type"], "k": ks,
        }).group_by(["event_type"], use_threads=False).aggregate(
            [("k", "count"), ("k", "sum")])
        return pa.table({
            "event_type": g["event_type"],
            "n": pc.cast(g["k_count"], pa.int64()),
            "sum_k": g["k_sum"]})

    out = (read(sf_dir, "events", ["event_type", "props"])
           .map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_k", alias_name="sum_k"))
           .to_pandas())
    out = _ensure_cols(out, {"event_type": "str", "n": "int64",
                             "sum_k": "int64"})
    # integer sums are exact in int64, so the division is
    # order-independent and matches SQL AVG bit-for-bit
    out["n"] = out["n"].astype("int64")
    if not out["sum_k"].isna().any():
        out["sum_k"] = out["sum_k"].astype("int64")
    # a type whose every payload lacks k keeps its row with n=0 and
    # NULL sum/avg — same as SQL's COUNT=0 / SUM=NULL / AVG=NULL
    with np.errstate(invalid="ignore"):
        out["avg_k"] = r4(out["sum_k"] / out["n"])
    return finish(out, ["event_type"])
