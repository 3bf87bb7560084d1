"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (ray_guide.md "Streaming-shaped
workloads"); windows are expressed as groupby over computed window keys
(tumbling) and per-key ``map_groups`` with sorted-by-ts pandas logic
(sessionization) — the partitioning assumption (all events of one
user/key fit one group) is stated per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import finish, r4, read


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
    out["sum_value"] = r4(out["sum_value"])
    return finish(out, ["event_type", "hour"])


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization: events of a user belong to one session while
    consecutive gaps are <= gap. Returns (user_id, n_sessions, n_events).

    Partitioning assumption: one user's events fit in one group (holds
    by construction of the events table; at larger scale pre-partition
    by user_id hash and sessionize within partitions).
    """

    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        new_session = g["ts"].diff() > gap
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_session.sum()) + 1],
                "n_events": [len(g)],
            }
        )

    out = (
        read(sf_dir, "events", ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sess, batch_format="pandas")
        .to_pandas()
    )
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
    return finish(out, ["user_id"])


def events_sliding_counts(sf_dir: str, window_hours: int = 2,
                          slide_hours: int = 1) -> pd.DataFrame:
    """Sliding window (2h window, 1h slide) event counts per type: each
    event contributes to window_hours/slide_hours window starts."""
    from ray.data.aggregate import Count

    k = window_hours // slide_hours

    def explode(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], unit="hour")
        et_out, ws_out = [], []
        base_py = base.to_pylist()
        et = t["event_type"].to_pylist()
        for bts, e in zip(base_py, et):
            for j in range(k):
                ws_out.append(bts - pd.Timedelta(hours=j))
                et_out.append(e)
        return pa.table(
            {
                "event_type": pa.array(et_out, pa.string()),
                "window_start": pa.array(ws_out, pa.timestamp("us")),
            }
        )

    out = (
        read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return finish(out, ["event_type", "window_start"])
