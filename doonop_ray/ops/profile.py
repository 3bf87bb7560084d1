"""Data-profiling operator — the pre-ingestion quality summary a
training pipeline runs over a new table drop: row count, per-column
null counts, EXACT distinct cardinalities, and numeric ranges.

Scale shape: one scan computes the streaming partials (rows, nulls,
min/max — all re-aggregable, merged driver-side from one tiny row per
block); the exact distinct counts for ALL columns share a SINGLE
exchange — each batch emits its per-column unique values as (col,
value) pairs (map-side dedup trims repeats before anything moves),
one ``grouped_aggregate`` dedups globally, and the per-column counts
reduce from bounded partials. ``hll_distinct_users_per_type``
(ops/sketches.py) is the approximate scale twin when exactness can be
traded for a constant-size exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import finish, grouped_aggregate, r4, read, table_rows

_ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority"]
_ORDERS_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}


def table_profile_orders(sf_dir: str) -> pd.DataFrame:
    return _profile(sf_dir, "orders", _ORDERS_COLS, _ORDERS_NUMERIC)


def _profile(sf_dir: str, table: str, cols: list[str],
             numeric: set[str]) -> pd.DataFrame:
    ds = read(sf_dir, table, cols)

    def partial(t: pa.Table) -> pa.Table:
        row: dict = {"n": pa.array([len(t)], pa.int64())}
        for c in cols:
            row[f"null_{c}"] = pa.array(
                [int(pc.sum(pc.cast(pc.is_null(t[c]), pa.int64()))
                     .as_py() or 0)], pa.int64())
            if c in numeric:
                row[f"min_{c}"] = pa.array(
                    [pc.min(t[c]).as_py()], pa.float64())
                row[f"max_{c}"] = pa.array(
                    [pc.max(t[c]).as_py()], pa.float64())
        return pa.table(row)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum()) if len(parts.columns) else 0

    # exact distincts, every column through ONE exchange of
    # (col-index, value-as-string) pairs, per-batch pre-deduped
    def distinct_pairs(t: pa.Table) -> pa.Table:
        tabs = []
        for ci, c in enumerate(cols):
            u = pc.unique(pc.drop_null(t[c].combine_chunks()))
            tabs.append(pa.table({
                "ci": pa.array([ci] * len(u), pa.int32()),
                "v": pc.cast(u, pa.string()),
            }))
        return pa.concat_tables(tabs)

    dd = grouped_aggregate(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["ci", "v"], [("v", "count")],
        size_hint=table_rows(sf_dir, table) * len(cols))

    def ci_counts(t: pa.Table) -> pa.Table:
        b = np.bincount(t["ci"].to_numpy(zero_copy_only=False),
                        minlength=len(cols))
        return pa.table({f"d_{i}": pa.array([int(b[i])], pa.int64())
                         for i in range(len(cols))})

    dcounts = dd.map_batches(ci_counts, batch_format="pyarrow").to_pandas()

    rows = []
    for ci, c in enumerate(cols):
        nulls = int(parts[f"null_{c}"].sum()) if len(parts.columns) else 0
        nd = int(dcounts[f"d_{ci}"].sum()) if len(dcounts.columns) else 0
        if c in numeric and len(parts.columns) and \
                parts[f"min_{c}"].notna().any():
            mn = float(r4(parts[f"min_{c}"].min()))
            mx = float(r4(parts[f"max_{c}"].max()))
        else:
            mn = mx = np.nan
        rows.append({"col": c, "n": n, "n_null": nulls,
                     "n_distinct": nd, "min_val": mn, "max_val": mx})
    out = pd.DataFrame(rows).astype(
        {"n": "int64", "n_null": "int64", "n_distinct": "int64",
         "min_val": "float64", "max_val": "float64"})
    return finish(out, ["col"])
