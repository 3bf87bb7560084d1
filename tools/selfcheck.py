"""Local stand-in for the driver's CORRECTNESS gate: run every
queries() entry via Ray and its oracle_sql() via DuckDB on the same
sf dir, compare row count + column names + order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/selfcheck.py [sf_dir] [names...]

``--isolate`` runs every query in its OWN subprocess (fresh Ray session
per query).  ~10x slower end-to-end, but a Ray-core fatal in one query
(two one-off ``reference_count.cc:581`` crashes were seen in long
single-session sweeps on 2026-08-18, neither reproducible) then fails
only that query's row instead of killing the whole sweep.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str | None:
    if len(ray_df) != len(sql_df):
        return f"rowcount ray={len(ray_df)} sql={len(sql_df)}"
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"schema ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    a, b = normalize(ray_df), normalize(sql_df)
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        bad = diff.any(axis=1)
        n = int(bad.sum())
        ex = pd.concat([a[bad].head(3).add_suffix("_ray"),
                        b[bad].head(3).add_suffix("_sql")], axis=1)
        return f"{n} differing rows, e.g.\n{ex}"
    return None


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def run_isolated(sf_dir: str, only: set[str]) -> int:
    """Process-per-query sweep: each query+oracle compare runs in a
    fresh interpreter (its own Ray session), so a Ray-core fatal is
    contained to one row of the report."""
    import os
    import subprocess

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    names = [n for n in e.queries() if not only or n in only]
    me = os.path.abspath(__file__)
    failures = 0
    for name in names:
        t0 = time.time()
        r = subprocess.run([sys.executable, me, sf_dir, name],
                           capture_output=True, text=True)
        dt = time.time() - t0
        tail = [ln for ln in r.stdout.strip().splitlines()
                if ln.startswith(("ok ", "FAIL"))]
        if r.returncode == 0 and tail:
            print(f"{tail[0]}  [isolated {dt:.0f}s]")
        else:
            failures += 1
            why = tail[0] if tail else \
                f"subprocess died rc={r.returncode}: {r.stderr.strip()[-300:]}"
            print(f"FAIL {name}: {why}")
    print("FAILURES:", failures)
    return 1 if failures else 0


def main():
    argv = [a for a in sys.argv[1:] if a != "--isolate"]
    isolate = "--isolate" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if isolate:
        sys.exit(run_isolated(sf_dir, only))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows  [{dt:.1f}s]")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: sql raised {ex}")
            failures += 1
            continue
        err = compare(ray_df, sql_df)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"ok   {name}: {len(ray_df)} rows match  [{dt:.1f}s]")
    print("FAILURES:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
