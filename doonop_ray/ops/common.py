"""Shared helpers for the operator suite over the driver's testdata
tables (TESTDATA.md: region nation customer supplier part orders
lineitem events documents embeddings).

Conventions that make the DuckDB-oracle value-hash comparison exact:
- prune columns at the read (`columns=[...]`);
- name every computed/aggregate column identically in Ray and SQL;
- round float aggregates to 4 decimals on BOTH sides (block-order
  nondeterminism perturbs the last ulp of float sums);
- integer/count/min/max aggregates stay exact, prefer them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def read_arrow(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def r4(x):
    """Round to 4 decimals, half AWAY from zero — DuckDB ROUND semantics
    (numpy's np.round is half-even and diverges on exact .5 boundaries
    such as 1/32 = 0.03125)."""
    a = np.asarray(x, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * 1e4 + 0.5) / 1e4


def finish(df: pd.DataFrame, sort_by: list[str] | None = None) -> pd.DataFrame:
    """Deterministic small-result finish: stable sort + fresh index."""
    if sort_by:
        df = df.sort_values(sort_by, kind="mergesort")
    return df.reset_index(drop=True)
