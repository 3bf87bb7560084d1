"""Empty-corpus robustness: every operator must return a typed (often
empty) result — never crash — when all input tables have zero rows.
Empty inputs are routine at scale: an all-filtered partition, a resumed
run's first empty shard, an empty ingest batch.

The full sweep over all 147 queries lives in
tools/empty_world_sweep.py (run per-session); this test pins a fast
representative subset covering each mechanism the sweep exercised:
the compat shim (doonop_ray/compat.py), the zero-row read fast path,
the grouped_apply/grouped_aggregate small-route guards, the bucket
publish fallback, per-op _ensure_cols guards, and SQL NULL-aggregate
semantics.
"""

import os
import sys

import duckdb
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

SRC = "/root/testdata/sf0.001"

# mechanism-diverse, fast subset (full list: tools/empty_world_sweep.py)
SUBSET = [
    "token_counts",            # map + grouped_aggregate
    "q1_pricing_summary",      # ray-native groupby (+ _ensure_cols)
    "q6_forecast_revenue",     # scalar aggregate -> SQL NULL semantics
    "events_hourly",           # ray-native groupby over computed key
    "user_sessions",           # map_groups
    "deterministic_sample",    # filter map (bool-typed empty mask)
    "train_val_test_split",    # pure map (typed empty numpy)
    "semantic_dedup",          # grouped_apply small-route guard
    "dedup_exact",             # hash + grouped_aggregate
    "customer_order_counts",   # persisted-bucket join (empty publish)
    "events_ntile",            # grouped_apply window
    "char_entropy",            # vectorized pure map
]


@pytest.fixture(scope="module")
def empty_world(tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_world")
    for f in sorted(os.listdir(SRC)):
        schema = pq.read_schema(os.path.join(SRC, f)).remove_metadata()
        pq.write_table(schema.empty_table(), os.path.join(out, f))
    return str(out)


@pytest.fixture(scope="module")
def empty_duck(empty_world):
    con = duckdb.connect()
    for f in sorted(os.listdir(empty_world)):
        t = f.removesuffix(".parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{empty_world}/{f}'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_survives_empty_world(entrymod, empty_world, empty_duck,
                                    name, ray_session):
    from selfcheck import compare, to_pandas

    ray_df = to_pandas(entrymod.queries()[name](empty_world))
    sql = entrymod.oracle_sql().get(name)
    if sql is not None:
        assert compare(ray_df, empty_duck.sql(sql).df()) is None
    else:
        assert ray_df is not None


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e
