"""Persisted bucketed tables + bucket-aligned join (ops/bucket.py).

Ground truth is pandas.merge on the same inputs; the inner/left contract
mirrors shuffle_join's (right side unique per key, pc.index_in
first-match), so the generators keep right keys unique for those modes.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doonop_ray.ops.bucket import bucket_table, bucketed_join


def _write(tmp_path, name: str, table: pa.Table) -> str:
    p = os.path.join(tmp_path, f"{name}.parquet")
    pq.write_table(table, p)
    return p


def _sides(seed: int, n_left: int, n_right: int, key_space: int):
    rng = np.random.default_rng(seed)
    lkeys = rng.integers(0, key_space, n_left).astype(np.int64)
    rkeys = rng.permutation(key_space)[:n_right].astype(np.int64)  # unique
    lv = rng.integers(0, 1000, n_left).astype(np.int64)
    rv = rng.integers(0, 1000, n_right).astype(np.int64)
    return lkeys, lv, rkeys, rv


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
@pytest.mark.parametrize("seed,nb", [(1, 4), (2, 7), (3, 16)])
def test_bucketed_join_matches_pandas(ray_session, tmp_path, how, seed, nb):
    tmp_path = str(tmp_path)
    lkeys, lv, rkeys, rv = _sides(seed, 300, 40, 60)
    lp = _write(tmp_path, "left", pa.table({"key": lkeys, "lv": lv}))
    rp = _write(tmp_path, "right", pa.table({"key": rkeys, "rv": rv}))
    ld = bucket_table(lp, "key", nb)
    rd_ = bucket_table(rp, "key", nb)
    rcols = ["rv"] if how in ("inner", "left") else []
    got = bucketed_join(ld, rd_, "key", ["lv"], rcols, how, nb).to_pandas()

    ldf = pd.DataFrame({"key": lkeys, "lv": lv})
    rdf = pd.DataFrame({"key": rkeys, "rv": rv})
    if how in ("inner", "left"):
        exp = ldf.merge(rdf, on="key", how=how)
    elif how == "semi":
        exp = ldf[ldf["key"].isin(rkeys)]
    else:
        exp = ldf[~ldf["key"].isin(rkeys)]
    cols = ["key", "lv"] + rcols
    if not len(got.columns):
        got = pd.DataFrame({c: [] for c in cols})
    got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(got) == len(exp)
    for c in cols:
        g, e = got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float)
        assert ((g == e) | (np.isnan(g) & np.isnan(e))).all(), (how, c)


def test_bucketed_join_string_keys(ray_session, tmp_path):
    tmp_path = str(tmp_path)
    rng = np.random.default_rng(11)
    keys = [f"user-{i}" for i in range(50)]
    lkeys = [keys[i] for i in rng.integers(0, 50, 200)]
    rkeys = keys[:30]
    lp = _write(tmp_path, "l", pa.table(
        {"key": lkeys, "lv": rng.integers(0, 9, 200)}))
    rp = _write(tmp_path, "r", pa.table(
        {"key": rkeys, "rv": np.arange(30)}))
    ld, rd_ = bucket_table(lp, "key", 8), bucket_table(rp, "key", 8)
    got = bucketed_join(ld, rd_, "key", ["lv"], ["rv"], "inner", 8).to_pandas()
    exp = (pd.DataFrame({"key": lkeys, "lv": pd.read_parquet(lp)["lv"]})
           .merge(pd.DataFrame({"key": rkeys, "rv": np.arange(30)}), on="key"))
    assert len(got) == len(exp)
    assert (got.sort_values(["key", "lv"]).reset_index(drop=True)["rv"].to_numpy()
            == exp.sort_values(["key", "lv"]).reset_index(drop=True)["rv"].to_numpy()).all()


def test_bucketed_join_renamed_key_alignment(ray_session, tmp_path):
    """o_custkey/c_custkey shape: bucket ids depend only on key VALUES,
    so differently-named key columns still co-locate."""
    tmp_path = str(tmp_path)
    lp = _write(tmp_path, "orders", pa.table(
        {"o_custkey": np.array([1, 2, 2, 3, 9], np.int64),
         "total": np.array([10.0, 20.0, 25.0, 30.0, 90.0])}))
    rp = _write(tmp_path, "cust", pa.table(
        {"c_custkey": np.array([1, 2, 3], np.int64),
         "seg": ["A", "B", "A"]}))
    ld = bucket_table(lp, "o_custkey", 5)
    rd_ = bucket_table(rp, "c_custkey", 5)
    got = bucketed_join(ld, rd_, "o_custkey", ["total"], ["seg"],
                        "inner", 5, right_key="c_custkey").to_pandas()
    got = got.sort_values(["o_custkey", "total"]).reset_index(drop=True)
    assert list(got["o_custkey"]) == [1, 2, 2, 3]
    assert list(got["seg"]) == ["A", "B", "B", "A"]


def test_bucket_table_cache_reuse(ray_session, tmp_path):
    tmp_path = str(tmp_path)
    p = _write(tmp_path, "t", pa.table(
        {"key": np.arange(100, dtype=np.int64), "v": np.arange(100)}))
    d1 = bucket_table(p, "key", 4)
    mtime = os.path.getmtime(d1)
    d2 = bucket_table(p, "key", 4)
    assert d1 == d2 and os.path.getmtime(d2) == mtime  # no rebuild
    # different params -> different published dir
    assert bucket_table(p, "key", 8) != d1
    # rewriting the source invalidates the fingerprint
    pq.write_table(pa.table(
        {"key": np.arange(50, dtype=np.int64), "v": np.arange(50)}), p)
    os.utime(p, ns=(1, 1))  # force distinct mtime_ns
    assert bucket_table(p, "key", 4) != d1


def test_order_revenue_by_segment_bucketed_matches_duckdb(ray_session):
    import duckdb

    from doonop_ray.ops.bucket import order_revenue_by_segment_bucketed

    sf = "/root/testdata/sf0.001"
    got = order_revenue_by_segment_bucketed(sf)
    exp = duckdb.connect().execute(f"""
        SELECT c_mktsegment AS segment, ROUND(SUM(o_totalprice)) AS total_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM '{sf}/orders.parquet' JOIN '{sf}/customer.parquet'
          ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1
    """).df()
    assert list(got["segment"]) == list(exp["segment"])
    assert (got["total_revenue"].to_numpy() == exp["total_revenue"].to_numpy()).all()
    assert (got["n_orders"].to_numpy() == exp["n_orders"].to_numpy()).all()


def test_bucketed_join_finalize_matches_posthoc(ray_session, tmp_path):
    """finalize applied inside the bucket task must equal applying the
    same per-key rollup to the plain join output grouped per bucket —
    and the empty join yields finalize(empty) with a stable schema."""
    tmp_path = str(tmp_path)
    lkeys, lv, rkeys, rv = _sides(7, 400, 50, 70)
    lp = _write(tmp_path, "l", pa.table({"key": lkeys, "lv": lv}))
    rp = _write(tmp_path, "r", pa.table({"key": rkeys, "rv": rv}))
    ld, rd_ = bucket_table(lp, "key", 8), bucket_table(rp, "key", 8)

    def per_key_sum(t: pa.Table) -> pa.Table:
        g = t.group_by("key", use_threads=False).aggregate([("lv", "sum")])
        return pa.table({"key": g["key"], "s": g["lv_sum"]})

    got = bucketed_join(ld, rd_, "key", ["lv"], ["rv"], "inner", 8,
                        finalize=per_key_sum).to_pandas()
    plain = bucketed_join(ld, rd_, "key", ["lv"], ["rv"], "inner",
                          8).to_pandas()
    exp = plain.groupby("key", as_index=False)["lv"].sum().rename(
        columns={"lv": "s"})
    got = got.sort_values("key").reset_index(drop=True)
    exp = exp.sort_values("key").reset_index(drop=True)
    assert (got["key"].to_numpy() == exp["key"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()


def test_bucket_dataset_empty_input_publishes_schema(ray_session, tmp_path):
    """write_parquet of an all-empty derived dataset creates no dir;
    bucket_dataset must still publish a joinable (schema-carrying)
    bucket layout (code-review round-3 finding)."""
    import shutil

    import ray.data as rdata

    from doonop_ray.ops.bucket import _schema_of, bucket_dataset

    ds = rdata.from_arrow(pa.table({"key": pa.array([1], pa.int64()),
                                    "v": pa.array([2.0], pa.float64())}))
    empty = ds.filter(lambda row: False)
    d = bucket_dataset(empty, "key", 4,
                       schema=pa.schema([("key", pa.int64()),
                                         ("v", pa.float64())]))
    try:
        sch = _schema_of(d)
        assert sch.field("key").type == pa.int64()
        assert sch.field("v").type == pa.float64()
    finally:
        shutil.rmtree(d, ignore_errors=True)
