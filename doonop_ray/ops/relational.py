"""Relational operator suite over the TPC-H-ish testdata tables.

Each function takes ``sf_dir`` and returns a small pandas DataFrame whose
column names match the paired oracle SQL in ``__ray_entry__.oracle_sql``.

Patterns exercised (SURVEY.md §2d — what the rebuild adds on top of the
reference's driver-side counters):
- partial aggregation inside map_batches before the groupby shuffle;
- broadcast lookups ONLY for bounded dimension tables (nation, region,
  supplier, part — ray.put once, pc.index_in/take per batch);
- corpus-growing fact sides (orders, customer) through the sort-cogroup
  ``shuffle_join`` (round-3: no fact-table ray.put anywhere);
- vectorized Arrow predicates (regex, date) pushed into the read/batch;
- global sort + limit on pre-reduced data only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from datetime import datetime

from .common import bcast_get, finish, r4, read, read_arrow


from .common import _ensure_cols  # noqa: E402  (shared guard)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary with
    partial per-batch aggregation before the tiny groupby shuffle."""
    from ray.data.aggregate import Count, Sum

    ds = read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(datetime(1999, 6, 30))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("l_quantity_count", alias_name="count_order"),
        )
        .to_pandas()
    )
    out = _ensure_cols(out, {
        "l_returnflag": "str", "l_linestatus": "str", "sum_qty": "float64",
        "sum_base_price": "float64", "sum_disc_price": "float64",
        "count_order": "int64"})
    out["avg_qty"] = r4(out["sum_qty"] / out["count_order"])
    out["avg_price"] = r4(out["sum_base_price"] / out["count_order"])
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = r4(out[c])
    return finish(out, ["l_returnflag", "l_linestatus"])


def q3_shipping_priority_allshuffle(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape, all-shuffle: orders and customer are FACT tables
    (they grow with the corpus — round-2 VERDICT #1), so neither is
    broadcast. orders ⋉ building-customers on custkey and lineitem ⋉
    qualifying-orders on orderkey both go through ``shuffle_join``
    (sort-cogroup, one all-to-all each); per-orderkey revenue partials
    are pre-aggregated inside map_batches before every shuffle, and the
    global top-10 is a per-block partial top-10 merged on the driver —
    nothing corpus-sized leaves the cluster."""
    from .join import shuffle_join

    cust_keys = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table(
            {"key": t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))["c_custkey"]}),
        batch_format="pyarrow",
    )
    orders_f = read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: (
            lambda f: pa.table({"key": f["o_custkey"],
                                "o_orderkey": f["o_orderkey"]})
        )(t.filter(pc.less(t["o_orderdate"], pa.scalar(datetime(1998, 6, 30))))),
        batch_format="pyarrow",
    )
    qualifying = shuffle_join(
        orders_f, cust_keys, "key", ["o_orderkey"], [], how="semi",
        left_types={"o_orderkey": pa.int64()}, right_types={}, num_blocks=32,
    ).map_batches(lambda t: pa.table({"key": t["o_orderkey"]}),
                  batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(datetime(1998, 6, 30))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"key": t["l_orderkey"], "rev": rev}).group_by(
            "key", use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": part["key"], "rev": part["rev_sum"]})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
              ).map_batches(li_partial, batch_format="pyarrow", batch_size=65536)
    joined = shuffle_join(li, qualifying, "key", ["rev"], [], how="semi",
                          left_types={"rev": pa.float64()}, right_types={},
                          num_blocks=32)

    def block_agg_top10(t: pa.Table) -> pa.Table:
        # shuffle_join guarantees a key's rows never straddle output
        # blocks, so this block-local sum is the COMPLETE per-order
        # revenue — no second all-to-all. Round BEFORE the partial top-k
        # so block selection uses exactly the ordering the final
        # (rounded) driver sort uses — otherwise a sub-1e-4 difference
        # could drop a row that rounding would have tie-broken in
        t = t.group_by("key", use_threads=False).aggregate([("rev", "sum")])
        t = t.set_column(t.schema.get_field_index("rev_sum"), "rev_sum",
                         pa.array(r4(t["rev_sum"].to_numpy(zero_copy_only=False))))
        idx = pc.sort_indices(t, sort_keys=[("rev_sum", "descending"),
                                            ("key", "ascending")])
        return t.take(idx.slice(0, min(10, len(t))))

    out = joined.map_batches(
        block_agg_top10, batch_format="pyarrow", batch_size=None).to_pandas()
    out = _ensure_cols(out, {"key": "int64", "rev_sum": "float64"})
    out = out.rename(columns={"key": "l_orderkey", "rev_sum": "revenue"})
    out["revenue"] = r4(out["revenue"])
    out = out.sort_values(["revenue", "l_orderkey"], ascending=[False, True],
                          kind="mergesort").head(10)
    return out.reset_index(drop=True)[["l_orderkey", "revenue"]]


# Shared superset fact buckets: ONE persisted exchange per (table, key)
# serves every query in the Q family — per-query reads prune to the
# columns that query joins (bucketed_join passes columns= to the read).
_LI_BUCKET_COLS = ["l_orderkey", "l_partkey", "l_suppkey",
                   "l_extendedprice", "l_discount", "l_shipdate",
                   "l_quantity", "l_returnflag", "l_linestatus"]
_ORD_BUCKET_COLS = ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice", "o_orderstatus",
                    "o_orderpriority"]


def _li_buckets(sf_dir: str, n_buckets: int = 32) -> str:
    import os

    from .bucket import bucket_table

    return bucket_table(os.path.join(sf_dir, "lineitem.parquet"),
                        "l_orderkey", n_buckets, columns=_LI_BUCKET_COLS)


def _ord_buckets(sf_dir: str, key: str, n_buckets: int = 32) -> str:
    import os

    from .bucket import bucket_table

    return bucket_table(os.path.join(sf_dir, "orders.parquet"),
                        key, n_buckets, columns=_ORD_BUCKET_COLS)


def _cust_buckets(sf_dir: str, n_buckets: int = 32) -> str:
    import os

    from .bucket import bucket_table

    return bucket_table(os.path.join(sf_dir, "customer.parquet"),
                        "c_custkey", n_buckets,
                        columns=["c_custkey", "c_nationkey",
                                 "c_mktsegment", "c_name"])


def q5_revenue_by_nation_allshuffle(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape, shuffle-shaped: supplier/nation are true dimensions
    (broadcast once); orders and customer are corpus-growing FACT tables
    routed through ``shuffle_join`` (round-2 VERDICT #1). Lineitem attaches
    the supplier nation via broadcast, pre-aggregates revenue per
    (orderkey, supp-nation), joins orders for the custkey (shuffle #1),
    re-partials per (custkey, supp-nation), joins customer for the
    cust-nation (shuffle #2), keeps local-supplier rows, and rolls up to
    the bounded nation key with Ray's groupby. This is the
    no-precomputation path; the canonical ``q5_revenue_by_nation``
    amortizes the exchanges via persisted buckets."""
    import ray
    from ray.data.aggregate import Sum

    from .join import shuffle_join

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(tuple(a.combine_chunks() for a in (
        nation["n_nationkey"], nation["n_name"],
        supp["s_suppkey"], supp["s_nationkey"],
    )))

    def li_partial(t: pa.Table) -> pa.Table:
        _, _, s_key, s_nat = bcast_get(dims_ref)
        sn = pc.take(s_nat, pc.index_in(t["l_suppkey"], value_set=s_key))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"key": t["l_orderkey"], "sn": sn, "rev": rev}).group_by(
            ["key", "sn"], use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": part["key"], "sn": part["sn"],
                         "rev": part["rev_sum"]})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
              ).map_batches(li_partial, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({"key": t["o_orderkey"], "o_custkey": t["o_custkey"]}),
        batch_format="pyarrow")
    j1 = shuffle_join(li, orders, "key", ["sn", "rev"], ["o_custkey"], "inner",
                      left_types={"sn": pa.int32(), "rev": pa.float64()},
                      right_types={"o_custkey": pa.int64()}, num_blocks=32)

    def rekey_cust(t: pa.Table) -> pa.Table:
        part = pa.table({"key": t["o_custkey"], "sn": t["sn"],
                         "rev": t["rev"]}).group_by(
            ["key", "sn"], use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": part["key"], "sn": part["sn"],
                         "rev": part["rev_sum"]})

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"], "cn": t["c_nationkey"]}),
        batch_format="pyarrow")
    j2 = shuffle_join(
        j1.map_batches(rekey_cust, batch_format="pyarrow", batch_size=65536),
        cust, "key", ["sn", "rev"], ["cn"], "inner",
        left_types={"sn": pa.int32(), "rev": pa.float64()},
        right_types={"cn": pa.int32()}, num_blocks=32)

    def name_partial(t: pa.Table) -> pa.Table:
        n_key, n_name, _, _ = bcast_get(dims_ref)
        t = t.filter(pc.equal(t["sn"], t["cn"]))
        name = pc.take(n_name, pc.index_in(t["sn"], value_set=n_key))
        return pa.table({"n_name": name, "rev": t["rev"]}).group_by(
            "n_name", use_threads=False).aggregate([("rev", "sum")])

    out = (
        j2.map_batches(name_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("n_name")
        .aggregate(Sum("rev_sum", alias_name="revenue"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"n_name": "str", "revenue": "float64"})
    out["revenue"] = r4(out["revenue"])
    return finish(out, ["n_name"])


def q5_revenue_by_nation(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Q5 with ZERO query-time sorts (canonical; round-2 VERDICT's
    bucketed-join routing): lineitem/orders/customer live in persisted
    hash buckets (``bucket_table`` — the all-to-all is paid once and
    amortizes across every orderkey/custkey join in the Q family), the
    lineitem⋈orders join is bucket-aligned, and the re-key onto custkey
    ships only per-(custkey, supp-nation) PARTIALS through a
    storage-backed ``bucket_dataset`` exchange before the bucket-aligned
    customer join. Supplier/nation stay broadcast (true bounded
    dimensions)."""
    import shutil

    import ray
    from ray.data.aggregate import Sum

    from .bucket import bucket_dataset, bucketed_join

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(tuple(a.combine_chunks() for a in (
        nation["n_nationkey"], nation["n_name"],
        supp["s_suppkey"], supp["s_nationkey"],
    )))

    ldir = _li_buckets(sf_dir, n_buckets)
    odir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    cdir = _cust_buckets(sf_dir, n_buckets)

    j1 = bucketed_join(
        ldir, odir, key="l_orderkey", right_key="o_orderkey",
        left_cols=["l_suppkey", "l_extendedprice", "l_discount"],
        right_cols=["o_custkey"], n_buckets=n_buckets)

    def cust_partial(t: pa.Table) -> pa.Table:
        _, _, s_key, s_nat = bcast_get(dims_ref)
        sn = pc.take(s_nat, pc.index_in(t["l_suppkey"], value_set=s_key))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"key": t["o_custkey"], "sn": sn, "rev": rev}
                        ).group_by(["key", "sn"],
                                   use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": part["key"], "sn": part["sn"],
                         "rev": part["rev_sum"]})

    jdir = bucket_dataset(
        j1.map_batches(cust_partial, batch_format="pyarrow",
                       batch_size=None),
        "key", n_buckets,
        schema=pa.schema([("key", pa.int64()), ("sn", pa.int32()),
                          ("rev", pa.float64())]))
    try:
        j2 = bucketed_join(
            jdir, cdir, key="key", right_key="c_custkey",
            left_cols=["sn", "rev"], right_cols=["c_nationkey"],
            n_buckets=n_buckets)

        def name_partial(t: pa.Table) -> pa.Table:
            n_key, n_name, _, _ = bcast_get(dims_ref)
            t = t.filter(pc.equal(t["sn"], t["c_nationkey"]))
            name = pc.take(n_name, pc.index_in(t["sn"], value_set=n_key))
            return pa.table({"n_name": name, "rev": t["rev"]}).group_by(
                "n_name", use_threads=False).aggregate([("rev", "sum")])

        out = (
            j2.map_batches(name_partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("n_name")
            .aggregate(Sum("rev_sum", alias_name="revenue"))
            .to_pandas()
        )
    finally:
        shutil.rmtree(jdir, ignore_errors=True)
    out = _ensure_cols(out, {"n_name": "str", "revenue": "float64"})
    out["revenue"] = r4(out["revenue"])
    return finish(out, ["n_name"])


def top_orders_by_value(sf_dir: str) -> pd.DataFrame:
    """Global top-10 via per-block PARTIAL top-k + a tiny driver merge —
    a full ds.sort for a bounded result is an all-to-all the operator
    doesn't need (the global top-k is a subset of every block's local
    top-k)."""

    def block_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("o_totalprice", "descending"),
                                            ("o_orderkey", "ascending")])
        return t.take(idx.slice(0, min(10, len(t))))

    out = (
        read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(block_top, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = out.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(10)
    return out.reset_index(drop=True)


def filter_parts_regex(sf_dir: str) -> pd.DataFrame:
    """Vectorized regex predicate (RE2 via pyarrow) — the M6 filter shape."""
    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    out = ds.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["p_name"], "red|blue")),
        batch_format="pyarrow",
    ).to_pandas()
    return finish(out, ["p_partkey"])


def events_by_type(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Max, Min, Sum

    out = (
        read(sf_dir, "events", ["event_type", "value"])
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    out = _ensure_cols(out, {
        "event_type": "str", "n": "int64", "sum_value": "float64",
        "min_value": "float64", "max_value": "float64"})
    out["sum_value"] = r4(out["sum_value"])
    return finish(out, ["event_type"])


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    """Distinct + sort (the seed clean_urls sort+dedup shape, M10)."""
    ds = read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment") or [])
    return pd.DataFrame({"c_mktsegment": pd.Series(vals, dtype="str")})


def nation_customer_counts(sf_dir: str) -> pd.DataFrame:
    """Broadcast join customer→nation then count per nation name."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    ref = ray.put((nation["n_nationkey"].combine_chunks(),
                   nation["n_name"].combine_chunks()))

    def attach(t: pa.Table) -> pa.Table:
        n_key, n_name = bcast_get(ref)
        names = pc.take(n_name, pc.index_in(t["c_nationkey"], value_set=n_key))
        return t.append_column("n_name", names)

    out = (
        read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"),
                   Sum("c_acctbal", alias_name="sum_acctbal"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"n_name": "str", "n_customers": "int64",
                             "sum_acctbal": "float64"})
    out["sum_acctbal"] = r4(out["sum_acctbal"])
    return finish(out, ["n_name"])


def top_orders_per_customer(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k (window-function shape): each customer's k most
    valuable orders with rank — via ``grouped_apply`` (customer
    cardinality grows with the corpus; Ray's per-group machinery would
    dominate at 10^8 keys)."""
    from .common import grouped_apply

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("o_totalprice", "descending"),
                          ("o_orderkey", "ascending")])
        top = g.take(idx.slice(0, min(k, len(g))))
        return top.append_column(
            "rank", pa.array(np.arange(1, len(top) + 1, dtype=np.int64)))

    empty = pa.table({
        "o_custkey": pa.array([], pa.int64()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_totalprice": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64()),
    })
    ds = read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_apply(ds, "o_custkey", topk, empty).to_pandas()
    return finish(out, ["o_custkey", "rank"])


def customers_no_recent_orders(sf_dir: str) -> pd.DataFrame:
    """ANTI-join at fact×fact scale: customers with no order on/after
    2000-01-01. The recent-order custkey side grows with the corpus, so
    it goes through ``shuffle_join`` (semi/anti tolerate duplicate right
    keys — no distinct pass needed) instead of a ray.put broadcast."""
    from .join import shuffle_join

    recent = read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"key": t.filter(pc.greater_equal(
            t["o_orderdate"], pa.scalar(datetime(2000, 1, 1))))["o_custkey"]}),
        batch_format="pyarrow")
    cust = read(sf_dir, "customer",
                ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"], "c_name": t["c_name"],
                            "c_mktsegment": t["c_mktsegment"]}),
        batch_format="pyarrow")
    out = shuffle_join(
        cust, recent, "key", ["c_name", "c_mktsegment"], [], "anti",
        left_types={"c_name": pa.string(), "c_mktsegment": pa.string()},
        right_types={}, num_blocks=32,
    ).map_batches(
        lambda t: pa.table({"c_custkey": t["key"], "c_name": t["c_name"],
                            "c_mktsegment": t["c_mktsegment"]}),
        batch_format="pyarrow").to_pandas()
    out = _ensure_cols(out, {"c_custkey": "int64", "c_name": "str",
                             "c_mktsegment": "str"})
    return finish(out, ["c_custkey"])


def region_customer_rollup(sf_dir: str) -> pd.DataFrame:
    """Two-level broadcast star join (region ← nation ← customer):
    customer counts + account-balance sum per region name. The two
    dimension tables broadcast once; the fact scan attaches the region
    via chained pc.index_in/take lookups — no shuffle join."""
    import ray
    from ray.data.aggregate import Count, Sum

    region = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    ref = ray.put(tuple(a.combine_chunks() for a in (
        region["r_regionkey"], region["r_name"],
        nation["n_nationkey"], nation["n_regionkey"],
    )))

    def attach(t: pa.Table) -> pa.Table:
        r_key, r_name, n_key, n_reg = bcast_get(ref)
        reg = pc.take(n_reg, pc.index_in(t["c_nationkey"], value_set=n_key))
        name = pc.take(r_name, pc.index_in(reg, value_set=r_key))
        return t.append_column("r_name", name)

    out = (
        read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"),
                   Sum("c_acctbal", alias_name="sum_acctbal"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"r_name": "str", "n_customers": "int64",
                             "sum_acctbal": "float64"})
    out["sum_acctbal"] = r4(out["sum_acctbal"])
    return finish(out, ["r_name"])


def semi_join_recent_customers(sf_dir: str) -> pd.DataFrame:
    """SEMI join at fact×fact scale: customers with at least one order
    on/after 2000-01-01 (the positive twin of
    customers_no_recent_orders; same shuffle shape, same reason)."""
    from .join import shuffle_join

    recent = read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"key": t.filter(pc.greater_equal(
            t["o_orderdate"], pa.scalar(datetime(2000, 1, 1))))["o_custkey"]}),
        batch_format="pyarrow")
    cust = read(sf_dir, "customer",
                ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"], "c_name": t["c_name"],
                            "c_mktsegment": t["c_mktsegment"]}),
        batch_format="pyarrow")
    out = shuffle_join(
        cust, recent, "key", ["c_name", "c_mktsegment"], [], "semi",
        left_types={"c_name": pa.string(), "c_mktsegment": pa.string()},
        right_types={}, num_blocks=32,
    ).map_batches(
        lambda t: pa.table({"c_custkey": t["key"], "c_name": t["c_name"],
                            "c_mktsegment": t["c_mktsegment"]}),
        batch_format="pyarrow").to_pandas()
    out = _ensure_cols(out, {"c_custkey": "int64", "c_name": "str",
                             "c_mktsegment": "str"})
    return finish(out, ["c_custkey"])


def orders_monthly(sf_dir: str) -> pd.DataFrame:
    """Calendar rollup: order count + revenue per (year, month) —
    vectorized temporal extraction inside map_batches, partial per-batch
    aggregation before the tiny groupby shuffle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        m = pc.month(t["o_orderdate"])
        t2 = pa.table({
            "o_year": pc.cast(y, pa.int64()),
            "o_month": pc.cast(m, pa.int64()),
            "o_totalprice": t["o_totalprice"],
        })
        agg = t2.group_by(["o_year", "o_month"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])
        return agg

    out = (
        read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["o_year", "o_month"])
        .aggregate(Sum("o_totalprice_sum", alias_name="revenue"),
                   Sum("o_totalprice_count", alias_name="n_orders"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"o_year": "int64", "o_month": "int64",
                             "revenue": "float64", "n_orders": "int64"})
    out["revenue"] = r4(out["revenue"])
    return finish(out, ["o_year", "o_month"])


def brand_price_stats(sf_dir: str) -> pd.DataFrame:
    """Per-brand retail price stats (count/min/max/avg)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    out = (
        read(sf_dir, "part", ["p_brand", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Min("p_retailprice", alias_name="min_price"),
            Max("p_retailprice", alias_name="max_price"),
            Sum("p_retailprice", alias_name="sum_price"),
        )
        .to_pandas()
    )
    out = _ensure_cols(out, {"p_brand": "str", "n_parts": "int64",
                             "min_price": "float64", "max_price": "float64",
                             "sum_price": "float64"})
    out["avg_price"] = r4(out["sum_price"] / out["n_parts"])
    out["sum_price"] = r4(out["sum_price"])
    return finish(out, ["p_brand"])


def q7_volume_shipping_allshuffle(sf_dir: str, nation_a: str = "NATION_1",
                                  nation_b: str = "NATION_2") -> pd.DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year.
    supplier/nation broadcast (true dimensions); orders and customer go
    through ``shuffle_join`` with per-key pre-aggregation before each
    shuffle (round-2 VERDICT #1 — no corpus-growing broadcast). Only
    rows whose (supp_nation, cust_nation) is the wanted unordered pair
    survive, grouped by (supp_nation, cust_nation, year)."""
    import ray
    from ray.data.aggregate import Sum

    from .join import shuffle_join

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(tuple(a.combine_chunks() for a in (
        nation["n_nationkey"], nation["n_name"],
        supp["s_suppkey"], supp["s_nationkey"],
    )))

    def li_partial(t: pa.Table) -> pa.Table:
        _, _, s_key, s_nat = bcast_get(dims_ref)
        sn = pc.take(s_nat, pc.index_in(t["l_suppkey"], value_set=s_key))
        vol = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"key": t["l_orderkey"], "sn": sn, "vol": vol}).group_by(
            ["key", "sn"], use_threads=False).aggregate([("vol", "sum")])
        return pa.table({"key": part["key"], "sn": part["sn"],
                         "vol": part["vol_sum"]})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
              ).map_batches(li_partial, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "key": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "l_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64())}),
        batch_format="pyarrow")
    j1 = shuffle_join(li, orders, "key", ["sn", "vol"],
                      ["o_custkey", "l_year"], "inner",
                      left_types={"sn": pa.int32(), "vol": pa.float64()},
                      right_types={"o_custkey": pa.int64(),
                                   "l_year": pa.int64()}, num_blocks=32)

    def rekey_cust(t: pa.Table) -> pa.Table:
        part = pa.table({"key": t["o_custkey"], "sn": t["sn"],
                         "l_year": t["l_year"], "vol": t["vol"]}).group_by(
            ["key", "sn", "l_year"], use_threads=False).aggregate(
            [("vol", "sum")])
        return pa.table({"key": part["key"], "sn": part["sn"],
                         "l_year": part["l_year"], "vol": part["vol_sum"]})

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"], "cn": t["c_nationkey"]}),
        batch_format="pyarrow")
    j2 = shuffle_join(
        j1.map_batches(rekey_cust, batch_format="pyarrow", batch_size=65536),
        cust, "key", ["sn", "vol", "l_year"], ["cn"], "inner",
        left_types={"sn": pa.int32(), "vol": pa.float64(),
                    "l_year": pa.int64()},
        right_types={"cn": pa.int32()}, num_blocks=32)

    def name_partial(t: pa.Table) -> pa.Table:
        n_key, n_name, _, _ = bcast_get(dims_ref)
        sname = pc.take(n_name, pc.index_in(t["sn"], value_set=n_key))
        cname = pc.take(n_name, pc.index_in(t["cn"], value_set=n_key))
        pair_ok = pc.or_(
            pc.and_(pc.equal(sname, nation_a), pc.equal(cname, nation_b)),
            pc.and_(pc.equal(sname, nation_b), pc.equal(cname, nation_a)),
        )
        return pa.table({
            "supp_nation": sname, "cust_nation": cname,
            "l_year": t["l_year"], "volume": t["vol"],
        }).filter(pair_ok).group_by(
            ["supp_nation", "cust_nation", "l_year"],
            use_threads=False).aggregate([("volume", "sum")])

    out = (
        j2.map_batches(name_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("volume_sum", alias_name="revenue"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"supp_nation": "str", "cust_nation": "str",
                             "l_year": "int64", "revenue": "float64"})
    out["revenue"] = r4(out["revenue"])
    return finish(out, ["supp_nation", "cust_nation", "l_year"])


def q9_profit_by_nation(sf_dir: str, part_pattern: str = "red") -> pd.DataFrame:
    """TPC-H Q9 shape (adapted — no partsupp table here): profit from
    lineitems whose part name contains ``part_pattern``, grouped by
    supplier nation and order year. Part/supplier/nation are true
    dimensions (broadcast); the orders year lookup is a ``shuffle_join``
    on pre-aggregated (orderkey, nation) profit partials (round-2
    VERDICT #1 — no corpus-growing broadcast). Deliberately NOT
    bucket-routed: the part-pattern pre-filter shrinks the lineitem side
    ~10× BEFORE the exchange, so the filtered sort beats re-reading full
    lineitem buckets (measured 1.85 s vs 2.0 s at sf0.1/32cpu — the
    pre-filter is the rare case where shuffle beats bucket reuse)."""
    import ray
    from ray.data.aggregate import Sum

    from .join import shuffle_join

    part = read_arrow(sf_dir, "part", ["p_partkey", "p_name"])
    keep = pc.filter(
        part["p_partkey"],
        pc.match_substring(part["p_name"], part_pattern),
    ).combine_chunks()
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put((keep,) + tuple(a.combine_chunks() for a in (
        nation["n_nationkey"], nation["n_name"],
        supp["s_suppkey"], supp["s_nationkey"],
    )))

    def li_partial(t: pa.Table) -> pa.Table:
        keep, n_key, n_name, s_key, s_nat = bcast_get(dims_ref)
        t = t.filter(pc.is_in(t["l_partkey"], value_set=keep))
        sn = pc.take(s_nat, pc.index_in(t["l_suppkey"], value_set=s_key))
        nname = pc.take(n_name, pc.index_in(sn, value_set=n_key))
        profit = pc.multiply(t["l_extendedprice"],
                             pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part_t = pa.table({"key": t["l_orderkey"], "nation": nname,
                           "profit": profit}).group_by(
            ["key", "nation"], use_threads=False).aggregate(
            [("profit", "sum")])
        return pa.table({"key": part_t["key"], "nation": part_t["nation"],
                         "profit": part_t["profit_sum"]})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
               "l_discount"]).map_batches(
        li_partial, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "key": t["o_orderkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64())}),
        batch_format="pyarrow")
    j1 = shuffle_join(li, orders, "key", ["nation", "profit"],
                      ["o_year"], "inner",
                      left_types={"nation": pa.string(),
                                  "profit": pa.float64()},
                      right_types={"o_year": pa.int64()}, num_blocks=32)

    out = (
        j1.map_batches(
            lambda t: pa.table({
                "nation": t["nation"], "o_year": t["o_year"],
                "profit": t["profit"]}).group_by(
                ["nation", "o_year"], use_threads=False).aggregate(
                [("profit", "sum")]),
            batch_format="pyarrow", batch_size=65536)
        .groupby(["nation", "o_year"])
        .aggregate(Sum("profit_sum", alias_name="sum_profit"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"nation": "str", "o_year": "int64",
                             "sum_profit": "float64"})
    out["sum_profit"] = r4(out["sum_profit"])
    return finish(out, ["nation", "o_year"])


def q3_shipping_priority(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Q3, bucket-routed (canonical): orders⋈customer is bucket-aligned
    on custkey against the persisted buckets; the qualifying orderkey
    set (corpus-growing — never broadcast) re-keys through a narrow
    ``bucket_dataset`` exchange; the lineitem semi-join is bucket-
    aligned on orderkey, and per-order revenue is complete block-locally
    (a bucket holds all of a key's rows), so the global top-10 is a
    per-block partial + tiny driver merge. Zero query-time sorts."""
    import shutil

    from .bucket import bucket_dataset, bucketed_join

    cutoff = pa.scalar(datetime(1998, 6, 30))
    j1 = bucketed_join(
        _ord_buckets(sf_dir, "o_custkey", n_buckets),
        _cust_buckets(sf_dir, n_buckets),
        key="o_custkey", right_key="c_custkey",
        left_cols=["o_orderkey", "o_orderdate"],
        right_cols=["c_mktsegment"], n_buckets=n_buckets)

    def qualify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["c_mktsegment"], "BUILDING"),
                             pc.less(t["o_orderdate"], cutoff)))
        return pa.table({"l_orderkey": t["o_orderkey"]})

    qdir = bucket_dataset(
        j1.map_batches(qualify, batch_format="pyarrow"),
        "l_orderkey", n_buckets,
        schema=pa.schema([("l_orderkey", pa.int64())]))

    def bucket_top10(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"key": t["l_orderkey"], "rev": rev}).group_by(
            "key", use_threads=False).aggregate([("rev", "sum")])
        # round BEFORE the partial top-k (same tie rule as the final
        # driver sort — see q3_shipping_priority_allshuffle)
        g = g.set_column(
            g.schema.get_field_index("rev_sum"), "rev_sum",
            pa.array(r4(g["rev_sum"].to_numpy(zero_copy_only=False))))
        idx = pc.sort_indices(g, sort_keys=[("rev_sum", "descending"),
                                            ("key", "ascending")])
        return g.take(idx.slice(0, min(10, len(g))))

    try:
        # per-order rollup + partial top-10 run as the join's finalize:
        # per-bucket completeness only holds INSIDE the bucket task
        # (output blocks may re-split at the target block size)
        j2 = bucketed_join(
            _li_buckets(sf_dir, n_buckets), qdir, key="l_orderkey",
            left_cols=["l_extendedprice", "l_discount", "l_shipdate"],
            right_cols=[], how="semi", n_buckets=n_buckets,
            finalize=bucket_top10)
        out = j2.to_pandas()
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
    out = _ensure_cols(out, {"key": "int64", "rev_sum": "float64"})
    out = out.rename(columns={"key": "l_orderkey", "rev_sum": "revenue"})
    out = out.sort_values(["revenue", "l_orderkey"], ascending=[False, True],
                          kind="mergesort").head(10)
    return out.reset_index(drop=True)[["l_orderkey", "revenue"]]


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2",
                       n_buckets: int = 32) -> pd.DataFrame:
    """Q7, bucket-routed (canonical; same plan as ``q5``): bucket-
    aligned lineitem⋈orders, per-(custkey, supp-nation, year) partials
    through the narrow ``bucket_dataset`` exchange, bucket-aligned
    customer join, bounded-key rollup. Zero query-time sorts."""
    import shutil

    import ray
    from ray.data.aggregate import Sum

    from .bucket import bucket_dataset, bucketed_join

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(tuple(a.combine_chunks() for a in (
        nation["n_nationkey"], nation["n_name"],
        supp["s_suppkey"], supp["s_nationkey"],
    )))

    j1 = bucketed_join(
        _li_buckets(sf_dir, n_buckets),
        _ord_buckets(sf_dir, "o_orderkey", n_buckets),
        key="l_orderkey", right_key="o_orderkey",
        left_cols=["l_suppkey", "l_extendedprice", "l_discount"],
        right_cols=["o_custkey", "o_orderdate"], n_buckets=n_buckets)

    def cust_partial(t: pa.Table) -> pa.Table:
        _, _, s_key, s_nat = bcast_get(dims_ref)
        sn = pc.take(s_nat, pc.index_in(t["l_suppkey"], value_set=s_key))
        vol = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        year = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        part = pa.table({"key": t["o_custkey"], "sn": sn, "l_year": year,
                         "vol": vol}).group_by(
            ["key", "sn", "l_year"], use_threads=False).aggregate(
            [("vol", "sum")])
        return pa.table({"key": part["key"], "sn": part["sn"],
                         "l_year": part["l_year"], "vol": part["vol_sum"]})

    jdir = bucket_dataset(
        j1.map_batches(cust_partial, batch_format="pyarrow",
                       batch_size=None),
        "key", n_buckets,
        schema=pa.schema([("key", pa.int64()), ("sn", pa.int32()),
                          ("l_year", pa.int64()), ("vol", pa.float64())]))
    try:
        j2 = bucketed_join(
            jdir, _cust_buckets(sf_dir, n_buckets), key="key",
            right_key="c_custkey", left_cols=["sn", "vol", "l_year"],
            right_cols=["c_nationkey"], n_buckets=n_buckets)

        def name_partial(t: pa.Table) -> pa.Table:
            n_key, n_name, _, _ = bcast_get(dims_ref)
            sname = pc.take(n_name, pc.index_in(t["sn"], value_set=n_key))
            cname = pc.take(n_name,
                            pc.index_in(t["c_nationkey"], value_set=n_key))
            pair_ok = pc.or_(
                pc.and_(pc.equal(sname, nation_a), pc.equal(cname, nation_b)),
                pc.and_(pc.equal(sname, nation_b), pc.equal(cname, nation_a)),
            )
            return pa.table({
                "supp_nation": sname, "cust_nation": cname,
                "l_year": t["l_year"], "volume": t["vol"],
            }).filter(pair_ok).group_by(
                ["supp_nation", "cust_nation", "l_year"],
                use_threads=False).aggregate([("volume", "sum")])

        out = (
            j2.map_batches(name_partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("volume_sum", alias_name="revenue"))
            .to_pandas()
        )
    finally:
        shutil.rmtree(jdir, ignore_errors=True)
    out = _ensure_cols(out, {"supp_nation": "str", "cust_nation": "str",
                             "l_year": "int64", "revenue": "float64"})
    out["revenue"] = r4(out["revenue"])
    return finish(out, ["supp_nation", "cust_nation", "l_year"])


def revenue_by_order_priority(sf_dir: str) -> pd.DataFrame:
    """LARGE × LARGE equi-join — the one join class the broadcast suite
    can't cover (both lineitem and orders grow with the corpus, so
    neither side fits a broadcast). Shape: pre-aggregate lineitem
    revenue per order key inside each batch, union with the orders rows
    (null-padded columns), then ONE vectorized ``grouped_aggregate``
    per key — null-skipping reducers make the cogroup join itself an
    aggregate (sum folds the revenue partials, min picks the single
    non-null priority string) — and a second tiny ``grouped_aggregate``
    rolls the joined per-order rows up to revenue per priority. Zero
    per-group Python; two all-to-alls total, both on ~1 row per key."""
    from .common import grouped_aggregate

    def left_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        part = pa.table({"key": t["l_orderkey"], "rev": rev}).group_by(
            "key", use_threads=False).aggregate([("rev", "sum")])
        return pa.table({
            "key": part["key"],
            "rev": part["rev_sum"],
            "o_orderpriority": pa.nulls(len(part), pa.string()),
        })

    left = read(sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        left_partial, batch_format="pyarrow", batch_size=65536)
    right = read(sf_dir, "orders",
                 ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table({
            "key": t["o_orderkey"],
            "rev": pa.nulls(len(t), pa.float64()),
            "o_orderpriority": t["o_orderpriority"],
        }),
        batch_format="pyarrow",
    )
    joined = grouped_aggregate(
        left.union(right), "key",
        [("rev", "sum"), ("o_orderpriority", "min")],
    ).map_batches(
        # drop orderless/line-less keys (inner-join semantics) and the key
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority_min"],
            "rev": t["rev_sum"],
        }).filter(pc.and_(pc.is_valid(t["o_orderpriority_min"]),
                          pc.is_valid(t["rev_sum"]))),
        batch_format="pyarrow",
    )
    # the final rollup key is tiny and BOUNDED (5 priorities) — Ray's
    # aggregate is the right tool there; grouped_aggregate is for the
    # corpus-cardinality join key above
    from ray.data.aggregate import Sum

    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    # round to WHOLE units, not 1e-4: the per-priority sums reach ~6e9 at
    # sf0.1 where the block-order summation error (~tens of ulps ≈ 1e-4)
    # straddles a 1e-4 rounding boundary with high probability — observed
    # as 2/5 rows off by exactly 0.0001 vs the DuckDB oracle
    out = _ensure_cols(out, {"o_orderpriority": "str",
                             "revenue": "float64"})
    rev = np.asarray(out["revenue"], dtype=np.float64)
    out["revenue"] = np.sign(rev) * np.floor(np.abs(rev) + 0.5)
    return finish(out, ["o_orderpriority"])


def customer_order_counts_allshuffle(sf_dir: str) -> pd.DataFrame:
    """LEFT join shape, all-shuffle twin at fact×fact scale: every customer with their
    order count, INCLUDING zero-order customers. Orders pre-reduce to
    one (custkey, n) row per key via ``grouped_aggregate``; customers
    LEFT-``shuffle_join`` against it and nulls become zero — no
    corpus-growing broadcast on either side."""
    from .common import grouped_aggregate
    from .join import shuffle_join

    counts = grouped_aggregate(
        read(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda t: pa.table({"key": t["o_custkey"]}),
            batch_format="pyarrow"),
        "key", [("key", "count")],
    ).map_batches(
        lambda t: pa.table({"key": t["key"],
                            "n": pc.cast(t["key_count"], pa.int64())}),
        batch_format="pyarrow")
    cust = read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"]}), batch_format="pyarrow")
    j = shuffle_join(cust, counts, "key", [], ["n"], "left",
                     left_types={}, right_types={"n": pa.int64()},
                     num_blocks=32)
    out = j.map_batches(
        lambda t: pa.table({
            "c_custkey": t["key"],
            "n_orders": pc.fill_null(t["n"], 0)}),
        batch_format="pyarrow").to_pandas()
    out = _ensure_cols(out, {"c_custkey": "int64", "n_orders": "int64"})
    return finish(out, ["c_custkey"])


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: single-scan filtered global aggregate. The whole
    query is one pruned read + a vectorized per-batch partial sum — the
    cheapest possible distributed plan (no shuffle at all; the 'groupby'
    is a constant key, so Ray's aggregate merges one float per block)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(datetime(1998, 1, 1))),
                pc.less(t["l_shipdate"], pa.scalar(datetime(1999, 1, 1)))),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.03)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0))),
        )
        f = t.filter(m)
        s = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({"part": pa.array([s.as_py() or 0.0], pa.float64()),
                         "hits": pa.array([len(f)], pa.int64())})

    agg = (read(sf_dir, "lineitem",
                ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"])
           .map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .aggregate(Sum("part", alias_name="revenue"),
                      Sum("hits", alias_name="hits")))
    if not agg or not agg.get("hits"):
        # SQL SUM over an empty set is NULL, not 0
        return pd.DataFrame({"revenue": [float("nan")]})
    return pd.DataFrame({"revenue": r4([agg["revenue"]])})


def q4_order_priority_allshuffle(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape, all-shuffle twin: correlated EXISTS between two FACT tables —
    orders in a date window counted per priority when at least one of
    their lineitems shipped after the order date. Lineitem pre-reduces
    to a per-orderkey max-shipdate PARTIAL inside each batch (the only
    column the predicate needs), the orders side joins via
    ``shuffle_join`` (one all-to-all, no corpus-growing broadcast), and
    the join's one-key-one-block output invariant lets a block-local
    group_by finish the per-order max before the bounded 5-row priority
    rollup."""
    from ray.data.aggregate import Sum

    from .join import shuffle_join

    def li_partial(t: pa.Table) -> pa.Table:
        part = pa.table({"key": t["l_orderkey"], "ship": t["l_shipdate"]}
                        ).group_by("key", use_threads=False).aggregate(
            [("ship", "max")])
        return pa.table({"key": part["key"], "ship": part["ship_max"]})

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        li_partial, batch_format="pyarrow", batch_size=65536)

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(datetime(1998, 1, 1))),
            pc.less(t["o_orderdate"], pa.scalar(datetime(1999, 1, 1))))
        f = t.filter(m)
        return pa.table({"key": f["o_orderkey"],
                         "o_orderpriority": f["o_orderpriority"],
                         "o_orderdate": f["o_orderdate"]})

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderpriority", "o_orderdate"]
                  ).map_batches(ord_filter, batch_format="pyarrow")
    j = shuffle_join(
        li, orders, "key", ["ship"], ["o_orderpriority", "o_orderdate"],
        how="inner",
        left_types={"ship": pa.timestamp("us")},
        right_types={"o_orderpriority": pa.string(),
                     "o_orderdate": pa.timestamp("us")},
        num_blocks=32)

    def per_order(t: pa.Table) -> pa.Table:
        # complete per-order reduce (join invariant: key never straddles
        # blocks), then the EXISTS predicate and a per-block count partial
        g = t.group_by("key", use_threads=False).aggregate(
            [("ship", "max"), ("o_orderpriority", "min"),
             ("o_orderdate", "min")])
        g = g.filter(pc.greater(g["ship_max"], g["o_orderdate_min"]))
        c = g.group_by("o_orderpriority_min", use_threads=False).aggregate(
            [("o_orderpriority_min", "count")])
        return pa.table({"o_orderpriority": c["o_orderpriority_min"],
                         "n": pc.cast(c["o_orderpriority_min_count"],
                                      pa.int64())})

    out = (j.map_batches(per_order, batch_format="pyarrow", batch_size=None)
           .groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="order_count"))
           .to_pandas())
    out = _ensure_cols(out, {"o_orderpriority": "str", "order_count": "int64"})
    return finish(out, ["o_orderpriority"])


def q10_returned_items_allshuffle(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape, all-shuffle twin (no precomputation): top-20
    customers by revenue of RETURNED
    lineitems in an order-date window. Three corpus-growing tables
    (lineitem, orders, customer) — both joins are ``shuffle_join``s on
    pre-reduced partials; nation is the only broadcast (bounded
    dimension). The global top-20 is a per-block partial top-20 over
    the complete per-customer sums (join invariant) merged on the
    driver — nothing corpus-sized leaves the cluster."""
    import ray

    from .join import shuffle_join

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    dims_ref = ray.put((nation["n_nationkey"].combine_chunks(),
                        nation["n_name"].combine_chunks()))

    def li_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        part = pa.table({"key": f["l_orderkey"], "rev": rev}).group_by(
            "key", use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": part["key"], "rev": part["rev_sum"]})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
              ).map_batches(li_partial, batch_format="pyarrow",
                            batch_size=65536)

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(datetime(1998, 1, 1))),
            pc.less(t["o_orderdate"], pa.scalar(datetime(1998, 7, 1))))
        f = t.filter(m)
        return pa.table({"key": f["o_orderkey"], "o_custkey": f["o_custkey"]})

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_filter, batch_format="pyarrow")
    j1 = shuffle_join(li, orders, "key", ["rev"], ["o_custkey"], "inner",
                      left_types={"rev": pa.float64()},
                      right_types={"o_custkey": pa.int64()}, num_blocks=32)

    def rekey(t: pa.Table) -> pa.Table:
        part = pa.table({"key": t["o_custkey"], "rev": t["rev"]}).group_by(
            "key", use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": part["key"], "rev": part["rev_sum"]})

    cust = read(sf_dir, "customer",
                ["c_custkey", "c_name", "c_nationkey"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"], "c_name": t["c_name"],
                            "c_nationkey": t["c_nationkey"]}),
        batch_format="pyarrow")
    j2 = shuffle_join(
        j1.map_batches(rekey, batch_format="pyarrow", batch_size=None),
        cust, "key", ["rev"], ["c_name", "c_nationkey"], "inner",
        left_types={"rev": pa.float64()},
        right_types={"c_name": pa.string(), "c_nationkey": pa.int32()},
        num_blocks=32)

    def block_top20(t: pa.Table) -> pa.Table:
        g = t.group_by(["key", "c_name", "c_nationkey"],
                       use_threads=False).aggregate([("rev", "sum")])
        n_key, n_name = bcast_get(dims_ref)
        name = pc.take(n_name, pc.index_in(g["c_nationkey"], value_set=n_key))
        g = pa.table({"c_custkey": g["key"], "c_name": g["c_name"],
                      "revenue": pa.array(
                          r4(g["rev_sum"].to_numpy(zero_copy_only=False))),
                      "n_name": name})
        idx = pc.sort_indices(g, sort_keys=[("revenue", "descending"),
                                            ("c_custkey", "ascending")])
        return g.take(idx.slice(0, min(20, len(g))))

    out = j2.map_batches(block_top20, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    out = _ensure_cols(out, {"c_custkey": "int64", "c_name": "str",
                             "revenue": "float64", "n_name": "str"})
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True],
                          kind="mergesort").head(20)
    return out.reset_index(drop=True)[
        ["c_custkey", "c_name", "revenue", "n_name"]]


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: per ship-month share of revenue from PROMO-type
    parts over 1998. Part is a broadcast dimension (``ray.put`` once,
    per-worker cache); each batch computes BOTH conditional partial sums
    vectorized, and the bounded 12-row month key rolls up through Ray's
    aggregate. Output: (o_month, promo_pct, revenue)."""
    import ray
    from ray.data.aggregate import Sum

    part_t = read_arrow(sf_dir, "part", ["p_partkey", "p_type"])
    promo = pc.equal(part_t["p_type"], "PROMO")
    part_ref = ray.put((part_t["p_partkey"].combine_chunks(),
                        promo.combine_chunks()))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(datetime(1998, 1, 1))),
            pc.less(t["l_shipdate"], pa.scalar(datetime(1999, 1, 1))))
        f = t.filter(m)
        p_key, p_promo = bcast_get(part_ref)
        is_promo = pc.take(p_promo, pc.index_in(f["l_partkey"],
                                                value_set=p_key))
        rev = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        month = pc.cast(pc.month(f["l_shipdate"]), pa.int64())
        promo_rev = pc.if_else(is_promo, rev, pa.scalar(0.0))
        g = pa.table({"o_month": month, "rev": rev, "promo_rev": promo_rev}
                     ).group_by("o_month", use_threads=False).aggregate(
            [("rev", "sum"), ("promo_rev", "sum")])
        return pa.table({"o_month": g["o_month"], "rev": g["rev_sum"],
                         "promo_rev": g["promo_rev_sum"]})

    out = (read(sf_dir, "lineitem",
                ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
           .map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("o_month")
           .aggregate(Sum("rev", alias_name="rev"),
                      Sum("promo_rev", alias_name="promo_rev"))
           .to_pandas())
    out = _ensure_cols(out, {"o_month": "int64", "rev": "float64",
                             "promo_rev": "float64"})
    out["promo_pct"] = r4(100.0 * out["promo_rev"] / out["rev"])
    out["revenue"] = r4(out["rev"])
    return finish(out, ["o_month"])[["o_month", "promo_pct", "revenue"]]


def customer_acct_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join shape at fact×fact scale: low-balance customers
    against per-customer recent-order counts — unmatched keys from BOTH
    sides survive (customers with no recent orders keep n_orders=0;
    recent-order customers outside the balance filter carry a null
    balance, surfaced as -1). Orders pre-reduce to one row per custkey
    via ``grouped_aggregate`` before the one-all-to-all outer
    ``shuffle_join`` — no broadcast of either corpus-growing side."""
    from .common import grouped_aggregate
    from .join import shuffle_join

    counts = grouped_aggregate(
        read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            lambda t: pa.table({"key": t.filter(pc.greater_equal(
                t["o_orderdate"], pa.scalar(datetime(2000, 1, 1))))["o_custkey"]}),
            batch_format="pyarrow"),
        "key", [("key", "count")],
    ).map_batches(
        lambda t: pa.table({"key": t["key"],
                            "n": pc.cast(t["key_count"], pa.int64())}),
        batch_format="pyarrow")
    cust = read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda t: (lambda f: pa.table({"key": f["c_custkey"],
                                       "acctbal": f["c_acctbal"]}))(
            t.filter(pc.less(t["c_acctbal"], pa.scalar(1000.0)))),
        batch_format="pyarrow")
    j = shuffle_join(cust, counts, "key", ["acctbal"], ["n"], "outer",
                     left_types={"acctbal": pa.float64()},
                     right_types={"n": pa.int64()}, num_blocks=32)
    out = j.map_batches(
        lambda t: pa.table({
            "c_custkey": t["key"],
            "acctbal": pc.round(pc.fill_null(t["acctbal"], -1.0), 4),
            "n_orders": pc.fill_null(t["n"], 0)}),
        batch_format="pyarrow").to_pandas()
    out = _ensure_cols(out, {"c_custkey": "int64", "acctbal": "float64",
                             "n_orders": "int64"})
    return finish(out, ["c_custkey"])


def q13_customer_distribution_allshuffle(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape, all-shuffle twin: distribution of customers by order count,
    INCLUDING zero-order customers (the LEFT-join semantics). One
    all-to-all instead of a groupby + a join: customers enter the
    exchange as (custkey, 0) markers and orders as per-batch partial
    (custkey, count) rows, and a single ``grouped_aggregate`` sum
    yields every customer's complete order count (orders.o_custkey is
    a FK into customer, so the union introduces no spurious keys).
    The count→custdist rollup is a bounded second groupby."""
    from ray.data.aggregate import Sum

    from .common import grouped_aggregate

    cust = read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"key": pc.cast(t["c_custkey"], pa.int64()),
                            "n": pa.array([0] * len(t), pa.int64())}),
        batch_format="pyarrow")

    def ord_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"key": t["o_custkey"]}).group_by(
            "key", use_threads=False).aggregate([("key", "count")])
        return pa.table({"key": pc.cast(g["key"], pa.int64()),
                         "n": pc.cast(g["key_count"], pa.int64())})

    orders = read(sf_dir, "orders", ["o_custkey"]).map_batches(
        ord_partial, batch_format="pyarrow", batch_size=65536)

    per_cust = grouped_aggregate(cust.union(orders), "key",
                                 [("n", "sum")])

    def dist_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"c_count": t["n_sum"]}).group_by(
            "c_count", use_threads=False).aggregate([("c_count", "count")])
        return pa.table({"c_count": g["c_count"],
                         "custdist": pc.cast(g["c_count_count"], pa.int64())})

    out = (per_cust.map_batches(dist_partial, batch_format="pyarrow")
           .groupby("c_count").aggregate(Sum("custdist", alias_name="custdist"))
           .to_pandas())
    out = _ensure_cols(out, {"c_count": "int64", "custdist": "int64"})
    out = out.astype({"c_count": "int64", "custdist": "int64"})
    return finish(out, ["c_count"])


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum lineitem revenue in
    a ship-date window. Per-batch partial sums keyed by l_suppkey →
    one bounded groupby (supplier is a bounded dimension); the argmax
    and the name join run driver-side on the k-row supplier frame."""
    from ray.data.aggregate import Sum

    def li_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(datetime(1998, 1, 1))),
            pc.less(t["l_shipdate"], pa.scalar(datetime(1998, 7, 1)))))
        rev = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        g = pa.table({"s_suppkey": f["l_suppkey"], "rev": rev}).group_by(
            "s_suppkey", use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"], "rev": g["rev_sum"]})

    per_supp = (read(sf_dir, "lineitem",
                     ["l_suppkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])
                .map_batches(li_partial, batch_format="pyarrow",
                             batch_size=65536)
                .groupby("s_suppkey").aggregate(Sum("rev", alias_name="rev"))
                .to_pandas())
    if per_supp.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int32"),
                             "s_name": pd.Series([], dtype="str"),
                             "total_revenue": pd.Series([], dtype="float64")})
    # tie-set selection on ROUNDED revenue: exact float equality on
    # order-dependent sums could keep a different tie set than the
    # oracle's MAX when two suppliers are mathematically equal
    rr = r4(per_supp["rev"].to_numpy())
    top = per_supp[rr == rr.max()].copy()
    names = read_arrow(sf_dir, "supplier",
                       ["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(names, on="s_suppkey", how="inner")
    out["total_revenue"] = r4(out["rev"])
    return finish(out[["s_suppkey", "s_name", "total_revenue"]],
                  ["s_suppkey"])


def q18_large_volume_allshuffle(sf_dir: str,
                                min_qty: float = 300.0) -> pd.DataFrame:
    """TPC-H Q18 shape, all-shuffle twin (no precomputation): orders
    whose total lineitem quantity exceeds
    ``min_qty``, with customer names — three corpus-growing tables.
    Per-order quantity via ``grouped_aggregate`` (one all-to-all on the
    short orderkey), HAVING filter inside map_batches, then two
    ``shuffle_join``s (orders, customer); only the few surviving rows
    reach the driver for the final sort/limit."""
    from .common import grouped_aggregate
    from .join import shuffle_join

    def li_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"key": t["l_orderkey"], "qty": t["l_quantity"]}
                     ).group_by("key", use_threads=False).aggregate(
            [("qty", "sum")])
        return pa.table({"key": g["key"], "qty": g["qty_sum"]})

    big = grouped_aggregate(
        read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            li_partial, batch_format="pyarrow", batch_size=65536),
        "key", [("qty", "sum")],
    ).map_batches(
        lambda t: (lambda f: pa.table({"key": f["key"],
                                       "sum_qty": f["qty_sum"]}))(
            t.filter(pc.greater(t["qty_sum"], pa.scalar(min_qty)))),
        batch_format="pyarrow")

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
                  ).map_batches(
        lambda t: pa.table({"key": t["o_orderkey"], "o_custkey": t["o_custkey"],
                            "o_orderdate": t["o_orderdate"],
                            "o_totalprice": t["o_totalprice"]}),
        batch_format="pyarrow")
    j1 = shuffle_join(big, orders, "key", ["sum_qty"],
                      ["o_custkey", "o_orderdate", "o_totalprice"], "inner",
                      left_types={"sum_qty": pa.float64()},
                      right_types={"o_custkey": pa.int64(),
                                   "o_orderdate": pa.timestamp("us"),
                                   "o_totalprice": pa.float64()},
                      num_blocks=32)
    rekeyed = j1.map_batches(
        lambda t: pa.table({"key": t["o_custkey"], "o_orderkey": t["key"],
                            "o_orderdate": t["o_orderdate"],
                            "o_totalprice": t["o_totalprice"],
                            "sum_qty": t["sum_qty"]}),
        batch_format="pyarrow")
    cust = read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda t: pa.table({"key": pc.cast(t["c_custkey"], pa.int64()),
                            "c_name": t["c_name"]}),
        batch_format="pyarrow")
    j2 = shuffle_join(rekeyed, cust, "key",
                      ["o_orderkey", "o_orderdate", "o_totalprice",
                       "sum_qty"], ["c_name"], "inner",
                      left_types={"o_orderkey": pa.int64(),
                                  "o_orderdate": pa.timestamp("us"),
                                  "o_totalprice": pa.float64(),
                                  "sum_qty": pa.float64()},
                      right_types={"c_name": pa.string()}, num_blocks=32)
    out = j2.to_pandas()
    out = _ensure_cols(out, {"key": "int64", "o_orderkey": "int64",
                             "o_orderdate": "datetime64[us]",
                             "o_totalprice": "float64",
                             "sum_qty": "float64", "c_name": "str"})
    out = out.rename(columns={"key": "c_custkey"})
    out["sum_qty"] = r4(out["sum_qty"])
    out = out.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(100)
    return finish(out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice", "sum_qty"]])


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under a 3-way DISJUNCTIVE predicate
    coupling part attributes (brand, size — broadcast dimension lookup)
    with lineitem quantity ranges. One scan, per-batch masked partial
    sums, scalar result — no shuffle at all."""
    import ray

    part = read_arrow(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    dims_ref = ray.put(tuple(part[c].combine_chunks() for c in
                             ("p_partkey", "p_brand", "p_size")))

    ARMS = (("Brand#11", 1, 15, 1.0, 11.0),
            ("Brand#22", 1, 25, 10.0, 20.0),
            ("Brand#13", 1, 35, 20.0, 30.0))

    def li_partial(t: pa.Table) -> pa.Table:
        p_key, p_brand, p_size = bcast_get(dims_ref)
        idx = pc.index_in(t["l_partkey"], value_set=p_key)
        brand = pc.take(p_brand, idx)
        size = pc.take(p_size, idx)
        qty = t["l_quantity"]
        mask = None
        for b, s_lo, s_hi, q_lo, q_hi in ARMS:
            arm = pc.and_(
                pc.and_(pc.equal(brand, b),
                        pc.and_(pc.greater_equal(size, s_lo),
                                pc.less_equal(size, s_hi))),
                pc.and_(pc.greater_equal(qty, q_lo),
                        pc.less_equal(qty, q_hi)))
            mask = arm if mask is None else pc.or_(mask, arm)
        f = t.filter(pc.fill_null(mask, False))
        rev = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        s = pc.sum(rev)
        return pa.table({"rev": pa.array(
            [s.as_py() if s.is_valid else 0.0], pa.float64())})

    total = (read(sf_dir, "lineitem",
                  ["l_partkey", "l_quantity", "l_extendedprice",
                   "l_discount"])
             .map_batches(li_partial, batch_format="pyarrow",
                          batch_size=65536)
             .sum("rev"))
    return pd.DataFrame({"revenue": [float(r4(total or 0.0))]})


def q8_market_share_allshuffle(sf_dir: str,
                               target_nation: str = "NATION_3",
                               region: str = "ASIA") -> pd.DataFrame:
    """TPC-H Q8 shape, all-shuffle twin (adapted — PROMO parts stand in
    for the type filter): the target nation's share of supply revenue into one
    region's customers, per order year. Part/supplier/nation/region are
    bounded-dimension broadcasts resolved inside the lineitem scan;
    orders (year + custkey) attaches via ``shuffle_join`` on
    pre-reduced per-orderkey partials, and the region membership filter
    is a SEMI ``shuffle_join`` against the filtered customer side —
    no corpus-growing table is ever broadcast."""
    import ray
    from ray.data.aggregate import Sum

    from .join import shuffle_join

    part = read_arrow(sf_dir, "part", ["p_partkey", "p_type"])
    keep = pc.filter(part["p_partkey"],
                     pc.equal(part["p_type"], "PROMO")).combine_chunks()
    nation = read_arrow(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    reg = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    region_nkeys = pc.filter(
        nation["n_nationkey"],
        pc.is_in(nation["n_regionkey"], value_set=pc.filter(
            reg["r_regionkey"], pc.equal(reg["r_name"], region)).combine_chunks()),
    ).combine_chunks()
    dims_ref = ray.put((
        keep,
        supp["s_suppkey"].combine_chunks(),
        supp["s_nationkey"].combine_chunks(),
        nation["n_nationkey"].combine_chunks(),
        nation["n_name"].combine_chunks(),
        region_nkeys,
    ))

    def li_partial(t: pa.Table) -> pa.Table:
        keep, s_key, s_nat, n_key, n_name, _ = bcast_get(dims_ref)
        t = t.filter(pc.is_in(t["l_partkey"], value_set=keep))
        sn = pc.take(s_nat, pc.index_in(t["l_suppkey"], value_set=s_key))
        nname = pc.take(n_name, pc.index_in(sn, value_set=n_key))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        rev_t = pc.if_else(pc.equal(nname, target_nation), rev,
                           pa.scalar(0.0))
        g = pa.table({"key": t["l_orderkey"], "rev": rev,
                      "rev_t": rev_t}).group_by(
            "key", use_threads=False).aggregate(
            [("rev", "sum"), ("rev_t", "sum")])
        return pa.table({"key": g["key"], "rev": g["rev_sum"],
                         "rev_t": g["rev_t_sum"]})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
               "l_discount"]).map_batches(
        li_partial, batch_format="pyarrow", batch_size=65536)

    def ord_proj(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(datetime(1998, 1, 1))),
            pc.less(t["o_orderdate"], pa.scalar(datetime(2000, 1, 1)))))
        return pa.table({"key": f["o_orderkey"], "o_custkey": f["o_custkey"],
                         "o_year": pc.cast(pc.year(f["o_orderdate"]),
                                           pa.int64())})

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_proj, batch_format="pyarrow")
    j1 = shuffle_join(li, orders, "key", ["rev", "rev_t"],
                      ["o_custkey", "o_year"], "inner",
                      left_types={"rev": pa.float64(),
                                  "rev_t": pa.float64()},
                      right_types={"o_custkey": pa.int64(),
                                   "o_year": pa.int64()}, num_blocks=32)

    def rekey(t: pa.Table) -> pa.Table:
        g = pa.table({"key": t["o_custkey"], "o_year": t["o_year"],
                      "rev": t["rev"], "rev_t": t["rev_t"]}).group_by(
            ["key", "o_year"], use_threads=False).aggregate(
            [("rev", "sum"), ("rev_t", "sum")])
        return pa.table({"key": g["key"], "o_year": g["o_year"],
                         "rev": g["rev_sum"], "rev_t": g["rev_t_sum"]})

    def cust_region(t: pa.Table) -> pa.Table:
        _, _, _, _, _, region_nkeys = bcast_get(dims_ref)
        f = t.filter(pc.is_in(t["c_nationkey"], value_set=region_nkeys))
        return pa.table({"key": pc.cast(f["c_custkey"], pa.int64())})

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_region, batch_format="pyarrow")
    j2 = shuffle_join(
        j1.map_batches(rekey, batch_format="pyarrow", batch_size=None),
        cust, "key", ["o_year", "rev", "rev_t"], [], "semi",
        left_types={"o_year": pa.int64(), "rev": pa.float64(),
                    "rev_t": pa.float64()}, num_blocks=32)

    out = (j2.map_batches(
        lambda t: pa.table({"o_year": t["o_year"], "rev": t["rev"],
                            "rev_t": t["rev_t"]}).group_by(
            "o_year", use_threads=False).aggregate(
            [("rev", "sum"), ("rev_t", "sum")]),
        batch_format="pyarrow", batch_size=65536)
        .groupby("o_year")
        .aggregate(Sum("rev_sum", alias_name="rev"),
                   Sum("rev_t_sum", alias_name="rev_t"))
        .to_pandas())
    out = _ensure_cols(out, {"o_year": "int64", "rev": "float64",
                             "rev_t": "float64"})
    out["mkt_share"] = r4(out["rev_t"] / out["rev"])
    return finish(out[["o_year", "mkt_share"]], ["o_year"])


def q12_priority_by_linestatus_allshuffle(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape, all-shuffle twin (l_linestatus stands in for shipmode — the only
    line-level categorical in this schema): per linestatus, how many
    shipped lines belong to high- vs low-priority orders. Lineitem is
    pre-reduced to (orderkey, linestatus, n) counts per batch BEFORE
    the ``shuffle_join`` with orders, so the exchange ships counting
    partials, not raw lines."""
    from ray.data.aggregate import Sum

    from .join import shuffle_join

    def li_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(datetime(1999, 1, 1))),
            pc.less(t["l_shipdate"], pa.scalar(datetime(2000, 1, 1)))))
        g = pa.table({"key": f["l_orderkey"],
                      "l_linestatus": f["l_linestatus"]}).group_by(
            ["key", "l_linestatus"], use_threads=False).aggregate(
            [("key", "count")])
        return pa.table({"key": g["key"], "l_linestatus": g["l_linestatus"],
                         "n": pc.cast(g["key_count"], pa.int64())})

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_linestatus", "l_shipdate"]).map_batches(
        li_partial, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table({"key": t["o_orderkey"],
                            "prio": t["o_orderpriority"]}),
        batch_format="pyarrow")
    j = shuffle_join(li, orders, "key", ["l_linestatus", "n"], ["prio"],
                     "inner",
                     left_types={"l_linestatus": pa.string(),
                                 "n": pa.int64()},
                     right_types={"prio": pa.string()}, num_blocks=32)

    def classify(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["prio"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        n = t["n"]
        zero = pa.scalar(0, pa.int64())
        g = pa.table({
            "l_linestatus": t["l_linestatus"],
            "hi": pc.if_else(hi, n, zero),
            "lo": pc.if_else(hi, zero, n),
        }).group_by("l_linestatus", use_threads=False).aggregate(
            [("hi", "sum"), ("lo", "sum")])
        return pa.table({"l_linestatus": g["l_linestatus"],
                         "hi": g["hi_sum"], "lo": g["lo_sum"]})

    out = (j.map_batches(classify, batch_format="pyarrow",
                         batch_size=65536)
           .groupby("l_linestatus")
           .aggregate(Sum("hi", alias_name="high_line_count"),
                      Sum("lo", alias_name="low_line_count"))
           .to_pandas())
    out = _ensure_cols(out, {"l_linestatus": "str",
                             "high_line_count": "int64",
                             "low_line_count": "int64"})
    out = out.astype({"high_line_count": "int64",
                      "low_line_count": "int64"})
    return finish(out, ["l_linestatus"])


def q22_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: high-balance customers with NO recent orders,
    rolled up by market segment. The global threshold (avg of positive
    acctbals) is a distributed scalar (per-batch sum/count partials —
    one bounded reduce, broadcast back as a constant); the no-orders
    predicate is an ANTI ``shuffle_join`` against the date-filtered
    orders custkeys — no fact broadcast, no correlated rescan."""
    from .join import shuffle_join

    stats = (read(sf_dir, "customer", ["c_acctbal"]).map_batches(
        lambda t: (lambda f: pa.table({
            "s": pa.array([pc.sum(f["c_acctbal"]).as_py() or 0.0],
                          pa.float64()),
            "n": pa.array([len(f)], pa.int64())}))(
            t.filter(pc.greater(t["c_acctbal"], 0.0))),
        batch_format="pyarrow").to_pandas())
    n_pos = int(stats["n"].sum())
    if n_pos == 0:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="str"),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    threshold = float(stats["s"].sum()) / n_pos

    cust = read(sf_dir, "customer",
                ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
        lambda t: (lambda f: pa.table({
            "key": pc.cast(f["c_custkey"], pa.int64()),
            "c_mktsegment": f["c_mktsegment"],
            "c_acctbal": f["c_acctbal"]}))(
            t.filter(pc.greater(t["c_acctbal"], threshold))),
        batch_format="pyarrow")
    recent = read(sf_dir, "orders",
                  ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"key": t.filter(pc.greater_equal(
            t["o_orderdate"],
            pa.scalar(datetime(2000, 1, 1))))["o_custkey"]}),
        batch_format="pyarrow")
    j = shuffle_join(cust, recent, "key",
                     ["c_mktsegment", "c_acctbal"], [], "anti",
                     left_types={"c_mktsegment": pa.string(),
                                 "c_acctbal": pa.float64()},
                     right_types={}, num_blocks=32)
    out = (j.map_batches(
        lambda t: (lambda g: pa.table({
            "c_mktsegment": g["c_mktsegment"],
            "numcust": pc.cast(g["c_mktsegment_count"], pa.int64()),
            "bal": g["c_acctbal_sum"]}))(
            pa.table({"c_mktsegment": t["c_mktsegment"],
                      "c_acctbal": t["c_acctbal"]}).group_by(
                "c_mktsegment", use_threads=False).aggregate(
                [("c_mktsegment", "count"), ("c_acctbal", "sum")])),
        batch_format="pyarrow").to_pandas())
    if out.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype="str"),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    agg = out.groupby("c_mktsegment", as_index=False).agg(
        numcust=("numcust", "sum"), bal=("bal", "sum"))
    agg["numcust"] = agg["numcust"].astype("int64")
    agg["totacctbal"] = r4(agg["bal"])
    return finish(agg[["c_mktsegment", "numcust", "totacctbal"]],
                  ["c_mktsegment"])


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(region, nation) over customer balances —
    hierarchical aggregation: nation detail + region subtotals + grand
    total in one result. The distributed work is ONE pass (customer
    scan, broadcast nation/region dimension lookup, per-batch partial
    sums into the bounded nation key space); the two rollup levels
    derive from the 25-row nation frame driver-side — post-aggregation
    of a bounded result, never of raw rows."""
    import ray
    from ray.data.aggregate import Sum

    nation = read_arrow(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"])
    region = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    rname = pc.take(
        region["r_name"].combine_chunks(),
        pc.index_in(nation["n_regionkey"],
                    value_set=region["r_regionkey"].combine_chunks()))
    dims_ref = ray.put((nation["n_nationkey"].combine_chunks(),
                        nation["n_name"].combine_chunks(),
                        rname.combine_chunks()))

    def partial(t: pa.Table) -> pa.Table:
        n_key, n_name, r_name = bcast_get(dims_ref)
        idx = pc.index_in(t["c_nationkey"], value_set=n_key)
        g = pa.table({
            "r_name": pc.take(r_name, idx),
            "n_name": pc.take(n_name, idx),
            "c_acctbal": t["c_acctbal"],
        }).group_by(["r_name", "n_name"], use_threads=False).aggregate(
            [("c_acctbal", "count"), ("c_acctbal", "sum")])
        return pa.table({
            "r_name": g["r_name"], "n_name": g["n_name"],
            "cnt": pc.cast(g["c_acctbal_count"], pa.int64()),
            "bal": g["c_acctbal_sum"]})

    nat = (read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
           .map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby(["r_name", "n_name"])
           .aggregate(Sum("cnt", alias_name="cnt"),
                      Sum("bal", alias_name="bal"))
           .to_pandas())
    nat = _ensure_cols(nat, {"r_name": "str", "n_name": "str",
                             "cnt": "int64", "bal": "float64"})
    reg = nat.groupby("r_name", as_index=False).agg(
        cnt=("cnt", "sum"), bal=("bal", "sum"))
    reg["n_name"] = None
    tot = pd.DataFrame({"r_name": [None], "n_name": [None],
                        "cnt": [nat["cnt"].sum()],
                        # SUM over zero rows is NULL in SQL, not 0.0
                        "bal": [nat["bal"].sum() if len(nat) else np.nan]})
    out = pd.concat([nat, reg, tot], ignore_index=True)
    out["n_customers"] = out["cnt"].astype("int64")
    out["sum_acctbal"] = r4(out["bal"])
    out = out[["r_name", "n_name", "n_customers", "sum_acctbal"]]
    return out.sort_values(
        ["r_name", "n_name"], na_position="first",
        kind="mergesort").reset_index(drop=True)


def q17_small_quantity_revenue(sf_dir: str,
                               brand: str = "Brand#11") -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's OWN average quantity — a correlated per-key
    aggregate threshold. Because part is a bounded dimension, the
    correlation resolves in two streaming passes with NO self-join:
    pass 1 reduces per-part (sum, count) quantity partials into the
    bounded part key space; the driver derives the 0.2·avg thresholds
    (exact: integer-valued quantities sum exactly in doubles, so the
    division is order-independent) and broadcasts them; pass 2 filters
    each batch against its parts' thresholds and sums revenue."""
    import ray
    from ray.data.aggregate import Sum

    part = read_arrow(sf_dir, "part", ["p_partkey", "p_brand"])
    keep = pc.filter(part["p_partkey"],
                     pc.equal(part["p_brand"], brand)).combine_chunks()
    keep_ref = ray.put(keep)

    def qty_partial(t: pa.Table) -> pa.Table:
        kp = bcast_get(keep_ref)
        f = t.filter(pc.is_in(t["l_partkey"], value_set=kp))
        g = pa.table({"p": f["l_partkey"], "q": f["l_quantity"]}).group_by(
            "p", use_threads=False).aggregate(
            [("q", "sum"), ("q", "count")])
        return pa.table({"p": g["p"], "s": g["q_sum"],
                         "n": pc.cast(g["q_count"], pa.int64())})

    per_part = (read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
                .map_batches(qty_partial, batch_format="pyarrow",
                             batch_size=65536)
                .groupby("p").aggregate(Sum("s", alias_name="s"),
                                        Sum("n", alias_name="n"))
                .to_pandas())
    if per_part.empty:
        return pd.DataFrame({"avg_yearly": [float("nan")]})
    thr_keys = pa.array(per_part["p"].to_numpy(), pa.int64())
    thr_vals = 0.2 * (per_part["s"].to_numpy() / per_part["n"].to_numpy())
    thr_ref = ray.put((thr_keys, thr_vals))

    def rev_partial(t: pa.Table) -> pa.Table:
        keys, vals = bcast_get(thr_ref)
        idx = pc.index_in(pc.cast(t["l_partkey"], pa.int64()),
                          value_set=keys)
        found = np.asarray(pc.is_valid(idx))
        thr = np.where(found, vals[np.asarray(idx.fill_null(0))], -1.0)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        mask = found & (qty < thr)
        s = t["l_extendedprice"].to_numpy(zero_copy_only=False)[mask].sum()
        return pa.table({"rev": pa.array([float(s)], pa.float64())})

    total = (read(sf_dir, "lineitem",
                  ["l_partkey", "l_quantity", "l_extendedprice"])
             .map_batches(rev_partial, batch_format="pyarrow",
                          batch_size=65536)
             .sum("rev"))
    return pd.DataFrame({"avg_yearly": [float(r4((total or 0.0) / 7.0))]})


def customer_order_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-customer order INTER-ARRIVAL statistics — the LAG-window
    shape over a corpus-growing partition key: for every customer with
    >= 2 orders, the average days between consecutive orders. One
    ``grouped_apply`` (sort + block-local per-key groups — no per-group
    Ray machinery at corpus customer counts); gaps are diffs of the
    sorted date multiset, so tie order between same-day orders cannot
    change the result."""
    from .common import grouped_apply

    empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                      "n_orders": pa.array([], pa.int64()),
                      "avg_gap_days": pa.array([], pa.float64())})

    def gaps(g: pa.Table) -> pa.Table:
        ts = np.sort(g["o_orderdate"].to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        d = np.diff(ts) / 86400e6
        return pa.table({
            "o_custkey": g["key"].slice(0, 1),
            "n_orders": pa.array([len(ts)], pa.int64()),
            "avg_gap_days": pa.array([float(r4(d.mean()))], pa.float64()),
        })

    ds = read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"key": pc.cast(t["o_custkey"], pa.int64()),
                            "o_orderdate": t["o_orderdate"]}),
        batch_format="pyarrow")
    out = grouped_apply(ds, "key", gaps, empty, min_group_size=2).to_pandas()
    out = _ensure_cols(out, {"o_custkey": "int64", "n_orders": "int64",
                             "avg_gap_days": "float64"})
    return finish(out.astype({"o_custkey": "int64",
                              "n_orders": "int64"}), ["o_custkey"])

def q2_min_cost_supplier(sf_dir: str, region_name: str = "EUROPE") -> pd.DataFrame:
    """TPC-H Q2 shape (adapted: the testdata has no partsupp table, so
    "supply cost" := the minimum observed unit price l_extendedprice /
    l_quantity per (part, supplier)): for each qualifying part (p_size
    divisible by 5, p_type LARGE), the region's supplier(s) offering the
    global minimum unit cost. supplier/nation/region/part are bounded
    dimensions (broadcast); the lineitem scan reduces per-batch into the
    bounded (part, supplier) key space before one small groupby — the
    correlated MIN resolves driver-side on the k-row result. Float
    exactness: both sides take MIN over the identical division results,
    so the equality join on the per-part minimum is bit-exact."""
    import ray
    from ray.data.aggregate import Min

    nation = read_arrow(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"])
    region = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    supp = read_arrow(sf_dir, "supplier",
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    part = read_arrow(sf_dir, "part",
                      ["p_partkey", "p_name", "p_size", "p_type"])

    reg_keys = pc.filter(region["r_regionkey"],
                         pc.equal(region["r_name"], region_name))
    nat_keys = pc.filter(nation["n_nationkey"],
                         pc.is_in(nation["n_regionkey"],
                                  value_set=reg_keys.combine_chunks()))
    supp_reg = supp.filter(pc.is_in(supp["s_nationkey"],
                                    value_set=nat_keys.combine_chunks()))
    psize = np.asarray(part["p_size"])
    pmask = (psize % 5 == 0) & np.asarray(
        pc.equal(part["p_type"], "LARGE").combine_chunks())
    kept_parts = part.filter(pa.array(pmask))
    keep_ref = ray.put((supp_reg["s_suppkey"].combine_chunks(),
                        kept_parts["p_partkey"].combine_chunks()))

    def unit_cost_partial(t: pa.Table) -> pa.Table:
        supp_keep, part_keep = bcast_get(keep_ref)
        f = t.filter(pc.and_(
            pc.is_in(t["l_suppkey"], value_set=supp_keep),
            pc.is_in(t["l_partkey"], value_set=part_keep)))
        cost = pc.divide(f["l_extendedprice"], f["l_quantity"])
        g = pa.table({"p": f["l_partkey"], "s": f["l_suppkey"],
                      "c": cost}).group_by(
            ["p", "s"], use_threads=False).aggregate([("c", "min")])
        return pa.table({"p": g["p"], "s": g["s"], "c": g["c_min"]})

    pairs = (read(sf_dir, "lineitem",
                  ["l_partkey", "l_suppkey", "l_extendedprice",
                   "l_quantity"])
             .map_batches(unit_cost_partial, batch_format="pyarrow",
                          batch_size=65536)
             .groupby(["p", "s"]).aggregate(Min("c", alias_name="c"))
             .to_pandas())
    pairs = _ensure_cols(pairs, {"p": "int64", "s": "int64", "c": "float64"})
    if pairs.empty:
        return pd.DataFrame({
            "s_acctbal": pd.Series([], dtype="float64"),
            "s_name": pd.Series([], dtype="str"),
            "n_name": pd.Series([], dtype="str"),
            "p_partkey": pd.Series([], dtype="int64"),
            "p_name": pd.Series([], dtype="str"),
            "supply_cost": pd.Series([], dtype="float64")})
    # exact float equality: both sides are MIN over the same value set
    best = pairs[pairs["c"] == pairs.groupby("p")["c"].transform("min")]
    sdf = supp_reg.to_pandas().rename(columns={"s_suppkey": "s"})
    ndf = nation.to_pandas().rename(columns={"n_nationkey": "s_nationkey"})
    pdf = kept_parts.to_pandas().rename(columns={"p_partkey": "p"})
    out = (best.merge(sdf, on="s").merge(ndf, on="s_nationkey")
           .merge(pdf, on="p"))
    out["p_partkey"] = out["p"].astype("int64")
    out["supply_cost"] = r4(out["c"])
    out = out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True], kind="mergesort").head(100)
    return finish(out[["s_acctbal", "s_name", "n_name", "p_partkey",
                       "p_name", "supply_cost"]])


def q11_important_parts(sf_dir: str, nation_name: str = "NATION_3",
                        fraction: float = 0.001) -> pd.DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp — "stock value" := lineitem
    revenue): parts whose revenue from suppliers of one nation exceeds
    ``fraction`` of that nation's total. One lineitem scan with a
    broadcast supplier-key filter, per-batch partial sums into the
    bounded part key space; the global threshold is the sum of the
    per-part sums (a distributed scalar — no second scan).

    Float caveat (same accepted risk as q22's scalar subquery): the
    strict ``value > fraction·total`` compare uses Ray-order sums while
    the oracle uses DuckDB-order sums; a part within ~1 ulp of the
    threshold could flip membership. Raw compare is kept deliberately —
    rounding both sides to a 1e-4 grid would WIDEN the flip window
    (boundary-straddling probability ~1e-2 per part at grid edges vs
    ~1e-8 for the raw ulp window)."""
    import ray
    from ray.data.aggregate import Sum

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat_keys = pc.filter(nation["n_nationkey"],
                         pc.equal(nation["n_name"], nation_name))
    keep = pc.filter(supp["s_suppkey"],
                     pc.is_in(supp["s_nationkey"],
                              value_set=nat_keys.combine_chunks()))
    keep_ref = ray.put(keep.combine_chunks())

    def val_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["l_suppkey"], value_set=bcast_get(keep_ref)))
        val = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        g = pa.table({"p": f["l_partkey"], "v": val}).group_by(
            "p", use_threads=False).aggregate([("v", "sum")])
        return pa.table({"p": g["p"], "v": g["v_sum"]})

    per_part = (read(sf_dir, "lineitem",
                     ["l_partkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])
                .map_batches(val_partial, batch_format="pyarrow",
                             batch_size=65536)
                .groupby("p").aggregate(Sum("v", alias_name="v"))
                .to_pandas())
    per_part = _ensure_cols(per_part, {"p": "int64", "v": "float64"})
    if per_part.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    threshold = float(per_part["v"].sum()) * fraction
    out = per_part[per_part["v"] > threshold].copy()
    out["p_partkey"] = out["p"].astype("int64")
    out["value"] = r4(out["v"])
    out = out.sort_values(["value", "p_partkey"],
                          ascending=[False, True], kind="mergesort")
    return finish(out[["p_partkey", "value"]])


def q16_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (adapted: the complaints-comment exclusion becomes
    a low-acctbal exclusion — no s_comment column): distinct supplier
    counts per (brand, type, size) for qualifying parts. part/supplier
    attributes ride a broadcast; the COUNT DISTINCT is two chained
    ``grouped_aggregate``s — dedup on the 4-part composite key, then
    count per attribute triple — both vectorized sorts, no per-group
    Python, nothing corpus-sized on the driver."""
    import ray
    from .common import grouped_aggregate

    part = read_arrow(sf_dir, "part",
                      ["p_partkey", "p_brand", "p_type", "p_size"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    psize = np.asarray(part["p_size"])
    pmask = (np.isin(psize, (5, 15, 25))
             & np.asarray(pc.not_equal(part["p_brand"],
                                       "Brand#1").combine_chunks())
             & np.asarray(pc.not_equal(part["p_type"],
                                       "PROMO").combine_chunks()))
    kept = part.filter(pa.array(pmask))
    excl = pc.filter(supp["s_suppkey"],
                     pc.less(supp["s_acctbal"], 500.0))
    dims_ref = ray.put((kept["p_partkey"].combine_chunks(),
                        kept["p_brand"].combine_chunks(),
                        kept["p_type"].combine_chunks(),
                        pc.cast(kept["p_size"],
                                pa.int64()).combine_chunks(),
                        excl.combine_chunks()))

    def attr_rows(t: pa.Table) -> pa.Table:
        pk, brand, ptype, size, bad = bcast_get(dims_ref)
        f = t.filter(pc.invert(pc.is_in(t["l_suppkey"], value_set=bad)))
        idx = pc.index_in(f["l_partkey"], value_set=pk)
        ok = pc.is_valid(idx)
        f, idx = f.filter(ok), idx.filter(ok)
        # per-batch pre-dedup shrinks the shuffle to distinct combos
        return pa.table({
            "p_brand": pc.take(brand, idx),
            "p_type": pc.take(ptype, idx),
            "p_size": pc.take(size, idx),
            "k": f["l_suppkey"],
        }).group_by(["p_brand", "p_type", "p_size", "k"],
                    use_threads=False).aggregate([])

    rows = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        attr_rows, batch_format="pyarrow", batch_size=65536)
    distinct = grouped_aggregate(
        rows, ["p_brand", "p_type", "p_size", "k"], [("k", "count")])
    counts = grouped_aggregate(
        distinct.map_batches(
            lambda t: t.select(["p_brand", "p_type", "p_size", "k"]),
            batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"], [("k", "count")]).to_pandas()
    counts = _ensure_cols(counts, {"p_brand": "str", "p_type": "str",
                                   "p_size": "int64", "k_count": "int64"})
    out = counts.rename(columns={"k_count": "supplier_cnt"})
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="mergesort")
    return finish(out[["p_brand", "p_type", "p_size", "supplier_cnt"]])


def _nation_suppliers(sf_dir: str, nation_name: str) -> pd.DataFrame:
    """Suppliers of one nation with names — the bounded-dimension lookup
    tail shared by the Q20/Q21 family (supplier/nation are bounded, so
    this small frame resolves driver-side)."""
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = read_arrow(sf_dir, "supplier",
                      ["s_suppkey", "s_name", "s_nationkey"])
    nat_keys = pc.filter(nation["n_nationkey"],
                         pc.equal(nation["n_name"], nation_name))
    return supp.filter(pc.is_in(
        supp["s_nationkey"],
        value_set=nat_keys.combine_chunks())).to_pandas()


def q20_dominant_suppliers(sf_dir: str, prefix: str = "red",
                           nation_name: str = "NATION_1") -> pd.DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty — a supplier
    "has excess stock" if they shipped MORE THAN HALF of a part's total
    1997 quantity): suppliers of one nation dominating any name-prefixed
    part. One scan reducing into the bounded (part, supplier) key space;
    the correlated half-of-total threshold resolves on the k-row frame.
    Quantities are integer-valued, so both sides' sums and the 0.5·total
    comparison are exact in doubles."""
    import ray
    from ray.data.aggregate import Sum

    part = read_arrow(sf_dir, "part", ["p_partkey", "p_name"])
    keep = pc.filter(part["p_partkey"],
                     pc.starts_with(part["p_name"], prefix))
    keep_ref = ray.put(keep.combine_chunks())
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)

    def qty_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.is_in(t["l_partkey"], value_set=bcast_get(keep_ref)),
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)))))
        g = pa.table({"p": f["l_partkey"], "k": f["l_suppkey"],
                      "q": f["l_quantity"]}).group_by(
            ["p", "k"], use_threads=False).aggregate([("q", "sum")])
        return pa.table({"p": g["p"], "k": g["k"], "q": g["q_sum"]})

    pairs = (read(sf_dir, "lineitem",
                  ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
             .map_batches(qty_partial, batch_format="pyarrow",
                          batch_size=65536)
             .groupby(["p", "k"]).aggregate(Sum("q", alias_name="q"))
             .to_pandas())
    pairs = _ensure_cols(pairs, {"p": "int64", "k": "int64", "q": "float64"})
    if pairs.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype="str")})
    total = pairs.groupby("p")["q"].transform("sum")
    dom = pairs[pairs["q"] > 0.5 * total]

    sdf = _nation_suppliers(sf_dir, nation_name)
    out = dom.merge(sdf.rename(columns={"s_suppkey": "k"}), on="k")
    out = out[["s_name"]].drop_duplicates()
    return finish(out, ["s_name"])


def q21_waiting_suppliers_allshuffle(
        sf_dir: str, nation_name: str = "NATION_3",
        late_days: int = 90) -> pd.DataFrame:
    """Q21, all-shuffle twin (no precomputation; see the bucket-routed
    canonical below). Adapted: no commit/receipt dates — "late" :=
    shipped more than ``late_days`` after the order date): for finalized
    multi-supplier orders where EXACTLY ONE supplier shipped late, count
    waiting incidents per late supplier of one nation. lineitem ⋈
    F-status orders is a fact-fact ``shuffle_join`` (orders unique per
    key); the per-order exists/not-exists pair resolves in one
    ``grouped_apply`` over the orderkey (vectorized np.unique per
    group); only bounded per-supplier counts reach the driver."""
    from .common import grouped_apply
    from .join import shuffle_join

    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        lambda t: pa.table({"key": t["l_orderkey"],
                            "s": t["l_suppkey"],
                            "ship": t["l_shipdate"]}),
        batch_format="pyarrow")
    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate", "o_orderstatus"]
                  ).map_batches(
        lambda t: (lambda f: pa.table({"key": f["o_orderkey"],
                                       "odate": f["o_orderdate"]}))(
            t.filter(pc.equal(t["o_orderstatus"], "F"))),
        batch_format="pyarrow")
    j = shuffle_join(li, orders, "key", ["s", "ship"], ["odate"], "inner",
                     left_types={"s": pa.int64(),
                                 "ship": pa.timestamp("us")},
                     right_types={"odate": pa.timestamp("us")},
                     num_blocks=32)

    late_us = int(late_days) * 86_400_000_000

    def flag(t: pa.Table) -> pa.Table:
        ship = t["ship"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        odate = t["odate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "key": t["key"], "s": t["s"],
            "late": pa.array(ship - odate > late_us)})

    empty = pa.table({"suppkey": pa.array([], pa.int64())})

    def per_order(g: pa.Table) -> pa.Table:
        s = g["s"].to_numpy(zero_copy_only=False)
        late = g["late"].to_numpy(zero_copy_only=False)
        if len(np.unique(s)) < 2:
            return empty
        late_supps = np.unique(s[late])
        if len(late_supps) != 1:
            return empty
        return pa.table({"suppkey": pa.array([int(late_supps[0])],
                                             pa.int64())})

    waits = grouped_apply(
        j.map_batches(flag, batch_format="pyarrow"),
        "key", per_order, empty, min_group_size=2)
    # per-supplier counts: bounded key space — per-batch partials, tiny merge
    counts = waits.map_batches(
        lambda t: (lambda g: pa.table({
            "suppkey": g["suppkey"],
            "n": pc.cast(g["suppkey_count"], pa.int64())}))(
            t.group_by("suppkey", use_threads=False).aggregate(
                [("suppkey", "count")])),
        batch_format="pyarrow").to_pandas()
    counts = _ensure_cols(counts, {"suppkey": "int64", "n": "int64"})
    agg = counts.groupby("suppkey", as_index=False)["n"].sum()

    sdf = _nation_suppliers(sf_dir, nation_name)
    out = agg.merge(sdf.rename(columns={"s_suppkey": "suppkey"}),
                    on="suppkey")
    if out.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype="str"),
                             "numwait": pd.Series([], dtype="int64")})
    out["numwait"] = out["n"].astype("int64")
    out = out.sort_values(["numwait", "s_name"],
                          ascending=[False, True], kind="mergesort").head(100)
    return finish(out[["s_name", "numwait"]])

def q18_large_volume(sf_dir: str, min_qty: float = 300.0,
                     n_buckets: int = 32) -> pd.DataFrame:
    """Q18, bucket-routed (canonical): a lineitem bucket holds ALL rows
    of each orderkey, so the per-order quantity sum and the HAVING
    filter complete block-locally with NO exchange; the surviving
    orders join the o_orderkey-aligned orders bucket in the same task.
    The only query-time exchange is the narrow (custkey, order attrs)
    survivors re-keyed through ``bucket_dataset`` onto the persisted
    customer buckets. The global top-100 is a per-block partial top-100
    (rows are individual orders — no cross-bucket aggregation) merged
    on the driver. Zero query-time sorts."""
    import shutil

    from .bucket import (_read_bucket, bucket_dataset, bucketed_join,
                         map_buckets)

    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    big_schema = pa.schema([("key", pa.int64()), ("o_orderkey", pa.int64()),
                            ("o_orderdate", pa.timestamp("us")),
                            ("o_totalprice", pa.float64()),
                            ("sum_qty", pa.float64())])

    def big_orders(k: int) -> pa.Table | None:
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_quantity"])
        if lt is None or len(lt) == 0:
            return None
        g = lt.group_by("l_orderkey", use_threads=False).aggregate(
            [("l_quantity", "sum")])
        g = g.filter(pc.greater(g["l_quantity_sum"], pa.scalar(min_qty)))
        if len(g) == 0:
            return None
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_totalprice"])
        if ot is None:
            return None
        idx = pc.index_in(g["l_orderkey"], value_set=ot["o_orderkey"])
        keep = pc.is_valid(idx)
        g, idx = g.filter(keep), idx.filter(keep)
        return pa.table({
            "key": ot["o_custkey"].take(idx),
            "o_orderkey": g["l_orderkey"],
            "o_orderdate": ot["o_orderdate"].take(idx),
            "o_totalprice": ot["o_totalprice"].take(idx),
            "sum_qty": g["l_quantity_sum"]})

    big = map_buckets(n_buckets, big_orders, big_schema.empty_table())
    qdir = bucket_dataset(big, "key", n_buckets, schema=big_schema)

    def bucket_top100(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("o_totalprice", "descending"),
                          ("o_orderkey", "ascending")])
        return t.take(idx.slice(0, min(100, len(t))))

    try:
        j = bucketed_join(
            qdir, _cust_buckets(sf_dir, n_buckets), key="key",
            right_key="c_custkey",
            left_cols=["o_orderkey", "o_orderdate", "o_totalprice",
                       "sum_qty"],
            right_cols=["c_name"], n_buckets=n_buckets,
            finalize=bucket_top100)
        out = j.to_pandas()
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
    out = _ensure_cols(out, {"key": "int64", "o_orderkey": "int64",
                             "o_orderdate": "datetime64[us]",
                             "o_totalprice": "float64",
                             "sum_qty": "float64", "c_name": "str"})
    out = out.rename(columns={"key": "c_custkey"})
    out["sum_qty"] = r4(out["sum_qty"])
    out = out.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(100)
    return finish(out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice", "sum_qty"]])


def q10_returned_items(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Q10, bucket-routed (canonical): per-order RETURNED revenue and
    the date-window orders join complete inside each orderkey-aligned
    bucket task (both sides persisted on o_orderkey); the narrow
    (custkey, rev) partials re-key through ``bucket_dataset`` onto the
    customer buckets, where per-customer totals complete block-locally
    (a customer bucket holds all of a custkey's partials). nation is
    the only broadcast. Per-block partial top-20 + tiny driver merge;
    zero query-time sorts."""
    import shutil

    import ray

    from .bucket import (_read_bucket, bucket_dataset, bucketed_join,
                         map_buckets)

    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    dims_ref = ray.put((nation["n_nationkey"].combine_chunks(),
                        nation["n_name"].combine_chunks()))
    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    lo, hi = pa.scalar(datetime(1998, 1, 1)), pa.scalar(datetime(1998, 7, 1))
    part_schema = pa.schema([("key", pa.int64()), ("rev", pa.float64())])

    def cust_rev_partial(k: int) -> pa.Table | None:
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_returnflag",
                                   "l_extendedprice", "l_discount"])
        if lt is None or len(lt) == 0:
            return None
        lt = lt.filter(pc.equal(lt["l_returnflag"], "R"))
        if len(lt) == 0:
            return None
        rev = pc.multiply(lt["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), lt["l_discount"]))
        g = pa.table({"o": lt["l_orderkey"], "rev": rev}).group_by(
            "o", use_threads=False).aggregate([("rev", "sum")])
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate"])
        if ot is None:
            return None
        ot = ot.filter(pc.and_(pc.greater_equal(ot["o_orderdate"], lo),
                               pc.less(ot["o_orderdate"], hi)))
        idx = pc.index_in(g["o"], value_set=ot["o_orderkey"])
        keep = pc.is_valid(idx)
        g, idx = g.filter(keep), idx.filter(keep)
        if len(g) == 0:
            return None
        cg = pa.table({"key": ot["o_custkey"].take(idx),
                       "rev": g["rev_sum"]}).group_by(
            "key", use_threads=False).aggregate([("rev", "sum")])
        return pa.table({"key": cg["key"], "rev": cg["rev_sum"]})

    partials = map_buckets(n_buckets, cust_rev_partial,
                           part_schema.empty_table())
    qdir = bucket_dataset(partials, "key", n_buckets, schema=part_schema)

    def bucket_top20(t: pa.Table) -> pa.Table:
        # runs as the join's finalize: per-customer completeness only
        # holds inside the bucket task (output blocks may re-split)
        g = t.group_by(["key", "c_name", "c_nationkey"],
                       use_threads=False).aggregate([("rev", "sum")])
        n_key, n_name = bcast_get(dims_ref)
        name = pc.take(n_name,
                       pc.index_in(g["c_nationkey"], value_set=n_key))
        g = pa.table({
            "c_custkey": g["key"], "c_name": g["c_name"],
            "revenue": pa.array(
                r4(g["rev_sum"].to_numpy(zero_copy_only=False))),
            "n_name": name})
        idx = pc.sort_indices(g, sort_keys=[("revenue", "descending"),
                                            ("c_custkey", "ascending")])
        return g.take(idx.slice(0, min(20, len(g))))

    try:
        j = bucketed_join(
            qdir, _cust_buckets(sf_dir, n_buckets), key="key",
            right_key="c_custkey", left_cols=["rev"],
            right_cols=["c_name", "c_nationkey"], n_buckets=n_buckets,
            finalize=bucket_top20)
        out = j.to_pandas()
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
    out = _ensure_cols(out, {"c_custkey": "int64", "c_name": "str",
                             "revenue": "float64", "n_name": "str"})
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True],
                          kind="mergesort").head(20)
    return out.reset_index(drop=True)[
        ["c_custkey", "c_name", "revenue", "n_name"]]

def q21_waiting_suppliers(sf_dir: str, nation_name: str = "NATION_3",
                          late_days: int = 90,
                          n_buckets: int = 32) -> pd.DataFrame:
    """Q21, bucket-routed (canonical): the lineitem ⋈ F-orders join AND
    the per-order exists/not-exists pair are both orderkey-local, and a
    bucket holds ALL rows of each orderkey on both persisted sides — so
    the whole query body runs inside the bucket tasks with ZERO
    query-time exchanges: join via ``pc.index_in``, per-(order,
    supplier) dedup + late-flag aggregation via one lexsort + reduceat
    (no per-group Python), qualifying-supplier counts as per-task
    partials. Only bounded per-supplier counts reach the driver."""
    from .bucket import _read_bucket, map_buckets

    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    late_us = int(late_days) * 86_400_000_000
    cnt_schema = pa.schema([("suppkey", pa.int64()), ("n", pa.int64())])

    def bucket_waits(k: int) -> pa.Table | None:
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_suppkey",
                                   "l_shipdate"])
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderstatus"])
        if lt is None or ot is None or len(lt) == 0:
            return None
        ot = ot.filter(pc.equal(ot["o_orderstatus"], "F"))
        idx = pc.index_in(lt["l_orderkey"], value_set=ot["o_orderkey"])
        keep = pc.is_valid(idx)
        lt, idx = lt.filter(keep), idx.filter(keep)
        if len(lt) == 0:
            return None
        ship = lt["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        odate = ot["o_orderdate"].take(idx).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ords = lt["l_orderkey"].to_numpy(zero_copy_only=False)
        supp = lt["l_suppkey"].to_numpy(zero_copy_only=False)
        late = (ship - odate > late_us).astype(np.int8)
        # dedup (order, supplier) with late = MAX, then group by order
        o = np.lexsort((supp, ords))
        ords, supp, late = ords[o], supp[o], late[o]
        newp = np.empty(len(ords), bool)
        newp[0] = True
        newp[1:] = (ords[1:] != ords[:-1]) | (supp[1:] != supp[:-1])
        ps = np.flatnonzero(newp)
        p_ord, p_supp = ords[ps], supp[ps]
        p_late = np.maximum.reduceat(late, ps)
        newo = np.empty(len(ps), bool)
        newo[0] = True
        newo[1:] = p_ord[1:] != p_ord[:-1]
        os_ = np.flatnonzero(newo)
        n_supp = np.diff(np.append(os_, len(p_ord)))
        n_late = np.add.reduceat(p_late.astype(np.int64), os_)
        # exactly one late supplier → its key == the masked group sum
        late_sum = np.add.reduceat(p_supp * p_late, os_)
        qual = (n_supp >= 2) & (n_late == 1)
        sk, cnt = np.unique(late_sum[qual], return_counts=True)
        return pa.table({"suppkey": pa.array(sk, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    counts = map_buckets(n_buckets, bucket_waits,
                         cnt_schema.empty_table()).to_pandas()
    counts = _ensure_cols(counts, {"suppkey": "int64", "n": "int64"})
    agg = counts.groupby("suppkey", as_index=False)["n"].sum()

    sdf = _nation_suppliers(sf_dir, nation_name)
    out = agg.merge(sdf.rename(columns={"s_suppkey": "suppkey"}),
                    on="suppkey")
    if out.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype="str"),
                             "numwait": pd.Series([], dtype="int64")})
    out["numwait"] = out["n"].astype("int64")
    out = out.sort_values(["numwait", "s_name"],
                          ascending=[False, True], kind="mergesort").head(100)
    return finish(out[["s_name", "numwait"]])

def q4_order_priority(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Q4, bucket-routed (canonical): the correlated EXISTS between two
    fact tables is orderkey-local — both sides persisted on orderkey —
    so each bucket task filters its orders window, reduces its
    lineitems to per-order max shipdate and applies the predicate with
    ZERO exchanges; only bounded (priority, n) count partials reach the
    driver. Counts are exact (no float risk)."""
    from .bucket import _read_bucket, map_buckets

    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    lo = pa.scalar(datetime(1998, 1, 1))
    hi = pa.scalar(datetime(1999, 1, 1))
    cnt_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n", pa.int64())])

    def bucket_counts(k: int) -> pa.Table | None:
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"])
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_shipdate"])
        if ot is None or lt is None:
            return None
        ot = ot.filter(pc.and_(pc.greater_equal(ot["o_orderdate"], lo),
                               pc.less(ot["o_orderdate"], hi)))
        if len(ot) == 0:
            return None
        g = lt.group_by("l_orderkey", use_threads=False).aggregate(
            [("l_shipdate", "max")])
        idx = pc.index_in(ot["o_orderkey"],
                          value_set=g["l_orderkey"].combine_chunks())
        ship = g["l_shipdate_max"].take(idx)
        keep = pc.and_(pc.is_valid(ship),
                       pc.greater(ship, ot["o_orderdate"]))
        c = ot.filter(keep).group_by(
            "o_orderpriority", use_threads=False).aggregate(
            [("o_orderpriority", "count")])
        return pa.table({
            "o_orderpriority": c["o_orderpriority"],
            "n": pc.cast(c["o_orderpriority_count"], pa.int64())})

    out = map_buckets(n_buckets, bucket_counts,
                      cnt_schema.empty_table()).to_pandas()
    out = _ensure_cols(out, {"o_orderpriority": "str", "n": "int64"})
    agg = out.groupby("o_orderpriority", as_index=False)["n"].sum()
    agg = agg.rename(columns={"n": "order_count"})
    agg["order_count"] = agg["order_count"].astype("int64")
    return finish(agg, ["o_orderpriority"])


def q12_priority_by_linestatus(sf_dir: str,
                               n_buckets: int = 32) -> pd.DataFrame:
    """Q12, bucket-routed (canonical): shipped-line counts classified by
    order priority — the lineitem⋈orders join is orderkey-local in the
    persisted buckets, so each task counts its window's lines per
    (orderkey, linestatus), looks priorities up via ``pc.index_in``
    and rolls up hi/lo per linestatus with ZERO exchanges; the driver
    merges bounded partials. Exact counts."""
    from .bucket import _read_bucket, map_buckets

    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    lo = pa.scalar(datetime(1999, 1, 1))
    hi = pa.scalar(datetime(2000, 1, 1))
    hi_set = pa.array(["1-URGENT", "2-HIGH"])
    cnt_schema = pa.schema([("l_linestatus", pa.string()),
                            ("hi", pa.int64()), ("lo", pa.int64())])

    def bucket_counts(k: int) -> pa.Table | None:
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_linestatus",
                                   "l_shipdate"])
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_orderpriority"])
        if lt is None or ot is None:
            return None
        lt = lt.filter(pc.and_(pc.greater_equal(lt["l_shipdate"], lo),
                               pc.less(lt["l_shipdate"], hi)))
        if len(lt) == 0:
            return None
        g = pa.table({"key": lt["l_orderkey"],
                      "l_linestatus": lt["l_linestatus"]}).group_by(
            ["key", "l_linestatus"], use_threads=False).aggregate(
            [("key", "count")])
        idx = pc.index_in(g["key"],
                          value_set=ot["o_orderkey"].combine_chunks())
        prio = ot["o_orderpriority"].take(idx)
        n = pc.cast(g["key_count"], pa.int64())
        is_hi = pc.is_in(prio, value_set=hi_set)
        zero = pa.scalar(0, pa.int64())
        c = pa.table({
            "l_linestatus": g["l_linestatus"],
            "hi": pc.if_else(is_hi, n, zero),
            "lo": pc.if_else(is_hi, zero, n),
        }).group_by("l_linestatus", use_threads=False).aggregate(
            [("hi", "sum"), ("lo", "sum")])
        return pa.table({"l_linestatus": c["l_linestatus"],
                         "hi": c["hi_sum"], "lo": c["lo_sum"]})

    out = map_buckets(n_buckets, bucket_counts,
                      cnt_schema.empty_table()).to_pandas()
    out = _ensure_cols(out, {"l_linestatus": "str", "hi": "int64",
                             "lo": "int64"})
    agg = out.groupby("l_linestatus", as_index=False).agg(
        high_line_count=("hi", "sum"), low_line_count=("lo", "sum"))
    agg = agg.astype({"high_line_count": "int64", "low_line_count": "int64"})
    return finish(agg, ["l_linestatus"])


def _bucket_cust_order_counts(sf_dir: str, n_buckets: int):
    """Shared per-bucket LEFT-join count kernel for Q13 /
    customer_order_counts: orders and customer are both persisted on
    custkey, so every customer's complete order count (including zero)
    resolves inside one bucket task with ZERO exchanges."""
    from .bucket import _read_bucket, map_buckets

    ord_dir = _ord_buckets(sf_dir, "o_custkey", n_buckets)
    cust_dir = _cust_buckets(sf_dir, n_buckets)
    cnt_schema = pa.schema([("c_custkey", pa.int64()),
                            ("n_orders", pa.int64())])

    def bucket_counts(k: int) -> pa.Table | None:
        ct = _read_bucket(cust_dir, k, drop_key="bucket",
                          columns=["c_custkey"])
        if ct is None or len(ct) == 0:
            return None
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_custkey"])
        if ot is None:
            n = pa.array(np.zeros(len(ct), np.int64))
        else:
            g = ot.group_by("o_custkey", use_threads=False).aggregate(
                [("o_custkey", "count")])
            idx = pc.index_in(
                pc.cast(ct["c_custkey"], pa.int64()),
                value_set=pc.cast(g["o_custkey"],
                                  pa.int64()).combine_chunks())
            n = pc.fill_null(
                pc.cast(g["o_custkey_count"], pa.int64()).take(idx), 0)
        return pa.table({
            "c_custkey": pc.cast(ct["c_custkey"], pa.int64()),
            "n_orders": n})

    return map_buckets(n_buckets, bucket_counts, cnt_schema.empty_table())


def q13_customer_distribution(sf_dir: str,
                              n_buckets: int = 32) -> pd.DataFrame:
    """Q13, bucket-routed (canonical): per-customer order counts
    (LEFT-join-with-zeros) complete inside each custkey-aligned bucket
    task; the count→custdist histogram partials are bounded and merge
    on the driver. Zero exchanges, exact counts."""
    counts = _bucket_cust_order_counts(sf_dir, n_buckets)

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"c_count": t["n_orders"]}).group_by(
            "c_count", use_threads=False).aggregate([("c_count", "count")])
        return pa.table({"c_count": g["c_count"],
                         "custdist": pc.cast(g["c_count_count"],
                                             pa.int64())})

    out = counts.map_batches(hist_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    out = _ensure_cols(out, {"c_count": "int64", "custdist": "int64"})
    agg = out.groupby("c_count", as_index=False)["custdist"].sum()
    agg = agg.astype({"c_count": "int64", "custdist": "int64"})
    return finish(agg, ["c_count"])


def customer_order_counts(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """customer ⟕ order-counts, bucket-routed (canonical): same
    per-bucket LEFT-join kernel as Q13, returning the per-customer
    rows themselves."""
    out = _bucket_cust_order_counts(sf_dir, n_buckets).to_pandas()
    out = _ensure_cols(out, {"c_custkey": "int64", "n_orders": "int64"})
    return finish(out, ["c_custkey"])

def q8_market_share(sf_dir: str, target_nation: str = "NATION_3",
                    region: str = "ASIA",
                    n_buckets: int = 32) -> pd.DataFrame:
    """Q8, bucket-routed (canonical): the per-order revenue split and
    the orders join are orderkey-local in the persisted buckets; only
    the pre-reduced (custkey, year, rev, rev_t) partials re-key through
    one narrow ``bucket_dataset`` exchange, and the region-membership
    SEMI filter resolves inside the custkey-aligned bucket task
    (c_nationkey is in the customer buckets; the region's nation keys
    are a bounded broadcast). Bounded per-year partials merge on the
    driver. One exchange, zero sorts."""
    import shutil

    import ray

    from .bucket import _read_bucket, bucket_dataset, map_buckets

    part = read_arrow(sf_dir, "part", ["p_partkey", "p_type"])
    keep = pc.filter(part["p_partkey"],
                     pc.equal(part["p_type"], "PROMO")).combine_chunks()
    nation = read_arrow(sf_dir, "nation",
                        ["n_nationkey", "n_name", "n_regionkey"])
    supp = read_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    reg = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"])
    region_nkeys = pc.filter(
        nation["n_nationkey"],
        pc.is_in(nation["n_regionkey"], value_set=pc.filter(
            reg["r_regionkey"],
            pc.equal(reg["r_name"], region)).combine_chunks()),
    ).combine_chunks()
    target_nkeys = pc.filter(
        nation["n_nationkey"],
        pc.equal(nation["n_name"], target_nation)).combine_chunks()
    target_skeys = pc.filter(
        supp["s_suppkey"],
        pc.is_in(supp["s_nationkey"], value_set=target_nkeys)
    ).combine_chunks()
    dims_ref = ray.put((keep, target_skeys, region_nkeys))

    li_dir = _li_buckets(sf_dir, n_buckets)
    ord_dir = _ord_buckets(sf_dir, "o_orderkey", n_buckets)
    lo = pa.scalar(datetime(1998, 1, 1))
    hi = pa.scalar(datetime(2000, 1, 1))

    part_schema = pa.schema([("key", pa.int64()), ("o_year", pa.int64()),
                             ("rev", pa.float64()), ("rev_t", pa.float64())])

    def cust_year_partial(k: int) -> pa.Table | None:
        keep, target_skeys, _ = bcast_get(dims_ref)
        lt = _read_bucket(li_dir, k, drop_key="bucket",
                          columns=["l_orderkey", "l_partkey",
                                   "l_suppkey", "l_extendedprice",
                                   "l_discount"])
        ot = _read_bucket(ord_dir, k, drop_key="bucket",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate"])
        if lt is None or ot is None:
            return None
        lt = lt.filter(pc.is_in(lt["l_partkey"], value_set=keep))
        ot = ot.filter(pc.and_(pc.greater_equal(ot["o_orderdate"], lo),
                               pc.less(ot["o_orderdate"], hi)))
        if len(lt) == 0 or len(ot) == 0:
            return None
        idx = pc.index_in(lt["l_orderkey"],
                          value_set=ot["o_orderkey"].combine_chunks())
        ok = pc.is_valid(idx)
        lt, idx = lt.filter(ok), idx.filter(ok)
        if len(lt) == 0:
            return None
        rev = pc.multiply(lt["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), lt["l_discount"]))
        is_t = pc.is_in(lt["l_suppkey"], value_set=target_skeys)
        g = pa.table({
            "key": ot["o_custkey"].take(idx),
            "o_year": pc.cast(
                pc.year(ot["o_orderdate"].take(idx)), pa.int64()),
            "rev": rev,
            "rev_t": pc.if_else(is_t, rev, pa.scalar(0.0)),
        }).group_by(["key", "o_year"], use_threads=False).aggregate(
            [("rev", "sum"), ("rev_t", "sum")])
        return pa.table({"key": g["key"], "o_year": g["o_year"],
                         "rev": g["rev_sum"], "rev_t": g["rev_t_sum"]})

    partials = map_buckets(n_buckets, cust_year_partial,
                           part_schema.empty_table())
    qdir = bucket_dataset(partials, "key", n_buckets, schema=part_schema)
    cust_dir = _cust_buckets(sf_dir, n_buckets)
    roll_schema = pa.schema([("o_year", pa.int64()), ("rev", pa.float64()),
                             ("rev_t", pa.float64())])

    def region_rollup(k: int) -> pa.Table | None:
        _, _, region_nkeys = bcast_get(dims_ref)
        pt = _read_bucket(qdir, k, drop_key="bucket",
                          columns=["key", "o_year", "rev", "rev_t"])
        if pt is None or len(pt) == 0:
            return None
        ct = _read_bucket(cust_dir, k, drop_key="bucket",
                          columns=["c_custkey", "c_nationkey"])
        if ct is None:
            return None
        ct = ct.filter(pc.is_in(ct["c_nationkey"], value_set=region_nkeys))
        pt = pt.filter(pc.is_in(
            pt["key"],
            value_set=pc.cast(ct["c_custkey"],
                              pa.int64()).combine_chunks()))
        if len(pt) == 0:
            return None
        g = pt.group_by("o_year", use_threads=False).aggregate(
            [("rev", "sum"), ("rev_t", "sum")])
        return pa.table({"o_year": g["o_year"], "rev": g["rev_sum"],
                         "rev_t": g["rev_t_sum"]})

    try:
        out = map_buckets(n_buckets, region_rollup,
                          roll_schema.empty_table()).to_pandas()
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
    out = _ensure_cols(out, {"o_year": "int64", "rev": "float64",
                             "rev_t": "float64"})
    agg = out.groupby("o_year", as_index=False).agg(
        rev=("rev", "sum"), rev_t=("rev_t", "sum"))
    agg["mkt_share"] = r4(agg["rev_t"] / agg["rev"])
    return finish(agg[["o_year", "mkt_share"]], ["o_year"])


def _skyline_2d(dd: np.ndarray, pp: np.ndarray, kk: np.ndarray):
    """Exact 2-D skyline (minimize date, maximize price) with strict
    dominance: x survives iff no point has (date <=, price >=) with one
    strict — equal (date, price) pairs all survive. O(n log n): sort by
    (date asc, price desc), then one prefix max. Returns a keep mask in
    the SORTED order plus the sort order."""
    order = np.lexsort((kk, -pp, dd))
    d_s, p_s = dd[order], pp[order]
    pref = np.concatenate((
        [-np.inf], np.maximum.accumulate(p_s)[:-1]))  # max over earlier rows
    new_date = np.concatenate(([True], d_s[1:] != d_s[:-1]))
    first_idx = np.flatnonzero(new_date)[np.cumsum(new_date) - 1]
    same_max = p_s[first_idx]  # per-date max (price desc within date)
    keep = (p_s == same_max) & (p_s > pref[first_idx])
    return order, keep


def orders_skyline(sf_dir: str) -> pd.DataFrame:
    """SKYLINE (Pareto-front) query: the orders no other order
    dominates on (earlier-or-equal date, higher-or-equal price, one
    strict) — the multi-criteria shortlist shape (Börzsönyi et al.
    2001). Ties on both attributes all survive.

    Scale shape: the classic distributed skyline — each block computes
    its LOCAL skyline vectorized (global skyline ⊆ union of local
    skylines: a globally non-dominated point is non-dominated in its
    own block), and the driver re-runs the identical kernel over the
    tiny candidate union. Candidate count per block is bounded by that
    block's skyline — in practice near the global skyline's size
    (single digits here at every SF) — but duplicate (date, price)
    ties at a date's max ALL survive locally, so a degenerate
    all-identical corpus makes every row a candidate; for such
    tie-heavy or anti-correlated data, add a tree of merge tiers
    (each tier re-runs the same kernel) instead of one driver merge."""

    def local(t: pa.Table) -> pa.Table:
        dd = pc.cast(t["o_orderdate"], pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        pp = t["o_totalprice"].to_numpy(zero_copy_only=False)
        kk = pc.cast(t["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        if not len(dd):
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "d_us": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64())})
        order, keep = _skyline_2d(dd, pp, kk)
        sel = order[keep]
        return pa.table({
            "o_orderkey": pa.array(kk[sel], pa.int64()),
            "d_us": pa.array(dd[sel], pa.int64()),
            "o_totalprice": pa.array(pp[sel], pa.float64()),
        })

    cand = read(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_totalprice"]).map_batches(
        local, batch_format="pyarrow").to_pandas()
    if cand.empty or not len(cand.columns):
        return pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_totalprice": pd.Series([], dtype="float64")})
    dd = cand["d_us"].to_numpy(dtype="int64")
    pp = cand["o_totalprice"].to_numpy(dtype="float64")
    kk = cand["o_orderkey"].to_numpy(dtype="int64")
    order, keep = _skyline_2d(dd, pp, kk)
    sel = order[keep]
    out = pd.DataFrame({
        "o_orderkey": kk[sel].astype("int64"),
        "o_orderdate": pd.to_datetime(dd[sel], unit="us"),
        "o_totalprice": pp[sel],
    })
    return finish(out, ["o_orderkey"])


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer — two calls with different seeds
    give the independent 64-bit hashes double-hashed Bloom probing needs
    (``pd.util.hash_array``'s hash_key only perturbs STRING hashing, so
    integer keys would get h1 == h2 and degenerate probes)."""
    z = x.astype(np.uint64) + np.uint64(seed)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _int_bloom_positions(keys: np.ndarray, m_bits: int,
                         k: int) -> np.ndarray:
    """(k, len(keys)) Bloom bit positions for int64 keys via double
    hashing (integer twin of ``text._bloom_positions``)."""
    h1 = _splitmix64(keys, 0x243F6A8885A308D3)
    h2 = _splitmix64(keys, 0x13198A2E03707344) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def bloom_semijoin_orders(sf_dir: str, segment: str = "AUTOMOBILE",
                          m_bits: int = 1 << 20,
                          k: int = 4) -> pd.DataFrame:
    """Orders of customers in ``segment`` via a Bloom-prefiltered semi
    join — the shuffle-reduction pattern for 100 TB fact scans: the
    build side's keys are folded into a CONSTANT-size bitmap (128 KiB
    here — independent of customer-table size, unlike the exact
    value_set broadcast the plain semi join's batches would need), the
    fact scan drops non-members BEFORE the exchange, and the exact
    sort-cogroup semi join over the survivors removes the Bloom's rare
    false positives.

    The result is EXACT by construction: a Bloom filter has no false
    negatives, so the prefilter pass-set is a superset of the true
    match set and the final ``shuffle_join(how='semi')`` equals the
    plain semi join (pinned in tests; full DuckDB ``IN`` oracle).
    At TPC-H segment selectivity (~1/5) the prefilter cuts the
    exchange ~5x; the win grows with fact:build skew."""
    import ray

    from .join import shuffle_join

    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def key_bits(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["c_mktsegment"], segment))
        if len(sub) == 0:
            return pa.table({"p": pa.array([], pa.uint64())})
        pos = _int_bloom_positions(sub["c_custkey"].to_numpy(), m_bits, k)
        return pa.table({"p": pa.array(np.unique(pos), pa.uint64())})

    pos_parts = cust.map_batches(key_bits, batch_format="pyarrow").to_pandas()
    pos = np.unique(pos_parts["p"].to_numpy().astype(np.uint64))
    bitmap = np.zeros(m_bits >> 3, dtype=np.uint8)
    np.bitwise_or.at(bitmap, (pos >> 3).astype(np.int64),
                     np.uint8(1) << (pos & 7).astype(np.uint8))
    bref = ray.put(bitmap)

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_totalprice"])

    def prefilter(t: pa.Table) -> pa.Table:
        bm = bcast_get(bref)
        p = _int_bloom_positions(t["o_custkey"].to_numpy(), m_bits, k)
        bits = (bm[(p >> np.uint64(3)).astype(np.int64)]
                >> (p & np.uint64(7)).astype(np.uint8)) & 1
        return t.filter(pa.array(bits.all(axis=0)))

    survivors = orders.map_batches(prefilter, batch_format="pyarrow")

    def seg_keys(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["c_mktsegment"], segment))
        return pa.table({"o_custkey": sub["c_custkey"]})

    keys = cust.map_batches(seg_keys, batch_format="pyarrow")
    out = shuffle_join(
        survivors, keys, "o_custkey",
        ["o_orderkey", "o_totalprice"], [], how="semi",
        left_types={"o_orderkey": pa.int64(), "o_totalprice": pa.float64()},
        right_types={},
    ).to_pandas()
    out = _ensure_cols(out, {"o_orderkey": "int64", "o_custkey": "int64",
                             "o_totalprice": "float64"})
    out = out[["o_orderkey", "o_custkey", "o_totalprice"]]
    return finish(out.astype({"o_orderkey": "int64",
                              "o_custkey": "int64"}), ["o_orderkey"])


def nation_top_customer_names(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Ordered string aggregation (STRING_AGG ... ORDER BY): the top-k
    customers per nation by account balance, names concatenated in
    (acctbal DESC, custkey ASC) order.

    Scale shape: every block pre-trims to its LOCAL top-k per nation
    (vectorized rank-within-group after one block sort) — the exchange
    ships ≤ k rows per nation per block, never the customer table;
    ``grouped_apply`` then re-sorts the ≤ k×blocks survivors per nation
    and emits one concatenated row. Nation is a bounded dimension, so
    the inner-join filter is a broadcast membership check, not a
    shuffle."""
    from .common import grouped_apply, table_rows

    nkeys = set(
        read_arrow(sf_dir, "nation", ["n_nationkey"])
        .column("n_nationkey").to_pylist())

    def block_topk(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["c_nationkey"],
                     value_set=pa.array(sorted(nkeys), pa.int64()))
        t = t.filter(m)
        idx = pc.sort_indices(t, sort_keys=[
            ("c_nationkey", "ascending"), ("c_acctbal", "descending"),
            ("c_custkey", "ascending")])
        t = t.take(idx)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        # rank within group = position − group start (nk is sorted)
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(nk)) + 1)) if len(nk) else \
            np.array([], dtype=np.int64)
        grp_start = np.repeat(
            starts, np.diff(np.append(starts, len(nk))).astype(np.int64)) \
            if len(nk) else np.array([], dtype=np.int64)
        keep = (np.arange(len(nk)) - grp_start) < k
        return t.filter(pa.array(keep)).select(
            ["c_nationkey", "c_name", "c_acctbal", "c_custkey"])

    parts = read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey",
                             "c_acctbal"]
    ).map_batches(block_topk, batch_format="pyarrow")

    empty = pa.table({"n_nationkey": pa.array([], pa.int64()),
                      "top_names": pa.array([], pa.string())})

    def concat_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[
            ("c_acctbal", "descending"), ("c_custkey", "ascending")])
        top = g.take(idx.slice(0, min(k, len(g))))
        return pa.table({
            "n_nationkey": pa.array(
                [int(top["c_nationkey"][0].as_py())], pa.int64()),
            "top_names": pa.array(
                [",".join(top["c_name"].to_pylist())], pa.string()),
        })

    out = grouped_apply(parts, "c_nationkey", concat_group, empty,
                        size_hint=table_rows(sf_dir, "customer")).to_pandas()
    out = _ensure_cols(out, {"n_nationkey": "int64", "top_names": "str"})
    return finish(out, ["n_nationkey"])


def lineitem_corr_stats(sf_dir: str) -> pd.DataFrame:
    """Statistical aggregates per return flag: sample covariance /
    standard deviations / Pearson correlation of quantity vs extended
    price — the mergeable-moments family (count + power sums) next to
    the HLL/CMS/quantile sketches.

    Scale shape: each batch reduces to one (flag, n, Σx, Σy, Σx²,
    Σy², Σxy) row (map-side, C++ group_by); the exchange ships those
    six-number partials into the bounded flag key space and the driver
    derives the moments. Block-structured partial sums behave like
    pairwise summation; at extreme scale or pathological magnitudes
    switch the partials to Welford/Chan merging — at these magnitudes
    float64 power sums match DuckDB's own corr/covar_samp/stddev_samp
    to well past the 4-decimal rounding."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(np.ones(len(t), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "syy": pa.array(y * y),
            "sxy": pa.array(x * y),
        }).group_by(["l_returnflag"], use_threads=False).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(
            ["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy"])

    out = (read(sf_dir, "lineitem",
                ["l_returnflag", "l_quantity", "l_extendedprice"])
           .map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("l_returnflag")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
           .to_pandas())
    out = _ensure_cols(out, {"l_returnflag": "str", "n": "int64",
                             "sx": "float64", "sy": "float64",
                             "sxx": "float64", "syy": "float64",
                             "sxy": "float64"})
    n = out["n"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = (out["sxy"] - out["sx"] * out["sy"] / n) / (n - 1)
        sdx = np.sqrt((out["sxx"] - out["sx"] ** 2 / n) / (n - 1))
        sdy = np.sqrt((out["syy"] - out["sy"] ** 2 / n) / (n - 1))
        corr = cov / (sdx * sdy)
    res = pd.DataFrame({
        "l_returnflag": out["l_returnflag"],
        "n": out["n"].astype("int64"),
        "corr_qty_price": r4(corr),
        "covar_qty_price": r4(cov),
        "sd_qty": r4(sdx),
        "sd_price": r4(sdy),
    })
    return finish(res, ["l_returnflag"])
