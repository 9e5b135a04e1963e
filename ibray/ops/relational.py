"""Relational operator layer over the driver's TPC-H-ish parquet tables.

Each function is one operator family from SURVEY.md §2 (filters M3-M5,
hash/broadcast joins J1-J2, semi/anti joins J5-J6, grouped aggregates A1-A8,
sort/top-k O1-O5, dedup U8, union U1, windowed/cumulative per-key state §2.9
analog) expressed Ray-Data-first over `{sf_dir}/{table}.parquet`, with an
exact ANSI-SQL oracle registered in /root/repo/__ray_entry__.py.

Column pruning happens at the read (`columns=[...]`); per-batch work is
vectorized pyarrow/pandas; aggregates shuffle only pre-projected columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    from ibray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# --- A1/A6: grouped aggregate (TPC-H Q1 analog) ---------------------------


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"])
    def _prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("l_shipdate"),
                             pa.scalar(np.datetime64("1998-09-01", "us"))))
        return b.append_column(
            "revenue",
            pc.multiply(b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), b.column("l_discount"))),
        )

    ds = ds.map_batches(_prep, batch_format="pyarrow")
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("revenue", alias_name="sum_disc_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="count_order"),
    )


# --- M3-M5: filter + project ----------------------------------------------


def filter_project_parts(sf_dir: str) -> rd.Dataset:
    ds = _t(sf_dir, "part", ["p_partkey", "p_name", "p_type", "p_size", "p_retailprice"])
    return ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater(b.column("p_size"), 25),
                    pc.match_substring(b.column("p_type"), "STANDARD"))
        ).select(["p_partkey", "p_name", "p_retailprice"]),
        batch_format="pyarrow",
    )


# --- J1: partitioned hash join + grouped reduce ---------------------------


def customer_order_totals(sf_dir: str) -> rd.Dataset:
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    agg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent"),
        Count(alias_name="n_orders"),
    )
    joined = cust.join(agg, join_type="inner", num_partitions=8,
                       on=("c_custkey",), right_on=("o_custkey",))
    return joined.select_columns(["c_custkey", "c_name", "n_orders", "total_spent"])


# --- J1 broadcast variant: dimension-table lookup -------------------------


def customer_nation_region(sf_dir: str) -> rd.Dataset:
    """customer -> nation -> region via one broadcast dim table (J2)."""
    import pyarrow.parquet as pq

    from ibray.ops import joins as J

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    dim = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    dim = dim.select(["n_nationkey", "n_name", "r_name"]).rename_columns(
        ["c_nationkey", "nation_name", "region_name"]
    )
    out = J.broadcast_join(cust, dim, keys=["c_nationkey"], join_type="inner")
    return out.select_columns(["c_custkey", "nation_name", "region_name"])


# --- J5/J6: semi / anti join (broadcast key set) --------------------------


def customers_with_orders(sf_dir: str) -> rd.Dataset:
    """Semi-join: customers having ≥1 order (key set broadcast as a filter)."""
    import ray

    keys = _t(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    ref = ray.put(pa.array(sorted(keys), type=pa.int64()))

    def _semi(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return b.filter(pc.is_in(b.column("c_custkey"), value_set=ks))

    return _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        _semi, batch_format="pyarrow")


def customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Anti-join: customers with no high-value (>250k) order."""
    import ray

    big = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 250_000.0))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )
    keys = big.unique("o_custkey")
    ref = ray.put(pa.array(sorted(keys), type=pa.int64()))

    def _anti(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return b.filter(pc.invert(pc.is_in(b.column("c_custkey"), value_set=ks)))

    return _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        _anti, batch_format="pyarrow")


# --- O5: global sort + top-k ----------------------------------------------


def top_orders(sf_dir: str) -> rd.Dataset:
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20)


# --- U8: exact dedup ------------------------------------------------------


def distinct_flag_status(sf_dir: str) -> rd.Dataset:
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


# --- A7/A8: grouped stats over the events stream --------------------------


def event_type_stats(sf_dir: str) -> rd.Dataset:
    ds = _t(sf_dir, "events", ["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


# --- §2.9 analog: ordered per-key cumulative state (window function) ------


def user_cumulative_value(sf_dir: str) -> rd.Dataset:
    """Per-user running sum of event values in (ts, event_id) order — the
    ordered-log / windowed-state pattern (groupby key, sort within group)."""
    import pandas as pd

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g["cum_value"] = g["value"].cumsum()
        return g[["event_id", "user_id", "cum_value"]]

    return ds.groupby("user_id").map_groups(_cum, batch_format="pandas")


# --- U1: union all + aggregate -------------------------------------------


def union_high_value_keys(sf_dir: str) -> rd.Dataset:
    """UNION ALL of two key streams, then per-key frequency (U1 + A8)."""
    a = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 200_000.0))
        .select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    b = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("l_quantity"), 45.0))
        .select(["l_orderkey"])
        .rename_columns(["o_orderkey"]),
        batch_format="pyarrow",
    )
    return a.union(b).groupby("o_orderkey").aggregate(Count(alias_name="n"))
