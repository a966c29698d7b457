"""TPC-H Q1: the integer-cent conversion is exact against a pandas
brute force, and the shipdate cutoff actually excludes rows."""

from __future__ import annotations

import pandas as pd

import file_dedup_rust_spark.entry.testdata_queries as Q

SF = "/root/testdata/sf0.001"


def test_q1_money_exact_vs_pandas(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_shipdate"] <= pd.Timestamp(Q.TPCH_Q1_CUTOFF)]
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    want = (
        pd.DataFrame(
            {"f": li["l_returnflag"], "s": li["l_linestatus"], "c": cents}
        )
        .groupby(["f", "s"])["c"]
        .sum()
        .to_dict()
    )
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["sum_base_cents"]
        for r in Q.QUERIES["tpch_q1_pricing"](spark, SF).collect()
    }
    assert got == want


def test_q1_cutoff_excludes_rows(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    n_all = len(li)
    n_kept = int((li["l_shipdate"] <= pd.Timestamp(Q.TPCH_Q1_CUTOFF)).sum())
    assert n_kept < n_all, "cutoff does not bind on this fixture"
    rows = Q.QUERIES["tpch_q1_pricing"](spark, SF).collect()
    assert sum(r["n_rows"] for r in rows) == n_kept


def test_q3_matches_pandas_brute_force(spark):
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    d = pd.Timestamp(Q.TPCH_Q3_DATE)
    cu = cu[cu["c_mktsegment"] == Q.TPCH_Q3_SEGMENT]
    od = od[(od["o_orderdate"] < d) & od["o_custkey"].isin(cu["c_custkey"])]
    li = li[(li["l_shipdate"] > d) & li["l_orderkey"].isin(od["o_orderkey"])]
    rev = (
        (li["l_extendedprice"] * 100).round().astype("int64")
        * (100 - (li["l_discount"] * 100).round().astype("int64"))
    )
    want = (
        pd.DataFrame({"k": li["l_orderkey"], "r": rev})
        .groupby("k")["r"].sum()
        .sort_values(ascending=False)
    )
    want = sorted(
        want.items(), key=lambda kv: (-kv[1], kv[0])
    )[: Q.TPCH_Q3_TOPN]
    got = [
        (r["l_orderkey"], r["revenue_e4"])
        for r in Q.QUERIES["tpch_q3_shipping"](spark, SF).collect()
    ]
    assert got == [(int(k), int(v)) for k, v in want]


def test_q5_matches_pandas_brute_force(spark):
    rg = pd.read_parquet(f"{SF}/region.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    rk = rg[rg["r_name"] == Q.TPCH_Q5_REGION]["r_regionkey"]
    na = na[na["n_regionkey"].isin(rk)]
    cu = cu[cu["c_nationkey"].isin(na["n_nationkey"])]
    od = od[
        (od["o_orderdate"] >= pd.Timestamp(Q.TPCH_Q5_FROM))
        & (od["o_orderdate"] < pd.Timestamp(Q.TPCH_Q5_TO))
    ].merge(cu, left_on="o_custkey", right_on="c_custkey")
    j = (
        li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(su, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]].merge(
        na, left_on="c_nationkey", right_on="n_nationkey"
    )
    rev = (
        (j["l_extendedprice"] * 100).round().astype("int64")
        * (100 - (j["l_discount"] * 100).round().astype("int64"))
    )
    want = (
        pd.DataFrame({"n": j["n_name"], "r": rev}).groupby("n")["r"].sum()
    )
    want = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r["n_name"], r["revenue_e4"])
        for r in Q.QUERIES["tpch_q5_local_supplier"](spark, SF).collect()
    ]
    assert got == [(k, int(v)) for k, v in want]


def test_q14_matches_pandas_brute_force(spark):
    pt = pd.read_parquet(f"{SF}/part.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[
        (li["l_shipdate"] >= pd.Timestamp(Q.TPCH_Q14_FROM))
        & (li["l_shipdate"] < pd.Timestamp(Q.TPCH_Q14_TO))
    ].merge(pt, left_on="l_partkey", right_on="p_partkey")
    rev = (
        (li["l_extendedprice"] * 100).round().astype("int64")
        * (100 - (li["l_discount"] * 100).round().astype("int64"))
    )
    want_promo = int(rev[li["p_type"] == "PROMO"].sum())
    want_total = int(rev.sum())
    r = Q.QUERIES["tpch_q14_promo"](spark, SF).collect()[0]
    assert (r["promo_rev_e4"], r["total_rev_e4"]) == (want_promo, want_total)
    assert 0 < r["promo_pct"] < 100


def test_running_revenue_prefix_property(spark):
    """Each customer's final cum_cents equals the sum of their
    order_cents, and order_seq is a gapless 1..n sequence."""
    rows = Q.QUERIES["customer_running_revenue"](spark, SF).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    assert by_cust
    for cust, rs in by_cust.items():
        assert [r["order_seq"] for r in rs] == list(range(1, len(rs) + 1))
        assert rs[-1]["cum_cents"] == sum(r["order_cents"] for r in rs)
        for i in range(1, len(rs)):
            assert (
                rs[i]["cum_cents"]
                == rs[i - 1]["cum_cents"] + rs[i]["order_cents"]
            )


def test_q18_threshold_binds_and_matches_pandas(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    tot = (
        li.assign(q=li["l_quantity"].round().astype("int64"))
        .groupby("l_orderkey")["q"].sum()
    )
    want = set(tot[tot > Q.TPCH_Q18_MIN_QTY].index)
    assert 0 < len(want) < len(tot), "threshold must bind"
    rows = Q.QUERIES["tpch_q18_large_orders"](spark, SF).collect()
    assert {r["o_orderkey"] for r in rows} == want
    assert all(r["total_qty"] == tot[r["o_orderkey"]] for r in rows)


def test_day_pivot_row_sums(spark):
    """Pivot cells sum to the row total and to the raw event count."""
    rows = Q.QUERIES["events_day_pivot"](spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r["click"] + r["error"] + r["purchase"] + r["signup"] + r["view"]
            == r["total"]
        )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert sum(r["total"] for r in rows) == len(ev)


def test_rollup_levels_reconcile(spark):
    """Detail rows sum to their segment subtotal, subtotals to the
    grand total, and grouping flags separate the levels."""
    rows = Q.QUERIES["revenue_rollup"](spark, SF).collect()
    detail = [r for r in rows if (r["g_segment"], r["g_year"]) == (0, 0)]
    subs = {r["segment"]: r for r in rows
            if (r["g_segment"], r["g_year"]) == (0, 1)}
    grand = [r for r in rows if (r["g_segment"], r["g_year"]) == (1, 1)]
    assert detail and subs and len(grand) == 1
    for seg, sub in subs.items():
        mine = [r for r in detail if r["segment"] == seg]
        assert sum(r["revenue_cents"] for r in mine) == sub["revenue_cents"]
        assert sum(r["n_orders"] for r in mine) == sub["n_orders"]
    assert sum(s["revenue_cents"] for s in subs.values()) == grand[0][
        "revenue_cents"
    ]


def test_dormant_customers_anti_semantics(spark):
    """No dormant customer has an in-window order; never-ordered
    customers appear with lifetime 0; active customers are absent."""
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    inw = od[
        (od["o_orderdate"] >= pd.Timestamp(Q.DORMANT_FROM))
        & (od["o_orderdate"] < pd.Timestamp(Q.DORMANT_TO))
    ]
    active = set(inw["o_custkey"])
    rows = Q.QUERIES["dormant_customers"](spark, SF).collect()
    got = {r["c_custkey"]: r["lifetime_orders"] for r in rows}
    assert set(got) == set(cu["c_custkey"]) - active
    lifetime = od.groupby("o_custkey").size().to_dict()
    for k, n in got.items():
        assert n == lifetime.get(k, 0)
    assert any(n == 0 for n in got.values()) or not (
        set(cu["c_custkey"]) - set(od["o_custkey"])
    )


def test_order_vs_customer_avg_predicate_exact(spark):
    """The above-average predicate is evaluated in exact integers:
    every returned order strictly exceeds its customer's mean, and a
    single-order customer (order == its own average) never appears."""
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (od["o_totalprice"] * 100).round().astype("int64")
    d = pd.DataFrame({"k": od["o_orderkey"], "c": od["o_custkey"], "v": cents})
    g = d.groupby("c")["v"].agg(["sum", "count"])
    want = {
        int(r.k)
        for r in d.itertuples()
        if r.v * g.loc[r.c, "count"] > g.loc[r.c, "sum"]
    }
    rows = Q.QUERIES["order_vs_customer_avg"](spark, SF).collect()
    assert {r["o_orderkey"] for r in rows} == want
    singles = set(g[g["count"] == 1].index)
    assert all(r["o_custkey"] not in singles for r in rows)


def test_embedding_component_stats_vs_numpy(spark):
    """HOF outputs match a numpy brute force per row."""
    import numpy as np

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    rows = Q.QUERIES["embedding_component_stats"](spark, SF).collect()
    byid = {r["vec_id"]: r for r in rows}
    assert len(byid) == len(emb)
    for _, e in emb.head(100).iterrows():
        v = np.asarray(e["embedding"], dtype=np.float64)
        r = byid[e["vec_id"]]
        assert r["pos_n"] == int((v > 0).sum())
        assert r["arg_max"] == int(np.argmax(np.abs(v))) + 1
        assert abs(r["max_abs"] - round(float(np.max(np.abs(v))), 4)) < 1e-9
        assert abs(r["sq_norm"] - 1.0) < 0.01  # unit-normalized corpus


def test_cube_adds_per_year_marginal(spark):
    """CUBE contains everything ROLLUP has plus the per-year marginal
    rows ROLLUP cannot produce; the extra level reconciles too."""
    cube = Q.QUERIES["revenue_cube"](spark, SF).collect()
    roll = Q.QUERIES["revenue_rollup"](spark, SF).collect()
    key = lambda r: (r["segment"], r["order_year"], r["g_segment"], r["g_year"])
    cset, rset = {key(r) for r in cube}, {key(r) for r in roll}
    assert rset < cset
    per_year = [r for r in cube if (r["g_segment"], r["g_year"]) == (1, 0)]
    assert per_year and all(k not in rset for k in map(key, per_year))
    grand = [r for r in cube if (r["g_segment"], r["g_year"]) == (1, 1)][0]
    assert sum(r["revenue_cents"] for r in per_year) == grand["revenue_cents"]
