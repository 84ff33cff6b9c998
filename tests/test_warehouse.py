"""Warehouse pipelines (TPC-H Q1/Q3 shapes) vs pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pagerank_ray.pipelines.warehouse import (_Q1_CUTOFF, _Q3_DATE,
                                              pricing_summary,
                                              top_revenue_orders)

SF = "/root/testdata/sf0.001"


def test_pricing_summary_matches_pandas():
    got = pricing_summary(SF).to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li = li[li["l_shipdate"] <= pd.Timestamp(_Q1_CUTOFF)]
    li = li.assign(
        disc_price=li.l_extendedprice * (1 - li.l_discount),
        charge=li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax))
    want = (li.groupby(["l_returnflag", "l_linestatus"])
            .agg(sum_qty=("l_quantity", "sum"),
                 sum_base_price=("l_extendedprice", "sum"),
                 sum_disc_price=("disc_price", "sum"),
                 sum_charge=("charge", "sum"),
                 count_order=("l_quantity", "size"))
            .reset_index().sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    assert (got["count_order"].to_numpy()
            == want["count_order"].to_numpy()).all()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price",
              "sum_charge"):
        assert np.allclose(got[c].to_numpy(),
                           np.round(want[c].to_numpy(), 2), atol=0.011)
    assert len(got) == 6  # 3 returnflags x 2 linestatuses


def test_top_revenue_orders_matches_pandas():
    got = top_revenue_orders(SF, segment="BUILDING", k=10)
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cu = cu[cu["c_mktsegment"] == "BUILDING"]
    od = od[(od["o_orderdate"] < pd.Timestamp(_Q3_DATE))
            & od["o_custkey"].isin(cu["c_custkey"])]
    li = li[li["l_shipdate"] > pd.Timestamp(_Q3_DATE)]
    li = li[li["l_orderkey"].isin(od["o_orderkey"])]
    rev = (li.assign(rev=li.l_extendedprice * (1 - li.l_discount))
           .groupby("l_orderkey")["rev"].sum().round(2))
    want = rev.reset_index().sort_values(
        ["rev", "l_orderkey"], ascending=[False, True]).head(10)
    assert got.column("o_orderkey").to_pylist() == \
        want["l_orderkey"].tolist()
    assert np.allclose(got.column("revenue").to_numpy(),
                       want["rev"].to_numpy(), atol=0.011)
    assert got.num_rows == 10


def test_revenue_by_nation_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (REVENUE_BY_NATION_SQL,
                                                  revenue_by_nation)

    got = revenue_by_nation(SF, region="ASIA").to_pandas().sort_values(
        "n_name").reset_index(drop=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(REVENUE_BY_NATION_SQL.format(
        region="ASIA", date_from="1996-01-01",
        date_to="1998-01-01")).df().sort_values("n_name").reset_index(
            drop=True)
    assert got.equals(exp[["n_name", "revenue"]])
    assert len(got) > 0  # the same-nation filter keeps real rows


def test_promo_revenue_by_month_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (PROMO_REVENUE_SQL,
                                                  promo_revenue_by_month)

    got = promo_revenue_by_month(SF).to_pandas().sort_values(
        "month").reset_index(drop=True)
    con = duckdb.connect()
    for t in ("part", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(PROMO_REVENUE_SQL).df().sort_values(
        "month").reset_index(drop=True)
    cols = ["month", "promo_rev", "total_rev", "promo_share_pct"]
    assert got[cols].equals(exp[cols])
    assert (got["promo_share_pct"].between(0, 100)).all()


def test_forecast_revenue_matches_pandas():
    from pagerank_ray.pipelines.warehouse import forecast_revenue
    got = forecast_revenue(SF, year=1995, disc_lo=0.05,
                           disc_hi=0.07, qty_lt=24.0)
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    keep = ((li.l_shipdate >= pd.Timestamp("1995-01-01"))
            & (li.l_shipdate < pd.Timestamp("1996-01-01"))
            & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
            & (li.l_quantity < 24))
    want_rev = round((li.l_extendedprice[keep]
                      * li.l_discount[keep]).sum(), 2)
    assert got.num_rows == 1
    assert got.column("n_lines")[0].as_py() == int(keep.sum())
    assert abs(got.column("revenue")[0].as_py() - want_rev) < 0.011
    assert int(keep.sum()) > 0  # predicate actually selects rows


def test_forecast_revenue_empty_year():
    from pagerank_ray.pipelines.warehouse import forecast_revenue
    got = forecast_revenue(SF, year=1970)  # before any shipdate
    assert got.column("n_lines")[0].as_py() == 0
    assert got.column("revenue")[0].as_py() == 0.0


def test_returned_customer_revenue_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (
        RETURNED_CUSTOMER_SQL, returned_customer_revenue)
    got = returned_customer_revenue(SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(RETURNED_CUSTOMER_SQL.format(
        date_from="1996-04-01", date_to="1996-07-01", k=20)).df()
    assert len(got) == 20
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    # revenue strictly positive and sorted desc
    assert (got.revenue > 0).all()
    assert (got.revenue.values[:-1] >= got.revenue.values[1:]).all()


def test_order_priority_counts_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (ORDER_PRIORITY_SQL,
                                                  order_priority_counts)
    got = order_priority_counts(SF).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(ORDER_PRIORITY_SQL.format(
        date_from="1996-01-01", date_to="1996-07-01",
        late_days=30)).df()
    assert got["o_orderpriority"].tolist() == \
        exp["o_orderpriority"].tolist()
    assert got["order_count"].tolist() == exp["order_count"].tolist()
    assert got["order_count"].sum() > 0


def test_order_priority_counts_empty_window():
    from pagerank_ray.pipelines.warehouse import order_priority_counts
    got = order_priority_counts(SF, date_from="1970-01-01",
                                date_to="1970-02-01").to_pandas()
    assert len(got) == 0


def test_large_volume_orders_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (LARGE_VOLUME_SQL,
                                                  large_volume_orders)
    got = large_volume_orders(SF, min_qty=250).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(LARGE_VOLUME_SQL.format(min_qty=250)).df()
    assert len(got) == len(exp) > 0
    for c in ("o_orderkey", "o_custkey", "o_orderdate_us", "total_qty"):
        assert got[c].tolist() == exp[c].tolist(), c
    # every qualifying order really exceeds the threshold
    assert (got["total_qty"] > 250).all()


def test_large_volume_orders_impossible_threshold():
    from pagerank_ray.pipelines.warehouse import large_volume_orders
    got = large_volume_orders(SF, min_qty=10**9).to_pandas()
    assert len(got) == 0


def test_customer_order_distribution_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (
        CUSTOMER_ORDER_DIST_SQL, customer_order_distribution)
    got = customer_order_distribution(SF).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(CUSTOMER_ORDER_DIST_SQL).df()
    assert got["c_count"].tolist() == exp["c_count"].tolist()
    assert got["custdist"].tolist() == exp["custdist"].tolist()
    # every customer lands in exactly one bucket
    n_cust = con.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert got["custdist"].sum() == n_cust


def test_customer_order_distribution_zero_bucket(tmp_path):
    """Customers with no qualifying order land in the 0 bucket via
    count arithmetic (no anti-join) — synthesized so the bucket is
    guaranteed non-empty; orphan orders (custkey not in customer)
    must NOT count."""
    import pyarrow as pa

    from pagerank_ray.pipelines.warehouse import (
        customer_order_distribution)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 99], pa.int64()),
        "o_orderpriority": ["3-MEDIUM", "1-URGENT", "3-MEDIUM",
                            "5-LOW", "3-MEDIUM"]}),
        tmp_path / "orders.parquet")
    got = customer_order_distribution(str(tmp_path)).to_pandas()
    # cust 1 -> 1 qualifying (urgent excluded), cust 2 -> 2,
    # cust 3, 4 -> 0; orphan 99 ignored
    want = {0: 2, 1: 1, 2: 1}
    assert dict(zip(got["c_count"], got["custdist"])) == want
    # (custdist DESC, c_count DESC) order
    assert got["c_count"].tolist() == [0, 2, 1]


def test_late_line_priority_counts_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (
        LATE_LINE_PRIORITY_SQL, late_line_priority_counts)
    got = late_line_priority_counts(SF).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(LATE_LINE_PRIORITY_SQL.format(
        date_from="1997-01-01", date_to="1997-07-01",
        late_days=90)).df()
    for c in ("l_returnflag", "high_line_count", "low_line_count"):
        assert got[c].tolist() == exp[c].tolist()
    assert (got["high_line_count"] + got["low_line_count"]).sum() > 0


def test_late_line_priority_counts_empty_window():
    from pagerank_ray.pipelines.warehouse import (
        late_line_priority_counts)
    got = late_line_priority_counts(SF, date_from="1970-01-01",
                                    date_to="1970-02-01").to_pandas()
    assert len(got) == 0


def _duck(tables=("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem")):
    import duckdb
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_nation_pair_volume_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (NATION_PAIR_VOLUME_SQL,
                                                  nation_pair_volume)
    got = nation_pair_volume(SF).to_pandas().sort_values(
        ["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    exp = _duck().execute(NATION_PAIR_VOLUME_SQL.format(
        nation_a="NATION_10", nation_b="NATION_12",
        date_from="1996-01-01", date_to="1998-01-01")).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["supp_nation"].tolist() == exp["supp_nation"].tolist()
    assert got["cust_nation"].tolist() == exp["cust_nation"].tolist()
    assert got["l_year"].tolist() == exp["l_year"].tolist()
    assert np.allclose(got["revenue"], exp["revenue"], atol=1e-9)


def test_nation_pair_volume_unknown_nation():
    import pytest

    from pagerank_ray.pipelines.warehouse import nation_pair_volume
    with pytest.raises(ValueError):
        nation_pair_volume(SF, nation_a="NOPE", nation_b="NATION_1")


def test_disjunctive_revenue_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (DISJUNCTIVE_REVENUE_SQL,
                                                  disjunctive_revenue)
    got = disjunctive_revenue(SF)
    exp = _duck().execute(DISJUNCTIVE_REVENUE_SQL).df()
    assert got.num_rows == 1
    assert abs(got.column("revenue")[0].as_py()
               - float(exp["revenue"].iloc[0])) < 1e-9


def test_disjunctive_revenue_no_matching_clause():
    from pagerank_ray.pipelines.warehouse import disjunctive_revenue
    got = disjunctive_revenue(
        SF, clauses=(("Brand#99", 1, 5, 1, 11),))
    assert got.num_rows == 1
    assert got.column("revenue")[0].as_py() == 0.0


def test_supplier_part_counts_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (SUPPLIER_PART_COUNTS_SQL,
                                                  supplier_part_counts)
    got = supplier_part_counts(SF).to_pandas().sort_values(
        ["p_brand", "p_type", "p_size"]).reset_index(drop=True)
    exp = _duck().execute(SUPPLIER_PART_COUNTS_SQL.format(
        excl_brand="Brand#5", excl_type="MEDIUM",
        sizes="(1, 4, 9, 16, 25, 36, 49)")).df()
    assert len(got) == len(exp) and len(got) > 0
    for c in ("p_brand", "p_type"):
        assert got[c].tolist() == exp[c].tolist()
    for c in ("p_size", "supplier_cnt"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()


def test_idle_rich_customers_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (IDLE_RICH_CUSTOMERS_SQL,
                                                  idle_rich_customers)
    got = idle_rich_customers(SF).to_pandas().sort_values(
        "c_nationkey").reset_index(drop=True)
    exp = _duck().execute(IDLE_RICH_CUSTOMERS_SQL.format(
        since="2000-06-01")).df()
    assert len(got) == len(exp) and len(got) > 0
    assert (got["c_nationkey"].to_numpy()
            == exp["c_nationkey"].to_numpy()).all()
    assert (got["numcust"].to_numpy() == exp["numcust"].to_numpy()).all()
    assert np.allclose(got["totacctbal"], exp["totacctbal"], atol=1e-9)


def test_idle_rich_customers_impossible_window():
    # a window before any order: every customer has ordered since,
    # so the anti-join keeps nobody
    from pagerank_ray.pipelines.warehouse import idle_rich_customers
    got = idle_rich_customers(SF, since="1990-01-01")
    assert got.num_rows == 0


def test_market_share_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (MARKET_SHARE_SQL,
                                                  market_share)
    got = market_share(SF).to_pandas().sort_values(
        "o_year").reset_index(drop=True)
    exp = _duck().execute(MARKET_SHARE_SQL.format(
        supp_nation="NATION_2", region="ASIA", part_type="PROMO",
        date_from="1995-01-01", date_to="1997-01-01")).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["o_year"].tolist() == exp["o_year"].tolist()
    assert np.allclose(got["nation_rev"], exp["nation_rev"], atol=1e-9)
    assert np.allclose(got["total_rev"], exp["total_rev"], atol=1e-9)
    # the share the caller derives is a genuine fraction
    assert ((got["nation_rev"] >= 0)
            & (got["nation_rev"] <= got["total_rev"])).all()


def test_market_share_unknown_nation():
    import pytest

    from pagerank_ray.pipelines.warehouse import market_share
    with pytest.raises(ValueError):
        market_share(SF, supp_nation="NOPE")


def test_profit_by_nation_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (PROFIT_BY_NATION_SQL,
                                                  profit_by_nation)
    got = profit_by_nation(SF).to_pandas().sort_values(
        ["n_name", "o_year"]).reset_index(drop=True)
    exp = _duck().execute(PROFIT_BY_NATION_SQL.format(
        name_prefix="red")).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert got["o_year"].tolist() == exp["o_year"].tolist()
    assert np.allclose(got["profit"], exp["profit"], atol=1e-9)


def test_profit_by_nation_no_matching_parts():
    from pagerank_ray.pipelines.warehouse import profit_by_nation
    got = profit_by_nation(SF, name_prefix="zz_nothing")
    assert got.count() == 0


def test_top_supplier_revenue_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (TOP_SUPPLIER_SQL,
                                                  top_supplier_revenue)
    got = top_supplier_revenue(SF).to_pandas()
    exp = _duck().execute(TOP_SUPPLIER_SQL.format(
        date_from="1996-01-01", date_to="1996-04-01")).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["s_suppkey"].tolist() == exp["s_suppkey"].tolist()
    assert got["s_name"].tolist() == exp["s_name"].tolist()
    assert np.allclose(got["total_revenue"], exp["total_revenue"],
                       atol=1e-9)


def test_top_supplier_revenue_empty_window():
    from pagerank_ray.pipelines.warehouse import top_supplier_revenue
    got = top_supplier_revenue(SF, date_from="1970-01-01",
                               date_to="1970-02-01")
    assert got.num_rows == 0


def test_small_quantity_revenue_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (SMALL_QUANTITY_SQL,
                                                  small_quantity_revenue)
    got = small_quantity_revenue(SF)
    exp = _duck().execute(SMALL_QUANTITY_SQL.format(
        brand="Brand#3")).df()
    assert got.num_rows == 1
    assert abs(got.column("avg_yearly")[0].as_py()
               - float(exp["avg_yearly"].iloc[0])) < 1e-9
    assert got.column("avg_yearly")[0].as_py() > 0


def test_small_quantity_revenue_unknown_brand():
    from pagerank_ray.pipelines.warehouse import small_quantity_revenue
    got = small_quantity_revenue(SF, brand="Brand#none")
    assert got.num_rows == 1
    assert got.column("avg_yearly")[0].as_py() == 0.0


def test_min_cost_supplier_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (MIN_COST_SUPPLIER_SQL,
                                                  min_cost_supplier)
    got = min_cost_supplier(SF).to_pandas()
    exp = _duck(tables=("region", "nation", "supplier", "part",
                        "lineitem")).execute(
        MIN_COST_SUPPLIER_SQL.format(
            region="ASIA", part_type="STANDARD",
            max_size=25, k=100)).df()
    assert len(got) == len(exp) and len(got) > 0
    for c in ("p_partkey", "cost_cents", "s_suppkey"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    for c in ("s_name", "n_name"):
        assert got[c].tolist() == exp[c].tolist()
    # one row per part (the argmin is per-part)
    assert got["p_partkey"].is_unique


def test_min_cost_supplier_tiebreak_smallest_suppkey():
    # two suppliers with the same min cost on a part -> smallest wins
    from pagerank_ray.pipelines.warehouse import min_cost_supplier
    import duckdb
    con = _duck(tables=("region", "nation", "supplier", "part",
                        "lineitem"))
    got = min_cost_supplier(SF).to_pandas()
    for _, r in got.head(5).iterrows():
        mn = con.execute(f"""
            SELECT MIN(l_suppkey) FROM lineitem
            WHERE l_partkey = {int(r.p_partkey)}
              AND CAST(ROUND(l_extendedprice*100) AS BIGINT)
                  = {int(r.cost_cents)}
              AND l_suppkey IN (
                  SELECT s_suppkey FROM supplier s
                  JOIN nation n ON n.n_nationkey = s.s_nationkey
                  JOIN region reg ON reg.r_regionkey = n.n_regionkey
                  WHERE reg.r_name = 'ASIA')""").fetchone()[0]
        assert int(r.s_suppkey) == int(mn)


def test_min_cost_supplier_unknown_region():
    import pytest

    from pagerank_ray.pipelines.warehouse import min_cost_supplier
    with pytest.raises(ValueError):
        min_cost_supplier(SF, region="NOPE")


def test_important_parts_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (IMPORTANT_PARTS_SQL,
                                                  important_parts)
    got = important_parts(SF).to_pandas()
    exp = _duck(tables=("region", "nation", "supplier", "lineitem")
                ).execute(IMPORTANT_PARTS_SQL.format(
                    region="EUROPE", frac_den=1000)).df()
    assert len(got) == len(exp) and len(got) > 0
    assert (got["l_partkey"].to_numpy()
            == exp["l_partkey"].to_numpy()).all()
    assert (got["value_cents"].to_numpy()
            == exp["value_cents"].to_numpy()).all()


def test_important_parts_strict_fraction_filters():
    # a strict enough fraction keeps only the top parts; exactness
    # of the integer comparison means no boundary flapping
    from pagerank_ray.pipelines.warehouse import important_parts
    all_parts = important_parts(SF, frac_den=10**9).to_pandas()
    few = important_parts(SF, frac_den=150).to_pandas()
    assert 0 < len(few) < len(all_parts)
    assert set(few["l_partkey"]) <= set(all_parts["l_partkey"])
    # an impossible fraction keeps nobody (and stays typed-empty)
    assert important_parts(SF, frac_den=1).count() == 0


def test_promotable_suppliers_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (
        PROMOTABLE_SUPPLIERS_SQL, promotable_suppliers)
    got = promotable_suppliers(SF).to_pandas()
    exp = _duck(tables=("region", "nation", "supplier", "part",
                        "lineitem")).execute(
        PROMOTABLE_SUPPLIERS_SQL.format(
            region="AMERICA", name_prefix="large",
            lo="1996-01-01", hi="1997-01-01")).df()
    assert len(got) == len(exp) and len(got) > 0
    assert (got["s_suppkey"].to_numpy()
            == exp["s_suppkey"].to_numpy()).all()
    assert got["s_name"].tolist() == exp["s_name"].tolist()


def test_promotable_suppliers_no_matching_parts():
    from pagerank_ray.pipelines.warehouse import promotable_suppliers
    got = promotable_suppliers(SF, name_prefix="zz_nothing")
    assert got.num_rows == 0


def test_waiting_suppliers_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (WAITING_SUPPLIERS_SQL,
                                                  waiting_suppliers)
    got = waiting_suppliers(SF).to_pandas()
    exp = _duck(tables=("region", "nation", "supplier", "orders",
                        "lineitem")).execute(
        WAITING_SUPPLIERS_SQL.format(
            region="ASIA", late_days=30, k=25)).df()
    assert len(got) == len(exp) and len(got) > 0
    assert (got["s_suppkey"].to_numpy()
            == exp["s_suppkey"].to_numpy()).all()
    assert (got["numwait"].to_numpy()
            == exp["numwait"].to_numpy()).all()


def test_waiting_suppliers_sole_late_semantics(tmp_path):
    # synthetic: order 1 has suppliers 10 (late) and 11 (on time)
    # -> supplier 10 waits; order 2 has both late -> nobody; order 3
    # single-supplier late -> nobody (needs >= 2 suppliers)
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "wh"
    d.mkdir()
    ts = pd.Timestamp
    pq.write_table(pa.table({
        "l_orderkey": [1, 1, 2, 2, 3],
        "l_suppkey": [10, 11, 10, 11, 10],
        "l_shipdate": [ts("1996-06-01"), ts("1996-01-02"),
                       ts("1996-06-01"), ts("1996-06-01"),
                       ts("1996-06-01")],
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": [ts("1996-01-01")] * 3,
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "s_suppkey": [10, 11],
        "s_name": ["S10", "S11"],
        "s_nationkey": pa.array([0, 0], pa.int32()),
    }), d / "supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
        "n_name": ["N0"],
        "n_regionkey": pa.array([0], pa.int32()),
    }), d / "nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": ["R0"],
    }), d / "region.parquet")

    from pagerank_ray.pipelines.warehouse import waiting_suppliers
    got = waiting_suppliers(str(d), region="R0").to_pandas()
    assert got["s_suppkey"].tolist() == [10]
    assert got["numwait"].tolist() == [1]


def test_revenue_rollup_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (REVENUE_ROLLUP_SQL,
                                                  revenue_rollup)
    got = revenue_rollup(SF).to_pandas()
    exp = _duck(tables=("orders",)).execute(REVENUE_ROLLUP_SQL).df()
    assert len(got) == len(exp) and len(got) > 0
    for c in got.columns:
        assert (got[c].to_numpy()
                == exp[c].to_numpy().astype("int64")).all(), c
    # internal consistency: months sum to their year, years to total
    mt = got[(got.o_year >= 0) & (got.o_month >= 0)]
    yt = got[(got.o_year >= 0) & (got.o_month == -1)]
    tot = got[(got.o_year == -1)]
    assert len(tot) == 1
    assert (mt.groupby("o_year")["revenue_cents"].sum().to_numpy()
            == yt.set_index("o_year")["revenue_cents"]
            .loc[mt.o_year.unique()].to_numpy()).all()
    assert yt["revenue_cents"].sum() == tot["revenue_cents"].iloc[0]


def test_customer_revenue_deciles_matches_duckdb():
    from pagerank_ray.pipelines.warehouse import (CUSTOMER_DECILES_SQL,
                                                  customer_revenue_deciles)
    got = customer_revenue_deciles(SF).to_pandas().sort_values(
        ["revenue_cents", "c_custkey"]).reset_index(drop=True)
    exp = _duck(tables=("orders",)).execute(
        CUSTOMER_DECILES_SQL.format(k=10)).df()
    assert len(got) == len(exp) and len(got) > 0
    for c in got.columns:
        assert (got[c].to_numpy()
                == exp[c].to_numpy().astype("int64")).all(), c
    # NTILE invariants: deciles 1..10, sizes differ by at most one,
    # and decile is monotone in the sort order
    sizes = got.groupby("decile").size()
    assert sorted(sizes.index) == list(range(1, 11))
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(got["decile"].to_numpy()) >= 0).all()


def test_customer_revenue_deciles_fewer_rows_than_buckets(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "wh"
    d.mkdir()
    pq.write_table(pa.table({
        "o_custkey": [1, 2, 3],
        "o_totalprice": [10.0, 20.0, 30.0],
    }), d / "orders.parquet")
    from pagerank_ray.pipelines.warehouse import customer_revenue_deciles
    got = customer_revenue_deciles(str(d)).to_pandas().sort_values(
        "c_custkey").reset_index(drop=True)
    # n < k: NTILE gives each row its own bucket 1..n
    assert got["decile"].tolist() == [1, 2, 3]
